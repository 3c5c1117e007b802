"""CoRL-2020 robustness comparison — parity with the reference
``examples/double_integrator_CORL2020.cu``: run Vanilla MPPI (nominal
disturbance), Vanilla under large disturbance, Tube-MPPI, and Robust MPPI on
the double-integrator circle task with injected state disturbances; count
tube failures (leaving the [1.675, 2.325] annulus, :12-25); save the
state/nominal/free-energy traces as .npy for the plotting scripts
(scripts/plot_di_trajectories.py).
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.controllers import RobustMPPI, TubeMPPI, VanillaMPPI
from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.costs.double_integrator import DoubleIntegratorRobustCost
from mppi_generic_tpu.feedback import DDPFeedback
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.sampling import GaussianDistribution

DT = jnp.float32(0.02)
T = 50          # optimization horizon (reference: num_timesteps = 50)
K = 1024        # rollouts (reference: 1024)
LAMBDA = jnp.float32(2.0)

INNER2 = 1.675**2
OUTER2 = 2.325**2


def tube_failure(xs):
    """Boolean per step: left the tube annulus (CORL2020.cu:12-25)."""
    r2 = xs[:, 0] ** 2 + xs[:, 1] ** 2
    return (r2 < INNER2) | (r2 > OUTER2)


def common(noise_scale, robust_cost=False):
    dyn = DoubleIntegratorDynamics.create(system_noise=noise_scale)
    cost = DoubleIntegratorRobustCost() if robust_cost else DoubleIntegratorCircleCost()
    sampler = GaussianDistribution.create(std_dev=[1.0, 1.0])
    fb = DDPFeedback.create(dyn, DT, Q=jnp.diag(jnp.array([500.0, 500.0, 100.0, 100.0])))
    return dyn, cost, sampler, fb


def run_vanilla(steps, key, noise_scale, tag):
    dyn, cost, sampler, fb = common(noise_scale)
    ctrl = VanillaMPPI(
        dynamics=dyn, cost=cost, sampler=sampler,
        dt=DT, lam=LAMBDA, alpha=jnp.float32(0.0),
        num_timesteps=T, num_rollouts=K, num_iters=1,
    )
    cs = ctrl.init_state(jax.random.PRNGKey(42))
    fb_state = fb.init_feedback_state(T)
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])

    def body(carry, k):
        x, cs, fb_state = carry
        cs = ctrl.slide_control_sequence(cs, 1)
        res, cs = ctrl.solve(x, cs)
        fb_state = fb.compute_feedback(x, res.state_trajectory[:T],
                                       res.control_mean)
        # NOTE: at t=0 the re-rollout starts at x, so this feedback term is
        # zero — exactly like the reference example (CORL2020.cu:114-116,
        # getFeedbackControl(x, nominal_trajectory.col(0), 0) with
        # state_.col(0) == x); the gains matter at estimator-rate
        # interpolation between solves, not here
        u = res.control_mean[0] + fb.k(x, res.state_trajectory[0], 0, fb_state)
        u = ctrl._clamp_controls(u)
        x, _ = dyn.step(x, u, 0.0, DT)
        x = dyn.compute_state_disturbance(k, DT, x)
        return (x, cs, fb_state), (x, res.state_trajectory[:T],
                                   res.free_energy.free_energy_mean)

    keys = jax.random.split(key, steps)
    loop = jax.jit(lambda c: jax.lax.scan(body, c, keys))
    (_, _, _), (xs, noms, fes) = loop((x0, cs, fb_state))
    return np.asarray(xs), np.asarray(noms), np.asarray(fes), tag


def run_tube(steps, key, noise_scale):
    dyn, cost, sampler, fb = common(noise_scale)
    ctrl = TubeMPPI(
        dynamics=dyn, cost=cost, sampler=sampler,
        dt=DT, lam=LAMBDA, alpha=jnp.float32(0.0),
        num_timesteps=T, num_rollouts=K,
        nominal_threshold=jnp.float32(20.0), feedback=fb,
    )
    cs = ctrl.init_state(jax.random.PRNGKey(42))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])

    def body(carry, k):
        x, cs = carry
        cs = ctrl.slide_control_sequence(cs, 1)
        res, cs = ctrl.solve(x, cs)
        # Tube-MPPI publishes the NOMINAL feedforward; the ancillary
        # feedback tracks the nominal trajectory (tube docstring +
        # tube_mppi_controller.cu:286)
        u = res.nominal.control_mean[0] + fb.k(
            x, res.nominal.state_trajectory[0], 0, cs.feedback_state
        )
        u = ctrl._clamp_controls(u)
        x, _ = dyn.step(x, u, 0.0, DT)
        x = dyn.compute_state_disturbance(k, DT, x)
        return (x, cs), (x, res.nominal.state_trajectory[:T],
                         res.real.free_energy.free_energy_mean)

    keys = jax.random.split(key, steps)
    loop = jax.jit(lambda c: jax.lax.scan(body, c, keys))
    (_, _), (xs, noms, fes) = loop((x0, cs))
    return np.asarray(xs), np.asarray(noms), np.asarray(fes), "tube"


def run_robust(steps, key, noise_scale):
    dyn, cost, sampler, fb = common(noise_scale, robust_cost=True)
    ctrl = RobustMPPI(
        dynamics=dyn, cost=cost, sampler=sampler,
        dt=DT, lam=LAMBDA, alpha=jnp.float32(0.0),
        num_timesteps=T, num_rollouts=K,
        num_candidates=9, samples_per_condition=K // 8,
        value_function_threshold=jnp.float32(20.0), feedback=fb,
    )
    cs = ctrl.init_state(jax.random.PRNGKey(42))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])

    lip = cost.lipschitz_constant_cost()
    vft = ctrl.value_function_threshold

    def body(carry, k):
        x, cs = carry
        # stage 1 re-anchors the nominal via candidate eval and recomputes
        # the DDP gains (updateImportanceSamplingControl, CORL2020.cu:656)
        cs, _ = ctrl.update_importance_sampling(x, cs, 1)
        res, cs = ctrl.solve(x, cs)
        # published feedforward = nominal sequence; feedback tracks the
        # nominal trajectory (CORL2020.cu:686-691)
        u = res.nominal.control_mean[0] + fb.k(
            x, cs.nominal_traj[0], 0, cs.feedback_state
        )
        u = ctrl._clamp_controls(u)
        # the reference's published free-energy bounds (CORL2020.cu:673-681)
        fe_n = res.nominal.free_energy
        nominal_bound = vft + 2.0 * fe_n.free_energy_modified_variance
        real_bound = fe_n.free_energy_mean + lip * jnp.linalg.norm(
            x - cs.nominal_traj[0]
        )
        growth_bound = (
            (vft - fe_n.free_energy_mean)
            + lip * 8.0 * 20.0 * ctrl.compute_df(res)
            + 2.0 * fe_n.free_energy_modified_variance
        )
        x, _ = dyn.step(x, u, 0.0, DT)
        x = dyn.compute_state_disturbance(k, DT, x)
        return (x, cs), (x, cs.nominal_traj,
                         res.real.free_energy.free_energy_mean,
                         jnp.stack([nominal_bound, real_bound, growth_bound]))

    keys = jax.random.split(key, steps)
    loop = jax.jit(lambda c: jax.lax.scan(body, c, keys))
    (_, _), (xs, noms, fes, bounds) = loop((x0, cs))
    np_bounds = np.asarray(bounds)
    return (np.asarray(xs), np.asarray(noms),
            np.asarray(fes), "robust", np_bounds)


def main():
    global K
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000,
                    help="closed-loop steps (reference: 5000)")
    ap.add_argument("--rollouts", type=int, default=K,
                    help="samples per solve (reference: 1024)")
    ap.add_argument("--large-noise", type=float, default=100.0)
    ap.add_argument("--out", default="corl2020_out")
    args = ap.parse_args()
    K = args.rollouts
    os.makedirs(args.out, exist_ok=True)
    key = jax.random.PRNGKey(7)

    runs = [
        run_vanilla(args.steps, key, 1.0, "vanilla"),
        run_vanilla(args.steps, key, args.large_noise, "vanilla_large"),
        run_tube(args.steps, key, args.large_noise),
        run_robust(args.steps, key, args.large_noise),
    ]
    print(f"{'variant':<14} {'tube failures':>13} {'mean |FE|':>10}")
    for run in runs:
        xs, noms, fes, tag = run[:4]
        fails = int(np.sum(tube_failure(xs)))
        np.save(os.path.join(args.out, f"{tag}_state_trajectory.npy"), xs)
        np.save(os.path.join(args.out, f"{tag}_nominal_trajectory.npy"), noms)
        np.save(os.path.join(args.out, f"{tag}_free_energy.npy"), fes)
        if len(run) > 4:  # robust: free-energy bound telemetry
            np.save(os.path.join(args.out, f"{tag}_free_energy_bounds.npy"),
                    run[4])
        print(f"{tag:<14} {fails:>13} {np.mean(np.abs(fes)):>10.3f}")
    print(f"traces saved to {args.out}/")


if __name__ == "__main__":
    main()
