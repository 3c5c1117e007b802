"""Cartpole swing-up timing example — parity with the reference
``examples/cartpole_example.cu:29-88``: 5000 sequential solves at K=2048,
T=100, dt=0.02, 1 optimization iteration, printing the total/average solve
time and the final state.

TPU-native twist: the closed loop (slide -> solve -> step) runs as a
``lax.scan`` inside one jitted program, so the wall clock measures the chip,
not the dispatch tunnel. Pass ``--steps N`` to shorten.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import argparse
import time

import jax
import jax.numpy as jnp

from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import CartpoleQuadraticCost
from mppi_generic_tpu.models import CartpoleDynamics
from mppi_generic_tpu.sampling import GaussianDistribution


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--rollouts", type=int, default=2048)
    args = ap.parse_args()

    # exact reference setup (cartpole_example.cu:9-48): control range +-5,
    # coeffs {x: 50, xdot: 10, theta: 200, thetadot: 1}, goal [20, 0, pi, 0]
    # (swing up AND drive the cart to x = 20), lambda 0.25, sigma 5, zero
    # control-cost coefficient
    ctrl = VanillaMPPI(
        dynamics=CartpoleDynamics.create(control_ranges=[[-5.0, 5.0]]),
        cost=CartpoleQuadraticCost(
            coeffs=jnp.array([50.0, 10.0, 200.0, 1.0]),
            desired_state=jnp.array([20.0, 0.0, jnp.pi, 0.0]),
        ),
        sampler=GaussianDistribution.create(
            std_dev=[5.0], control_cost_coeff=[0.0]
        ),
        dt=jnp.float32(0.02),
        lam=jnp.float32(0.25),
        alpha=jnp.float32(0.0),
        num_timesteps=100,
        num_rollouts=args.rollouts,
        num_iters=1,
        kernel="pallas_fused" if jax.default_backend() == "tpu" else "combined",
    )
    key = (jax.random.key(0, impl="rbg") if jax.default_backend() == "tpu"
           else jax.random.PRNGKey(0))
    cs = ctrl.init_state(key)
    x0 = jnp.zeros(4)  # pole down

    def body(carry, _):
        x, cs = carry
        cs = ctrl.slide_control_sequence(cs, 1)
        res, cs = ctrl.solve(x, cs)
        x, _ = ctrl.dynamics.step(x, res.control_mean[0], 0.0, ctrl.dt)
        return (x, cs), res.baseline

    loop = jax.jit(
        lambda x, cs: jax.lax.scan(body, (x, cs), None, length=args.steps)
    )
    (xf, _), baselines = loop(x0, cs)  # compile + run once
    jax.block_until_ready(xf)

    t0 = time.perf_counter()
    (xf, _), baselines = loop(x0, cs)
    jax.block_until_ready(xf)
    total = time.perf_counter() - t0

    print(f"backend: {jax.default_backend()}  kernel: {ctrl.kernel}")
    print(f"total time: {total:.3f} s for {args.steps} solves")
    print(f"average optimization time: {total / args.steps * 1e3:.4f} ms")
    print(f"final state [x, xdot, theta, thetadot]: "
          f"{[round(float(v), 3) for v in xf]}")
    print(f"final baseline: {float(baselines[-1]):.3f}")


if __name__ == "__main__":
    main()
