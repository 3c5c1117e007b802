"""TPU-only kernel self-checks — the compiled-path complement of the CPU
pytest suite (which runs the Pallas kernels in interpret mode and cannot
reach the hardware PRNG). Run on a real TPU:

    python scripts/tpu_selfcheck.py

or as the pytest TPU tier (tests/test_tpu_kernels.py wraps these same
checks, VERDICT r1 item 6):

    MPPI_TPU_TESTS=1 python -m pytest -m tpu

Checks:
1. fused rollout kernel (compiled) == XLA combined scan, bit-tolerant;
2. fused sample+rollout kernel: carve-outs exact, N(0,1) statistics,
   cost self-consistency against the XLA path re-scoring the emitted U;
   same for NLN and Smooth-MPPI in-kernel generation;
3. Pallas Riccati backward kernel vs an exact-f32 XLA oracle;
4. full-solve parity pallas vs combined.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.ops import rollout_combined
from mppi_generic_tpu.ops.pallas_rollout import (
    fused_rollout_costs,
    fused_sample_rollout_costs,
)
from mppi_generic_tpu.sampling import GaussianDistribution, NLNDistribution

K, T = 1024, 50
DT = 0.02


def _fixtures():
    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    cost = DoubleIntegratorCircleCost()
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    return dyn, cost, x0, jnp.float32(DT)


def check_fused_rollout_parity():
    """Compiled fused rollout vs XLA combined scan."""
    dyn, cost, x0, dt = _fixtures()
    U = jax.random.normal(jax.random.PRNGKey(0), (K, T, 2)) * 0.5
    c_ref, _, cr_ref = rollout_combined(dyn, cost, x0, U, dt)
    c_p, cr_p = fused_rollout_costs(dyn, cost, x0, U, dt)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    assert bool(jnp.all(cr_p == cr_ref))


def check_fused_sample_self_consistency():
    """Fused sample+rollout: carve-outs exact, noise std, cost equals the
    XLA path re-scoring the emitted U."""
    dyn, cost, x0, dt = _fixtures()
    samp = GaussianDistribution.create(
        std_dev=[1.0, 0.7], control_cost_coeff=[0.01, 0.02],
        pure_noise_percentage=0.1,
    )
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    costs, crash, U2, _ = fused_sample_rollout_costs(
        dyn, cost, samp, x0, mean, jnp.int32(1234), dt, 1.0, 0.0, K,
        optimization_stride=3,
    )
    np.testing.assert_allclose(np.asarray(U2[0]), np.asarray(mean), atol=1e-6)
    np.testing.assert_allclose(np.asarray(U2[5, :3]), np.asarray(mean[:3]),
                               atol=1e-6)
    body = np.asarray(U2[1: int(0.9 * K), 10:, 0])
    assert abs(body.std() - 1.0) < 0.05, f"noise std {body.std()}"
    c_r, _, cr_r = rollout_combined(dyn, cost, x0, U2, dt)
    lr = samp.likelihood_ratio_cost(U2, mean, 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(c_r + lr / T),
                               rtol=1e-3, atol=1e-3)
    assert bool(jnp.all(crash == cr_r))


def check_hw_prng_statistics():
    """Hardware-PRNG N(0,1) draws: correct moments, independent tiles, no
    temporal autocorrelation (the reference validates its samplers
    statistically the same way, colored_noise_tests.cu)."""
    dyn, cost, x0, dt = _fixtures()
    K2, T2 = 4096, 64
    zero_mean = jnp.zeros((T2, 2))
    unit = GaussianDistribution.create(std_dev=[1.0, 1.0])
    # unclamped dynamics: the in-kernel constraint clamp would truncate the
    # tails and bias the moment estimates
    dyn_free = DoubleIntegratorDynamics.create()
    _, _, U3, _ = fused_sample_rollout_costs(
        dyn_free, cost, unit, x0, zero_mean, jnp.int32(99), dt, 1.0, 0.0, K2,
    )
    eps = np.asarray(U3[1:])  # sample 0 is the (zero) mean
    flat = eps.reshape(-1)
    assert abs(flat.mean()) < 0.01, flat.mean()
    assert abs(flat.std() - 1.0) < 0.01, flat.std()
    skew = float((flat**3).mean())
    kurt = float((flat**4).mean())
    assert abs(skew) < 0.02, skew
    assert abs(kurt - 3.0) < 0.1, kurt
    # independence across sample tiles (distinct per-tile seeds)
    a, b = eps[:2047].reshape(-1), eps[2048:4095].reshape(-1)
    r_tiles = float(np.corrcoef(a, b)[0, 1])
    assert abs(r_tiles) < 0.01, r_tiles
    # temporal whiteness along the horizon
    r_time = float(np.corrcoef(eps[:, :-1, 0].ravel(),
                               eps[:, 1:, 0].ravel())[0, 1])
    assert abs(r_time) < 0.01, r_time
    # channel independence
    r_ch = float(np.corrcoef(eps[..., 0].ravel(), eps[..., 1].ravel())[0, 1])
    assert abs(r_ch) < 0.01, r_ch


def check_fused_nln_sampling():
    """Fused NLN (log-MPPI): carve-outs, moment battery, cost
    self-consistency. For u = z1 * exp(s * z2), z1, z2 ~ N(0,1) iid:
    E[u]=0, Var[u]=exp(2 s^2), kurtosis = 3 exp(4 s^2)."""
    dyn, cost, x0, dt = _fixtures()
    dyn_free = DoubleIntegratorDynamics.create()
    K2 = 4096
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    s_ln = 0.4
    nln = NLNDistribution.create(std_dev=[s_ln, s_ln],
                                 control_cost_coeff=[0.01, 0.02],
                                 pure_noise_percentage=0.1)
    costs_n, crash_n, U4, _ = fused_sample_rollout_costs(
        dyn_free, cost, nln, x0, mean, jnp.int32(77), dt, 1.0, 0.0, K2,
        optimization_stride=3,
    )
    np.testing.assert_allclose(np.asarray(U4[0]), np.asarray(mean[:T]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(U4[5, :3]), np.asarray(mean[:3]),
                               atol=1e-6)
    eps_n = (np.asarray(U4[1: int(0.9 * K2), 10:]) - np.asarray(mean)[10:])
    eps_n = eps_n / s_ln  # undo the carve-out's sigma multiply (= std_dev)
    flat_n = eps_n.reshape(-1)
    var_want = float(np.exp(2 * s_ln**2))
    kurt_want = 3.0 * float(np.exp(4 * s_ln**2))
    kurt_n = float((flat_n**4).mean()) / float((flat_n**2).mean()) ** 2
    assert abs(flat_n.mean()) < 0.02, flat_n.mean()
    assert abs(flat_n.var() / var_want - 1.0) < 0.03, (flat_n.var(), var_want)
    assert abs(kurt_n / kurt_want - 1.0) < 0.25, (kurt_n, kurt_want)
    c_n, _, cr_n = rollout_combined(dyn_free, cost, x0, U4, dt)
    lr_n = nln.likelihood_ratio_cost(U4, mean[:T], 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(costs_n),
                               np.asarray(c_n + lr_n / T),
                               rtol=1e-3, atol=1e-3)
    assert bool(jnp.all(crash_n == cr_n))


def check_fused_smooth_sampling():
    """Fused Smooth-MPPI: derivative-space carve-outs, the integration
    identity U = mean + W*dt_smooth, cost self-consistency."""
    from mppi_generic_tpu.sampling import SmoothMPPIDistribution

    dyn, cost, x0, dt = _fixtures()
    dyn_free = DoubleIntegratorDynamics.create()
    K2 = 4096
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    sm = SmoothMPPIDistribution.create(
        std_dev=[2.0, 2.0], num_timesteps=T, dt=0.2,
        control_cost_coeff=[0.01, 0.02], pure_noise_percentage=0.1,
    )
    dmean = jnp.tile(jnp.array([0.5, -0.4]), (T, 1))
    costs_s, crash_s, U5, W5 = fused_sample_rollout_costs(
        dyn_free, cost, sm, x0, mean, jnp.int32(55), dt, 1.0, 0.0, K2,
        optimization_stride=3, sampler_state=dmean,
    )
    np.testing.assert_allclose(np.asarray(W5[0]), np.asarray(dmean),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(W5[7, :3]), np.asarray(dmean[:3]),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(U5), np.asarray(mean[None] + W5 * sm.dt_smooth),
        rtol=1e-5, atol=1e-6)
    # body derivative noise ~ N(dmean, std^2); pure tail ~ N(0, std^2)
    w_body = np.asarray(W5[1: int(0.9 * K2), 10:])
    assert np.abs(w_body.mean(axis=(0, 1)) - np.asarray(dmean[0])).max() < 0.05
    assert abs(w_body.std() - 2.0) < 0.05, w_body.std()
    w_pure = np.asarray(W5[int(0.9 * K2) + 1:])
    assert np.abs(w_pure.mean(axis=(0, 1))).max() < 0.05
    c_s, _, cr_s = rollout_combined(dyn_free, cost, x0, U5, dt)
    lr_s = sm.likelihood_ratio_cost(U5, mean[:T], 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(costs_s),
                               np.asarray(c_s + lr_s / T),
                               rtol=1e-3, atol=1e-3)
    assert bool(jnp.all(crash_s == cr_s))


def check_pallas_riccati():
    """Pallas Riccati backward kernel vs a HIGHEST-precision XLA oracle
    (the default-precision XLA scan itself drifts via bf16 MXU passes on
    tiny matrices, so compare both against exact-f32 matmuls)."""
    from mppi_generic_tpu.ops.pallas_riccati import riccati_backward

    Tr, Sr, Cr = 64, 4, 2
    kr = jax.random.split(jax.random.PRNGKey(7), 8)
    As = jnp.eye(Sr) + 0.05 * jax.random.normal(kr[0], (Tr, Sr, Sr))
    Bs = 0.1 * jax.random.normal(kr[1], (Tr, Sr, Cr))
    dLx = jax.random.normal(kr[2], (Tr, Sr))
    dLu = jax.random.normal(kr[3], (Tr, Cr))
    Qr, Rr, Qfr = jnp.eye(Sr), jnp.eye(Cr), 2 * jnp.eye(Sr)
    Vx_T = jax.random.normal(kr[4], (Sr,))
    dtr = 0.02
    mm = lambda a, b: jnp.matmul(a, b, precision="float32")

    def bwd_hp(carry, inp):
        Vx, Vxx = carry
        A, B, lx, lu = inp
        qx = lx * dtr + mm(A.T, Vx[:, None])[:, 0]
        qu = lu * dtr + mm(B.T, Vx[:, None])[:, 0]
        VA = mm(Vxx, A)
        qux = mm(B.T, VA)
        qxx = Qr * dtr + mm(A.T, VA)
        quu = Rr * dtr + mm(B.T, mm(Vxx, B)) + 1e-6 * jnp.eye(Cr)
        Kk = -jnp.linalg.solve(quu, qux)
        kk = -jnp.linalg.solve(quu, qu)
        Vxxn = qxx + mm(qux.T, Kk)
        Vxxn = 0.5 * (Vxxn + Vxxn.T)
        return (qx + mm(qux.T, kk[:, None])[:, 0], Vxxn), (Kk, kk)

    (_, _), (K_hp, k_hp) = jax.lax.scan(
        bwd_hp, (Vx_T, Qfr),
        (As[:-1], Bs[:-1], dLx[:-1], dLu[:-1]), reverse=True)
    K_pal, k_pal = riccati_backward(As, Bs, dLx, dLu, Qr, Rr, Qfr, Vx_T, dtr)
    np.testing.assert_allclose(np.asarray(K_pal[:-1]), np.asarray(K_hp),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(k_pal[:-1]), np.asarray(k_hp),
                               rtol=2e-4, atol=2e-5)


def check_full_solve_parity():
    """Full-solve parity pallas vs combined (same key)."""
    dyn, cost, x0, dt = _fixtures()

    def ctrl(kernel):
        return VanillaMPPI(
            dynamics=dyn, cost=cost,
            sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
            dt=dt, lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
            num_timesteps=T, num_rollouts=K, num_iters=1, kernel=kernel,
        )

    cs = ctrl("combined").init_state(jax.random.PRNGKey(0))
    r_ref, _ = jax.jit(ctrl("combined").solve)(x0, cs)
    r_pal, _ = jax.jit(ctrl("pallas").solve)(x0, cs)
    np.testing.assert_allclose(np.asarray(r_pal.control_mean),
                               np.asarray(r_ref.control_mean),
                               rtol=1e-3, atol=1e-4)


CHECKS = [
    check_fused_rollout_parity,
    check_fused_sample_self_consistency,
    check_hw_prng_statistics,
    check_fused_nln_sampling,
    check_fused_smooth_sampling,
    check_pallas_riccati,
    check_full_solve_parity,
]


def main():
    assert jax.default_backend() == "tpu", "run on a TPU backend"
    for fn in CHECKS:
        fn()
        print(f"{fn.__name__}: OK")
    print("ALL TPU SELF-CHECKS PASSED")


def check_riccati_ladder():
    """Fused backward+alpha-ladder kernel (compiled) vs the XLA iLQR
    iteration — gains, accepted trajectory, and ladder costs."""
    from mppi_generic_tpu.feedback.ilqr import _alpha_ladder, ilqr_tracking
    from mppi_generic_tpu.models import DoubleIntegratorDynamics
    from mppi_generic_tpu.ops.pallas_riccati import riccati_ladder_solve

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-2, 2], [-2, 2]])
    S_, C_, T_ = 4, 2, 50
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    goal_x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (T_, S_))
    goal_u = jnp.zeros((T_, C_))
    u_init = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (T_, C_))
    Q, R, Qf = jnp.eye(S_), 0.5 * jnp.eye(C_), 3 * jnp.eye(S_)
    dtf = jnp.float32(0.02)

    ref = ilqr_tracking(dyn, x0, u_init, goal_x, goal_u, Q, R, Qf, dtf,
                        use_pallas=False)
    fused = ilqr_tracking(dyn, x0, u_init, goal_x, goal_u, Q, R, Qf, dtf,
                          use_pallas=True)
    np.testing.assert_allclose(np.asarray(fused.gains),
                               np.asarray(ref.gains), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fused.x_traj),
                               np.asarray(ref.x_traj), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(fused.total_cost),
                               float(ref.total_cost), rtol=1e-3)


def check_colored_in_kernel_lr():
    """Colored-noise solve through the fused kernel with in-kernel LR
    accumulation matches the XLA combined path."""
    from mppi_generic_tpu.sampling import ColoredNoiseDistribution

    dyn, cost, x0, dt = _fixtures()
    samp = ColoredNoiseDistribution.create(
        std_dev=[1.0, 0.7], exponents=[1.0, 2.0],
        control_cost_coeff=[0.02, 0.01], pure_noise_percentage=0.1,
    )

    def ctrl(kernel):
        return VanillaMPPI(
            dynamics=dyn, cost=cost, sampler=samp,
            dt=dt, lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
            num_timesteps=T, num_rollouts=K, num_iters=1, kernel=kernel,
        )

    cs = ctrl("combined").init_state(jax.random.PRNGKey(0))
    r_ref, _ = jax.jit(ctrl("combined").solve)(x0, cs)
    r_pal, _ = jax.jit(ctrl("pallas").solve)(x0, cs)
    np.testing.assert_allclose(np.asarray(r_pal.costs),
                               np.asarray(r_ref.costs),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_pal.control_mean),
                               np.asarray(r_ref.control_mean),
                               rtol=1e-3, atol=1e-4)


CHECKS.append(check_riccati_ladder)
CHECKS.append(check_colored_in_kernel_lr)


def check_recurrent_models_fused_kernel():
    """Compiled fused-kernel parity for the 26-state LSTM-uncertainty and
    suspension models (3 recurrent nets + covariance block in-kernel)."""
    from mppi_generic_tpu.costs import ARStandardCost
    from mppi_generic_tpu.models import (
        RacerDubinsElevationLSTMUncertainty,
        RacerDubinsElevationSuspension,
    )

    cost = ARStandardCost(output_indices=(2, 3, 5, 6, 0, 1))
    K2, T2 = 256, 16
    U = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (K2, T2, 2))
    for cls in (RacerDubinsElevationLSTMUncertainty,
                RacerDubinsElevationSuspension):
        dyn = cls.create()
        x0 = dyn.get_zero_state().at[0].set(3.0)
        c_ref, _, _ = rollout_combined(dyn, cost, x0, U, jnp.float32(0.02))
        c_p, _ = fused_rollout_costs(dyn, cost, x0, U, jnp.float32(0.02))
        np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                                   rtol=1e-4, atol=1e-4)


CHECKS.append(check_recurrent_models_fused_kernel)


def check_quadrotor_and_suspension_fused_kernel():
    """Compiled fused-kernel parity for the quadrotor (quaternion state,
    waypoint map cost) and the 14-state rigid-body racer suspension —
    with these the whole flat-ground model zoo is kernel-admissible."""
    from mppi_generic_tpu.costs import ARStandardCost, QuadrotorMapCost
    from mppi_generic_tpu.models import (
        QuadrotorDynamics,
        RacerSuspensionDynamics,
    )

    K2, T2 = 256, 16
    dyn = QuadrotorDynamics.create(control_ranges=[[-3, 3]] * 3 + [[0, 20]])
    qcost = QuadrotorMapCost(
        dist_to_waypoint_coeff=jnp.float32(4.0)
    ).update_waypoint(2.0, 0.0, 0.0, 0.0)
    x0q = dyn.get_zero_state()
    Uq = jnp.tile(jnp.array([0.0, 0.0, 0.0, 9.81]), (K2, T2, 1)) + (
        0.3 * jax.random.normal(jax.random.PRNGKey(0), (K2, T2, 4))
    )
    c_ref, _, _ = rollout_combined(dyn, qcost, x0q, Uq, jnp.float32(0.02))
    c_p, _ = fused_rollout_costs(dyn, qcost, x0q, Uq, jnp.float32(0.02))
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-3, atol=1e-3)

    sus = RacerSuspensionDynamics.create()
    scost = ARStandardCost(output_indices=(0, 1, 5, 6, 3, 4))
    x0s = sus.get_zero_state()
    Us = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (K2, T2, 2))
    s_ref, _, _ = rollout_combined(sus, scost, x0s, Us, jnp.float32(0.02))
    s_p, _ = fused_rollout_costs(sus, scost, x0s, Us, jnp.float32(0.02))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_ref),
                               rtol=1e-3, atol=1e-3)


CHECKS.append(check_quadrotor_and_suspension_fused_kernel)


def check_fused_solve_iteration():
    """The fully-fused solve-iteration kernel (ops/pallas_solve.py):
    in-kernel normExp weights + flash weighted-mean epilogue must agree
    with the XLA epilogue re-scoring the kernel's own emitted samples —
    exact epilogue parity given identical U, plus carve-out and cost
    self-consistency, for Gaussian and NLN generation."""
    from mppi_generic_tpu.ops.pallas_solve import fused_solve_iteration
    from mppi_generic_tpu.ops.weights import norm_exp_weights

    dyn, cost, x0, dt = _fixtures()
    lam = 1.0
    for samp, tag in (
        (GaussianDistribution.create(
            std_dev=[1.0, 0.7], control_cost_coeff=[0.01, 0.02],
            pure_noise_percentage=0.1), "gaussian"),
        (NLNDistribution.create(
            std_dev=[0.4, 0.4], control_cost_coeff=[0.01, 0.02],
            pure_noise_percentage=0.1), "nln"),
    ):
        mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
        costs, crash, new_mean, baseline, eta, U = fused_solve_iteration(
            dyn, cost, samp, x0, mean, jnp.int32(1234), dt, lam, 0.0, K,
            optimization_stride=3, return_samples=True,
        )
        # carve-outs: sample 0 == mean, frozen head for all samples
        np.testing.assert_allclose(np.asarray(U[0]), np.asarray(mean),
                                   atol=1e-6, err_msg=tag)
        np.testing.assert_allclose(np.asarray(U[5, :3]),
                                   np.asarray(mean[:3]), atol=1e-6,
                                   err_msg=tag)
        # cost self-consistency: XLA re-score of the emitted samples
        c_r, _, cr_r = rollout_combined(dyn, cost, x0, U, dt)
        lr = samp.likelihood_ratio_cost(U, mean, lam, 0.0)
        np.testing.assert_allclose(np.asarray(costs),
                                   np.asarray(c_r + lr / T),
                                   rtol=1e-3, atol=1e-3, err_msg=tag)
        assert bool(jnp.all(crash == cr_r)), tag
        # epilogue parity: baseline / eta / weighted mean vs XLA given the
        # SAME costs + samples (flash online-softmax must be exact)
        base_r = float(jnp.min(costs))
        w_r = norm_exp_weights(costs, lam, base_r)
        eta_r = float(jnp.sum(w_r))
        mean_r = jnp.sum((w_r / eta_r)[:, None, None] * U, axis=0)
        np.testing.assert_allclose(float(baseline), base_r, rtol=1e-6,
                                   err_msg=tag)
        np.testing.assert_allclose(float(eta), eta_r, rtol=1e-4,
                                   err_msg=tag)
        np.testing.assert_allclose(np.asarray(new_mean), np.asarray(mean_r),
                                   rtol=1e-4, atol=1e-5, err_msg=tag)

    # the controller route: one full pallas_fused solve must run finite and
    # its SolveResult must be self-consistent (weights from kernel costs)
    samp = GaussianDistribution.create(std_dev=[1.0, 1.0])
    ctrl = VanillaMPPI(
        dynamics=dyn, cost=cost, sampler=samp,
        dt=dt, lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=T, num_rollouts=K, num_iters=1, kernel="pallas_fused",
    )
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    res, _ = jax.jit(ctrl.solve)(x0, cs)
    assert bool(jnp.all(jnp.isfinite(res.control_mean)))
    assert bool(jnp.all(jnp.isfinite(res.costs)))
    np.testing.assert_allclose(float(res.normalizer),
                               float(jnp.sum(res.weights)), rtol=1e-4)


CHECKS.append(check_fused_solve_iteration)


def check_split_cost_fused_solve():
    """The split-cost fused-solve variant (dynamics-only sequential loop +
    time-vectorized cost pass, the in-kernel rolloutDynamicsKernel +
    rolloutCostKernel analog, mppi_common.cu:148-362) must emit the SAME
    samples as the combined form (shared PRNG stream) and agree on costs /
    weighted mean up to summation reassociation. Covers the DI cost
    (t-dependent discount term) and the cartpole quadratic, the VMEM-fit
    fallback at an oversized forced tile, and the ineligibility refusal."""
    from mppi_generic_tpu.costs.cartpole import CartpoleQuadraticCost
    from mppi_generic_tpu.models.cartpole import CartpoleDynamics
    from mppi_generic_tpu.ops.pallas_rollout import PallasIncompatible
    from mppi_generic_tpu.ops.pallas_solve import fused_solve_iteration

    dyn, cost, x0, dt = _fixtures()
    cp = CartpoleDynamics.create()
    cpcost = CartpoleQuadraticCost()
    for d, c, x, lam in ((dyn, cost, x0, 1.0),
                         (cp, cpcost, cp.get_zero_state(), 200.0)):
        samp = GaussianDistribution.create(
            std_dev=[1.0] * d.CONTROL_DIM,
            control_cost_coeff=[0.01] * d.CONTROL_DIM,
            pure_noise_percentage=0.1,
        )
        mean = jnp.tile(jnp.linspace(-0.2, 0.3, d.CONTROL_DIM), (T, 1))
        outs = {}
        for split in (False, True):
            outs[split] = fused_solve_iteration(
                d, c, samp, x, mean, jnp.int32(77), dt, lam, 0.0, K,
                optimization_stride=2, return_samples=True,
                split_cost=split,
            )
        c0, _, m0, b0, e0, U0 = (np.asarray(v) for v in outs[False])
        c1, _, m1, b1, e1, U1 = (np.asarray(v) for v in outs[True])
        np.testing.assert_array_equal(U0, U1)  # same PRNG stream
        np.testing.assert_allclose(c1, c0, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(m1, m0, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(b1, b0, rtol=2e-4)
        np.testing.assert_allclose(e1, e0, rtol=2e-3)

    # crash-bearing / time-indexed costs must refuse a forced split
    from mppi_generic_tpu.costs import QuadraticCost

    traj_cost = QuadraticCost.create(goal=jnp.zeros((T, 4)))
    samp = GaussianDistribution.create(std_dev=[1.0, 1.0])
    try:
        fused_solve_iteration(
            dyn, traj_cost, samp, x0, jnp.zeros((T, 2)), jnp.int32(0),
            dt, 1.0, 0.0, K, split_cost=True,
        )
    except PallasIncompatible as e:
        assert "time_parallel_cost" in str(e)
    else:  # pragma: no cover
        raise AssertionError("forced split on an ineligible cost must raise")


CHECKS.append(check_split_cost_fused_solve)


def check_split_cost_weighted_rollout():
    """The precomputed-U fused paths (fused_rollout_costs /
    fused_weighted_rollout — the colored-noise solve's kernels) must agree
    between the split-cost and combined variants when compiled: costs /
    weighted mean up to summation reassociation, including the in-kernel
    likelihood-ratio term (vectorized from the VMEM table under split) and
    the per-sample-x0 candidate-eval pattern."""
    from mppi_generic_tpu.ops.pallas_rollout import (
        fused_rollout_costs,
        fused_weighted_rollout,
    )

    dyn, cost, x0, dt = _fixtures()
    C = dyn.CONTROL_DIM
    U = jax.random.normal(jax.random.PRNGKey(5), (K, T, C)) * 0.5
    mean = jnp.tile(jnp.linspace(-0.2, 0.3, C), (T, 1))
    lrp = (mean, jnp.ones((T, C)), jnp.full((C,), 0.01), 1.0, 0.0, 0.9 * K)

    for lr in (None, lrp):
        c0, _ = fused_rollout_costs(dyn, cost, x0, U, dt, lr_params=lr,
                                    split_cost=False)
        c1, _ = fused_rollout_costs(dyn, cost, x0, U, dt, lr_params=lr,
                                    split_cost=True)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                                   rtol=2e-4, atol=2e-4)

    o0 = fused_weighted_rollout(dyn, cost, x0, U, dt, 1.0, lr_params=lrp,
                                split_cost=False)
    o1 = fused_weighted_rollout(dyn, cost, x0, U, dt, 1.0, lr_params=lrp,
                                split_cost=True)
    for a, b in zip(o0, o1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)

    # per-sample x0 (the RMPPI candidate-eval pattern)
    x0s = x0[None] + 0.01 * jax.random.normal(jax.random.PRNGKey(6),
                                              (K, dyn.STATE_DIM))
    c0, _ = fused_rollout_costs(dyn, cost, x0s, U, dt, split_cost=False)
    c1, _ = fused_rollout_costs(dyn, cost, x0s, U, dt, split_cost=True)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=2e-4, atol=2e-4)


CHECKS.append(check_split_cost_weighted_rollout)


def check_sticky_crash_split():
    """Compiled parity for the sticky-prefix-crash split pass
    (Cost.time_parallel_crash — dual evaluation + unrolled prefix-OR):
    the AutoRally track cost on the bicycle-slip model with a boundary
    stripe at the edge of reach, so crash flags mix across samples and
    crash timing crosses chunk boundaries. Crash must match BITWISE."""
    from mppi_generic_tpu.costs.autorally import ARStandardCost
    from mppi_generic_tpu.maps.texture import MapTexture2D
    from mppi_generic_tpu.models.bicycle_slip import BicycleSlipDynamics
    from mppi_generic_tpu.ops.pallas_rollout import fused_rollout_costs

    data = np.zeros((32, 32), np.float32)
    data[:, 21:] = 1.0
    tex = MapTexture2D.create(data, origin=(-16, -16, 0), resolution=1.0)
    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=tex, output_indices=(0, 1, 2, 8, 5, 6))
    x0 = dyn.get_zero_state().at[5].set(4.0)
    Kc, Tc_ = 384, 48
    U = jax.random.normal(jax.random.PRNGKey(0),
                          (Kc, Tc_, dyn.CONTROL_DIM)) * 0.9
    c0, cr0 = fused_rollout_costs(dyn, cost, x0, U, 0.02, split_cost=False)
    c1, cr1 = fused_rollout_costs(dyn, cost, x0, U, 0.02, split_cost=True)
    n_crash = int(np.asarray(cr0).sum())
    assert 0 < n_crash < Kc, n_crash
    np.testing.assert_array_equal(np.asarray(cr1), np.asarray(cr0))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=3e-5, atol=3e-3)


CHECKS.append(check_sticky_crash_split)


def check_vmem_table_long_horizon():
    """Long horizons keep the fused kernels via the sublane-stacked
    (T, R8, LANES) VMEM parameter table (VERDICT r2 item 4): compiled
    T=1024 in-kernel-LR parity and T=512 fused-RMPPI solve parity, both
    past the ~13 KB SMEM scalar budget that used to force the XLA
    fallback (reference per-timestep parameter reads in rolloutKernel,
    core/mppi_common.cu:98-137, have no horizon ceiling; now neither
    does this kernel until the 4 MB VMEM table budget)."""
    from mppi_generic_tpu.controllers import RobustMPPI
    from mppi_generic_tpu.feedback import DDPFeedback
    from mppi_generic_tpu.ops.pallas_rollout import _table_mode

    dyn, cost, x0, dt = _fixtures()
    K2, T2 = 256, 1024
    assert _table_mode((T2, 2), (T2, 2)) == "vmem"
    samp = GaussianDistribution.create(
        std_dev=[1.0, 0.7], control_cost_coeff=[0.02, 0.01],
        pure_noise_percentage=0.25,
    )
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T2, 1))
    U = mean[None] + 0.3 * jax.random.normal(jax.random.PRNGKey(0),
                                             (K2, T2, 2))
    lam, alpha = jnp.float32(1.3), jnp.float32(0.2)
    base, crash0 = fused_rollout_costs(dyn, cost, x0, U, dt)
    lr = samp.likelihood_ratio_cost(U, mean, lam, alpha)
    fused, crash1 = fused_rollout_costs(
        dyn, cost, x0, U, dt,
        lr_params=(mean, samp._sigma(T2, 0), samp.control_cost_coeff,
                   lam, alpha, (1.0 - samp.pure_noise_percentage) * K2),
    )
    np.testing.assert_allclose(np.asarray(fused),
                               np.asarray(base + lr / T2),
                               rtol=1e-4, atol=1e-5)
    assert bool(jnp.all(crash0 == crash1))

    # fused RMPPI at T=512: the (T, C*S) gains table is 16 KB > SMEM
    T3 = 512
    assert _table_mode((T3, 2 * 4), (T3, 2)) == "vmem"

    def rctrl(kernel):
        return RobustMPPI(
            dynamics=dyn, cost=cost,
            sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
            num_timesteps=T3, num_rollouts=256,
            num_candidates=3, samples_per_condition=16,
            value_function_threshold=jnp.float32(50.0),
            feedback=DDPFeedback.create(dyn, 0.02), kernel=kernel,
        )

    cs = rctrl("combined").init_state(jax.random.PRNGKey(1))
    x0r = jnp.array([2.0, 0.0, 0.0, 1.0])
    res_p, _ = jax.jit(rctrl("pallas").solve)(x0r, cs)
    res_c, _ = jax.jit(rctrl("combined").solve)(x0r, cs)
    assert bool(jnp.isfinite(res_p.real.baseline))
    np.testing.assert_allclose(np.asarray(res_p.real.control_mean),
                               np.asarray(res_c.real.control_mean),
                               rtol=1e-3, atol=1e-4)


CHECKS.append(check_vmem_table_long_horizon)




def check_in_kernel_map_bilinear():
    """Round 4: the in-kernel tent-mask map bilinear — a map-bearing track
    cost AND elevation-settling dynamics through the compiled fused kernel
    vs the XLA combined scan (costs to float tolerance, crash bitwise).
    The compiled analog of tests/test_pallas_rollout.py::test_map_bearing_*."""
    from mppi_generic_tpu.costs import ARStandardCost
    from mppi_generic_tpu.maps.texture import MapTexture2D
    from mppi_generic_tpu.models import (
        BicycleSlipDynamics,
        RacerDubinsElevationDynamics,
    )

    rng = np.random.RandomState(5)
    m = (0.4 * np.abs(rng.randn(128, 128))).astype("f")
    m[64:, 66:] = 3.0
    tex = MapTexture2D.create(m, origin=(-64, -64, 0), resolution=1.0)

    dyn = BicycleSlipDynamics.create()
    cost = ARStandardCost(costmap=tex, output_indices=(0, 1, 2, 8, 5, 6),
                          boundary_threshold=jnp.float32(1.5))
    x0 = jnp.zeros(dyn.STATE_DIM).at[5].set(3.0)
    U = jax.random.normal(jax.random.PRNGKey(2), (K, T, 2)) * 0.4
    c_ref, _, cr_ref = rollout_combined(dyn, cost, x0, U, jnp.float32(DT))
    c_p, cr_p = fused_rollout_costs(dyn, cost, x0, U, jnp.float32(DT))
    assert int(jnp.sum(cr_ref)) > 0, "scenario must exercise map crashes"
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)
    assert bool(jnp.all(cr_p == cr_ref))

    elev = MapTexture2D.create(
        (0.05 * rng.randn(128, 128)).astype("f"), origin=(-64, -64, 0),
        resolution=1.0,
    )
    dyn2 = RacerDubinsElevationDynamics.create(elevation_map=elev)
    cost2 = ARStandardCost(costmap=tex, output_indices=(2, 3, 5, 6, 0, 1))
    x02 = jnp.zeros(dyn2.STATE_DIM).at[0].set(3.0)
    c_ref2, _, cr_ref2 = rollout_combined(dyn2, cost2, x02, U,
                                          jnp.float32(DT))
    c_p2, cr_p2 = fused_rollout_costs(dyn2, cost2, x02, U, jnp.float32(DT))
    np.testing.assert_allclose(np.asarray(c_p2), np.asarray(c_ref2),
                               rtol=1e-4, atol=1e-4)
    assert bool(jnp.all(cr_p2 == cr_ref2))


CHECKS.append(check_in_kernel_map_bilinear)




def check_recurrent_map_fused_solve():
    """Round 4: recurrent (LSTM) dynamics + in-kernel map bilinear on the
    FULLY-fused solve path: the kernel's emitted samples re-scored by the
    XLA pipeline must reproduce its costs/crash, and the flash epilogue
    must match the XLA epilogue given the same samples — on the racer
    LSTM-steering elevation model (the real-vehicle configuration)."""
    from mppi_generic_tpu.costs import ARStandardCost
    from mppi_generic_tpu.maps.texture import MapTexture2D
    from mppi_generic_tpu.models import RacerDubinsElevationLSTMSteering
    from mppi_generic_tpu.ops.pallas_solve import fused_solve_iteration
    from mppi_generic_tpu.ops.weights import norm_exp_weights

    rng = np.random.RandomState(9)
    elev = MapTexture2D.create(
        (0.05 * rng.randn(128, 128)).astype("f"), origin=(-64, -64, 0),
        resolution=1.0,
    )
    tex = MapTexture2D.create(
        np.abs(rng.randn(128, 128)).astype("f"), origin=(-64, -64, 0),
        resolution=1.0,
    )
    dyn = RacerDubinsElevationLSTMSteering.create(elevation_map=elev)
    cost = ARStandardCost(costmap=tex, output_indices=(2, 3, 5, 6, 0, 1))
    samp = GaussianDistribution.create(
        std_dev=[0.3, 0.5], control_cost_coeff=[0.01, 0.02],
        pure_noise_percentage=0.1,
    )
    x0 = jnp.zeros(dyn.STATE_DIM).at[0].set(3.0)
    lam, dt = 1.0, jnp.float32(DT)
    mean = jnp.zeros((T, 2))
    costs, crash, new_mean, baseline, eta, U = fused_solve_iteration(
        dyn, cost, samp, x0, mean, jnp.int32(77), dt, lam, 0.0, K,
        return_samples=True,
    )
    c_r, _, cr_r = rollout_combined(dyn, cost, x0, U, dt)
    lr = samp.likelihood_ratio_cost(U, mean, lam, 0.0)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(c_r + lr / T),
                               rtol=1e-3, atol=1e-3)
    assert bool(jnp.all(crash == cr_r))
    base_r = float(jnp.min(costs))
    w_r = norm_exp_weights(costs, lam, base_r)
    mean_r = jnp.sum((w_r / jnp.sum(w_r))[:, None, None] * U, axis=0)
    np.testing.assert_allclose(float(baseline), base_r, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_mean), np.asarray(mean_r),
                               rtol=1e-4, atol=1e-5)


CHECKS.append(check_recurrent_map_fused_solve)


def check_smooth_flash_epilogue():
    """Round-4 (VERDICT r3 task 5): the Smooth-MPPI in-kernel flash
    epilogue over W must equal the XLA update weighting the emitted W of
    the SAME seed's non-epilogue run — W is generated in-kernel, so both
    paths see identical derivative noise and the comparison is exact up to
    reduction order (smooth-MPPI.cu:203-236 mean update)."""
    from mppi_generic_tpu.ops.weights import norm_exp_weights
    from mppi_generic_tpu.sampling import SmoothMPPIDistribution

    dyn, cost, x0, dt = _fixtures()
    dyn_free = DoubleIntegratorDynamics.create()
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    sm = SmoothMPPIDistribution.create(
        std_dev=[2.0, 2.0], num_timesteps=T, dt=0.2,
        control_cost_coeff=[0.01, 0.02], pure_noise_percentage=0.1,
    )
    dmean = jnp.tile(jnp.array([0.5, -0.4]), (T, 1))
    lam = 1.3
    costs0, crash0, U0, W0 = fused_sample_rollout_costs(
        dyn_free, cost, sm, x0, mean, jnp.int32(77), dt, lam, 0.0, K,
        optimization_stride=2, sampler_state=dmean,
    )
    costs1, crash1, U1, dmean_new, baseline, eta = (
        fused_sample_rollout_costs(
            dyn_free, cost, sm, x0, mean, jnp.int32(77), dt, lam, 0.0, K,
            optimization_stride=2, sampler_state=dmean, epilogue=True,
        )
    )
    np.testing.assert_allclose(np.asarray(costs1), np.asarray(costs0),
                               rtol=1e-6, atol=1e-7)
    assert bool(jnp.all(crash0 == crash1))
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U0),
                               rtol=1e-6, atol=1e-7)
    base_r = float(jnp.min(costs0))
    w_r = norm_exp_weights(costs0, lam, base_r)
    eta_r = float(jnp.sum(w_r))
    dmean_r = jnp.sum((w_r / eta_r)[:, None, None] * W0, axis=0)
    np.testing.assert_allclose(float(baseline), base_r, rtol=1e-6)
    np.testing.assert_allclose(float(eta), eta_r, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dmean_new), np.asarray(dmean_r),
                               rtol=1e-4, atol=1e-5)
    # U-less variant (the return_samples=False solve): U stays in VMEM
    # scratch, the kernel emits only costs/crash + carries
    costs2, crash2, U2, dmean2, base2, eta2 = fused_sample_rollout_costs(
        dyn_free, cost, sm, x0, mean, jnp.int32(77), dt, lam, 0.0, K,
        optimization_stride=2, sampler_state=dmean, epilogue=True,
        emit_samples=False,
    )
    assert U2 is None
    np.testing.assert_allclose(np.asarray(costs2), np.asarray(costs0),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dmean2), np.asarray(dmean_new),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(base2), float(baseline), rtol=1e-6)
    # ragged K: padded tail lanes must not leak phantom rollouts into the
    # softmax max / eta / weighted-W sum (round-4 review finding: the
    # valid mask needs the TILE offset, i*tile_k + lane)
    Kr = 900  # tile 128 -> K_pad 1024: 124 padded lanes
    c0r, _, U0r, W0r = fused_sample_rollout_costs(
        dyn_free, cost, sm, x0, mean, jnp.int32(31), dt, lam, 0.0, Kr,
        sampler_state=dmean, tile_k=128,
    )
    c1r, _, U1r, dmean1, bl1, eta1 = fused_sample_rollout_costs(
        dyn_free, cost, sm, x0, mean, jnp.int32(31), dt, lam, 0.0, Kr,
        sampler_state=dmean, tile_k=128, epilogue=True, emit_samples=False,
    )
    np.testing.assert_allclose(np.asarray(c1r), np.asarray(c0r),
                               rtol=1e-6, atol=1e-7)
    w_rr = norm_exp_weights(c0r, lam, float(jnp.min(c0r)))
    np.testing.assert_allclose(float(bl1), float(jnp.min(c0r)), rtol=1e-6)
    np.testing.assert_allclose(float(eta1), float(jnp.sum(w_rr)), rtol=1e-5)
    dmean_rr = jnp.sum((w_rr / jnp.sum(w_rr))[:, None, None] * W0r, axis=0)
    np.testing.assert_allclose(np.asarray(dmean1), np.asarray(dmean_rr),
                               rtol=1e-4, atol=1e-5)
    # controller-level: kernel="pallas_fused" smooth solve (epilogue path)
    # matches kernel="combined" with the same samples? different RNG
    # sources — instead check the solve runs and returns finite output
    from mppi_generic_tpu.controllers import VanillaMPPI

    ctrl = VanillaMPPI(
        dynamics=dyn_free, cost=cost, sampler=sm,
        dt=dt, lam=jnp.float32(lam), alpha=jnp.float32(0.0),
        num_timesteps=T, num_rollouts=K, num_iters=1,
        kernel="pallas_fused",
    )
    res, _ = jax.jit(ctrl.solve)(x0, ctrl.init_state(
        jax.random.key(3, impl="rbg")))
    assert bool(jnp.all(jnp.isfinite(res.control_mean)))


CHECKS.append(check_smooth_flash_epilogue)


def check_tsallis_fused_epilogue():
    """Round-4 (VERDICT r3 task 6): the two-pass Tsallis fused epilogue
    (Mosaic-compiled — grid revisit, dynamic VMEM scratch indexing, SMEM
    running min) vs the XLA weight pass on the same precomputed U
    (TsallisTransform, mppi_common.cu:958-985)."""
    from mppi_generic_tpu.ops.pallas_rollout import fused_weighted_rollout
    from mppi_generic_tpu.ops.weights import baseline_cost, tsallis_weights

    dyn, cost, x0, dt = _fixtures()
    dyn_free = DoubleIntegratorDynamics.create()
    mean = jnp.tile(jnp.array([0.3, -0.2]), (T, 1))
    gamma, r = jnp.float32(0.2), jnp.float32(2.0)
    U = mean[None] + 0.5 * jax.random.normal(jax.random.PRNGKey(9),
                                             (K, T, 2))
    costs, crash, new_mean, baseline, eta = fused_weighted_rollout(
        dyn_free, cost, x0, U, dt, jnp.float32(1.0), tile_k=256,
        weight_kind="tsallis", weight_params=(gamma, r),
    )
    c_r, _, _ = rollout_combined(dyn_free, cost, x0, U, dt)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(c_r),
                               rtol=1e-5, atol=1e-6)
    bl_r = baseline_cost(c_r)
    w_r = tsallis_weights(c_r, gamma, r, bl_r)
    assert float(jnp.min(w_r)) == 0.0  # clamp branch exercised on chip
    mean_r = jnp.sum((w_r / jnp.sum(w_r))[:, None, None] * U, axis=0)
    np.testing.assert_allclose(float(baseline), float(bl_r), rtol=1e-6)
    np.testing.assert_allclose(float(eta), float(jnp.sum(w_r)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_mean), np.asarray(mean_r),
                               rtol=1e-4, atol=1e-5)


CHECKS.append(check_tsallis_fused_epilogue)


def check_streamed_long_horizon():
    """Round-4 (VERDICT r3 task 8): T=2048 in-kernel-LR — past the resident
    VMEM table budget the stacked table stays HBM-resident and the kernel
    DMA-streams double-buffered chunks (table_mode="stream"). A colored
    solve at T=2048 through the fused kernel must match the XLA combined
    path; horizon length is no longer a fused-kernel boundary."""
    from mppi_generic_tpu.ops.pallas_rollout import _prep_fused_rollout
    from mppi_generic_tpu.sampling import ColoredNoiseDistribution

    dyn, cost, x0, dt = _fixtures()
    T_long, K_long = 2048, 512
    samp = ColoredNoiseDistribution.create(
        std_dev=[1.0, 0.7], exponents=[1.0, 2.0],
        control_cost_coeff=[0.02, 0.01], pure_noise_percentage=0.1,
    )

    def ctrl(kernel):
        return VanillaMPPI(
            dynamics=dyn, cost=cost, sampler=samp,
            dt=dt, lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
            num_timesteps=T_long, num_rollouts=K_long, num_iters=1,
            kernel=kernel, pallas_tile_k=128,
        )

    # the fused path must actually be in stream mode at this horizon
    lr_params = (jnp.zeros((T_long, 2)), jnp.ones((T_long, 2)),
                 samp.control_cost_coeff, 1.0, 0.0, K_long)
    prep = _prep_fused_rollout(
        dyn, cost, x0, jnp.zeros((K_long, T_long, 2)), lr_params,
        128, False, 0, epilogue_scal=None, split_cost=None,
    )
    lr_kw = prep[9]
    assert lr_kw["table_mode"] == "stream", lr_kw["table_mode"]

    cs = ctrl("combined").init_state(jax.random.PRNGKey(0))
    r_ref, _ = jax.jit(ctrl("combined").solve)(x0, cs)
    r_pal, _ = jax.jit(ctrl("pallas").solve)(x0, cs)
    np.testing.assert_allclose(np.asarray(r_pal.costs),
                               np.asarray(r_ref.costs),
                               rtol=1e-4, atol=1e-4)
    # control_mean atol: since round 5 the streamed pallas path also runs
    # the SPLIT cost pass (summation reassociated over T=2048 f32 terms);
    # the exp weights amplify the ~1e-4-relative cost differences into
    # ~1e-3 absolute on the soft-argmin weighted mean (measured max
    # 1.05e-3) — association noise, not a semantic gap (the costs check
    # above stays at 1e-4)
    np.testing.assert_allclose(np.asarray(r_pal.control_mean),
                               np.asarray(r_ref.control_mean),
                               rtol=1e-3, atol=3e-3)


CHECKS.append(check_streamed_long_horizon)


def check_streamed_sampling_rmppi_horizon():
    """Round 5 (VERDICT r4 task 5): the horizon ceiling is gone from the
    SAMPLE-GENERATING and RMPPI kernels too — their per-timestep tables
    (mean/sigma/aux; gains/sigma) DMA-stream through the double buffer
    past the resident-VMEM budget. Hardware checks:

    1. Gaussian HW-PRNG fused sampling at T=1100 (mean tables stream):
       the emitted samples U must reproduce the kernel's own costs/crash
       through the XLA oracle — everything downstream of the draw agrees.
    2. RMPPI augmented rollout at T=640 (the (T, C*S) gain table streams
       well before T=1024): direct parity vs the XLA double-rollout given
       the same U (deterministic).
    """
    from mppi_generic_tpu.ops.pallas_rollout import (
        PallasIncompatible,
        _table_mode,
        fused_rmppi_rollout,
        fused_sample_rollout_costs,
    )
    from mppi_generic_tpu.ops.rollout import (
        rollout_outputs,
        trajectory_state_costs,
    )
    from mppi_generic_tpu.sampling import GaussianDistribution

    dyn, cost, x0, dt = _fixtures()
    C, S = dyn.CONTROL_DIM, dyn.STATE_DIM

    # --- 1. streamed sampling kernel ---
    T_s, K_s = 1100, 512
    try:
        _table_mode((T_s, C), (T_s, C), (T_s, C))
        raise AssertionError("T=1100 tables unexpectedly fit VMEM")
    except PallasIncompatible:
        pass  # prep resolves to "stream" at this horizon
    samp = GaussianDistribution.create(
        std_dev=[1.0, 0.7], control_cost_coeff=[0.02, 0.01],
        pure_noise_percentage=0.1,
    )
    key = jax.random.PRNGKey(7)
    mean = 0.1 * jax.random.normal(key, (T_s, C))
    lam, alpha = 1.2, 0.1
    costs, crash, U, _aux = fused_sample_rollout_costs(
        dyn, cost, samp, x0, mean, jnp.int32(3), dt, lam, alpha, K_s,
        optimization_stride=2, tile_k=128,
    )
    Y = rollout_outputs(dyn, x0, U, dt)
    co, cro = trajectory_state_costs(cost, Y, U, sequential_crash=True)
    lr = samp.likelihood_ratio_cost(U, mean, lam, alpha)
    np.testing.assert_allclose(np.asarray(costs),
                               np.asarray(co + lr / T_s),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(cro))

    # --- 2. streamed RMPPI kernel ---
    T_r, K_r = 640, 256
    U2 = 0.2 * jax.random.normal(jax.random.PRNGKey(8), (K_r, T_r, C))
    gains = 0.02 * jax.random.normal(jax.random.PRNGKey(9), (T_r, C, S))
    sigma = jnp.asarray([1.0, 1.0], jnp.float32)
    coeff = jnp.asarray([0.01, 0.01], jnp.float32)
    xr = x0.at[1].set(0.1)
    s_nom, j_real, s_fb, crash_r, U_real = fused_rmppi_rollout(
        dyn, cost, x0, xr, U2, gains, sigma, coeff, dt, lam, alpha,
        tile_k=128,
    )

    def clamp(u):
        return dyn.enforce_constraints(None, u)

    def step_pair(carry, inp):
        xnv, xrv = carry
        u_raw, g_t = inp
        u_nom = jax.vmap(clamp)(u_raw)
        u_fb = jnp.einsum("cs,ks->kc", g_t, xrv - xnv)
        u_real = jax.vmap(clamp)(u_raw + u_fb)
        fb = 0.5 * lam * (1 - alpha) * jnp.sum(
            coeff * u_fb ** 2 / sigma ** 2, -1)
        t = jnp.float32(0)
        xn2, yn = jax.vmap(lambda x, u: dyn.step(x, u, t, dt))(xnv, u_nom)
        xr2, yr = jax.vmap(lambda x, u: dyn.step(x, u, t, dt))(xrv, u_real)
        return (xn2, xr2), (yn, yr, u_nom, u_real, fb)

    carry = (jnp.broadcast_to(x0, (K_r, S)), jnp.broadcast_to(xr, (K_r, S)))
    _, (Yn, Yr, Un, Ur, FB) = jax.lax.scan(
        step_pair, carry, (jnp.moveaxis(U2, 0, 1), gains))
    Yn, Yr, Un, Ur = (jnp.moveaxis(a, 0, 1) for a in (Yn, Yr, Un, Ur))
    ref_snom, _ = trajectory_state_costs(cost, Yn, Un,
                                         sequential_crash=True)
    ref_jreal, ref_crash = trajectory_state_costs(cost, Yr, Ur,
                                                  sequential_crash=True)
    ref_sfb = ref_jreal + jnp.sum(jnp.moveaxis(FB, 0, 1), axis=1) / T_r
    np.testing.assert_allclose(np.asarray(s_nom), np.asarray(ref_snom),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_real), np.asarray(ref_jreal),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_fb), np.asarray(ref_sfb),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(crash_r),
                                  np.asarray(ref_crash))


CHECKS.append(check_streamed_sampling_rmppi_horizon)


# keep this at the very END of the file: checks appended above must be
# registered before the standalone script runs them
if __name__ == "__main__":
    main()
