"""Rollout parity tests — the TPU analog of the reference's kernel-parity
strategy (tests/mppi_core/rollout_kernel_tests.cu): the fused/combined path,
the split path, and a plain-Python oracle must agree elementwise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.costs import CartpoleQuadraticCost, DoubleIntegratorCircleCost
from mppi_generic_tpu.models import CartpoleDynamics, DoubleIntegratorDynamics
from mppi_generic_tpu.ops import rollout as ro


def python_oracle(dynamics, cost, x0, U, dt):
    """Straight-line NumPy-ish reimplementation of mppi_common.cu:28-146."""
    K, T, _ = U.shape
    costs = np.zeros(K)
    Y = np.zeros((K, T, dynamics.OUTPUT_DIM))
    for k in range(K):
        x = x0
        acc = 0.0
        crash = jnp.int32(0)
        for t in range(T):
            u = U[k, t]
            x, y = dynamics.step(x, u, float(t), dt)
            c, crash = cost.running_cost(y, u, t, crash)
            acc += float(c)
            Y[k, t] = np.asarray(y)
        costs[k] = (acc + float(cost.terminal_cost(jnp.asarray(Y[k, -1])))) / T
    return costs, Y


def setup(K=8, T=12, seed=0):
    dyn = DoubleIntegratorDynamics.create()
    cost = DoubleIntegratorCircleCost()
    rng = np.random.RandomState(seed)
    x0 = jnp.array([2.0, 0.0, 0.0, 2.0])
    U = jnp.asarray(rng.randn(K, T, 2), jnp.float32)
    return dyn, cost, x0, U


def test_combined_matches_oracle():
    dyn, cost, x0, U = setup()
    costs, Y, crash = ro.rollout_combined(dyn, cost, x0, U, 0.02)
    o_costs, o_Y = python_oracle(dyn, cost, x0, U, 0.02)
    np.testing.assert_allclose(costs, o_costs, rtol=1e-4)
    np.testing.assert_allclose(Y, o_Y, rtol=1e-4, atol=1e-5)


def test_split_matches_combined():
    dyn, cost, x0, U = setup(K=32, T=40, seed=3)
    c1, Y1, _ = ro.rollout_combined(dyn, cost, x0, U, 0.02)
    Y2 = ro.rollout_outputs(dyn, x0, U, 0.02)
    c2, _ = ro.trajectory_state_costs(cost, Y2, U)
    np.testing.assert_allclose(Y1, Y2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c1, c2, rtol=1e-4)


def test_split_sequential_crash_matches_parallel_for_crash_free_cost():
    dyn, cost, x0, U = setup(K=16, T=25, seed=4)
    Y = ro.rollout_outputs(dyn, x0, U, 0.02)
    c_par, _ = ro.trajectory_state_costs(cost, Y, U, sequential_crash=False)
    c_seq, _ = ro.trajectory_state_costs(cost, Y, U, sequential_crash=True)
    np.testing.assert_allclose(c_par, c_seq, rtol=1e-5)


def test_sticky_crash_time_parallel_pass_matches_scan():
    """The batched dual-evaluation + cummax pass (time_parallel_crash
    costs) must match the per-sample crash scan BITWISE on crash flags and
    to float tolerance on costs (the XLA analog of the fused kernels'
    sticky-prefix tier)."""
    from mppi_generic_tpu.costs import ARStandardCost
    from mppi_generic_tpu.maps.texture import MapTexture2D

    rng = np.random.RandomState(11)
    # mostly-benign costmap with one hot region: samples wandering into it
    # crash mid-horizon, the rest never do
    m = (0.3 * rng.rand(32, 32)).astype("f")
    m[20:, 20:] = 5.0
    tex = MapTexture2D.create(m, origin=(-16, -16, 0), resolution=1.0)
    cost = ARStandardCost(costmap=tex, boundary_threshold=jnp.float32(2.0))
    K, T = 24, 31
    # synthetic outputs [x, y, yaw, roll, vx, vy, wz] with realistic scales:
    # positions span on/off-track regions, roll stays under the rollover
    # threshold, slip stays sane — so the only crash trigger is the track
    # boundary, and only for the samples whose positions enter the hot block
    Y = np.zeros((K, T, 7), np.float32)
    Y[..., 0:2] = rng.randn(K, T, 2) * 8.0   # x, y
    Y[..., 2] = rng.randn(K, T) * 3.0        # yaw
    Y[..., 3] = rng.randn(K, T) * 0.3        # roll (< pi/2)
    Y[..., 4] = 3.0 + rng.randn(K, T) * 0.5  # vx
    Y[..., 5] = rng.randn(K, T) * 0.2        # vy
    Y = jnp.asarray(Y)
    U = jnp.asarray(rng.randn(K, T, 2), jnp.float32)

    c_fast, crash_fast = ro.trajectory_state_costs(
        cost, Y, U, sequential_crash=True, batched_crash=True
    )

    # oracle: the per-sample sequential crash scan (the old sequential path)
    ts = jnp.arange(T, dtype=jnp.int32)

    def one_sample(Y_k, U_k):
        def step_fn(crash, inp):
            y, u, t = inp
            c, crash = cost.running_cost(y, u, t, crash)
            return crash, c

        crash, cs = jax.lax.scan(step_fn, jnp.int32(0), (Y_k, U_k, ts))
        return (jnp.sum(cs) + cost.terminal_cost(Y_k[-1])) / T, crash

    c_ref, crash_ref = jax.vmap(one_sample)(Y, U)
    assert int(jnp.sum(crash_ref)) > 0  # the scenario must exercise crashes
    assert int(jnp.sum(crash_ref)) < K
    np.testing.assert_array_equal(np.asarray(crash_fast),
                                  np.asarray(crash_ref))
    np.testing.assert_allclose(c_fast, c_ref, rtol=1e-5, atol=1e-5)


def test_cartpole_combined_matches_oracle():
    dyn = CartpoleDynamics.create()
    cost = CartpoleQuadraticCost()
    rng = np.random.RandomState(7)
    x0 = jnp.array([0.0, 0.0, 0.1, 0.0])
    U = jnp.asarray(rng.randn(6, 10, 1) * 2, jnp.float32)
    costs, Y, _ = ro.rollout_combined(dyn, cost, x0, U, 0.02)
    o_costs, o_Y = python_oracle(dyn, cost, x0, U, 0.02)
    np.testing.assert_allclose(costs, o_costs, rtol=1e-4)
    np.testing.assert_allclose(Y, o_Y, rtol=1e-4, atol=1e-5)


def test_terminal_cost_included():
    dyn = CartpoleDynamics.create()
    cost0 = CartpoleQuadraticCost()
    cost1 = CartpoleQuadraticCost(terminal_cost_coeff=jnp.float32(2.0))
    x0 = jnp.zeros(4)
    U = jnp.ones((2, 5, 1))
    c0, Y, _ = ro.rollout_combined(dyn, cost0, x0, U, 0.02)
    c1, _, _ = ro.rollout_combined(dyn, cost1, x0, U, 0.02)
    term = cost1.terminal_cost(Y[0, -1])
    np.testing.assert_allclose(c1[0] - c0[0], term / 5, rtol=1e-4)


def test_per_sample_initial_states():
    """x0 may be (K, S) — needed by Tube/RMPPI's augmented systems."""
    dyn, cost, _, U = setup(K=4, T=6)
    x0s = jnp.asarray(np.random.RandomState(9).randn(4, 4), jnp.float32)
    costs, Y, _ = ro.rollout_combined(dyn, cost, x0s, U, 0.02)
    for k in range(4):
        ck, Yk, _ = ro.rollout_combined(dyn, cost, x0s[k], U[k : k + 1], 0.02)
        np.testing.assert_allclose(costs[k], ck[0], rtol=1e-5)
