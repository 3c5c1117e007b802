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
