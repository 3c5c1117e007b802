import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.costs import (
    CartpoleQuadraticCost,
    DoubleIntegratorCircleCost,
    QuadraticCost,
)


def test_di_circle_cost_on_track():
    cost = DoubleIntegratorCircleCost()
    # on the annulus (r=2), travelling at the desired counterclockwise speed:
    # position (2, 0), velocity (0, 2) -> L = x*vy - y*vx = 4 = desired
    y = jnp.array([2.0, 0.0, 0.0, 2.0])
    c, _ = cost.state_cost(y, 0, jnp.int32(0))
    assert np.isclose(float(c), 0.0, atol=1e-5)


def test_di_circle_cost_off_track_crash():
    cost = DoubleIntegratorCircleCost()
    y = jnp.array([3.0, 0.0, 0.0, 2.0])  # r=3 outside outer radius 2.125
    c, _ = cost.state_cost(y, 0, jnp.int32(0))
    # crash 1000 + |L - 4| = |3*2 - 4| = 2
    assert np.isclose(float(c), 1000.0 + 2.0, atol=1e-4)


def test_di_circle_velocity_term():
    cost = DoubleIntegratorCircleCost()
    y = jnp.array([2.0, 0.0, 0.0, 1.0])  # speed 1 (desired 2), L = 2 (desired 4)
    c, _ = cost.state_cost(y, 0, jnp.int32(0))
    assert np.isclose(float(c), 1.0 + 2.0, atol=1e-5)


def test_cartpole_cost_at_goal_zero():
    cost = CartpoleQuadraticCost()
    y = jnp.array([0.0, 0.0, jnp.pi, 0.0])
    c, _ = cost.state_cost(y, 0, jnp.int32(0))
    assert np.isclose(float(c), 0.0, atol=1e-4)


def test_cartpole_cost_values():
    cost = CartpoleQuadraticCost()
    y = jnp.array([1.0, 2.0, jnp.pi + 0.5, -1.0])
    c, _ = cost.state_cost(y, 0, jnp.int32(0))
    expected = 1000.0 * 1 + 100.0 * 4 + 2000.0 * 0.25 + 100.0 * 1
    assert np.isclose(float(c), expected, rtol=1e-5)
    # terminal defaults to 0 coefficient
    assert np.isclose(float(cost.terminal_cost(y)), 0.0)


def test_quadratic_cost_fixed_goal():
    cost = QuadraticCost.create(goal=[1.0, 2.0], coeffs=[2.0, 3.0])
    y = jnp.array([0.0, 0.0])
    c, _ = cost.state_cost(y, 5, jnp.int32(0))
    assert np.isclose(float(c), 2.0 * 1 + 3.0 * 4, rtol=1e-6)


def test_quadratic_cost_goal_trajectory_clamped():
    goal_traj = jnp.array([[0.0], [1.0], [2.0]])
    cost = QuadraticCost.create(goal=goal_traj)
    y = jnp.array([0.0])
    c0, _ = cost.state_cost(y, 0, 0)
    c2, _ = cost.state_cost(y, 2, 0)
    c9, _ = cost.state_cost(y, 9, 0)  # past horizon -> clamped to last goal
    assert np.isclose(float(c0), 0.0)
    assert np.isclose(float(c2), 4.0)
    assert np.isclose(float(c9), 4.0)


def test_quadratic_cost_current_time_shift():
    goal_traj = jnp.array([[0.0], [1.0], [2.0]])
    cost = QuadraticCost.create(goal=goal_traj).replace(current_time=jnp.int32(1))
    c0, _ = cost.state_cost(jnp.array([0.0]), 0, 0)
    assert np.isclose(float(c0), 1.0)
