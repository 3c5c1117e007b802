"""Behavioral controller tests — the analog of the reference's
tests/controllers/vanilla_mppi_test.cu (cartpole swing-up :79-138, etc.)
scaled down for the CPU test backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.costs import CartpoleQuadraticCost, DoubleIntegratorCircleCost
from mppi_generic_tpu.models import CartpoleDynamics, DoubleIntegratorDynamics
from mppi_generic_tpu.sampling import GaussianDistribution
from mppi_generic_tpu.controllers import VanillaMPPI


def make_di_controller(**kw):
    defaults = dict(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(
            std_dev=[1.0, 1.0], control_cost_coeff=[0.01, 0.01]
        ),
        dt=jnp.float32(0.02),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(0.0),
        num_timesteps=64,
        num_rollouts=512,
        num_iters=1,
    )
    defaults.update(kw)
    return VanillaMPPI(**defaults)


def closed_loop(ctrl, x0, steps, stride=1):
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    x = x0
    res = None
    for _ in range(steps):
        cs = ctrl.slide_control_sequence(cs, stride)
        res, cs = ctrl.solve(x, cs)
        u = res.control_mean[0]
        x, _ = ctrl.dynamics.step(x, u, 0.0, ctrl.dt)
    return x, res


def test_di_tracks_annulus():
    ctrl = make_di_controller()
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    x, res = closed_loop(ctrl, x0, 60)
    r = float(jnp.sqrt(x[0] ** 2 + x[1] ** 2))
    assert 1.7 < r < 2.3, f"left the annulus: r={r}"
    assert float(res.baseline) < 5.0


def test_solve_improves_baseline():
    ctrl = make_di_controller(num_iters=3)
    cs = ctrl.init_state(jax.random.PRNGKey(1))
    x0 = jnp.array([2.0, 0.0, 0.0, 0.0])
    res1, cs = ctrl.solve(x0, cs)
    res2, _ = ctrl.solve(x0, cs)
    # warm-started second solve should not be worse
    assert float(res2.baseline) <= float(res1.baseline) * 1.1


def test_split_and_combined_same_distribution_update():
    kw = dict(num_timesteps=32, num_rollouts=128)
    c1 = make_di_controller(kernel="combined", **kw)
    c2 = make_di_controller(kernel="split", **kw)
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    cs1 = c1.init_state(jax.random.PRNGKey(5))
    cs2 = c2.init_state(jax.random.PRNGKey(5))
    r1, _ = c1.solve(x0, cs1)
    r2, _ = c2.solve(x0, cs2)
    np.testing.assert_allclose(r1.control_mean, r2.control_mean, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(r1.baseline, r2.baseline, rtol=1e-4)


@pytest.mark.slow
def test_cartpole_swing_up():
    """Scaled-down mirror of the reference SwingUpTest
    (tests/controllers/vanilla_mppi_test.cu:79-138): same dt/lambda/sigma/
    cost coefficients, success = baseline < 1.0 with the pole upright."""
    ctrl = VanillaMPPI(
        dynamics=CartpoleDynamics.create(),
        cost=CartpoleQuadraticCost(coeffs=jnp.array([100.0, 10.0, 200.0, 20.0])),
        sampler=GaussianDistribution.create(
            std_dev=[5.0], control_cost_coeff=[1.0], pure_noise_percentage=0.01
        ),
        dt=jnp.float32(0.01),
        lam=jnp.float32(0.25),
        alpha=jnp.float32(0.0),
        slide_scale=jnp.ones((1,)),
        num_timesteps=100,
        num_rollouts=512,
        num_iters=1,
    )
    x = jnp.zeros(4)
    cs = ctrl.init_state(jax.random.PRNGKey(2))
    res = None
    for _ in range(500):
        res, cs = ctrl.solve(x, cs)
        u = res.control_mean[0]
        x = x + ctrl.dynamics.state_deriv(x, u) * ctrl.dt
        cs = ctrl.slide_control_sequence(cs, 1)
    assert float(res.baseline) < 1.0, f"baseline {float(res.baseline)}"
    theta_err = abs(float(jnp.mod(x[2], 2 * jnp.pi)) - np.pi)
    assert theta_err < 0.3, f"pole angle error {theta_err}, state {np.asarray(x)}"


def test_weight_transforms_run():
    for wt in ("exp", "tsallis", "cem"):
        ctrl = make_di_controller(
            weight_transform=wt, num_timesteps=16, num_rollouts=64
        )
        cs = ctrl.init_state(jax.random.PRNGKey(3))
        res, _ = ctrl.solve(jnp.array([2.0, 0.0, 0.0, 1.0]), cs)
        assert np.isfinite(float(res.baseline))
        assert float(res.normalizer) > 0


def test_free_energy_stats_populated():
    ctrl = make_di_controller(num_timesteps=16, num_rollouts=64)
    cs = ctrl.init_state(jax.random.PRNGKey(4))
    res, cs2 = ctrl.solve(jnp.array([2.0, 0.0, 0.0, 1.0]), cs)
    fe = res.free_energy
    assert np.isfinite(float(fe.free_energy_mean))
    assert 0 < float(fe.normalizer_percent) <= 1.0
    assert float(cs2.previous_baseline) == float(res.baseline)


def test_get_current_control_interpolates():
    ctrl = make_di_controller(num_timesteps=8, num_rollouts=32)
    cs = ctrl.init_state(jax.random.PRNGKey(6))
    res, _ = ctrl.solve(jnp.array([2.0, 0.0, 0.0, 1.0]), cs)
    u_mid = ctrl.get_current_control(res, 0.5 * float(ctrl.dt))
    expected = 0.5 * (res.control_mean[0] + res.control_mean[1])
    np.testing.assert_allclose(u_mid, expected, atol=1e-5)
