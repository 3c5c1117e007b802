"""CCM feedback tests — analog of tests/mppi_core/CCM_tests.cu (Chebyshev
machinery + contraction feedback on the double integrator)."""

import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.feedback import (
    CCMFeedback,
    chebyshev_points,
    chebyshev_polynomial,
)
from mppi_generic_tpu.models import DoubleIntegratorDynamics


def test_chebyshev_points_and_weights():
    pts, w = chebyshev_points(9)
    np.testing.assert_allclose(float(pts[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(pts[-1]), 1.0, atol=1e-6)
    # Clenshaw-Curtis weights integrate polynomials on [0, 1]
    np.testing.assert_allclose(float(jnp.sum(w)), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(w * pts)), 0.5, atol=1e-4)
    np.testing.assert_allclose(float(jnp.sum(w * pts**2)), 1.0 / 3, atol=1e-4)


def test_chebyshev_polynomial_recurrence():
    pts, _ = chebyshev_points(17)
    T = chebyshev_polynomial(pts, 5)
    x = 2 * pts - 1
    np.testing.assert_allclose(np.asarray(T[0]), 1.0)
    np.testing.assert_allclose(np.asarray(T[1]), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(T[2]), np.asarray(2 * x**2 - 1), atol=1e-5
    )


def test_ccm_zero_feedback_at_nominal():
    dyn = DoubleIntegratorDynamics.create()
    fb = CCMFeedback.create(dyn)
    x = jnp.array([1.0, 2.0, 0.5, -0.5])
    u = fb.u_feedback(x, x, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(u), 0.0, atol=1e-6)


def test_ccm_feedback_contracts_error():
    """Closed-loop tracking error under the CCM feedback must shrink vs the
    open-loop error for the DI tracking a coasting nominal."""
    dyn = DoubleIntegratorDynamics.create()
    fb = CCMFeedback.create(dyn)
    dt = 0.02
    x_nom = jnp.array([0.0, 0.0, 1.0, 0.0])
    x = x_nom + jnp.array([0.4, -0.3, 0.2, 0.1])
    x_open = x
    u_nom = jnp.zeros(2)
    for _ in range(100):
        u = fb.u_feedback(x, x_nom, u_nom)
        x, _ = dyn.step(x, u, 0.0, dt)
        x_open, _ = dyn.step(x_open, u_nom, 0.0, dt)
        x_nom, _ = dyn.step(x_nom, u_nom, 0.0, dt)
    err_fb = float(jnp.linalg.norm(x - x_nom))
    err_open = float(jnp.linalg.norm(x_open - x_nom))
    assert err_fb < 0.5 * err_open
    assert np.isfinite(err_fb)


def test_ccm_k_interface():
    dyn = DoubleIntegratorDynamics.create()
    fb = CCMFeedback.create(dyn)
    T = 16
    goal = jnp.zeros((T, 4)).at[:, 2].set(1.0)
    ctrls = jnp.zeros((T, 2))
    fb_state = fb.compute_feedback(goal[0], goal, ctrls)
    u = fb.k(jnp.array([0.1, 0.0, 1.0, 0.0]), goal[3], 3, fb_state)
    assert u.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(u)))
