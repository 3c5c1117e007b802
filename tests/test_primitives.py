"""Primitives controller tests (reference controllers/Primitives/*, which is
untested upstream — behavioral coverage here follows the vanilla-controller
test pattern, tests/controllers/vanilla_mppi_test.cu)."""

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.controllers import PrimitivesController
from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.sampling import ColoredNoiseDistribution, PiecewiseLinearDistribution


def _make(num_primitive_iters=1, num_iters=1, stopping_cost_threshold=1.0e8):
    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-4, 4], [-4, 4]])
    return PrimitivesController(
        dynamics=dyn,
        cost=DoubleIntegratorCircleCost(),
        sampler=ColoredNoiseDistribution.create(
            std_dev=[1.0, 1.0],
            exponents=[1.0, 1.0],
            control_cost_coeff=[0.0, 0.0],
        ),
        primitive_sampler=PiecewiseLinearDistribution.create(
            std_dev=[1.0, 1.0],
            control_ranges=[[-4, 4], [-4, 4]],
            num_segments=5,
            frac_add_nominal=0.2,
            control_cost_coeff=[0.0, 0.0],
        ),
        dt=jnp.float32(0.02),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(0.0),
        num_timesteps=40,
        num_rollouts=512,
        num_iters=num_iters,
        num_primitive_iters=num_primitive_iters,
        stopping_cost_threshold=jnp.float32(stopping_cost_threshold),
    )


def test_solve_shapes_and_choice_flag():
    ctrl = _make()
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    res, cs2 = jax.jit(ctrl.solve)(x0, cs)
    assert res.control_mean.shape == (40, 2)
    assert res.control_mppi.shape == (40, 2)
    assert int(res.nominal_state_used) in (0, 1, 3)
    assert np.isfinite(float(res.baseline))
    assert np.all(np.isfinite(np.asarray(res.control_mean)))
    # both sequences must be warm-start state
    assert cs2.control_mppi.shape == (40, 2)


def test_stopping_trajectory_issued_when_baseline_too_high():
    """A tiny stopping threshold forces phase 1 to emit the stopping
    trajectory (zero controls for the DI) and mark the primitive baseline
    -inf so MPPI wins."""
    ctrl = _make(stopping_cost_threshold=1e-6, num_iters=0)
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    x0 = jnp.array([5.0, 5.0, 1.0, 1.0])  # far out of the annulus -> crash costs
    res, _ = jax.jit(ctrl.solve)(x0, cs)
    # DI stopping control == zero_control == 0; smoothing preserves constants
    np.testing.assert_allclose(np.asarray(res.control_mean), 0.0, atol=1e-5)
    # sentinel = float::min (tiny positive), primitives_controller.cu:132
    assert 0.0 <= float(res.primitives_baseline) < 1e-30


def test_greedy_primitive_improves_cost():
    """With MPPI disabled, the argmin primitive update must not be worse
    than the zero-control trajectory (sample 0 is pinned to zero)."""
    from mppi_generic_tpu.ops import rollout_combined

    ctrl = _make(num_iters=0)
    cs = ctrl.init_state(jax.random.PRNGKey(1))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    res, _ = jax.jit(ctrl.solve)(x0, cs)
    zero_costs, _, _ = rollout_combined(
        ctrl.dynamics, ctrl.cost, x0, jnp.zeros((1, 40, 2)), ctrl.dt
    )
    assert float(res.primitives_baseline) <= float(zero_costs[0]) + 1e-4


def test_slide_slides_both_sequences():
    ctrl = _make()
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    mean = jnp.tile(jnp.arange(40.0)[:, None], (1, 2))
    cs = cs.replace(control_mean=mean, control_mppi=mean * 2)
    slid = ctrl.slide_control_sequence(cs, 3)
    np.testing.assert_allclose(np.asarray(slid.control_mean[0]), [3.0, 3.0])
    np.testing.assert_allclose(np.asarray(slid.control_mppi[0]), [6.0, 6.0])
