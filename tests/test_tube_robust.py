"""Tube-MPPI and RMPPI behavioral tests — analogs of
tests/controllers/tube_mppi_test.cu and rmppi_test.cu, scaled for CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.controllers import RobustMPPI, TubeMPPI, VanillaMPPI
from mppi_generic_tpu.controllers.robust import line_search_weights
from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.costs.double_integrator import DoubleIntegratorRobustCost
from mppi_generic_tpu.feedback import DDPFeedback
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.sampling import GaussianDistribution


def make_tube(**kw):
    dyn = DoubleIntegratorDynamics.create()
    defaults = dict(
        dynamics=dyn,
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(
            std_dev=[1.0, 1.0], control_cost_coeff=[0.01, 0.01]
        ),
        dt=jnp.float32(0.02),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(0.0),
        num_timesteps=48,
        num_rollouts=256,
        nominal_threshold=jnp.float32(20.0),
        feedback=DDPFeedback.create(dyn, 0.02),
    )
    defaults.update(kw)
    return TubeMPPI(**defaults)


def make_robust(**kw):
    dyn = DoubleIntegratorDynamics.create()
    defaults = dict(
        dynamics=dyn,
        cost=DoubleIntegratorRobustCost(),
        sampler=GaussianDistribution.create(
            std_dev=[1.0, 1.0], control_cost_coeff=[0.01, 0.01]
        ),
        dt=jnp.float32(0.02),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(0.0),
        num_timesteps=48,
        num_rollouts=256,
        num_candidates=9,
        samples_per_condition=64,
        value_function_threshold=jnp.float32(20.0),
        feedback=DDPFeedback.create(dyn, 0.02),
    )
    defaults.update(kw)
    return RobustMPPI(**defaults)


def test_line_search_weights_shape_and_endpoints():
    W = line_search_weights(9)
    assert W.shape == (3, 9)
    np.testing.assert_allclose(W[:, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(W[:, 4], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(W[:, 8], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(W.sum(axis=0), 1.0, atol=1e-6)


def test_tube_solve_shapes_and_acceptance():
    ctrl = make_tube()
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    x0 = jnp.array([2.0, 0.0, 0.0, 2.0])
    res, cs2 = ctrl.solve(x0, cs)
    assert res.real.control_mean.shape == (48, 2)
    assert res.nominal.control_mean.shape == (48, 2)
    # first solve: nominal starts at the real state -> same cost landscape,
    # real baseline cannot be worse than nominal + threshold => accept real
    assert int(res.nominal_state_used) == 0
    np.testing.assert_allclose(cs2.nominal_state, x0, atol=1e-6)
    assert bool(cs2.nominal_initialized)


def test_tube_nominal_rejects_disturbed_state():
    """After a huge disturbance to the real state, the nominal system keeps
    its own (good) state: nominal_state_used == 1."""
    ctrl = make_tube(nominal_threshold=jnp.float32(1.0))
    cs = ctrl.init_state(jax.random.PRNGKey(1))
    x_good = jnp.array([2.0, 0.0, 0.0, 2.0])
    res, cs = ctrl.solve(x_good, cs)
    cs = ctrl.slide_control_sequence(cs, 1)
    # disturbance pushes the real state badly off-track
    x_bad = jnp.array([0.1, 0.1, -3.0, 3.0])
    res, cs = ctrl.solve(x_bad, cs)
    assert int(res.nominal_state_used) == 1
    # nominal state stayed near the good region rather than jumping
    assert float(jnp.linalg.norm(cs.nominal_state - x_bad)) > 0.5


def test_tube_slide_propagates_nominal_state():
    ctrl = make_tube()
    cs = ctrl.init_state(jax.random.PRNGKey(2))
    x0 = jnp.array([2.0, 0.0, 0.0, 2.0])
    _, cs = ctrl.solve(x0, cs)
    ns_before = cs.nominal_state
    u0 = cs.nominal_mean[0]
    cs2 = ctrl.slide_control_sequence(cs, 1)
    expected, _ = ctrl.dynamics.step(
        ns_before, ctrl.dynamics.enforce_constraints(ns_before, u0), 0.0, ctrl.dt
    )
    np.testing.assert_allclose(cs2.nominal_state, expected, atol=1e-6)


@pytest.mark.slow
def test_tube_tracks_annulus_under_disturbance():
    ctrl = make_tube(num_timesteps=48, num_rollouts=256)
    cs = ctrl.init_state(jax.random.PRNGKey(3))
    x = jnp.array([2.0, 0.0, 0.0, 2.0])
    rng = np.random.RandomState(0)
    for i in range(60):
        res, cs = ctrl.solve(x, cs)
        u = res.nominal.control_mean[0] + ctrl.feedback.k(
            x, res.nominal.state_trajectory[0], 0, cs.feedback_state
        )
        u = jnp.clip(u, -1e3, 1e3)
        x, _ = ctrl.dynamics.step(x, u, 0.0, ctrl.dt)
        # occasional disturbance
        if i % 20 == 10:
            x = x + jnp.asarray(rng.randn(4) * 0.1, jnp.float32)
        cs = ctrl.slide_control_sequence(cs, 1)
    r = float(jnp.sqrt(x[0] ** 2 + x[1] ** 2))
    assert 1.6 < r < 2.4, f"r={r}"


def test_rmppi_importance_sampling_first_call():
    ctrl = make_robust()
    cs = ctrl.init_state(jax.random.PRNGKey(4))
    x0 = jnp.array([2.0, 0.0, 0.0, 2.0])
    cs2, fe = ctrl.update_importance_sampling(x0, cs, 1)
    np.testing.assert_allclose(cs2.nominal_state, x0, atol=1e-6)
    assert int(cs2.nominal_stride) == 0
    assert cs2.feedback_state.gains.shape == (48, 2, 4)


def test_rmppi_candidate_selection_prefers_real_when_feasible():
    """When the real state is on-track (low cost), the last candidate
    (= real state) should be selected."""
    ctrl = make_robust(value_function_threshold=jnp.float32(1000.0))
    cs = ctrl.init_state(jax.random.PRNGKey(5))
    x0 = jnp.array([2.0, 0.0, 0.0, 2.0])
    cs, _ = ctrl.update_importance_sampling(x0, cs, 1)
    res, cs = ctrl.solve(x0, cs)
    cs = cs.replace(nominal_traj=res.nominal.state_trajectory[:-1])
    # next cycle: real state still on track -> all candidates feasible ->
    # the LAST one (the real state) wins
    x1 = res.nominal.state_trajectory[1]
    cs2, fe = ctrl.update_importance_sampling(x1, cs, 1)
    assert int(cs2.best_index) == ctrl.num_candidates - 1
    assert np.all(np.isfinite(np.asarray(fe)))
    np.testing.assert_allclose(cs2.nominal_state, x1, atol=1e-5)

    # with an impossible threshold, no candidate passes -> keeps previous
    ctrl_hard = make_robust(value_function_threshold=jnp.float32(0.001))
    cs3, _ = ctrl_hard.update_importance_sampling(x1, cs, 1)
    assert int(cs3.best_index) == int(cs.best_index)


def test_rmppi_solve_shapes_and_cost_blend():
    ctrl = make_robust()
    cs = ctrl.init_state(jax.random.PRNGKey(6))
    x0 = jnp.array([2.0, 0.0, 0.0, 2.0])
    cs, _ = ctrl.update_importance_sampling(x0, cs, 1)
    res, cs = ctrl.solve(x0, cs)
    assert res.real.control_mean.shape == (48, 2)
    assert np.isfinite(float(res.real.baseline))
    assert np.isfinite(float(res.nominal.baseline))
    # blended nominal cost >= 0.5*nominal-state-only component: sanity
    assert float(res.nominal.normalizer) > 0


@pytest.mark.slow
def test_rmppi_closed_loop_with_disturbances():
    """CoRL2020-style: RMPPI stays on the annulus under injected velocity
    disturbances (examples/double_integrator_CORL2020.cu scenario)."""
    ctrl = make_robust(value_function_threshold=jnp.float32(50.0))
    cs = ctrl.init_state(jax.random.PRNGKey(7))
    x = jnp.array([2.0, 0.0, 0.0, 2.0])
    rng = np.random.RandomState(1)
    crashes = 0
    for i in range(60):
        cs, _ = ctrl.update_importance_sampling(x, cs, 1)
        res, cs = ctrl.solve(x, cs)
        u = res.real.control_mean[0]
        x, _ = ctrl.dynamics.step(x, u, 0.0, ctrl.dt)
        # process noise on velocities (the CoRL2020 disturbance model)
        x = x.at[2:].add(jnp.asarray(rng.randn(2) * 0.02, jnp.float32))
        r = float(jnp.sqrt(x[0] ** 2 + x[1] ** 2))
        if not (1.5 < r < 2.5):
            crashes += 1
    assert crashes < 10, f"left the track {crashes}/60 steps"


def test_rmppi_long_horizon_keeps_fused_kernel():
    """A horizon whose (T, C*S) feedback-gain table exceeds the fused
    kernel's SMEM budget rides the sublane-stacked VMEM table instead of
    losing the kernel (and the solve still matches the XLA augmented scan
    — the non-pallas twin below)."""
    from mppi_generic_tpu.controllers import RobustMPPI
    from mppi_generic_tpu.feedback import DDPFeedback
    from mppi_generic_tpu.ops.pallas_rollout import _table_mode

    dyn = DoubleIntegratorDynamics.create(control_ranges=[[-3, 3], [-3, 3]])
    T = 512  # gains table 512*2*4*4B = 16 KB > the 13 KB SMEM budget
    assert _table_mode((T, 2 * 4), (T, 2)) == "vmem"
    ctrl = RobustMPPI(
        dynamics=dyn,
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=T,
        num_rollouts=64,
        num_candidates=3,
        samples_per_condition=16,
        value_function_threshold=jnp.float32(50.0),
        feedback=DDPFeedback.create(dyn, 0.02),
        kernel="pallas",
    )
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    res, _ = ctrl.solve(x0, cs)
    assert bool(jnp.isfinite(res.real.baseline))
    assert bool(jnp.isfinite(res.nominal.baseline))
    # parity vs the XLA augmented scan at the same horizon
    ref = ctrl.replace(kernel="combined")
    res_ref, _ = ref.solve(x0, cs)
    np.testing.assert_allclose(
        np.asarray(res.real.control_mean),
        np.asarray(res_ref.real.control_mean), rtol=1e-4, atol=1e-5,
    )
