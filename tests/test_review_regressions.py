"""Regression tests for review findings: history update semantics, sticky
crash status in the split kernel, single-application deadband clamping, and
per-step feedback cost with time-specific sigma."""

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.controllers import RobustMPPI, TubeMPPI, VanillaMPPI
from mppi_generic_tpu.costs import ARStandardCost, DoubleIntegratorCircleCost
from mppi_generic_tpu.feedback import DDPFeedback
from mppi_generic_tpu.maps.texture import MapTexture2D
from mppi_generic_tpu.models import DoubleIntegratorDynamics, RacerDubinsDynamics
from mppi_generic_tpu.ops import rollout_combined, rollout_outputs, trajectory_state_costs
from mppi_generic_tpu.sampling import GaussianDistribution
from mppi_generic_tpu.utils.math_utils import update_control_history


def test_history_update_stride_one_keeps_prior_control():
    """saveControlHistoryHelper: stride==1 shifts [h1, u0], not [u0, u0]."""
    hist = jnp.array([[1.0, 1.0], [2.0, 2.0]])
    mean = jnp.tile(jnp.arange(10.0)[:, None] + 10.0, (1, 2))
    h1 = update_control_history(hist, mean, 1)
    np.testing.assert_allclose(np.asarray(h1), [[2.0, 2.0], [10.0, 10.0]])
    h2 = update_control_history(hist, mean, 3)
    np.testing.assert_allclose(np.asarray(h2), [[11.0, 11.0], [12.0, 12.0]])
    h0 = update_control_history(hist, mean, 0)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(hist))


def test_split_kernel_preserves_sticky_crash():
    """AutoRally-style sticky crash status must survive the split cost pass
    with the (default) sequential crash propagation."""
    tex = MapTexture2D.create(
        np.ones((32, 32), np.float32) * 2.0,  # everywhere off-track
        origin=(-16, -16, 0), resolution=1.0,
    )
    cost = ARStandardCost(costmap=tex)
    dyn = RacerDubinsDynamics.create()
    K, T = 32, 16
    U = jax.random.normal(jax.random.PRNGKey(0), (K, T, 2)) * 0.3
    x0 = jnp.zeros(dyn.STATE_DIM)
    c_comb, _, crash_comb = rollout_combined(dyn, cost, x0, U, 0.02)
    Y = rollout_outputs(dyn, x0, U, 0.02)
    c_split, crash_split = trajectory_state_costs(cost, Y, U,
                                                  sequential_crash=True)
    np.testing.assert_allclose(np.asarray(c_split), np.asarray(c_comb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(crash_split),
                                  np.asarray(crash_comb))


def test_robust_deadband_applied_once():
    """With a control deadband, the rollout clamp must apply exactly once
    (the reference clamps in-kernel and writes back)."""
    dyn = DoubleIntegratorDynamics.create(
        control_ranges=[[-3, 3], [-3, 3]],
        control_deadband=[0.2, 0.2],
    )
    ctrl = RobustMPPI(
        dynamics=dyn, cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16, num_rollouts=256,
        feedback=DDPFeedback.create(dyn, 0.02), return_samples=True,
    )
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    res, _ = jax.jit(ctrl.solve)(x0, cs)
    # the nominal sampled controls are the once-clamped samples: any value
    # with |u| >= deadband was shifted by exactly one deadband, so the
    # maximum magnitude is bounded by 3 (range), not 3 - 0.2 (double shrink
    # would cap at 2.8 after the second application)
    U = res.nominal.sampled_controls
    assert U is not None
    assert bool(jnp.all(jnp.isfinite(U)))
    m = float(jnp.max(jnp.abs(U)))
    assert m <= 3.0 + 1e-5
    # once-clamped samples reach the full range; a double shrink would cap
    # them at 2.8 (8192 draws of N(0,1): P(none beyond 3.1 pre-shrink) ~ 0)
    assert m > 2.9, m


def test_feedback_cost_step_time_specific_sigma():
    sigma_t = jnp.stack([jnp.full((2,), 1.0 + 0.1 * t) for t in range(8)])
    samp = GaussianDistribution.create(std_dev=sigma_t,
                                       control_cost_coeff=[1.0, 1.0])
    u_fb = jnp.array([0.5, -0.5])
    c3 = samp.feedback_cost_step(u_fb, 3, 1.0, 0.0)
    expect = 0.5 * float(jnp.sum(u_fb**2 / sigma_t[3] ** 2))
    np.testing.assert_allclose(float(c3), expect, rtol=1e-6)


def test_tube_respects_weight_transform():
    """TubeMPPI reuses VanillaMPPI's iteration — non-default weight
    transforms (here CEM elite weighting) apply to both systems."""
    dyn = DoubleIntegratorDynamics.create()
    common = dict(
        dynamics=dyn, cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16, num_rollouts=64,
        feedback=DDPFeedback.create(dyn, 0.02),
    )
    cs = TubeMPPI(**common).init_state(jax.random.PRNGKey(0))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    r_exp, _ = jax.jit(TubeMPPI(**common).solve)(x0, cs)
    r_cem, _ = jax.jit(
        TubeMPPI(**common, weight_transform="cem").solve
    )(x0, cs)
    # CEM elite weights are 0/1 — different from exp weights
    assert not np.allclose(np.asarray(r_cem.real.weights),
                           np.asarray(r_exp.real.weights))
    assert set(np.unique(np.asarray(r_cem.real.weights))) <= {0.0, 1.0}


def test_autotune_works_for_tube():
    from mppi_generic_tpu.ops import choose_appropriate_kernel

    dyn = DoubleIntegratorDynamics.create()
    ctrl = TubeMPPI(
        dynamics=dyn, cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16, num_rollouts=64,
        feedback=DDPFeedback.create(dyn, 0.02),
    )
    tuned = choose_appropriate_kernel(
        ctrl, jnp.array([2.0, 0.0, 0.0, 1.0]), num_evaluations=1,
        candidates=("combined", "split"),
    )
    assert tuned.kernel in ("combined", "split")


def test_autorally_factory_usable_without_costmap():
    """The shipped autorally preset must solve out of the box (track term
    zero without a map) and accept an injected costmap."""
    import mppi_generic_tpu.instantiations as inst
    from mppi_generic_tpu.maps.texture import MapTexture2D

    ctrl, fb = inst.autorally_mppi(num_rollouts=64, num_timesteps=12)
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    x0 = jnp.zeros(7).at[4].set(3.0)
    res, _ = jax.jit(ctrl.solve)(x0, cs)
    assert bool(jnp.all(jnp.isfinite(res.control_mean)))

    tex = MapTexture2D.create(np.ones((8, 8), np.float32),
                              origin=(-4, -4, 0), resolution=1.0)
    ctrl2, _ = inst.autorally_mppi(num_rollouts=64, num_timesteps=12,
                                   costmap=tex)
    res2, _ = jax.jit(ctrl2.solve)(x0, cs)
    # on an all-ones (off-track) map, costs must be strictly higher
    assert float(res2.baseline) > float(res.baseline)


def test_logger_instances_isolated():
    import io
    from mppi_generic_tpu.utils.logger import LogLevel, MPPILogger

    a = MPPILogger("mppi", level=LogLevel.DEBUG)
    buf = io.StringIO()
    b = MPPILogger("mppi", level=LogLevel.ERROR, stream=buf, use_color=False)
    assert a.level == LogLevel.DEBUG  # not clobbered by b's constructor
    b.error("boom")
    assert "boom" in buf.getvalue()  # b's sink honored


def test_shaping_function_pluggable_into_controller():
    from mppi_generic_tpu.shaping import CEMShapingFunction

    ctrl = VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16, num_rollouts=64,
        shaping_function=CEMShapingFunction(elite_fraction=jnp.float32(0.25)),
    )
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    res, _ = jax.jit(ctrl.solve)(jnp.array([2.0, 0.0, 0.0, 1.0]), cs)
    w = np.asarray(res.weights)
    assert set(np.unique(w)) <= {0.0, 1.0}
    assert int(w.sum()) == 16  # 25% of 64 elites


def test_in_kernel_map_query_refuses_cleanly_and_falls_back():
    """Round-4 review finding: inside a Pallas kernel trace, map queries
    that cannot take the tent-mask path (multichannel data, or side past
    the VMEM budget but under the one-hot ceiling) must raise
    PallasIncompatible — so the controllers' fallback fires — instead of
    falling through to one-hot/gather lowerings Mosaic rejects with a raw
    error."""
    import numpy as np

    from mppi_generic_tpu.controllers import VanillaMPPI
    from mppi_generic_tpu.costs import ARStandardCost
    from mppi_generic_tpu.maps.texture import MapTexture2D
    from mppi_generic_tpu.models import BicycleSlipDynamics
    from mppi_generic_tpu.sampling import GaussianDistribution

    rng = np.random.default_rng(0)
    for data in (
        np.abs(rng.normal(size=(600, 600))).astype("f"),   # > 512/side
        np.abs(rng.normal(size=(64, 64, 4))).astype("f"),  # multichannel
    ):
        tex = MapTexture2D.create(data, origin=(-32, -32, 0),
                                  resolution=1.0)

        def build(kernel):
            return VanillaMPPI(
                dynamics=BicycleSlipDynamics.create(),
                cost=ARStandardCost(costmap=tex,
                                    output_indices=(0, 1, 2, 8, 5, 6)),
                sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
                dt=jnp.float32(0.02), lam=jnp.float32(1.0),
                alpha=jnp.float32(0.0), num_timesteps=8, num_rollouts=128,
                num_iters=1, kernel=kernel,
            )

        key = jax.random.PRNGKey(5)
        x0 = jnp.zeros(10)
        res_p, _ = build("pallas").solve(x0, build("pallas").init_state(key))
        res_c, _ = build("combined").solve(
            x0, build("combined").init_state(key))
        np.testing.assert_allclose(np.asarray(res_p.control_mean),
                                   np.asarray(res_c.control_mean),
                                   rtol=1e-4, atol=1e-5)
