"""Tests for the auxiliary subsystems: visualization pass (visualizeKernel
analog), shaping functions, logger, per-robot instantiations."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu import instantiations
from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.ops import rollout_combined, visualize
from mppi_generic_tpu.sampling import GaussianDistribution
from mppi_generic_tpu.shaping import (
    CEMShapingFunction,
    NormExpShapingFunction,
    TsallisShapingFunction,
)
from mppi_generic_tpu.utils.logger import LogLevel, MPPILogger


# ---------------------------------------------------------------- visualize
def test_visualize_matches_rollout_costs():
    dyn = DoubleIntegratorDynamics.create()
    cost = DoubleIntegratorCircleCost()
    K, T = 64, 30
    U = jax.random.normal(jax.random.PRNGKey(0), (K, T, 2)) * 0.5
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    w = jax.random.uniform(jax.random.PRNGKey(1), (K,))
    res = visualize(dyn, cost, x0, U, w, 0.02, num_vis=8, num_top=4)
    assert res.outputs.shape == (12, T, 4)
    assert res.cost_trajectory.shape == (12, T)
    assert res.crash_trajectory.shape == (12, T)
    # total costs must agree with the solve's rollout costs at those indices
    full_costs, _, _ = rollout_combined(dyn, cost, x0, U, 0.02)
    np.testing.assert_allclose(
        np.asarray(res.total_costs), np.asarray(full_costs[res.indices]),
        rtol=1e-5, atol=1e-6,
    )
    # top-k indices must contain the argmax weight
    assert int(jnp.argmax(w)) in np.asarray(res.indices[8:])


def test_controller_visualize_requires_samples():
    ctrl = VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16, num_rollouts=64, return_samples=True,
    )
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    res, _ = jax.jit(ctrl.solve)(x0, cs)
    vis = ctrl.visualize(x0, res, num_vis=4, num_top=2)
    assert vis.outputs.shape == (6, 16, 4)


# ------------------------------------------------------------------ shaping
def test_shaping_functions():
    costs = jnp.array([1.0, 2.0, 3.0, 10.0])
    w = NormExpShapingFunction(lam=jnp.float32(1.0)).compute_weights(costs)
    assert float(w[0]) == 1.0 and float(w[3]) < float(w[1]) < 1.0

    wt = TsallisShapingFunction().compute_weights(costs)
    assert float(wt[0]) == 1.0 and float(wt[3]) <= float(wt[1])

    wc = CEMShapingFunction(elite_fraction=jnp.float32(0.5)).compute_weights(costs)
    np.testing.assert_allclose(np.asarray(wc), [1.0, 1.0, 0.0, 0.0])


# ------------------------------------------------------------------- logger
def test_logger_levels_and_color():
    buf = io.StringIO()
    log = MPPILogger("mppi-test", level=LogLevel.WARNING, stream=buf,
                     use_color=False)
    log.debug("hidden")
    log.info("hidden")
    log.warning("visible %d", 42)
    log.error("bad")
    out = buf.getvalue()
    assert "hidden" not in out and "visible 42" in out and "bad" in out
    log.set_log_level(LogLevel.DEBUG)
    assert log.level == LogLevel.DEBUG


# ----------------------------------------------------------- instantiations
def test_instantiations_solve():
    for factory, x0 in [
        (instantiations.cartpole_mppi, jnp.array([0.0, 0.0, 3.14, 0.0])),
        (instantiations.double_integrator_mppi, jnp.array([2.0, 0.0, 0.0, 1.0])),
    ]:
        ctrl, fb = factory(num_rollouts=128, num_timesteps=16)
        cs = ctrl.init_state(jax.random.PRNGKey(0))
        res, _ = jax.jit(ctrl.solve)(x0, cs)
        assert np.all(np.isfinite(np.asarray(res.control_mean)))
        assert fb is not None
