"""Controller warm-start snapshot tests (runtime/checkpoint.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.runtime.checkpoint import load_state, save_state
from mppi_generic_tpu.sampling import GaussianDistribution


def _ctrl():
    return VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=16,
        num_rollouts=64,
    )


def test_snapshot_roundtrip_reproduces_solve(tmp_path):
    ctrl = _ctrl()
    cs = ctrl.init_state(jax.random.PRNGKey(3))
    cs = cs.replace(control_mean=jnp.ones((16, 2)) * 0.3)
    path = os.path.join(tmp_path, "state.npz")
    save_state(path, cs)
    restored = load_state(path, ctrl.init_state(jax.random.PRNGKey(0)))

    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    r1, _ = jax.jit(ctrl.solve)(x0, cs)
    r2, _ = jax.jit(ctrl.solve)(x0, restored)
    np.testing.assert_allclose(
        np.asarray(r1.control_mean), np.asarray(r2.control_mean), atol=1e-6
    )


def test_snapshot_leaf_mismatch_raises(tmp_path):
    ctrl = _ctrl()
    cs = ctrl.init_state(jax.random.PRNGKey(0))
    path = os.path.join(tmp_path, "state.npz")
    save_state(path, cs)
    try:
        load_state(path, (cs.control_mean,))  # wrong structure
    except ValueError:
        return
    raise AssertionError("expected ValueError on structure mismatch")
