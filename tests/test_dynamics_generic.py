"""Generic dynamics-contract tests over the whole model zoo — the analog of
the reference's ``tests/dynamics/dynamics_generic_tests.cu`` template tests:
every model must satisfy the step contract (shapes, finiteness), behave
identically under vmap (the rollout-path contract), respect control
constraints, and expose the auxiliary API (zero state, stopping control)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.models import (
    AutorallyNNDynamics,
    BicycleSlipDynamics,
    CartpoleDynamics,
    DoubleIntegratorDynamics,
    DubinsDynamics,
    QuadrotorDynamics,
    RacerDubinsDynamics,
    RacerDubinsElevationDynamics,
    RacerDubinsElevationLSTMSteering,
    RacerDubinsElevationLSTMUncertainty,
    RacerDubinsElevationSuspension,
    RacerSuspensionDynamics,
)


def _all_models():
    key = jax.random.PRNGKey(0)
    return [
        DoubleIntegratorDynamics.create(),
        CartpoleDynamics.create(),
        DubinsDynamics.create(),
        QuadrotorDynamics.create(),
        AutorallyNNDynamics.create(key=key),
        RacerDubinsDynamics.create(),
        RacerDubinsElevationDynamics.create(),
        RacerDubinsElevationLSTMSteering.create(),
        RacerDubinsElevationSuspension.create(),
        RacerDubinsElevationLSTMUncertainty.create(),
        RacerSuspensionDynamics.create(),
        BicycleSlipDynamics.create(),
    ]


MODELS = _all_models()
IDS = [type(m).__name__ for m in MODELS]


def _nominal_state(dyn):
    x = dyn.get_zero_state()
    # quaternion models need a valid attitude; get_zero_state handles it
    return x


@pytest.mark.parametrize("dyn", MODELS, ids=IDS)
def test_step_contract(dyn):
    x = _nominal_state(dyn)
    assert x.shape == (dyn.STATE_DIM,)
    u = jnp.full((dyn.CONTROL_DIM,), 0.1)
    rec = dyn.init_recurrent_state()
    x2, y, rec2 = dyn.step_recurrent(x, rec, u, 0.0, 0.02)
    assert x2.shape == (dyn.STATE_DIM,)
    assert y.shape == (dyn.OUTPUT_DIM,)
    assert bool(jnp.all(jnp.isfinite(x2)))
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("dyn", MODELS, ids=IDS)
def test_vmap_matches_single(dyn):
    """The rollout-path contract: batched step == per-sample step."""
    x = _nominal_state(dyn)
    rec = dyn.init_recurrent_state()
    us = jnp.stack([
        jnp.full((dyn.CONTROL_DIM,), v) for v in (-0.5, 0.0, 0.3)
    ])
    single = jnp.stack([
        dyn.step_recurrent(x, rec, u, 0.0, 0.02)[0] for u in us
    ])
    batched = jax.vmap(
        lambda u: dyn.step_recurrent(x, rec, u, 0.0, 0.02)[0]
    )(us)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dyn", MODELS, ids=IDS)
def test_enforce_constraints_clamps(dyn):
    lo = jnp.nan_to_num(dyn.control_ranges[:, 0], neginf=-1e30)
    hi = jnp.nan_to_num(dyn.control_ranges[:, 1], posinf=1e30)
    u_big = jnp.full((dyn.CONTROL_DIM,), 1e6)
    u = dyn.enforce_constraints(_nominal_state(dyn), u_big)
    assert bool(jnp.all(u <= hi + 1e-6))
    u = dyn.enforce_constraints(_nominal_state(dyn), -u_big)
    assert bool(jnp.all(u >= lo - 1e-6))


@pytest.mark.parametrize("dyn", MODELS, ids=IDS)
def test_stopping_control_finite(dyn):
    u = dyn.get_stopping_control(_nominal_state(dyn))
    assert u.shape == (dyn.CONTROL_DIM,)
    assert bool(jnp.all(jnp.isfinite(u)))


@pytest.mark.parametrize("dyn", MODELS, ids=IDS)
def test_jit_step(dyn):
    """Everything must trace under jit (static-shape discipline)."""
    x = _nominal_state(dyn)
    rec = dyn.init_recurrent_state()
    u = jnp.zeros((dyn.CONTROL_DIM,))
    f = jax.jit(lambda x, u: dyn.step_recurrent(x, rec, u, 0.0, 0.02)[0])
    x2 = f(x, u)
    assert bool(jnp.all(jnp.isfinite(x2)))
