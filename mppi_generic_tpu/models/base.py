"""Dynamics base class — TPU-native redesign of the reference's CRTP
``Dynamics<CLASS_T, PARAMS_T>`` (dynamics/dynamics.cuh:67-522).

Design: a dynamics model is an immutable pytree (``flax.struct.PyTreeNode``)
of parameters with *pure* methods. There is no host/device mirror, no
GPUSetup/paramsToDevice — JAX owns placement. The step contract mirrors the
reference (dynamics.cuh:283-291):

    step(x, u, t, dt) = state_deriv -> Euler update -> state_to_output

Batching convention: all methods are written for a single state vector ``x``
of shape (S,) and control ``u`` of shape (C,) using component indexing
(``x[2]``) plus broadcasting jnp math. Because only axis 0 is indexed, the
same code runs unmodified in three regimes:

* single vector (S,) — host-side re-rollout, tests;
* under ``jax.vmap`` over a leading sample axis — the XLA rollout path;
* structure-of-arrays (S, 1, K_block) blocks inside Pallas kernels — each
  component is a (1, K_block) lane-major row on the VPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.utils import math_utils


class Dynamics(struct.PyTreeNode):
    """Base dynamics model.

    Subclasses define ``STATE_DIM`` / ``CONTROL_DIM`` / ``OUTPUT_DIM`` class
    attributes and implement ``state_deriv``. Control-constraint fields
    (ranges/deadband/zero control) live here, mirroring
    dynamics.cuh:250-264 + the device path dynamics.cu:97-116.
    """

    STATE_DIM: int = struct.field(pytree_node=False, default=0)
    CONTROL_DIM: int = struct.field(pytree_node=False, default=0)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=0)

    # (C, 2) [min, max] per channel; (C,) deadband; (C,) zero-control.
    control_ranges: jnp.ndarray = None
    control_deadband: jnp.ndarray = None
    zero_control: jnp.ndarray = None

    # --- construction helpers -------------------------------------------------
    @classmethod
    def _default_constraints(cls, control_ranges=None, control_deadband=None,
                             zero_control=None):
        C = cls.CONTROL_DIM
        if control_ranges is None:
            control_ranges = jnp.stack(
                [jnp.full((C,), -jnp.inf), jnp.full((C,), jnp.inf)], axis=-1
            )
        else:
            control_ranges = jnp.asarray(control_ranges, jnp.float32).reshape(C, 2)
        if control_deadband is None:
            control_deadband = jnp.zeros((C,), jnp.float32)
        else:
            control_deadband = jnp.asarray(control_deadband, jnp.float32)
        if zero_control is None:
            zero_control = jnp.zeros((C,), jnp.float32)
        else:
            zero_control = jnp.asarray(zero_control, jnp.float32)
        return dict(
            control_ranges=control_ranges,
            control_deadband=control_deadband,
            zero_control=zero_control,
        )

    # --- core contract ---------------------------------------------------------
    def state_deriv(self, x, u, t=0.0):
        """Continuous-time dx/dt. Component-indexed on axis 0 (see module doc)."""
        raise NotImplementedError

    def update_state(self, x, xdot, dt):
        """Default explicit-Euler integration (dynamics.cuh:276-281).

        Models with wrapped/normalized state components (angles, quaternions)
        override this.
        """
        return x + xdot * dt

    def state_to_output(self, x):
        """Default: output = the first OUTPUT_DIM state components
        (dynamics.cuh stateToOutput hack: output[i] = state[i])."""
        if self.OUTPUT_DIM == self.STATE_DIM:
            return x
        return x[: self.OUTPUT_DIM]

    def step(self, x, u, t, dt):
        """One discrete step: returns (x_next, output)."""
        xdot = self.state_deriv(x, u, t)
        x_next = self.update_state(x, xdot, dt)
        return x_next, self.state_to_output(x_next)

    def enforce_constraints(self, x, u):
        """Deadband snap-to-zero-control, deadband shrink, then clamp.

        Mirrors dynamics.cuh:250-264: |u| < deadband -> zero_control; else
        subtract deadband*sign(u); finally clamp to [min, max].
        """
        del x
        db = self._bcast(self.control_deadband, u)
        zc = self._bcast(self.zero_control, u)
        lo = self._bcast(self.control_ranges[:, 0], u)
        hi = self._bcast(self.control_ranges[:, 1], u)
        shrunk = u - db * math_utils.sign(u)
        u = jnp.where(jnp.abs(u) < db, zc, shrunk)
        return jnp.clip(u, lo, hi)

    @staticmethod
    def _bcast(param, like):
        """Broadcast a (C,) parameter against a control of shape (C, ...)."""
        extra = like.ndim - 1
        return param.reshape(param.shape + (1,) * extra)

    # --- auxiliary API (parity with the reference) ------------------------------
    def get_stopping_control(self, x):
        """Control to bring the platform to a stop (dynamics.cuh:437-443)."""
        del x
        return self.zero_control

    def get_zero_state(self):
        return jnp.zeros((self.STATE_DIM,), jnp.float32)

    def enforce_leash(self, state_true, state_nominal, leash):
        """Clamp nominal state within per-dim ``leash`` of the true state
        (dynamics.cuh:448-466, used by ColoredMPPI's state leash)."""
        diff = state_nominal - state_true
        return state_true + jnp.clip(diff, -leash, leash)

    def state_jacobian(self, x, u):
        """(A, B) continuous-time Jacobians via jax.jacfwd (replaces the
        reference's hand-derived computeGrad)."""
        A = jax.jacfwd(lambda s: self.state_deriv(s, u))(x)
        B = jax.jacfwd(lambda c: self.state_deriv(x, c))(u)
        return A, B

    # LSTM/buffer hooks (dynamics.cuh:468-476); overridden by learned models.
    @property
    def requires_buffer(self) -> bool:
        return False

    def update_from_buffer(self, buffer):
        return self

    # --- recurrent models (LSTM-in-rollout) -----------------------------------
    # The reference keeps per-rollout LSTM hidden/cell state in kernel shared
    # memory (lstm_helper.cuh:130-133); here it rides in the rollout scan
    # carry as an arbitrary pytree. Stateless models use None.
    def init_recurrent_state(self):
        return None

    def step_recurrent(self, x, rec, u, t, dt):
        """One step for recurrent models: returns (x_next, output, rec_next).
        Default: delegate to the stateless step."""
        x_next, y = self.step(x, u, t, dt)
        return x_next, y, rec

    def state_from_map(self, mapping):
        """Build a state vector from a {name: value} dict (dynamics.cuh:508)."""
        raise NotImplementedError


def rollout_single(dynamics: Dynamics, x0, U, dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Roll a single control sequence (T, C) from x0; returns (states (T+1, S),
    outputs (T, O)). The CPU-oracle analog of computeStateTrajectoryHelper."""

    def step_fn(carry, ut_t):
        x, rec = carry
        u, t = ut_t
        u = dynamics.enforce_constraints(x, u)
        x_next, y, rec = dynamics.step_recurrent(x, rec, u, t, dt)
        return (x_next, rec), (x_next, y)

    T = U.shape[0]
    _, (xs, ys) = jax.lax.scan(
        step_fn,
        (x0, dynamics.init_recurrent_state()),
        (U, jnp.arange(T, dtype=jnp.float32)),
    )
    states = jnp.concatenate([x0[None], xs], axis=0)
    return states, ys
