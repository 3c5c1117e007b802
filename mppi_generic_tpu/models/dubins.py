"""Dubins / unicycle dynamics.

Parity target: reference ``dynamics/dubins/dubins.cu``
(state [pos_x, pos_y, yaw], control [vel, yaw_rate]; dubins.cu:8-14), with
yaw normalized to [-pi, pi) after each Euler update (dubins.cu:28-33).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.models.base import Dynamics
from mppi_generic_tpu.utils import math_utils


class DubinsDynamics(Dynamics):
    STATE_DIM: int = struct.field(pytree_node=False, default=3)
    CONTROL_DIM: int = struct.field(pytree_node=False, default=2)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=3)

    @classmethod
    def create(cls, **constraints):
        return cls(**cls._default_constraints(**constraints))

    def state_deriv(self, x, u, t=0.0):
        yaw = x[2]
        return jnp.stack([u[0] * jnp.cos(yaw), u[0] * jnp.sin(yaw), u[1]])

    def update_state(self, x, xdot, dt):
        x_next = x + xdot * dt
        wrapped = math_utils.normalize_angle(x_next[2])
        # axis-0 functional update that also works on SoA component blocks
        return jnp.stack([x_next[0], x_next[1], wrapped])

    def interpolate_state(self, x1, x2, alpha):
        out = (1 - alpha) * x1 + alpha * x2
        return out.at[2].set(math_utils.interp_angle(x1[2], x2[2], alpha))

    def state_from_map(self, mapping):
        return jnp.array(
            [mapping["POS_X"], mapping["POS_Y"], mapping["YAW"]], jnp.float32
        )
