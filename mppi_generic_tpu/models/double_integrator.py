"""Planar double-integrator dynamics.

Parity target: reference ``dynamics/double_integrator/di_dynamics.{cuh,cu}``
(state [pos_x, pos_y, vel_x, vel_y], control [accel_x, accel_y];
di_dynamics.cu:14-22). Optional process noise on the velocity states
(computeStateDisturbance, di_dynamics.cu:60-66) is exposed as a pure function
taking an explicit PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.models.base import Dynamics


class DoubleIntegratorDynamics(Dynamics):
    STATE_DIM: int = struct.field(pytree_node=False, default=4)
    CONTROL_DIM: int = struct.field(pytree_node=False, default=2)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=4)

    system_noise: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))

    @classmethod
    def create(cls, system_noise: float = 1.0, **constraints):
        kw = cls._default_constraints(**constraints)
        return cls(system_noise=jnp.float32(system_noise), **kw)

    def state_deriv(self, x, u, t=0.0):
        return jnp.stack([x[2], x[3], u[0], u[1]])

    def state_jacobian(self, x, u):
        A = jnp.zeros((4, 4)).at[0, 2].set(1.0).at[1, 3].set(1.0)
        B = jnp.zeros((4, 2)).at[2, 0].set(1.0).at[3, 1].set(1.0)
        return A, B

    def compute_state_disturbance(self, key, dt, x):
        """x += dt * N(0, system_noise) on the velocity components."""
        noise = jnp.sqrt(self.system_noise) * jax.random.normal(key, (2,))
        return x.at[2:4].add(noise * dt)

    def state_from_map(self, mapping):
        return jnp.array(
            [mapping["POS_X"], mapping["POS_Y"], mapping["VEL_X"], mapping["VEL_Y"]],
            jnp.float32,
        )
