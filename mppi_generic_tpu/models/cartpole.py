"""Cartpole dynamics.

Parity target: reference ``dynamics/cartpole/cartpole_dynamics.{cuh,cu}``
(state [pos_x, vel_x, theta, theta_dot], control [force];
cartpole_dynamics.cu:49-71). Gravity 9.81, default masses/length match the
reference params struct.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.models.base import Dynamics

GRAVITY = 9.81


class CartpoleDynamics(Dynamics):
    STATE_DIM: int = struct.field(pytree_node=False, default=4)
    CONTROL_DIM: int = struct.field(pytree_node=False, default=1)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=4)

    cart_mass: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    pole_mass: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    pole_length: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))

    @classmethod
    def create(cls, cart_mass=1.0, pole_mass=1.0, pole_length=1.0, **constraints):
        kw = cls._default_constraints(**constraints)
        return cls(
            cart_mass=jnp.float32(cart_mass),
            pole_mass=jnp.float32(pole_mass),
            pole_length=jnp.float32(pole_length),
            **kw,
        )

    def state_deriv(self, x, u, t=0.0):
        theta = x[2]
        theta_dot = x[3]
        force = u[0]
        sin_t = jnp.sin(theta)
        cos_t = jnp.cos(theta)
        m_c, m_p, l_p = self.cart_mass, self.pole_mass, self.pole_length
        denom = m_c + m_p * sin_t**2
        x_acc = (force + m_p * sin_t * (l_p * theta_dot**2 + GRAVITY * cos_t)) / denom
        t_acc = (
            -force * cos_t
            - m_p * l_p * theta_dot**2 * cos_t * sin_t
            - (m_c + m_p) * GRAVITY * sin_t
        ) / (l_p * denom)
        return jnp.stack([x[1], x_acc, theta_dot, t_acc])

    def state_from_map(self, mapping):
        return jnp.array(
            [mapping["POS_X"], mapping["VEL_X"], mapping["THETA"], mapping["THETA_DOT"]],
            jnp.float32,
        )
