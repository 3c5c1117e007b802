"""Quadrotor dynamics (13-state, quaternion attitude).

Parity target: reference ``dynamics/quadrotor/quadrotor_dynamics.{cuh,cu}``
(computeDynamics :70-115, updateState quaternion renormalization :117-125):

* state  [x y z, vx vy vz, qw qx qy qz, wx wy wz]
* control [ang_rate_x, ang_rate_y, ang_rate_z, thrust]
* x_d = v;  v_d = (T/m) * R(q) e_z - g e_z;  q_d = 0.5 q (x) [0, w];
  w_d = (u_pqr - w)/tau  (first-order low-level rate tracking)
* Euler update then quaternion renormalization with sign(q_w) convention.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.models.base import Dynamics
from mppi_generic_tpu.utils import math_utils as mu

GRAVITY = 9.81


class QuadrotorDynamics(Dynamics):
    STATE_DIM: int = struct.field(pytree_node=False, default=13)
    CONTROL_DIM: int = struct.field(pytree_node=False, default=4)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=13)

    mass: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    tau_roll: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.25))
    tau_pitch: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.25))
    tau_yaw: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.25))

    @classmethod
    def create(cls, mass=1.0, tau_roll=0.25, tau_pitch=0.25, tau_yaw=0.25,
               **constraints):
        kw = cls._default_constraints(**constraints)
        return cls(
            mass=jnp.float32(mass),
            tau_roll=jnp.float32(tau_roll),
            tau_pitch=jnp.float32(tau_pitch),
            tau_yaw=jnp.float32(tau_yaw),
            **kw,
        )

    def state_deriv(self, x, u, t=0.0):
        v = [x[3], x[4], x[5]]
        qw, qx, qy, qz = x[6], x[7], x[8], x[9]
        w = [x[10], x[11], x[12]]
        u_thrust = u[3]

        # third column of the body-to-world DCM (Quat2DCM)
        r02 = 2 * (qx * qz + qw * qy)
        r12 = 2 * (qy * qz - qw * qx)
        r22 = 1 - 2 * (qx * qx + qy * qy)
        a = u_thrust / self.mass
        v_d = [a * r02, a * r12, a * r22 - GRAVITY]

        # quaternion kinematics 0.5 * q (x) [0, w] (omega2edot)
        qd_w = 0.5 * (-qx * w[0] - qy * w[1] - qz * w[2])
        qd_x = 0.5 * (qw * w[0] - qz * w[1] + qy * w[2])
        qd_y = 0.5 * (qz * w[0] + qw * w[1] - qx * w[2])
        qd_z = 0.5 * (-qy * w[0] + qx * w[1] + qw * w[2])

        w_d = [
            (u[0] - w[0]) / self.tau_roll,
            (u[1] - w[1]) / self.tau_pitch,
            (u[2] - w[2]) / self.tau_yaw,
        ]
        return jnp.stack(
            [v[0], v[1], v[2], v_d[0], v_d[1], v_d[2],
             qd_w, qd_x, qd_y, qd_z, w_d[0], w_d[1], w_d[2]]
        )

    def update_state(self, x, xdot, dt):
        x_next = x + xdot * dt
        q = x_next[6:10]
        norm = jnp.sqrt(jnp.sum(q * q, axis=0))
        scale = norm * mu.sign(x_next[6])
        q = q / scale
        return jnp.concatenate([x_next[:6], q, x_next[10:]], axis=0)

    def get_zero_state(self):
        return jnp.zeros((13,), jnp.float32).at[6].set(1.0)

    def state_from_map(self, mapping):
        keys = ["POS_X", "POS_Y", "POS_Z", "VEL_X", "VEL_Y", "VEL_Z",
                "QUAT_W", "QUAT_X", "QUAT_Y", "QUAT_Z",
                "ANG_VEL_X", "ANG_VEL_Y", "ANG_VEL_Z"]
        return jnp.array([mapping[k] for k in keys], jnp.float32)
