"""RACER Dubins dynamics — parametric AWD car with brake state and steering
lag.

Parity target: reference ``dynamics/racer_dubins/racer_dubins.{cuh,cu}``
(computeDynamics racer_dubins.cu:5-33, updateState :44-59). State
[vel_x, yaw, pos_x, pos_y, steer_angle, brake_state, steer_angle_rate],
control [throttle_brake, steer_cmd]. Parameter defaults from
racer_dubins.cuh:81-102.

Mechanics reproduced:
* brake actuator: first-order lag toward the braking command with
  asymmetric rate limits;
* longitudinal: throttle gain (gear-signed) - brake force opposing motion
  - linear drag + constant offset;
* yaw rate = (v/wheel_base) tan(steer_angle / steer_angle_scale);
* steering: rate-limited first-order tracking of the scaled command;
* update: yaw wrap, steer-angle clamp, steer rate bookkeeping, brake state
  clamped to [0, -u_min_throttle_brake].
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.models.base import Dynamics
from mppi_generic_tpu.utils import math_utils


class RacerDubinsDynamics(Dynamics):
    STATE_DIM: int = struct.field(pytree_node=False, default=7)
    CONTROL_DIM: int = struct.field(pytree_node=False, default=2)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=7)

    # engine model (racer_dubins.cuh:81-84)
    c_t: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.3))
    c_b: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.5))
    c_v: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(3.7))
    c_0: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(4.9))
    # steering (:86-92)
    steering_constant: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.6))
    steer_command_angle_scale: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(5.0)
    )
    steer_angle_scale: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(-9.1)
    )
    max_steer_angle: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.5))
    max_steer_rate: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(5.0))
    # brake (:94-97)
    brake_delay_constant: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(6.6)
    )
    max_brake_rate_neg: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.9)
    )
    max_brake_rate_pos: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.33)
    )
    # system (:99-102)
    wheel_base: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.3))
    gear_sign: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))

    @classmethod
    def create(cls, control_ranges=None, **kw):
        if control_ranges is None:
            control_ranges = [[-1.0, 1.0], [-1.0, 1.0]]
        base = cls._default_constraints(control_ranges=control_ranges)
        params = {k: jnp.float32(v) for k, v in kw.items()}
        return cls(**base, **params)

    def state_deriv(self, x, u, t=0.0):
        vel, yaw, steer, brake = x[0], x[1], x[4], x[5]
        throttle_brake, steer_cmd = u[0], u[1]
        enable_brake = throttle_brake < 0

        brake_d = jnp.clip(
            (jnp.where(enable_brake, -throttle_brake, 0.0) - brake)
            * self.brake_delay_constant,
            -self.max_brake_rate_neg,
            self.max_brake_rate_pos,
        )
        vel_d = (
            jnp.where(enable_brake, 0.0, 1.0) * self.c_t * throttle_brake * self.gear_sign
            + self.c_b * brake * jnp.where(vel >= 0, -1.0, 1.0)
            - self.c_v * vel
            + self.c_0
        )
        yaw_d = (vel / self.wheel_base) * jnp.tan(steer / self.steer_angle_scale)
        x_d = vel * jnp.cos(yaw)
        y_d = vel * jnp.sin(yaw)
        steer_d = jnp.clip(
            (steer_cmd * self.steer_command_angle_scale - steer)
            * self.steering_constant,
            -self.max_steer_rate,
            self.max_steer_rate,
        )
        zero = jnp.zeros_like(vel_d)
        return jnp.stack([vel_d, yaw_d, x_d, y_d, steer_d, brake_d, zero])

    def update_state(self, x, xdot, dt):
        x_next = x + xdot * dt
        yaw = math_utils.normalize_angle(x_next[1])
        steer = jnp.clip(x_next[4], -self.max_steer_angle, self.max_steer_angle)
        # STEER_ANGLE_RATE is bookkeeping: the steering derivative
        steer_rate = xdot[4]
        brake_max = -self.control_ranges[0, 0]
        brake = jnp.clip(x_next[5], 0.0, brake_max)
        return jnp.stack(
            [x_next[0], yaw, x_next[2], x_next[3], steer, brake, steer_rate]
        )

    def interpolate_state(self, x1, x2, alpha):
        out = (1 - alpha) * x1 + alpha * x2
        return out.at[1].set(math_utils.interp_angle(x1[1], x2[1], alpha))

    def state_from_map(self, mapping):
        keys = ["VEL_X", "YAW", "POS_X", "POS_Y", "STEER_ANGLE", "BRAKE_STATE",
                "STEER_ANGLE_RATE"]
        return jnp.array([mapping.get(k, 0.0) for k in keys], jnp.float32)
