"""Bicycle-slip parametric dynamics (dynamic bicycle model with tire slip).

Parity target: reference
``dynamics/bicycle_slip/bicycle_slip_parametric.{cuh,cu}``. Note: the
reference's CPU ``computeDynamics`` body is commented out upstream
(bicycle_slip_parametric.cu:90-150 is dead code); this implements the model
those equations document, with the map-normal terms optional:

* state [pos_x, pos_y, yaw, steer_angle, brake_state, vel_x, vel_y, omega_z,
  roll, pitch] (first 10 of the reference enum; the uncertainty block is
  handled by the elevation/uncertainty variants)
* brake/steering actuators: same first-order lag models as RacerDubins;
* longitudinal force: tanh RPM-curve throttle - tanh brake (velocity-signed)
  - tanh rolling drag;
* lateral force: tanh(vel_x * omega_z) coupling - tanh sliding drag;
* omega_z: first-order tracking of the kinematic bicycle yaw rate
  (v/wheel_base * tan(wheel_angle)) with a velocity-dependent drag;
* body-frame velocity kinematics with yaw wrap.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.models.base import Dynamics
from mppi_generic_tpu.utils import math_utils


def _tanh_scale(x, c):
    """c[0] * tanh(c[1] * x) drag helper (tanh_scale in the reference)."""
    return c[0] * jnp.tanh(c[1] * x)


class BicycleSlipDynamics(Dynamics):
    STATE_DIM: int = struct.field(pytree_node=False, default=10)
    CONTROL_DIM: int = struct.field(pytree_node=False, default=2)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=10)

    mass: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(20.0))
    wheel_base: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.3))
    steer_angle_scale: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(-9.1)
    )
    steer_command_angle_scale: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(5.0)
    )
    steering_constant: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.6))
    max_steer_angle: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.5))
    max_steer_rate: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(5.0))
    brake_delay_constant: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(6.6)
    )
    max_brake_rate_neg: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.9)
    )
    max_brake_rate_pos: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.33)
    )
    # force model coefficients
    c_throttle: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(40.0))
    c_brake: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([30.0, 1.0])
    )
    c_rolling: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([2.0, 0.5])
    )
    c_sliding: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([10.0, 1.0])
    )
    y_f_c: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.5, 20.0])
    )
    c_omega: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(4.0))
    c_v_omega: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    c_vx: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    c_vy: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))

    @classmethod
    def create(cls, control_ranges=None, **kw):
        if control_ranges is None:
            control_ranges = [[-1.0, 1.0], [-1.0, 1.0]]
        base = cls._default_constraints(control_ranges=control_ranges)
        params = {k: jnp.asarray(v, jnp.float32) for k, v in kw.items()}
        return cls(**base, **params)

    def state_deriv(self, x, u, t=0.0):
        yaw, steer, brake = x[2], x[3], x[4]
        vel_x, vel_y, omega = x[5], x[6], x[7]
        throttle_brake, steer_cmd = u[0], u[1]
        enable_brake = throttle_brake < 0

        brake_d = jnp.clip(
            (jnp.where(enable_brake, -throttle_brake, 0.0) - brake)
            * self.brake_delay_constant,
            -self.max_brake_rate_neg,
            self.max_brake_rate_pos,
        )
        steer_d = jnp.clip(
            (steer_cmd * self.steer_command_angle_scale - steer)
            * self.steering_constant,
            -self.max_steer_rate,
            self.max_steer_rate,
        )

        throttle = jnp.where(enable_brake, 0.0, 1.0) * self.c_throttle * throttle_brake
        brake_force = _tanh_scale(vel_x, self.c_brake) * brake
        drag_x = _tanh_scale(vel_x, self.c_rolling)
        x_force = throttle - brake_force - drag_x

        drag_y = _tanh_scale(vel_y, self.c_sliding)
        y_force = (
            jnp.tanh(vel_x * omega * self.y_f_c[0]) * self.y_f_c[1] - drag_y
        )

        wheel_angle = jnp.tan(steer / self.steer_angle_scale)
        sin_w, cos_w = jnp.sin(wheel_angle), jnp.cos(wheel_angle)

        parametric_omega = (vel_x / self.wheel_base) * wheel_angle
        omega_d = (parametric_omega - omega) * self.c_omega - omega * self.c_v_omega

        vel_x_d = (
            (x_force + x_force * cos_w - y_force * sin_w) / self.mass
            - vel_x * self.c_vx
            + vel_y * omega
        )
        vel_y_d = (
            (y_force + y_force * cos_w + x_force * sin_w) / self.mass
            - vel_y * self.c_vy
            - vel_x * omega
        )

        cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
        x_d = vel_x * cos_y - vel_y * sin_y
        y_d = vel_x * sin_y + vel_y * cos_y
        zero = jnp.zeros_like(x_d)
        return jnp.stack(
            [x_d, y_d, omega, steer_d, brake_d, vel_x_d, vel_y_d, omega_d,
             zero, zero]
        )

    def update_state(self, x, xdot, dt):
        x_next = x + xdot * dt
        yaw = math_utils.normalize_angle(x_next[2])
        steer = jnp.clip(x_next[3], -self.max_steer_angle, self.max_steer_angle)
        brake_max = -self.control_ranges[0, 0]
        brake = jnp.clip(x_next[4], 0.0, brake_max)
        return jnp.stack(
            [x_next[0], x_next[1], yaw, steer, brake,
             x_next[5], x_next[6], x_next[7], x_next[8], x_next[9]]
        )

    def state_from_map(self, mapping):
        keys = ["POS_X", "POS_Y", "YAW", "STEER_ANGLE", "BRAKE_STATE",
                "VEL_X", "VEL_Y", "OMEGA_Z", "ROLL", "PITCH"]
        return jnp.array([mapping.get(k, 0.0) for k in keys], jnp.float32)
