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


class BicycleSlipParametricElevation(BicycleSlipDynamics):
    """Elevation-coupled bicycle-slip model — the reference's actual class
    shape: ``BicycleSlipParametricImpl : RacerDubinsElevationImpl``
    (bicycle_slip_parametric.cuh:83), which inherits the terrain texture,
    static settling, and uncertainty-propagation machinery.

    State (22) matches the reference enum exactly
    (bicycle_slip_parametric.cuh:26-50):
    [pos_x, pos_y, yaw, steer_angle, brake_state, vel_x, vel_y, omega_z,
     roll, pitch, steer_angle_rate, engine_rpm, 10 x uncertainty entries].

    Per step (device ``step``, bicycle_slip_parametric.cu:314-374):

    * the parametric slip force model (the equations the reference's
      computeDynamics documents, bicycle_slip_parametric.cu:90-150/236-306)
      drives [pos, yaw, steer, brake, vel_x, vel_y, omega_z];
    * with a ``normals_map``, the body-frame mean surface normal adds the
      gravity acceleration terms ``-tanhshrink(n_x) * gravity_x`` /
      ``-tanhshrink(n_y) * gravity_y`` (bicycle_slip_parametric.cu:264-268);
    * Euler update with yaw wrap / steer clamp / steer-rate write-back /
      brake clamp (updateState, bicycle_slip_parametric.cu:209-235);
    * uncertainty propagation Sigma' = (I + A dt) Sigma (I + A dt)^T + Q dt
      with the bicycle Jacobian (computeUncertaintyJacobian,
      bicycle_slip_parametric.cu:467-548 — position rows pick up the
      lateral-velocity terms) and the parent's structured Q;
    * roll/pitch from static settling on the elevation map
      (bicycle_slip_parametric.cu:189-196).

    Output (14): the RacerDubinsElevation 13-layout plus ACCEL_Y appended
    (the reference's extra BASELINK_VEL_B_Y / ACCEL_Y / OMEGA_Z /
    TOTAL_VELOCITY writes, bicycle_slip_parametric.cu:352-374).
    """

    STATE_DIM: int = struct.field(pytree_node=False, default=22)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=14)

    elevation_map: object = None  # Optional[MapTexture2D]
    normals_map: object = None    # Optional[MapTexture2D], 3-channel normals
    # gravity-along-normal coefficients (bicycle_slip_parametric.cuh:52-53)
    gravity_x: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(-3.9))
    gravity_y: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(-7.2))
    min_normal_x: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.2))
    min_normal_y: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.2))
    # tracking-feedback-aware uncertainty params (RacerDubinsElevationParams)
    K_vel_x: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    K_x: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    K_y: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    K_yaw: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    Q_x_acc: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))
    Q_x_v: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.1, 0.1, 0.1])
    )
    Q_omega_steering: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.1)
    )
    Q_omega_v: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))
    Q_y_f: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))

    @classmethod
    def create(cls, elevation_map=None, normals_map=None, control_ranges=None,
               **kw):
        if control_ranges is None:
            control_ranges = [[-1.0, 1.0], [-1.0, 1.0]]
        base = cls._default_constraints(control_ranges=control_ranges)
        params = {k: jnp.asarray(v, jnp.float32) for k, v in kw.items()}
        return cls(elevation_map=elevation_map, normals_map=normals_map,
                   **base, **params)

    # --- dynamics -------------------------------------------------------
    def state_deriv(self, x, u, t=0.0):
        from mppi_generic_tpu.models.racer_dubins_elevation import (
            body_frame_normals,
        )

        # the parametric slip model reads the shared first-10 state layout
        flat = super().state_deriv(x, u, t)  # (10, ...)
        if self.normals_map is not None:
            nx, ny, _nz = body_frame_normals(
                self.normals_map, x[0], x[1], x[2], x[8], x[9]
            )
            # tanhshrink_scale(n, m) = n - m * tanh(n / m)
            gx = (nx - self.min_normal_x * jnp.tanh(nx / self.min_normal_x)
                  ) * self.gravity_x
            gy = (ny - self.min_normal_y * jnp.tanh(ny / self.min_normal_y)
                  ) * self.gravity_y
            flat = flat.at[5].add(-gx).at[6].add(-gy)
        pad = jnp.zeros_like(
            jnp.broadcast_to(flat[:1], (12,) + flat.shape[1:])
        )
        return jnp.concatenate([flat, pad], axis=0)

    # --- uncertainty (bicycle Jacobian, parent-structured Q) ------------
    def _unc_jacobian(self, x, u):
        """A in (vx, yaw, px, py) order with the bicycle's lateral-velocity
        position terms (computeUncertaintyJacobian,
        bicycle_slip_parametric.cu:467-548)."""
        vel, vel_y = x[5], x[6]
        yaw, steer = x[2], x[3]
        sin_y, cos_y = jnp.sin(yaw), jnp.cos(yaw)
        delta = steer / self.steer_angle_scale
        cos2_d = jnp.cos(delta) ** 2
        L = self.wheel_base
        zero = jnp.zeros_like(vel)
        rows = [
            [-self.c_vx - self.K_vel_x + zero, zero,
             -self.K_x * cos_y, -self.K_x * sin_y],
            [zero,
             -jnp.abs(vel) * self.K_yaw / (L * cos2_d),
             vel * self.K_y * sin_y / (L * cos2_d),
             -vel * self.K_y * cos_y / (L * cos2_d)],
            [cos_y + zero, -sin_y * vel - cos_y * vel_y, zero, zero],
            [sin_y + zero, cos_y * vel - sin_y * vel_y, zero, zero],
        ]
        return jnp.stack([jnp.stack(r) for r in rows])

    def _q_matrix(self, x, vel_d):
        """Parent-structured process noise Q (computeQ,
        racer_dubins_elevation.cu:428-516) on the bicycle state layout."""
        vel, yaw, steer, roll = x[5], x[2], x[3], x[8]
        sin_y, cos_y = jnp.sin(yaw), jnp.cos(yaw)
        delta = steer / self.steer_angle_scale
        abs_v = jnp.abs(vel)
        side_force = (abs_v ** 2 * jnp.tan(delta) / self.wheel_base
                      + 9.81 * jnp.sin(roll))
        q11 = jnp.abs(self.Q_y_f * jnp.abs(side_force)
                      * jnp.maximum(abs_v - 2.0, 0.0))
        zero = jnp.zeros_like(vel)
        regime = jnp.where(
            abs_v <= 0.2, self.Q_x_v[0],
            jnp.where(abs_v <= 3.0, self.Q_x_v[1], self.Q_x_v[2]),
        )
        q_vv = self.Q_x_acc * jnp.abs(vel_d) + regime * abs_v
        q_yy = abs_v * (self.Q_omega_steering * jnp.abs(delta) + self.Q_omega_v)
        rows = [
            [q_vv, zero, zero, zero],
            [zero, q_yy, zero, zero],
            [zero, zero, q11 * sin_y * sin_y, -q11 * sin_y * cos_y],
            [zero, zero, -q11 * sin_y * cos_y, q11 * cos_y * cos_y],
        ]
        return jnp.stack([jnp.stack(r) for r in rows])

    # --- step -----------------------------------------------------------
    def step(self, x, u, t, dt):
        from mppi_generic_tpu.models.racer_dubins_elevation import (
            static_settling,
        )
        from mppi_generic_tpu.models.racer_dubins_unc import (
            propagate_uncertainty,
        )

        xdot = self.state_deriv(x, u, t)
        nxt = x + xdot * dt
        yaw = math_utils.normalize_angle(nxt[2])
        steer = jnp.clip(nxt[3], -self.max_steer_angle, self.max_steer_angle)
        brake_max = -self.control_ranges[0, 0]
        brake = jnp.clip(nxt[4], 0.0, brake_max)

        # Sigma' = (I + A dt) Sigma (I + A dt)^T + Q dt on the packed
        # entries at state[12:22] (computeUncertaintyPropagation reuse)
        A = self._unc_jacobian(x, u)
        Q = self._q_matrix(x, xdot[5])
        unc = propagate_uncertainty(x[12:22], A, Q, dt)

        roll, pitch, height = static_settling(
            self.elevation_map, nxt[0], nxt[1], yaw, x[8], x[9]
        )
        x_next = jnp.stack(
            [nxt[0], nxt[1], yaw, steer, brake, nxt[5], nxt[6], nxt[7],
             roll, pitch, xdot[3], nxt[11]]
            + [unc[i] for i in range(10)]
        )
        total_v = math_utils.sign(nxt[5]) * jnp.sqrt(
            nxt[5] * nxt[5] + nxt[6] * nxt[6]
        )
        y = jnp.stack(
            [x_next[5], x_next[6], x_next[0], x_next[1], height, yaw,
             roll, pitch, steer, xdot[3], xdot[5], x_next[7], total_v,
             xdot[6]]
        )
        return x_next, y

    def update_state(self, x, xdot, dt):
        """Host updateState semantics (bicycle_slip_parametric.cu:152-167):
        Euler + yaw wrap / steer clamp / steer-rate write-back / brake
        clamp, roll-pitch held. ``step`` layers settling + uncertainty on
        top of this."""
        nxt = x + xdot * dt
        yaw = math_utils.normalize_angle(nxt[2])
        steer = jnp.clip(nxt[3], -self.max_steer_angle, self.max_steer_angle)
        brake = jnp.clip(nxt[4], 0.0, -self.control_ranges[0, 0])
        return jnp.concatenate([
            jnp.stack([nxt[0], nxt[1], yaw, steer, brake, nxt[5], nxt[6],
                       nxt[7], x[8], x[9], xdot[3], nxt[11]]),
            nxt[12:22],
        ], axis=0)

    def get_zero_state(self):
        return jnp.zeros((22,), jnp.float32)

    def state_from_map(self, mapping):
        keys = ["POS_X", "POS_Y", "YAW", "STEER_ANGLE", "BRAKE_STATE",
                "VEL_X", "VEL_Y", "OMEGA_Z", "ROLL", "PITCH",
                "STEER_ANGLE_RATE", "ENGINE_RPM"]
        vals = [mapping.get(k, 0.0) for k in keys] + [0.0] * 10
        return jnp.array(vals, jnp.float32)
