"""Racer Dubins elevation variants with suspension and learned uncertainty.

Parity targets:

* ``dynamics/racer_dubins/racer_dubins_elevation_suspension_lstm.{cuh,cu}``
  (RacerDubinsElevationSuspension): the LSTM-steering elevation model plus a
  small-angle 4-wheel spring-damper suspension driving dynamic roll/pitch/
  cg-height states (computeSimpleSuspensionStep, :60-165), and the 4x4
  (pos_x, pos_y, yaw, vel_x) uncertainty covariance propagated per step as
  Sigma' = (I + A dt) Sigma (I + A dt)^T + Q dt (racer_dubins_elevation.cu:
  672-760) with the feedback-aware Jacobian A (= df/dx + df/du K, :337-426)
  and structured parametric Q (:428-516).

* ``dynamics/racer_dubins/racer_dubins_elevation_lstm_unc.{cuh,cu}``
  (RacerDubinsElevationLSTMUncertainty): adds a quadratic brake model
  (:246-256), a *mean* LSTM correcting the vel/yaw derivatives (:264-281,
  forward gear only), an OMEGA_Z state mirroring the yaw rate (:282), static
  roll/pitch settled from the elevation map (:289-295), and an *uncertainty*
  LSTM whose sigmoid-scaled outputs replace the parametric Q entries
  (computeQ, :300-495).

State layout (this build): the first 9 entries match
``RacerDubinsElevationDynamics`` ([vel_x, yaw, pos_x, pos_y, steer_angle,
brake_state, steer_angle_rate, roll, pitch]) so the parametric derivations
are reused verbatim; suspension states follow ([cg_pos_z, cg_vel_i_z,
roll_rate, pitch_rate]), then the 10 uncertainty entries ([pos_x, pos_y,
yaw, vel_x, pos_x_y, pos_x_yaw, pos_x_vel_x, pos_y_yaw, pos_y_vel_x,
yaw_vel_x]); the LSTM-uncertainty model appends [omega_z, static_roll,
static_pitch].

Known reference defects not reproduced (intended semantics implemented):
the suspension's front-wheel yaw uses the literal enum value
``S_INDEX(STEER_ANGLE)/-9.1f`` (a constant!) instead of the steering state
(suspension_lstm.cu:126); the host-side Q leaves sin(roll) uninitialized
(racer_dubins_elevation.cu:436-447).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.models.racer_dubins_elevation import (
    RacerDubinsElevationDynamics,
    RacerDubinsElevationLSTMSteering,
)
from mppi_generic_tpu.nn.lstm import LSTM, LSTMLSTM
from mppi_generic_tpu.utils import math_utils

# uncertainty-covariance packing order within the state vector
# (racer_dubins.cuh StateIndex UNCERTAINTY_* ordering)
_U_NAMES = ("px", "py", "yaw", "vx", "px_py", "px_yaw", "px_vx",
            "py_yaw", "py_vx", "yaw_vx")
# 4x4 matrix order used for A / Q / Sigma
_M_ORDER = ("vx", "yaw", "px", "py")


def unc_state_to_matrix(s10):
    """(10, ...) packed entries -> (4, 4, ...) symmetric covariance in
    (vx, yaw, px, py) order (uncertaintyStateToMatrix,
    racer_dubins_elevation.cu:519-579)."""
    px, py, yaw, vx, px_py, px_yaw, px_vx, py_yaw, py_vx, yaw_vx = (
        s10[i] for i in range(10)
    )
    rows = [
        [vx, yaw_vx, px_vx, py_vx],
        [yaw_vx, yaw, px_yaw, py_yaw],
        [px_vx, px_yaw, px, px_py],
        [py_vx, py_yaw, px_py, py],
    ]
    return jnp.stack([jnp.stack(r) for r in rows])


def unc_matrix_to_state(S):
    """(4, 4, ...) -> (10, ...) packed entries (uncertaintyMatrixToState)."""
    return jnp.stack([
        S[2, 2], S[3, 3], S[1, 1], S[0, 0],
        S[2, 3], S[2, 1], S[2, 0], S[3, 1], S[3, 0], S[1, 0],
    ])


def propagate_uncertainty(s10, A, Q, dt):
    """Sigma' = (I + A dt) Sigma (I + A dt)^T + Q dt
    (computeUncertaintyPropagation, racer_dubins_elevation.cu:672-760).

    Written as explicit 4x4 scalar loops over axis-0-indexed blocks (not an
    einsum): Mosaic's matmul supports at most one batch dim, so the
    unrolled form is what lets the whole uncertainty block run inside the
    fused Pallas rollout kernel — and XLA fuses it identically on the
    batched path."""
    S = unc_state_to_matrix(s10)
    Ad = [[A[i, j] * dt + (1.0 if i == j else 0.0) for j in range(4)]
          for i in range(4)]
    M = [[sum(Ad[i][k] * S[k, j] for k in range(4)) for j in range(4)]
         for i in range(4)]
    S2 = [[sum(M[i][k] * Ad[l][k] for k in range(4)) + Q[i, l] * dt
           for l in range(4)] for i in range(4)]
    return unc_matrix_to_state(jnp.stack([jnp.stack(r) for r in S2]))


class RacerDubinsElevationSuspension(RacerDubinsElevationLSTMSteering):
    """LSTM-steering elevation model + simple suspension + uncertainty."""

    STATE_DIM: int = struct.field(pytree_node=False, default=23)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=27)

    # suspension (RacerDubinsElevationSuspensionParams, suspension_lstm.cuh:54-64)
    spring_k: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(14000.0))
    drag_c: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1000.0))
    mass: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1447.0))
    I_xx: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1447.0 / 12 * 2 * 1.5**2)
    )
    I_yy: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1447.0 / 12 * (1.5**2 + 3.0**2))
    )
    wheel_radius: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.32))
    cg_x: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.981 / 2))
    half_track: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.737))

    # tracking-feedback-aware uncertainty params (racer_dubins_elevation.cuh)
    K_x: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    K_y: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    K_yaw: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    K_vel_x: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    Q_x_acc: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))
    Q_x_v: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.1, 0.1, 0.1], jnp.float32)
    )
    Q_omega_steering: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.1)
    )
    Q_omega_v: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.02))
    Q_y_f: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.05))

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, lstm=None, elevation_map=None, control_ranges=None,
               key=None, **kw):
        base = RacerDubinsElevationLSTMSteering.create(
            lstm=lstm, elevation_map=elevation_map,
            control_ranges=control_ranges, key=key,
        )
        fields = {f: getattr(base, f) for f in base.__dataclass_fields__
                  if f in cls.__dataclass_fields__
                  and f not in ("STATE_DIM", "OUTPUT_DIM")}
        fields.update({k: jnp.asarray(v, jnp.float32) for k, v in kw.items()})
        return cls(**fields)

    def get_zero_state(self):
        return jnp.zeros((self.STATE_DIM,), jnp.float32)

    def _wheel_body_positions(self):
        """FR, FL, BR, BL (suspension_lstm.cu:74-77)."""
        fx = 2 * self.cg_x
        ht = self.half_track
        zero = jnp.float32(0.0)
        return [(fx, -ht), (fx, ht), (zero, ht), (zero, -ht)]

    def _suspension_derivs(self, x, u):
        """Small-angle 4-wheel suspension (computeSimpleSuspensionStep).
        Returns (cgz_d, cgvz_d, rollrate_d, pitchrate_d, up_max, fwd_max,
        side_max)."""
        vel, yaw = x[0], x[1]
        pos_x, pos_y = x[2], x[3]
        steer = x[4]
        roll, pitch = x[7], x[8]
        cg_z, cg_vz = x[9], x[10]
        roll_rate, pitch_rate = x[11], x[12]

        cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
        cg_vz_d = jnp.zeros_like(vel)
        roll_rate_d = jnp.zeros_like(vel)
        pitch_rate_d = jnp.zeros_like(vel)
        up_max = jnp.full_like(vel, -jnp.inf)
        fwd_max = jnp.full_like(vel, -jnp.inf)
        side_max = jnp.full_like(vel, -jnp.inf)

        wheels = self._wheel_body_positions()
        if self.elevation_map is not None:
            # one batched 4-wheel lookup (leading wheel axis) — a single
            # (4K, W) one-hot matmul per step instead of four (K, W) ones
            pts = jnp.stack([
                jnp.stack([pos_x + bx * cos_y - by * sin_y,
                           pos_y + bx * sin_y + by * cos_y,
                           jnp.zeros_like(pos_x)], axis=-1)
                for bx, by in wheels
            ])
            hs = self.elevation_map.query_at_world_pose(pts)
            hs = jnp.where(jnp.isfinite(hs), hs,
                           cg_z - self.wheel_radius)
        else:
            hs = None

        for i, (bx, by) in enumerate(wheels):
            wx_cg = bx - self.cg_x
            wy_cg = by
            h = hs[i] if hs is not None else cg_z - self.wheel_radius

            wheel_z = cg_z + roll * wy_cg - pitch * wx_cg - self.wheel_radius
            wheel_vz = cg_vz + roll_rate * wy_cg - pitch_rate * wx_cg
            # flat terrain normal => h_dot = 0 (the reference's normal-map
            # texture; a flat (0,0,1) normal is its no-texture fallback)
            force = -self.spring_k * (wheel_z - h) - self.drag_c * wheel_vz
            up = force
            fwd = force * (-pitch)   # n=(0,0,1): f/nz*(0+0+nz*(-pitch))
            side = force * roll
            up_max = jnp.maximum(up_max, up)
            fwd_max = jnp.maximum(fwd_max, jnp.abs(fwd))
            side_max = jnp.maximum(side_max, jnp.abs(side))
            cg_vz_d = cg_vz_d + force / self.mass
            roll_rate_d = roll_rate_d + force * wy_cg / self.I_xx
            pitch_rate_d = pitch_rate_d - force * wx_cg / self.I_yy
        del steer
        return cg_vz, cg_vz_d, roll_rate_d, pitch_rate_d, up_max, fwd_max, side_max

    # --- uncertainty machinery ------------------------------------------------
    def _unc_jacobian(self, x, u):
        """A = df/dx + df/du K in (vx, yaw, px, py) order
        (computeUncertaintyJacobian, racer_dubins_elevation.cu:337-426)."""
        vel, yaw, steer, brake_raw = x[0], x[1], x[4], x[5]
        sin_y, cos_y = jnp.sin(yaw), jnp.cos(yaw)
        delta = steer / self.steer_angle_scale
        tan_d = jnp.tan(delta)
        cos2_d = jnp.cos(delta) ** 2
        brake_state = jnp.clip(brake_raw, 0.0, 0.25)
        L = self.wheel_base
        zero = jnp.zeros_like(vel)
        low_regime = jnp.abs(vel) <= 0.2

        a_vv = (-self._regime_select(vel, self.c_v3) - self.K_vel_x
                - jnp.where(low_regime, self.c_b3[0] * brake_state, 0.0))
        rows = [
            [a_vv, zero, -self.K_x * cos_y, -self.K_x * sin_y],
            [tan_d / L + zero,
             -jnp.abs(vel) * self.K_yaw / (L * cos2_d),
             vel * self.K_y * sin_y / (L * cos2_d),
             -vel * self.K_y * cos_y / (L * cos2_d)],
            [cos_y + zero, -sin_y * vel, zero, zero],
            [sin_y + zero, cos_y * vel, zero, zero],
        ]
        return jnp.stack([jnp.stack(r) for r in rows])

    def _q_matrix(self, x, u, vel_d, rec_extra=None):
        """Structured parametric Q (computeQ, racer_dubins_elevation.cu:
        428-516)."""
        vel, yaw, steer, roll = x[0], x[1], x[4], x[7]
        sin_y, cos_y = jnp.sin(yaw), jnp.cos(yaw)
        delta = steer / self.steer_angle_scale
        abs_v = jnp.abs(vel)
        side_force = (abs_v**2 * jnp.tan(delta) / self.wheel_base
                      + self.gravity * jnp.sin(roll))
        q11 = jnp.abs(self.Q_y_f * jnp.abs(side_force)
                      * jnp.maximum(abs_v - 2.0, 0.0))
        zero = jnp.zeros_like(vel)
        q_vv = (self.Q_x_acc * jnp.abs(vel_d)
                + self._regime_select(vel, self.Q_x_v) * abs_v)
        q_yy = abs_v * (self.Q_omega_steering * jnp.abs(delta) + self.Q_omega_v)
        rows = [
            [q_vv, zero, zero, zero],
            [zero, q_yy, zero, zero],
            [zero, zero, q11 * sin_y * sin_y, -q11 * sin_y * cos_y],
            [zero, zero, -q11 * sin_y * cos_y, q11 * cos_y * cos_y],
        ]
        return jnp.stack([jnp.stack(r) for r in rows])

    # ------------------------------------------------------------------
    def _core_step(self, x, rec, u, t, dt):
        """Shared integration path; returns everything the output needs."""
        h, c = rec[0], rec[1]
        # parametric + LSTM steering (parent machinery over x[:9])
        x9 = x[:9]
        xdot9 = RacerDubinsElevationDynamics.state_deriv(self, x9, u, t)
        steer_d_param = self._steer_deriv(x9, u)
        feats = jnp.stack([x[0], x[4], u[1], steer_d_param])
        delta_s, h, c = self.lstm.forward_axis0(h, c, feats)
        steer_d = steer_d_param + delta_s[0]

        (cgz_d, cgvz_d, rollrate_d, pitchrate_d,
         up_max, fwd_max, side_max) = self._suspension_derivs(x, u)
        return (xdot9, steer_d, h, c, cgz_d, cgvz_d, rollrate_d, pitchrate_d,
                up_max, fwd_max, side_max)

    def init_recurrent_state(self):
        return (self.warm_hidden, self.warm_cell)

    def step_recurrent(self, x, rec, u, t, dt):
        (xdot9, steer_d, h, c, cgz_d, cgvz_d, rollrate_d, pitchrate_d,
         up_max, fwd_max, side_max) = self._core_step(x, rec, u, t, dt)
        vel_d, yaw_d = xdot9[0], xdot9[1]

        A = self._unc_jacobian(x, u)
        Q = self._q_matrix(x, u, vel_d)
        unc_next = propagate_uncertainty(x[13:23], A, Q, dt)

        xdot = jnp.stack([
            vel_d, yaw_d, xdot9[2], xdot9[3], steer_d, xdot9[5],
            jnp.zeros_like(vel_d),          # steer_angle_rate holds steer_d
            x[11], x[12],                   # roll/pitch from rates
            cgz_d, cgvz_d, rollrate_d, pitchrate_d,
        ])
        core_next = x[:13] + xdot * dt
        yaw = math_utils.normalize_angle(core_next[1])
        steer = jnp.clip(core_next[4], -self.max_steer_angle, self.max_steer_angle)
        brake = jnp.clip(core_next[5], 0.0, -self.control_ranges[0, 0])
        core_next = jnp.concatenate([
            jnp.stack([core_next[0], yaw, core_next[2], core_next[3],
                       steer, brake, steer_d]),
            core_next[7:13],
        ])
        x_next = jnp.concatenate([core_next, unc_next], axis=0)
        y = self._assemble_output(x_next, xdot, up_max, fwd_max, side_max)
        return x_next, y, (h, c)

    def _assemble_output(self, x_next, xdot, up_max, fwd_max, side_max):
        """27-output layout (racer_dubins.cuh OutputIndex): [vel_b_x,
        vel_b_y, pos_x, pos_y, pos_z, yaw, roll, pitch, steer_angle,
        steer_rate, wheel_force up/fwd/side max, accel_x, accel_y, omega_z,
        |v|, uncertainty(10)]."""
        zero = jnp.zeros_like(x_next[0])
        return jnp.concatenate([
            jnp.stack([
                x_next[0], zero, x_next[2], x_next[3], x_next[9],
                x_next[1], x_next[7], x_next[8], x_next[4], x_next[6],
                up_max, fwd_max, side_max,
                xdot[0], zero, xdot[1], jnp.abs(x_next[0]),
            ]),
            x_next[13:23],
        ], axis=0)

    def state_from_map(self, mapping):
        keys = ["VEL_X", "YAW", "POS_X", "POS_Y", "STEER_ANGLE", "BRAKE_STATE",
                "STEER_ANGLE_RATE", "ROLL", "PITCH", "CG_POS_Z", "CG_VEL_I_Z",
                "ROLL_RATE", "PITCH_RATE"]
        core = [mapping.get(k, 0.0) for k in keys]
        return jnp.array(core + [0.0] * 10, jnp.float32)


class RacerDubinsElevationLSTMUncertainty(RacerDubinsElevationSuspension):
    """Suspension model + quadratic brake + mean LSTM + uncertainty LSTM
    (racer_dubins_elevation_lstm_unc.{cuh,cu})."""

    STATE_DIM: int = struct.field(pytree_node=False, default=26)

    # quadratic brake model (lstm_unc.cu:246-256)
    pos_quad_brake_c: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([10.0, 0.0], jnp.float32)
    )
    neg_quad_brake_c: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([10.0, 0.0], jnp.float32)
    )
    # sigmoid output scaling (params_p->unc_scale, lstm_unc.cu:403-406)
    unc_scale: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([1.0, 0.1, 1.0, 0.1, 1.0], jnp.float32)
    )
    mean_lstm: LSTM = None          # 11 -> 2 (d vel_d, d yaw_d)
    unc_lstm: LSTM = None           # 12 -> 5 sigmoid-scaled Q terms
    mean_lstm_lstm: Optional[LSTMLSTM] = None
    unc_lstm_lstm: Optional[LSTMLSTM] = None
    mean_warm_hidden: jnp.ndarray = None
    mean_warm_cell: jnp.ndarray = None
    unc_warm_hidden: jnp.ndarray = None
    unc_warm_cell: jnp.ndarray = None

    @classmethod
    def create(cls, lstm=None, mean_lstm=None, unc_lstm=None,
               elevation_map=None, control_ranges=None, key=None, **kw):
        key = key if key is not None else jax.random.PRNGKey(0)
        ks, km, ku = jax.random.split(key, 3)
        base = RacerDubinsElevationLSTMSteering.create(
            lstm=lstm, elevation_map=elevation_map,
            control_ranges=control_ranges, key=ks,
        )
        if mean_lstm is None:
            mean_lstm = LSTM.create(11, 16, output_layers=[27, 16, 2], key=km)
        if unc_lstm is None:
            unc_lstm = LSTM.create(12, 16, output_layers=[28, 16, 5], key=ku)
        fields = {f: getattr(base, f) for f in base.__dataclass_fields__
                  if f in cls.__dataclass_fields__
                  and f not in ("STATE_DIM", "OUTPUT_DIM",
                                "mean_lstm", "unc_lstm", "mean_lstm_lstm",
                                "unc_lstm_lstm", "mean_warm_hidden",
                                "mean_warm_cell", "unc_warm_hidden",
                                "unc_warm_cell")}
        params = {k: jnp.asarray(v, jnp.float32) for k, v in kw.items()}
        fields.update(params)
        return cls(
            mean_lstm=mean_lstm, unc_lstm=unc_lstm,
            mean_lstm_lstm=None, unc_lstm_lstm=None,
            mean_warm_hidden=jnp.zeros((mean_lstm.hidden_dim,)),
            mean_warm_cell=jnp.zeros((mean_lstm.hidden_dim,)),
            unc_warm_hidden=jnp.zeros((unc_lstm.hidden_dim,)),
            unc_warm_cell=jnp.zeros((unc_lstm.hidden_dim,)),
            **fields,
        )

    @property
    def requires_buffer(self) -> bool:
        return (self.lstm_lstm is not None or self.mean_lstm_lstm is not None
                or self.unc_lstm_lstm is not None)

    def update_from_buffer(self, buffer):
        new = self
        if self.lstm_lstm is not None:
            h0, c0 = self.lstm_lstm.initialize(buffer)
            new = new.replace(warm_hidden=h0, warm_cell=c0)
        if self.mean_lstm_lstm is not None:
            h0, c0 = self.mean_lstm_lstm.initialize(buffer)
            new = new.replace(mean_warm_hidden=h0, mean_warm_cell=c0)
        if self.unc_lstm_lstm is not None:
            h0, c0 = self.unc_lstm_lstm.initialize(buffer)
            new = new.replace(unc_warm_hidden=h0, unc_warm_cell=c0)
        return new

    def init_recurrent_state(self):
        return (
            self.warm_hidden, self.warm_cell,
            self.mean_warm_hidden, self.mean_warm_cell,
            self.unc_warm_hidden, self.unc_warm_cell,
        )

    def _nn_features(self, x, u, vel_d, yaw_d, with_roll):
        throttle = jnp.maximum(u[0], 0.0)
        brake_cmd = jnp.maximum(-u[0], 0.0)
        base = [x[0], x[23], x[5], x[4], x[6], throttle, brake_cmd, u[1]]
        if with_roll:
            base += [jnp.sin(x[24]), jnp.sin(x[25]), vel_d, yaw_d]
        else:
            base += [jnp.sin(x[25]), vel_d, yaw_d]
        return jnp.stack(base)

    def step_recurrent(self, x, rec, u, t, dt):
        h, c, mh, mc, uh, uc = rec
        (xdot9, steer_d, h, c, cgz_d, cgvz_d, rollrate_d, pitchrate_d,
         up_max, fwd_max, side_max) = self._core_step(x, (h, c), u, t, dt)
        vel_d, yaw_d = xdot9[0], xdot9[1]

        # quadratic brake model replaces the parent's brake derivative
        enable_brake = u[0] < 0
        err = jnp.where(enable_brake, -u[0], 0.0) - x[5]
        brake_d = jnp.clip(
            jnp.where(err > 0,
                      err * self.pos_quad_brake_c[0]
                      + err * jnp.abs(err) * self.pos_quad_brake_c[1],
                      err * self.neg_quad_brake_c[0]
                      + err * jnp.abs(err) * self.neg_quad_brake_c[1]),
            -self.max_brake_rate_neg, self.max_brake_rate_pos,
        )

        # mean LSTM correction (forward gear only, lstm_unc.cu:262-281)
        feats_m = self._nn_features(x, u, vel_d, yaw_d, with_roll=False)
        mean_out, mh, mc = self.mean_lstm.forward_axis0(mh, mc, feats_m)
        fwd_gear = self.gear_sign > 0
        vel_d = vel_d + jnp.where(fwd_gear, mean_out[0], 0.0)
        yaw_d = yaw_d + jnp.where(fwd_gear, mean_out[1], 0.0)

        # uncertainty LSTM -> Q (lstm_unc.cu:300-495)
        feats_u = self._nn_features(x, u, vel_d, yaw_d, with_roll=True)
        unc_out, uh, uc = self.unc_lstm.forward_axis0(uh, uc, feats_u)
        # per-component scalar scale (no rank-changing reshape — Mosaic
        # cannot shape-cast a (1, 5) leaf to (5, 1, 1) inside the kernel)
        sig = jax.nn.sigmoid(unc_out)
        unc_out = jnp.stack(
            [jnp.abs(sig[i] * self.unc_scale[i]) for i in range(5)]
        )
        c_b = self._regime_select(x[0], self.c_b3) * jnp.where(
            jnp.abs(x[0]) <= 0.2, x[0], 1.0)
        delta = x[4] / self.steer_angle_scale
        q_vv = unc_out[0] + (c_b**2) * unc_out[4]
        q_yy = unc_out[1] + (
            (x[0] / self.wheel_base)
            / (jnp.cos(delta) ** 2 * self.steer_angle_scale)
        ) ** 2 * unc_out[3]
        q11 = unc_out[2]
        sin_y, cos_y = jnp.sin(x[1]), jnp.cos(x[1])
        zero = jnp.zeros_like(q_vv)
        Q_lstm = jnp.stack([
            jnp.stack([q_vv, zero, zero, zero]),
            jnp.stack([zero, q_yy, zero, zero]),
            jnp.stack([zero, zero, q11 * sin_y**2, -q11 * sin_y * cos_y]),
            jnp.stack([zero, zero, -q11 * sin_y * cos_y, q11 * cos_y**2]),
        ])
        Q_param = self._q_matrix(x, u, vel_d)
        Q = jnp.where(fwd_gear, Q_lstm, Q_param)
        A = self._unc_jacobian(x, u)
        unc_next = propagate_uncertainty(x[13:23], A, Q, dt)

        xdot = jnp.stack([
            vel_d, yaw_d, xdot9[2], xdot9[3], steer_d, brake_d,
            jnp.zeros_like(vel_d),
            x[11], x[12],
            x[10], cgvz_d, rollrate_d, pitchrate_d,
        ])
        core_next = x[:13] + xdot * dt
        yaw = math_utils.normalize_angle(core_next[1])
        steer = jnp.clip(core_next[4], -self.max_steer_angle, self.max_steer_angle)
        brake = jnp.clip(core_next[5], 0.0, -self.control_ranges[0, 0])
        core_next = jnp.concatenate([
            jnp.stack([core_next[0], yaw, core_next[2], core_next[3],
                       steer, brake, steer_d]),
            core_next[7:13],
        ])
        # static settling from the map for the *static* roll/pitch states
        s_roll, s_pitch, _ = self._settle(core_next[2], core_next[3], yaw,
                                          x[24], x[25])
        tail = jnp.stack([yaw_d, s_roll, s_pitch])
        x_next = jnp.concatenate([core_next, unc_next, tail], axis=0)
        y = self._assemble_output_unc(x_next, vel_d, yaw_d, up_max, fwd_max,
                                      side_max)
        return x_next, y, (h, c, mh, mc, uh, uc)

    def _assemble_output_unc(self, x_next, vel_d, yaw_d, up_max, fwd_max,
                             side_max):
        zero = jnp.zeros_like(x_next[0])
        return jnp.concatenate([
            jnp.stack([
                x_next[0], zero, x_next[2], x_next[3], x_next[9],
                x_next[1], x_next[7], x_next[8], x_next[4], x_next[6],
                up_max, fwd_max, side_max,
                vel_d, zero, yaw_d, jnp.abs(x_next[0]),
            ]),
            x_next[13:23],
        ], axis=0)

    def state_from_map(self, mapping):
        base = super().state_from_map(mapping)
        tail = jnp.array([mapping.get("OMEGA_Z", 0.0),
                          mapping.get("STATIC_ROLL", 0.0),
                          mapping.get("STATIC_PITCH", 0.0)], jnp.float32)
        return jnp.concatenate([base, tail])
