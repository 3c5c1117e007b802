"""RACER Dubins + elevation-map dynamics (terrain-aware).

Parity target: reference
``dynamics/racer_dubins/racer_dubins_elevation.{cuh,cu}`` and the LSTM
steering variant ``racer_dubins_elevation_lstm_steering.*``:

* 9-state extension of RacerDubins: [vel_x, yaw, pos_x, pos_y, steer_angle,
  brake_state, steer_angle_rate, roll, pitch];
* 3-regime velocity-indexed engine coefficients c_t/c_b/c_v (index by
  |v| <= 0.2 / <= 3 / > 3, racer_dubins_elevation.cu:37-54) with
  low-throttle deadband and linear brake slope near zero speed;
* longitudinal acceleration clamped to +-clamp_ax and gravity pitch term
  -g sin(pitch) (racer_dubins_elevation.cu:55-59);
* roll/pitch from *static settling* on the elevation map: query terrain
  height under the four wheel positions (body offsets rotated into the
  world), average the per-axle asin slopes (RACER::computeStaticSettling,
  racer_dubins.cu:359-430);
* output vector with body velocity / world pose / attitude / steering /
  accel entries (RacerDubinsParams::OutputIndex subset).

The uncertainty-propagation block (Sigma' = A Sigma A^T + Q in a shared-mem
SharedBlock) is tracked for a later round; crash/cost paths here consume the
deterministic outputs.

LSTM steering variant: the steering-column state derivative comes from a
prediction LSTM over [vel_x, steer_angle, steer_cmd, steer_angle_rate]
whose hidden state rides in the rollout scan carry and is warm-started by
an init LSTM over the sensor buffer (racer_dubins_elevation_lstm_steering.cuh:6-87).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.maps.texture import MapTexture2D
from mppi_generic_tpu.models.racer_dubins import RacerDubinsDynamics
from mppi_generic_tpu.nn.lstm import LSTM, LSTMLSTM
from mppi_generic_tpu.utils import math_utils

# wheel positions in the body frame (computeStaticSettling,
# racer_dubins.cu:364-368)
_FRONT_X = 2.981
_HALF_TRACK = 0.737


def static_settling(elevation_map, pos_x, pos_y, yaw, roll, pitch):
    """Terrain static settling (RACER::computeStaticSettling,
    racer_dubins.cu:359-430): query the elevation map under the four wheel
    positions (body offsets rotated by the current attitude), average the
    per-axle asin slopes into roll/pitch and the rear-axle heights into the
    body height. Shared by every elevation-coupled model (RacerDubins
    elevation family, BicycleSlipParametricElevation — the reference's
    BicycleSlipParametricImpl inherits it the same way,
    bicycle_slip_parametric.cu:192-196).

    Returns (roll, pitch, height); zeros when ``elevation_map`` is None."""
    if elevation_map is None:
        zero = jnp.zeros_like(yaw)
        return zero, zero, zero

    # Component-wise corner positions (no trailing-axis stacks — the
    # component axis must LEAD for the fused Pallas kernels, whose map
    # lookups ride the in-kernel tent-mask bilinear): the Z-Y-X rotation of
    # a body offset (bx, by, 0) needs only the first two rotation-matrix
    # columns, R = Rz(yaw) Ry(pitch) Rx(roll) — identical values to the
    # quat_rotate(euler_to_quat(...)) formulation (tested). All four wheel
    # queries batch on a leading corner axis into ONE lookup.
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    axx = cy * cp
    axy = cy * sp * sr - sy * cr
    ayx = sy * cp
    ayy = sy * sp * sr + cy * cr
    corners = [(_FRONT_X, _HALF_TRACK), (_FRONT_X, -_HALF_TRACK),
               (0.0, _HALF_TRACK), (0.0, -_HALF_TRACK)]
    px = jnp.stack([pos_x + bx * axx + by * axy for bx, by in corners])
    py = jnp.stack([pos_y + bx * ayx + by * ayy for bx, by in corners])
    vals = elevation_map.query_world_components(px, py)
    fl, fr, rl, rr = vals[0], vals[1], vals[2], vals[3]

    # asin via the atan2 polynomial (~1e-5 rad) — jnp.arcsin has no Mosaic
    # lowering, and this keeps the settling path inside the fused kernels
    asin = math_utils.asin_approx
    front_roll = asin(jnp.clip(fl - fr, -2 * 0.736, 2 * 0.736) / (2 * 0.737))
    rear_roll = asin(jnp.clip(rl - rr, -2 * 0.736, 2 * 0.736) / (2 * 0.737))
    new_roll = 0.5 * (front_roll + rear_roll)

    left_pitch = asin(jnp.clip(rl - fl, -2.98, 2.98) / 2.981)
    right_pitch = asin(jnp.clip(rr - fr, -2.98, 2.98) / 2.981)
    new_pitch = 0.5 * (left_pitch + right_pitch)
    height = 0.5 * (rl + rr)

    new_roll = jnp.where(
        jnp.isfinite(new_roll) & (jnp.abs(new_roll) <= jnp.pi),
        new_roll,
        2 * jnp.pi,
    )
    new_pitch = jnp.where(
        jnp.isfinite(new_pitch) & (jnp.abs(new_pitch) <= jnp.pi),
        new_pitch,
        2 * jnp.pi,
    )
    height = jnp.where(jnp.isfinite(height), height, 0.0)
    return new_roll, new_pitch, height


def body_frame_normals(normals_map, pos_x, pos_y, yaw, roll, pitch):
    """Mean terrain surface normal under the four wheels, rotated into the
    yaw frame (RACER::computeBodyFrameNormals,
    bicycle_slip_parametric.cu:391-466). ``normals_map`` is a 3-channel
    ``MapTexture2D`` of unit surface normals. Returns (nx, ny, nz) —
    (0, 0, 1) when the map is absent or a query is non-finite."""
    if normals_map is None:
        zero = jnp.zeros_like(yaw)
        return zero, zero, jnp.ones_like(yaw)

    def corner(bx, by):
        off = jnp.stack(
            [jnp.full_like(yaw, bx), jnp.full_like(yaw, by),
             jnp.zeros_like(yaw)],
            axis=-1,
        )
        world = jnp.stack([pos_x, pos_y, jnp.zeros_like(yaw)], axis=-1)
        rpy = jnp.stack([roll, pitch, yaw], axis=-1)
        return normals_map.query_at_world_offset_pose(world, off, rpy)

    n = (corner(_FRONT_X, _HALF_TRACK) + corner(_FRONT_X, -_HALF_TRACK)
         + corner(0.0, _HALF_TRACK) + corner(0.0, -_HALF_TRACK)) / 4.0
    cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
    nx = cos_y * n[..., 0] - sin_y * n[..., 1]
    ny = sin_y * n[..., 0] + cos_y * n[..., 1]
    nz = n[..., 2]
    bad = ~(jnp.isfinite(nx) & jnp.isfinite(ny) & jnp.isfinite(nz))
    return (jnp.where(bad, 0.0, nx), jnp.where(bad, 0.0, ny),
            jnp.where(bad, 1.0, nz))


class RacerDubinsElevationDynamics(RacerDubinsDynamics):
    STATE_DIM: int = struct.field(pytree_node=False, default=9)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=13)

    # velocity-regime coefficient triples (racer_dubins.cuh:81-83)
    c_t3: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([1.3, 2.6, 3.9])
    )
    c_b3: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([2.5, 3.5, 4.5])
    )
    c_v3: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([3.7, 4.7, 5.7])
    )
    low_min_throttle: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.13)
    )
    clamp_ax: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(10.0))
    gravity: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(9.81))
    elevation_map: Optional[MapTexture2D] = None

    @classmethod
    def create(cls, elevation_map=None, control_ranges=None, **kw):
        if control_ranges is None:
            control_ranges = [[-1.0, 1.0], [-1.0, 1.0]]
        base = cls._default_constraints(control_ranges=control_ranges)
        params = {k: jnp.asarray(v, jnp.float32) for k, v in kw.items()}
        return cls(elevation_map=elevation_map, **base, **params)

    # --- parametric acceleration (racer_dubins_elevation.cu:33-67) ----------
    @staticmethod
    def _regime_select(vel, table):
        """table[regime(vel)] as a where-chain of scalar extracts — a batched
        gather from a (3,) vector is not Pallas-lowerable, a select chain is
        (and is also what the CUDA branches compile to)."""
        av = jnp.abs(vel)
        return jnp.where(
            av <= 0.2, table[0], jnp.where(av <= 3.0, table[1], table[2])
        )

    def state_deriv(self, x, u, t=0.0):
        vel, yaw, steer, brake_raw = x[0], x[1], x[4], x[5]
        pitch = x[8]
        throttle_brake, steer_cmd = u[0], u[1]
        enable_brake = throttle_brake < 0
        linear_brake_slope = 0.2

        c_t = self._regime_select(vel, self.c_t3)
        c_b = self._regime_select(vel, self.c_b3)
        c_v = self._regime_select(vel, self.c_v3)
        brake_state = jnp.clip(brake_raw, 0.0, 0.25)

        throttle_hi = c_t * throttle_brake
        brake_hi = c_b * brake_state * jnp.where(vel >= 0, -1.0, 1.0)
        throttle_lo = c_t * jnp.maximum(throttle_brake - self.low_min_throttle, 0.0)
        brake_lo = c_b * brake_state * -vel
        low_speed = jnp.abs(vel) <= linear_brake_slope
        throttle = jnp.where(low_speed, throttle_lo, throttle_hi)
        brake_f = jnp.where(low_speed, brake_lo, brake_hi)

        vel_d = (
            jnp.where(enable_brake, 0.0, 1.0) * throttle * self.gear_sign
            + brake_f
            - c_v * vel
            + self.c_0
        )
        vel_d = jnp.clip(vel_d, -self.clamp_ax, self.clamp_ax)
        vel_d = vel_d - jnp.where(
            jnp.abs(pitch) < jnp.pi / 2, self.gravity * jnp.sin(pitch), 0.0
        )

        yaw_d = (vel / self.wheel_base) * jnp.tan(steer / self.steer_angle_scale)
        x_d = vel * jnp.cos(yaw)
        y_d = vel * jnp.sin(yaw)
        brake_d = jnp.clip(
            (jnp.where(enable_brake, -throttle_brake, 0.0) - brake_raw)
            * self.brake_delay_constant,
            -self.max_brake_rate_neg,
            self.max_brake_rate_pos,
        )
        steer_d = self._steer_deriv(x, u)
        zero = jnp.zeros_like(vel_d)
        return jnp.stack(
            [vel_d, yaw_d, x_d, y_d, steer_d, brake_d, zero, zero, zero]
        )

    def _steer_deriv(self, x, u):
        return jnp.clip(
            (u[1] * self.steer_command_angle_scale - x[4]) * self.steering_constant,
            -self.max_steer_rate,
            self.max_steer_rate,
        )

    # --- settling (RACER::computeStaticSettling, racer_dubins.cu:359-430) ---
    def _settle(self, pos_x, pos_y, yaw, roll, pitch):
        return static_settling(
            self.elevation_map, pos_x, pos_y, yaw, roll, pitch
        )

    def step(self, x, u, t, dt):
        xdot = self.state_deriv(x, u, t)
        x_next = x + xdot * dt
        yaw = math_utils.normalize_angle(x_next[1])
        steer = jnp.clip(x_next[4], -self.max_steer_angle, self.max_steer_angle)
        brake_max = -self.control_ranges[0, 0]
        brake = jnp.clip(x_next[5], 0.0, brake_max)
        roll, pitch, height = self._settle(x_next[2], x_next[3], yaw, x[7], x[8])
        x_next = jnp.stack(
            [x_next[0], yaw, x_next[2], x_next[3], steer, brake, xdot[4],
             roll, pitch]
        )
        # output: [vel_b_x, vel_b_y, pos_x, pos_y, pos_z(height), yaw, roll,
        # pitch, steer_angle, steer_angle_rate, accel_x, omega_z, |v|]
        y = jnp.stack(
            [
                x_next[0],
                jnp.zeros_like(x_next[0]),
                x_next[2],
                x_next[3],
                height,
                yaw,
                roll,
                pitch,
                steer,
                xdot[4],
                xdot[0],
                xdot[1],
                jnp.abs(x_next[0]),
            ]
        )
        return x_next, y

    def state_from_map(self, mapping):
        keys = ["VEL_X", "YAW", "POS_X", "POS_Y", "STEER_ANGLE", "BRAKE_STATE",
                "STEER_ANGLE_RATE", "ROLL", "PITCH"]
        return jnp.array([mapping.get(k, 0.0) for k in keys], jnp.float32)


class RacerDubinsElevationLSTMSteering(RacerDubinsElevationDynamics):
    """LSTM steering-column variant
    (racer_dubins_elevation_lstm_steering.{cuh,cu}): the steering state
    derivative is the parametric estimate *corrected by* a prediction LSTM
    over [vel_x, steer_angle, steer_cmd, parametric steer_d]; the LSTM's
    initial hidden/cell come from the init network over the sensor buffer
    (update_from_buffer)."""

    lstm: LSTM = None
    lstm_lstm: Optional[LSTMLSTM] = None
    warm_hidden: jnp.ndarray = None  # (H,) warm-started h0
    warm_cell: jnp.ndarray = None

    @classmethod
    def create(cls, lstm=None, elevation_map=None, control_ranges=None, key=None, **kw):
        if lstm is None:
            import jax

            lstm = LSTM.create(
                4, 16, output_layers=[20, 16, 1],
                key=key if key is not None else jax.random.PRNGKey(0),
            )
        base = RacerDubinsElevationDynamics.create(
            elevation_map=elevation_map, control_ranges=control_ranges, **kw
        )
        fields = {f: getattr(base, f) for f in base.__dataclass_fields__
                  if f not in ("lstm", "lstm_lstm", "warm_hidden", "warm_cell")}
        H = lstm.hidden_dim
        return cls(
            lstm=lstm,
            lstm_lstm=None,
            warm_hidden=jnp.zeros((H,)),
            warm_cell=jnp.zeros((H,)),
            **fields,
        )

    @property
    def requires_buffer(self) -> bool:
        return self.lstm_lstm is not None

    def update_from_buffer(self, buffer):
        """Warm-start the rollout LSTM from the time-synchronized sensor
        buffer (dynamics.cuh:468-476 hook; LSTMLSTMHelper::initializeLSTM)."""
        if self.lstm_lstm is None:
            return self
        h0, c0 = self.lstm_lstm.initialize(buffer)
        return self.replace(warm_hidden=h0, warm_cell=c0)

    def init_recurrent_state(self):
        return (self.warm_hidden, self.warm_cell)

    def step_recurrent(self, x, rec, u, t, dt):
        h, c = rec
        steer_d_param = self._steer_deriv(x, u)
        feats = jnp.stack([x[0], x[4], u[1], steer_d_param])  # (4, ...)
        delta, h, c = self.lstm.forward_axis0(h, c, feats)
        steer_d = steer_d_param + delta[0]

        xdot = self.state_deriv(x, u, t)
        xdot = jnp.concatenate(
            [xdot[:4], jnp.stack([steer_d]), xdot[5:]], axis=0
        )
        x_next = x + xdot * dt
        yaw = math_utils.normalize_angle(x_next[1])
        steer = jnp.clip(x_next[4], -self.max_steer_angle, self.max_steer_angle)
        brake_max = -self.control_ranges[0, 0]
        brake = jnp.clip(x_next[5], 0.0, brake_max)
        roll, pitch, height = self._settle(x_next[2], x_next[3], yaw, x[7], x[8])
        x_next = jnp.stack(
            [x_next[0], yaw, x_next[2], x_next[3], steer, brake, steer_d,
             roll, pitch]
        )
        y = jnp.stack(
            [x_next[0], jnp.zeros_like(x_next[0]), x_next[2], x_next[3],
             height, yaw, roll, pitch, steer, steer_d, xdot[0], xdot[1],
             jnp.abs(x_next[0])]
        )
        return x_next, y, (h, c)

    def step(self, x, u, t, dt):
        x_next, y, _ = self.step_recurrent(
            x, self.init_recurrent_state(), u, t, dt
        )
        return x_next, y
