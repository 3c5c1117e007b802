"""Quadrotor costs.

Parity targets:
* ``cost_functions/quadrotor/quadrotor_quadratic_cost.{cuh,cu}``: quadratic
  tracking of a 13-dim goal state with per-block coefficients (position,
  velocity, attitude via quaternion-difference Euler angles, angular rate);
  terminal cost = terminal_cost_coeff * state cost.
* ``quadrotor_map_cost.*``: adds a 2D costmap query at the vehicle's (x, y)
  with crash above a threshold, plus waypoint tracking; rebuilt here on
  ``MapTexture2D``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.costs.base import Cost
from mppi_generic_tpu.maps.texture import MapTexture2D
from mppi_generic_tpu.utils import math_utils as mu

MAX_COST_VALUE = 1e16


class QuadrotorQuadraticCost(Cost):
    CONTROL_DIM: int = struct.field(pytree_node=False, default=4)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=13)

    # goal: [x(3), v(3), q(4), w(3)]
    s_goal: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(13).at[6].set(1.0)
    )
    x_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    v_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    roll_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    pitch_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    yaw_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    w_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    terminal_cost_coeff: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )

    def _attitude_cost(self, y):
        """Euler-angle cost of the quaternion difference q (-) q_goal
        (QuatSubtract + Quat2EulerNWU, quadrotor_quadratic_cost.cu:24-45).
        Component-wise (axis-0 convention) so it traces in Pallas kernels:
        no trailing-axis stacking, no literal constant arrays."""
        qw, qx, qy, qz = y[6], y[7], y[8], y[9]
        g = self.s_goal
        # conj(q_goal) components (unit goal)
        aw, ax, ay, az = g[6], -g[7], -g[8], -g[9]
        # q_diff = conj(q_goal) (x) q
        dw = aw * qw - ax * qx - ay * qy - az * qz
        dx = aw * qx + ax * qw + ay * qz - az * qy
        dy = aw * qy - ax * qz + ay * qw + az * qx
        dz = aw * qz + ax * qy - ay * qx + az * qw
        # quat -> euler; atan2/asin approximations (~1e-5 rad) because the
        # exact primitives have no Mosaic lowering
        r = mu.atan2_approx(2 * (dw * dx + dy * dz),
                            1 - 2 * (dx * dx + dy * dy))
        p = mu.asin_approx(2 * (dw * dy - dz * dx))
        yw = mu.atan2_approx(2 * (dw * dz + dx * dy),
                             1 - 2 * (dy * dy + dz * dz))
        return (
            self.roll_coeff * r**2
            + self.pitch_coeff * p**2
            + self.yaw_coeff * yw**2
        )

    def time_parallel_cost(self) -> bool:
        # crash is never read or written; t is unused; every term is
        # elementwise over component blocks y[i]
        return True

    def state_cost(self, y, t, crash):
        g = self.s_goal
        pos = sum((y[i] - g[i]) ** 2 for i in range(0, 3))
        vel = sum((y[i] - g[i]) ** 2 for i in range(3, 6))
        ang = sum((y[i] - g[i + 0]) ** 2 for i in range(10, 13))
        cost = (
            self.x_coeff * pos
            + self.v_coeff * vel
            + self._attitude_cost(y)
            + self.w_coeff * ang
        )
        cost = jnp.where(jnp.isnan(cost) | (cost > MAX_COST_VALUE), MAX_COST_VALUE, cost)
        return cost, crash

    def terminal_cost(self, y):
        c, _ = self.state_cost(y, 0, jnp.int32(0))
        return self.terminal_cost_coeff * c


class QuadrotorMapCost(Cost):
    """Quadrotor map cost with the reference's full waypoint machinery.

    Parity target: ``quadrotor_map_cost.cuh:14-92`` (params: curr/prev/end
    waypoints, gate boundaries, coefficient set) + the device
    ``computeStateCost`` decomposition in ``quadrotor_map_cost.cu``:

    * costmap query with off-map / track-boundary crash penalties
      (computeCostmapCost, quadrotor_map_cost.cu:361-396);
    * gate side-post collision band (computeGateSideCost, :276-323);
    * height interpolated between prev and curr waypoints
      (computeHeightCost, :326-358);
    * heading-to-waypoint alignment outside the gate margin
      (computeHeadingCost, :212-241);
    * speed tracking of ``desired_speed`` (computeSpeedCost, :243-256);
    * attitude level-ness (computeStabilizingCost, :199-210);
    * dist-to-waypoint attraction (computeWaypointCost, :258-265 — the
      reference's host path adds it; its device path computes-and-drops it,
      with the default coeff of 0 making both identical);
    * gate-pass reward inside ``gate_margin`` (:138-144) and
      ``crash * crash_coeff`` accumulation (:146).

    Waypoints are ordinary pytree leaves, so ``update_waypoint`` /
    ``update_gate_boundaries`` (the analogs of
    QuadrotorMapCostParams::updateWaypoint/updateGateBoundaries,
    quadrotor_map_cost.cuh:62-92) return an updated cost object — the
    plant's param hot-swap carries it to the next solve; no
    ``paramsToDevice`` needed.
    """

    CONTROL_DIM: int = struct.field(pytree_node=False, default=4)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=13)

    costmap: Optional[MapTexture2D] = None

    # (x, y, z, heading) waypoints — end_waypoint defaults to NaN-unset
    # like the reference (quadrotor_map_cost.cuh:60)
    curr_waypoint: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(4, jnp.float32)
    )
    prev_waypoint: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(4, jnp.float32)
    )
    end_waypoint: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.full(4, jnp.nan, jnp.float32)
    )
    curr_gate_left: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(3, jnp.float32)
    )
    curr_gate_right: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(3, jnp.float32)
    )
    prev_gate_left: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(3, jnp.float32)
    )
    prev_gate_right: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(3, jnp.float32)
    )

    # coefficients (defaults = QuadrotorMapCostParams, cuh:22-44)
    attitude_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(10.0))
    crash_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1000.0))
    dist_to_waypoint_coeff: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    heading_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(5.0))
    heading_power: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    height_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(5.0))
    track_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(10.0))
    speed_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(5.0))
    track_slop: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    gate_pass_cost: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(-150.0)
    )
    desired_speed: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(5.0))
    gate_margin: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.5))
    min_dist_to_gate_side: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.5)
    )
    track_boundary_cost: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(2.5)
    )
    gate_width: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.15))

    # --- waypoint update machinery (host-side, functional) --------------
    def update_waypoint(self, x, y, z, heading=0.0):
        """New cost object with ``curr_waypoint`` advanced to (x, y, z,
        heading) — the previous current waypoint becomes ``prev_waypoint``
        and the gate posts move to ``±gate_width`` along the heading
        (QuadrotorMapCostParams::updateWaypoint, quadrotor_map_cost.cuh:62-76).
        No-op (returns an identical object) when the waypoint is unchanged."""
        new = jnp.stack([
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(z, jnp.float32), jnp.asarray(heading, jnp.float32),
        ])
        changed = jnp.any(new != self.curr_waypoint)
        left = jnp.stack([
            new[0] + jnp.cos(new[3]) * self.gate_width,
            new[1] + jnp.sin(new[3]) * self.gate_width,
            new[2],
        ])
        right = jnp.stack([
            new[0] - jnp.cos(new[3]) * self.gate_width,
            new[1] - jnp.sin(new[3]) * self.gate_width,
            new[2],
        ])
        moved = self.replace(
            curr_waypoint=new, prev_waypoint=self.curr_waypoint
        ).update_gate_boundaries(left, right)
        # when unchanged, neither the waypoint nor the gate shift fires;
        # select only over the seven waypoint/gate fields (never the
        # costmap texture or coefficient leaves — they are untouched)
        fields = ("curr_waypoint", "prev_waypoint", "curr_gate_left",
                  "curr_gate_right", "prev_gate_left", "prev_gate_right")
        return self.replace(**{
            f: jnp.where(changed, getattr(moved, f), getattr(self, f))
            for f in fields
        })

    def update_gate_boundaries(self, left, right):
        """Advance the gate posts; the old current posts become the
        previous ones iff anything moved (updateGateBoundaries,
        quadrotor_map_cost.cuh:78-92)."""
        left = jnp.asarray(left, jnp.float32)
        right = jnp.asarray(right, jnp.float32)
        changed = jnp.any(
            (left != self.curr_gate_left) | (right != self.curr_gate_right)
        )
        return self.replace(
            curr_gate_left=jnp.where(changed, left, self.curr_gate_left),
            curr_gate_right=jnp.where(changed, right, self.curr_gate_right),
            prev_gate_left=jnp.where(
                changed, self.curr_gate_left, self.prev_gate_left
            ),
            prev_gate_right=jnp.where(
                changed, self.curr_gate_right, self.prev_gate_right
            ),
        )

    # --- cost terms (component-wise, axis-0 indexing) -------------------
    def dist_to_waypoint(self, y, wp):
        """3D distance to a (4,) waypoint (distToWaypoint,
        quadrotor_map_cost.cu:151-158)."""
        return jnp.sqrt(
            (y[0] - wp[0]) ** 2 + (y[1] - wp[1]) ** 2 + (y[2] - wp[2]) ** 2
        )

    def _stabilizing_cost(self, y):
        """attitude_coeff * (roll^2 + pitch^2) from Quat2EulerNWU
        (computeStabilizingCost, quadrotor_map_cost.cu:199-210)."""
        qw, qx, qy, qz = y[6], y[7], y[8], y[9]
        roll = mu.atan2_approx(2 * (qw * qx + qy * qz),
                               1 - 2 * (qx * qx + qy * qy))
        pitch = mu.asin_approx(2 * (qw * qy - qz * qx))
        return self.attitude_coeff * (roll * roll + pitch * pitch)

    def _heading_cost(self, y, dist_to_gate):
        """Point the velocity vector at the waypoint while outside the gate
        margin (computeHeadingCost, quadrotor_map_cost.cu:212-241; the
        reference rotates the velocity components by the attitude DCM
        before taking the heading — reproduced as-is)."""
        qw, qx, qy, qz = y[6], y[7], y[8], y[9]
        vx, vy, vz = y[3], y[4], y[5]
        wvx = ((1 - 2 * (qy * qy + qz * qz)) * vx
               + 2 * (qx * qy - qw * qz) * vy
               + 2 * (qx * qz + qw * qy) * vz)
        wvy = (2 * (qx * qy + qw * qz) * vx
               + (1 - 2 * (qx * qx + qz * qz)) * vy
               + 2 * (qy * qz - qw * qx) * vz)
        yaw = mu.atan2_approx(wvy, wvx)
        w_heading = mu.atan2_approx(
            self.curr_waypoint[1] - y[1], self.curr_waypoint[0] - y[0]
        )
        ang = jnp.abs(mu.angle_diff(yaw, w_heading))
        c = self.heading_coeff * jnp.power(ang, self.heading_power)
        return jnp.where(dist_to_gate > self.gate_margin, c, 0.0)

    def _speed_cost(self, y):
        """speed_coeff * (|v_xy| - desired)^2 (computeSpeedCost,
        quadrotor_map_cost.cu:243-256)."""
        speed = jnp.sqrt(y[3] * y[3] + y[4] * y[4])
        return self.speed_coeff * (speed - self.desired_speed) ** 2

    def _waypoint_cost(self, y, dist_to_gate):
        """dist_to_waypoint_coeff * dist^2 (computeWaypointCost,
        quadrotor_map_cost.cu:258-265)."""
        return self.dist_to_waypoint_coeff * dist_to_gate * dist_to_gate

    def _gate_side_cost(self, y):
        """Collision band around the gate side posts: within
        ``min_dist_to_gate_side`` of the gate line AND in the
        half-gate-width band just outside either post → crash_coeff scaled
        by the along-gate coordinate (computeGateSideCost,
        quadrotor_map_cost.cu:276-323)."""
        gvx = self.curr_gate_left[0] - self.curr_gate_right[0]
        gvy = self.curr_gate_left[1] - self.curr_gate_right[1]
        svx = y[0] - self.curr_gate_right[0]
        svy = y[1] - self.curr_gate_right[1]
        perp = svx * gvy - svy * gvx  # cross(state_vec_right, gate_vec)
        denom = gvx * gvx + gvy * gvy + 1e-12
        comp = (svx * gvx + svy * gvy) / denom
        threshold = 0.5
        hit = (jnp.abs(perp) < self.min_dist_to_gate_side) & (
            ((comp < 0.0) & (comp >= -threshold))
            | ((comp > 1.0) & (comp <= 1.0 + threshold))
        )
        return jnp.where(hit, self.crash_coeff * jnp.abs(comp), 0.0)

    def _height_cost(self, y):
        """Track a height interpolated between the prev and curr waypoints
        by inverse xy-distance weights; +400 beyond gate_width of error
        (computeHeightCost, quadrotor_map_cost.cu:326-358)."""
        d1 = jnp.sqrt((y[0] - self.prev_waypoint[0]) ** 2
                      + (y[1] - self.prev_waypoint[1]) ** 2)
        d2 = jnp.sqrt((y[0] - self.curr_waypoint[0]) ** 2
                      + (y[1] - self.curr_waypoint[1]) ** 2)
        w1 = d1 / (d1 + d2 + 0.001)
        w2 = d2 / (d1 + d2 + 0.001)
        interp = (1.0 - w1) * self.prev_waypoint[2] + (
            1.0 - w2
        ) * self.curr_waypoint[2]
        hd = (y[2] - interp) ** 2
        return self.height_coeff * hd + jnp.where(
            hd > self.gate_width, 400.0, 0.0
        )

    def _costmap_cost(self, y):
        """Track-map penalty: off-map → crash_coeff; cost above track_slop
        scaled by track_coeff; above track_boundary_cost → crash_coeff
        (computeCostmapCost, quadrotor_map_cost.cu:361-396)."""
        if self.costmap is None:
            return jnp.zeros_like(y[0])
        pt = jnp.stack([y[0], y[1], y[2]], axis=-1)
        u, v = self.costmap.world_to_tex(pt)
        off_map = (u < 0.0) | (u > 1.0) | (v < 0.0) | (v > 1.0)
        track = self.costmap.query_tex(u, v)
        if track.ndim > jnp.ndim(y[0]):
            track = track[..., 0]
        cost = jnp.where(off_map, self.crash_coeff, 0.0)
        cost = cost + jnp.where(
            track > self.track_slop, self.track_coeff * track, 0.0
        )
        return cost + jnp.where(
            track > self.track_boundary_cost, self.crash_coeff, 0.0
        )

    def state_cost(self, y, t, crash):
        """Device computeStateCost sum (quadrotor_map_cost.cu:95-149): the
        six map/geometry terms, the gate-pass reward inside gate_margin,
        crash from gate contact, crash * crash_coeff."""
        dist = self.dist_to_waypoint(y, self.curr_waypoint)
        gate_cost = self._gate_side_cost(y)
        cost = (
            self._costmap_cost(y)
            + gate_cost
            + self._height_cost(y)
            + self._heading_cost(y, dist)
            + self._speed_cost(y)
            + self._stabilizing_cost(y)
            + self._waypoint_cost(y, dist)
        )
        cost = cost + jnp.where(dist < self.gate_margin, self.gate_pass_cost, 0.0)
        crash = jnp.where(gate_cost != 0.0, jnp.ones_like(crash), crash)
        cost = cost + crash.astype(jnp.float32) * self.crash_coeff
        cost = jnp.where(
            jnp.isnan(cost) | (cost > MAX_COST_VALUE), MAX_COST_VALUE, cost
        )
        return cost, crash

    def terminal_cost(self, y):
        """terminalCost == 0 (quadrotor_map_cost.cu:398-408)."""
        return jnp.zeros_like(y[0])
