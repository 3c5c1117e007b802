"""AutoRally costs (track-map costmap + speed/slip/crash terms).

Parity target: reference ``cost_functions/autorally/ar_standard_cost.{cuh,cu}``
(and the robust variant ``ar_robust_cost.*``). The CUDA float4 costmap
texture with a homogeneous coordinate transform becomes a ``MapTexture2D``
(channel 0 = track cost); term-for-term semantics
(ar_standard_cost.cu:282-413):

* track cost: mean |costmap| under the car's front (+0.5m) and back (-0.5m)
  points along the heading; zeroed inside ``track_slop``; crash when either
  point exceeds ``boundary_threshold``;
* speed cost: speed_coeff * (v_x - desired)^2 (or |.| in L1 mode);
* stabilizing cost: slip_coeff * slip^2 with slip = -atan(v_y/|v_x|), plus
  crash_coeff when |slip| > max_slip_ang; rollover (|roll| > pi/2) sets the
  crash flag;
* crash cost: discount^t * crash_coeff once crashed (sticky crash status);
* cost saturated at MAX_COST_VALUE (1e16) and NaN-guarded.

State layout is the AutoRally model's output: [x, y, yaw, roll, v_x, v_y,
yaw_rate].

The robust variant (ARRobustCost) shapes the costmap value into a smooth
barrier before applying the crash logic.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.costs.base import Cost
from mppi_generic_tpu.utils import math_utils
from mppi_generic_tpu.maps.texture import MapTexture2D

MAX_COST_VALUE = 1e16
FRONT_D = 0.5
BACK_D = -0.5


class ARStandardCost(Cost):
    CONTROL_DIM: int = struct.field(pytree_node=False, default=2)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=7)

    desired_speed: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(6.0))
    speed_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(4.25))
    track_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(200.0))
    max_slip_ang: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.25))
    slip_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(10.0))
    track_slop: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    crash_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(10000.0))
    boundary_threshold: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.65)
    )
    l1_speed_cost: bool = struct.field(pytree_node=False, default=False)
    # output-vector indices of (pos_x, pos_y, yaw, roll, vel_x, vel_y) — the
    # analog of the reference templating Cost on the paired dynamics'
    # OutputIndex enum (cost.cuh DYN_PARAMS_T); override to pair this cost
    # with dynamics whose output layout differs from AutoRally's
    output_indices: tuple = struct.field(
        pytree_node=False, default=(0, 1, 2, 3, 4, 5)
    )
    costmap: Optional[MapTexture2D] = None

    def _o(self, y, name):
        ix, iy, iyaw, iroll, ivx, ivy = self.output_indices
        return y[{"x": ix, "y": iy, "yaw": iyaw, "roll": iroll,
                  "vx": ivx, "vy": ivy}[name]]

    def _track_value(self, x, y):
        if self.costmap is None:
            # no costmap loaded: on-track everywhere (the reference requires
            # costmapToTexture before use; a zero map is the benign default)
            return jnp.zeros_like(x)
        # component-wise query (no trailing-axis stack) so the track cost
        # lowers in the fused Pallas kernels via the tent-mask bilinear.
        # Multichannel costmaps (the reference's float4 layout) read only
        # channel 0, exactly like ar_standard_cost.cu:356-360 reads .x —
        # the static-channel query lowers on every path incl. the
        # in-kernel windowed one.
        if self.costmap.channels:
            return self.costmap.query_world_components_channel(x, y, 0)
        return self.costmap.query_world_components(x, y)

    def _track_query(self, y, crash):
        """Front/back costmap samples + boundary crash flag — shared by the
        standard and robust track costs so the query geometry can't drift."""
        yaw = self._o(y, "yaw")
        px, py = self._o(y, "x"), self._o(y, "y")
        cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
        front = self._track_value(px + FRONT_D * cos_y, py + FRONT_D * sin_y)
        back = self._track_value(px + BACK_D * cos_y, py + BACK_D * sin_y)
        track = 0.5 * (jnp.abs(front) + jnp.abs(back))
        crash = jnp.where(
            (front >= self.boundary_threshold) | (back >= self.boundary_threshold),
            jnp.ones_like(crash),
            crash,
        )
        return track, crash

    def _track_cost(self, y, crash):
        track, crash = self._track_query(y, crash)
        track = jnp.where(
            jnp.abs(track) < self.track_slop, 0.0, self.track_coeff * track
        )
        return track, crash

    def _speed_cost(self, y):
        err = self._o(y, "vx") - self.desired_speed
        if self.l1_speed_cost:
            return self.speed_coeff * jnp.abs(err)
        return self.speed_coeff * err * err

    def _stabilizing_cost(self, y, crash):
        vx, vy = self._o(y, "vx"), self._o(y, "vy")
        # atan approximation (~1e-5 rad): exact atan has no Mosaic lowering
        slip = -math_utils.atan_full_approx(vy / jnp.maximum(jnp.abs(vx), 1e-3))
        moving = jnp.abs(vx) > 0.001
        cost = jnp.where(moving, self.slip_coeff * slip * slip, 0.0)
        cost = cost + jnp.where(
            moving & (jnp.abs(slip) > self.max_slip_ang), self.crash_coeff, 0.0
        )
        crash = jnp.where(jnp.abs(self._o(y, "roll")) > jnp.pi / 2,
                          jnp.ones_like(crash), crash)
        return cost, crash

    def time_parallel_crash(self) -> bool:
        # crash is sticky-prefix: the boundary/rollover triggers in
        # _track_query/_stabilizing_cost are pure functions of y, composed
        # with crash_in only through `where(cond, 1, crash)`, and the value
        # reads crash only through the current flag (the crash_cost term);
        # every term is elementwise in t (discount_pow) — so the split
        # kernels' dual-evaluation + prefix-OR pass is exact
        return True

    def state_cost(self, y, t, crash):
        track, crash = self._track_cost(y, crash)
        speed = self._speed_cost(y)
        stab, crash = self._stabilizing_cost(y, crash)
        t_f = jnp.asarray(t, jnp.float32)
        crash_cost = jnp.where(
            crash > 0, math_utils.discount_pow(self.discount, t_f) * self.crash_coeff, 0.0
        )
        cost = speed + crash_cost + track + stab
        cost = jnp.where(
            jnp.isnan(cost) | (cost > MAX_COST_VALUE), MAX_COST_VALUE, cost
        )
        return cost, crash

    def terminal_cost(self, y):
        return jnp.zeros_like(y[0])


class ARRobustCost(ARStandardCost):
    """Robust variant (ar_robust_cost.cu): the costmap value is shaped into
    a smooth quadratic barrier toward the boundary before crashing."""

    def _track_cost(self, y, crash):
        track, crash = self._track_query(y, crash)
        # quadratic barrier normalized by the boundary threshold
        d = track / jnp.maximum(self.boundary_threshold, 1e-6)
        return self.track_coeff * 0.5 * d * d, crash
