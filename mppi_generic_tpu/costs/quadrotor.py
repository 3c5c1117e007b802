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


class QuadrotorMapCost(QuadrotorQuadraticCost):
    """Map variant: adds a costmap penalty at (x, y) with crash above a
    threshold (quadrotor_map_cost.*)."""

    costmap: Optional[MapTexture2D] = None
    map_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(100.0))
    crash_threshold: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.9))
    crash_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(10000.0))

    def state_cost(self, y, t, crash):
        base, crash = super().state_cost(y, t, crash)
        if self.costmap is None:
            # no costmap loaded: the quadratic terms only (benign default)
            return base, crash
        pt = jnp.stack([y[0], y[1], jnp.zeros_like(y[0])], axis=-1)
        map_val = self.costmap.query_at_world_pose(pt)
        if map_val.ndim > jnp.ndim(y[0]):
            map_val = map_val[..., 0]
        crash = jnp.where(map_val > self.crash_threshold, jnp.ones_like(crash), crash)
        t_f = jnp.asarray(t, jnp.float32)
        cost = base + self.map_coeff * map_val
        cost = cost + jnp.where(
            crash > 0, mu.discount_pow(self.discount, t_f) * self.crash_coeff, 0.0
        )
        cost = jnp.where(jnp.isnan(cost) | (cost > MAX_COST_VALUE), MAX_COST_VALUE, cost)
        return cost, crash
