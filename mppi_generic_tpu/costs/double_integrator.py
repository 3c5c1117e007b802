"""Double-integrator annulus-tracking costs.

Parity targets:
* ``cost_functions/double_integrator/double_integrator_circle_cost.{cuh,cu}``:
  crash penalty (discount^t * crash_cost) outside the [inner, outer] radius
  annulus, |speed - v_des| and |angular momentum - L_des| tracking terms,
  zero terminal cost; defaults velocity_cost=1, crash_cost=1000, v_des=2,
  radii 1.875/2.125, L_des = 2*v_des.
* ``double_integrator_robust_cost.{cuh,cu}``: smooth barrier variant used by
  the CoRL2020 robust experiments.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.costs.base import Cost
from mppi_generic_tpu.utils import math_utils


class DoubleIntegratorCircleCost(Cost):
    CONTROL_DIM: int = struct.field(pytree_node=False, default=2)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=4)

    velocity_cost: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    crash_cost: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1000.0))
    velocity_desired: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.0))
    inner_path_radius2: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1.875**2)
    )
    outer_path_radius2: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(2.125**2)
    )
    angular_momentum_desired: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(4.0)
    )

    def time_parallel_cost(self) -> bool:
        # crash is never read or written; t enters only through the
        # elementwise discount factor
        return True

    def state_cost(self, y, t, crash):
        radial2 = y[0] * y[0] + y[1] * y[1]
        speed = jnp.sqrt(y[2] * y[2] + y[3] * y[3])
        ang_mom = y[0] * y[3] - y[1] * y[2]
        out_of_track = (radial2 < self.inner_path_radius2) | (
            radial2 > self.outer_path_radius2
        )
        t_f = jnp.asarray(t, jnp.float32)
        cost = jnp.where(
            out_of_track, math_utils.discount_pow(self.discount, t_f) * self.crash_cost, 0.0
        )
        cost = cost + self.velocity_cost * jnp.abs(speed - self.velocity_desired)
        cost = cost + self.velocity_cost * jnp.abs(
            ang_mom - self.angular_momentum_desired
        )
        return cost, crash

    def terminal_cost(self, y):
        return jnp.zeros_like(y[0])


class DoubleIntegratorRobustCost(DoubleIntegratorCircleCost):
    """Smooth-barrier robust variant (double_integrator_robust_cost.cu):
    same fields and velocity/momentum terms as the circle cost, with the
    hard annulus crash replaced by a quadratic barrier on the normalized
    distance from the track-center radius."""

    def lipschitz_constant_cost(self):
        """getLipshitzConstantCost (double_integrator_robust_cost.cuh:18-21):
        the RMPPI free-energy growth bounds scale with this."""
        return self.crash_cost

    def state_cost(self, y, t, crash):
        radial2 = y[0] * y[0] + y[1] * y[1]
        speed = jnp.sqrt(y[2] * y[2] + y[3] * y[3])
        ang_mom = y[0] * y[3] - y[1] * y[2]

        # normalized squared deviation from the annulus center-line
        center_r2 = 0.5 * (self.inner_path_radius2 + self.outer_path_radius2)
        width = 0.5 * (self.outer_path_radius2 - self.inner_path_radius2)
        d = (radial2 - center_r2) / width  # |d| = 1 at the track boundary
        cost = 0.5 * self.crash_cost * d * d
        # hard crash outside the track, like the reference robust cost's
        # saturating barrier
        out = jnp.abs(d) > 1.0
        t_f = jnp.asarray(t, jnp.float32)
        cost = jnp.where(out, math_utils.discount_pow(self.discount, t_f) * self.crash_cost, cost)
        cost = cost + self.velocity_cost * jnp.abs(speed - self.velocity_desired)
        cost = cost + self.velocity_cost * jnp.abs(
            ang_mom - self.angular_momentum_desired
        )
        return cost, crash
