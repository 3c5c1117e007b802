"""Generic quadratic cost to a goal state or goal trajectory.

Parity target: reference ``cost_functions/quadratic_cost/quadratic_cost.{cuh,cu}``
(QuadraticCostImpl / QuadraticCostTrajectoryImpl): diagonal-weight quadratic
``sum_i s_coeffs[i] * (y[i] - goal[i])^2`` with optional per-timestep goal
trajectory indexed by (current_time + t), clamped to the final goal
(quadratic_cost.cuh getIndex:49-58); terminal cost 0.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.costs.base import Cost


class QuadraticCost(Cost):
    # goal: (O,) for a fixed goal, or (H_goal, O) for a goal trajectory.
    goal: jnp.ndarray = None
    coeffs: jnp.ndarray = None
    current_time: jnp.ndarray = struct.field(default_factory=lambda: jnp.int32(0))
    terminal_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))

    @classmethod
    def create(cls, goal, coeffs=None, output_dim=None, terminal_scale=0.0):
        goal = jnp.asarray(goal, jnp.float32)
        O = goal.shape[-1] if output_dim is None else output_dim
        if coeffs is None:
            coeffs = jnp.ones((O,), jnp.float32)
        return cls(
            OUTPUT_DIM=O,
            goal=goal,
            coeffs=jnp.asarray(coeffs, jnp.float32),
            terminal_scale=jnp.float32(terminal_scale),
        )

    def time_parallel_cost(self) -> bool:
        # a goal *trajectory* indexes by t (a gather under a vectorized time
        # axis — not Mosaic-lowerable); the fixed-goal form is elementwise
        return self.goal.ndim == 1

    def _goal_at(self, t):
        if self.goal.ndim == 1:
            return self.goal
        idx = jnp.clip(self.current_time + t, 0, self.goal.shape[0] - 1)
        return self.goal[idx]

    def state_cost(self, y, t, crash):
        g = self._goal_at(t)
        err = jnp.stack([y[i] - g[i] for i in range(self.OUTPUT_DIM)])
        c = jnp.stack([self.coeffs[i] * err[i] ** 2 for i in range(self.OUTPUT_DIM)])
        return jnp.sum(c, axis=0), crash

    def terminal_cost(self, y):
        c, _ = self.state_cost(y, self.goal.shape[0] - 1 if self.goal.ndim > 1 else 0, 0)
        return self.terminal_scale * c
