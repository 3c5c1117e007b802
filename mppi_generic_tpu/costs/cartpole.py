"""Cartpole swing-up quadratic cost.

Parity target: reference ``cost_functions/cartpole/cartpole_quadratic_cost.{cuh,cu}``:
per-term coefficients (position 1000, velocity 100, angle 2000, angular
velocity 100), desired terminal state [0, 0, pi, 0], terminal cost = same
quadratic scaled by terminal_cost_coeff (default 0), control_cost_coeff 10.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.costs.base import Cost


class CartpoleQuadraticCost(Cost):
    CONTROL_DIM: int = struct.field(pytree_node=False, default=1)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=4)

    coeffs: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([1000.0, 100.0, 2000.0, 100.0])
    )
    desired_state: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.0, 0.0, jnp.pi, 0.0])
    )
    terminal_cost_coeff: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )

    def _quad(self, y):
        terms = [
            self.coeffs[i] * (y[i] - self.desired_state[i]) ** 2 for i in range(4)
        ]
        return sum(terms[1:], terms[0])

    def time_parallel_cost(self) -> bool:
        # pure quadratic: no crash usage, no t usage
        return True

    def state_cost(self, y, t, crash):
        return self._quad(y), crash

    def terminal_cost(self, y):
        return self.terminal_cost_coeff * self._quad(y)
