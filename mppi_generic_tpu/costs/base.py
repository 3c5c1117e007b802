"""Cost-function base class — TPU-native redesign of the reference's CRTP
``Cost<CLASS_T, PARAMS_T, DYN_PARAMS_T>`` (cost_functions/cost.cuh:34-234).

Costs are pure functions of the dynamics *output* vector (not state), exactly
like the reference. Per-sample crash status is threaded explicitly as an
int32 value (the reference passes an ``int* crash_status``); batched paths
carry it through the rollout scan.

Batching convention matches models/base.py: component indexing on axis 0 so
one implementation serves vectors, vmap, and Pallas SoA blocks.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class Cost(struct.PyTreeNode):
    CONTROL_DIM: int = struct.field(pytree_node=False, default=0)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=0)

    # reference CostParams: per-timestep discount + crash coefficient
    # (control_cost_coeff lives on the sampling distribution in the new
    # framework, matching where the reference actually *uses* it — the
    # likelihood-ratio term; cost.cuh computeControlCost defaults to 0).
    discount: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))

    def state_cost(self, y, t, crash):
        """Per-timestep state cost. Returns (cost, new_crash_status)."""
        raise NotImplementedError

    def control_cost(self, u, t, crash):
        """Zero by default (cost.cuh:128-131) — the quadratic control cost is
        the sampler's likelihood-ratio term."""
        del t, crash
        return jnp.zeros_like(u[0])

    def running_cost(self, y, u, t, crash):
        """state + control cost (cost.cuh:212-219). Returns (cost, crash)."""
        c_state, crash = self.state_cost(y, t, crash)
        return c_state + self.control_cost(u, t, crash), crash

    def time_parallel_cost(self) -> bool:
        """True when this cost is safe to evaluate with the time axis
        vectorized instead of inside the sequential rollout loop — the
        eligibility condition of the reference's split ``rolloutCostKernel``,
        which tiles time across threads (core/mppi_common.cu:148-267):

        * ``state_cost``/``control_cost`` neither read nor mutate ``crash``
          (crash propagation is inherently sequential in time), and
        * they trace correctly with one extra leading time axis on every
          component block and a broadcastable float ``t`` array (no
          data-dependent indexing by ``t``).

        Costs that satisfy this let the fused Pallas solve kernel run its
        horizon loop dynamics-only and evaluate the cost in tall
        time-vectorized VPU ops (ops/pallas_solve.py). Default False —
        opting in is a per-cost correctness statement.
        """
        return False

    def time_parallel_crash(self) -> bool:
        """True when this cost's crash usage is STICKY-PREFIX and its value
        is elementwise in the CURRENT crash flag, so the split kernels can
        still evaluate it time-vectorized (dual evaluation + an unrolled
        prefix-OR over the time block):

        * the crash output equals ``crash_in | trigger(y, t)`` where the
          trigger does not depend on ``crash_in`` — the monotone sticky
          crash_status contract of the reference's cost kernels
          (core/mppi_common.cu:78-79);
        * the cost value depends on crash only through the current flag
          (e.g. ``where(crash > 0, penalty, 0)``): evaluating once at
          crash=0 and once at crash=1 and selecting per timestep by the
          prefix-ORed trigger reproduces the sequential result exactly,
          and the two traces share every crash-independent subexpression
          (map queries included), so CSE makes the dual evaluation nearly
          free;
        * time-broadcastability as in :meth:`time_parallel_cost`.

        Mutually exclusive with ``time_parallel_cost`` (which asserts crash
        is unused — when that holds, declare that instead: it is cheaper).
        Default False; opting in is a per-cost correctness statement.
        """
        return False

    def terminal_cost(self, y):
        raise NotImplementedError
