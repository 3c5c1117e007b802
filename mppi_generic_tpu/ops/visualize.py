"""Trajectory visualization pass — analog of the reference's
``visualizeKernel`` / ``visualizeCostKernel`` (core/mppi_common.cu:364-684):
re-roll a subsampled set of control trajectories and export, per timestep,
the output vector, the running cost, and the crash status, plus the top-N
samples by weight (controller.cuh:279-297, 724-763) for RViz-style debug
overlays.

On TPU this is just another vmapped scan on the visualization subset — the
reference runs it on a separate CUDA stream (vis_stream_); here the caller
can simply jit it separately so it never sits on the solve's critical path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.costs.base import Cost
from mppi_generic_tpu.models.base import Dynamics


class VisualizationResult(struct.PyTreeNode):
    outputs: jnp.ndarray      # (Kv, T, O) output trajectories
    cost_trajectory: jnp.ndarray  # (Kv, T) per-timestep running cost
    crash_trajectory: jnp.ndarray  # (Kv, T) per-timestep crash status
    total_costs: jnp.ndarray  # (Kv,) (sum_t + terminal)/T, matching the solve
    indices: jnp.ndarray      # (Kv,) rollout indices that were visualized


def visualize_rollouts(
    dynamics: Dynamics, cost: Cost, x0: jnp.ndarray, U_vis: jnp.ndarray, dt
):
    """Re-rollout with per-timestep cost/crash export (visualizeKernel +
    visualizeCostKernel fused — there is no reason to split on TPU)."""
    Kv, T, _ = U_vis.shape
    ts = jnp.arange(T, dtype=jnp.int32)

    def one(U_k):
        def step_fn(carry, inp):
            x, rec, crash = carry
            u, t = inp
            x_next, y, rec = dynamics.step_recurrent(
                x, rec, u, t.astype(jnp.float32), dt
            )
            c, crash = cost.running_cost(y, u, t, crash)
            return (x_next, rec, crash), (y, c, crash)

        init = (x0, dynamics.init_recurrent_state(), jnp.int32(0))
        _, (Y, cs, crashes) = jax.lax.scan(step_fn, init, (U_k, ts))
        total = (jnp.sum(cs) + cost.terminal_cost(Y[-1])) / T
        return Y, cs, crashes, total

    Y, cs, crashes, totals = jax.vmap(one)(U_vis)
    return Y, cs, crashes, totals


def select_visualization_samples(weights: jnp.ndarray, num_vis: int, num_top: int):
    """Indices to visualize: an even stride through all rollouts plus the
    ``num_top`` highest-weight samples (controller.cuh:748 semantics —
    perc-of-rollouts subsample + top_num best)."""
    K = weights.shape[0]
    stride = max(K // max(num_vis, 1), 1)
    strided = jnp.arange(num_vis, dtype=jnp.int32) * stride
    strided = jnp.clip(strided, 0, K - 1)
    if num_top > 0:
        _, top = jax.lax.top_k(weights, num_top)
        return jnp.concatenate([strided, top.astype(jnp.int32)])
    return strided


def visualize(
    dynamics: Dynamics,
    cost: Cost,
    x0: jnp.ndarray,
    U: jnp.ndarray,
    weights: jnp.ndarray,
    dt,
    num_vis: int = 32,
    num_top: int = 8,
) -> VisualizationResult:
    """Full visualization pass over the solve's sampled controls
    (requires the controller's ``return_samples=True``)."""
    idx = select_visualization_samples(weights, num_vis, num_top)
    Y, cs, crashes, totals = visualize_rollouts(dynamics, cost, x0, U[idx], dt)
    return VisualizationResult(
        outputs=Y,
        cost_trajectory=cs,
        crash_trajectory=crashes,
        total_costs=totals,
        indices=idx,
    )
