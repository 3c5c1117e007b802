"""Controller base — TPU-native redesign of the reference's
``Controller<DYN, COST, FB, SAMPLING, MAX_T, NUM_ROLLOUTS, PARAMS>``
(controllers/controller.cuh:70-1026).

Everything the reference does with device buffers + stream choreography
becomes one jitted pure function ``solve(state, mean, key) -> SolveResult``.
The controller object itself is a pytree (hyper-parameters are leaves, shape
configuration is static), so re-jitting only happens when shapes change —
the analog of the reference's compile-time template ints MAX_TIMESTEPS /
NUM_ROLLOUTS.

Control-sequence services reproduced from the reference:

* slide-forward with per-channel decay (slideControlSequenceHelper,
  controller.cuh:588-600) — ``utils.math_utils.slide_control_sequence``;
* 5-tap Savitzky-Golay smoothing with 2-step control history
  (smoothControlTrajectoryHelper, controller.cuh:557-586);
* CPU re-rollout of the nominal trajectory (computeOutputTrajectoryHelper,
  controller.cuh:643-663) — here just another lax.scan on-device;
* free-energy statistics (controller.cuh:22-38).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.costs.base import Cost
from mppi_generic_tpu.models.base import Dynamics, rollout_single
from mppi_generic_tpu.ops.weights import FreeEnergyStats
from mppi_generic_tpu.sampling.base import SamplingDistribution
from mppi_generic_tpu.utils import math_utils


class SolveResult(struct.PyTreeNode):
    """Everything a solve publishes (the analog of the reference's
    control_/state_/output_ trajectories + free-energy statistics)."""

    control_mean: jnp.ndarray  # (T, C) smoothed + clamped optimal sequence
    state_trajectory: jnp.ndarray  # (T+1, S) re-rollout of the mean
    output_trajectory: jnp.ndarray  # (T, O)
    costs: jnp.ndarray  # (K,) final-iteration raw trajectory costs
    weights: jnp.ndarray  # (K,) final-iteration transformed weights
    baseline: jnp.ndarray
    normalizer: jnp.ndarray
    free_energy: FreeEnergyStats
    crash: jnp.ndarray  # (K,) int32 crash status
    sampled_controls: Optional[jnp.ndarray] = None  # (K, T, C) if requested


class ControllerState(struct.PyTreeNode):
    """Warm-start state carried between solves (the reference's mutable
    controller members: control_ sequence + 2-step control history +
    previous baseline, controller.cuh:351-356, 557-586)."""

    control_mean: jnp.ndarray  # (T, C)
    control_history: jnp.ndarray  # (2, C) most recent executed controls
    key: jax.Array
    previous_baseline: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1e8)
    )
    # distribution-internal sequences (e.g. smooth-MPPI's derivative mean);
    # None for stateless samplers
    sampler_state: object = None


class ControllerBase(struct.PyTreeNode):
    dynamics: Dynamics
    cost: Cost
    sampler: SamplingDistribution

    # hyper-parameters (ControllerParams, controller.cuh:46-68)
    dt: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.02))
    lam: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    alpha: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    slide_scale: jnp.ndarray = None  # (C,) decay-to-zero scale for slid steps

    # static shape configuration
    num_timesteps: int = struct.field(pytree_node=False, default=100)
    num_rollouts: int = struct.field(pytree_node=False, default=1024)
    num_iters: int = struct.field(pytree_node=False, default=1)
    # "combined" = fused rolloutKernel analog; "split" = dynamics scan then
    # time-parallel cost pass (the reference auto-tunes between these).
    kernel: str = struct.field(pytree_node=False, default="combined")
    # sequential crash-status propagation in the split cost pass. True by
    # default so sticky-crash costs (e.g. AutoRally) keep identical
    # semantics whichever kernel the auto-tuner picks; set False to get the
    # fully time-parallel cost pass for crash-free costs.
    sequential_crash: bool = struct.field(pytree_node=False, default=True)
    return_samples: bool = struct.field(pytree_node=False, default=False)
    # sample-axis sharding (jax.sharding.NamedSharding) for multi-chip solves
    sample_sharding: Optional[object] = struct.field(pytree_node=False, default=None)
    # sample-tile size for the Pallas kernels (None = default_tile_k); the
    # auto-tuner sweeps this empirically, the way the reference sweeps its
    # kernel block dims
    pallas_tile_k: Optional[int] = struct.field(pytree_node=False, default=None)
    # split-cost variant of the fused Pallas kernels (dynamics-only
    # sequential loop + time-vectorized cost pass): None = the traced
    # op-weight heuristic decides (ops/pallas_rollout._split_profitable);
    # the auto-tuner measures both and overrides. Only meaningful for costs
    # declaring time_parallel_cost().
    pallas_split_cost: Optional[bool] = struct.field(
        pytree_node=False, default=None
    )

    # ------------------------------------------------------------------
    def init_state(self, key=None, initial_mean=None) -> ControllerState:
        T, C = self.num_timesteps, self.dynamics.CONTROL_DIM
        if key is None:
            key = jax.random.PRNGKey(0)
        if initial_mean is None:
            initial_mean = jnp.zeros((T, C), jnp.float32)
        return ControllerState(
            control_mean=initial_mean,
            control_history=jnp.zeros((2, C), jnp.float32),
            key=key,
            sampler_state=self.sampler.init_state(),
        )

    # --- shared helpers ------------------------------------------------
    def _shard_samples(self, x):
        if self.sample_sharding is not None:
            return jax.lax.with_sharding_constraint(x, self.sample_sharding)
        return x

    def _clamp_controls(self, U):
        """Vectorized enforceConstraints over a (..., C) control tensor."""
        dyn = self.dynamics
        db = dyn.control_deadband
        zc = dyn.zero_control
        lo = dyn.control_ranges[:, 0]
        hi = dyn.control_ranges[:, 1]
        shrunk = U - db * math_utils.sign(U)
        U = jnp.where(jnp.abs(U) < db, zc, shrunk)
        return jnp.clip(U, lo, hi)

    def _smooth(self, mean, history):
        return math_utils.savitzky_golay_smooth(mean, history)

    def _mean_trajectory(self, state, mean):
        states, outputs = rollout_single(self.dynamics, state, mean, self.dt)
        return states, outputs

    def slide_control_sequence(self, ctrl_state: ControllerState, stride):
        """Shift the warm-start sequence by ``stride`` and update history
        (controller.cuh:347-360)."""
        mean = ctrl_state.control_mean
        new_hist = math_utils.update_control_history(
            ctrl_state.control_history, mean, stride
        )
        new_mean, new_samp_state = self.sampler.shift(
            mean, stride, self.slide_scale, ctrl_state.sampler_state
        )
        return ctrl_state.replace(
            control_mean=new_mean,
            control_history=new_hist,
            sampler_state=new_samp_state,
        )

    def visualize(self, state, result: SolveResult, num_vis: int = 32,
                  num_top: int = 8):
        """Visualization pass over the solve's sampled controls (the
        visualizeKernel analog, mppi_common.cu:364-684). Requires
        ``return_samples=True`` so the solve kept its (K, T, C) samples;
        jit this separately so it stays off the solve's critical path (the
        reference's vis_stream_)."""
        from mppi_generic_tpu.ops.visualize import visualize as vis_fn

        if result.sampled_controls is None:
            raise ValueError("visualize() needs return_samples=True")
        return vis_fn(
            self.dynamics, self.cost, state, result.sampled_controls,
            result.weights, self.dt, num_vis=num_vis, num_top=num_top,
        )

    def get_current_control(self, result: SolveResult, rel_time):
        """Interpolate the feed-forward control at a wall-clock offset into
        the trajectory (interpolateControls, controller.cuh:363-378)."""
        dt = self.dt
        T = self.num_timesteps
        idx_f = jnp.clip(rel_time / dt, 0.0, T - 1.0)
        lo = jnp.clip(jnp.floor(idx_f).astype(jnp.int32), 0, T - 1)
        hi = jnp.clip(lo + 1, 0, T - 1)
        alpha = idx_f - lo.astype(jnp.float32)
        u = (1 - alpha) * result.control_mean[lo] + alpha * result.control_mean[hi]
        return self._clamp_controls(u)
