"""Vanilla MPPI controller.

Parity target: reference ``controllers/MPPI/mppi_controller.{cuh,cu}``
(computeControl, mppi_controller.cu:152-241). The per-iteration
host<->device ping-pong of the CUDA implementation (2 H2D + >=3 D2H copies
per iteration, see SURVEY §3.1) disappears: the whole multi-iteration solve
is ONE jitted XLA program; only x0 enters and the solution leaves the chip.

Per optimization iteration:
  1. sample controls around the mean (Gaussian carve-outs incl. sample-0 =
     mean, frozen head, pure-noise tail; gaussian.cu:101-121),
  2. clamp to control constraints (the reference clamps in-kernel and writes
     the clamped sample back),
  3. roll out dynamics + running cost + likelihood-ratio cost (combined or
     split kernel analog),
  4. baseline = min cost, weights = exp(-(J - baseline)/lambda)
     (or Tsallis / CEM transforms),
  5. mean <- sum_k (w_k / eta) U_k   (weightedReductionKernel analog).

Afterwards: Savitzky-Golay smoothing, mean re-rollout, final clamp —
matching mppi_controller.cu:225-231.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.controllers.base import (
    ControllerBase,
    ControllerState,
    SolveResult,
)
from mppi_generic_tpu.ops import pallas_rollout
from mppi_generic_tpu.ops import pallas_solve
from mppi_generic_tpu.ops import rollout as rollout_ops
from mppi_generic_tpu.ops import weights as weight_ops
from mppi_generic_tpu.ops.weights import FreeEnergyStats
from mppi_generic_tpu.sampling import base as sampling_base


class VanillaMPPI(ControllerBase):
    # weight transform: "exp" (normExp), "tsallis", or "cem"
    weight_transform: str = struct.field(pytree_node=False, default="exp")
    tsallis_gamma: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(10.0))
    tsallis_r: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.0))
    cem_elite_fraction: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.1)
    )
    # pluggable shaping-function pytree (shaping/__init__.py) — when set it
    # overrides the string dispatch above (the reference's decoupled
    # shaping_functions/ layer plugged into a controller)
    shaping_function: object = None

    # ------------------------------------------------------------------
    @staticmethod
    def _gaussian_lr(sampler) -> bool:
        """True when the sampler charges the plain Gaussian likelihood-ratio
        formula (gaussian.cu:481-568) — i.e. it did not override
        ``likelihood_ratio_cost`` — so the fused kernel can accumulate it
        in-loop (Gaussian, colored, NLN, smooth all qualify)."""
        from mppi_generic_tpu.sampling.gaussian import GaussianDistribution

        return (
            type(sampler).likelihood_ratio_cost
            is GaussianDistribution.likelihood_ratio_cost
        )

    def _transform_weights(self, costs, baseline):
        if self.shaping_function is not None:
            return self.shaping_function.compute_weights(costs, baseline)
        if self.weight_transform == "exp":
            return weight_ops.norm_exp_weights(costs, self.lam, baseline)
        if self.weight_transform == "tsallis":
            return weight_ops.tsallis_weights(
                costs, self.tsallis_gamma, self.tsallis_r, baseline
            )
        if self.weight_transform == "cem":
            return weight_ops.cem_weights(costs, self.cem_elite_fraction)
        raise ValueError(f"unknown weight transform {self.weight_transform}")

    def _rollout_costs(self, x0, U, mean, sampler=None, iteration=0):
        """Returns (costs (K,), Y (K,T,O), crash (K,)) including the
        likelihood-ratio term, normalized by T. ``sampler`` overrides the
        distribution whose likelihood term is charged (the Primitives
        controller scores its piecewise phase with its own sampler);
        ``iteration`` selects the decayed sigma the samples were drawn
        with."""
        T = self.num_timesteps
        sampler = self.sampler if sampler is None else sampler
        if self.kernel == "pallas" and self._gaussian_lr(sampler):
            # Gaussian-family LR accumulates inside the fused kernel from
            # per-timestep parameter tables (lr_params below) — no separate
            # XLA LR pass. This is how colored-noise solves stay on the
            # fused path: FFT generation in XLA, everything after in one
            # kernel. Tables past the SMEM scalar budget ride the stacked
            # VMEM layout; only past the 4 MB VMEM table budget does this
            # fall through to the XLA-LR + fused-rollout combination below.
            K = U.shape[0]
            lr_params = (
                mean,
                sampler._sigma(T, iteration),
                sampler.control_cost_coeff,
                self.lam,
                self.alpha,
                (1.0 - sampler.pure_noise_percentage) * K,
            )
            try:
                costs, crash = pallas_rollout.fused_rollout_costs(
                    self.dynamics, self.cost, x0, U, self.dt,
                    sharding=self.sample_sharding, lr_params=lr_params,
                    tile_k=self.pallas_tile_k,
                    split_cost=self.pallas_split_cost,
                )
                return costs, None, crash
            except pallas_rollout.PallasIncompatible:
                pass
        lr = sampler.likelihood_ratio_cost(
            U, mean, self.lam, self.alpha, iteration=iteration
        )
        if self.kernel == "split":
            Y = rollout_ops.rollout_outputs(self.dynamics, x0, U, self.dt)
            state_costs, crash = rollout_ops.trajectory_state_costs(
                self.cost, Y, U, sequential_crash=self.sequential_crash
            )
            costs = state_costs + lr / T
        elif self.kernel == "pallas":
            # multi-chip: the fused kernel runs per-shard under shard_map
            # (sample_sharding → one kernel launch per chip on its K/n slice)
            try:
                state_costs, crash = pallas_rollout.fused_rollout_costs(
                    self.dynamics, self.cost, x0, U, self.dt,
                    sharding=self.sample_sharding, tile_k=self.pallas_tile_k,
                    split_cost=self.pallas_split_cost,
                )
                costs = state_costs + lr / T
                Y = None  # never materialized — the fused kernel's HBM win
            except pallas_rollout.PallasIncompatible:
                # e.g. a map texture the in-kernel tent-mask path cannot
                # host (multichannel / past the VMEM side budget): fall
                # back to the XLA combined rollout, the reference's
                # shared-mem-overflow fallback behavior
                costs, Y, crash = rollout_ops.rollout_combined(
                    self.dynamics, self.cost, x0, U, self.dt
                )
                costs = costs + lr / T
        else:
            costs, Y, crash = rollout_ops.rollout_combined(
                self.dynamics, self.cost, x0, U, self.dt
            )
            costs = costs + lr / T
        return costs, Y, crash

    def _iteration(self, x0, mean, samp_state, key, iteration, optimization_stride):
        if (
            self.kernel == "pallas_fused"
            and self.weight_transform == "exp"
            and self.shaping_function is None
        ):
            # the fully-fused SOLVE kernel: sampling + rollout + normExp
            # weights + weighted mean update in ONE launch — the (K, T, C)
            # sample tensor never leaves VMEM (ops/pallas_solve.py). The
            # per-sample weights for SolveResult are recomputed in XLA from
            # the kernel's costs/baseline (K elementwise exps).
            seed = jax.random.randint(
                key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            try:
                costs, crash, new_mean, baseline, eta, U = (
                    pallas_solve.fused_solve_iteration(
                        self.dynamics, self.cost, self.sampler, x0, mean,
                        seed, self.dt, self.lam, self.alpha,
                        self.num_rollouts, iteration=iteration,
                        optimization_stride=optimization_stride,
                        tile_k=self.pallas_tile_k,
                        sharding=self.sample_sharding,
                        return_samples=self.return_samples,
                        split_cost=self.pallas_split_cost,
                    )
                )
                w = weight_ops.norm_exp_weights(costs, self.lam, baseline)
                return new_mean, samp_state, (U, costs, w, baseline, eta,
                                              crash)
            except pallas_rollout.PallasIncompatible:
                pass
        if self.kernel == "pallas_fused":
            # one kernel: hardware-PRNG sampling + carve-outs + clamp +
            # rollout + likelihood-ratio cost (the combined rolloutKernel
            # with generateSamples folded in); under sample_sharding it runs
            # per-shard with disjoint PRNG streams + global carve-out indices
            seed = jax.random.randint(
                key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            from mppi_generic_tpu.sampling.smooth import (
                SmoothMPPIDistribution,
            )

            if (type(self.sampler) is SmoothMPPIDistribution
                    and self.weight_transform == "exp"
                    and self.shaping_function is None):
                # Smooth-MPPI's flash epilogue accumulates over W in-kernel
                # (the derivative noise the mean update weights,
                # smooth-MPPI.cu:203-236) — W never touches HBM
                try:
                    costs, crash, U, deriv_mean, baseline, eta = (
                        pallas_rollout.fused_sample_rollout_costs(
                            self.dynamics, self.cost, self.sampler, x0,
                            mean, seed, self.dt, self.lam, self.alpha,
                            self.num_rollouts, iteration=iteration,
                            optimization_stride=optimization_stride,
                            sampler_state=samp_state,
                            sharding=self.sample_sharding,
                            tile_k=self.pallas_tile_k, epilogue=True,
                            emit_samples=self.return_samples,
                        )
                    )
                    new_mean = mean + deriv_mean * self.sampler.dt_smooth
                    w = weight_ops.norm_exp_weights(costs, self.lam,
                                                    baseline)
                    return new_mean, deriv_mean, (U, costs, w, baseline,
                                                  eta, crash)
                except pallas_rollout.PallasIncompatible:
                    pass
            try:
                costs, crash, U, aux = (
                    pallas_rollout.fused_sample_rollout_costs(
                        self.dynamics, self.cost, self.sampler, x0, mean,
                        seed, self.dt, self.lam, self.alpha,
                        self.num_rollouts, iteration=iteration,
                        optimization_stride=optimization_stride,
                        sampler_state=samp_state,
                        sharding=self.sample_sharding,
                        tile_k=self.pallas_tile_k,
                    )
                )
            except pallas_rollout.PallasIncompatible:
                # e.g. a map the in-kernel path cannot host, or a horizon
                # past the sample kernel's table ceiling — fall through to
                # XLA sampling + the generic rollout below (the reference's
                # shared-mem-overflow fallback)
                pass
            else:
                baseline = weight_ops.baseline_cost(costs)
                w = self._transform_weights(costs, baseline)
                eta = weight_ops.normalizer(w)
                new_mean, new_samp_state = self.sampler.update_mean(
                    U, aux, w, eta, mean, samp_state
                )
                return new_mean, new_samp_state, (U, costs, w, baseline,
                                                  eta, crash)

        U, aux = self.sampler.sample(
            key,
            mean,
            self.num_rollouts,
            iteration=iteration,
            optimization_stride=optimization_stride,
            state=samp_state,
        )
        U = self._clamp_controls(U)
        U = self._shard_samples(U)
        if (
            self.kernel == "pallas"
            and self.weight_transform in ("exp", "tsallis")
            and self.shaping_function is None
            and aux is None
            and self._gaussian_lr(self.sampler)
            and type(self.sampler).update_mean
            is sampling_base.SamplingDistribution.update_mean
        ):
            # precomputed-noise fused solve: rollout + in-kernel LR +
            # weights + flash weighted mean in ONE launch
            # (ops/pallas_rollout.fused_weighted_rollout). This is how
            # colored-noise / decayed-sigma solves keep the whole epilogue
            # on-chip; per-sample weights for SolveResult are recomputed
            # from costs/baseline in XLA (K elementwise ops). Tsallis rides
            # the two-pass in-kernel epilogue single-chip and the
            # two-LAUNCH global-pmin scheme under a mesh (round 5; the
            # reference ships Tsallis as a first-class ColoredMPPI mode,
            # colored_mppi_controller.cu:206); CEM stays on the XLA weight
            # pass — its elite threshold is a global order statistic.
            K = U.shape[0]
            lr_params = (
                mean,
                self.sampler._sigma(self.num_timesteps, iteration),
                self.sampler.control_cost_coeff,
                self.lam,
                self.alpha,
                (1.0 - self.sampler.pure_noise_percentage) * K,
            )
            try:
                costs, crash, new_mean, baseline, eta = (
                    pallas_rollout.fused_weighted_rollout(
                        self.dynamics, self.cost, x0, U, self.dt, self.lam,
                        lr_params=lr_params, tile_k=self.pallas_tile_k,
                        sharding=self.sample_sharding,
                        split_cost=self.pallas_split_cost,
                        weight_kind=self.weight_transform,
                        weight_params=(self.tsallis_gamma, self.tsallis_r),
                    )
                )
                w = self._transform_weights(costs, baseline)
                return new_mean, samp_state, (U, costs, w, baseline, eta,
                                              crash)
            except pallas_rollout.PallasIncompatible:
                pass
        costs, Y, crash = self._rollout_costs(x0, U, mean, iteration=iteration)
        baseline = weight_ops.baseline_cost(costs)
        w = self._transform_weights(costs, baseline)
        eta = weight_ops.normalizer(w)
        new_mean, new_samp_state = self.sampler.update_mean(
            U, aux, w, eta, mean, samp_state
        )
        return new_mean, new_samp_state, (U, costs, w, baseline, eta, crash)

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=())
    def solve(
        self,
        state: jnp.ndarray,
        ctrl_state: ControllerState,
        optimization_stride: jnp.ndarray = 0,
    ):
        """One full MPPI solve. Returns (SolveResult, new ControllerState)."""
        mean = ctrl_state.control_mean
        samp_state = ctrl_state.sampler_state
        key = ctrl_state.key
        diag = None
        for it in range(self.num_iters):
            key, sub = jax.random.split(key)
            mean, samp_state, diag = self._iteration(
                state, mean, samp_state, sub, it, optimization_stride
            )
        U, costs, w, baseline, eta, crash = diag

        fe_mean, fe_var, fe_mod = weight_ops.compute_free_energy(
            w, baseline, self.lam
        )
        free_energy = FreeEnergyStats(
            free_energy_mean=fe_mean,
            free_energy_variance=fe_var,
            free_energy_modified_variance=fe_mod,
            baseline=baseline,
            normalizer_percent=eta / self.num_rollouts,
            previous_baseline=ctrl_state.previous_baseline,
            increase=baseline - ctrl_state.previous_baseline,
        )

        # post-processing: SG smoothing -> mean re-rollout -> clamp
        mean = self._smooth(mean, ctrl_state.control_history)
        states, outputs = self._mean_trajectory(state, mean)
        mean = self._clamp_controls(mean)

        result = SolveResult(
            control_mean=mean,
            state_trajectory=states,
            output_trajectory=outputs,
            costs=costs,
            weights=w,
            baseline=baseline,
            normalizer=eta,
            free_energy=free_energy,
            crash=crash,
            sampled_controls=U if self.return_samples else None,
        )
        new_ctrl_state = ctrl_state.replace(
            control_mean=mean,
            key=key,
            previous_baseline=baseline,
            sampler_state=samp_state,
        )
        return result, new_ctrl_state

    def compute_control(self, state, ctrl_state, optimization_stride=0):
        """Reference-named alias of solve()."""
        return self.solve(state, ctrl_state, optimization_stride)
