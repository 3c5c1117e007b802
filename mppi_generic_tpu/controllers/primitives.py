"""Primitives controller — motion-primitive planning + MPPI refinement.

Parity target: reference ``controllers/Primitives/primitives_controller.{cuh,cu}``
(note the reference version is bit-rotted — it inherits an obsolete
Controller signature and is untested; the behavior reproduced here is what
its computeControl actually implements, primitives_controller.cu:62-373):

Phase 1 — intermediate planner (num_primitive_iters, :89-162):
  sample piecewise-linear control trajectories (piecewise_linear_noise.cuh),
  roll out, and *greedily* adopt the best-index sample as the nominal
  (computeBestIndex — argmin, not a weighted average). If the best cost
  exceeds ``stopping_cost_threshold``, issue a stopping trajectory instead
  (computeStoppingTrajectory, :404-420: iterate getStoppingControl through
  the dynamics) and mark the primitive baseline float::min (a tiny positive
  value) so the stopping trajectory wins the final comparison unless the
  MPPI refinement's baseline beats it (primitives_controller.cu:131-132).

Phase 2 — MPPI refinement (:174-298): a standard colored-noise MPPI solve
over a *separate* control sequence ``control_mppi`` (the reference keeps
control_ and control_mppi_ side by side, :377-380).

Final choice (:311-353): use the MPPI control iff
``mppi_baseline < primitives_baseline + hysteresis_cost_threshold``
(or the corresponding phase was disabled); ``nominal_state_used`` records
which source won (0 = MPPI, 1 = nominal+noise sample, 3 = new piecewise
trajectory).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mppi_generic_tpu.controllers.base import ControllerState, SolveResult
from mppi_generic_tpu.controllers.colored import ColoredMPPI
from mppi_generic_tpu.ops import weights as weight_ops
from mppi_generic_tpu.ops.weights import FreeEnergyStats
from mppi_generic_tpu.sampling.piecewise_linear import PiecewiseLinearDistribution
from mppi_generic_tpu.utils import math_utils

# std::numeric_limits<float>::min() — the smallest POSITIVE float (the
# reference's sentinel, primitives_controller.cu:132). With hysteresis 0 the
# final comparison mppi_baseline < sentinel is then (almost) always false,
# so the stopping trajectory stays in force once issued.
# numpy, not jnp: module-scope jnp would initialize the XLA backend at
# import, breaking later jax.distributed.initialize() (multi-host bring-up)
_FLOAT_MIN = np.float32(1.17549435e-38)


class PrimitivesControllerState(ControllerState):
    """Adds the separate MPPI-refined sequence + its smoothing history."""

    control_mppi: jnp.ndarray = None  # (T, C)
    mppi_history: jnp.ndarray = None  # (2, C)


class PrimitivesSolveResult(SolveResult):
    primitives_baseline: jnp.ndarray = None
    # 0 = MPPI control used; 1 = nominal+noise primitive; 3 = new piecewise
    nominal_state_used: jnp.ndarray = None
    control_mppi: jnp.ndarray = None  # (T, C) the refined sequence


class PrimitivesController(ColoredMPPI):
    primitive_sampler: PiecewiseLinearDistribution = None
    num_primitive_iters: int = struct.field(pytree_node=False, default=1)
    stopping_cost_threshold: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1.0e8)
    )
    hysteresis_cost_threshold: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )

    # ------------------------------------------------------------------
    def init_state(self, key=None, initial_mean=None) -> PrimitivesControllerState:
        base = super().init_state(key, initial_mean)
        return PrimitivesControllerState(
            **{f: getattr(base, f) for f in base.__dataclass_fields__},
            control_mppi=base.control_mean,
            mppi_history=jnp.zeros_like(base.control_history),
        )

    def slide_control_sequence(self, ctrl_state, stride):
        """Both sequences slide (primitives_controller.cu slideControlSequence)."""
        slid = super().slide_control_sequence(ctrl_state, stride)
        mppi = ctrl_state.control_mppi
        new_hist = math_utils.update_control_history(
            ctrl_state.mppi_history, mppi, stride
        )
        new_mppi = math_utils.slide_control_sequence(mppi, stride, self.slide_scale)
        return slid.replace(control_mppi=new_mppi, mppi_history=new_hist)

    def stopping_trajectory(self, x0):
        """Iterate getStoppingControl through the dynamics
        (computeStoppingTrajectory, primitives_controller.cu:404-420)."""

        def step(x, t):
            u = self.dynamics.get_stopping_control(x)
            u = self.dynamics.enforce_constraints(x, u)
            x_next, _ = self.dynamics.step(x, u, t, self.dt)
            return x_next, u

        _, U = jax.lax.scan(
            step, x0, jnp.arange(self.num_timesteps, dtype=jnp.float32)
        )
        return U

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=())
    def solve(self, state, ctrl_state, optimization_stride: jnp.ndarray = 0):
        key = ctrl_state.key
        K = self.num_rollouts

        # ---- phase 1: piecewise-linear intermediate planner ----
        prim_mean = ctrl_state.control_mean
        prim_baseline = _FLOAT_MIN
        best_idx = jnp.int32(0)
        for it in range(self.num_primitive_iters):
            key, sub = jax.random.split(key)
            U, _ = self.primitive_sampler.sample(
                sub, prim_mean, K,
                iteration=it, optimization_stride=optimization_stride,
            )
            U = self._clamp_controls(U)
            U = self._shard_samples(U)
            costs, _, _ = self._rollout_costs(
                state, U, prim_mean, sampler=self.primitive_sampler
            )
            prim_baseline = weight_ops.baseline_cost(costs)
            best_idx = jnp.argmin(costs).astype(jnp.int32)
            use_stop = (self.stopping_cost_threshold > 0) & (
                prim_baseline > self.stopping_cost_threshold
            )
            prim_mean = jnp.where(
                use_stop, self.stopping_trajectory(state), U[best_idx]
            )
            prim_baseline = jnp.where(use_stop, _FLOAT_MIN, prim_baseline)

        # ---- phase 2: colored-MPPI refinement of the separate sequence ----
        mppi_mean = ctrl_state.control_mppi
        samp_state = ctrl_state.sampler_state
        mppi_baseline = jnp.float32(3.4e38)
        costs = jnp.zeros((K,), jnp.float32)
        w = jnp.zeros((K,), jnp.float32)
        eta = jnp.float32(1.0)
        crash = jnp.zeros((K,), jnp.int32)
        for it in range(self.num_iters):
            key, sub = jax.random.split(key)
            mppi_mean, samp_state, diag = self._iteration(
                state, mppi_mean, samp_state, sub, it, optimization_stride
            )
            _, costs, w, mppi_baseline, eta, crash = diag

        # ---- choose the published control (:311-353) ----
        if self.num_primitive_iters == 0 and self.num_iters > 0:
            use_mppi = jnp.bool_(True)
        elif self.num_iters == 0:
            use_mppi = jnp.bool_(False)
        else:
            use_mppi = mppi_baseline < prim_baseline + self.hysteresis_cost_threshold
        control = jnp.where(use_mppi, mppi_mean, prim_mean)
        # float compare matching the sampler's carve-out mask
        in_nominal_band = best_idx.astype(jnp.float32) < (
            self.primitive_sampler.frac_add_nominal * K
        )
        nominal_state_used = jnp.where(
            use_mppi, 0, jnp.where(in_nominal_band, 1, 3)
        ).astype(jnp.int32)

        fe_mean, fe_var, fe_mod = weight_ops.compute_free_energy(
            w, mppi_baseline, self.lam
        )
        free_energy = FreeEnergyStats(
            free_energy_mean=fe_mean,
            free_energy_variance=fe_var,
            free_energy_modified_variance=fe_mod,
            baseline=mppi_baseline,
            normalizer_percent=eta / K,
            previous_baseline=ctrl_state.previous_baseline,
            increase=mppi_baseline - ctrl_state.previous_baseline,
        )

        # post-processing on both sequences (:356-365)
        control = self._smooth(control, ctrl_state.control_history)
        mppi_mean = self._smooth(mppi_mean, ctrl_state.mppi_history)
        states, outputs = self._mean_trajectory(state, control)
        control = self._clamp_controls(control)
        mppi_mean = self._clamp_controls(mppi_mean)

        result = PrimitivesSolveResult(
            control_mean=control,
            state_trajectory=states,
            output_trajectory=outputs,
            costs=costs,
            weights=w,
            baseline=mppi_baseline,
            normalizer=eta,
            free_energy=free_energy,
            crash=crash,
            sampled_controls=None,
            primitives_baseline=prim_baseline,
            nominal_state_used=nominal_state_used,
            control_mppi=mppi_mean,
        )
        new_state = ctrl_state.replace(
            control_mean=control,
            control_mppi=mppi_mean,
            key=key,
            previous_baseline=mppi_baseline,
            sampler_state=samp_state,
        )
        return result, new_state
