"""Tube-MPPI controller.

Parity target: reference ``controllers/Tube-MPPI/tube_mppi_controller.{cuh,cu}``.
The CUDA version duplicates the whole solve across ``blockDim.z = 2`` (real
system z=0, nominal system z=1) with two importance-sampling distributions
sharing the same noise (GaussianParams::use_same_noise_for_all_distributions
defaults true). Here the "z axis" is simply two rollout batches built from
the SAME noise tensor (identical PRNG key) around two different means and
initial states.

Per computeControl (tube_mppi_controller.cu:158-300):

* solve both systems: real from the measured state around the real mean,
  nominal from the propagated nominal state around the nominal mean;
* per-system baseline/normExp/normalizer/free-energy and mean updates;
* acceptance: if baseline_real < baseline_nominal + nominal_threshold, the
  nominal system adopts the real solution (state + control trajectories)
  (:268-280);
* smoothing applies to the NOMINAL control (:286, :328-331);
* slideControlSequence propagates the nominal state one step with the first
  nominal control, saves history from the nominal sequence, and slides both
  sequences (:315-325);
* the ancillary (DDP) feedback tracks the nominal trajectory.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.controllers.base import SolveResult
from mppi_generic_tpu.controllers.vanilla import VanillaMPPI
from mppi_generic_tpu.ops import weights as weight_ops
from mppi_generic_tpu.utils import math_utils
from mppi_generic_tpu.ops.weights import FreeEnergyStats


class TubeControllerState(struct.PyTreeNode):
    control_mean: jnp.ndarray  # (T, C) real-system mean
    nominal_mean: jnp.ndarray  # (T, C)
    nominal_state: jnp.ndarray  # (S,)
    control_history: jnp.ndarray  # (2, C)
    key: jax.Array
    nominal_initialized: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.bool_(False)
    )
    previous_baseline_real: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1e8)
    )
    previous_baseline_nominal: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1e8)
    )
    feedback_state: object = None
    sampler_state: object = None


class TubeSolveResult(struct.PyTreeNode):
    real: SolveResult
    nominal: SolveResult
    nominal_state_used: jnp.ndarray = None  # 0 if real adopted, 1 otherwise


class TubeMPPI(VanillaMPPI):
    nominal_threshold: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(100.0)
    )
    feedback: Optional[object] = None  # DDPFeedback; tracks the nominal traj

    # ------------------------------------------------------------------
    def init_state(self, key=None, initial_mean=None) -> TubeControllerState:
        T, C = self.num_timesteps, self.dynamics.CONTROL_DIM
        if key is None:
            key = jax.random.PRNGKey(0)
        if initial_mean is None:
            initial_mean = jnp.zeros((T, C), jnp.float32)
        fb_state = (
            self.feedback.init_feedback_state(T) if self.feedback is not None else None
        )
        return TubeControllerState(
            control_mean=initial_mean,
            nominal_mean=initial_mean,
            nominal_state=jnp.zeros((self.dynamics.STATE_DIM,), jnp.float32),
            control_history=jnp.zeros((2, C), jnp.float32),
            key=key,
            feedback_state=fb_state,
            sampler_state=self.sampler.init_state(),
        )

    def _solve_system(self, x0, mean, key, iteration, optimization_stride, samp_state):
        """One vanilla-MPPI iteration for one system (shared noise via key).

        The tube's "blockDim.z = 2" dual solve (tube_mppi_controller.cu:
        190-192) becomes two same-key system solves — VanillaMPPI's
        ``_iteration`` verbatim, so every kernel path (combined / split /
        pallas / pallas_fused) and weight transform applies identically to
        both systems. With the fused sampling kernel the same seed
        reproduces the same noise draws for both systems, exactly the
        reference's shared noise tensor."""
        return self._iteration(
            x0, mean, samp_state, key, iteration, optimization_stride
        )

    @partial(jax.jit, static_argnames=())
    def solve(self, state, ctrl_state: TubeControllerState, optimization_stride=0):
        # first solve: nominal state starts at the measured state
        nominal_state = jnp.where(
            ctrl_state.nominal_initialized, ctrl_state.nominal_state, state
        )
        mean_real = ctrl_state.control_mean
        mean_nom = ctrl_state.nominal_mean
        samp_state = ctrl_state.sampler_state
        key = ctrl_state.key
        diag_r = diag_n = None
        for it in range(self.num_iters):
            key, sub = jax.random.split(key)
            # same sub-key for both systems = shared noise
            mean_real, samp_state, diag_r = self._solve_system(
                state, mean_real, sub, it, optimization_stride, samp_state
            )
            mean_nom, _, diag_n = self._solve_system(
                nominal_state, mean_nom, sub, it, optimization_stride,
                ctrl_state.sampler_state,
            )

        U_r, costs_r, w_r, bl_r, eta_r, crash_r = diag_r
        U_n, costs_n, w_n, bl_n, eta_n, crash_n = diag_n

        # acceptance (tube_mppi_controller.cu:268-280)
        accept_real = bl_r < bl_n + self.nominal_threshold
        mean_nom = jnp.where(accept_real, mean_real, mean_nom)
        nominal_state = jnp.where(accept_real, state, nominal_state)

        # smoothing applies to the nominal sequence (:286, :328-331)
        mean_nom = self._smooth(mean_nom, ctrl_state.control_history)

        states_nom, outputs_nom = self._mean_trajectory(nominal_state, mean_nom)
        states_real, outputs_real = self._mean_trajectory(state, mean_real)
        mean_nom = self._clamp_controls(mean_nom)
        mean_real = self._clamp_controls(mean_real)

        fb_state = ctrl_state.feedback_state
        if self.feedback is not None:
            # ancillary controller tracks the nominal trajectory
            fb_state = self.feedback.compute_feedback(
                state, states_nom[:-1], mean_nom
            )

        def stats(w, bl, eta, prev):
            fe_m, fe_v, fe_mod = weight_ops.compute_free_energy(w, bl, self.lam)
            return FreeEnergyStats(
                free_energy_mean=fe_m,
                free_energy_variance=fe_v,
                free_energy_modified_variance=fe_mod,
                baseline=bl,
                normalizer_percent=eta / self.num_rollouts,
                previous_baseline=prev,
                increase=bl - prev,
            )

        real = SolveResult(
            control_mean=mean_real,
            state_trajectory=states_real,
            output_trajectory=outputs_real,
            costs=costs_r,
            weights=w_r,
            baseline=bl_r,
            normalizer=eta_r,
            free_energy=stats(w_r, bl_r, eta_r, ctrl_state.previous_baseline_real),
            crash=crash_r,
            sampled_controls=U_r if self.return_samples else None,
        )
        nominal = SolveResult(
            control_mean=mean_nom,
            state_trajectory=states_nom,
            output_trajectory=outputs_nom,
            costs=costs_n,
            weights=w_n,
            baseline=bl_n,
            normalizer=eta_n,
            free_energy=stats(w_n, bl_n, eta_n, ctrl_state.previous_baseline_nominal),
            crash=crash_n,
            sampled_controls=U_n if self.return_samples else None,
        )
        result = TubeSolveResult(
            real=real,
            nominal=nominal,
            nominal_state_used=jnp.where(accept_real, 0, 1),
        )
        new_state = ctrl_state.replace(
            control_mean=mean_real,
            nominal_mean=mean_nom,
            nominal_state=nominal_state,
            key=key,
            nominal_initialized=jnp.bool_(True),
            previous_baseline_real=bl_r,
            previous_baseline_nominal=bl_n,
            feedback_state=fb_state,
            sampler_state=samp_state,
        )
        return result, new_state

    def slide_control_sequence(self, ctrl_state: TubeControllerState, stride):
        """tube_mppi_controller.cu:315-325: propagate the nominal state one dt
        with the first nominal control, save history from the nominal
        sequence, slide both sequences."""
        u0 = ctrl_state.nominal_mean[0]
        nominal_state, _ = self.dynamics.step(
            ctrl_state.nominal_state,
            self.dynamics.enforce_constraints(ctrl_state.nominal_state, u0),
            0.0,
            self.dt,
        )
        mean_n = ctrl_state.nominal_mean
        new_hist = math_utils.update_control_history(
            ctrl_state.control_history, mean_n, stride
        )
        new_nom, samp_state = self.sampler.shift(
            mean_n, stride, self.slide_scale, ctrl_state.sampler_state
        )
        new_real, _ = self.sampler.shift(
            ctrl_state.control_mean, stride, self.slide_scale,
            ctrl_state.sampler_state,
        )
        return ctrl_state.replace(
            control_mean=new_real,
            nominal_mean=new_nom,
            nominal_state=nominal_state,
            control_history=new_hist,
            sampler_state=samp_state,
        )

    def get_feedback_control(self, x, result: TubeSolveResult, fb_state, t):
        """u = u_nom[t] + K[t](x - x_nom[t]) — what the plant publishes."""
        u = result.nominal.control_mean[t]
        if self.feedback is not None:
            u = u + self.feedback.k(
                x, result.nominal.state_trajectory[t], t, fb_state
            )
        return self._clamp_controls(u)
