"""Robust MPPI (RMPPI) controller.

Parity target: reference ``controllers/R-MPPI/robust_mppi_controller.{cuh,cu}``
+ ``core/rmppi_kernels.cu``. Two stages per control cycle:

1. **Importance-sampling update** (updateImportanceSamplingControl,
   robust_mppi_controller.cu:548-632): build ``num_candidates`` candidate
   nominal states by piecewise-linear interpolation between
   {nominal_k, nominal_k+1, real_k+1} (line-search weights,
   :480-498), evaluate each candidate's free energy with
   ``samples_per_condition`` rollouts whose control reads are time-shifted
   by the candidate's stride (initEval kernels; candidate_t =
   min(t + stride, T-1), rmppi_kernels.cu:69-81), and pick the LAST
   candidate whose free energy is below ``value_function_threshold``
   (computeBestIndex, :527-545). The nominal state/stride come from that
   candidate; the nominal control sequence is slid by the chosen stride and
   the DDP feedback gains are recomputed against the nominal trajectory.

2. **Augmented solve** (computeControl, :635-755 + rolloutRMPPIKernel):
   each sample rolls BOTH systems with the same control sample (both
   distributions are seeded with the nominal mean and share noise): the
   nominal system open-loop, the real system with per-step feedback
   u = clamp(U_k[t] + K[t](x_real - x_nom_sample)) toward the *sample's own*
   nominal trajectory. Costs (rmppi_kernels.cu:595-660):

     J_real = (sum state(y_real, u_real, t) + lr(u_real, t) + terminal)/T
     S_nom  = (sum state(y_nom) + terminal)/T
     S_real_fb = (sum state(y_real) + fb_cost(u_fb) + terminal)/T
     J_nom  = 0.5*S_nom + 0.5*max(min(S_real_fb, threshold), S_nom) + LR_nom/T

   The nominal distribution updates with J_nom weights, the real with
   J_real; both sequences smooth with their own histories.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.controllers.base import ControllerBase, SolveResult
from mppi_generic_tpu.ops import weights as weight_ops
from mppi_generic_tpu.utils import math_utils
from mppi_generic_tpu.ops.weights import FreeEnergyStats


def line_search_weights(num_candidates: int) -> jnp.ndarray:
    """(3, num_candidates) interpolation weights over
    {nominal_k, nominal_k+1, real_k+1} (computeLineSearchWeights,
    robust_mppi_controller.cu:480-498). num_candidates must be odd >= 3."""
    m = num_candidates // 2
    w = []
    for i in range(m + 1):
        w.append([1 - i / m, i / m, 0.0])
    for i in range(1, m + 1):
        w.append([0.0, 1 - i / m, i / m])
    return jnp.asarray(w, jnp.float32).T  # (3, n)


class RobustControllerState(struct.PyTreeNode):
    control_mean: jnp.ndarray  # (T, C) real-system optimal sequence
    nominal_mean: jnp.ndarray  # (T, C)
    nominal_state: jnp.ndarray  # (S,)
    nominal_traj: jnp.ndarray  # (T, S) nominal state trajectory
    control_history: jnp.ndarray  # (2, C) real history
    nominal_control_history: jnp.ndarray  # (2, C)
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
    best_index: jnp.ndarray = struct.field(default_factory=lambda: jnp.int32(0))
    nominal_stride: jnp.ndarray = struct.field(default_factory=lambda: jnp.int32(0))


class RobustSolveResult(struct.PyTreeNode):
    real: SolveResult
    nominal: SolveResult
    best_index: jnp.ndarray = None
    candidate_free_energy: jnp.ndarray = None


class RobustMPPI(ControllerBase):
    # solve treats these kernels identically (the augmented rollout has its
    # own fused kernel); the auto-tuner times the shared program once
    _equivalent_kernels = {"pallas_fused": "pallas"}

    feedback: Optional[object] = None  # DDPFeedback (required for RMPPI)
    value_function_threshold: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1e8)
    )
    num_candidates: int = struct.field(pytree_node=False, default=9)
    samples_per_condition: int = struct.field(pytree_node=False, default=256)

    # ------------------------------------------------------------------
    def init_state(self, key=None, initial_mean=None) -> RobustControllerState:
        T, C, S = (
            self.num_timesteps,
            self.dynamics.CONTROL_DIM,
            self.dynamics.STATE_DIM,
        )
        if key is None:
            key = jax.random.PRNGKey(0)
        if initial_mean is None:
            initial_mean = jnp.zeros((T, C), jnp.float32)
        fb_state = (
            self.feedback.init_feedback_state(T) if self.feedback is not None else None
        )
        return RobustControllerState(
            control_mean=initial_mean,
            nominal_mean=initial_mean,
            nominal_state=jnp.zeros((S,), jnp.float32),
            nominal_traj=jnp.zeros((T, S), jnp.float32),
            control_history=jnp.zeros((2, C), jnp.float32),
            nominal_control_history=jnp.zeros((2, C), jnp.float32),
            key=key,
            feedback_state=fb_state,
            sampler_state=self.sampler.init_state(),
        )

    # --- stage 1: importance-sampling update --------------------------------
    @partial(jax.jit, static_argnames=())
    def update_importance_sampling(
        self, state, ctrl_state: RobustControllerState, stride=1
    ):
        """updateImportanceSamplingControl (robust_mppi_controller.cu:548-571)."""
        from mppi_generic_tpu.models.base import rollout_single
        from mppi_generic_tpu.ops import rollout as rollout_ops

        T = self.num_timesteps
        key, sub = jax.random.split(ctrl_state.key)

        def first_call():
            return state, jnp.int32(0), jnp.int32(0), jnp.zeros(
                (self.num_candidates,), jnp.float32
            )

        def candidate_eval():
            W = line_search_weights(self.num_candidates)  # (3, n)
            points = jnp.stack(
                [ctrl_state.nominal_traj[0], ctrl_state.nominal_traj[1], state],
                axis=1,
            )  # (S, 3)
            candidates = (points @ W).T  # (n, S)
            stride_vec = jnp.array([0.0, stride, stride], jnp.float32)
            cand_strides = jnp.round(stride_vec @ W).astype(jnp.int32)  # (n,)

            # shared noise across candidates (rmppi_kernels.cu:70:
            # readControlSample(candidate_sample_idx, ...))
            U, _ = self.sampler.sample(
                sub,
                ctrl_state.nominal_mean,
                self.samples_per_condition,
                iteration=0,
                optimization_stride=stride,
                state=ctrl_state.sampler_state,
            )
            U = self._clamp_controls(U)  # (S_per, T, C)

            def shift_controls(cand_stride):
                # candidate_t = min(t + stride, T-1) control indexing
                t_idx = jnp.clip(jnp.arange(T) + cand_stride, 0, T - 1)
                return U[:, t_idx]  # (S_per, T, C)

            if self.kernel in ("pallas", "pallas_fused"):
                # one fused-kernel launch over all (candidate, sample) pairs
                # via per-sample initial states
                from mppi_generic_tpu.ops import pallas_rollout

                n = self.num_candidates
                S_per = self.samples_per_condition
                U_all = jax.vmap(shift_controls)(cand_strides)
                U_flat = U_all.reshape(n * S_per, T, -1)
                x0_all = jnp.repeat(candidates, S_per, axis=0)
                # LR per candidate block: the Gaussian pure-noise carve-out
                # mask is defined over the S_per sample axis, NOT the
                # flattened (candidate * sample) axis
                lr = jax.vmap(
                    lambda Uc: self.sampler.likelihood_ratio_cost(
                        Uc, ctrl_state.nominal_mean, self.lam, self.alpha
                    )
                )(U_all)  # (n, S_per)
                # shard the flattened (candidate × sample) axis when it
                # divides the mesh; otherwise run the eval replicated (it is
                # a small side computation next to the main solve)
                sh = self.sample_sharding
                if sh is not None:
                    msize = sh.mesh.shape[sh.spec[0]]
                    if (n * S_per) % msize:
                        sh = None
                # tile_k=None: the candidate-eval batch (n * S_per) is
                # much smaller than the main solve's K — a tile tuned for
                # the big batch would pad it several-fold
                try:
                    costs, _ = pallas_rollout.fused_rollout_costs(
                        self.dynamics, self.cost, x0_all, U_flat, self.dt,
                        sharding=sh, split_cost=self.pallas_split_cost,
                    )
                except pallas_rollout.PallasIncompatible:
                    # e.g. a map texture the in-kernel path cannot host —
                    # fall back to the XLA combined rollout
                    costs, _, _ = rollout_ops.rollout_combined(
                        self.dynamics, self.cost, x0_all, U_flat, self.dt
                    )
                cand_costs = costs.reshape(n, S_per) + lr / T
            else:
                def eval_candidate(x0, cand_stride):
                    U_c = shift_controls(cand_stride)
                    lr = self.sampler.likelihood_ratio_cost(
                        U_c, ctrl_state.nominal_mean, self.lam, self.alpha
                    )
                    costs, _, _ = rollout_ops.rollout_combined(
                        self.dynamics, self.cost, x0, U_c, self.dt
                    )
                    return costs + lr / T  # (S_per,)

                cand_costs = jax.vmap(eval_candidate)(candidates, cand_strides)
            # baseline over ALL eval rollouts (computeCandidateBaseline)
            baseline = jnp.min(cand_costs)
            fe = jnp.mean(jnp.exp(-(cand_costs - baseline) / self.lam), axis=1)
            fe = -self.lam * jnp.log(fe) + baseline  # (n,)
            # LAST candidate below the threshold (computeBestIndex :527-545);
            # falls back to the previous best (0 on the first pass)
            below = fe < self.value_function_threshold
            idx = jnp.arange(self.num_candidates)
            best = jnp.where(
                jnp.any(below),
                jnp.max(jnp.where(below, idx, -1)),
                ctrl_state.best_index,
            )
            return candidates[best], cand_strides[best], best, fe

        nominal_state, nominal_stride, best, cand_fe = jax.tree.map(
            lambda a, b: jnp.where(ctrl_state.nominal_initialized, b, a),
            first_call(),
            candidate_eval(),
        )

        # save histories, slide the nominal sequence by its stride
        mean_n = ctrl_state.nominal_mean
        nom_hist = math_utils.update_control_history(
            ctrl_state.nominal_control_history, mean_n, nominal_stride
        )
        mean_r = ctrl_state.control_mean
        real_hist = math_utils.update_control_history(
            ctrl_state.control_history, mean_r, stride
        )
        new_nominal_mean, samp_state = self.sampler.shift(
            mean_n, nominal_stride, self.slide_scale, ctrl_state.sampler_state
        )
        # recompute the nominal trajectory and the feedback gains
        states_nom, _ = rollout_single(
            self.dynamics, nominal_state, new_nominal_mean, self.dt
        )
        fb_state = ctrl_state.feedback_state
        if self.feedback is not None:
            fb_state = self.feedback.compute_feedback(
                state, states_nom[:-1], new_nominal_mean
            )
        return ctrl_state.replace(
            nominal_mean=new_nominal_mean,
            nominal_state=nominal_state,
            nominal_traj=states_nom[:-1],
            nominal_control_history=nom_hist,
            control_history=real_hist,
            key=key,
            nominal_initialized=jnp.bool_(True),
            feedback_state=fb_state,
            sampler_state=samp_state,
            best_index=best,
            nominal_stride=nominal_stride,
        ), cand_fe

    # --- stage 2: augmented solve --------------------------------------------
    def _augmented_rollout(self, x0_nom, x0_real, U, fb_state):
        """Both systems per sample with feedback in the loop
        (rolloutRMPPIDynamicsKernel/CostKernel). Returns per-sample
        (S_nom, LR_nom, J_real, S_real_fb)."""
        T = self.num_timesteps
        ts = jnp.arange(T, dtype=jnp.int32)
        mean = None  # lr computed per-step below

        def one_sample(U_k):
            def step(carry, inp):
                x_nom, x_real, crash_n, crash_r, s_nom, j_real, s_fb = carry
                u_raw, t = inp
                u_nom = self.dynamics.enforce_constraints(x_nom, u_raw)
                u_fb = self.feedback.k(x_real, x_nom, t, fb_state)
                u_real = self.dynamics.enforce_constraints(x_real, u_raw + u_fb)
                x_nom2, y_nom = self.dynamics.step(
                    x_nom, u_nom, t.astype(jnp.float32), self.dt
                )
                x_real2, y_real = self.dynamics.step(
                    x_real, u_real, t.astype(jnp.float32), self.dt
                )
                c_nom, crash_n = self.cost.running_cost(y_nom, u_nom, t, crash_n)
                c_real, crash_r = self.cost.running_cost(y_real, u_real, t, crash_r)
                fb_cost = self.sampler.feedback_cost_step(
                    u_fb, t, self.lam, self.alpha
                )
                return (
                    x_nom2,
                    x_real2,
                    crash_n,
                    crash_r,
                    s_nom + c_nom,
                    j_real + c_real,
                    s_fb + c_real + fb_cost,
                ), (y_nom, y_real, u_real)

            init = (
                x0_nom,
                x0_real,
                jnp.int32(0),
                jnp.int32(0),
                jnp.float32(0),
                jnp.float32(0),
                jnp.float32(0),
            )
            (xn, xr, cn, cr, s_nom, j_real, s_fb), (Yn, Yr, Ur) = jax.lax.scan(
                step, init, (U_k, ts)
            )
            term_n = self.cost.terminal_cost(Yn[-1])
            term_r = self.cost.terminal_cost(Yr[-1])
            s_nom = (s_nom + term_n) / T
            j_real_state = (j_real + term_r) / T
            s_fb = (s_fb + term_r) / T
            return s_nom, j_real_state, s_fb, Yn, Yr, Ur, cr

        return jax.vmap(one_sample)(U)

    @partial(jax.jit, static_argnames=())
    def solve(self, state, ctrl_state: RobustControllerState, optimization_stride=0):
        T = self.num_timesteps
        key = ctrl_state.key
        mean_nom = ctrl_state.nominal_mean
        mean_real = mean_nom  # both distributions seeded with the nominal mean
        samp_state = ctrl_state.sampler_state
        nominal_state = jnp.where(
            ctrl_state.nominal_initialized, ctrl_state.nominal_state, state
        )
        diag = None
        for it in range(self.num_iters):
            key, sub = jax.random.split(key)
            U, aux = self.sampler.sample(
                sub,
                mean_nom,
                self.num_rollouts,
                iteration=it,
                optimization_stride=optimization_stride,
                state=samp_state,
            )
            # the rollouts clamp in-loop (enforceConstraints + write-back);
            # pre-clamping here would apply the deadband twice. The
            # once-clamped copy feeds the nominal likelihood term and the
            # distribution updates (= the written-back nominal control).
            U = self._shard_samples(U)
            U_c = self._clamp_controls(U)
            use_fused_aug = self.kernel in ("pallas", "pallas_fused")
            if use_fused_aug:
                from mppi_generic_tpu.ops import pallas_rollout

                try:
                    s_nom, j_real_state, s_fb, crash, Ur = (
                        pallas_rollout.fused_rmppi_rollout(
                            self.dynamics, self.cost, nominal_state, state, U,
                            ctrl_state.feedback_state.gains,
                            self.sampler._sigma(T, 0),
                            self.sampler.control_cost_coeff,
                            self.dt, self.lam, self.alpha,
                            sharding=self.sample_sharding,
                            tile_k=self.pallas_tile_k,
                        )
                    )
                except pallas_rollout.PallasIncompatible:
                    # e.g. a horizon whose (T, C*S) gain table exceeds the
                    # SMEM budget — fall back to the XLA augmented scan
                    use_fused_aug = False
            if not use_fused_aug:
                s_nom, j_real_state, s_fb, Yn, Yr, Ur, crash = (
                    self._augmented_rollout(
                        nominal_state, state, U, ctrl_state.feedback_state
                    )
                )
            # likelihood-ratio terms: nominal uses the raw sample, real uses
            # the feedback-included (written-back) control (rmppi_kernels.cu:
            # 595-615 via readControlSample after the dyn kernel's write-back)
            lr_nom = self.sampler.likelihood_ratio_cost(
                U_c, mean_nom, self.lam, self.alpha, iteration=it
            )
            lr_real = self.sampler.likelihood_ratio_cost(
                Ur, mean_nom, self.lam, self.alpha, iteration=it
            )
            j_real = j_real_state + lr_real / T
            j_nom = (
                0.5 * s_nom
                + 0.5
                * jnp.maximum(
                    jnp.minimum(s_fb, self.value_function_threshold), s_nom
                )
                + lr_nom / T
            )

            bl_n = weight_ops.baseline_cost(j_nom)
            bl_r = weight_ops.baseline_cost(j_real)
            w_n = weight_ops.norm_exp_weights(j_nom, self.lam, bl_n)
            w_r = weight_ops.norm_exp_weights(j_real, self.lam, bl_r)
            eta_n = weight_ops.normalizer(w_n)
            eta_r = weight_ops.normalizer(w_r)
            mean_nom, samp_state = self.sampler.update_mean(
                U_c, aux, w_n, eta_n, mean_nom, samp_state
            )
            mean_real, _ = self.sampler.update_mean(
                U_c, aux, w_r, eta_r, mean_real, ctrl_state.sampler_state
            )
            diag = (j_real, j_nom, w_r, w_n, bl_r, bl_n, eta_r, eta_n, crash,
                    U_c, Ur)

        (j_real, j_nom, w_r, w_n, bl_r, bl_n, eta_r, eta_n, crash,
         U_c, Ur) = diag

        # smooth both sequences with their own histories (:736-738)
        mean_real = self._smooth(mean_real, ctrl_state.control_history)
        mean_nom = self._smooth(mean_nom, ctrl_state.nominal_control_history)
        states_nom, outputs_nom = self._mean_trajectory(nominal_state, mean_nom)
        states_real, outputs_real = self._mean_trajectory(state, mean_real)
        mean_real = self._clamp_controls(mean_real)
        mean_nom = self._clamp_controls(mean_nom)

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
            costs=j_real,
            weights=w_r,
            baseline=bl_r,
            normalizer=eta_r,
            free_energy=stats(w_r, bl_r, eta_r, ctrl_state.previous_baseline_real),
            crash=crash,
            sampled_controls=Ur if self.return_samples else None,
        )
        nominal = SolveResult(
            control_mean=mean_nom,
            state_trajectory=states_nom,
            output_trajectory=outputs_nom,
            costs=j_nom,
            weights=w_n,
            baseline=bl_n,
            normalizer=eta_n,
            free_energy=stats(
                w_n, bl_n, eta_n, ctrl_state.previous_baseline_nominal
            ),
            crash=crash,
            sampled_controls=U_c if self.return_samples else None,
        )
        result = RobustSolveResult(real=real, nominal=nominal,
                                   best_index=ctrl_state.best_index)
        new_state = ctrl_state.replace(
            control_mean=mean_real,
            nominal_mean=mean_nom,
            nominal_state=nominal_state,
            nominal_traj=states_nom[:-1],
            key=key,
            nominal_initialized=jnp.bool_(True),
            previous_baseline_real=bl_r,
            previous_baseline_nominal=bl_n,
            sampler_state=samp_state,
        )
        return result, new_state

    def slide_control_sequence(self, ctrl_state, stride):
        """No-op: RMPPI slides inside update_importance_sampling
        (robust_mppi_controller.cuh:190)."""
        return ctrl_state

    def compute_df(self, result: RobustSolveResult):
        """Tube-divergence metric (computeDF, robust_mppi_controller.cu:758-762)."""
        d = jnp.linalg.norm(
            result.real.state_trajectory[0] - result.nominal.state_trajectory[0]
        )
        return d
