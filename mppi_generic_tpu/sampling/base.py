"""Sampling-distribution base — TPU-native redesign of the reference's
``SamplingDistribution`` CRTP base (sampling_distributions/sampling_distribution.cuh:32-430).

The reference's device-resident sample tensor
``control_samples_d_[num_distributions][num_rollouts][num_timesteps][CONTROL_DIM]``
becomes a plain (K, T, C) array returned by ``sample`` (one call per
distribution; Tube/RMPPI stack two). The distribution owns the MPPI mean
update (``update_mean``, reference gaussian.cu:433-457) and the
likelihood-ratio / feedback control costs.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class SamplingDistribution(struct.PyTreeNode):
    CONTROL_DIM: int = struct.field(pytree_node=False, default=0)

    def sample(self, key, mean, num_rollouts, *, iteration=0, optimization_stride=0):
        """Draw the (K, T, C) control-sample tensor around ``mean`` (T, C)."""
        raise NotImplementedError

    def likelihood_ratio_cost(self, U, mean, lam, alpha, num_rollouts=None):
        """Per-sample likelihood-ratio control cost, summed over (t, channel).

        Returns (K,) — the rollout adds this to the running cost before the
        1/T normalization (mppi_common.cu:126-133).
        """
        raise NotImplementedError

    def feedback_cost(self, u_fb, lam, alpha):
        """RMPPI feedback-control cost for a (..., T, C) feedback sequence."""
        raise NotImplementedError

    def update_mean(self, U, weights, normalizer):
        """New mean u_t = sum_k (w_k / eta) U[k, t] (weightedReductionKernel,
        mppi_common.cu:710-765)."""
        w = (weights / normalizer)[:, None, None]
        return jnp.sum(w * U, axis=0)

    def shift_mean(self, mean, stride, slide_scale=None):
        """Hook for distributions that keep extra internal sequences (e.g.
        smooth-MPPI's action-derivative mean)."""
        from mppi_generic_tpu.utils.math_utils import slide_control_sequence

        return slide_control_sequence(mean, stride, slide_scale)
