"""Sampling-distribution base — TPU-native redesign of the reference's
``SamplingDistribution`` CRTP base (sampling_distributions/sampling_distribution.cuh:32-430).

The reference's device-resident sample tensor
``control_samples_d_[num_distributions][num_rollouts][num_timesteps][CONTROL_DIM]``
becomes a plain (K, T, C) array returned by ``sample`` (one call per
distribution; Tube/RMPPI stack two). The distribution owns the MPPI mean
update (``update_mean``, reference gaussian.cu:433-457) and the
likelihood-ratio / feedback control costs.

Distributions that keep extra internal sequences (smooth-MPPI's
action-derivative mean, smooth-MPPI.cuh:12-73) thread them through an
explicit ``state`` pytree: ``init_state() -> state``, and ``sample`` /
``update_mean`` / ``shift`` take and return it. Stateless distributions use
``state = None`` (an empty pytree). ``sample`` additionally returns an
``aux`` pytree with whatever the update step needs (e.g. the raw derivative
samples); stateless samplers return ``aux = None``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.utils.math_utils import slide_control_sequence


class SamplingDistribution(struct.PyTreeNode):
    CONTROL_DIM: int = struct.field(pytree_node=False, default=0)

    # ------------------------------------------------------------------
    def init_state(self):
        """Internal sequence state carried across solves (None = stateless)."""
        return None

    def sample(
        self,
        key,
        mean,
        num_rollouts,
        *,
        iteration=0,
        optimization_stride=0,
        state=None,
    ):
        """Draw the (K, T, C) control-sample tensor around ``mean`` (T, C).

        Returns (U, aux): ``aux`` is passed back into ``update_mean``.
        """
        raise NotImplementedError

    def likelihood_ratio_cost(self, U, mean, lam, alpha, num_rollouts=None,
                              iteration=0):
        """Per-sample likelihood-ratio control cost, summed over (t, channel).

        Returns (K,) — the rollout adds this to the running cost before the
        1/T normalization (mppi_common.cu:126-133).
        """
        raise NotImplementedError

    def feedback_cost(self, u_fb, lam, alpha):
        """RMPPI feedback-control cost for a (..., T, C) feedback sequence."""
        raise NotImplementedError

    def update_mean(self, U, aux, weights, normalizer, mean, state=None):
        """MPPI distribution update. Default (Gaussian-family): the new mean
        is the weighted average of the control samples
        (weightedReductionKernel, mppi_common.cu:710-765).

        Returns (new_mean, new_state).
        """
        del aux, mean
        w = (weights / normalizer)[:, None, None]
        return jnp.sum(w * U, axis=0), state

    def shift(self, mean, stride, slide_scale=None, state=None):
        """Slide the mean (and any internal sequences) forward by ``stride``.

        Returns (new_mean, new_state).
        """
        return slide_control_sequence(mean, stride, slide_scale), state
