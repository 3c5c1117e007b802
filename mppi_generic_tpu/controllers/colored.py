"""Colored-noise MPPI controller.

Parity target: reference ``controllers/ColoredMPPI/colored_mppi_controller.{cuh,cu}``:
a vanilla-style loop over a ColoredNoiseDistribution sampler with two extras:

* optional Tsallis-divergence weighting with (gamma, r) params
  (colored_mppi_controller.cu:206, params :16-39) — available here through
  VanillaMPPI's ``weight_transform="tsallis"``;
* an optional *state leash* (:151-154): before the solve, the initial state
  is clamped to within ``state_leash_dist`` of the previously predicted
  state at the slide offset (dynamics.enforceLeash, dynamics.cuh:448-466),
  which rejects estimator jumps.
"""

from __future__ import annotations

import jax.numpy as jnp

from mppi_generic_tpu.controllers.vanilla import VanillaMPPI


class ColoredMPPI(VanillaMPPI):
    # (S,) per-dimension leash distance; None disables the leash
    state_leash_dist: jnp.ndarray = None

    def apply_leash(self, state, prev_state_trajectory, leash_jump):
        """Clamp the measured state to within the leash of the previous
        solve's predicted state at index ``leash_jump`` (= the slide stride,
        colored_mppi_controller.cu:151-154, :264). Returns the solve input."""
        if self.state_leash_dist is None:
            return state
        predicted = prev_state_trajectory[
            jnp.clip(leash_jump, 0, prev_state_trajectory.shape[0] - 1)
        ]
        return self.dynamics.enforce_leash(state, predicted, self.state_leash_dist)
