"""Feedback-controller base — redesign of the reference's two-half
GPUFeedbackController / FeedbackController pattern
(feedback_controllers/feedback.cuh:35-312, design doc doc/feedback.md).

On TPU there is no host/device split: a feedback controller is a pytree with

* ``compute_feedback(x0, goal_traj, control_traj) -> fb_state`` — the
  per-solve gain computation (the reference's CPU DDP solve), and
* ``k(x, x_goal, t, fb_state) -> u_fb`` — the per-step feedback law that the
  RMPPI rollout evaluates *inside* the sampled-trajectory scan (the
  reference's __device__ k()).

``fb_state`` is a pure array pytree (e.g. the (T, C, S) gain trajectory) so
it can flow into jitted rollouts.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class FeedbackController(struct.PyTreeNode):
    def init_feedback_state(self, num_timesteps):
        raise NotImplementedError

    def compute_feedback(self, x0, goal_traj, control_traj):
        """goal_traj: (T, S) target states; control_traj: (T, C).
        Returns the new feedback state (gains etc.)."""
        raise NotImplementedError

    def k(self, x, x_goal, t, fb_state):
        """Feedback control at step t: u_fb = K[t] (x - x_goal)."""
        raise NotImplementedError

    def interpolate_feedback(self, x, fb_state, rel_time, dt, goal_traj):
        """Feedback at a wall-clock offset, linearly interpolating the gains
        (controller.cuh interpolateFeedback:395-399)."""
        T = goal_traj.shape[0]
        idx_f = jnp.clip(rel_time / dt, 0.0, T - 1.0)
        lo = jnp.clip(jnp.floor(idx_f).astype(jnp.int32), 0, T - 1)
        hi = jnp.clip(lo + 1, 0, T - 1)
        a = idx_f - lo.astype(jnp.float32)
        u_lo = self.k(x, goal_traj[lo], lo, fb_state)
        u_hi = self.k(x, goal_traj[hi], hi, fb_state)
        return (1 - a) * u_lo + a * u_hi


class NoFeedback(FeedbackController):
    """Zero feedback (the reference instantiates controllers without
    feedback enabled by default; computeFeedback is gated on enable_feedback_)."""

    CONTROL_DIM: int = struct.field(pytree_node=False, default=0)
    STATE_DIM: int = struct.field(pytree_node=False, default=0)

    def init_feedback_state(self, num_timesteps):
        return jnp.zeros((num_timesteps, self.CONTROL_DIM, self.STATE_DIM))

    def compute_feedback(self, x0, goal_traj, control_traj):
        return self.init_feedback_state(goal_traj.shape[0])

    def k(self, x, x_goal, t, fb_state):
        return jnp.zeros((self.CONTROL_DIM,), jnp.float32)
