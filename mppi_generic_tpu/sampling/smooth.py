"""Smooth-MPPI sampling distribution (derivative-space exploration).

Parity target: reference ``sampling_distributions/smooth-MPPI/smooth-MPPI.{cuh,cu}``:

* keeps a separate *action-derivative* mean sequence w(t) alongside the
  control mean (``deriv_action_mean_d_``);
* samples W_k = w + sigma*eps with the usual Gaussian carve-outs (sigma is
  in derivative units);
* control sample u_k[t] = u_mean[t] + W_k[t] * dt_smooth (integrateNoise,
  smooth-MPPI.cu:16-32);
* the MPPI update runs the weighted reduction over the *derivative* samples
  (w <- sum_k (omega_k/eta) W_k) and then sets
  u_mean <- u_mean + w*dt_smooth (updateDistributionParamsFromDevice,
  smooth-MPPI.cu:203-236);
* sliding the sequence shifts the derivative mean too.

The derivative mean is the distribution's internal ``state`` pytree.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.sampling.gaussian import GaussianDistribution
from mppi_generic_tpu.utils.math_utils import slide_control_sequence


class SmoothMPPIDistribution(GaussianDistribution):
    # derivative-integration step (SmoothMPPIParamsImpl::dt, default 0.015)
    dt_smooth: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.015))
    num_timesteps: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, std_dev, num_timesteps, dt=0.015, **kw):
        base = GaussianDistribution.create(std_dev, **kw)
        return cls(
            **{f: getattr(base, f) for f in base.__dataclass_fields__},
            dt_smooth=jnp.float32(dt),
            num_timesteps=num_timesteps,
        )

    def init_state(self):
        return jnp.zeros((self.num_timesteps, self.CONTROL_DIM), jnp.float32)

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
        deriv_mean = state
        W = super()._apply_carveouts(
            self._draw_noise(key, deriv_mean, num_rollouts, optimization_stride),
            deriv_mean,
            num_rollouts,
            iteration,
            optimization_stride,
        )
        U = mean[None] + W * self.dt_smooth
        return U, W

    def update_mean(self, U, aux, weights, normalizer, mean, state=None):
        W = aux
        w_norm = (weights / normalizer)[:, None, None]
        new_deriv_mean = jnp.sum(w_norm * W, axis=0)
        new_mean = mean + new_deriv_mean * self.dt_smooth
        return new_mean, new_deriv_mean

    def shift(self, mean, stride, slide_scale=None, state=None):
        new_mean = slide_control_sequence(mean, stride, slide_scale)
        new_state = slide_control_sequence(state, stride, slide_scale)
        return new_mean, new_state
