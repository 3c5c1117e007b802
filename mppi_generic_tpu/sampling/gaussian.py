"""Gaussian sampling distribution.

Parity target: reference ``sampling_distributions/gaussian/gaussian.{cuh,cu}``.
Semantics reproduced exactly (gaussian.cu setGaussianControls:17-130):

* sample k=0, and every sample at t < optimization_stride, is the pure mean;
* the last ``pure_noise_percentage`` fraction of samples is zero-mean sigma*eps;
* everything else is mean + sigma*eps;
* sigma is scaled by ``std_dev_decay ** iteration`` each optimization
  iteration (gaussian.cu:423);
* optional time-specific sigma of shape (T, C) (gaussian.cuh:66-97);
* likelihood-ratio cost 0.5*lambda*(1-alpha) * sum_i c_i mu_i (mu_i - 2 u_i) / sigma_i^2
  with mu = 0 for pure-noise samples (gaussian.cu:481-568);
* feedback cost 0.5*lambda*(1-alpha) * sum_i c_i u_fb_i^2 / sigma_i^2
  (gaussian.cu:572-629).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.sampling.base import SamplingDistribution


class GaussianDistribution(SamplingDistribution):
    # (C,) or (T, C) when time_specific_std_dev
    std_dev: jnp.ndarray = None
    control_cost_coeff: jnp.ndarray = None
    pure_noise_percentage: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    std_dev_decay: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    time_specific_std_dev: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        std_dev,
        control_cost_coeff=None,
        pure_noise_percentage: float = 0.0,
        std_dev_decay: float = 1.0,
    ):
        std_dev = jnp.asarray(std_dev, jnp.float32)
        time_specific = std_dev.ndim == 2
        C = std_dev.shape[-1]
        if control_cost_coeff is None:
            control_cost_coeff = jnp.ones((C,), jnp.float32)
        return cls(
            CONTROL_DIM=C,
            std_dev=std_dev,
            control_cost_coeff=jnp.asarray(control_cost_coeff, jnp.float32),
            pure_noise_percentage=jnp.float32(pure_noise_percentage),
            std_dev_decay=jnp.float32(std_dev_decay),
            time_specific_std_dev=time_specific,
        )

    # ------------------------------------------------------------------
    def _sigma(self, T, iteration):
        sigma = self.std_dev
        if not self.time_specific_std_dev:
            sigma = jnp.broadcast_to(sigma[None, :], (T, sigma.shape[-1]))
        decay = jnp.power(self.std_dev_decay, jnp.asarray(iteration, jnp.float32))
        return sigma * decay

    def _pure_noise_mask(self, num_rollouts):
        """(K,) bool: True for the trailing pure-noise carve-out samples."""
        k = jnp.arange(num_rollouts)
        threshold = (1.0 - self.pure_noise_percentage) * num_rollouts
        return k.astype(jnp.float32) >= threshold

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
        del state
        eps = self._draw_noise(key, mean, num_rollouts, optimization_stride)
        return self._apply_carveouts(
            eps, mean, num_rollouts, iteration, optimization_stride
        ), None

    def _draw_noise(self, key, mean, num_rollouts, optimization_stride=0):
        T, C = mean.shape
        return jax.random.normal(key, (num_rollouts, T, C), dtype=mean.dtype)

    def _apply_carveouts(self, eps, mean, num_rollouts, iteration, optimization_stride):
        """setGaussianControls semantics (gaussian.cu:101-121): scale noise by
        (decayed) sigma, add the mean except for the pure-noise tail, and pin
        sample 0 + the frozen head to the mean."""
        K = num_rollouts
        T, C = mean.shape
        sigma = self._sigma(T, iteration)[None]  # (1, T, C)
        noise = sigma * eps

        pure = self._pure_noise_mask(K)[:, None, None]  # (K,1,1)
        U = jnp.where(pure, noise, mean[None] + noise)
        # sample 0 and the frozen head (t < optimization_stride) are pure mean
        k_idx = jnp.arange(K)[:, None, None]
        t_idx = jnp.arange(T)[None, :, None]
        mean_mask = (k_idx == 0) | (t_idx < optimization_stride)
        return jnp.where(mean_mask, mean[None], U)

    def likelihood_ratio_cost(self, U, mean, lam, alpha, num_rollouts=None,
                              iteration=0):
        K, T, C = U.shape
        # the samples at optimization iteration i were drawn with the
        # decayed sigma — the LR term must divide by the same value
        # (the reference decays std_dev_ in place, gaussian.cu:423)
        sigma = self._sigma(T, iteration)[None]
        mu = jnp.broadcast_to(mean[None], U.shape)
        mu = jnp.where(self._pure_noise_mask(K)[:, None, None], 0.0, mu)
        coeff = self.control_cost_coeff[None, None, :]
        per_elem = coeff * mu * (mu - 2.0 * U) / (sigma * sigma)
        return 0.5 * lam * (1.0 - alpha) * jnp.sum(per_elem, axis=(1, 2))

    def likelihood_ratio_cost_step(self, u, mean_t, t, sample_is_pure_noise, lam, alpha):
        """Single (u_t, t) variant for fused in-scan accumulation."""
        sigma = self.std_dev[t] if self.time_specific_std_dev else self.std_dev
        sigma = self._bcast_like(sigma, u)
        coeff = self._bcast_like(self.control_cost_coeff, u)
        mu = jnp.where(sample_is_pure_noise, jnp.zeros_like(mean_t), mean_t)
        per_elem = coeff * mu * (mu - 2.0 * u) / (sigma * sigma)
        return 0.5 * lam * (1.0 - alpha) * jnp.sum(per_elem, axis=0)

    def feedback_cost_step(self, u_fb, t, lam, alpha):
        """Per-step feedback cost with the step's own sigma (the (T, C)
        variant of feedback_cost; RMPPI accumulates this inside its rollout,
        gaussian.cu:572-629)."""
        sigma = self.std_dev[t] if self.time_specific_std_dev else self.std_dev
        sigma = self._bcast_like(sigma, u_fb)
        coeff = self._bcast_like(self.control_cost_coeff, u_fb)
        per_elem = coeff * u_fb * u_fb / (sigma * sigma)
        return 0.5 * lam * (1.0 - alpha) * jnp.sum(per_elem, axis=0)

    def feedback_cost(self, u_fb, lam, alpha):
        T = u_fb.shape[-2]
        sigma = self._sigma(T, 0)
        coeff = self.control_cost_coeff
        per_elem = coeff * u_fb * u_fb / (sigma * sigma)
        return 0.5 * lam * (1.0 - alpha) * jnp.sum(per_elem, axis=(-1, -2))

    @staticmethod
    def _bcast_like(param, like):
        extra = like.ndim - 1
        return param.reshape(param.shape + (1,) * extra)
