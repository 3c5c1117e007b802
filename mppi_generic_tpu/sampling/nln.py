"""NLN (normal x log-normal) sampling distribution — log-MPPI.

Parity target: reference ``sampling_distributions/nln/nln.{cuh,cu}``
(itself based on IhabMohamed/log-MPPI_ros). generateSamples (nln.cu:106-160):

* per channel c, draw LogNormal(0, sigma_c) noise (curandGenerateLogNormal
  with mean 0, std sigma_c, i.e. exp(N(0, sigma_c)));
* draw standard normal noise;
* epsilon = normal * lognormal (createNLNNoise, nln.cu:12-24);
* then the inherited Gaussian carve-out pass writes mean + sigma * epsilon.

The heavier-than-Gaussian tails concentrate exploration without widening the
core of the distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mppi_generic_tpu.sampling.gaussian import GaussianDistribution


class NLNDistribution(GaussianDistribution):
    def _draw_noise(self, key, mean, num_rollouts, optimization_stride=0):
        T, C = mean.shape
        kn, kl = jax.random.split(key)
        normal = jax.random.normal(kn, (num_rollouts, T, C), dtype=mean.dtype)
        # LogNormal(mu=0, sigma=std_dev_c): exp(sigma_c * N(0,1))
        sigma = self.std_dev
        log_normal = jnp.exp(
            sigma * jax.random.normal(kl, (num_rollouts, T, C), dtype=mean.dtype)
        )
        return normal * log_normal
