"""Colored (1/f^beta power-law) noise sampling distribution.

Parity target: reference
``sampling_distributions/colored_noise/colored_noise.{cuh,cu}`` — itself a
CUDA port of the Timmer & Koenig (1995) algorithm, with NumPy ground truth in
``scripts/colored_noise.py``. TPU-native rebuild: cuFFT C2R becomes
``jnp.fft.irfft`` on-device; the frequency shaping and variance
normalization are fused elementwise XLA ops.

Algorithm (colored_noise.cu:58-170 / scripts/colored_noise.py):

* oversample the horizon 2x: n = 2*T samples (generateSamples, :295);
* frequencies f_i = i/n for i in 0..n/2; clamp f < max(fmin, 1/n) to the
  first frequency above the cutoff;
* per-channel spectrum weights s_i = f_i^(-beta_c / 2);
* theoretical std sigma_c = 2*sqrt(sum_{j>=1} w_j^2)/n with the Nyquist
  weight halved for even n (colored_noise.cu:100-110);
* draw complex frequency noise with real/imag ~ N(0, s_i), zero the
  imaginary part at DC and (for even n) Nyquist (configureFrequencyNoise,
  :12-37);
* inverse real FFT; keep the first T samples; re-anchor by subtracting
  decay^t * (sample at t = offset) and normalize by sigma_c
  (rearrangeNoise, :39-56 — note numpy's irfft already divides by n, so the
  reference's /(sigma*n) becomes /sigma here);
* finally apply the Gaussian mean/sigma carve-outs (inherited
  setGaussianControls, :360+).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.sampling.gaussian import GaussianDistribution


# horizons up to this length use the exact inverse-DFT matmul instead of
# jnp.fft.irfft (basis is (T+1, T) per trig table — tiny); longer horizons
# fall back to the FFT
_DFT_MATMUL_MAX_T = 2048


def powerlaw_psd_gaussian(
    key, exponents, num_timesteps, num_samples, fmin=0.0, offset_t=0, offset_decay=0.0
):
    """Unit-variance 1/f^beta noise, shape (num_samples, T, C).

    ``exponents``: (C,) per-channel beta. Matches the reference's 2x
    oversampling + offset re-anchoring.
    """
    exponents = jnp.asarray(exponents, jnp.float32)
    C = exponents.shape[0]
    T = num_timesteps
    n = 2 * T
    F = n // 2 + 1

    f = jnp.arange(F, dtype=jnp.float32) / n
    cutoff = jnp.maximum(jnp.float32(fmin), 1.0 / n)
    # clamp sub-cutoff frequencies to the first frequency >= cutoff
    above = f >= cutoff
    first_above = jnp.min(jnp.where(above, f, jnp.inf))
    f_eff = jnp.where(f < cutoff, first_above, f)

    s = jnp.power(f_eff[None, :], -exponents[:, None] / 2.0)  # (C, F)

    # theoretical output std from the spectrum (colored_noise.cu:100-110)
    w = s[:, 1:]
    nyquist_scale = (1.0 + (n % 2)) / 2.0
    w = w.at[:, -1].multiply(nyquist_scale)
    sigma = 2.0 * jnp.sqrt(jnp.sum(w * w, axis=-1)) / n  # (C,)

    kr, ki = jax.random.split(key)
    sr = jax.random.normal(kr, (num_samples, C, F)) * s[None]
    si = jax.random.normal(ki, (num_samples, C, F)) * s[None]
    si = si.at[..., 0].set(0.0)
    if n % 2 == 0:
        si = si.at[..., -1].set(0.0)

    if T <= _DFT_MATMUL_MAX_T:
        # inverse real DFT as two MXU matmuls over only the first T outputs:
        # y[t] = (1/n)[X0 + 2 sum_f (Re cos - Im sin) + (-1)^t X_nyq].
        # XLA's TPU FFT dislikes the n = 2T (non-power-of-two) length the
        # algorithm prescribes; the (F, T) cosine/sine bases are trace-time
        # constants and the contraction is K*C x F x T — microseconds on
        # the MXU at exact f32, and it skips the T discarded oversamples.
        ang = (2.0 * jnp.pi / n) * jnp.outer(
            jnp.arange(F, dtype=jnp.float32), jnp.arange(T, dtype=jnp.float32)
        )
        scale = jnp.full((F,), 2.0 / n, jnp.float32).at[0].set(1.0 / n)
        if n % 2 == 0:
            scale = scale.at[-1].set(1.0 / n)
        basis_c = jnp.cos(ang) * scale[:, None]
        basis_s = -jnp.sin(ang) * scale[:, None]
        y = (
            jnp.einsum("kcf,ft->kct", sr, basis_c, precision="float32")
            + jnp.einsum("kcf,ft->kct", si, basis_s, precision="float32")
        )
    else:
        y = jnp.fft.irfft(sr + 1j * si, n=n, axis=-1)[..., :T]  # 1/n normed
    y = y / sigma[None, :, None]

    anchor = jax.lax.dynamic_slice_in_dim(y, offset_t, 1, axis=-1)  # (K, C, 1)
    decay = jnp.power(
        jnp.float32(offset_decay), jnp.arange(T, dtype=jnp.float32)
    )[None, None, :]
    decay = jnp.where(jnp.float32(offset_decay) == 0.0, 0.0, decay)
    out = y - anchor * decay
    return jnp.transpose(out, (0, 2, 1))  # (K, T, C)


class ColoredNoiseDistribution(GaussianDistribution):
    # (C,) per-channel power-law exponent beta (0 = white -> plain Gaussian)
    exponents: jnp.ndarray = None
    offset_decay_rate: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.97)
    )
    fmin: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(
        cls,
        exponents,
        std_dev,
        control_cost_coeff=None,
        pure_noise_percentage: float = 0.0,
        std_dev_decay: float = 1.0,
        offset_decay_rate: float = 0.97,
        fmin: float = 0.0,
    ):
        base = GaussianDistribution.create(
            std_dev,
            control_cost_coeff=control_cost_coeff,
            pure_noise_percentage=pure_noise_percentage,
            std_dev_decay=std_dev_decay,
        )
        return cls(
            **{f.name: getattr(base, f.name) for f in base.__dataclass_fields__.values()
               if f.name not in ("exponents", "offset_decay_rate", "fmin")},
            exponents=jnp.asarray(exponents, jnp.float32),
            offset_decay_rate=jnp.float32(offset_decay_rate),
            fmin=fmin,
        )

    def _draw_noise(self, key, mean, num_rollouts, optimization_stride=0):
        T, C = mean.shape
        return powerlaw_psd_gaussian(
            key,
            self.exponents,
            T,
            num_rollouts,
            fmin=self.fmin,
            offset_t=optimization_stride,
            offset_decay=self.offset_decay_rate,
        )
