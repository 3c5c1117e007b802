"""Piecewise-linear control sampling (motion primitives).

Parity target: reference
``sampling_distributions/piecewise_linear/piecewise_linear_noise.cuh``
(createPiecewiseLinearNoise:14-120), used by the Primitives controller:

* each (sample, channel) draws `num_segments` switch times (uniform in
  normalized time, sorted) and switch values (uniform over the per-channel
  control range scaled by ``scale_piecewise_noise``);
* the control trajectory is the piecewise-linear interpolation through those
  switch points; the value at t < optimization_stride is pinned to the
  nominal control (frozen head);
* carve-outs: sample 0 = zero controls, sample 1 = nominal mean; a leading
  ``frac_add_nominal`` fraction of samples is nominal + scaled Gaussian
  noise instead of piecewise noise.

Static-shape TPU design: instead of the reference's data-dependent segment
search loop, every timestep interpolates against all knots with masked
min/max reductions (vector ops over a (segments,) axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.sampling.gaussian import GaussianDistribution


class PiecewiseLinearDistribution(GaussianDistribution):
    num_segments: int = struct.field(pytree_node=False, default=10)
    scale_piecewise_noise: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1.0)
    )
    frac_add_nominal: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    scale_add_nominal_noise: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1.0)
    )
    # (C, 2) control range the switch values are drawn from
    control_ranges: jnp.ndarray = None

    @classmethod
    def create(
        cls,
        std_dev,
        control_ranges,
        num_segments: int = 10,
        scale_piecewise_noise: float = 1.0,
        frac_add_nominal: float = 0.0,
        scale_add_nominal_noise: float = 1.0,
        **kw,
    ):
        base = GaussianDistribution.create(std_dev, **kw)
        return cls(
            **{f: getattr(base, f) for f in base.__dataclass_fields__},
            num_segments=num_segments,
            scale_piecewise_noise=jnp.float32(scale_piecewise_noise),
            frac_add_nominal=jnp.float32(frac_add_nominal),
            scale_add_nominal_noise=jnp.float32(scale_add_nominal_noise),
            control_ranges=jnp.asarray(control_ranges, jnp.float32),
        )

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
        T, C = mean.shape
        K = num_rollouts
        S = self.num_segments
        k_times, k_vals, k_gauss = jax.random.split(key, 3)

        # knots: times in (0,1) sorted per (sample, channel); endpoint knots
        # pinned at t=0 (nominal at the stride point) and t=1.
        times = jnp.sort(jax.random.uniform(k_times, (K, C, S)), axis=-1)
        lo = self.control_ranges[:, 0][None, :, None]
        hi = self.control_ranges[:, 1][None, :, None]
        center = 0.5 * (lo + hi)
        half = 0.5 * (hi - lo) * self.scale_piecewise_noise
        vals = center + half * jax.random.uniform(
            k_vals, (K, C, S + 2), minval=-1.0, maxval=1.0
        )

        knot_t = jnp.concatenate(
            [jnp.zeros((K, C, 1)), times, jnp.ones((K, C, 1))], axis=-1
        )  # (K, C, S+2)
        # anchor the first knot at the frozen-head nominal control
        stride_idx = jnp.clip(optimization_stride, 0, T - 1)
        anchor = jnp.transpose(mean, (1, 0))[None, :, :]  # (1, C, T)
        anchor_val = jnp.take_along_axis(
            jnp.broadcast_to(anchor, (K, C, T)),
            jnp.full((K, C, 1), stride_idx),
            axis=-1,
        )
        knot_v = vals.at[..., 0:1].set(anchor_val)

        # piecewise-linear interpolation of every timestep against the knots
        t_frac = (jnp.arange(T, dtype=jnp.float32) / T)[None, None, :, None]
        kt = knot_t[:, :, None, :]  # (K, C, 1, S+2)
        kv = knot_v[:, :, None, :]
        is_left = kt <= t_frac
        left_t = jnp.max(jnp.where(is_left, kt, -jnp.inf), axis=-1)
        right_t = jnp.min(jnp.where(~is_left, kt, jnp.inf), axis=-1)
        left_v = jnp.max(
            jnp.where(
                kt == left_t[..., None], kv, -jnp.inf
            ),
            axis=-1,
        )
        right_v = jnp.max(
            jnp.where(kt == right_t[..., None], kv, -jnp.inf), axis=-1
        )
        right_t_safe = jnp.where(jnp.isinf(right_t), left_t + 1.0, right_t)
        right_v = jnp.where(jnp.isinf(right_v), left_v, right_v)
        alpha = jnp.clip(
            (t_frac[..., 0] - left_t) / jnp.maximum(right_t_safe - left_t, 1e-6),
            0.0,
            1.0,
        )
        pw = left_v + alpha * (right_v - left_v)  # (K, C, T)
        pw = jnp.transpose(pw, (0, 2, 1))  # (K, T, C)

        # carve-outs (piecewise_linear_noise.cuh:31-44 + zero-sample-0)
        gauss = self._sigma(T, iteration)[None] * jax.random.normal(
            k_gauss, (K, T, C)
        )
        nominal_plus_noise = mean[None] + self.scale_add_nominal_noise * gauss
        k_idx = jnp.arange(K, dtype=jnp.float32)[:, None, None]
        U = jnp.where(k_idx < self.frac_add_nominal * K, nominal_plus_noise, pw)
        U = jnp.where(k_idx == 1, mean[None], U)
        U = jnp.where(k_idx == 0, jnp.zeros_like(mean)[None], U)
        # frozen head
        t_idx = jnp.arange(T)[None, :, None]
        U = jnp.where(t_idx < optimization_stride, mean[None], U)
        return U, None
