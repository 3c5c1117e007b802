"""Weight transforms + free-energy statistics.

TPU-native analogs of the reference's normExp/Tsallis kernels and host
reductions (core/mppi_common.cu:686-708, 858-899, 958-985, 1055-1081). On
TPU these are single fused elementwise+reduction XLA ops; under a sharded
sample axis the min/sum reductions become psum/pmin collectives
automatically.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


def baseline_cost(costs):
    """min over samples (computeBaselineCost, mppi_common.cu:858-862)."""
    return jnp.min(costs, axis=-1)


def norm_exp_weights(costs, lam, baseline):
    """w_i = exp(-(J_i - baseline) / lambda) (normExpTransform,
    mppi_common.cu:958-967)."""
    return jnp.exp(-(costs - baseline) / lam)


def tsallis_weights(costs, gamma, r, baseline):
    """Tsallis-divergence weights (TsallisTransform, mppi_common.cu:969-985):
    w_i = (1 - dJ/gamma)^(1/(r-1)) for dJ < gamma else 0."""
    dj = costs - baseline
    inside = dj < gamma
    base = jnp.clip(1.0 - dj / gamma, 1e-30, None)
    w = jnp.exp(jnp.log(base) / (r - 1.0))
    return jnp.where(inside, w, 0.0)


def cem_weights(costs, elite_fraction):
    """Cross-entropy-method elite weights (shaping_functions/CEM,
    cem_shaping_function.cuh:8-41): weight 1 for the elite fraction with the
    lowest cost, 0 otherwise. Static-shape implementation via the elite
    cost threshold (order statistics), not argsort-scatter."""
    K = costs.shape[-1]
    n_elite = jnp.maximum(jnp.floor(elite_fraction * K), 1.0).astype(jnp.int32)
    # threshold = n_elite-th smallest cost
    sorted_costs = jnp.sort(costs, axis=-1)
    thresh = jnp.take(sorted_costs, n_elite - 1, axis=-1)
    return (costs <= thresh[..., None]).astype(costs.dtype)


def normalizer(weights):
    """eta = sum_i w_i (computeNormalizer, mppi_common.cu)."""
    return jnp.sum(weights, axis=-1)


class FreeEnergyStats(struct.PyTreeNode):
    """MPPIFreeEnergyStatistics (controller.cuh:22-38) for one system."""

    free_energy_mean: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0))
    free_energy_variance: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0))
    free_energy_modified_variance: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0)
    )
    baseline: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0))
    normalizer_percent: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0))
    previous_baseline: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0))
    increase: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0))


def compute_free_energy(weights, baseline, lam):
    """computeFreeEnergy (mppi_common.cu:1065-1081) over the *transformed*
    weights array: F = -lambda*log(mean(w)) + baseline, plus variance terms."""
    K = weights.shape[-1]
    norm = jnp.mean(weights, axis=-1)
    var = jnp.mean(weights * weights, axis=-1)
    fe_mean = -lam * jnp.log(norm) + baseline
    fe_var = lam * (var - norm * norm)
    weird = fe_var / (norm * jnp.sqrt(1.0 * K))
    fe_mod = lam * (weird + 0.5 * weird * weird)
    return fe_mean, fe_var, fe_mod
