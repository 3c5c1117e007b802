"""Pluggable weight-shaping functions — parity with the reference's
``shaping_functions/`` layer (shaping_function.cuh:9-74), the decoupled
refactor of the normExp transform. Each shaping function is a pytree with
``compute_weights(costs, baseline) -> weights``; risk-measure shaping (CVaR
etc., utils/risk_utils.cuh) composes upstream via ``utils.risk``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.ops import weights as weight_ops


class ShapingFunction(struct.PyTreeNode):
    """Base: exponentiated-utility weights (normExpTransform,
    core/mppi_common.cu:686-708)."""

    lam: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))

    def compute_weights(self, costs, baseline=None):
        if baseline is None:
            baseline = weight_ops.baseline_cost(costs)
        return weight_ops.norm_exp_weights(costs, self.lam, baseline)


NormExpShapingFunction = ShapingFunction


class TsallisShapingFunction(struct.PyTreeNode):
    """Tsallis-divergence weights (TsallisTransform, mppi_common.cu:958-985):
    w = (1 - ΔJ/γ)_+^{1/(r-1)}."""

    gamma: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(10.0))
    r: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.0))

    def compute_weights(self, costs, baseline=None):
        if baseline is None:
            baseline = weight_ops.baseline_cost(costs)
        return weight_ops.tsallis_weights(costs, self.gamma, self.r, baseline)


class CEMShapingFunction(struct.PyTreeNode):
    """Cross-entropy-method elite weights (CEM/cem_shaping_function.cuh:8-41):
    1 for the elite fraction of samples, 0 otherwise."""

    elite_fraction: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.1)
    )

    def compute_weights(self, costs, baseline=None):
        del baseline
        return weight_ops.cem_weights(costs, self.elite_fraction)


__all__ = [
    "ShapingFunction",
    "NormExpShapingFunction",
    "TsallisShapingFunction",
    "CEMShapingFunction",
]
