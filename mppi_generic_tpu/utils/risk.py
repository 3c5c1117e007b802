"""Risk measures over per-sample cost arrays.

TPU-native equivalent of the reference's ``utils/risk_utils.cuh`` (CVaR / VaR
/ max / min / mean / median reductions used for risk-aware cost shaping).
All functions take a 1-D (or batched, via the leading axes) cost array and are
jit-safe (sorting-based quantiles with static shapes).
"""

from __future__ import annotations

import jax.numpy as jnp


def var(costs, alpha, axis=-1):
    """Value-at-risk: the alpha-quantile of the cost distribution."""
    return jnp.quantile(costs, alpha, axis=axis)


def cvar(costs, alpha, axis=-1):
    """Conditional value-at-risk: mean of costs above the alpha-quantile.

    Matches the standard CVaR_alpha = E[J | J >= VaR_alpha] estimator the
    reference computes over sampled rollout costs (risk_utils.cuh:5-40).
    """
    v = jnp.expand_dims(var(costs, alpha, axis=axis), axis)
    mask = costs >= v
    weight = mask.astype(costs.dtype)
    denom = jnp.maximum(jnp.sum(weight, axis=axis), 1.0)
    return jnp.sum(costs * weight, axis=axis) / denom


def risk_measure(costs, kind: str = "mean", alpha: float = 0.9, axis=-1):
    """Dispatch over the reference's RiskMeasure enum: mean/median/min/max/var/cvar."""
    kind = kind.lower()
    if kind == "mean":
        return jnp.mean(costs, axis=axis)
    if kind == "median":
        return jnp.median(costs, axis=axis)
    if kind == "min":
        return jnp.min(costs, axis=axis)
    if kind == "max":
        return jnp.max(costs, axis=axis)
    if kind == "var":
        return var(costs, alpha, axis=axis)
    if kind == "cvar":
        return cvar(costs, alpha, axis=axis)
    raise ValueError(f"unknown risk measure: {kind}")
