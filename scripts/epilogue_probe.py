"""Same-session A/B of the round-4 fused epilogues (VERDICT r3 tasks 5+6):

* Smooth-MPPI DI K=8192 T=100 on kernel="pallas_fused": the in-kernel flash
  epilogue over W (W never touches HBM) vs the round-3 path (W emitted to
  HBM, XLA weights + weighted mean re-reading it).
* Colored+Tsallis DI K=8192 on kernel="pallas": the two-pass in-kernel
  Tsallis epilogue vs the XLA weight pass.

Both measured as closed-loop device-time slope (bench._steady_state_ms) in
ONE session, so chip-day variance cancels. The non-epilogue arm is forced
by monkeypatching the op entry to refuse `epilogue=True` /
`weight_kind="tsallis"` (the controller's documented fallback), with
`jax.clear_caches()` between arms so the solve re-traces.

Run: python scripts/epilogue_probe.py   (TPU; ~3-6 min incl. compiles)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.ops import pallas_rollout
from mppi_generic_tpu.sampling import (
    ColoredNoiseDistribution,
    SmoothMPPIDistribution,
)

X0 = jnp.array([2.0, 0.0, 0.0, 1.0])
K, T = 8192, 100


def smooth_ctrl():
    return VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=SmoothMPPIDistribution.create(
            std_dev=[1.0, 1.0], num_timesteps=T, dt=0.02),
        dt=jnp.float32(0.02), lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=T, num_rollouts=K, num_iters=1, kernel="pallas_fused",
    )


def tsallis_ctrl(weight_transform="tsallis"):
    return VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=ColoredNoiseDistribution.create(
            std_dev=[1.0, 1.0], exponents=[1.0, 2.0]),
        dt=jnp.float32(0.02), lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=T, num_rollouts=K, num_iters=1, kernel="pallas",
        weight_transform=weight_transform,
        tsallis_gamma=jnp.float32(10.0), tsallis_r=jnp.float32(2.0),
    )


def main():
    assert jax.default_backend() == "tpu", "probe needs the bench chip"
    out = {}

    # --- smooth: epilogue (auto) vs forced W-emission + XLA update ---
    out["smooth_epilogue_ms"] = bench._steady_state_ms(smooth_ctrl(), X0)
    orig_sample = pallas_rollout.fused_sample_rollout_costs

    def refuse_epilogue(*a, **kw):
        if kw.get("epilogue"):
            raise pallas_rollout.PallasIncompatible("probe: epilogue off")
        return orig_sample(*a, **kw)

    pallas_rollout.fused_sample_rollout_costs = refuse_epilogue
    jax.clear_caches()
    try:
        out["smooth_xla_update_ms"] = bench._steady_state_ms(
            smooth_ctrl(), X0)
    finally:
        pallas_rollout.fused_sample_rollout_costs = orig_sample
    out["smooth_speedup"] = (out["smooth_xla_update_ms"]
                             / out["smooth_epilogue_ms"])

    # --- tsallis: two-pass fused epilogue vs XLA weight pass ---
    jax.clear_caches()
    out["tsallis_epilogue_ms"] = bench._steady_state_ms(tsallis_ctrl(), X0)
    orig_weighted = pallas_rollout.fused_weighted_rollout

    def refuse_tsallis(*a, **kw):
        if kw.get("weight_kind") == "tsallis":
            raise pallas_rollout.PallasIncompatible("probe: tsallis off")
        return orig_weighted(*a, **kw)

    pallas_rollout.fused_weighted_rollout = refuse_tsallis
    jax.clear_caches()
    try:
        out["tsallis_xla_weights_ms"] = bench._steady_state_ms(
            tsallis_ctrl(), X0)
    finally:
        pallas_rollout.fused_weighted_rollout = orig_weighted
    out["tsallis_speedup"] = (out["tsallis_xla_weights_ms"]
                              / out["tsallis_epilogue_ms"])
    # context: the exp-weights fused epilogue on the same colored config
    jax.clear_caches()
    out["colored_exp_epilogue_ms"] = bench._steady_state_ms(
        tsallis_ctrl(weight_transform="exp"), X0)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
