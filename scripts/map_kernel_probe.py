"""A/B probe: XLA ``combined`` scan vs XLA ``split`` (dynamics scan +
time-parallel cost) for the map-bearing BASELINE configs, which cannot take
the fused Pallas paths (no per-lane vector gather on TPU — the texture
lookups stay in XLA, see docs/design.md).

The split path's win on these configs comes from the leaner dynamics-only
scan carry (the crash status keeps the cost pass a per-sample scan). A
fully-batched cost pass (dual evaluation at crash=0/1 over all K*T points
+ cummax prefix, ``trajectory_state_costs(batched_crash=True)``) was
measured in round 4 and is SLOWER on every config here — XLA materializes
the (K*T, W) one-hot interpolation matrices in HBM (autorally 1.42 ms vs
1.33 combined / 1.24 split-scan; bicycle 1.20 vs 1.10; racer-elevation
2.55 vs 2.49). Measured with the same two-length closed-loop scan slope
bench.py uses.

Usage (TPU):  timeout 1500 python scripts/map_kernel_probe.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax.numpy as jnp
import numpy as np

import bench
from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import ARStandardCost
from mppi_generic_tpu.maps.texture import MapTexture2D
from mppi_generic_tpu.models import (
    AutorallyNNDynamics,
    BicycleSlipDynamics,
    RacerDubinsElevationLSTMSteering,
)
from mppi_generic_tpu.sampling import (
    ColoredNoiseDistribution,
    GaussianDistribution,
)

import jax


def configs():
    tex = MapTexture2D.create(
        np.abs(np.random.default_rng(0).normal(size=(128, 128))).astype("f"),
        origin=(-64, -64, 0), resolution=1.0,
    )
    elev = MapTexture2D.create(
        (0.1 * np.random.default_rng(1).normal(size=(128, 128))).astype("f"),
        origin=(-64, -64, 0), resolution=1.0,
    )
    common = dict(dt=jnp.float32(0.02), lam=jnp.float32(1.0),
                  alpha=jnp.float32(0.0), num_iters=1)
    yield ("autorally_nn_K1920_T150", dict(
        dynamics=AutorallyNNDynamics.create(key=jax.random.PRNGKey(0)),
        cost=ARStandardCost(costmap=tex),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        num_timesteps=150, num_rollouts=1920, **common,
    ), jnp.zeros(7).at[4].set(3.0))
    yield ("bicycle_slip_colored_trackmap", dict(
        dynamics=BicycleSlipDynamics.create(),
        cost=ARStandardCost(costmap=tex, output_indices=(0, 1, 2, 8, 5, 6)),
        sampler=ColoredNoiseDistribution.create(
            std_dev=[0.3, 0.5], exponents=[1.0, 1.0]),
        num_timesteps=100, num_rollouts=1920, **common,
    ), jnp.zeros(10))
    yield ("racer_lstm_steering_elevation_K1920", dict(
        dynamics=RacerDubinsElevationLSTMSteering.create(elevation_map=elev),
        cost=ARStandardCost(costmap=tex, output_indices=(2, 3, 5, 6, 0, 1)),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        num_timesteps=100, num_rollouts=1920, **common,
    ), jnp.zeros(9).at[0].set(3.0))
    from mppi_generic_tpu.models import RacerDubinsElevationLSTMUncertainty

    yield ("racer_lstm_unc_flat_K1920", dict(
        dynamics=RacerDubinsElevationLSTMUncertainty.create(),
        cost=ARStandardCost(output_indices=(2, 3, 5, 6, 0, 1)),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        num_timesteps=150, num_rollouts=1920, **common,
    ), jnp.zeros(26).at[0].set(3.0))


def main():
    for name, kw, x0 in configs():
        row = {"config": name}
        for kernel in ("combined", "split", "pallas", "pallas_fused"):
            ctrl = VanillaMPPI(kernel=kernel, **kw)
            try:
                row[kernel + "_ms"] = bench._steady_state_ms(ctrl, x0)
            except Exception as e:  # a variant may decline a model/cost
                row[kernel + "_error"] = f"{type(e).__name__}: {e}"[:200]
        base = row.get("combined_ms")
        for kernel in ("split", "pallas", "pallas_fused"):
            if base and row.get(kernel + "_ms"):
                row["speedup_" + kernel] = base / row[kernel + "_ms"]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
