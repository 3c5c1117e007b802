"""A/B probe: XLA paths vs the in-kernel HBM-WINDOWED map query at
realistic map scale (round-5 VERDICT tasks 1-2).

Round 4 measured every map-tier win on 128^2 maps, where the whole map is
VMEM-resident and the tent-mask costs ~1 ns/point. This probe runs the
map-bearing BASELINE configs at the reference's real data-plane scale —
>=512 texels/side, including the float4-layout (4-channel, channel-0-read)
costmap of ar_standard_cost.cu:50-56,115-128 — where the in-kernel query
rides the windowed path (maps/texture._WindowedMapData: HBM-resident map,
lazily re-fetched (256, 256) VMEM window, tent-mask inside the window;
~4 ns/point CONSTANT in map size, scripts/map_size_sweep.py).

Timing: the same two-length closed-loop scan slope bench.py uses
(device time; relay dispatch drops out).

Usage (TPU):  timeout 2400 python scripts/large_map_probe.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
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


def _track(side, seed=0):
    rng = np.random.default_rng(seed)
    return MapTexture2D.create(
        np.abs(rng.normal(size=(side, side))).astype("f"),
        origin=(-side * 0.05, -side * 0.05, 0), resolution=0.1,
    )


def _track4(side, seed=1):
    """float4-layout costmap (channel-major band; channel 0 = track)."""
    rng = np.random.default_rng(seed)
    chw = rng.normal(size=(4, side, side)).astype("f")
    chw[0] = np.abs(chw[0])
    return MapTexture2D.create(
        chw, origin=(-side * 0.05, -side * 0.05, 0), resolution=0.1,
        channel_major=True,
    )


def _elev(side, seed=2):
    rng = np.random.default_rng(seed)
    return MapTexture2D.create(
        (0.1 * rng.normal(size=(side, side))).astype("f"),
        origin=(-side * 0.05, -side * 0.05, 0), resolution=0.1,
    )


def configs():
    common = dict(dt=jnp.float32(0.02), lam=jnp.float32(1.0),
                  alpha=jnp.float32(0.0), num_iters=1)
    yield ("bicycle_slip_colored_trackmap_1024", dict(
        dynamics=BicycleSlipDynamics.create(),
        cost=ARStandardCost(costmap=_track(1024),
                            output_indices=(0, 1, 2, 8, 5, 6)),
        sampler=ColoredNoiseDistribution.create(
            std_dev=[0.3, 0.5], exponents=[1.0, 1.0]),
        num_timesteps=100, num_rollouts=1920, **common,
    ), jnp.zeros(10))
    yield ("autorally_nn_float4_track_1024", dict(
        dynamics=AutorallyNNDynamics.create(key=jax.random.PRNGKey(0)),
        cost=ARStandardCost(costmap=_track4(1024)),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        num_timesteps=150, num_rollouts=1920, **common,
    ), jnp.zeros(7).at[4].set(3.0))
    yield ("racer_lstm_steering_elevation_512", dict(
        dynamics=RacerDubinsElevationLSTMSteering.create(
            elevation_map=_elev(512)),
        cost=ARStandardCost(costmap=_track(512, seed=3),
                            output_indices=(2, 3, 5, 6, 0, 1)),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        num_timesteps=100, num_rollouts=1920, **common,
    ), jnp.zeros(9).at[0].set(3.0))
    yield ("racer_lstm_steering_elevation_2048track", dict(
        dynamics=RacerDubinsElevationLSTMSteering.create(
            elevation_map=_elev(1024, seed=4)),
        cost=ARStandardCost(costmap=_track(2048, seed=5),
                            output_indices=(2, 3, 5, 6, 0, 1)),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        num_timesteps=100, num_rollouts=1920, **common,
    ), jnp.zeros(9).at[0].set(3.0))


def main():
    for name, kw, x0 in configs():
        row = {"config": name}
        for kernel in ("combined", "pallas", "pallas_fused"):
            ctrl = VanillaMPPI(kernel=kernel, **kw)
            try:
                row[kernel + "_ms"] = round(
                    bench._steady_state_ms(ctrl, x0), 4)
            except Exception as e:
                row[kernel + "_error"] = f"{type(e).__name__}: {e}"[:200]
        base = row.get("combined_ms")
        for kernel in ("pallas", "pallas_fused"):
            if base and row.get(kernel + "_ms"):
                row["speedup_" + kernel] = round(
                    base / row[kernel + "_ms"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on a TPU backend"
    main()
