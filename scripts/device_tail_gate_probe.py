"""Demonstrate the device-attributed tail gate's sensitivity AND its
relay-storm immunity (round-5 VERDICT task 7 "done when").

The mission smoke's wall-clock gate grants ~8x RTT headroom for relay
spike storms, so a sub-8x CONTROLLER regression hides inside it. The
plant's periodic device probes (``BasePlant._device_probe``: two-length
chained-solve slope, median of 5) are relay-immune; the gate over them
is ``runtime.plant.device_tail_gate`` (max probe < 2.5x the low-quartile
anchor). Two runs prove both directions:

A. injected 3x+ DEVICE slowdown: mid-run the controller hot-swaps to 4x
   the rollouts (a genuine device-side change — the kind of regression
   the wall gate cannot see through relay noise). The device gate MUST
   fail.
B. simulated relay storm: a background scheduler marks 400 ms storm
   windows every ~2.5 s; every device->host fetch issued inside a window
   sleeps an extra 150 ms (the observed relay-spike signature — bursty,
   common-mode). The device gate MUST hold: a burst inflates both chain
   timings of a probe (the slope's common mode cancels) or corrupts at
   most one of its 3 medianed deltas.

Usage (TPU): timeout 1800 python scripts/device_tail_gate_probe.py
"""

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.runtime.plant import BasePlant
from mppi_generic_tpu.sampling import GaussianDistribution

K0, T0 = 4096, 64


class _Plant(BasePlant):
    def pub_control(self, u):
        pass


def _controller(K):
    return VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        dt=jnp.float32(0.02), lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=T0, num_rollouts=K, num_iters=1,
        kernel="pallas_fused",
    )


def run(label, swap_at=None, storm=False, iters=200, probe_every=20):
    ctrl = _controller(K0)
    cs = ctrl.init_state(jax.random.key(0, impl="rbg"))
    # chain 256: the DI solve is ~35 us device, so the probe needs
    # n*35us >> the relay's few-ms jitter (the first probe escalates
    # further if needed)
    plant = _Plant(ctrl, cs, hz=1000.0, device_probe_every=probe_every,
                   device_probe_chain=256)
    x = np.array([2.0, 0.0, 0.0, 1.0], np.float32)

    # warm the solve programs + the probe chains outside the measured run
    plant.update_state(x, 0.02)
    assert plant.run_control_iteration(timeout=120.0)
    plant.update_state(x, 0.04)
    assert plant.run_control_iteration(timeout=120.0)
    plant._device_probe(jnp.asarray(x))
    if swap_at is not None:
        # pre-warm the big controller's programs THROUGH THIS PLANT (its
        # _solve_fn is a per-plant jit closure), so the swap itself (a
        # compile) does not blur which samples are pre/post
        plant.controller = _controller(4 * K0)
        plant.update_state(x, 0.06)
        assert plant.run_control_iteration(timeout=300.0)
        plant.update_state(x, 0.08)
        assert plant.run_control_iteration(timeout=300.0)
        plant._device_probe(jnp.asarray(x))  # warm big probe chains
        plant.controller = ctrl
    plant.reset_timing()

    stop = threading.Event()
    in_storm = threading.Event()
    if storm:
        real_get = jax.device_get

        def stormy_get(tree):
            if in_storm.is_set():
                time.sleep(0.15)
            return real_get(tree)

        jax.device_get = stormy_get

        def scheduler():
            while not stop.is_set():
                time.sleep(2.5)
                in_storm.set()
                time.sleep(0.4)
                in_storm.clear()

        threading.Thread(target=scheduler, daemon=True).start()

    try:
        for i in range(iters):
            plant.update_state(x, 0.02 * (i + 3))
            plant.run_control_iteration(timeout=10.0)
            if swap_at is not None and i == swap_at:
                plant.controller = plant.controller.replace(
                    num_rollouts=4 * K0)
    finally:
        stop.set()
        if storm:
            jax.device_get = real_get

    from mppi_generic_tpu.runtime.plant import device_tail_gate

    dev = plant.stats.samples("avg_device_solve_ms")
    gate_ok, anchor, mx = device_tail_gate(dev)
    wall = plant.stats.tail("avg_optimize_ms")
    row = {
        "run": label, "device_probes": int(dev.size),
        "device_anchor_ms": round(anchor, 4),
        "device_p50_ms": round(float(np.median(dev)), 4),
        "device_max_ms": round(mx, 4),
        "device_gate_ok": gate_ok,
        "wall_p50_ms": round(wall["p50"], 2),
        "wall_p99_ms": round(wall["p99"], 2),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    a = run("injected_3x_device_slowdown", swap_at=100)
    b = run("simulated_relay_storm", storm=True)
    assert not a["device_gate_ok"], (
        "the device gate FAILED to catch a genuine 4x device slowdown", a
    )
    assert b["device_gate_ok"], (
        "the device gate false-alarmed on a relay storm", b
    )
    print(json.dumps({
        "verdict": "device tail gate catches device slowdowns and "
                   "ignores relay storms", "slowdown_run": a, "storm_run": b,
    }))


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on a TPU backend"
    main()
