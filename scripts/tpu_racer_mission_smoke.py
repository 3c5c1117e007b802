"""Live RACER mission smoke — the hardest integration path as ONE closed
loop (VERDICT r2 item 5): BufferedPlant sensor buffer -> LSTM-LSTM
warm-start -> elevation + track maps -> colored-noise solve -> native
actuation publisher, with a 50 Hz estimator thread feeding states while
the solver loop runs.

Pieces under test together (each is unit-tested alone elsewhere):

* ``RacerDubinsElevationLSTMSteering`` with an ``LSTMLSTM`` init network —
  the plant's ``_buffer_hook`` must resample the sensor buffer to fixed dt
  and warm-start the rollout LSTM's (h0, c0) every solve (reference hook
  ``base_plant.hpp:477-482`` + ``buffered_plant.hpp:11-84`` +
  ``lstm_lstm_helper.cuh``);
* ``ARStandardCost`` with a straight-corridor track texture and the
  elevation ramp map on the dynamics (texture_helper pipeline);
* ``ColoredNoiseDistribution`` sampling inside the solve;
* the native ``RtSolution`` actuation fast path publishing at ESTIMATOR
  rate (50 Hz) while solves land at their own rate.

Run:  python scripts/tpu_racer_mission_smoke.py
(~2-3 min through the relay; also wrapped by the TPU pytest tier,
tests/test_tpu_plant.py. ``--cpu --tiny`` runs a seconds-scale logic
check on the CPU backend — the environment's sitecustomize registers the
TPU plugin at startup, so the flag flips ``jax_platforms`` after import,
same dance as tests/conftest.py.)
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import ARStandardCost
from mppi_generic_tpu.maps import MapTexture2D
from mppi_generic_tpu.models import RacerDubinsElevationLSTMSteering
from mppi_generic_tpu.nn import LSTM, LSTMLSTM
from mppi_generic_tpu.runtime.plant import BufferedPlant
from mppi_generic_tpu.sampling import ColoredNoiseDistribution

STATE_DIM = 9
BUFFER_STEPS = 10


class MissionPlant(BufferedPlant):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.n_pub = 0
        self.last_u = None

    def pub_control(self, u):
        self.n_pub += 1
        self.last_u = np.asarray(u)


def build_controller(key, num_rollouts=512, num_timesteps=64):
    """RACER steering-LSTM vehicle with warm-start init net, elevation
    ramp, corridor track map, colored noise."""
    k1, k2 = jax.random.split(key)
    # gentle ramp along +x (settling kinematics exercise the map reads)
    W = H = 64
    xs = np.linspace(0, 63, W)[None, :] * 0.02
    elev = MapTexture2D.create(
        np.tile(xs, (H, 1)).astype(np.float32),
        origin=(-32.0, -32.0, 0.0), resolution=1.0,
    )
    dyn = RacerDubinsElevationLSTMSteering.create(
        elevation_map=elev, key=k1,
        control_ranges=[[-1.0, 1.0], [-1.0, 1.0]],
    )
    # init-LSTM over the smoothed (BUFFER_STEPS, 9) state window emits the
    # prediction LSTM's [h0; c0]
    H_pred = dyn.lstm.hidden_dim
    ll = LSTMLSTM(
        init_model=LSTM.create(
            STATE_DIM, 12, output_layers=[12 + STATE_DIM, 16, 2 * H_pred],
            key=k2,
        ),
        pred_model=dyn.lstm,
        init_len=BUFFER_STEPS,
    )
    dyn = dyn.replace(lstm_lstm=ll)
    assert dyn.requires_buffer

    # straight corridor along +x: track cost grows off the centerline
    ys = np.abs(np.linspace(-1, 1, 32))[:, None]
    track = np.tile(ys, (1, 64)).astype(np.float32)
    tex = MapTexture2D.create(
        track, origin=(-10.0, -8.0, 0.0), resolution=(1.0, 0.5, 1.0)
    )
    cost = ARStandardCost(
        costmap=tex, desired_speed=jnp.float32(2.0),
        track_coeff=jnp.float32(40.0), crash_coeff=jnp.float32(1000.0),
        output_indices=(2, 3, 5, 6, 0, 1),
    )
    return VanillaMPPI(
        dynamics=dyn,
        cost=cost,
        sampler=ColoredNoiseDistribution.create(
            exponents=[1.0, 2.0], std_dev=[0.4, 0.4],
            control_cost_coeff=[0.01, 0.01],
        ),
        dt=jnp.float32(0.02),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(0.0),
        num_timesteps=num_timesteps,
        num_rollouts=num_rollouts,
        num_iters=1,
        kernel="combined",
    )


def run_mission(duration_s=6.0, estimator_hz=50.0, solver_hz=20.0,
                num_rollouts=512, num_timesteps=64):
    ctrl = build_controller(jax.random.PRNGKey(0),
                            num_rollouts=num_rollouts,
                            num_timesteps=num_timesteps)
    cs = ctrl.init_state(jax.random.key(0, impl="rbg"))
    plant = MissionPlant(
        ctrl, cs, hz=solver_hz,
        buffer_dim=STATE_DIM, buffer_tau=2.0,
        buffer_dt=0.02, buffer_steps=BUFFER_STEPS,
        # one relay-immune device-time sample every 40 solver iterations
        # (~every 2 s at 20 Hz): the device-attributed tail gate reads
        # this series (round-5 VERDICT task 7)
        device_probe_every=40, device_probe_chain=8,
    )
    dyn0 = ctrl.dynamics
    x = np.zeros(STATE_DIM, np.float32)
    x[0] = 1.5  # rolling start down the corridor

    # seed the buffer + pre-warm the solve compiles outside the timed loop.
    # TWO iterations: the first compiles the no-prior-solution program, the
    # second compiles the steady-state program (donated dispatch with a
    # live RtSolution) — through a TPU relay each compile costs seconds,
    # and a compile landing inside the timed loop starves the estimator
    # (observed: 14 s for the steady-state program on a slow relay day)
    for i in range(BUFFER_STEPS):
        plant.add_buffer_entry(0.01 * i, x)
    plant.update_state(x, 0.1)
    assert plant.run_control_iteration(timeout=30.0)
    # the buffer hook must have warm-started the rollout LSTM
    warm = plant.controller.dynamics
    h_norm = float(jnp.linalg.norm(warm.warm_hidden))
    assert h_norm > 0, "buffer hook did not warm-start the LSTM"
    plant.update_state(x, 0.12)
    plant.add_buffer_entry(0.12, x)
    assert plant.run_control_iteration(timeout=30.0)
    # pre-compile the device-probe chains too (each is its own executable;
    # a compile landing mid-mission would read as a multi-second outage)
    plant._device_probe(jnp.asarray(x))
    plant.reset_timing()

    # the estimator's own plant-model step must also be jitted + warmed:
    # eager per-op dispatch through a TPU relay costs ~10 ms/op and a cold
    # jit costs seconds — either starves the 50 Hz loop
    step_j = jax.jit(lambda xs, us: dyn0.step(xs, us, 0.0, ctrl.dt)[0])
    jax.block_until_ready(
        step_j(jnp.asarray(x), jnp.zeros(dyn0.CONTROL_DIM, jnp.float32))
    )

    stop = threading.Event()

    def solver():
        while not stop.is_set():
            plant.run_control_iteration(timeout=0.1)

    th = threading.Thread(target=solver)
    th.start()

    t0 = time.monotonic()
    n_est = 0
    tick = 0
    period = 1.0 / estimator_hz
    # the device sim step BLOCKS on a device->host fetch (~27 ms through
    # this environment's relay): stepping it every tick both starves the
    # 50 Hz sensor loop (measured: 15 Hz effective) and contends with the
    # solver thread's own result fetch on the relay channel (solve wall
    # p50 doubled). Publish the sensor state every tick; advance the sim
    # at a quarter rate — a real estimator outruns its process model the
    # same way.
    sim_every = 4
    while time.monotonic() - t0 < duration_s:
        t = 0.2 + time.monotonic() - t0
        plant.update_state(x, t)
        plant.add_buffer_entry(t, x)
        n_est += 1
        if plant.last_u is not None and tick % sim_every == 0:
            u = jnp.asarray(plant.last_u)
            x = np.asarray(step_j(jnp.asarray(x), u), np.float32)
        tick += 1
        time.sleep(period)
    stop.set()
    th.join(timeout=10)
    return plant, x, n_est


def main():
    tiny = "--tiny" in sys.argv
    # non-tiny runs 25 s so the solve-time tail (p99) is judged over
    # hundreds of sustained iterations, not a handful (VERDICT r3 task 3:
    # soft real-time is a tail property, base_plant.hpp:536-563)
    plant, x, n_est = run_mission(
        duration_s=8.0 if tiny else 35.0,  # tiny CPU: eager-dispatch heavy
        num_rollouts=64 if tiny else 512,
        num_timesteps=24 if tiny else 64,
    )
    tail = plant.stats.tail("avg_optimize_ms")
    pub_tail = plant.stats.tail("avg_publish_interval_ms")
    print(f"iterations: {plant.stats.num_iterations}  "
          f"published: {plant.n_pub} / {n_est} estimator updates  "
          f"avg optimize ms: {plant.stats.avg_optimize_ms:.2f}  "
          f"final x: {x[2]:.2f} y: {x[3]:.2f}")
    if tail:
        print(f"solve ms tail: p50={tail['p50']:.1f} p95={tail['p95']:.1f} "
              f"p99={tail['p99']:.1f} max={tail['max']:.1f} n={tail['n']}")
    if pub_tail:
        print(f"publish-to-publish ms tail: p50={pub_tail['p50']:.1f} "
              f"p95={pub_tail['p95']:.1f} p99={pub_tail['p99']:.1f} "
              f"max={pub_tail['max']:.1f}")

    assert plant.stats.num_iterations > (2 if tiny else 5)
    if not tiny:
        # the soft-real-time budget is the solver's own period (50 ms at
        # 20 Hz). The gate grants the environment's measured dispatch RTT
        # on top — p50 gets 2x (the iteration's one mandatory blocking
        # fetch + contention), p99 gets 8x. The 8x is deliberately coarse:
        # measured on this infrastructure, wall-clock p99 is dominated by
        # relay spike storms (100-400 ms bursts; one run recorded a 12 s
        # outage) and host scheduling — even the host-only actuation loop
        # tails at ~6x its 20 ms period — so a tighter gate flakes on the
        # environment, not the controller. On a co-located host rtt is
        # ~0.1 ms and both gates collapse to ~the budget. The gate exists
        # to catch order-of-magnitude regressions (a compile landing in
        # the loop, a broken donated fast path); the RECORDED histograms
        # (PlantStats.tail + bench.py's tail fields) carry the precise
        # tail evidence, and bench.py's device-time slope carries the
        # compute claims. Multi-second relay outages are excluded and
        # counted; more than 3 fails outright.
        budget_ms = 1e3 / 20.0
        probe = jax.jit(lambda v: v + 1)
        float(probe(jnp.float32(0)))
        rtts = []
        for _ in range(10):
            t0 = time.monotonic()
            float(probe(jnp.float32(1)))
            rtts.append((time.monotonic() - t0) * 1e3)
        rtt_ms = float(np.median(rtts))
        samples = plant.stats.samples("avg_optimize_ms")
        outages = samples[samples >= 1000.0]
        kept = samples[samples < 1000.0]
        assert len(outages) <= 3, (
            f"{len(outages)} relay outages >= 1 s: {outages}"
        )
        assert kept.size >= 100, kept.size
        p50 = float(np.percentile(kept, 50))
        p99 = float(np.percentile(kept, 99))
        assert p50 < budget_ms + 2.0 * rtt_ms, (
            f"solve p50 {p50:.1f} ms exceeds the {budget_ms:.0f} ms solver "
            f"budget + 2x measured dispatch RTT ({rtt_ms:.1f} ms)"
        )
        assert p99 < budget_ms + 8.0 * rtt_ms, (
            f"solve p99 {p99:.1f} ms (excl. {len(outages)} relay outages) "
            f"exceeds the {budget_ms:.0f} ms solver budget + 8x measured "
            f"dispatch RTT ({rtt_ms:.1f} ms)"
        )
        print(f"tail gate: p50 {p50:.1f} < {budget_ms:.0f} + 2*{rtt_ms:.1f}"
              f" ms; p99 {p99:.1f} < {budget_ms:.0f} + 8*{rtt_ms:.1f} ms "
              f"({len(outages)} relay outages excluded)")

        # DEVICE-attributed tail gate (round-5 VERDICT task 7): the
        # wall-clock gate above grants ~8x headroom for relay storms, so a
        # sub-8x CONTROLLER regression would hide inside it. The periodic
        # chained-solve-slope probes are relay-immune (the fixed dispatch
        # cancels in the slope; a spike burst must corrupt >= 3 of a
        # probe's 5 medianed repeats), so device health gets its own
        # relative gate (runtime.plant.device_tail_gate: max probe <
        # 2.5x the low-quartile anchor), plus an absolute budget check on
        # the median. Demonstrated sensitivity + storm immunity:
        # scripts/device_tail_gate_probe.py injects a genuine 4x device
        # slowdown (mid-mission hot-swap to a 4x-rollout controller) ->
        # gate fails; a simulated relay storm (bursty 150 ms fetch
        # delays) -> gate holds.
        from mppi_generic_tpu.runtime.plant import device_tail_gate

        dev = plant.stats.samples("avg_device_solve_ms")
        assert dev.size >= 5, (
            f"only {dev.size} device probes recorded — probing broken?"
        )
        ok, anchor, dev_max = device_tail_gate(dev)
        assert ok, (
            f"device solve-time probes reached {dev_max:.2f} ms vs the "
            f"session anchor {anchor:.2f} ms — a DEVICE-side slowdown "
            "(relay storms cannot reach this series)"
        )
        dev_p50 = float(np.median(dev))
        assert dev_p50 < budget_ms, (
            f"median device solve {dev_p50:.1f} ms exceeds the "
            f"{budget_ms:.0f} ms solver budget outright"
        )
        print(f"device tail gate: anchor {anchor:.2f} ms, median "
              f"{dev_p50:.2f} ms, max {dev_max:.2f} ms < 2.5x anchor "
              f"({dev.size} probes)")
    # the native fast path publishes at estimator rate once solutions flow
    assert plant.n_pub > (0.2 if tiny else 0.5) * n_est, (plant.n_pub, n_est)
    assert plant.last_u is not None and np.all(np.isfinite(plant.last_u))
    assert np.all(np.abs(plant.last_u) <= 1.0 + 1e-5)
    # the car made forward progress and held the corridor centerline
    assert x[2] > (0.05 if tiny else 1.0), f"no forward progress: x={x[2]}"
    assert abs(x[3]) < 3.0, f"left the corridor: y={x[3]}"

    # warm-started hidden states must actually change the solve: same
    # state + key, warm vs zeroed (h0, c0). The steering-LSTM correction
    # perturbs the rollout trajectories (and hence the nominal trajectory
    # the plant publishes, pub_nominal_state); at smoke scale the cost
    # difference can sit below f32 epsilon, so the trajectory — which the
    # solve re-rolls through the warm dynamics — is the robust observable.
    ctrl_w = plant.controller
    dyn_w = ctrl_w.dynamics
    assert float(jnp.linalg.norm(dyn_w.warm_hidden)) > 0
    ctrl_c = ctrl_w.replace(dynamics=dyn_w.replace(
        warm_hidden=jnp.zeros_like(dyn_w.warm_hidden),
        warm_cell=jnp.zeros_like(dyn_w.warm_cell),
    ))
    cs0 = ctrl_w.init_state(jax.random.key(7, impl="rbg"))
    xj = jnp.asarray(x)
    res_w, _ = jax.jit(ctrl_w.solve)(xj, cs0)
    res_c, _ = jax.jit(ctrl_c.solve)(xj, cs0)
    dtraj = float(jnp.max(jnp.abs(
        res_w.state_trajectory - res_c.state_trajectory
    )))
    assert dtraj > 1e-5, "warm-start has no effect on the solve"
    print(f"warm-vs-cold max |dX|: {dtraj:.2e}")
    print("RACER MISSION SMOKE PASSED")


if __name__ == "__main__":
    main()
