"""Benchmark harness — measures MPPI solve throughput on the current JAX
backend (real TPU under the driver) and prints ONE JSON line.

Headline config (BASELINE.md): double integrator, vanilla MPPI, Gaussian
sampling, H=100, K=8192, 1 optimization iteration — the analog of the
reference's cartpole_example timing harness (examples/cartpole_example.cu:87)
at the driver's target scale. Target: >= 1e6 rollouts/s/chip.

Methodology: this environment reaches the TPU through a relay with ~30 ms
host round-trip latency, so single-call wall-clock measures the tunnel, not
the chip. We therefore time a closed-loop ``lax.scan`` of S sequential solves
inside ONE jitted program (slide -> solve -> step, exactly the plant loop)
and divide — the steady-state number a co-located host would see. The
single-dispatch p50 is also reported for reference.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_controller(K=8192, T=100, kernel="combined"):
    from mppi_generic_tpu.controllers import VanillaMPPI
    from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
    from mppi_generic_tpu.models import DoubleIntegratorDynamics
    from mppi_generic_tpu.sampling import GaussianDistribution

    return VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(
            std_dev=[1.0, 1.0], control_cost_coeff=[0.01, 0.01]
        ),
        dt=jnp.float32(0.02),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(0.0),
        num_timesteps=T,
        num_rollouts=K,
        num_iters=1,
        kernel=kernel,
    )


def closed_loop_fn(ctrl, S):
    """S sequential full solves (slide -> solve -> simulate one dt) in one
    jitted program — the real-time plant loop at steady state."""

    def many(x, cs):
        def body(carry, _):
            x, cs = carry
            cs = ctrl.slide_control_sequence(cs, 1)
            res, cs = ctrl.solve(x, cs)
            u = res.control_mean[0]
            x, _ = ctrl.dynamics.step(x, u, 0.0, ctrl.dt)
            return (x, cs), res.baseline

        (xf, csf), baselines = jax.lax.scan(body, (x, cs), None, length=S)
        return xf, baselines[-1]

    return jax.jit(many)


def time_fn(f, args, n_warmup=2, n_timed=7):
    r = None
    for _ in range(n_warmup):
        r = f(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return np.array(ts)


def _rng_key():
    """On TPU the hardware-friendly RBG generator is ~3x faster than the
    default Threefry for the (K*T*C)-normals-per-solve sampling load; both
    are counter-based with the same distribution semantics."""
    if jax.default_backend() == "tpu":
        return jax.random.key(0, impl="rbg")
    return jax.random.PRNGKey(0)


def main():
    K, T, S = 8192, 100, 500
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])

    # auto-tune over all rollout paths (the chooseAppropriateKernel
    # analog, mppi_controller.cu:45-143)
    best = None
    for kernel in ("combined", "split", "pallas", "pallas_fused"):
        ctrl = build_controller(K=K, T=T, kernel=kernel)
        cs = ctrl.init_state(_rng_key())
        f = closed_loop_fn(ctrl, S)
        try:
            ts = time_fn(f, (x0, cs))
        except Exception as e:
            # pallas variants may be unavailable on this backend; report
            # rather than silently dropping
            print(f"# kernel {kernel} skipped: {type(e).__name__}",
                  file=sys.stderr)
            continue
        med = float(np.median(ts))
        if best is None or med < best[1]:
            best = (kernel, med, ctrl, cs)
    if best is None:
        raise RuntimeError(
            "every kernel variant failed to run — check the backend"
        )
    kernel, total, ctrl, cs = best

    per_solve = total / S
    solves_per_s = 1.0 / per_solve
    rollouts_per_s = K * solves_per_s

    # single-dispatch latency (includes the ~30 ms relay RTT in this env)
    single = jax.jit(lambda x, s: ctrl.solve(x, s))
    ts1 = time_fn(single, (x0, cs), n_warmup=2, n_timed=7)

    # dispatch-cost minimization study (VERDICT r1 item 7):
    # (a) donate the ControllerState buffers — the warm-start mean / RNG key
    #     / history update in place instead of allocating fresh outputs
    #     (the plant loop never reuses the old state);
    # (b) keep x0 device-resident (the deployed plant holds the estimator
    #     state on-device; only sensor deltas cross the host boundary).
    x0_dev = jax.device_put(x0)
    donated = jax.jit(lambda x, s: ctrl.solve(x, s), donate_argnums=(1,))
    res, cs_d = donated(x0_dev, ctrl.init_state(_rng_key()))
    jax.block_until_ready(res.control_mean)
    ts_don = []
    for _ in range(7):
        t0 = time.perf_counter()
        res, cs_d = donated(x0_dev, cs_d)
        jax.block_until_ready(res.control_mean)
        ts_don.append(time.perf_counter() - t0)

    # (c) async pipelined dispatch: the plant issues the next solve while
    # the previous result streams back — JAX dispatch is async, so chaining
    # state-threaded calls without blocking overlaps the host->device
    # round-trip with compute. This is the per-solve cost a co-located (or
    # even relayed) deployment pays at steady state with one solve in
    # flight.
    N_PIPE = 50
    res, cs_p = donated(x0_dev, cs_d)
    jax.block_until_ready(res.control_mean)
    t0 = time.perf_counter()
    for _ in range(N_PIPE):
        res, cs_p = donated(x0_dev, cs_p)
    jax.block_until_ready(res.control_mean)
    pipelined_ms = (time.perf_counter() - t0) / N_PIPE * 1e3

    target = 1e6  # BASELINE.json north-star: >=1e6 rollouts/s/chip
    print(
        json.dumps(
            {
                "metric": "di_mppi_rollouts_per_sec_per_chip",
                "value": rollouts_per_s,
                "unit": "rollouts/s",
                "vs_baseline": rollouts_per_s / target,
                "solves_per_sec": solves_per_s,
                "steady_state_solve_ms": per_solve * 1e3,
                "single_dispatch_p50_ms": float(np.median(ts1)) * 1e3,
                "single_dispatch_donated_p50_ms": float(np.median(ts_don)) * 1e3,
                "async_pipelined_solve_ms": pipelined_ms,
                "config": {"K": K, "T": T, "kernel": kernel, "iters": 1, "scan_len": S},
                "backend": jax.devices()[0].platform,
                "device": str(jax.devices()[0]),
            }
        )
    )


def _steady_state_ms(ctrl, x0, S=200, key=None):
    """Closed-loop steady-state ms/solve for any controller type —
    including RMPPI's mandatory per-step stage 1 (candidate eval + DDP gain
    synthesis), exactly the plant loop."""
    cs = ctrl.init_state(key if key is not None else _rng_key())
    has_is = hasattr(ctrl, "update_importance_sampling")

    def body(carry, _):
        x, cs = carry
        if has_is:
            cs, _ = ctrl.update_importance_sampling(x, cs, 1)
        cs = ctrl.slide_control_sequence(cs, 1)
        res, cs = ctrl.solve(x, cs)
        main_res = getattr(res, "real", res)
        x, _ = ctrl.dynamics.step(x, main_res.control_mean[0], 0.0, ctrl.dt)
        return (x, cs), main_res.baseline

    loop = jax.jit(lambda x, cs: jax.lax.scan(body, (x, cs), None, length=S))
    out = loop(x0, cs)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    out = loop(x0, cs)
    jax.block_until_ready(out[1])
    return (time.perf_counter() - t0) / S * 1e3


def suite():
    """The BASELINE.json benchmark configs, one JSON line each."""
    _np = np

    from mppi_generic_tpu.controllers import RobustMPPI, VanillaMPPI
    from mppi_generic_tpu.costs import (
        ARStandardCost,
        CartpoleQuadraticCost,
        DoubleIntegratorCircleCost,
    )
    from mppi_generic_tpu.feedback import DDPFeedback
    from mppi_generic_tpu.maps.texture import MapTexture2D
    from mppi_generic_tpu.models import (
        AutorallyNNDynamics,
        BicycleSlipDynamics,
        CartpoleDynamics,
        DoubleIntegratorDynamics,
    )
    from mppi_generic_tpu.sampling import (
        ColoredNoiseDistribution,
        GaussianDistribution,
    )

    on_tpu = jax.default_backend() == "tpu"
    fast = "pallas_fused" if on_tpu else "combined"
    results = []

    def report(name, ctrl, x0, K, note=""):
        ms = _steady_state_ms(ctrl, x0)
        entry = {
            "config": name,
            "steady_state_solve_ms": ms,
            "solves_per_sec": 1e3 / ms,
            "rollouts_per_sec": K / (ms / 1e3),
            "meets_50hz_budget": ms < 20.0,
            "kernel": ctrl.kernel,
        }
        if note:
            entry["note"] = note
        results.append(entry)
        print(json.dumps(entry))

    # 1. double integrator, H=100, K=1024
    report("double_integrator_example_K1024",
           build_controller(K=1024, T=100, kernel=fast),
           jnp.array([2.0, 0.0, 0.0, 1.0]), 1024)

    # 2. cartpole swing-up, K=8192
    ctrl = VanillaMPPI(
        dynamics=CartpoleDynamics.create(control_ranges=[[-5.0, 5.0]]),
        cost=CartpoleQuadraticCost(coeffs=jnp.array([100.0, 10.0, 200.0, 20.0])),
        sampler=GaussianDistribution.create(std_dev=[5.0]),
        dt=jnp.float32(0.02), lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=100, num_rollouts=8192, num_iters=1, kernel=fast,
    )
    report("cartpole_example_K8192", ctrl, jnp.zeros(4), 8192)

    # 3. bicycle slip + colored noise + track-map texture cost
    tex = MapTexture2D.create(
        _np.abs(_np.random.default_rng(0).normal(size=(128, 128))).astype("f"),
        origin=(-64, -64, 0), resolution=1.0,
    )
    # bicycle-slip output layout: [x, y, yaw, steer, brake, vx, vy, wz,
    # roll, pitch] -> AR cost indices (x, y, yaw, roll, vx, vy)
    ctrl = VanillaMPPI(
        dynamics=BicycleSlipDynamics.create(),
        cost=ARStandardCost(costmap=tex,
                            output_indices=(0, 1, 2, 8, 5, 6)),
        sampler=ColoredNoiseDistribution.create(
            std_dev=[0.3, 0.5], exponents=[1.0, 1.0]
        ),
        dt=jnp.float32(0.02), lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=100, num_rollouts=1920, num_iters=1,
        kernel="combined",  # map gathers are XLA-path (see docs/design.md)
    )
    report("bicycle_slip_colored_trackmap", ctrl,
           jnp.zeros(ctrl.dynamics.STATE_DIM), 1920)

    # 4. autorally NN dynamics at the 50 Hz real-time budget
    ctrl = VanillaMPPI(
        dynamics=AutorallyNNDynamics.create(key=jax.random.PRNGKey(0)),
        cost=ARStandardCost(costmap=tex),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        dt=jnp.float32(0.02), lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=150, num_rollouts=1920, num_iters=1, kernel="combined",
    )
    report("autorally_nn_K1920_T150", ctrl,
           jnp.zeros(7).at[4].set(3.0), 1920)

    # 4b. racer LSTM-steering dynamics with an elevation map (the
    # lstm_lstm_steering real-vehicle configuration)
    from mppi_generic_tpu.models import RacerDubinsElevationLSTMSteering

    elev = MapTexture2D.create(
        (0.1 * _np.random.default_rng(1).normal(size=(128, 128))).astype("f"),
        origin=(-64, -64, 0), resolution=1.0,
    )
    # racer elevation output layout: [vel_bx, vel_by, x, y, z, yaw, roll,
    # pitch, ...] -> AR cost indices
    ctrl = VanillaMPPI(
        dynamics=RacerDubinsElevationLSTMSteering.create(elevation_map=elev),
        cost=ARStandardCost(costmap=tex,
                            output_indices=(2, 3, 5, 6, 0, 1)),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        dt=jnp.float32(0.02), lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=100, num_rollouts=1920, num_iters=1, kernel="combined",
    )
    report("racer_lstm_steering_elevation_K1920", ctrl,
           jnp.zeros(9).at[0].set(3.0), 1920)

    # 4c. the 26-state LSTM-uncertainty model through the fused kernel
    # (flat ground; round-2 capability — the mapped variant is 4b-style XLA)
    from mppi_generic_tpu.models import RacerDubinsElevationLSTMUncertainty

    ctrl = VanillaMPPI(
        dynamics=RacerDubinsElevationLSTMUncertainty.create(),
        cost=ARStandardCost(output_indices=(2, 3, 5, 6, 0, 1)),
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.5]),
        dt=jnp.float32(0.02), lam=jnp.float32(1.0), alpha=jnp.float32(0.0),
        num_timesteps=150, num_rollouts=1920, num_iters=1,
        kernel="pallas" if on_tpu else "combined",
    )
    report("racer_lstm_unc_flat_K1920", ctrl,
           jnp.zeros(26).at[0].set(3.0), 1920)

    # 5. RMPPI with DDP feedback on the DI CoRL scenario
    dyn = DoubleIntegratorDynamics.create()
    ctrl = RobustMPPI(
        dynamics=dyn, cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        dt=jnp.float32(0.02), lam=jnp.float32(2.0), alpha=jnp.float32(0.0),
        num_timesteps=50, num_rollouts=2560,
        num_candidates=9, samples_per_condition=256,
        value_function_threshold=jnp.float32(20.0),
        feedback=DDPFeedback.create(dyn, 0.02),
        kernel="pallas" if on_tpu else "combined",
    )
    report("rmppi_ddp_di_corl2020_K2560", ctrl,
           jnp.array([2.0, 0.0, 0.0, 1.0]), 2560,
           note="single-chip; multi-host sharding exercised by "
                "scripts/scaling_bench.py + dryrun_multichip")

    # 6. multi-device scaling curve (virtual 8-device CPU mesh when no
    # multi-chip slice is attached; see SCALING_r02.json for the recorded
    # artifact + caveats). Runs in a subprocess because the device count
    # must be set before the backend initializes.
    import os
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    try:
        proc = subprocess.run(
            [sys.executable, "scripts/scaling_bench.py", "--cpu",
             "--rollouts", "16384", "--timesteps", "64", "--scan", "10"],
            env=env, capture_output=True, text=True, timeout=900,
        )
        emitted = 0
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                entry = json.loads(line)
                entry["config"] = "scaling_cpu_mesh"
                results.append(entry)
                print(json.dumps(entry))
                emitted += 1
        if proc.returncode != 0 or emitted == 0:
            # a crashed subprocess must not silently drop the scaling curve
            print(json.dumps({
                "config": "scaling_cpu_mesh",
                "error": f"returncode={proc.returncode}, rows={emitted}",
                "stderr_tail": proc.stderr[-400:],
            }))
    except (subprocess.TimeoutExpired, OSError) as e:
        print(json.dumps({"config": "scaling_cpu_mesh",
                          "error": type(e).__name__}))
    return results


if __name__ == "__main__":
    import sys

    if "--suite" in sys.argv:
        suite()
    else:
        main()
