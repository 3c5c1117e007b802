"""Multi-chip scaling benchmark — the harness for BASELINE.md's
"near-linear scaling" target: runs the sample-sharded MPPI solve over
meshes of increasing size and reports throughput + parallel efficiency.

On a TPU pod slice this measures real ICI/DCN scaling; in the test
environment it runs on a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --cpu --rollouts 4096 --scan 20

Modes:
* strong scaling (default): fixed total K, more devices -> faster solves;
* weak scaling (--weak): fixed K *per device*, more devices -> more
  rollouts at (ideally) constant solve time — the deployment-relevant
  curve for "more samples for the same latency budget".

Kernels: "combined" (XLA scan) or "pallas" (the fused rollout kernel,
running per-shard under jax.shard_map on meshes > 1 device;
interpret-mode off-TPU). The solve's cross-shard work (baseline = min,
normalizer/mean update = weighted psum) is inserted by XLA — no
hand-written communication (SURVEY §2.12).

--out FILE writes the result table as a JSON artifact (SCALING_r0N.json).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def run_curve(rollouts, timesteps, scan, kernel="combined", weak=False,
              sizes=None):
    import jax
    import jax.numpy as jnp

    from mppi_generic_tpu.parallel import make_sample_mesh, shard_controller
    import bench

    n_dev = len(jax.devices())
    if sizes is None:
        sizes = [s for s in (1, 2, 4, 8, 16, 32, 64) if s <= n_dev]
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    results = []
    base_rate = None
    base_ms = None
    for n in sizes:
        K = rollouts * n if weak else rollouts
        ctrl = bench.build_controller(K=K, T=timesteps, kernel=kernel)
        if n > 1:
            mesh = make_sample_mesh(num_devices=n)
            ctrl = shard_controller(ctrl, mesh)
        cs = ctrl.init_state(jax.random.PRNGKey(0))
        fn = bench.closed_loop_fn(ctrl, scan)
        out = fn(x0, cs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(x0, cs)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / scan)
        rate = K / best
        if base_rate is None:
            base_rate = rate
            base_ms = best * 1e3
        # both modes: ideal = n-fold rate (strong: n-fold faster at fixed
        # K; weak: constant solve time at n-fold K)
        efficiency = (rate / base_rate) / n
        results.append({
            "devices": n,
            "rollouts": K,
            "kernel": kernel,
            "mode": "weak" if weak else "strong",
            "solve_ms": best * 1e3,
            "rollouts_per_s": rate,
            "speedup": rate / base_rate,
            "efficiency": efficiency,
        })
        print(json.dumps(results[-1]))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual device mesh)")
    ap.add_argument("--rollouts", type=int, default=8192,
                    help="total K (strong) or K per device (weak)")
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--scan", type=int, default=100,
                    help="sequential solves per timing scan")
    ap.add_argument("--kernel", default="combined",
                    choices=("combined", "split", "pallas"))
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: K per device held constant")
    ap.add_argument("--out", default=None,
                    help="write the results JSON to this path")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        # Virtual-mesh devices SHARE host cores: a fixed-K strong-scaling
        # curve there measures scheduler contention, not scaling (round-3
        # artifact recorded efficiencies of 0.15-0.49 that mean nothing).
        # On --cpu the curve is weak-scaling only; the physical-scaling
        # story is the analytic ICI table below + bench.py --suite's
        # TPU-anchored predictions.
        if not args.weak:
            args.weak = True
            print(json.dumps({
                "note": "strong-scaling suppressed on the virtual CPU "
                        "mesh (shared host cores); emitting weak-scaling "
                        "rows instead"
            }))
    import jax  # noqa: F811

    results = run_curve(args.rollouts, args.timesteps, args.scan,
                        kernel=args.kernel, weak=args.weak)

    # Analytic ICI-traffic table (parallel/ici_model.py): the virtual-CPU
    # curve above cannot show physical speedup, so the artifact also
    # records the *predicted* multi-chip efficiency from the exact
    # cross-shard payloads + published link figures — a model, not a hope.
    from mppi_generic_tpu.parallel import ici_model

    solve_us = results[0]["solve_ms"] * 1e3  # 1-device row, per-chip K
    C = 2  # double-integrator bench controller
    ici_rows = ici_model.traffic_table(
        args.timesteps, C,
        {"vanilla": solve_us, "tube": 2 * solve_us, "robust": 2.2 * solve_us},
    )
    for row in ici_rows:
        # honesty marker: this run's anchor is THIS backend's solve time.
        # Under the virtual CPU mesh that is 10-100x slower than the TPU
        # device time, which pushes eff = solve/(solve+coll) toward 1 —
        # the TPU-anchored predictions are bench.py --suite's
        # ici_model_predicted rows (and BASELINE.md's table); tube/robust
        # anchors here are scaled guesses, not measurements.
        row["anchor"] = f"{jax.default_backend()}_solve_time"
        if row["variant"] != "vanilla":
            row["anchor"] += "_scaled_guess"
        print(json.dumps(row))

    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "backend": jax.default_backend(),
                "device_kind": jax.devices()[0].device_kind,
                "results": results,
                "ici_model": {
                    "note": (
                        "predicted weak-scaling efficiency from exact "
                        "cross-shard payloads (baseline pmin/pmax 4 B, "
                        "normalizer psum 4 B, weighted-mean psum 4*T*C B "
                        "per iteration; 2 dependent collective phases) and "
                        "published TPU v4 ICI figures (45 GB/s/link, ~1 us "
                        "hop). Payloads are KBs -> latency-bound; "
                        "efficiency depends on per-chip solve time only. "
                        "solve_us rows use the measured 1-device time "
                        "from this run (tube/robust scaled analytically)."
                    ),
                    "rows": ici_rows,
                },
            }, f, indent=1)
    return results


if __name__ == "__main__":
    main()
