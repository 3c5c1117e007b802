"""Multi-chip scaling benchmark — the harness for BASELINE.md's
"near-linear scaling" target: runs the sample-sharded MPPI solve over
meshes of increasing size and reports throughput + parallel efficiency.

On a TPU pod slice this measures real ICI/DCN scaling; in the test
environment it can run on a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --cpu --rollouts 4096 --scan 20

The solve's collectives (baseline = min, normalizer/mean update = weighted
psum) are inserted by XLA from the sample-axis sharding constraint — no
hand-written communication (SURVEY §2.12).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual device mesh)")
    ap.add_argument("--rollouts", type=int, default=8192)
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--scan", type=int, default=100,
                    help="sequential solves per timing scan")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from mppi_generic_tpu.parallel import make_sample_mesh, shard_controller
    import bench

    n_dev = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32, 64) if s <= n_dev]
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    results = []
    base_rate = None
    for n in sizes:
        ctrl = bench.build_controller(K=args.rollouts, T=args.timesteps,
                                      kernel="combined")
        if n > 1:
            mesh = make_sample_mesh(num_devices=n)
            ctrl = shard_controller(ctrl, mesh)
        cs = ctrl.init_state(jax.random.PRNGKey(0))
        fn = bench.closed_loop_fn(ctrl, args.scan)
        out = fn(x0, cs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(x0, cs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.scan
        rate = args.rollouts / dt
        if base_rate is None:
            base_rate = rate
        results.append({
            "devices": n,
            "solve_ms": dt * 1e3,
            "rollouts_per_s": rate,
            "speedup": rate / base_rate,
            "efficiency": rate / base_rate / n,
        })
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    main()
