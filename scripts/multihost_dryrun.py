"""Two-process multi-host dryrun: run the sample-sharded MPPI solve on a
mesh that spans OS processes and check parity against a single-process
solve.

The reference is single-GPU (no NCCL/MPI anywhere in its tree; SURVEY
§2.12) — multi-host scaling is a blueprint-native capability of this
framework, not a parity item. This script is the executed evidence for the
DCN story: it brings up ``jax.distributed`` across two localhost processes
(4 virtual CPU devices each, gloo collectives — the same multi-controller
programming model a real TPU pod uses over DCN), builds the global 8-device
sample mesh through ``parallel.mesh.distributed_init`` +
``make_sample_mesh``, runs the sharded vanilla solve on both the XLA
combined kernel and the shard_mapped Pallas kernel (interpret mode
off-TPU), plus a Tube-MPPI dual-system solve and the full RMPPI per-step
pipeline (sharded candidate eval + DDP gain synthesis + the augmented
real/nominal solve), and asserts bit-level parity with the single-process
unsharded result recorded by a reference subprocess.

Usage (parent mode — spawns everything):
    python scripts/multihost_dryrun.py [--out MULTIHOST_r03.json]

Internal modes:
    --reference OUTDIR          single-process unsharded reference solves
    --worker PORT PID N OUTDIR  one distributed process
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# tiny shapes: K_PALLAS = 128 lanes/device * 8 devices
K_XLA, K_PALLAS, T = 64, 1024, 16
RTOL, ATOL = 1e-4, 1e-5


def _cpu_jax(n_local_devices):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _build(kernel, K, sharding=None):
    import jax.numpy as jnp

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
        sample_sharding=sharding,
    )


def _build_tube(K, sharding=None):
    import jax.numpy as jnp

    from mppi_generic_tpu.controllers import TubeMPPI
    from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
    from mppi_generic_tpu.feedback import DDPFeedback
    from mppi_generic_tpu.models import DoubleIntegratorDynamics
    from mppi_generic_tpu.sampling import GaussianDistribution

    dyn = DoubleIntegratorDynamics.create()
    return TubeMPPI(
        dynamics=dyn,
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=T,
        num_rollouts=K,
        nominal_threshold=jnp.float32(20.0),
        feedback=DDPFeedback.create(dyn, 0.02),
        sample_sharding=sharding,
    )


def _build_robust(K, sharding=None):
    import jax.numpy as jnp

    from mppi_generic_tpu.controllers import RobustMPPI
    from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
    from mppi_generic_tpu.feedback import DDPFeedback
    from mppi_generic_tpu.models import DoubleIntegratorDynamics
    from mppi_generic_tpu.sampling import GaussianDistribution

    dyn = DoubleIntegratorDynamics.create()
    return RobustMPPI(
        dynamics=dyn,
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(std_dev=[1.0, 1.0]),
        num_timesteps=T,
        num_rollouts=K,
        num_candidates=9,
        samples_per_condition=32,
        value_function_threshold=jnp.float32(20.0),
        feedback=DDPFeedback.create(dyn, 0.02),
        sample_sharding=sharding,
    )


def _robust_step(jax, ctrl):
    """RMPPI per-step pipeline, jitted once: candidate eval + gain
    synthesis, then the augmented solve — the plant-loop sequence."""
    uis = jax.jit(ctrl.update_importance_sampling)
    solve = jax.jit(ctrl.solve)

    def step(x0, cs0):
        cs, _ = uis(x0, cs0, 1)
        return solve(x0, cs)

    return step


def _x0():
    import jax.numpy as jnp

    return jnp.array([2.0, 0.0, 0.0, 1.0])


def run_reference(outdir):
    """Single-process, single-device unsharded solves → ref.npz."""
    jax = _cpu_jax(1)
    import numpy as np

    x0 = _x0()
    out = {}
    for kernel, K in (("combined", K_XLA), ("pallas", K_PALLAS)):
        ctrl = _build(kernel, K)
        res, _ = jax.jit(ctrl.solve)(x0, ctrl.init_state(jax.random.PRNGKey(0)))
        out[f"{kernel}_mean"] = np.asarray(res.control_mean)
        out[f"{kernel}_baseline"] = np.asarray(res.baseline)
        out[f"{kernel}_eta"] = np.asarray(res.normalizer)
    tube = _build_tube(K_XLA)
    tres, _ = jax.jit(tube.solve)(x0, tube.init_state(jax.random.PRNGKey(1)))
    out["tube_mean"] = np.asarray(tres.real.control_mean)
    out["tube_baseline"] = np.asarray(tres.real.baseline)
    robust = _build_robust(K_XLA)
    rres, _ = _robust_step(jax, robust)(
        x0, robust.init_state(jax.random.PRNGKey(2)))
    out["robust_mean"] = np.asarray(rres.real.control_mean)
    out["robust_nominal_mean"] = np.asarray(rres.nominal.control_mean)
    np.savez(os.path.join(outdir, "ref.npz"), **out)


def run_worker(port, pid, nprocs, outdir):
    """One process of the distributed mesh: init jax.distributed via the
    library's distributed_init, build the GLOBAL sample mesh, solve with
    real cross-process collectives, and (on process 0) compare with the
    reference."""
    jax = _cpu_jax(4)
    import numpy as np

    from mppi_generic_tpu.parallel import make_sample_mesh, shard_controller
    from mppi_generic_tpu.parallel.mesh import distributed_init

    distributed_init(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 4 * nprocs, (n_global, nprocs)
    mesh = make_sample_mesh()  # all GLOBAL devices, spans both processes
    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    ref = np.load(os.path.join(outdir, "ref.npz")) if pid == 0 else None
    x0 = jax.device_put(_x0(), replicated)

    checks = []

    def record(name, ok, err, solve_ms):
        checks.append(
            {"check": name, "ok": bool(ok), "max_abs_err": float(err),
             "solve_ms": round(solve_ms, 3)}
        )

    for kernel, K in (("combined", K_XLA), ("pallas", K_PALLAS)):
        ctrl = _build(kernel, K)
        sharded = shard_controller(ctrl, mesh)
        cs = jax.device_put(
            ctrl.init_state(jax.random.PRNGKey(0)), replicated
        )
        solve = jax.jit(sharded.solve)
        res, _ = solve(x0, cs)
        jax.block_until_ready(res.control_mean)
        t0 = time.perf_counter()
        res, _ = solve(x0, cs)
        jax.block_until_ready(res.control_mean)
        dt_ms = (time.perf_counter() - t0) * 1e3
        mean = np.asarray(res.control_mean)  # replicated → addressable
        if pid == 0:
            err = float(np.max(np.abs(mean - ref[f"{kernel}_mean"])))
            ok = np.allclose(
                mean, ref[f"{kernel}_mean"], rtol=RTOL, atol=ATOL
            ) and np.allclose(
                float(res.baseline), ref[f"{kernel}_baseline"], rtol=1e-5
            )
            record(f"vanilla_{kernel}", ok, err, dt_ms)

    tube = _build_tube(K_XLA)
    tube_sh = shard_controller(tube, mesh)
    ts = jax.device_put(tube.init_state(jax.random.PRNGKey(1)), replicated)
    tube_solve = jax.jit(tube_sh.solve)
    tres, _ = tube_solve(x0, ts)  # warmup: keep compile out of solve_ms
    jax.block_until_ready(tres.real.control_mean)
    t0 = time.perf_counter()
    tres, _ = tube_solve(x0, ts)
    jax.block_until_ready(tres.real.control_mean)
    dt_ms = (time.perf_counter() - t0) * 1e3
    if pid == 0:
        tmean = np.asarray(tres.real.control_mean)
        err = float(np.max(np.abs(tmean - ref["tube_mean"])))
        ok = np.allclose(tmean, ref["tube_mean"], rtol=RTOL, atol=ATOL)
        record("tube", ok, err, dt_ms)

    # RMPPI: candidate eval (per-sample-x0 shard path) + gain synthesis +
    # the augmented real/nominal solve, all over the cross-process mesh
    robust = _build_robust(K_XLA)
    robust_sh = shard_controller(robust, mesh)
    rs = jax.device_put(
        robust.init_state(jax.random.PRNGKey(2)), replicated
    )
    robust_step = _robust_step(jax, robust_sh)
    rres, _ = robust_step(x0, rs)  # warmup: keep compile out of solve_ms
    jax.block_until_ready(rres.real.control_mean)
    t0 = time.perf_counter()
    rres, _ = robust_step(x0, rs)
    jax.block_until_ready(rres.real.control_mean)
    dt_ms = (time.perf_counter() - t0) * 1e3
    if pid == 0:
        rmean = np.asarray(rres.real.control_mean)
        nmean = np.asarray(rres.nominal.control_mean)
        err = max(
            float(np.max(np.abs(rmean - ref["robust_mean"]))),
            float(np.max(np.abs(nmean - ref["robust_nominal_mean"]))),
        )
        ok = np.allclose(
            rmean, ref["robust_mean"], rtol=RTOL, atol=ATOL
        ) and np.allclose(
            nmean, ref["robust_nominal_mean"], rtol=RTOL, atol=ATOL
        )
        record("robust", ok, err, dt_ms)

        with open(os.path.join(outdir, "worker0.json"), "w") as f:
            json.dump(
                {
                    "num_processes": nprocs,
                    "local_devices": n_local,
                    "global_devices": n_global,
                    "cpu_collectives": str(
                        jax.config.jax_cpu_collectives_implementation
                    ),
                    "checks": checks,
                },
                f,
            )
    jax.distributed.shutdown()


def run_parent(out_path):
    import tempfile

    t_start = time.perf_counter()
    with tempfile.TemporaryDirectory() as outdir:
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        me = os.path.abspath(__file__)
        subprocess.run(
            [sys.executable, me, "--reference", outdir],
            check=True, env=env, timeout=600,
        )
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        workers = [
            subprocess.Popen(
                [sys.executable, me, "--worker", str(port), str(i), "2", outdir],
                env=env,
            )
            for i in range(2)
        ]
        codes = [w.wait(timeout=600) for w in workers]
        if any(codes):
            raise SystemExit(f"worker exit codes {codes}")
        with open(os.path.join(outdir, "worker0.json")) as f:
            result = json.load(f)
    result["ok"] = all(c["ok"] for c in result["checks"])
    result["wall_s"] = round(time.perf_counter() - t_start, 1)
    result["note"] = (
        "2 OS processes x 4 virtual CPU devices, gloo collectives over the "
        "jax.distributed coordination service — the multi-controller "
        "programming model a TPU pod uses over ICI/DCN. Parity is vs a "
        "single-process, single-device unsharded solve."
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    if not result["ok"]:
        raise SystemExit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", metavar="OUTDIR")
    ap.add_argument("--worker", nargs=4,
                    metavar=("PORT", "PID", "NPROCS", "OUTDIR"))
    ap.add_argument("--out", default=os.path.join(REPO, "MULTIHOST_r03.json"))
    args = ap.parse_args()
    if args.reference:
        run_reference(args.reference)
    elif args.worker:
        port, pid, nprocs, outdir = args.worker
        run_worker(int(port), int(pid), int(nprocs), outdir)
    else:
        run_parent(args.out)


if __name__ == "__main__":
    main()
