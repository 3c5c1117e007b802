"""Benchmark harness — measures MPPI rollout throughput on the current JAX
backend (real TPU under the driver) and prints ONE JSON line.

Headline config (BASELINE.md): double integrator, vanilla MPPI, Gaussian
sampling, H=100, K=8192, 1 optimization iteration — the analog of the
reference's cartpole_example timing harness (examples/cartpole_example.cu:87)
at the driver's target scale. Target: >= 1e6 rollouts/s/chip.
"""

import json
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


def time_solves(ctrl, n_warmup=3, n_timed=20):
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    cs = ctrl.init_state(jax.random.PRNGKey(0))

    solve = jax.jit(lambda x, s: ctrl.solve(x, s))
    for _ in range(n_warmup):
        res, cs = solve(x0, cs)
    jax.block_until_ready(res.control_mean)

    latencies = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        res, cs = solve(x0, cs)
        jax.block_until_ready(res.control_mean)
        latencies.append(time.perf_counter() - t0)
    return np.array(latencies), res


def main():
    K, T = 8192, 100
    # auto-tune combined vs split (the chooseAppropriateKernel analog,
    # mppi_controller.cu:45-143)
    best = None
    for kernel in ("combined", "split"):
        ctrl = build_controller(K=K, T=T, kernel=kernel)
        lat, res = time_solves(ctrl)
        p50 = float(np.median(lat))
        if best is None or p50 < best[1]:
            best = (kernel, p50, lat, res)
    kernel, p50, lat, res = best

    solves_per_s = 1.0 / p50
    rollouts_per_s = K * solves_per_s
    target = 1e6  # BASELINE.json north-star: >=1e6 rollouts/s/chip
    print(
        json.dumps(
            {
                "metric": "di_mppi_rollouts_per_sec_per_chip",
                "value": rollouts_per_s,
                "unit": "rollouts/s",
                "vs_baseline": rollouts_per_s / target,
                "solves_per_sec": solves_per_s,
                "p50_solve_ms": p50 * 1e3,
                "p90_solve_ms": float(np.percentile(lat, 90)) * 1e3,
                "config": {"K": K, "T": T, "kernel": kernel, "iters": 1},
                "backend": jax.devices()[0].platform,
                "device": str(jax.devices()[0]),
                "baseline_cost": float(res.baseline),
            }
        )
    )


if __name__ == "__main__":
    main()
