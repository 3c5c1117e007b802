"""Per-stage latency breakdown of the fused vanilla MPPI solve (TPU).

Times a closed-loop ``lax.scan`` chain (bench.py methodology) where each
variant adds one more stage of the solve pipeline on top of the fused
sample+rollout kernel. The deltas attribute the fixed per-solve overhead
(VERDICT r2 weak item 1) to its actual sources so the epilogue-fusion work
targets what matters — the reference's auto-tune philosophy
(mppi_controller.cu:45-143): measure, don't assert.

Usage: python scripts/solve_breakdown.py [--rollouts 1024] [--timesteps 100]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.ops import pallas_rollout
from mppi_generic_tpu.ops import weights as weight_ops

STAGES = [
    "kernel_only",
    "+weights",
    "+mean_update",
    "+free_energy",
    "+smoothing",
    "+mean_rerollout",
    "+clamp",
    "+slide",
    "full_solve",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rollouts", type=int, default=1024)
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--scan", type=int, default=500)
    args = ap.parse_args()
    K, T, S = args.rollouts, args.timesteps, args.scan

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_controller

    ctrl = build_controller(K=K, T=T, kernel="pallas_fused")
    cs = ctrl.init_state(jax.random.key(0, impl="rbg"))
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])
    lam, alpha = ctrl.lam, ctrl.alpha

    def make(stage):
        n = STAGES.index(stage)

        def body(carry, _):
            x, mean, samp, key, hist = carry
            key, sub = jax.random.split(key)
            if stage == "full_solve":
                cs2 = cs.replace(control_mean=mean, key=key,
                                 sampler_state=samp, control_history=hist)
                cs2 = ctrl.slide_control_sequence(cs2, 1)
                res, cs2 = ctrl.solve(x, cs2)
                return (x, cs2.control_mean, cs2.sampler_state, cs2.key,
                        cs2.control_history), res.baseline
            seed = jax.random.randint(sub, (), 0, jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            costs, crash, U, aux = pallas_rollout.fused_sample_rollout_costs(
                ctrl.dynamics, ctrl.cost, ctrl.sampler, x, mean, seed,
                ctrl.dt, lam, alpha, K, tile_k=ctrl.pallas_tile_k,
            )
            out = costs[0]
            if n >= 1:
                baseline = weight_ops.baseline_cost(costs)
                w = weight_ops.norm_exp_weights(costs, lam, baseline)
                out = w[0]
            if n >= 2:
                eta = weight_ops.normalizer(w)
                mean, samp = ctrl.sampler.update_mean(U, aux, w, eta, mean,
                                                      samp)
                out = out + mean[0, 0]
            if n >= 3:
                fe_m, fe_v, fe_mod = weight_ops.compute_free_energy(
                    w, baseline, lam
                )
                out = out + fe_m
            if n >= 4:
                mean = ctrl._smooth(mean, hist)
                out = out + mean[0, 0]
            if n >= 5:
                states, outputs = ctrl._mean_trajectory(x, mean)
                out = out + states[0, 0]
            if n >= 6:
                mean = ctrl._clamp_controls(mean)
            if n >= 7:
                hist = jnp.roll(hist, -1, axis=0).at[-1].set(mean[0])
                mean = jnp.roll(mean, -1, axis=0).at[-1].set(mean[-1])
            return (x, mean, samp, key, hist), out

        return jax.jit(
            lambda c: jax.lax.scan(body, c, None, length=S)
        )

    carry0 = (x0, cs.control_mean, cs.sampler_state,
              jax.random.PRNGKey(0), cs.control_history)
    results = {}
    prev = None
    from bench import time_fn  # one timing convention across harnesses

    for stage in STAGES:
        f = make(stage)
        ts = time_fn(lambda c: f(c)[1], (carry0,), n_warmup=1, n_timed=5)
        ms = float(np.median(ts)) / S * 1e3
        delta = ms - prev if prev is not None else 0.0
        results[stage] = ms
        print(f"{stage:<18} {ms * 1e3:8.1f} us/solve   "
              f"(+{delta * 1e3:6.1f} us)")
        prev = ms
    return results


if __name__ == "__main__":
    main()
