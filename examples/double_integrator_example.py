"""Double-integrator waypoint regulation — parity with the reference
``examples/double_integrator_example.cu``: colored-noise (1/f) sampling,
quadratic cost to the goal (-4, -4, 0, 0) with coeffs (5, 5, 0.5, 0.5),
T=65, K=128, dt=0.015, lambda=1, alpha=1, start (-9, -9, 0.1, 0.1).
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import argparse
import math
import time

import jax
import jax.numpy as jnp

from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import QuadraticCost
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.sampling import ColoredNoiseDistribution


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    args = ap.parse_args()

    goal = jnp.array([-4.0, -4.0, 0.0, 0.0])
    ctrl = VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=QuadraticCost.create(
            goal=goal, coeffs=jnp.array([5.0, 5.0, 0.5, 0.5]), output_dim=4
        ),
        sampler=ColoredNoiseDistribution.create(
            std_dev=[0.5, 0.5], exponents=[1.0, 1.0]
        ),
        dt=jnp.float32(0.015),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(1.0),
        num_timesteps=65,
        num_rollouts=128,
        num_iters=1,
    )
    key = (jax.random.key(0, impl="rbg") if jax.default_backend() == "tpu"
           else jax.random.PRNGKey(0))
    cs = ctrl.init_state(key)
    x0 = jnp.array([-9.0, -9.0, 0.1, 0.1])

    def body(carry, _):
        x, cs = carry
        cs = ctrl.slide_control_sequence(cs, 1)
        res, cs = ctrl.solve(x, cs)
        x, _ = ctrl.dynamics.step(x, res.control_mean[0], 0.0, ctrl.dt)
        return (x, cs), (x, res.baseline)

    loop = jax.jit(
        lambda x, cs: jax.lax.scan(body, (x, cs), None, length=args.steps)
    )
    t0 = time.perf_counter()
    (xf, _), (xs, baselines) = loop(x0, cs)
    jax.block_until_ready(xf)
    total = time.perf_counter() - t0

    err = math.sqrt(float((xf[0] - goal[0]) ** 2 + (xf[1] - goal[1]) ** 2))
    print(f"backend: {jax.default_backend()}  ({total:.2f}s incl. compile)")
    print(f"final state: {[round(float(v), 3) for v in xf]}")
    print(f"distance to goal (-4, -4): {err:.3f}")
    print(f"final baseline: {float(baselines[-1]):.3f}")


if __name__ == "__main__":
    main()
