"""Double-integrator circle tracking — parity with the reference
``examples/double_integrator_example.cu``: vanilla MPPI holds the point mass
on the r=2 annulus at the desired speed, printing tracking stats.
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
from mppi_generic_tpu.costs import DoubleIntegratorCircleCost
from mppi_generic_tpu.models import DoubleIntegratorDynamics
from mppi_generic_tpu.sampling import GaussianDistribution


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    args = ap.parse_args()

    ctrl = VanillaMPPI(
        dynamics=DoubleIntegratorDynamics.create(),
        cost=DoubleIntegratorCircleCost(),
        sampler=GaussianDistribution.create(
            std_dev=[1.0, 1.0], control_cost_coeff=[0.01, 0.01]
        ),
        dt=jnp.float32(0.02),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(0.0),
        num_timesteps=100,
        num_rollouts=2048,
        num_iters=1,
        kernel="pallas" if jax.default_backend() == "tpu" else "combined",
    )
    key = (jax.random.key(0, impl="rbg") if jax.default_backend() == "tpu"
           else jax.random.PRNGKey(0))
    cs = ctrl.init_state(key)
    x0 = jnp.array([2.0, 0.0, 0.0, 1.0])

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

    radii = jnp.sqrt(xs[:, 0] ** 2 + xs[:, 1] ** 2)
    speeds = jnp.sqrt(xs[:, 2] ** 2 + xs[:, 3] ** 2)
    print(f"backend: {jax.default_backend()}  ({total:.2f}s incl. compile)")
    print(f"final radius: {math.sqrt(float(xf[0])**2 + float(xf[1])**2):.3f}"
          f"  (target 2.0)")
    print(f"mean radius (2nd half): {float(jnp.mean(radii[args.steps//2:])):.3f}")
    print(f"mean speed  (2nd half): {float(jnp.mean(speeds[args.steps//2:])):.3f}"
          f"  (target 2.0)")
    print(f"final baseline: {float(baselines[-1]):.3f}")


if __name__ == "__main__":
    main()
