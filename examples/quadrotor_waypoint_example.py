"""Quadrotor waypoint-mission example — flies a gate sequence with the
reference's QuadrotorMapCost waypoint machinery
(cost_functions/quadrotor/quadrotor_map_cost.*): the plant advances
``curr_waypoint`` (prev waypoint + gate posts shift automatically) whenever
the vehicle enters the gate margin, exactly how the reference's planner
thread drives ``updateWaypoint``.

Run:  python examples/quadrotor_waypoint_example.py [--steps 400]
Prints per-gate arrival times and the final mission summary.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import QuadrotorMapCost
from mppi_generic_tpu.models import QuadrotorDynamics
from mppi_generic_tpu.sampling import GaussianDistribution


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--rollouts", type=int, default=1024)
    ap.add_argument("--allow-incomplete", action="store_true",
                    help="exit 0 even if not all gates are reached "
                         "(tiny-scale smoke runs)")
    args = ap.parse_args()

    dyn = QuadrotorDynamics.create(
        control_ranges=[[-3.0, 3.0]] * 3 + [[0.0, 20.0]]
    )
    # three gates along a gentle dog-leg; heading = gate normal direction
    waypoints = [
        (1.5, 0.0, 0.0, jnp.pi / 2),
        (3.0, 0.8, 0.0, jnp.pi / 2),
        (4.5, 1.5, 0.0, jnp.pi / 2),
    ]
    cost = QuadrotorMapCost(
        dist_to_waypoint_coeff=jnp.float32(12.0),
        desired_speed=jnp.float32(1.0),
        heading_coeff=jnp.float32(0.0),
        speed_coeff=jnp.float32(1.0),
        gate_margin=jnp.float32(0.5),
    ).update_waypoint(*waypoints[0])

    ctrl = VanillaMPPI(
        dynamics=dyn,
        cost=cost,
        sampler=GaussianDistribution.create(
            std_dev=[0.5, 0.5, 0.5, 2.0], control_cost_coeff=[0.0] * 4
        ),
        dt=jnp.float32(0.02),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(0.0),
        num_timesteps=48,
        num_rollouts=args.rollouts,
        num_iters=1,
    )
    solve = jax.jit(lambda c, x, cs: c.solve(x, cs))

    x = dyn.get_zero_state()
    hover_u = jnp.tile(jnp.array([0.0, 0.0, 0.0, 9.81]), (48, 1))
    cs = ctrl.init_state(jax.random.PRNGKey(0), initial_mean=hover_u)

    wp_idx = 0
    arrivals = []
    t0 = time.time()
    for step in range(args.steps):
        cs = ctrl.slide_control_sequence(cs, 1)
        res, cs = solve(ctrl, x, cs)
        x, _ = dyn.step(x, res.control_mean[0], 0.0, ctrl.dt)
        wp = waypoints[wp_idx]
        dist = float(jnp.sqrt(
            (x[0] - wp[0]) ** 2 + (x[1] - wp[1]) ** 2 + (x[2] - wp[2]) ** 2
        ))
        if dist < float(ctrl.cost.gate_margin):
            arrivals.append((wp_idx, step, step * float(ctrl.dt)))
            print(f"gate {wp_idx} reached at step {step} "
                  f"(t = {step * float(ctrl.dt):.2f} s), "
                  f"pos = {np.asarray(x[:3]).round(2)}")
            if wp_idx + 1 < len(waypoints):
                wp_idx += 1
                # the reference's planner-thread updateWaypoint: functional
                # param update, carried into the next solve
                ctrl = ctrl.replace(
                    cost=ctrl.cost.update_waypoint(*waypoints[wp_idx])
                )
            else:
                break
    wall = time.time() - t0
    print(f"\nmission: {len(arrivals)}/{len(waypoints)} gates, "
          f"{step + 1} steps simulated; wall {wall:.1f} s "
          f"({wall / max(step + 1, 1) * 1e3:.1f} ms/step incl. dispatch)")
    if len(arrivals) < len(waypoints):
        print("WARNING: mission incomplete")
        if not args.allow_incomplete:
            sys.exit(1)


if __name__ == "__main__":
    main()
