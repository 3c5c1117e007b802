"""Quadrotor map-cost waypoint machinery tests.

Parity target: reference ``cost_functions/quadrotor/quadrotor_map_cost.*``
(curr/prev/end waypoints, gate boundaries, per-term cost decomposition) with
the reference's test patterns from ``tests/cost_functions/``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import QuadrotorMapCost
from mppi_generic_tpu.maps.texture import MapTexture2D
from mppi_generic_tpu.models import QuadrotorDynamics
from mppi_generic_tpu.sampling import GaussianDistribution


def hover_output(x=0.0, y=0.0, z=0.0, vx=0.0, vy=0.0, vz=0.0):
    out = jnp.zeros(13, jnp.float32).at[6].set(1.0)
    return out.at[0].set(x).at[1].set(y).at[2].set(z).at[3].set(vx).at[4].set(vy).at[5].set(vz)


# ------------------------- waypoint machinery ------------------------------


def test_update_waypoint_advances_prev_and_gates():
    """updateWaypoint: prev <- curr, curr <- new, gate posts at
    +-gate_width along the heading (quadrotor_map_cost.cuh:62-76)."""
    cost = QuadrotorMapCost()
    c1 = cost.update_waypoint(1.0, 2.0, 3.0, 0.0)
    np.testing.assert_allclose(np.asarray(c1.curr_waypoint), [1, 2, 3, 0])
    np.testing.assert_allclose(np.asarray(c1.prev_waypoint), [0, 0, 0, 0])
    gw = float(cost.gate_width)
    np.testing.assert_allclose(
        np.asarray(c1.curr_gate_left), [1 + gw, 2, 3], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(c1.curr_gate_right), [1 - gw, 2, 3], atol=1e-6
    )
    # second advance: histories shift
    c2 = c1.update_waypoint(5.0, 2.0, 3.0, jnp.pi / 2)
    np.testing.assert_allclose(np.asarray(c2.prev_waypoint), [1, 2, 3, 0])
    np.testing.assert_allclose(
        np.asarray(c2.prev_gate_left), np.asarray(c1.curr_gate_left)
    )
    np.testing.assert_allclose(
        np.asarray(c2.curr_gate_left), [5, 2 + gw, 3], atol=1e-5
    )


def test_update_waypoint_noop_when_unchanged():
    """Re-sending the same waypoint must NOT shift prev (the reference's
    changed-check, quadrotor_map_cost.cuh:64-75)."""
    cost = QuadrotorMapCost().update_waypoint(1.0, 0.0, 0.0, 0.0)
    again = cost.update_waypoint(1.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(
        np.asarray(again.prev_waypoint), np.asarray(cost.prev_waypoint)
    )
    np.testing.assert_allclose(
        np.asarray(again.prev_gate_left), np.asarray(cost.prev_gate_left)
    )


def test_update_gate_boundaries_shift():
    cost = QuadrotorMapCost()
    c1 = cost.update_gate_boundaries([1.0, 2.0, 0.0], [3.0, 4.0, 0.0])
    np.testing.assert_allclose(np.asarray(c1.curr_gate_left), [1, 2, 0])
    c2 = c1.update_gate_boundaries([5.0, 6.0, 0.0], [7.0, 8.0, 0.0])
    np.testing.assert_allclose(np.asarray(c2.prev_gate_left), [1, 2, 0])
    np.testing.assert_allclose(np.asarray(c2.prev_gate_right), [3, 4, 0])


# --------------------------- cost terms ------------------------------------


def test_hover_at_waypoint_hand_value():
    """Hover at the (origin) waypoint: only the speed term (5*(0-5)^2=125)
    and the gate-pass reward (-150) fire -> total -25."""
    cost = QuadrotorMapCost()
    c, crash = cost.state_cost(hover_output(), 0, jnp.int32(0))
    np.testing.assert_allclose(float(c), 125.0 - 150.0, atol=1e-4)
    assert int(crash) == 0


def test_waypoint_distance_term():
    """dist_to_waypoint_coeff * dist^2 (computeWaypointCost) pulls toward
    the current waypoint."""
    cost = QuadrotorMapCost(
        dist_to_waypoint_coeff=jnp.float32(2.0),
        speed_coeff=jnp.float32(0.0),
        heading_coeff=jnp.float32(0.0),
        height_coeff=jnp.float32(0.0),
    ).update_waypoint(3.0, 4.0, 0.0, 0.0)
    c_far, _ = cost.state_cost(hover_output(), 0, jnp.int32(0))
    c_near, _ = cost.state_cost(hover_output(x=3.0, y=3.0), 0, jnp.int32(0))
    # far: dist=5 -> 2*25=50 ; near: dist=1 -> 2*1 + gate-pass... margin 0.5
    np.testing.assert_allclose(float(c_far), 50.0, atol=1e-4)
    np.testing.assert_allclose(float(c_near), 2.0, atol=1e-4)
    assert float(c_near) < float(c_far)


def test_gate_pass_reward_inside_margin():
    cost = QuadrotorMapCost(
        speed_coeff=jnp.float32(0.0), heading_coeff=jnp.float32(0.0)
    ).update_waypoint(2.0, 0.0, 0.0, 0.0)
    c_at, _ = cost.state_cost(hover_output(x=2.0), 0, jnp.int32(0))
    c_off, _ = cost.state_cost(hover_output(x=4.0), 0, jnp.int32(0))
    assert float(c_at) < float(c_off)
    assert float(c_at) <= float(cost.gate_pass_cost) + 1e-3


def test_height_interpolation_between_waypoints():
    """Height target interpolates prev.z -> curr.z by inverse xy distance
    (computeHeightCost, quadrotor_map_cost.cu:326-358)."""
    cost = QuadrotorMapCost(
        speed_coeff=jnp.float32(0.0),
        heading_coeff=jnp.float32(0.0),
        gate_pass_cost=jnp.float32(0.0),
    )
    cost = cost.replace(
        prev_waypoint=jnp.array([0.0, 0.0, 1.0, 0.0]),
        curr_waypoint=jnp.array([10.0, 0.0, 3.0, 0.0]),
    )
    # midway: d1 = d2 = 5 -> w1 = w2 = 0.5 -> interp = 0.5*1 + 0.5*3 = 2
    c_on, _ = cost.state_cost(hover_output(x=5.0, z=2.0), 0, jnp.int32(0))
    c_off, _ = cost.state_cost(hover_output(x=5.0, z=0.0), 0, jnp.int32(0))
    np.testing.assert_allclose(float(c_on), 0.0, atol=1e-2)
    # off by 2m: 5 * 4 = 20 (+400 beyond gate_width of squared error)
    np.testing.assert_allclose(float(c_off), 5.0 * 4.0 + 400.0, atol=0.1)


def test_gate_side_collision_sets_crash():
    """Flying into the band just outside a gate post crashes
    (computeGateSideCost -> crash_status, quadrotor_map_cost.cu:104-117)."""
    cost = QuadrotorMapCost(
        speed_coeff=jnp.float32(0.0), heading_coeff=jnp.float32(0.0)
    ).update_waypoint(0.0, 0.0, 0.0, jnp.pi / 2)  # posts at y = +-gate_width
    # just past the left post (y > gate_width), on the gate line (x ~ 0)
    gw = float(cost.gate_width)
    y_hit = hover_output(x=0.0, y=gw + 0.3)
    c, crash = cost.state_cost(y_hit, 0, jnp.int32(0))
    assert int(crash) == 1
    assert float(c) > float(cost.crash_coeff)
    # through the middle of the gate: no crash
    c_mid, crash_mid = cost.state_cost(hover_output(), 0, jnp.int32(0))
    assert int(crash_mid) == 0


def test_heading_cost_gated_by_margin():
    """Outside the gate margin the velocity heading must point at the
    waypoint (computeHeadingCost, quadrotor_map_cost.cu:212-241)."""
    cost = QuadrotorMapCost(
        speed_coeff=jnp.float32(0.0), height_coeff=jnp.float32(0.0)
    ).update_waypoint(10.0, 0.0, 0.0, 0.0)
    towards = hover_output(vx=2.0)   # velocity towards +x = waypoint
    away = hover_output(vy=2.0)      # velocity perpendicular
    c_t, _ = cost.state_cost(towards, 0, jnp.int32(0))
    c_a, _ = cost.state_cost(away, 0, jnp.int32(0))
    np.testing.assert_allclose(float(c_t), 0.0, atol=1e-3)
    np.testing.assert_allclose(
        float(c_a), float(cost.heading_coeff) * np.pi / 2, atol=1e-3
    )


def test_costmap_track_and_offmap_penalties():
    """computeCostmapCost: track_coeff scaling above track_slop,
    crash_coeff above track_boundary_cost and off-map."""
    data = jnp.zeros((8, 8), jnp.float32).at[4, 4].set(5.0).at[2, 2].set(1.0)
    tex = MapTexture2D.create(data, origin=(0.0, 0.0, 0.0), resolution=1.0)
    cost = QuadrotorMapCost(
        costmap=tex,
        speed_coeff=jnp.float32(0.0),
        heading_coeff=jnp.float32(0.0),
        gate_pass_cost=jnp.float32(0.0),
    )
    on_track, _ = cost.state_cost(hover_output(x=1.0, y=1.0), 0, jnp.int32(0))
    rough, _ = cost.state_cost(hover_output(x=2.5, y=2.5), 0, jnp.int32(0))
    wall, _ = cost.state_cost(hover_output(x=4.5, y=4.5), 0, jnp.int32(0))
    off, _ = cost.state_cost(hover_output(x=50.0, y=50.0), 0, jnp.int32(0))
    assert float(on_track) < float(rough) < float(wall)
    assert float(wall) >= float(cost.crash_coeff)
    assert float(off) >= float(cost.crash_coeff)


# ------------------------ behavioral mission -------------------------------


@pytest.mark.slow
def test_waypoint_progression_straight_line_mission():
    """Behavioral: MPPI with the waypoint cost flies a straight-line
    two-gate mission, the plant advancing curr_waypoint whenever the
    vehicle enters the gate margin — the VERDICT's waypoint-progression
    scenario (reference usage: updateWaypoint from the planner thread)."""
    dyn = QuadrotorDynamics.create(
        control_ranges=[[-3.0, 3.0]] * 3 + [[0.0, 20.0]]
    )
    waypoints = [(2.0, 0.0, 0.0), (4.0, 0.0, 0.0)]
    cost = QuadrotorMapCost(
        dist_to_waypoint_coeff=jnp.float32(4.0),
        desired_speed=jnp.float32(1.5),
        heading_coeff=jnp.float32(0.0),
        speed_coeff=jnp.float32(1.0),
        gate_margin=jnp.float32(0.5),
    ).update_waypoint(*waypoints[0], jnp.pi / 2)

    def build(cost):
        return VanillaMPPI(
            dynamics=dyn,
            cost=cost,
            sampler=GaussianDistribution.create(
                std_dev=[0.5, 0.5, 0.5, 2.0], control_cost_coeff=[0.0] * 4
            ),
            dt=jnp.float32(0.02),
            lam=jnp.float32(1.0),
            alpha=jnp.float32(0.0),
            num_timesteps=48,
            num_rollouts=512,
        )

    ctrl = build(cost)
    solve = jax.jit(lambda c, x, cs: c.solve(x, cs))
    x = dyn.get_zero_state()
    hover_u = jnp.tile(jnp.array([0.0, 0.0, 0.0, 9.81]), (48, 1))
    cs = ctrl.init_state(jax.random.PRNGKey(0), initial_mean=hover_u)

    reached = 0
    wp_idx = 0
    for step in range(300):
        cs = ctrl.slide_control_sequence(cs, 1)
        res, cs = solve(ctrl, x, cs)
        x, _ = dyn.step(x, res.control_mean[0], 0.0, ctrl.dt)
        wp = waypoints[wp_idx]
        dist = float(
            jnp.sqrt((x[0] - wp[0]) ** 2 + (x[1] - wp[1]) ** 2
                     + (x[2] - wp[2]) ** 2)
        )
        if dist < float(ctrl.cost.gate_margin):
            reached += 1
            if wp_idx + 1 < len(waypoints):
                wp_idx += 1
                new_cost = ctrl.cost.update_waypoint(*waypoints[wp_idx],
                                                     jnp.pi / 2)
                ctrl = ctrl.replace(cost=new_cost)
            else:
                break
    assert reached >= 2, (
        f"mission reached {reached} waypoints; final state {np.asarray(x[:3])}"
    )
    # waypoint history advanced the way the reference's params do
    np.testing.assert_allclose(
        np.asarray(ctrl.cost.prev_waypoint)[:3], waypoints[0]
    )
    np.testing.assert_allclose(
        np.asarray(ctrl.cost.curr_waypoint)[:3], waypoints[1]
    )


def test_quadrotor_waypoint_cost_fused_kernel_interpret():
    """The waypoint cost's component math (atan2/asin approximations, no
    trailing-axis ops without a costmap) traces inside the fused Pallas
    rollout kernel with the quadrotor's quaternion dynamics."""
    from mppi_generic_tpu.ops import pallas_rollout, rollout as rollout_ops

    dyn = QuadrotorDynamics.create(
        control_ranges=[[-3.0, 3.0]] * 3 + [[0.0, 20.0]]
    )
    cost = QuadrotorMapCost(
        dist_to_waypoint_coeff=jnp.float32(4.0)
    ).update_waypoint(2.0, 0.0, 0.0, 0.0)
    K, T = 32, 8
    x0 = dyn.get_zero_state()
    U = jnp.tile(jnp.array([0.0, 0.0, 0.0, 9.81]), (K, T, 1)) + (
        0.3 * jax.random.normal(jax.random.PRNGKey(0), (K, T, 4))
    )
    c_ref, _, _ = rollout_ops.rollout_combined(
        dyn, cost, x0, U, jnp.float32(0.02)
    )
    c_p, _ = pallas_rollout.fused_rollout_costs(
        dyn, cost, x0, U, jnp.float32(0.02)
    )
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)
