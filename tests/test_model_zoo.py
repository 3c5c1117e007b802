"""Model-zoo tests: quadrotor, autorally NN, racer dubins (+elevation,
+LSTM steering), bicycle slip — unit derivative checks + rollout sanity +
behavioral integration (hover / track following), mirroring
tests/dynamics/* and tests/controllers/vanilla_mppi_test.cu:210 (hover).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppi_generic_tpu.costs import ARStandardCost, QuadrotorQuadraticCost
from mppi_generic_tpu.maps import MapTexture2D
from mppi_generic_tpu.models import (
    AutorallyNNDynamics,
    BicycleSlipDynamics,
    QuadrotorDynamics,
    RacerDubinsDynamics,
    RacerDubinsElevationDynamics,
    RacerDubinsElevationLSTMSteering,
)
from mppi_generic_tpu.models.base import rollout_single
from mppi_generic_tpu.sampling import GaussianDistribution
from mppi_generic_tpu.controllers import VanillaMPPI


# --------------------------- quadrotor ------------------------------------
def test_quadrotor_hover_equilibrium():
    dyn = QuadrotorDynamics.create(mass=1.0)
    x = dyn.get_zero_state()
    u = jnp.array([0.0, 0.0, 0.0, 9.81])  # thrust = m*g
    xdot = dyn.state_deriv(x, u)
    np.testing.assert_allclose(xdot, 0.0, atol=1e-5)


def test_quadrotor_quaternion_normalized():
    dyn = QuadrotorDynamics.create()
    x = dyn.get_zero_state().at[10].set(2.0)  # spin about x
    u = jnp.array([0.0, 0.0, 0.0, 9.81])
    for _ in range(20):
        x, _ = dyn.step(x, u, 0.0, 0.05)
    q_norm = float(jnp.linalg.norm(x[6:10]))
    assert np.isclose(q_norm, 1.0, atol=1e-5)
    assert float(x[6]) >= 0  # sign convention


def test_quadrotor_thrust_direction_follows_attitude():
    dyn = QuadrotorDynamics.create()
    # 90-degree roll: body z points along -world y
    from mppi_generic_tpu.utils.math_utils import euler_to_quat

    q = euler_to_quat(jnp.float32(jnp.pi / 2), jnp.float32(0), jnp.float32(0))
    x = dyn.get_zero_state().at[6:10].set(q)
    u = jnp.array([0.0, 0.0, 0.0, 9.81])
    xdot = dyn.state_deriv(x, u)
    assert float(xdot[4]) < -9.0  # accel in -y
    assert np.isclose(float(xdot[5]), -9.81, atol=1e-3)  # gravity uncancelled


@pytest.mark.slow
def test_quadrotor_hover_mppi():
    """Behavioral: MPPI holds the quadrotor near the origin (the reference's
    hover test, vanilla_mppi_test.cu:210)."""
    dyn = QuadrotorDynamics.create(
        control_ranges=[[-3.0, 3.0]] * 3 + [[0.0, 20.0]]
    )
    cost = QuadrotorQuadraticCost(x_coeff=jnp.float32(50.0), v_coeff=jnp.float32(5.0))
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
        num_rollouts=512,
    )
    x = dyn.get_zero_state().at[0].set(1.0).at[2].set(-0.5)  # offset start
    hover_u = jnp.tile(jnp.array([0.0, 0.0, 0.0, 9.81]), (48, 1))
    cs = ctrl.init_state(jax.random.PRNGKey(0), initial_mean=hover_u)

    def loop(x, cs):
        def body(carry, _):
            x, cs = carry
            cs = ctrl.slide_control_sequence(cs, 1)
            res, cs = ctrl.solve(x, cs)
            x, _ = ctrl.dynamics.step(x, res.control_mean[0], 0.0, ctrl.dt)
            return (x, cs), res.baseline

        return jax.lax.scan(body, (x, cs), None, length=150)

    (xf, _), bl = jax.jit(loop)(x, cs)
    pos_err = float(jnp.linalg.norm(xf[:3]))
    assert pos_err < 0.5, f"hover position error {pos_err}, state {np.asarray(xf)}"


# --------------------------- autorally NN ---------------------------------
def test_autorally_kinematics():
    dyn = AutorallyNNDynamics.create()  # zero NN -> pure kinematics
    x = jnp.array([0.0, 0.0, jnp.pi / 2, 0.0, 2.0, 0.5, 0.1])
    xdot = dyn.state_deriv(x, jnp.zeros(2))
    # x_d = cos(90)*2 - sin(90)*0.5 = -0.5 ; y_d = 2 ; yaw_d = -0.1
    np.testing.assert_allclose(xdot[0], -0.5, atol=1e-5)
    np.testing.assert_allclose(xdot[1], 2.0, atol=1e-5)
    np.testing.assert_allclose(xdot[2], -0.1, atol=1e-6)


def test_autorally_nn_feeds_dynamic_states():
    key = jax.random.PRNGKey(3)
    dyn = AutorallyNNDynamics.create(key=key)
    x = jnp.array([1.0, 2.0, 0.3, 0.05, 3.0, 0.2, 0.4])
    u = jnp.array([0.1, 0.5])
    xdot = dyn.state_deriv(x, u)
    feats = jnp.array([0.05, 3.0, 0.2, 0.4, 0.1, 0.5])
    want = dyn.nn.forward(feats)
    np.testing.assert_allclose(xdot[3:], want, rtol=1e-5)


def test_autorally_with_costmap_controller():
    """AutoRally dynamics + AR costmap cost run end-to-end in MPPI."""
    # straight track along +x: low cost near y=0, high cost away
    H, W = 32, 64
    ys = np.abs(np.linspace(-1, 1, H))[:, None]
    costmap = np.tile(ys, (1, W)).astype(np.float32)
    tex = MapTexture2D.create(
        costmap, origin=(-10.0, -5.0, 0.0), resolution=(10 * 2 / W * 2, 10.0 / H, 1.0)
    )
    cost = ARStandardCost(costmap=tex, desired_speed=jnp.float32(3.0))
    dyn = AutorallyNNDynamics.create(control_ranges=[[-1, 1], [-1, 1]])
    ctrl = VanillaMPPI(
        dynamics=dyn,
        cost=cost,
        sampler=GaussianDistribution.create(std_dev=[0.3, 0.3]),
        dt=jnp.float32(0.02),
        lam=jnp.float32(1.0),
        alpha=jnp.float32(0.0),
        num_timesteps=32,
        num_rollouts=128,
    )
    cs = ctrl.init_state(jax.random.PRNGKey(1))
    x0 = jnp.array([0.0, 0.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    res, _ = ctrl.solve(x0, cs)
    assert np.isfinite(float(res.baseline))


# --------------------------- racer dubins ---------------------------------
def test_racer_dubins_brake_dynamics():
    dyn = RacerDubinsDynamics.create()
    x = jnp.zeros(7).at[0].set(2.0)  # moving forward
    u = jnp.array([-0.5, 0.0])  # braking command
    xdot = dyn.state_deriv(x, u)
    # brake state rises (rate-limited to max_brake_rate_pos)
    assert np.isclose(float(xdot[5]), 0.33, atol=1e-5)
    # with brake state present, velocity derivative opposes motion
    x2 = x.at[5].set(0.2)
    xdot2 = dyn.state_deriv(x2, u)
    assert float(xdot2[0]) < float(xdot[0])


def test_racer_dubins_steering_lag_and_clamp():
    dyn = RacerDubinsDynamics.create()
    x = jnp.zeros(7)
    u = jnp.array([0.0, 1.0])
    xdot = dyn.state_deriv(x, u)
    # (1*5 - 0)*0.6 = 3 < max_steer_rate 5
    assert np.isclose(float(xdot[4]), 3.0, atol=1e-5)
    # steer angle clamped in update
    x_next, _ = dyn.step(x.at[4].set(0.49), u, 0.0, 0.5)
    assert float(x_next[4]) <= 0.5 + 1e-6


def test_racer_dubins_yaw_wrap_and_rollout():
    dyn = RacerDubinsDynamics.create()
    U = jnp.tile(jnp.array([0.5, 0.3]), (80, 1))
    states, outputs = rollout_single(dyn, jnp.zeros(7), U, 0.02)
    assert np.all(np.isfinite(np.asarray(states)))
    assert np.all(np.abs(np.asarray(states)[:, 1]) <= np.pi + 1e-5)


# --------------------------- elevation -----------------------------------
def make_ramp_map():
    """Terrain sloping up along +x: h = 0.1 * x."""
    W, H = 64, 64
    xs = np.linspace(0, 63, W)[None, :] * 0.1
    data = np.tile(xs, (H, 1)).astype(np.float32)
    return MapTexture2D.create(data, origin=(-32.0, -32.0, 0.0), resolution=1.0)


def test_elevation_settling_pitch_on_ramp():
    dyn = RacerDubinsElevationDynamics.create(elevation_map=make_ramp_map())
    x = jnp.zeros(9)  # at origin facing +x (uphill)
    u = jnp.zeros(2)
    x_next, y = dyn.step(x, u, 0.0, 0.02)
    # facing uphill: rear higher... rear-front height diff positive along -x
    # slope 0.1 m/m -> pitch = asin(-0.1*2.981/2.981) ~ -0.0997 rad (nose up
    # convention: rear minus front < 0 going uphill)
    pitch = float(x_next[8])
    assert np.isclose(pitch, np.arcsin(-0.1), atol=0.02), pitch
    roll = float(x_next[7])
    assert abs(roll) < 0.01


def test_elevation_gravity_term_slows_uphill():
    dyn = RacerDubinsElevationDynamics.create(elevation_map=make_ramp_map())
    x = jnp.zeros(9).at[0].set(3.0)
    u = jnp.array([0.5, 0.0])
    xd_flat = dyn.state_deriv(x, u)
    x_up = x.at[8].set(0.3)  # pitched up
    xd_up = dyn.state_deriv(x_up, u)
    assert float(xd_up[0]) < float(xd_flat[0])


def test_elevation_no_map_runs():
    dyn = RacerDubinsElevationDynamics.create(elevation_map=None)
    x_next, y = dyn.step(jnp.zeros(9), jnp.zeros(2), 0.0, 0.02)
    assert np.all(np.isfinite(np.asarray(x_next)))


def test_lstm_steering_recurrent_rollout():
    dyn = RacerDubinsElevationLSTMSteering.create(
        elevation_map=make_ramp_map(), key=jax.random.PRNGKey(7)
    )
    rec = dyn.init_recurrent_state()
    assert rec[0].shape == (16,)
    U = jnp.tile(jnp.array([0.3, 0.5]), (40, 1))
    states, outputs = rollout_single(dyn, jnp.zeros(9), U, 0.02)
    assert np.all(np.isfinite(np.asarray(states)))
    # LSTM correction changes the steering trajectory vs the parametric model
    base = RacerDubinsElevationDynamics.create(elevation_map=make_ramp_map())
    states_b, _ = rollout_single(base, jnp.zeros(9), U, 0.02)
    assert not np.allclose(np.asarray(states)[:, 4], np.asarray(states_b)[:, 4])


def test_lstm_steering_in_mppi_rollout():
    """Recurrent model flows through the batched rollout ops."""
    from mppi_generic_tpu.ops import rollout as ro
    from mppi_generic_tpu.costs import QuadraticCost

    dyn = RacerDubinsElevationLSTMSteering.create(key=jax.random.PRNGKey(8))
    U = jax.random.normal(jax.random.PRNGKey(9), (16, 20, 2)) * 0.3
    Y = ro.rollout_outputs(dyn, jnp.zeros(9), U, 0.02)
    assert Y.shape == (16, 20, 13)
    assert np.all(np.isfinite(np.asarray(Y)))


# --------------------------- bicycle slip ---------------------------------
def test_bicycle_slip_straight_line():
    dyn = BicycleSlipDynamics.create()
    x = jnp.zeros(10).at[5].set(2.0)  # forward velocity
    xdot = dyn.state_deriv(x, jnp.zeros(2))
    np.testing.assert_allclose(float(xdot[0]), 2.0, atol=1e-5)  # x_d = vx
    assert float(xdot[5]) < 0  # rolling drag decelerates


def test_bicycle_slip_lateral_coupling():
    dyn = BicycleSlipDynamics.create()
    x = jnp.zeros(10).at[5].set(3.0).at[7].set(1.0)  # vx=3, omega=1
    xdot = dyn.state_deriv(x, jnp.zeros(2))
    # centripetal term -vx*omega appears in vel_y_d
    assert float(xdot[6]) != 0
    np.testing.assert_allclose(float(xdot[2]), 1.0, atol=1e-6)  # yaw_d = omega


def test_bicycle_slip_rollout_stable():
    dyn = BicycleSlipDynamics.create()
    U = jnp.tile(jnp.array([0.4, 0.2]), (100, 1))
    states, _ = rollout_single(dyn, jnp.zeros(10), U, 0.02)
    assert np.all(np.isfinite(np.asarray(states)))
    assert float(states[-1, 5]) > 0.1  # accelerates forward


# ------------------- bicycle slip + elevation coupling --------------------
def test_bicycle_elevation_map_off_matches_flat_model():
    """Map-off parity: with no elevation/normals map, the 22-state
    elevation variant's shared dynamics states step identically to the
    flat 10-state parametric model (the reference inherits the flat force
    model either way, bicycle_slip_parametric.cuh:83)."""
    from mppi_generic_tpu.models import BicycleSlipParametricElevation

    ele = BicycleSlipParametricElevation.create()
    flat = BicycleSlipDynamics.create()
    x22 = ele.get_zero_state().at[5].set(2.0).at[7].set(0.3).at[3].set(0.1)
    u = jnp.array([0.5, 0.2])
    xn22, y = ele.step(x22, u, 0.0, 0.02)
    xn10, _ = flat.step(x22[:10], u, 0.0, 0.02)
    np.testing.assert_allclose(
        np.asarray(xn22[:8]), np.asarray(xn10[:8]), rtol=1e-6, atol=1e-7
    )
    # flat ground: settling leaves roll/pitch at zero
    assert float(xn22[8]) == 0.0 and float(xn22[9]) == 0.0
    # steer-rate write-back (updateState, bicycle_slip_parametric.cu:161)
    assert float(xn22[10]) != 0.0
    assert y.shape == (14,)


def test_bicycle_elevation_settling_on_ramp():
    """Map-on: the elevation texture pitches the vehicle on a ramp exactly
    like the RacerDubins elevation family (shared computeStaticSettling)."""
    from mppi_generic_tpu.models import BicycleSlipParametricElevation

    dyn = BicycleSlipParametricElevation.create(elevation_map=make_ramp_map())
    x = dyn.get_zero_state()  # at origin facing +x (uphill)
    x_next, y = dyn.step(x, jnp.zeros(2), 0.0, 0.02)
    pitch = float(x_next[9])
    assert np.isclose(pitch, np.arcsin(-0.1), atol=0.02), pitch
    # output carries the settled attitude + terrain height
    assert np.isclose(float(y[7]), pitch, atol=1e-6)


def test_bicycle_elevation_uncertainty_grows():
    """The packed covariance block (state[12:22]) propagates
    Sigma' = (I+A dt) Sigma (I+A dt)^T + Q dt each step and stays PSD on
    the diagonal entries (computeUncertaintyPropagation reuse)."""
    from mppi_generic_tpu.models import BicycleSlipParametricElevation

    dyn = BicycleSlipParametricElevation.create()
    x = dyn.get_zero_state().at[5].set(3.0)
    u = jnp.array([0.5, 0.3])
    for _ in range(5):
        x, _ = dyn.step(x, u, 0.0, 0.02)
    # diagonal entries [px, py, yaw, vx] at indices 12..15
    diag = np.asarray(x[12:16])
    assert np.all(diag >= 0)
    assert diag[3] > 0  # Q_vv feeds vel_x variance at speed
    assert np.all(np.isfinite(np.asarray(x)))


def test_bicycle_elevation_normals_gravity_terms():
    """A 3-channel surface-normals texture adds the body-frame gravity
    accelerations (computeBodyFrameNormals + tanhshrink gravity terms,
    bicycle_slip_parametric.cu:264-268, 391-466)."""
    from mppi_generic_tpu.models import BicycleSlipParametricElevation

    # normals tilted toward -x: n = (-sin a, 0, cos a), a ~ 30 deg
    W = H = 32
    n = np.zeros((H, W, 3), np.float32)
    n[..., 0] = -0.5
    n[..., 2] = np.sqrt(1 - 0.25)
    nmap = MapTexture2D.create(n, origin=(-16.0, -16.0, 0.0), resolution=1.0)
    dyn = BicycleSlipParametricElevation.create(normals_map=nmap)
    ref = BicycleSlipParametricElevation.create()
    x = dyn.get_zero_state().at[5].set(2.0)
    u = jnp.zeros(2)
    d_with = dyn.state_deriv(x, u)
    d_flat = ref.state_deriv(x, u)
    # gravity_x < 0 and n_x < 0 -> tanhshrink(n_x)*g_x > 0 -> -term < 0:
    # the slope decelerates vel_x relative to flat ground
    assert float(d_with[5]) < float(d_flat[5])
    np.testing.assert_allclose(
        float(d_with[0]), float(d_flat[0]), atol=1e-6
    )
