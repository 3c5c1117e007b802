"""Per-robot convenience instantiations — parity with the reference's
``include/mppi/instantiations/*`` typedef headers. Each factory wires a
fully-configured controller at the reference's published scales; every knob
can be overridden.

The CUDA block-size constants (BLOCKSIZE_X/Y) have no TPU meaning — the
kernel auto-tuner (ops/autotune.py) plays that role.
"""

from __future__ import annotations

import jax.numpy as jnp

from mppi_generic_tpu.controllers import VanillaMPPI
from mppi_generic_tpu.costs import (
    ARStandardCost,
    CartpoleQuadraticCost,
    DoubleIntegratorCircleCost,
    QuadrotorQuadraticCost,
)
from mppi_generic_tpu.feedback import DDPFeedback
from mppi_generic_tpu.models import (
    AutorallyNNDynamics,
    CartpoleDynamics,
    DoubleIntegratorDynamics,
    QuadrotorDynamics,
)
from mppi_generic_tpu.sampling import GaussianDistribution


def _controller(dynamics, cost, std_dev, *, num_rollouts, num_timesteps,
                dt=0.02, lam=1.0, alpha=0.0, num_iters=1, kernel="combined",
                control_cost_coeff=None, **kw):
    C = dynamics.CONTROL_DIM
    if control_cost_coeff is None:
        control_cost_coeff = [0.0] * C
    ctrl = VanillaMPPI(
        dynamics=dynamics,
        cost=cost,
        sampler=GaussianDistribution.create(
            std_dev=std_dev, control_cost_coeff=control_cost_coeff
        ),
        dt=jnp.float32(dt),
        lam=jnp.float32(lam),
        alpha=jnp.float32(alpha),
        num_timesteps=num_timesteps,
        num_rollouts=num_rollouts,
        num_iters=num_iters,
        kernel=kernel,
        **kw,
    )
    feedback = DDPFeedback.create(dynamics, jnp.float32(dt))
    return ctrl, feedback


def autorally_mppi(num_rollouts=1920, num_timesteps=150, nn=None,
                   costmap=None, **kw):
    """AutoRally NN-dynamics racing setup
    (instantiations/autorally_mppi/autorally_mppi.cuh:10-18: 1920 rollouts,
    150 timesteps, NeuralNetModel<7,2,3> + ARStandardCost + DDP feedback).
    ``costmap``: a MapTexture2D track map (costmapToTexture analog); without
    one the track term is zero (on-track everywhere)."""
    dyn = AutorallyNNDynamics.create(nn=nn)
    return _controller(
        dyn, ARStandardCost(costmap=costmap), [0.3, 0.5],
        num_rollouts=num_rollouts, num_timesteps=num_timesteps, **kw,
    )


def cartpole_mppi(num_rollouts=2048, num_timesteps=100, **kw):
    """Cartpole swing-up (instantiations/cartpole_mppi +
    examples/cartpole_example.cu:29-48 scales)."""
    dyn = CartpoleDynamics.create(control_ranges=[[-5.0, 5.0]])
    return _controller(
        dyn, CartpoleQuadraticCost(), [5.0],
        num_rollouts=num_rollouts, num_timesteps=num_timesteps, **kw,
    )


def double_integrator_mppi(num_rollouts=1024, num_timesteps=100, **kw):
    """Double-integrator circle tracking
    (instantiations/double_integrator_mppi)."""
    dyn = DoubleIntegratorDynamics.create()
    return _controller(
        dyn, DoubleIntegratorCircleCost(), [1.0, 1.0],
        num_rollouts=num_rollouts, num_timesteps=num_timesteps, **kw,
    )


def quadrotor_mppi(num_rollouts=2048, num_timesteps=100, **kw):
    """Quadrotor hover/waypoint (instantiations/quadrotor_mppi)."""
    dyn = QuadrotorDynamics.create()
    return _controller(
        dyn, QuadrotorQuadraticCost(), [2.0, 0.5, 0.5, 0.5],
        num_rollouts=num_rollouts, num_timesteps=num_timesteps, **kw,
    )


def quadrotor_waypoint_mppi(num_rollouts=1024, num_timesteps=48,
                            costmap=None, **kw):
    """Quadrotor gate-mission setup with the waypoint map cost
    (quadrotor_map_cost.*; see examples/quadrotor_waypoint_example.py).
    Drive waypoints with ``ctrl.cost.update_waypoint(x, y, z, heading)``."""
    from mppi_generic_tpu.costs import QuadrotorMapCost

    dyn = QuadrotorDynamics.create(
        control_ranges=[[-3.0, 3.0]] * 3 + [[0.0, 20.0]]
    )
    cost = QuadrotorMapCost(
        costmap=costmap,
        dist_to_waypoint_coeff=jnp.float32(8.0),
        desired_speed=jnp.float32(1.5),
    )
    return _controller(
        dyn, cost, [0.5, 0.5, 0.5, 2.0],
        num_rollouts=num_rollouts, num_timesteps=num_timesteps, **kw,
    )


def racer_lstm_mppi(num_rollouts=1920, num_timesteps=150,
                    elevation_map=None, costmap=None, **kw):
    """RACER LSTM-uncertainty vehicle at the real-platform scale
    (racer_dubins_elevation_lstm_unc.*; 1920 rollouts x 150 steps). Flat
    ground runs in the fused Pallas kernel (~1 ms/solve on a v5e chip);
    with an ``elevation_map`` the auto-tuner selects the XLA path."""
    from mppi_generic_tpu.models import RacerDubinsElevationLSTMUncertainty

    dyn = RacerDubinsElevationLSTMUncertainty.create(
        elevation_map=elevation_map
    )
    cost = ARStandardCost(costmap=costmap, output_indices=(2, 3, 5, 6, 0, 1))
    return _controller(
        dyn, cost, [0.3, 0.5],
        num_rollouts=num_rollouts, num_timesteps=num_timesteps, **kw,
    )


__all__ = [
    "autorally_mppi",
    "cartpole_mppi",
    "double_integrator_mppi",
    "quadrotor_mppi",
    "quadrotor_waypoint_mppi",
    "racer_lstm_mppi",
]
