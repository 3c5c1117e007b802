"""AutoRally neural-network dynamics.

Parity target: reference ``dynamics/autorally/ar_nn_model.{cuh,cu}``
(NeuralNetModel<7, 2, 3>): a 7-state ground vehicle whose first 3 state
derivatives are analytic kinematics and whose last DYNAMICS_DIM = 4
derivatives come from an FNN over [state[3:], control]:

* state [x, y, yaw, roll, u_x, u_y, yaw_rate]
* kinematics (ar_nn_model.cu:91-97):
    x_d  = cos(yaw) u_x - sin(yaw) u_y
    y_d  = sin(yaw) u_x + cos(yaw) u_y
    yaw_d = -yaw_rate   (pose estimate gives negative yaw derivative)
* dynamics (ar_nn_model.cu:100-120): FNN([roll, u_x, u_y, yaw_rate,
  steering, throttle]) -> [roll_d, u_x_d, u_y_d, yaw_rate_d]

The classic AutoRally network is 6-32-32-4 (autorally_nnet npz); any FNN
with matching input/output dims plugs in.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mppi_generic_tpu.models.base import Dynamics
from mppi_generic_tpu.nn.fnn import FNN
from mppi_generic_tpu.utils import math_utils


class AutorallyNNDynamics(Dynamics):
    STATE_DIM: int = struct.field(pytree_node=False, default=7)
    CONTROL_DIM: int = struct.field(pytree_node=False, default=2)
    OUTPUT_DIM: int = struct.field(pytree_node=False, default=7)
    K_DIM: int = struct.field(pytree_node=False, default=3)

    nn: FNN = None

    @classmethod
    def create(cls, nn=None, key=None, **constraints):
        kw = cls._default_constraints(**constraints)
        if nn is None:
            # default architecture of the autorally nnet (6-32-32-4)
            nn = FNN.create([6, 32, 32, 4], key=key)
        assert nn.input_dim == cls.STATE_DIM - cls.K_DIM + cls.CONTROL_DIM
        assert nn.output_dim == cls.STATE_DIM - cls.K_DIM
        return cls(nn=nn, **kw)

    @classmethod
    def from_npz(cls, npz, prefix: str = "", **constraints):
        """Load the FNN from the reference npz layout (dynamics_W{i}/b{i})."""
        return cls.create(nn=FNN.from_npz(npz, prefix), **constraints)

    def state_deriv(self, x, u, t=0.0):
        yaw = x[2]
        cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
        x_d = cos_y * x[4] - sin_y * x[5]
        y_d = sin_y * x[4] + cos_y * x[5]
        yaw_d = -x[6]

        # NN input: dynamic states then controls, component-first so the
        # same code runs per-vector, under vmap, and inside Pallas kernels
        # (forward_axis0 flattens batch dims into the matmul minor axis).
        feats = jnp.stack([x[3], x[4], x[5], x[6], u[0], u[1]])  # (6, ...)
        deriv = self.nn.forward_axis0(feats)  # (4, ...)
        return jnp.concatenate(
            [jnp.stack([x_d, y_d, yaw_d]), deriv], axis=0
        )

    def update_state(self, x, xdot, dt):
        x_next = x + xdot * dt
        wrapped = math_utils.normalize_angle(x_next[2])
        head = jnp.stack([x_next[0], x_next[1], wrapped])
        return jnp.concatenate([head, x_next[3:]], axis=0)

    def state_from_map(self, mapping):
        keys = ["POS_X", "POS_Y", "YAW", "ROLL", "VEL_X", "VEL_Y", "YAW_RATE"]
        return jnp.array([mapping[k] for k in keys], jnp.float32)
