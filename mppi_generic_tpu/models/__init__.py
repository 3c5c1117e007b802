from mppi_generic_tpu.models.base import Dynamics
from mppi_generic_tpu.models.double_integrator import DoubleIntegratorDynamics
from mppi_generic_tpu.models.cartpole import CartpoleDynamics
from mppi_generic_tpu.models.dubins import DubinsDynamics

__all__ = [
    "Dynamics",
    "DoubleIntegratorDynamics",
    "CartpoleDynamics",
    "DubinsDynamics",
]
