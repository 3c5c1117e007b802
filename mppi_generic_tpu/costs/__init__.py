from mppi_generic_tpu.costs.base import Cost
from mppi_generic_tpu.costs.quadratic import QuadraticCost
from mppi_generic_tpu.costs.cartpole import CartpoleQuadraticCost
from mppi_generic_tpu.costs.double_integrator import (
    DoubleIntegratorCircleCost,
    DoubleIntegratorRobustCost,
)
from mppi_generic_tpu.costs.autorally import ARRobustCost, ARStandardCost
from mppi_generic_tpu.costs.quadrotor import QuadrotorMapCost, QuadrotorQuadraticCost

__all__ = [
    "Cost",
    "QuadraticCost",
    "CartpoleQuadraticCost",
    "DoubleIntegratorCircleCost",
    "DoubleIntegratorRobustCost",
    "ARStandardCost",
    "ARRobustCost",
    "QuadrotorQuadraticCost",
    "QuadrotorMapCost",
]
