from mppi_generic_tpu.costs.base import Cost
from mppi_generic_tpu.costs.quadratic import QuadraticCost
from mppi_generic_tpu.costs.cartpole import CartpoleQuadraticCost
from mppi_generic_tpu.costs.double_integrator import DoubleIntegratorCircleCost

__all__ = [
    "Cost",
    "QuadraticCost",
    "CartpoleQuadraticCost",
    "DoubleIntegratorCircleCost",
]
