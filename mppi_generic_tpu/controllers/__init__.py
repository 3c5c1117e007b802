from mppi_generic_tpu.controllers.base import ControllerBase, ControllerState, SolveResult
from mppi_generic_tpu.controllers.vanilla import VanillaMPPI
from mppi_generic_tpu.controllers.colored import ColoredMPPI
from mppi_generic_tpu.controllers.tube import TubeMPPI, TubeControllerState, TubeSolveResult
from mppi_generic_tpu.controllers.robust import (
    RobustMPPI,
    RobustControllerState,
    RobustSolveResult,
)
from mppi_generic_tpu.controllers.primitives import (
    PrimitivesController,
    PrimitivesControllerState,
    PrimitivesSolveResult,
)

__all__ = [
    "ControllerBase",
    "ControllerState",
    "SolveResult",
    "VanillaMPPI",
    "ColoredMPPI",
    "TubeMPPI",
    "TubeControllerState",
    "TubeSolveResult",
    "RobustMPPI",
    "RobustControllerState",
    "RobustSolveResult",
    "PrimitivesController",
    "PrimitivesControllerState",
    "PrimitivesSolveResult",
]
