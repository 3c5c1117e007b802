from mppi_generic_tpu.controllers.base import ControllerBase, SolveResult
from mppi_generic_tpu.controllers.vanilla import VanillaMPPI

__all__ = ["ControllerBase", "SolveResult", "VanillaMPPI"]
