from mppi_generic_tpu.models.base import Dynamics
from mppi_generic_tpu.models.double_integrator import DoubleIntegratorDynamics
from mppi_generic_tpu.models.cartpole import CartpoleDynamics
from mppi_generic_tpu.models.dubins import DubinsDynamics
from mppi_generic_tpu.models.quadrotor import QuadrotorDynamics
from mppi_generic_tpu.models.autorally import AutorallyNNDynamics
from mppi_generic_tpu.models.racer_dubins import RacerDubinsDynamics
from mppi_generic_tpu.models.racer_dubins_elevation import (
    RacerDubinsElevationDynamics,
    RacerDubinsElevationLSTMSteering,
)
from mppi_generic_tpu.models.bicycle_slip import (
    BicycleSlipDynamics,
    BicycleSlipParametricElevation,
)
from mppi_generic_tpu.models.racer_suspension import RacerSuspensionDynamics
from mppi_generic_tpu.models.racer_dubins_unc import (
    RacerDubinsElevationSuspension,
    RacerDubinsElevationLSTMUncertainty,
)

__all__ = [
    "Dynamics",
    "DoubleIntegratorDynamics",
    "CartpoleDynamics",
    "DubinsDynamics",
    "QuadrotorDynamics",
    "AutorallyNNDynamics",
    "RacerDubinsDynamics",
    "RacerDubinsElevationDynamics",
    "RacerDubinsElevationLSTMSteering",
    "BicycleSlipDynamics",
    "BicycleSlipParametricElevation",
    "RacerSuspensionDynamics",
    "RacerDubinsElevationSuspension",
    "RacerDubinsElevationLSTMUncertainty",
]
