from mppi_generic_tpu.ops.rollout import (
    rollout_combined,
    rollout_outputs,
    trajectory_state_costs,
)
from mppi_generic_tpu.ops.weights import (
    FreeEnergyStats,
    compute_free_energy,
    norm_exp_weights,
)

__all__ = [
    "rollout_combined",
    "rollout_outputs",
    "trajectory_state_costs",
    "FreeEnergyStats",
    "compute_free_energy",
    "norm_exp_weights",
]
