from mppi_generic_tpu.ops.autotune import choose_appropriate_kernel
from mppi_generic_tpu.ops.pallas_rollout import (
    PallasIncompatible,
    fused_rollout_costs,
    fused_weighted_rollout,
)
from mppi_generic_tpu.ops.rollout import (
    rollout_combined,
    rollout_outputs,
    trajectory_state_costs,
)
from mppi_generic_tpu.ops.visualize import (
    VisualizationResult,
    select_visualization_samples,
    visualize,
    visualize_rollouts,
)
from mppi_generic_tpu.ops.weights import (
    FreeEnergyStats,
    compute_free_energy,
    norm_exp_weights,
)

__all__ = [
    "PallasIncompatible",
    "choose_appropriate_kernel",
    "fused_rollout_costs",
    "fused_weighted_rollout",
    "rollout_combined",
    "rollout_outputs",
    "trajectory_state_costs",
    "FreeEnergyStats",
    "compute_free_energy",
    "norm_exp_weights",
]
