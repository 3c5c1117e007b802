"""mppi_generic_tpu — a TPU-native MPPI (Model Predictive Path Integral) control
framework built from scratch in JAX/XLA/Pallas.

Capability-parity rebuild of the C++/CUDA MPPI-Generic library
(ACDSLab/MPPI-Generic): pluggable dynamics, cost functions, sampling
distributions, weight transforms, feedback controllers (DDP/iLQR), and
controllers (vanilla/Tube/Robust/Colored MPPI) — redesigned TPU-first:

* rollouts = ``vmap`` over samples of ``lax.scan`` over the horizon
  (optionally fused into a single Pallas kernel),
* sample-axis sharding over a ``jax.sharding.Mesh`` with XLA collectives,
* one jitted program per solve (no host<->device ping-pong per iteration).
"""

__version__ = "0.1.0"

from mppi_generic_tpu.models.base import Dynamics
from mppi_generic_tpu.costs.base import Cost
from mppi_generic_tpu.sampling.base import SamplingDistribution
from mppi_generic_tpu.sampling.gaussian import GaussianDistribution
from mppi_generic_tpu.controllers.vanilla import VanillaMPPI

__all__ = [
    "Dynamics",
    "Cost",
    "SamplingDistribution",
    "GaussianDistribution",
    "VanillaMPPI",
]
