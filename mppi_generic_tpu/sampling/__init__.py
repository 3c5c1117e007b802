from mppi_generic_tpu.sampling.base import SamplingDistribution
from mppi_generic_tpu.sampling.gaussian import GaussianDistribution
from mppi_generic_tpu.sampling.colored import (
    ColoredNoiseDistribution,
    powerlaw_psd_gaussian,
)
from mppi_generic_tpu.sampling.nln import NLNDistribution
from mppi_generic_tpu.sampling.smooth import SmoothMPPIDistribution
from mppi_generic_tpu.sampling.piecewise_linear import PiecewiseLinearDistribution

__all__ = [
    "SamplingDistribution",
    "GaussianDistribution",
    "ColoredNoiseDistribution",
    "NLNDistribution",
    "SmoothMPPIDistribution",
    "PiecewiseLinearDistribution",
    "powerlaw_psd_gaussian",
]
