from mppi_generic_tpu.sampling.base import SamplingDistribution
from mppi_generic_tpu.sampling.gaussian import GaussianDistribution

__all__ = ["SamplingDistribution", "GaussianDistribution"]
