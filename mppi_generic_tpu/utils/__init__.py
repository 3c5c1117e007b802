from mppi_generic_tpu.utils import math_utils
from mppi_generic_tpu.utils import risk
