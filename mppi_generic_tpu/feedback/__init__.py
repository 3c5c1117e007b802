from mppi_generic_tpu.feedback.base import FeedbackController, NoFeedback
from mppi_generic_tpu.feedback.ccm import (
    CCMFeedback,
    chebyshev_points,
    chebyshev_polynomial,
)
from mppi_generic_tpu.feedback.ilqr import DDPFeedback, ilqr_tracking

__all__ = [
    "FeedbackController",
    "NoFeedback",
    "DDPFeedback",
    "ilqr_tracking",
    "CCMFeedback",
    "chebyshev_points",
    "chebyshev_polynomial",
]
