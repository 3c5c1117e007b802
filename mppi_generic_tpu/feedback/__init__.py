from mppi_generic_tpu.feedback.base import FeedbackController, NoFeedback
from mppi_generic_tpu.feedback.ilqr import DDPFeedback, ilqr_tracking

__all__ = ["FeedbackController", "NoFeedback", "DDPFeedback", "ilqr_tracking"]
