"""Metric measures + epoch trackers."""

from soccerplayershapepose_tpu.metrics.measures import (  # noqa: F401
    pve, pve_sc, pve_pa, mpjpe, mpjpe_sc, mpjpe_pa, pose_mse, shape_mse)
from soccerplayershapepose_tpu.metrics.tracker import (  # noqa: F401
    MetricsTracker, EvalMetricsTracker)
