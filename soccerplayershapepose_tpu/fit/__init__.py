"""On-device render-and-compare fitting loops (single / multi / broad view)."""

from soccerplayershapepose_tpu.fit.engine import (  # noqa: F401
    FitConfig, FitInit, FitResult, fit_metrics)
from soccerplayershapepose_tpu.fit.single_view import single_view_fit  # noqa: F401
from soccerplayershapepose_tpu.fit.multi_view import multi_view_fit  # noqa: F401
from soccerplayershapepose_tpu.fit.broad_view import broad_view_fit  # noqa: F401
