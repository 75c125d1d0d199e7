"""Batched pipeline stages: proxy building, prediction, preprocessing."""

from soccerplayershapepose_tpu.pipeline.proxy import (  # noqa: F401
    create_proxy_representation, resize_nearest)
from soccerplayershapepose_tpu.pipeline.predict import (  # noqa: F401
    PredictOutput, predict_smpl, build_predictor)
