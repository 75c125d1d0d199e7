"""Flax neural networks: backbone, IEF regressor, relation module, classifier."""

from soccerplayershapepose_tpu.models.resnet import ResNet, resnet18, resnet50  # noqa: F401
from soccerplayershapepose_tpu.models.ief import IEFModule  # noqa: F401
from soccerplayershapepose_tpu.models.regressor import SingleInputRegressor  # noqa: F401
from soccerplayershapepose_tpu.models.relation import PoseRelationModule  # noqa: F401
from soccerplayershapepose_tpu.models.classifier import ClassifyNet  # noqa: F401
