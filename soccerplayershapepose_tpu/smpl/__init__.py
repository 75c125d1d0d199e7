"""SMPL body model: assets + batched fused LBS forward (the math core)."""

from soccerplayershapepose_tpu.smpl.assets import (  # noqa: F401
    SMPLAssets, load_assets, synthesize_assets)
from soccerplayershapepose_tpu.smpl.model import (  # noqa: F401
    smpl_forward, smpl_shape_only, SMPLOutput)
