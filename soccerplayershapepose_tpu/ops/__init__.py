"""Pure-functional jnp math kernels (no I/O, no state).

Every function here is batched, jit-safe (static shapes, no Python control flow
on traced values) and matches the reference numerics documented per-module.
"""

from soccerplayershapepose_tpu.ops.rotations import (  # noqa: F401
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    batch_rodrigues,
    rotate_translate_points,
)
from soccerplayershapepose_tpu.ops.camera import (  # noqa: F401
    orthographic_project,
    perspective_project,
    weak_perspective_to_translation,
    translation_to_weak_perspective,
    get_intrinsics_matrix,
    undo_keypoint_normalisation,
    check_joints2d_visibility,
)
from soccerplayershapepose_tpu.ops.heatmaps import (  # noqa: F401
    joints2d_to_gaussian_heatmaps,
)
from soccerplayershapepose_tpu.ops.alignment import (  # noqa: F401
    procrustes_align,
    scale_and_translation_align,
)
from soccerplayershapepose_tpu.ops.segmentation import (  # noqa: F401
    silhouette_confusion_metrics,
    joints2d_l2_error,
    multiclass_to_binary,
    densepose_to_6part_lsp,
)
