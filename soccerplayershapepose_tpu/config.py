"""Framework-wide constants and joint-set conventions.

Re-specifies (does not copy) the behavioral constants of the reference pipeline:
* ``/root/reference/Python/Soccer/PlayerReconstruction/config.py`` (focal length,
  regressor input size, joint-set index maps),
* ``/root/reference/Python/Soccer/global_var.py`` (crop sizes, iteration budgets,
  learning rates, folder-tree names).

All values that affect numerics are kept bit-identical so that outputs are
comparable player-by-player with the reference.
"""

from __future__ import annotations

import dataclasses

# ---------------------------------------------------------------------------
# Camera / image geometry (reference: PlayerReconstruction/config.py:14-15,
# global_var.py:32,51)
# ---------------------------------------------------------------------------
FOCAL_LENGTH = 5000.0
REGRESSOR_IMG_WH = 256          # proxy representation fed to the regressor
PROXY_REP_INPUT_WH = 512        # silhouettes / joints2D / crops live in 512^2
PLAYER_CROP_SIZE = (512, 512)
PLAYER_CROP_BORDER = 40
PLAYER_CROP_BORDER_BROAD = 15
# Green padding color used when square-cropping players out of the field
# (reference: global_utils.py:257-290 uses BGR (53, 88, 83)).
CROP_PAD_COLOR_BGR = (53, 88, 83)

# ---------------------------------------------------------------------------
# SMPL structural constants
# ---------------------------------------------------------------------------
NUM_VERTS = 6890
NUM_FACES = 13776
NUM_BETAS = 10
NUM_JOINTS = 24                 # kinematic joints (incl. root)
NUM_BODY_JOINTS = 23            # NUM_JOINTS - root
NUM_POSE_BLENDSHAPES = 9 * NUM_BODY_JOINTS  # 207
# 45 = 24 kinematic + 21 vertex-selected (face 5 + feet 6 + fingertips 10)
NUM_SMPL_OUTPUT_JOINTS = 45
NUM_EXTRA_JOINTS = 9
NUM_COCOPLUS_JOINTS = 19
NUM_H36M_JOINTS = 17
# 90-joint superset returned by the body-model forward
# (reference: models/smpl_official.py:30-34).
NUM_ALL_JOINTS = (NUM_SMPL_OUTPUT_JOINTS + NUM_EXTRA_JOINTS
                  + NUM_COCOPLUS_JOINTS + NUM_H36M_JOINTS)

# SMPL kinematic tree: parent of each of the 24 joints (root = -1).
SMPL_PARENTS = (-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8,
                9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21)

# Vertex ids appended to the 24 kinematic joints by the SMPL output head, in
# order: [nose, reye, leye, rear, lear, LBigToe, LSmallToe, LHeel, RBigToe,
# RSmallToe, RHeel, lthumb, lindex, lmiddle, lring, lpinky, rthumb, rindex,
# rmiddle, rring, rpinky].  These ids are public SMPL-mesh structural constants
# (the smplx `vertex_ids['smplh']` table) and define superset joints 24..44.
EXTRA_JOINT_VERTEX_IDS = (
    332, 6260, 2800, 4071, 583,            # face: nose, reye, leye, rear, lear
    3216, 3226, 3387, 6617, 6624, 6787,    # feet: L/R big toe, small toe, heel
    2746, 2319, 2445, 2556, 2673,          # left-hand fingertips
    6191, 5782, 5905, 6016, 6133,          # right-hand fingertips
)

# ---------------------------------------------------------------------------
# Joint-set maps over the 90-joint superset
# (reference: PlayerReconstruction/config.py:29-41)
# ---------------------------------------------------------------------------
ALL_JOINTS_TO_COCO_MAP = (24, 26, 25, 28, 27, 16, 17, 18, 19, 20, 21,
                          1, 2, 4, 5, 7, 8)
ALL_JOINTS_TO_H36M_MAP = tuple(range(73, 90))
H36M_TO_J17 = (6, 5, 4, 1, 2, 3, 16, 15, 14, 11, 12, 13, 8, 10, 0, 7, 9)
H36M_TO_J14 = H36M_TO_J17[:14]
SMPL_TO_KPRCNN_MAP = (24, 26, 25, 28, 27, 16, 17, 18, 19, 20, 21,
                      1, 2, 4, 5, 7, 8)
NUM_KPRCNN_JOINTS = 17

# Body-pose joints (of the 23 non-root joints) that stay TRAINABLE during the
# fitting loops; the reference freezes hands and feet by concat-splicing
# body_pose[:, :6], body_pose[:, 8:21] (player_recon.py:1175-1206), i.e. the
# frozen set is {6, 7, 21, 22} (ankles-to-feet and wrists-to-hands ends).
FITTING_FROZEN_BODY_JOINTS = (6, 7, 21, 22)
FITTING_TRAINABLE_BODY_JOINTS = tuple(
    j for j in range(NUM_BODY_JOINTS) if j not in FITTING_FROZEN_BODY_JOINTS)

# ---------------------------------------------------------------------------
# Heatmap synthesis (reference: utils/label_conversions.py:58-127)
# ---------------------------------------------------------------------------
HEATMAP_STD = 4                 # Gaussian sigma in px; truncated at 2*sigma

# ---------------------------------------------------------------------------
# Optimization budgets / learning rates (reference: global_var.py:19,73-111)
# ---------------------------------------------------------------------------
SINGLE_VIEW_ITERS = 100
MULTI_VIEW_ITERS = 50           # per phase; 3 alternating rounds
MULTI_VIEW_ROUNDS = 3
BROAD_VIEW_ITERS = 100
BROAD_VIEW_LR = 0.01
FITTING_LR = 0.001              # global_var.player_recon_train_regressor_learning_rate
REGRESSOR_TRAIN_LR = 1e-4       # distillation trainer (PyTorch3DTest.py:1104-1106)
REGRESSOR_TRAIN_EPOCHS = 10
TEXTURE_SINGLE_OPT_ITERS = 50
TEXTURE_MULT_OPT_ITERS = 20
REFINE_SCORE_THRESH = 10.0      # px joint error gating human refinement

# Homoscedastic-loss initial weights used by the fitting loops
# (reference: player_recon.py:851).
FITTING_INIT_LOSS_WEIGHTS = {"joints2D": 1.0, "silhouette": 1000000.0}

# ---------------------------------------------------------------------------
# Detection / classification constants
# ---------------------------------------------------------------------------
DETECTION_SCORE_THRESH = 0.7    # player_detection.py:16-37
KPRCNN_SCORE_THRESH = 0.7
MAX_PLAYERS_PER_FRAME = 22      # scene-batch padding bound


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Runtime configuration for the batched TPU pipeline."""

    proxy_wh: int = PROXY_REP_INPUT_WH
    regressor_wh: int = REGRESSOR_IMG_WH
    focal_length: float = FOCAL_LENGTH
    heatmap_std: int = HEATMAP_STD
    batch_size: int = 128
    max_players: int = MAX_PLAYERS_PER_FRAME
    resnet_layers: int = 18
    resnet_in_channels: int = 18    # 1 silhouette + 17 joint heatmaps
    ief_iters: int = 3
    # Silhouette-render resolution used inside fitting losses. The reference
    # renders at 512 (proxy_rep_input_wh); lower values trade parity for speed.
    render_wh: int = PROXY_REP_INPUT_WH
    dtype: str = "float32"
