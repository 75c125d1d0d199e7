"""Training loops for the perception nets (ProxyNet + PlayerDetector).

The reference never trains these — it downloads COCO/DensePose-pretrained
detectron2/torchvision weights
(``/root/reference/Python/Soccer/PlayerReconstruction/predict/predict_3D.py:35-64``,
``PlayerDetection/player_detection.py:86-87``). Here both train end-to-end on
the synthetic SMPL render factory (``train/synth.py``), one jitted step per
batch, scalable over the ``data`` mesh axis like every other trainer in this
package.

Losses:
* keypoints — penalty-reduced focal loss (CenterNet-style) on sigmoided
  stride-4 heatmaps against peak-normalized Gaussian targets scaled by
  per-joint VISIBILITY, so ``sigmoid(peak logit)`` is a calibrated
  "joint present and localized" confidence — the role KP-RCNN scores play
  downstream (utils/joints2d_utils.py:23-33); occluded/out-of-frame joints
  train toward zero response,
* silhouette — full-resolution BCE with logits,
* IUV — softmax cross-entropy over background+24 parts, plus L1 on the
  ground-truth part's UV channels inside the body,
* detector — CenterNet focal + L1 (models/detector.py:detector_loss).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from soccerplayershapepose_tpu.models.detector import (
    PlayerDetector, center_targets, detector_loss)
from soccerplayershapepose_tpu.models.perception import (
    NUM_PARTS, STRIDE, ProxyNet)


def default_weights_path(kind: str) -> Optional[str]:
    """Committed-artifact lookup: ``weights/<kind>*_f16.npz`` at the repo
    root — the role of the reference's downloaded checkpoints
    (predict_3D.py:35-64). Highest resolution tag wins; None if absent."""
    import glob
    import os
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    hits = sorted(glob.glob(os.path.join(root, "weights",
                                         f"{kind}*_f16.npz")))
    return hits[-1] if hits else None


def gaussian_heatmap_targets(joints2d: jnp.ndarray, wh: int,
                             sigma: float = 1.5) -> jnp.ndarray:
    """Smooth (non-truncated) Gaussian training targets, (B, wh, wh, K).

    Distinct from ops/heatmaps.joints2d_to_gaussian_heatmaps, which
    reproduces the reference's int-cast/truncation quirks for *input proxy*
    parity — training targets want clean sub-pixel peaks.
    """
    grid = jnp.arange(wh, dtype=jnp.float32) + 0.5
    dy = grid[None, :, None] - joints2d[..., 1][:, None, :]   # (B, wh, K)
    dx = grid[None, :, None] - joints2d[..., 0][:, None, :]
    gy = jnp.exp(-dy ** 2 / (2 * sigma ** 2))
    gx = jnp.exp(-dx ** 2 / (2 * sigma ** 2))
    return gy[:, :, None, :] * gx[:, None, :, :]              # (B,wh,wh,K)


class PerceptionTrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def _init_state(model, rng, dummy, tx):
    variables = model.init(rng, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return PerceptionTrainState(params, batch_stats, opt_state,
                                jnp.zeros((), jnp.int32))


def make_proxynet_state(model: ProxyNet, rng: jax.Array, wh: int = 256,
                        learning_rate: float = 1e-3,
                        tx: Optional[optax.GradientTransformation] = None):
    tx = tx or optax.adam(learning_rate)
    dummy = jnp.zeros((1, wh, wh, 3), jnp.float32)
    return _init_state(model, rng, dummy, tx), tx


def make_detector_state(model: PlayerDetector, rng: jax.Array,
                        hw: tuple = (256, 256), learning_rate: float = 1e-3,
                        tx: Optional[optax.GradientTransformation] = None):
    tx = tx or optax.adam(learning_rate)
    dummy = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    return _init_state(model, rng, dummy, tx), tx


def proxynet_losses(model: ProxyNet, params, batch_stats, batch,
                    train: bool = True):
    """Forward + all head losses on a synth (or real, if labeled) batch."""
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mutated = model.apply(variables, batch["image"], train=True,
                                   mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        out = model.apply(variables, batch["image"], train=False)
        new_stats = batch_stats

    wh = batch["image"].shape[1]
    small = wh // STRIDE

    # Keypoint heatmaps: Gaussian targets at head resolution. σ=4 at 512
    # proxy scale (label_conversions.py:66) ≡ σ=1 at stride 4; use 1.5 cells
    # for a slightly wider basin. Targets are peak-normalized (exact 1.0 at
    # the peak cell) and zeroed for invisible joints, then trained with the
    # penalty-reduced focal loss so peak sigmoids calibrate as confidences.
    kp_t = gaussian_heatmap_targets(
        batch["joints2d"] * (small / wh), small, sigma=1.5)     # (B,s,s,17)
    kp_t = kp_t / jnp.maximum(
        jnp.max(kp_t, axis=(1, 2), keepdims=True), 1e-6)
    vis = batch.get("kp_visible")
    if vis is None:
        vis = jnp.ones(kp_t.shape[:1] + kp_t.shape[-1:])
    kp_t = kp_t * vis[:, None, None, :]
    kp_p = jax.nn.sigmoid(out.kp_logits)
    pos = (kp_t >= 0.999).astype(jnp.float32)
    eps = 1e-6
    pos_term = -jnp.log(kp_p + eps) * (1 - kp_p) ** 2 * pos
    neg_term = -jnp.log(1 - kp_p + eps) * kp_p ** 2 \
        * (1 - kp_t) ** 4 * (1 - pos)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    kp_loss = (jnp.sum(pos_term) + jnp.sum(neg_term)) / n_pos

    mask_t = batch["silhouette"]
    mask_loss = jnp.mean(optax.sigmoid_binary_cross_entropy(
        out.mask_logits, mask_t))

    losses = {"kp": kp_loss, "mask": mask_loss}
    total = kp_loss + mask_loss
    if model.with_iuv and out.part_logits is not None:
        part_t = batch["part"]                                   # (B,s,s)
        # Per-sample IUV validity (real-proxy batches may lack IUV labels,
        # train/real_data.py): invalid samples contribute zero part/UV loss.
        iuv_valid = batch.get("iuv_valid")
        if iuv_valid is None:
            iuv_valid = jnp.ones(part_t.shape[:1])
        n_valid = jnp.maximum(jnp.sum(iuv_valid), 1.0)
        part_loss = jnp.sum(
            jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                out.part_logits, part_t), axis=(1, 2)) * iuv_valid) / n_valid
        fg = (part_t > 0).astype(jnp.float32) * iuv_valid[:, None, None]
        sel = jnp.clip(part_t - 1, 0, NUM_PARTS - 1)
        uv_p = jax.nn.sigmoid(out.uv.reshape(
            out.uv.shape[:3] + (NUM_PARTS, 2)))
        uv_sel = jnp.take_along_axis(
            uv_p, sel[..., None, None].astype(jnp.int32), axis=3)[..., 0, :]
        uv_loss = jnp.sum(jnp.abs(uv_sel - batch["uv"]) * fg[..., None]) \
            / jnp.maximum(jnp.sum(fg) * 2.0, 1.0)
        losses["part"] = part_loss
        losses["uv"] = uv_loss
        total = total + part_loss + uv_loss
    losses["total"] = total
    return total, (losses, new_stats)


def make_proxynet_train_step(model: ProxyNet,
                             tx: optax.GradientTransformation):
    def train_step(state: PerceptionTrainState, batch):
        grad_fn = jax.value_and_grad(
            lambda p: proxynet_losses(model, p, state.batch_stats, batch),
            has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return PerceptionTrainState(params, new_stats, new_opt,
                                    state.step + 1), losses
    return train_step


def make_detector_train_step(model: PlayerDetector,
                             tx: optax.GradientTransformation,
                             min_visible_fill: float = 0.08):
    """``min_visible_fill``: GT boxes more than ~80% occluded (visible fill
    below this; full visibility ≈ 0.35-0.45, synth.synth_frame_batch) are
    dropped from the targets — supervising centers of players hidden behind
    other players teaches the net to hallucinate, costing precision
    everywhere else."""
    def train_step(state: PerceptionTrainState, batch):
        hw = batch["image"].shape[1:3]
        mask = batch["mask"]
        if min_visible_fill and "visible_fill" in batch:
            mask = mask * (batch["visible_fill"]
                           >= min_visible_fill).astype(mask.dtype)
        batch = dict(batch, mask=mask)
        targets = center_targets(batch["boxes"], batch["mask"], hw)

        def loss_fn(p):
            variables = {"params": p, "batch_stats": state.batch_stats}
            out, mutated = model.apply(variables, batch["image"], train=True,
                                       mutable=["batch_stats"])
            total, parts = detector_loss(out, targets, batch["mask"])
            return total, (parts, mutated["batch_stats"])

        (total, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        parts["total"] = total
        return PerceptionTrainState(params, new_stats, new_opt,
                                    state.step + 1), parts
    return train_step


def shard_train_step(step_fn, mesh):
    """Data-parallel jit of a perception train step over ``mesh``.

    State replicated, every batch leaf sharded on its leading (batch) axis
    over the ``data`` mesh axis; GSPMD inserts the gradient psums. Because
    the loss reduces means over the sharded batch axis inside jit, BatchNorm
    moments and gradients are GLOBAL-batch quantities — sharded and
    unsharded runs compute the same update (modulo reduction order), unlike
    per-replica BN in the torch DDP idiom. Batch size must divide the data
    axis length.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from soccerplayershapepose_tpu.parallel.mesh import AXES
    data = NamedSharding(mesh, P(AXES.data))
    rep = NamedSharding(mesh, P())
    return jax.jit(step_fn, in_shardings=(rep, data),
                   out_shardings=(rep, rep))


def save_perception_weights(path: str, state: PerceptionTrainState,
                            dtype=None, compress: bool = False) -> None:
    """Save ProxyNet/PlayerDetector inference weights as a flat .npz.

    ``dtype='float16'`` + ``compress=True`` halves committed-artifact size;
    :func:`load_perception_weights` casts back to the model dtype."""
    import numpy as np
    from soccerplayershapepose_tpu.train.checkpoint import _flatten
    tree = {"params": state.params, "batch_stats": state.batch_stats}
    flat = _flatten(tree)
    if dtype is not None:
        flat = {k: v.astype(dtype) if v.dtype == np.float32 else v
                for k, v in flat.items()}
    (np.savez_compressed if compress else np.savez)(path, **flat)


def load_perception_weights(path: str, model, wh: int = 256,
                            hw: Optional[tuple] = None) -> dict:
    """Load weights saved by :func:`save_perception_weights` → flax
    variables dict for ``model.apply`` (shapes validated against a fresh
    init template). ``hw`` for rectangular detector inputs."""
    import numpy as np
    from soccerplayershapepose_tpu.train.checkpoint import _unflatten_like
    h, w = hw if hw is not None else (wh, wh)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, h, w, 3), jnp.float32), train=False)
    template = {"params": template["params"],
                "batch_stats": template.get("batch_stats", {})}
    flat = dict(np.load(path))
    return _unflatten_like(template, flat)


def train_proxynet_synth(assets, steps: int = 200, batch: int = 8,
                         wh: int = 256, learning_rate: float = 1e-3,
                         with_iuv: bool = True, seed: int = 0,
                         log_every: int = 50) -> PerceptionTrainState:
    """Train ProxyNet on the synthetic SMPL render factory — the
    self-supervised replacement for the reference's downloaded detectron2
    weights (predict_3D.py:35-64). Returns the final train state."""
    from soccerplayershapepose_tpu.train.synth import synth_crop_batch
    model = ProxyNet(with_iuv=with_iuv)
    rng = jax.random.PRNGKey(seed)
    state, tx = make_proxynet_state(model, rng, wh=wh,
                                    learning_rate=learning_rate)
    step_fn = jax.jit(make_proxynet_train_step(model, tx))
    for i in range(steps):
        rng, k = jax.random.split(rng)
        batch_data = synth_crop_batch(assets, k, b=batch, wh=wh)
        state, metrics = step_fn(state, batch_data)
        if log_every and (i + 1) % log_every == 0:
            print(f"proxynet step {i + 1}/{steps}: "
                  + " ".join(f"{k}={float(v):.4f}"
                             for k, v in metrics.items()))
    return state


def train_detector_synth(assets, steps: int = 200, batch: int = 4,
                         hw: tuple = (256, 448), n_players: int = 6,
                         learning_rate: float = 1e-3, seed: int = 0,
                         log_every: int = 50) -> PerceptionTrainState:
    """Train the player detector on synthetic multi-player frames
    (the torchvision Faster-RCNN replacement, player_detection.py:86-87)."""
    from soccerplayershapepose_tpu.train.synth import synth_frame_batch
    model = PlayerDetector()
    rng = jax.random.PRNGKey(seed)
    state, tx = make_detector_state(model, rng, hw=hw,
                                    learning_rate=learning_rate)
    step_fn = jax.jit(make_detector_train_step(model, tx))
    for i in range(steps):
        rng, k = jax.random.split(rng)
        batch_data = synth_frame_batch(assets, k, b=batch,
                                       n_players=n_players, hw=hw)
        state, metrics = step_fn(state, batch_data)
        if log_every and (i + 1) % log_every == 0:
            print(f"detector step {i + 1}/{steps}: "
                  + " ".join(f"{k}={float(v):.4f}"
                             for k, v in metrics.items()))
    return state
