"""Main-camera frame classification stage.

Role of the reference ``ImageClassification/classification.py``: sample frames
from match videos, hand-label them, train the 2-layer MLP head
(:116-179, 10 epochs Adam over frozen ResNet-18 ImageNet logits), then gate
frames at inference (``Classifier.process`` :181-203,
``predict_with_classifier_final`` :261-295 copies accepted frames).

TPU-first: training runs as one jitted optax loop over precomputed backbone
features (the frozen backbone is pure preprocessing — any (N, 1000) feature
matrix works: torchvision ResNet-18 logits on host, or a flax port).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from soccerplayershapepose_tpu.models.classifier import ClassifyNet


def train_classifier(features: np.ndarray, labels: np.ndarray,
                     epochs: int = 10, lr: float = 2e-4,
                     batch_size: int = 64, seed: int = 0,
                     val_split: float = 0.1) -> Tuple[dict, dict]:
    """Train ClassifyNet on (N, 1000) features, (N,) int labels.

    Returns (params, history{train_loss, val_acc per epoch}).
    """
    net = ClassifyNet()
    rng = np.random.RandomState(seed)
    n = len(features)
    order = rng.permutation(n)
    n_val = max(1, int(n * val_split))
    val_idx, train_idx = order[:n_val], order[n_val:]

    params = net.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, features.shape[1])))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = net.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, x, y):
        return jnp.mean(jnp.argmax(net.apply(params, x), -1) == y)

    feats = jnp.asarray(features, jnp.float32)
    labs = jnp.asarray(labels, jnp.int32)
    history = {"train_loss": [], "val_acc": []}
    for _ in range(epochs):
        rng.shuffle(train_idx)
        losses = []
        for i in range(0, len(train_idx), batch_size):
            idx = jnp.asarray(train_idx[i:i + batch_size])
            params, opt_state, loss = step(params, opt_state,
                                           feats[idx], labs[idx])
            losses.append(float(loss))
        history["train_loss"].append(float(np.mean(losses)))
        history["val_acc"].append(
            float(accuracy(params, feats[jnp.asarray(val_idx)],
                           labs[jnp.asarray(val_idx)])))
    return params, history


class Classifier:
    """Inference-side gate: is this frame a main-camera shot?
    (reference Classifier.process, classification.py:181-203)."""

    def __init__(self, params, feature_fn=None):
        self.net = ClassifyNet()
        self.params = params
        self.feature_fn = feature_fn        # image → (1000,) features
        self._apply = jax.jit(lambda p, x: jnp.argmax(self.net.apply(p, x), -1))

    def process(self, image_or_features) -> bool:
        feats = np.asarray(image_or_features)
        if feats.ndim != 1 and self.feature_fn is not None:
            feats = self.feature_fn(feats)
        pred = self._apply(self.params, jnp.asarray(feats[None]))
        return bool(int(pred[0]) == 1)

    __call__ = process      # usable directly as a harvest-stage gate


class FrameFeatureNet(nn.Module):
    """Frozen-backbone feature extractor for frame classification.

    The reference feeds ClassifyNet the 1000-way logits of a frozen
    ImageNet torchvision ResNet-18 (classification.py:128-130, 189-197:
    resize 256 → centre-crop 224 → normalize). Same contract here as a
    flax ResNet-18 trunk + Dense(1000) head whose weights come either from
    a torch-imported checkpoint (utils/model_utils import path) or from
    any in-domain pretraining — the MLP head is trained on whatever this
    net outputs, so only train/inference consistency matters, not ImageNet
    provenance.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """(B, H, W, 3) float [0,1] → (B, 1000) logits."""
        from soccerplayershapepose_tpu.models.resnet import resnet18
        mean = jnp.asarray([0.485, 0.456, 0.406], self.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], self.dtype)
        x = (images.astype(self.dtype) - mean) / std
        feats = resnet18(dtype=self.dtype)(x, train=train)
        return nn.Dense(1000, dtype=self.dtype)(feats)


def preprocess_frame(frame_u8: np.ndarray, out_wh: int = 224) -> np.ndarray:
    """Broadcast frame → (224, 224, 3) float [0,1] classifier input.

    The reference transform (classification.py "transform": Resize(256) →
    CenterCrop(224) → ToTensor): resize so the SHORT side is 256
    (aspect-preserving), centre-crop 224².
    """
    h, w = frame_u8.shape[:2]
    scale = 256.0 / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    ys = (np.arange(nh) + 0.5) * (h / nh) - 0.5
    xs = (np.arange(nw) + 0.5) * (w / nw) - 0.5
    yi = np.clip(np.round(ys).astype(int), 0, h - 1)
    xi = np.clip(np.round(xs).astype(int), 0, w - 1)
    resized = frame_u8[yi][:, xi]
    y0, x0 = (nh - out_wh) // 2, (nw - out_wh) // 2
    crop = resized[y0:y0 + out_wh, x0:x0 + out_wh]
    return crop.astype(np.float32) / 255.0


def make_frame_classifier(head_params, feature_params=None) -> Classifier:
    """Assemble the full frame gate: raw frame → features → ClassifyNet.

    With ``feature_params`` the :class:`FrameFeatureNet` runs on device
    (jitted); without, the classifier only accepts precomputed (1000,)
    feature vectors.
    """
    if feature_params is None:
        return Classifier(head_params)
    net = FrameFeatureNet()
    fwd = jax.jit(lambda p, x: net.apply(p, x))

    def feature_fn(frame_u8: np.ndarray) -> np.ndarray:
        x = preprocess_frame(np.asarray(frame_u8))
        return np.asarray(fwd(feature_params, jnp.asarray(x[None])))[0]

    return Classifier(head_params, feature_fn=feature_fn)


def save_classifier(path: str, head_params, feature_params=None) -> None:
    """Bundle ClassifyNet (+ optional FrameFeatureNet) params as flat npz."""
    from soccerplayershapepose_tpu.train.checkpoint import _flatten
    tree = {"head": head_params}
    if feature_params is not None:
        tree["features"] = feature_params
    np.savez(path, **_flatten(tree))


def load_classifier(path: str) -> Classifier:
    """Load a :func:`save_classifier` bundle into a ready frame gate."""
    from soccerplayershapepose_tpu.train.checkpoint import _unflatten_like
    flat = dict(np.load(path))
    head_tpl = ClassifyNet().init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 1000)))
    tree = {"head": head_tpl}
    if any(k.startswith("features") for k in flat):
        tree["features"] = FrameFeatureNet().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    t = _unflatten_like(tree, flat)
    return make_frame_classifier(t["head"], t.get("features"))
