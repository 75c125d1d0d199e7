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
