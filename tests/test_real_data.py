"""Real-proxy distillation loader: tree → training batches → loss step.

Model: the interop contract (io/formats.py byte-compatible proxies,
player_recon.py:112-117) reused as a TRAINING source (VERDICT r2 #2)."""

import os

import jax
import numpy as np
import pytest

from soccerplayershapepose_tpu.io import formats as io
from soccerplayershapepose_tpu.models.perception import ProxyNet
from soccerplayershapepose_tpu.train.perception import (
    make_proxynet_state, make_proxynet_train_step)
from soccerplayershapepose_tpu.train.real_data import (
    collect_proxy_examples, mixed_batches, proxy_tree_batches)


@pytest.fixture()
def proxy_tree(tmp_path):
    """Two players x one view with images + proxies; one has IUV."""
    image_root = str(tmp_path / "crops")
    proxy_root = str(tmp_path / "proxy")
    rng = np.random.RandomState(0)
    wh = 64
    for player, with_iuv in (("2", True), ("3", False)):
        d = os.path.join(image_root, "g1", "s1", player)
        p = os.path.join(proxy_root, "g1", "s1", player)
        os.makedirs(d), os.makedirs(p)
        io.write_png(os.path.join(d, "view_1.png"),
                     rng.randint(0, 255, (wh, wh, 3), np.uint8))
        kp = np.concatenate([rng.uniform(5, 59, (17, 2)),
                             rng.uniform(0.2, 1.0, (17, 1))], axis=1)
        kp[0, 2] = 0.01     # low-score joint → invisible
        kp[1, 0] = -5.0     # off-frame joint → invisible
        io.write_joints2d(os.path.join(p, "view_1_j2d.xml"), kp)
        sil = np.zeros((wh, wh), np.uint8)
        sil[10:50, 20:44] = 1
        np.save(os.path.join(p, "view_1_sil.npy"), sil)
        if with_iuv:
            iuv = np.zeros((wh, wh, 3), np.float32)
            iuv[10:50, 20:44, 0] = 3
            iuv[10:50, 20:44, 1:] = 120.0
            np.save(os.path.join(p, "view_1_iuv.npy"), iuv)
    return image_root, proxy_root


def test_collect_and_batches(proxy_tree):
    image_root, proxy_root = proxy_tree
    recs = collect_proxy_examples(image_root, proxy_root)
    assert len(recs) == 2
    assert sum("iuv" in r for r in recs) == 1

    it = proxy_tree_batches(image_root, proxy_root, batch=4, wh=64, seed=1)
    batch = next(it)
    assert batch["image"].shape == (4, 64, 64, 3)
    assert batch["silhouette"].shape == (4, 64, 64)
    assert batch["joints2d"].shape == (4, 17, 2)
    assert batch["kp_visible"].shape == (4, 17)
    assert batch["part"].shape == (4, 16, 16)
    assert batch["uv"].shape == (4, 16, 16, 2)
    assert set(np.unique(batch["iuv_valid"])) <= {0.0, 1.0}
    # Low-score and off-frame joints are invisible.
    assert (batch["kp_visible"][:, 0] == 0).all()
    assert (batch["kp_visible"][:, 1] == 0).all()
    # IUV subsampling put part 3 labels inside the box region.
    i_with = np.nonzero(batch["iuv_valid"] > 0)[0]
    if len(i_with):
        assert (batch["part"][i_with[0]] == 3).any()


def test_train_step_on_real_batch(proxy_tree):
    image_root, proxy_root = proxy_tree
    batch = next(proxy_tree_batches(image_root, proxy_root, batch=2, wh=64))
    model = ProxyNet(with_iuv=True, channels=16)
    state, tx = make_proxynet_state(model, jax.random.PRNGKey(0), wh=64)
    step = jax.jit(make_proxynet_train_step(model, tx))
    state, losses = step(state, {k: np.asarray(v) for k, v in batch.items()})
    for v in losses.values():
        assert np.isfinite(float(v))


def test_mixed_batches_fallback():
    synth_calls = []

    def synth_fn(i):
        synth_calls.append(i)
        return {"src": "synth"}

    real = iter([{"src": "real"}] * 3)
    mix = mixed_batches(synth_fn, real, p_real=1.0, seed=0)
    got = [next(mix)["src"] for _ in range(5)]
    assert got[:3] == ["real"] * 3
    assert got[3:] == ["synth"] * 2      # exhausted → synth fallback
    mix2 = mixed_batches(synth_fn, None, p_real=1.0)
    assert next(mix2)["src"] == "synth"
