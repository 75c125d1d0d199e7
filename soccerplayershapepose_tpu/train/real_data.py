"""Real-crop training source: proxy-tree distillation batches.

The synth factory closes most of the domain gap by randomization, but the
strongest bridge is training on REAL player crops labeled by precomputed
proxies — the exact artifacts the reference pipeline already materializes
(``*_j2d.xml`` + ``*_sil.npy`` [+ ``*_iuv.npy``], player_recon.py:112-117)
and this package reads/writes byte-compatibly (io/formats.py). This module
turns a ``<game>/<scene>/<player>/<view>`` crop tree + sibling proxy tree
into ProxyNet training batches with the same contract as
``train/synth.synth_crop_batch``, so the trainer can mix sources.

Keypoint visibility comes from the stored score column (> ``score_thresh``)
AND the in-frame check — the reference's visibility semantics
(utils/joints2d_utils.py:23-33). Crops without IUV files get
``iuv_valid = 0`` so the part/UV losses skip them.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import numpy as np

from soccerplayershapepose_tpu.io import formats as io
from soccerplayershapepose_tpu.models.perception import STRIDE


def collect_proxy_examples(image_root: str, proxy_root: str,
                           ignore_first: bool = True) -> List[dict]:
    """List {image, j2d, sil, iuv?} file records over the paired trees."""
    out = []
    for node in io.walk_player_tree(image_root):
        if ignore_first and node.player == "1":
            continue
        for view in node.views:
            stem = os.path.join(proxy_root, node.game, node.scene,
                                node.player, os.path.splitext(view)[0])
            if not (os.path.exists(stem + "_j2d.xml")
                    and os.path.exists(stem + "_sil.npy")):
                continue
            rec = {"image": os.path.join(node.path, view),
                   "j2d": stem + "_j2d.xml", "sil": stem + "_sil.npy"}
            if os.path.exists(stem + "_iuv.npy"):
                rec["iuv"] = stem + "_iuv.npy"
            out.append(rec)
    return out


def _load_example(rec: dict, wh: int, score_thresh: float):
    from soccerplayershapepose_tpu.pipeline.extract import read_image
    image = read_image(rec["image"], wh).astype(np.float32) / 255.0
    j2d = io.read_joints2d(rec["j2d"]).astype(np.float32)     # (17, 3)
    sil = np.load(rec["sil"]).astype(np.float32)
    native = sil.shape[0]
    if native != wh:
        # nearest resize keeps the mask binary; keypoints rescale with it
        idx = (np.arange(wh) * native / wh).astype(np.int64)
        sil = sil[idx][:, idx]
        j2d = j2d * np.array([wh / native, wh / native, 1.0], np.float32)
    vis = ((j2d[:, 2] > score_thresh)
           & (j2d[:, 0] >= 0) & (j2d[:, 0] < wh)
           & (j2d[:, 1] >= 0) & (j2d[:, 1] < wh)).astype(np.float32)

    small = wh // STRIDE
    if "iuv" in rec:
        iuv = np.load(rec["iuv"]).astype(np.float32)          # (H, W, 3)
        s = iuv.shape[0] // small
        part = iuv[s // 2::s, s // 2::s, 0].astype(np.int32)[:small, :small]
        uv = iuv[s // 2::s, s // 2::s, 1:][:small, :small] / 255.0
        iuv_valid = 1.0
    else:
        part = np.zeros((small, small), np.int32)
        uv = np.zeros((small, small, 2), np.float32)
        iuv_valid = 0.0
    return image, sil, j2d[:, :2], vis, part, uv, iuv_valid


def proxy_tree_batches(image_root: str, proxy_root: str, batch: int,
                       wh: int = 256, score_thresh: float = 0.3,
                       seed: int = 0, loop: bool = True,
                       ignore_first: bool = True) -> Iterator[dict]:
    """Yield ProxyNet training batches (synth_crop_batch contract + an
    ``iuv_valid`` (B,) mask) sampled from a real crop/proxy tree."""
    recs = collect_proxy_examples(image_root, proxy_root,
                                  ignore_first=ignore_first)
    if not recs:
        return
    rng = np.random.RandomState(seed)
    while True:
        picks = rng.randint(0, len(recs), size=batch)
        cols = [[] for _ in range(7)]
        for i in picks:
            for c, v in zip(cols, _load_example(recs[i], wh, score_thresh)):
                c.append(v)
        yield {"image": np.stack(cols[0]),
               "silhouette": np.stack(cols[1]),
               "joints2d": np.stack(cols[2]),
               "kp_visible": np.stack(cols[3]),
               "part": np.stack(cols[4]),
               "uv": np.stack(cols[5]),
               "iuv_valid": np.asarray(cols[6], np.float32)}
        if not loop:
            return


def mixed_batches(synth_fn, real_iter: Optional[Iterator[dict]],
                  p_real: float = 0.5, seed: int = 0) -> Iterator[dict]:
    """Mix the on-device synth factory with a real-proxy iterator.

    ``synth_fn(step) -> batch``; draws real batches with probability
    ``p_real`` when the iterator is live (falls back to synth when
    exhausted)."""
    rng = np.random.RandomState(seed + 1)
    step = 0
    while True:
        use_real = real_iter is not None and rng.rand() < p_real
        if use_real:
            try:
                yield next(real_iter)
                step += 1
                continue
            except StopIteration:
                real_iter = None
        yield synth_fn(step)
        step += 1
