"""CLI smoke tests (calc-metrics is cheap; fitting subcommands are covered by
test_stages through the same driver functions)."""

import json
import os
import subprocess
import sys

from soccerplayershapepose_tpu.io import write_metrics


def test_cli_calc_metrics(tmp_path):
    d = tmp_path / "g1" / "s1" / "2"
    os.makedirs(d)
    write_metrics(str(d / "metrics.xml"), 0.7, 12.0)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "soccerplayershapepose_tpu", "calc-metrics",
         "--root", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=120)
    assert out.returncode == 0, out.stderr
    data = json.loads(out.stdout.strip().splitlines()[-1])
    assert data["num_players"] == 1
    assert data["num_flagged_for_refine"] == 1


def test_cli_usage_error():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "soccerplayershapepose_tpu", "single-view"],
        capture_output=True, text=True, env=env, timeout=120)
    assert out.returncode != 0
    assert "--image-root" in out.stderr


def _cpu_env():
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache")
    # Drop the axon plugin gate so the subprocess is genuinely CPU.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


import pytest


@pytest.mark.slow
def test_cli_train_perception_and_create_proxy(tmp_path):
    """End-to-end CLI flow: train ProxyNet briefly on the synth factory,
    then run create-proxy on a raw crop tree with the saved weights."""
    import numpy as np
    from PIL import Image

    weights = str(tmp_path / "proxynet.npz")
    out = subprocess.run(
        [sys.executable, "-m", "soccerplayershapepose_tpu",
         "train-perception", "--out", weights, "--steps", "2",
         "--batch-size", "2", "--wh", "64", "--no-iuv"],
        capture_output=True, text=True, env=_cpu_env(), timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(weights)

    img_root = tmp_path / "imgs"
    d = img_root / "g1" / "s1" / "2"
    os.makedirs(d)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (512, 512, 3), np.uint8)
    img[180:330, 220:290] = (200, 60, 60)   # a blob for the mask head
    Image.fromarray(img).save(d / "view_1.png")

    proxy_root = str(tmp_path / "proxy")
    out = subprocess.run(
        [sys.executable, "-m", "soccerplayershapepose_tpu", "create-proxy",
         "--image-root", str(img_root), "--proxy-root", proxy_root,
         "--weights", weights, "--no-iuv", "--batch-size", "1"],
        capture_output=True, text=True, env=_cpu_env(), timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    data = json.loads(out.stdout.strip().splitlines()[-1])
    # 2-step training: either a proxy was written or the player was
    # (correctly) deleted as a failed extraction — both exercise the stage.
    assert data["written"] + len(data["failed_players"]) == 1


def test_resolve_score_thresh(tmp_path):
    """Operating point resolves from the weights artifact's sibling json,
    with --score-thresh override and the reference 0.7 fallback."""
    import argparse

    from soccerplayershapepose_tpu.cli import _resolve_score_thresh

    w = tmp_path / "det.npz"
    w.write_bytes(b"")
    ns = argparse.Namespace(score_thresh=None)
    assert _resolve_score_thresh(ns, str(w)) == 0.7      # no sibling json
    (tmp_path / "det.json").write_text(
        json.dumps({"best_f1_score_thresh": 0.42}))
    assert _resolve_score_thresh(ns, str(w)) == 0.42
    ns = argparse.Namespace(score_thresh=0.9)
    assert _resolve_score_thresh(ns, str(w)) == 0.9      # explicit wins
