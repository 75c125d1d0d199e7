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
