"""Unit tests for scripts/quality_record.py's record mechanics.

The eval cells themselves are covered by tests/test_quality.py (and run as
subprocesses in production); here ``run_cell`` is stubbed so the
merge/skip/suffix behavior — what the unattended TPU queue relies on when
it appends to the committed QUALITY record — is pinned without any jax
work:

* an existing record is merged into, never rewritten (queue stages re-run
  quality_record with --skip to refresh a subset),
* --suffix tags new cell names while --skip matches unsuffixed names,
* a failed cell keeps the previously recorded value,
* ablation arms are only merged when their best.json exists.
"""

import importlib.util
import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def qr(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "quality_record", os.path.join(ROOT, "scripts", "quality_record.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(qr, monkeypatch, tmp_path, argv, cell_result):
    calls = []

    def fake_run_cell(args, timeout_s=None, attempts=3):
        calls.append(args)
        return cell_result(args) if callable(cell_result) else cell_result

    monkeypatch.setattr(qr, "run_cell", fake_run_cell)
    monkeypatch.setattr(sys, "argv", ["quality_record.py"] + argv)
    qr.main()
    return calls


ALL_CELLS = ["proxynet_256_hard", "proxynet_256_easy",
             "proxynet_256_hard_tta", "proxynet_512_hard",
             "proxynet_512_hard_tta", "detector_hard", "detector_hard_tta",
             "regressor_clean", "regressor_corrupt", "regressor_e2e",
             # Conditional round-5 artifact cells (present only when the
             # matching weights exist in the repo — skip them regardless).
             "regressor_distilled_clean", "regressor_distilled_e2e",
             "regressor_e2eft_clean", "regressor_e2eft_e2e",
             "regressor_iuv21_clean", "regressor_iuv21_corrupt",
             "regressor_iuv20_clean", "regressor_iuv20_corrupt",
             "regressor_iuv21_e2e"]


def test_merge_preserves_skipped_cells(qr, monkeypatch, tmp_path):
    out = tmp_path / "q.json"
    out.write_text(json.dumps({"proxynet_256_hard_old": {"mask_mean_iou": 0.9},
                               "detector_hard": {"ap@0.5": 0.5}}))
    skip = [c for c in ALL_CELLS if c != "proxynet_256_hard"]
    _run(qr, monkeypatch, tmp_path,
         ["--out", str(out), "--skip", ",".join(skip + [
             "ablation_rand_on", "ablation_rand_off"])],
         {"mask_mean_iou": 0.95})
    rec = json.loads(out.read_text())
    # merged in place: pre-existing cells survive a --skip rerun
    assert rec["proxynet_256_hard_old"] == {"mask_mean_iou": 0.9}
    assert rec["detector_hard"] == {"ap@0.5": 0.5}
    assert rec["proxynet_256_hard"] == {"mask_mean_iou": 0.95}


def test_suffix_tags_writes_but_skip_matches_unsuffixed(qr, monkeypatch,
                                                        tmp_path):
    out = tmp_path / "q.json"
    skip = [c for c in ALL_CELLS if c != "detector_hard"]
    calls = _run(qr, monkeypatch, tmp_path,
                 ["--out", str(out), "--suffix", "_64img_tpu",
                  "--skip", ",".join(skip + ["ablation_rand_on",
                                             "ablation_rand_off"])],
                 {"ap@0.5": 0.6})
    rec = json.loads(out.read_text())
    assert "detector_hard_64img_tpu" in rec
    assert "detector_hard" not in rec
    assert len(calls) == 1          # everything else skipped by bare name


def test_failed_cell_keeps_existing_value(qr, monkeypatch, tmp_path):
    out = tmp_path / "q.json"
    out.write_text(json.dumps({"proxynet_256_hard_x": {"mask_mean_iou": 0.91}}))
    skip = [c for c in ALL_CELLS if c != "proxynet_256_hard"]
    _run(qr, monkeypatch, tmp_path,
         ["--out", str(out), "--suffix", "_x",
          "--skip", ",".join(skip + ["ablation_rand_on",
                                     "ablation_rand_off"])],
         None)                      # cell crashed all attempts
    rec = json.loads(out.read_text())
    assert rec["proxynet_256_hard_x"] == {"mask_mean_iou": 0.91}


def test_ablation_arm_merged_only_when_best_exists(qr, monkeypatch,
                                                   tmp_path):
    out = tmp_path / "q.json"
    arm_dir = tmp_path / "weights" / "ablation_rand_on"
    arm_dir.mkdir(parents=True)
    (arm_dir / "best.json").write_text(json.dumps({"score": 1.5}))
    monkeypatch.setattr(qr, "ROOT", str(tmp_path))
    _run(qr, monkeypatch, tmp_path,
         ["--out", str(out), "--skip",
          ",".join(ALL_CELLS + ["ablation_rand_off"])],
         {"mask_mean_iou": 0.8})
    rec = json.loads(out.read_text())
    assert rec["ablation_rand_on_hard"] == {"score": 1.5}
    assert rec["ablation_rand_on_easy"] == {"mask_mean_iou": 0.8}
    assert "ablation_rand_off_hard" not in rec
