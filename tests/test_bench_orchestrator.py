"""Unit tests for bench.py's orchestration layer (no jax, no TPU).

The orchestrator's job is to make the official record LAND under a driver
timeout even when the axon worker crash-loops (VERDICT r3 #1: the round-3
record was lost to an unbounded bench). These tests stub the headline
subprocess and pin:

* probe-failure attempts (rc!=0, empty stdout) are retried until the
  budget floor — not a fixed count that a flaky worker can burn through,
* a successful attempt's LAST json line becomes the headline record,
* budget exhaustion still prints a parseable record with an error field.
"""

import importlib.util
import json
import os
import subprocess
import sys
import time
import types

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    # Skip every secondary mode so main() only exercises the headline loop.
    for var in ("BENCH_SKIP_FIT", "BENCH_SKIP_TRACK", "BENCH_SKIP_FRAME"):
        monkeypatch.setenv(var, "1")
    monkeypatch.delenv("BENCH_MODE", raising=False)
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_main(bench, monkeypatch, capsys, run_results, budget=1140.0):
    """Drive bench.main() with a scripted sequence of subprocess results."""
    calls = []

    def fake_run(cmd, **kw):
        i = min(len(calls), len(run_results) - 1)
        calls.append(kw.get("env", {}).get("BENCH_MODE"))
        res = run_results[i]
        if isinstance(res, Exception):
            raise res
        return types.SimpleNamespace(returncode=res.get("rc", 0),
                                     stdout=res.get("stdout", ""),
                                     stderr=res.get("stderr", ""))

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._BUDGET = budget
    bench._T0 = time.time()
    bench.main()
    out_lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.strip().startswith("{")]
    return calls, [json.loads(ln) for ln in out_lines]


def test_headline_retries_probe_failures_then_lands(bench, monkeypatch,
                                                    capsys):
    ok = json.dumps({"metric": "player crops/sec/chip", "value": 12000.0,
                     "unit": "crops/s", "vs_baseline": 24.0})
    calls, recs = _run_main(
        bench, monkeypatch, capsys,
        [{"rc": 3, "stdout": "", "stderr": "# bench: TPU unreachable"},
         {"rc": 3, "stdout": "", "stderr": "# bench: TPU unreachable"},
         {"rc": 3, "stdout": "", "stderr": "# bench: TPU unreachable"},
         {"rc": 0, "stdout": ok}])
    # A fixed 3-attempt loop would have given up before the 4th (successful)
    # attempt; the budget-floor loop must reach it.
    assert len(calls) == 4
    assert recs[-1]["value"] == 12000.0
    assert "error" not in recs[-1]


def test_headline_lands_on_last_json_line(bench, monkeypatch, capsys):
    partial = json.dumps({"metric": "m", "value": 1.0, "unit": "crops/s"})
    final = json.dumps({"metric": "m", "value": 1.0, "unit": "crops/s",
                        "single_crop_latency_ms": 2.5})
    _, recs = _run_main(bench, monkeypatch, capsys,
                        [{"rc": 0, "stdout": partial + "\n" + final}])
    assert recs[-1]["single_crop_latency_ms"] == 2.5


def test_budget_exhaustion_prints_parseable_error_record(bench, monkeypatch,
                                                         capsys):
    # Budget below the 120s attempt floor: no attempt runs at all.
    calls, recs = _run_main(bench, monkeypatch, capsys,
                            [{"rc": 3, "stdout": ""}], budget=300.0)
    assert calls == []
    assert recs[-1]["value"] is None
    assert "error" in recs[-1]
    assert recs[-1]["unit"] == "crops/s"
