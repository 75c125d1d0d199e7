"""Isolate the bench.py-vs-mfu.py predict-slice wall gap (VERDICT r4 #7).

bench_headline and mfu_predict time the SAME jitted program with the same
scalar-chained accumulator loop, yet report ~9.5 ms vs ~56 ms per batch-128
call, stably across rounds. This probe runs both recipes interleaved in ONE
process, plus controlled variants, to attribute the gap:

  A  bench recipe: warm loop of 3 with host sync, then timed loop of 30
  B  mfu recipe:   single warm call + float(sum), then timed loop of 20
  C  iters sweep:  timed loops of 5/10/20/30/60 after full warmup
     (a fixed per-loop cost shows up as wall/iter falling with iters;
     a genuine per-call cost is flat)

Usage: python scripts/predict_timing_probe.py   (on the real chip)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    import numpy as np
    from soccerplayershapepose_tpu.pipeline.predict import build_predictor
    from soccerplayershapepose_tpu.smpl import load_assets

    batch = 128
    assets = load_assets()
    _, params, fn = build_predictor(in_channels=18, resnet_layers=18,
                                    dtype="bfloat16")
    rng = np.random.RandomState(0)
    sil = jnp.asarray((rng.rand(batch, 512, 512) > 0.8).astype(np.float32))
    j2d = jnp.asarray(rng.uniform(64, 448, (batch, 17, 2)).astype(np.float32))

    def loop(n):
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(n):
            out = fn(params, assets, sil, j2d)
            acc = acc + out.vertices[0, 0, 0]
        float(acc)
        return (time.perf_counter() - t0) / n

    rec = {}
    # compile + bench-style warm
    out = fn(params, assets, sil, j2d)
    float(out.vertices.sum())
    loop(3)
    rec["bench_recipe_30_ms"] = round(loop(30) * 1e3, 3)
    # mfu-style: no extra warm loop, 20 iters (already warm here, so any
    # difference vs the standalone mfu run is warmup, not steady state)
    rec["mfu_recipe_20_ms"] = round(loop(20) * 1e3, 3)
    for n in (5, 10, 20, 30, 60):
        rec[f"loop{n}_ms_per_call"] = round(loop(n) * 1e3, 3)
    # cold-ish again: single call + big float sync, then 20 (replicates the
    # standalone mfu_predict sequence as closely as one process can)
    out = fn(params, assets, sil, j2d)
    float(out.vertices.sum())
    rec["mfu_sequence_20_ms"] = round(loop(20) * 1e3, 3)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
