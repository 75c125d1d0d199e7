"""MFU / roofline characterization (VERDICT r2 #8).

Measures achieved FLOP/s for the predict slice via XLA's own cost analysis
(compiled.cost_analysis) over the measured wall time, and compares against
the v5e peak (197 TFLOP/s bf16 / 394 TOPS int8; VPU ~ 4 TOP/s-class for
elementwise f32). For the fit loop it reports the rasterizer's achieved
element throughput against a VPU-bound estimate, making the "fit is
VPU-bound, predict is MXU-bound" claim in docs/PERF.md quantitative.

Usage: python scripts/mfu.py [predict|fit]  (runs on the real chip)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12      # TFLOP/s, public v5e spec
V5E_PEAK_F32 = 49e12        # ~bf16/4 for f32 matmul


def mfu_predict():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from soccerplayershapepose_tpu.pipeline.predict import build_predictor
    from soccerplayershapepose_tpu.smpl import load_assets

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    assets = load_assets()
    _, params, fn = build_predictor(in_channels=18, resnet_layers=18,
                                    dtype=dtype)
    rng = np.random.RandomState(0)
    sil = jnp.asarray((rng.rand(batch, 512, 512) > 0.8).astype(np.float32))
    j2d = jnp.asarray(rng.uniform(64, 448, (batch, 17, 2)).astype(np.float32))

    lowered = jax.jit(fn).lower(params, assets, sil, j2d)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    flops = float(cost.get("flops", 0.0))

    out = fn(params, assets, sil, j2d)
    float(out.vertices.sum())
    # Residual warm loop (matches bench.py): on this tunnel the FIRST
    # post-compile executions carry a ~1 s one-time cost (device program
    # upload); without this, a 20-iter average reads ~56 ms/call for a
    # 9.5 ms/call program (r4 postmortem — the r3/r4c "6-7% MFU predict"
    # records were this artifact, not device time).
    acc = jnp.zeros(())
    for _ in range(3):
        o = fn(params, assets, sil, j2d)
        acc = acc + o.vertices[0, 0, 0]
    float(acc)
    iters = 20
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        o = fn(params, assets, sil, j2d)
        acc = acc + o.vertices[0, 0, 0]
    float(acc)
    dt = (time.perf_counter() - t0) / iters

    achieved = flops / dt
    peak = V5E_PEAK_BF16 if dtype == "bfloat16" else V5E_PEAK_F32
    print(json.dumps({
        "slice": "predict (crop->mesh, batch %d, %s)" % (batch, dtype),
        "xla_flops_per_call": flops,
        "wall_s_per_call": round(dt, 5),
        "achieved_tflops": round(achieved / 1e12, 2),
        "v5e_peak_tflops": peak / 1e12,
        "mfu": round(achieved / peak, 4),
        "gflops_per_crop": round(flops / batch / 1e9, 2),
    }))


def mfu_fit():
    """Rasterizer kernel throughput vs a VPU-bound element estimate.

    Measures the configuration the fit engine actually ships —
    FitConfig.pallas_chunk (8) — with the visits estimate computed at the
    SAME chunk size; BENCH_RASTER_CHUNK overrides for sweep comparisons.
    (r4 postmortem: this briefly defaulted to 86 on the belief that the
    tuned sweep config shipped; the engine hardcoded 8, and chunk 86
    crashed the backward kernel's face-block tiling before the lcm fix in
    pallas_raster._pallas_bwd.)
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from soccerplayershapepose_tpu.render.pallas_raster import (
        _band_chunk_bounds, _sorted_tri_and_ranges, default_band_h,
        soft_silhouette_fast)
    from soccerplayershapepose_tpu.smpl import load_assets

    assets = load_assets()
    b = 22
    wh = int(os.environ.get("BENCH_RASTER_WH", "256"))
    chunk = int(os.environ.get("BENCH_RASTER_CHUNK", "8"))
    rng = np.random.RandomState(0)
    v2d = jnp.asarray(
        (np.asarray(assets.v_template)[None, :, :2] * (wh * 0.45)
         + wh / 2 + rng.randn(b, 1, 2) * 4).astype(np.float32))
    band_h = default_band_h(wh)

    def loss(v):
        return jnp.sum(soft_silhouette_fast(v, assets.faces, wh,
                                            band_h=band_h, chunk=chunk,
                                            backface_cull=True) ** 2)

    g = jax.jit(jax.grad(loss))
    r = g(v2d)
    float(jnp.abs(r).sum())
    iters = 10
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        acc = acc + g(v2d)[0, 0, 0]
    float(acc)
    dt = (time.perf_counter() - t0) / iters

    # Candidate (face, pixel) visits actually evaluated: sum over bands of
    # (hi-lo)*chunk faces × band pixels — the work the banded kernel admits
    # at the SAME chunk size the timed kernel ran with.
    setup = _sorted_tri_and_ranges(v2d, assets.faces, chunk, True)
    sigma_px = 1e-5 * (wh / 2.0) ** 2
    margin = (20.0 * sigma_px) ** 0.5 + 2.0
    n_bands = -(-wh // band_h)
    lo, hi = _band_chunk_bounds(setup[2], setup[3], n_bands, band_h, margin)
    # Empty bands use a lo>hi convention (the kernel's fori_loop runs zero
    # times) — clamp before summing; and sum in python floats: the
    # chunk*band_h*wh multiply overflows int32 (observed: negative visits).
    visits = float(jnp.sum(jnp.maximum(hi - lo, 0))) * chunk * band_h * wh

    # ~70 VPU flops per (face, pixel) visit fwd + ~110 bwd (counted from the
    # kernel bodies); v5e VPU ~ 4 TOP/s-class for f32 elementwise.
    est_flops = visits * 180.0
    print(json.dumps({
        "slice": "fit rasterizer fwd+bwd (22 players, %d^2, chunk %d, "
                 "band_h %d)" % (wh, chunk, band_h),
        "wall_s_per_call": round(dt, 4),
        "candidate_visits": visits,
        "est_vpu_flops_per_call": est_flops,
        "achieved_vpu_tflops": round(est_flops / dt / 1e12, 3),
        "vpu_peak_tflops_class": 4.0,
        "fraction_of_vpu_peak": round(est_flops / dt / 4e12, 3),
    }))


def mfu_predict_breakdown():
    """Where the predict slice's wall time goes (VERDICT r3 #7).

    Times each stage of the crop→mesh program as its own jitted
    sub-program: proxy construction (512² silhouette resize + 17 Gaussian
    heatmaps), ResNet-18+IEF regression, and SMPL LBS + projection. Stage
    walls measured the same way as the full slice (chained scalar data
    dependency, one host pull); the sum exceeds the fused wall because
    fusion deletes intermediate HBM round-trips — the ratio column is
    share of the SUM, the honest attribution of relative cost.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from soccerplayershapepose_tpu import config as cfg
    from soccerplayershapepose_tpu.models.ief import default_initial_params
    from soccerplayershapepose_tpu.ops.rotations import rot6d_to_rotmat
    from soccerplayershapepose_tpu.pipeline.predict import build_predictor
    from soccerplayershapepose_tpu.pipeline.proxy import \
        create_proxy_representation
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.smpl.model import (smpl_forward,
                                                      smpl_shape_only)

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    assets = load_assets()
    regressor, params, fn = build_predictor(in_channels=18,
                                            resnet_layers=18, dtype=dtype)
    rng = np.random.RandomState(0)
    sil = jnp.asarray((rng.rand(batch, 512, 512) > 0.8).astype(np.float32))
    j2d = jnp.asarray(rng.uniform(64, 448, (batch, 17, 2)).astype(np.float32))

    proxy_fn = jax.jit(lambda s, j: create_proxy_representation(
        s, j, in_wh=512, out_wh=cfg.REGRESSOR_IMG_WH,
        dtype=regressor.dtype))  # the dtype the shipped predict path builds at
    init = default_initial_params(assets.mean_pose_rot6d, assets.mean_shape)
    reg_fn = jax.jit(lambda p, x: regressor.apply(p, x, init))

    def lbs(a, pose6d, betas):
        rm = rot6d_to_rotmat(pose6d.reshape(-1, cfg.NUM_JOINTS, 6))
        out = smpl_forward(a, betas, rm[:, 1:], rm[:, :1])
        return out.vertices, smpl_shape_only(a, betas)

    lbs_fn = jax.jit(lbs)

    def timed(f, *args, probe, iters=20):
        f(*args)                       # compile
        acc = jnp.zeros(())            # warm: absorb the one-time program-
        for _ in range(3):             # upload cost (see mfu_predict note)
            acc = acc + probe(f(*args))
        float(acc)
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = acc + probe(f(*args))
        float(acc)
        return (time.perf_counter() - t0) / iters

    proxy = proxy_fn(sil, j2d)
    cam_wp, pose6d, betas = reg_fn(params, proxy)
    walls = {
        "full_fused": timed(fn, params, assets, sil, j2d,
                            probe=lambda o: o.vertices[0, 0, 0]),
        "proxy_build": timed(proxy_fn, sil, j2d,
                             probe=lambda o: o[0, 0, 0, 0]),
        "regressor_ief": timed(reg_fn, params, proxy,
                               probe=lambda o: o[0][0, 0]),
        "lbs_project": timed(lbs_fn, assets, pose6d, betas,
                             probe=lambda o: o[0][0, 0, 0]),
    }
    ssum = sum(v for k, v in walls.items() if k != "full_fused")
    print(json.dumps({
        "slice": "predict breakdown (batch %d, %s)" % (batch, dtype),
        **{f"{k}_ms": round(v * 1e3, 3) for k, v in walls.items()},
        "stage_sum_ms": round(ssum * 1e3, 3),
        **{f"{k}_share_of_sum": round(v / ssum, 3)
           for k, v in walls.items() if k != "full_fused"},
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "predict"
    {"predict": mfu_predict, "fit": mfu_fit,
     "predict-breakdown": mfu_predict_breakdown}[mode]()
