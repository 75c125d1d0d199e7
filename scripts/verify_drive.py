"""Round-3 verify drive: exercise the changed public API on the real chip.

Covers (per .claude/skills/verify/SKILL.md): the new synth factory forward,
one ProxyNet + detector train step, and the full-frame pipeline — all small
shapes, each timed, completion forced through scalar pulls.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402
import numpy as np             # noqa: E402


def t(name, fn):
    t0 = time.perf_counter()
    v = fn()
    dt = time.perf_counter() - t0
    print(f"{name}: {v:.5f} ({dt:.2f}s incl compile)", flush=True)


def main():
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.synth import (
        synth_crop_batch, synth_frame_batch)

    print("backend:", jax.devices()[0].platform, flush=True)
    assets = load_assets()
    rng = jax.random.PRNGKey(0)

    batch = synth_crop_batch(assets, rng, b=4, wh=256)
    t("synth_crop_batch mean", lambda: float(batch["image"].mean()))
    cov = float(batch["silhouette"].mean())
    assert 0.005 < cov < 0.9, cov
    fb = synth_frame_batch(assets, rng, b=2, n_players=6, hw=(256, 448))
    t("synth_frame_batch mean", lambda: float(fb["image"].mean()))

    from soccerplayershapepose_tpu.models.perception import ProxyNet
    from soccerplayershapepose_tpu.train.perception import (
        make_proxynet_state, make_proxynet_train_step)
    model = ProxyNet(with_iuv=True)
    state, tx = make_proxynet_state(model, jax.random.PRNGKey(1), wh=256)
    step = jax.jit(make_proxynet_train_step(model, tx))
    state, losses = step(state, batch)
    t("proxynet step total", lambda: float(losses["total"]))
    state, losses2 = step(state, batch)
    assert float(losses2["total"]) < float(losses["total"]) * 1.5

    from soccerplayershapepose_tpu.models.detector import PlayerDetector
    from soccerplayershapepose_tpu.pipeline.fullframe import \
        build_frame_pipeline
    from soccerplayershapepose_tpu.pipeline.predict import build_predictor
    det = PlayerDetector()
    det_vars = det.init(jax.random.PRNGKey(2), jnp.zeros((1, 256, 448, 3)))
    pvars = {"params": state.params, "batch_stats": state.batch_stats}
    regressor, reg_params, _ = build_predictor(in_channels=18,
                                               dtype="bfloat16")
    fn = build_frame_pipeline(det, det_vars, model, pvars, regressor,
                              reg_params, max_players=8, crop_wh=256)
    frames = jnp.asarray(np.random.RandomState(0)
                         .rand(1, 256, 448, 3).astype(np.float32))
    out = fn(assets, frames)
    t("frame pipeline verts", lambda: float(jnp.abs(out.vertices).mean()))
    assert np.isfinite(np.asarray(out.vertices)).all()

    # New fused backward rasterizer kernel on-chip vs XLA oracle gradient.
    from soccerplayershapepose_tpu.render.pallas_raster import \
        soft_silhouette_fast
    from soccerplayershapepose_tpu.render.softras import (
        cull_backfaces, soft_silhouette)
    v2d = jnp.asarray(
        (np.asarray(assets.v_template)[None, :, :2] * 100 + 128
         + np.random.RandomState(0).randn(2, 1, 2)).astype(np.float32))

    def loss_fast(v):
        return jnp.sum(soft_silhouette_fast(v, assets.faces, 256,
                                            backface_cull=True) ** 2)

    def loss_oracle(v):
        fc = cull_backfaces(v, assets.faces)
        return jnp.sum(soft_silhouette(v, fc, 256) ** 2)

    g_fast = jax.jit(jax.grad(loss_fast))(v2d)
    g_ref = jax.jit(jax.grad(loss_oracle))(v2d)
    rel = float(jnp.linalg.norm(g_fast - g_ref)
                / (jnp.linalg.norm(g_ref) + 1e-12))
    print(f"bwd kernel grad rel-l2 vs oracle: {rel:.2e}", flush=True)
    assert rel < 1e-4, rel
    print("VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
