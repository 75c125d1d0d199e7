"""TPU crash isolation probes. Usage: python scripts/probe_tpu.py <stage>

Each stage runs alone in its own process so a worker crash identifies the
culprit precisely. Stages:
  wait        — block until the device answers a tiny op
  raster_fwd  — XLA soft_silhouette forward (B=2, 128²)
  raster_grad — grad through XLA soft_silhouette (checkpointed scan)
  pallas_grad — grad through the Pallas custom-vjp rasterizer
  eval_fwd    — fit-engine evaluate_fit forward
  fit2        — single_view_fit, 2 iters
  fit100      — single_view_fit, 100 iters
  fit100p     — single_view_fit, 100 iters with use_pallas=True
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def wait_for_device(max_wait_s=1200):
    import subprocess
    deadline = time.time() + max_wait_s
    probe = "import jax, jax.numpy as jnp; print(float(jnp.ones((8,)).sum()))"
    while time.time() < deadline:
        try:
            out = subprocess.run([sys.executable, "-c", probe],
                                 capture_output=True, timeout=90)
            if out.returncode == 0 and b"8.0" in out.stdout:
                print("device up", flush=True)
                return True
        except subprocess.TimeoutExpired:
            pass
        print("waiting for device...", flush=True)
        time.sleep(30)
    return False


def fixtures():
    import numpy as np
    import jax.numpy as jnp
    from soccerplayershapepose_tpu.ops import batch_rodrigues
    from soccerplayershapepose_tpu.smpl import load_assets
    assets = load_assets()
    rng = np.random.RandomState(0)
    b = 2
    aa = rng.randn(b, 24, 3).astype(np.float32) * 0.15
    rot = batch_rodrigues(jnp.asarray(aa))
    betas = jnp.asarray(rng.randn(b, 10).astype(np.float32) * 0.5)
    cam = jnp.tile(jnp.array([[0.9, 0.0, 0.0]]), (b, 1))
    sil = jnp.asarray((rng.rand(b, 512, 512) > 0.9).astype(np.float32))
    j2d = jnp.asarray(rng.uniform(100, 400, (b, 17, 2)).astype(np.float32))
    v2d = jnp.asarray((np.asarray(assets.v_template)[None, :, :2] * 50 + 64
                       + rng.randn(b, 1, 2)).astype(np.float32))
    return assets, rot, betas, cam, sil, j2d, v2d


def main():
    stage = sys.argv[1]
    if stage == "wait":
        sys.exit(0 if wait_for_device() else 1)

    import numpy as np
    import jax
    import jax.numpy as jnp

    assets, rot, betas, cam, sil, j2d, v2d = fixtures()
    t0 = time.time()

    if stage == "raster_fwd":
        from soccerplayershapepose_tpu.render import soft_silhouette
        out = soft_silhouette(v2d, assets.faces, 128, sigma=1e-5)
        print("ok", float(out.sum()), flush=True)
    elif stage == "raster_grad":
        from soccerplayershapepose_tpu.render import soft_silhouette
        g = jax.grad(lambda v: jnp.sum(
            soft_silhouette(v, assets.faces, 128, sigma=1e-5)))(v2d)
        print("ok", float(jnp.abs(g).sum()), flush=True)
    elif stage == "pallas_grad2":
        import soccerplayershapepose_tpu.render.pallas_raster as pr
        pr._USE_PALLAS_BWD = True
        g = jax.grad(lambda v: jnp.sum(
            pr.soft_silhouette_fast(v, assets.faces, 128, 1e-5)))(v2d)
        print("ok", float(jnp.abs(g).sum()), flush=True)
    elif stage == "pallas_grad":
        from soccerplayershapepose_tpu.render.pallas_raster import (
            soft_silhouette_fast)
        g = jax.grad(lambda v: jnp.sum(
            soft_silhouette_fast(v, assets.faces, 128, 1e-5)))(v2d)
        print("ok", float(jnp.abs(g).sum()), flush=True)
    elif stage == "eval_fwd":
        from soccerplayershapepose_tpu.fit import FitConfig
        from soccerplayershapepose_tpu.fit.engine import evaluate_fit
        fit_cfg = FitConfig(iters=2, render_wh=128)
        ev = jax.jit(lambda: evaluate_fit(
            assets, rot[:, 1:], rot[:, :1], betas, cam, sil, j2d, fit_cfg))()
        print("ok", np.asarray(ev["iou"]), flush=True)
    elif stage.startswith("fit"):
        # fit<N>[p|j|s]: N iters; p=pallas, j=joints-only, s=segmented(10)
        from soccerplayershapepose_tpu.fit import (
            FitConfig, FitInit, single_view_fit)
        spec = stage[3:]
        flags = ""
        while spec and spec[-1] in "pjs":
            flags += spec[-1]
            spec = spec[:-1]
        iters = int(spec)
        fit_cfg = FitConfig(iters=iters, render_wh=128,
                            use_pallas="p" in flags,
                            use_silhouette="j" not in flags,
                            silhouette_metrics="j" not in flags,
                            iters_per_call=10 if "s" in flags else None)
        init = FitInit(body_pose=rot[:, 1:], global_orient=rot[:, :1],
                       betas=betas, cam_wp=cam)
        res = single_view_fit(assets, init, sil, j2d, fit_cfg)
        print("ok", np.asarray(res.joint_err), flush=True)
    else:
        raise SystemExit(f"unknown stage {stage}")
    print(f"{stage}: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
