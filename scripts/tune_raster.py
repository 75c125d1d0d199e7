"""Rasterizer tile-shape tuner. Usage:

    python scripts/tune_raster.py [wh] [band_h tile_w chunk]...

Measures fwd and fwd+bwd wall time of the production Pallas rasterizer
(cull on, fit-shaped batch of 22 players) for each (band_h, tile_w, chunk)
config at the given resolution, one config per line. With no configs, runs
the default grid. Run each invocation in a fresh process — the remote
worker can fault on new kernel configs (see docs/PERF.md), and a crashed
JAX client cannot recover in-process.

The measured optimum goes into ``pallas_raster._tile_width`` /
``default_band_h``; current defaults are from the v5e sweep recorded in
docs/PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    wh = int(args[0]) if args else 256
    rest = [int(a) for a in args[1:]]
    configs = [tuple(rest[i:i + 3]) for i in range(0, len(rest), 3)] or [
        (8, wh, 8), (16, 128, 8), (16, wh, 8), (32, 128, 8)]

    import numpy as np
    import jax
    import jax.numpy as jnp
    from soccerplayershapepose_tpu.ops import batch_rodrigues
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.smpl.model import smpl_forward

    assets = load_assets()
    rng = np.random.RandomState(0)
    b = 22
    rot = batch_rodrigues(jnp.asarray(rng.randn(b, 24, 3).astype(np.float32)
                                      * 0.15))
    out = smpl_forward(assets,
                       jnp.asarray(rng.randn(b, 10).astype(np.float32) * 0.5),
                       rot[:, 1:], rot[:, :1])
    v2 = (out.vertices[..., :2] + 1.0) * (wh / 2.0)
    faces = assets.faces

    def timeit(fn, n=20):
        fn()
        acc = fn()
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(n):
            acc = acc + fn()
        float(acc)        # forces completion through the data dependency
        return (time.perf_counter() - t0) / n * 1000

    for bh, tw, chunk in configs:
        os.environ["SPT_PALLAS_TILE_W"] = str(tw)
        from soccerplayershapepose_tpu.render.pallas_raster import (
            soft_silhouette_fast)

        def fwd(v, _bh=bh, _c=chunk):
            return jnp.sum(soft_silhouette_fast(
                v, faces, wh, 1e-5, _bh, _c, False, True))

        def grad(v, _bh=bh, _c=chunk):
            return jnp.sum(jax.grad(lambda vv: jnp.sum(soft_silhouette_fast(
                vv, faces, wh, 1e-5, _bh, _c, False, True) ** 2))(v))

        fwd_j, grad_j = jax.jit(fwd), jax.jit(grad)
        f = timeit(lambda: fwd_j(v2))
        g = timeit(lambda: grad_j(v2))
        print(f"{wh}^2 bh={bh:3d} tw={tw:3d} chunk={chunk:3d}  "
              f"fwd={f:8.2f}ms  fwd+bwd={g:8.2f}ms", flush=True)


if __name__ == "__main__":
    main()
