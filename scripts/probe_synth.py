"""Stage-by-stage TPU probe of the synth factory (crash isolation).

Each stage executes + pulls a scalar before the next; when the worker
faults, the last printed stage identifies the culprit program. Run after
`probe_tpu.py wait`.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                 # noqa: E402
import jax.numpy as jnp    # noqa: E402
import numpy as np         # noqa: E402


def stage(name, fn):
    t0 = time.perf_counter()
    v = float(fn())
    print(f"OK {name}: {v:.5f} ({time.perf_counter() - t0:.2f}s)",
          flush=True)


def main():
    from soccerplayershapepose_tpu import config as cfg
    from soccerplayershapepose_tpu.ops.camera import (
        perspective_project, weak_perspective_to_translation)
    from soccerplayershapepose_tpu.render.attribute import \
        rasterize_attributes
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.smpl.model import smpl_forward
    from soccerplayershapepose_tpu.train import synth as S

    b, wh = 4, 256
    assets = load_assets()
    rng = jax.random.PRNGKey(0)
    stage("tiny", lambda: jnp.ones((8,)).sum())

    body_rm, orient_rm, betas, cam_wp = S.random_smpl_params(rng, b)
    out = smpl_forward(assets, betas, body_rm, orient_rm, pose2rot=False)
    stage("smpl_forward", lambda: out.vertices.mean())

    transl = weak_perspective_to_translation(cam_wp, cfg.FOCAL_LENGTH, wh)
    v2d = perspective_project(out.vertices, None, transl,
                              focal_length=cfg.FOCAL_LENGTH, img_wh=wh)
    vz = out.vertices[..., 2] + transl[:, None, 2]
    stage("project", lambda: v2d.mean())

    colors = S._kit_vertex_colors(assets, rng, b)
    stage("kit_colors", lambda: colors.mean())

    shaded = S._shaded_colors(rng, out.vertices, assets.faces, colors)
    stage("vertex_normals+shading", lambda: shaded.mean())

    bg = S._background(rng, b, wh, wh)
    stage("background", lambda: bg.mean())

    img = jax.random.uniform(rng, (b, wh, wh, 3))
    blurred = S._motion_blur(rng, img)
    stage("motion_blur", lambda: blurred.mean())

    photo = S._photometric(rng, img)
    stage("photometric", lambda: photo.mean())

    small = wh // 4
    attrs27 = jnp.concatenate(
        [jax.nn.one_hot(S.vertex_parts(assets), 24),
         S.vertex_uv(assets), jnp.ones((6890, 1))], axis=-1)
    attrs27 = jnp.broadcast_to(attrs27[None], (b,) + attrs27.shape)
    sa, sm = rasterize_attributes(v2d * (small / wh), vz, attrs27,
                                  assets.faces, small)
    stage("raster_small_27ch", lambda: sa.mean() + sm.sum())

    attrs4 = jnp.concatenate([shaded, jnp.ones((b, 6890, 1))], axis=-1)
    fa, fm = rasterize_attributes(v2d, vz, attrs4, assets.faces, wh)
    stage("raster_full_4ch", lambda: fa.mean() + fm.sum())

    # Two-body scene (the occluder path doubles verts/faces).
    v2 = jnp.concatenate([v2d, v2d + 30.0], axis=1)
    z2 = jnp.concatenate([vz, vz + 0.5], axis=1)
    a2 = jnp.concatenate([attrs4, attrs4], axis=1)
    f2 = jnp.concatenate([assets.faces, assets.faces + 6890])
    fa2, fm2 = rasterize_attributes(v2, z2, a2, f2, wh)
    stage("raster_full_2body", lambda: fa2.mean() + fm2.sum())

    batch = S.synth_crop_batch(assets, rng, b=b, wh=wh)
    stage("synth_crop_batch", lambda: batch["image"].mean())

    fb = S.synth_frame_batch(assets, rng, b=2, n_players=6, hw=(256, 448))
    stage("synth_frame_batch", lambda: fb["image"].mean())
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
