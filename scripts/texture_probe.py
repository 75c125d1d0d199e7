"""Texture-from-IUV quality probe (VERDICT r4 weak #7).

Measures the texture subsystem end to end on the synthetic factory, where
GT IUV is exact: how much texture quality is lost when the atlas is built
from the trained ProxyNet's predicted IUV instead of ground truth — the
deployment condition of ``create_texture`` (UVConverter.py:133-207, fed by
predict_densepose.py:122-158 in the reference).

Cells (all at the IUV head's stride-4 grid, the resolution the reference's
DensePose results arrive at):
  gt_roundtrip    atlas from GT IUV, re-sampled at GT IUV coords -> masked
                  PSNR vs the source pixels (scatter/gather quantization
                  ceiling)
  pred_roundtrip  same with ProxyNet IUV end to end (its own atlas + its
                  own coords)
  pred_vs_gt      ProxyNet atlas vs GT atlas on jointly covered texels
                  (L1 + PSNR) + texel coverage ratio

Usage: python scripts/texture_probe.py [--batch 16] [--batches 4] [--cpu]
Writes weights/texture_quality.json.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--wh", type=int, default=256)
    p.add_argument("--weights", default="weights/proxynet_256_f16.npz")
    p.add_argument("--seed", type=int, default=77_000_000)
    p.add_argument("--json", default="weights/texture_quality.json")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        from soccerplayershapepose_tpu.utils.precision import pin_cpu
        pin_cpu()

    import jax
    import jax.numpy as jnp
    from soccerplayershapepose_tpu.models.perception import (
        ProxyNet, decode_iuv)
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.texture.uv import (
        NUM_PARTS, PART_RES, iuv_to_atlas_texture)
    from soccerplayershapepose_tpu.train.perception import \
        load_perception_weights
    from soccerplayershapepose_tpu.train.synth import synth_crop_batch

    assets = load_assets()
    model = ProxyNet(with_iuv=True)
    variables = load_perception_weights(
        os.path.join(REPO, args.weights), model, wh=args.wh)
    grid = args.wh // 4

    def tex_coords(iuv):
        """IUV image -> (valid, flat texel index) as the scatter op."""
        part = jnp.round(iuv[..., 0]).astype(jnp.int32)
        u = iuv[..., 1].astype(jnp.float32)
        v = iuv[..., 2].astype(jnp.float32)
        u = jnp.where(u > 1.5, u / 255.0, u)
        v = jnp.where(v > 1.5, v / 255.0, v)
        valid = part > 0
        pi = jnp.clip(part - 1, 0, NUM_PARTS - 1)
        r = jnp.clip(jnp.round(u * (PART_RES - 1)), 0,
                     PART_RES - 1).astype(jnp.int32)
        c = jnp.clip(jnp.round(v * (PART_RES - 1)), 0,
                     PART_RES - 1).astype(jnp.int32)
        return valid, (pi * PART_RES + r) * PART_RES + c

    def roundtrip_psnr(img, iuv):
        """Scatter to atlas, gather back at the same coords, masked PSNR."""
        tex, _ = iuv_to_atlas_texture(img, iuv)
        valid, idx = tex_coords(iuv)
        recon = tex.reshape(-1, 3)[idx]
        err = jnp.sum(((recon - img) ** 2) * valid[..., None]) \
            / jnp.maximum(jnp.sum(valid) * 3, 1)
        return 10.0 * jnp.log10(1.0 / jnp.maximum(err, 1e-10))

    @jax.jit
    def cell(rng):
        b = synth_crop_batch(assets, rng, b=args.batch, wh=args.wh)
        img64 = jax.image.resize(
            b["image"], (args.batch, grid, grid, 3), "linear")
        iuv_gt = jnp.concatenate(
            [b["part"][..., None].astype(jnp.float32), b["uv"]], axis=-1)
        out = model.apply(variables, b["image"], train=False)
        iuv_pred = decode_iuv(out.part_logits, out.uv)

        tex_gt, m_gt = jax.vmap(iuv_to_atlas_texture)(img64, iuv_gt)
        tex_pr, m_pr = jax.vmap(iuv_to_atlas_texture)(img64, iuv_pred)

        inter = m_gt * m_pr
        l1 = jnp.sum(jnp.abs(tex_gt - tex_pr) * inter[..., None]) \
            / jnp.maximum(jnp.sum(inter) * 3, 1)
        mse = jnp.sum(((tex_gt - tex_pr) ** 2) * inter[..., None]) \
            / jnp.maximum(jnp.sum(inter) * 3, 1)
        return {
            "gt_roundtrip_psnr_db": jnp.mean(
                jax.vmap(roundtrip_psnr)(img64, iuv_gt)),
            "pred_roundtrip_psnr_db": jnp.mean(
                jax.vmap(roundtrip_psnr)(img64, iuv_pred)),
            "pred_vs_gt_l1": l1,
            "pred_vs_gt_psnr_db": 10.0 * jnp.log10(
                1.0 / jnp.maximum(mse, 1e-10)),
            "coverage_gt": jnp.mean(m_gt),
            "coverage_pred": jnp.mean(m_pr),
            "coverage_inter": jnp.mean(inter),
        }

    t0 = time.time()
    sums = None
    for i in range(args.batches):
        m = {k: float(v) for k, v in cell(
            jax.random.fold_in(jax.random.PRNGKey(args.seed), i)).items()}
        sums = m if sums is None else {k: sums[k] + m[k] for k in sums}
    out = {k: round(v / args.batches, 4) for k, v in sums.items()}
    out.update(n_crops=args.batch * args.batches, wh=args.wh,
               grid=grid, part_res=PART_RES,
               proxynet_weights=args.weights,
               wall_s=round(time.time() - t0, 1),
               note=("atlas scatter at the stride-4 IUV grid; roundtrip = "
                     "scatter->gather PSNR vs source pixels; pred_vs_gt on "
                     "jointly covered texels"))
    dst = os.path.join(REPO, args.json)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, dst)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
