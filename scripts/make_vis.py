"""Render committed-weights prediction visualizations for the docs.

Held-out synth crops (eval seed range) -> ProxyNet overlay montage
(mask + keypoints, the create_proxy vis contract), and optionally a
detector box-overlay frame. Writes docs/media/*.png.

Usage: python scripts/make_vis.py [proxy|detector] [out.png]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("SPT_CPU") == "1":
    from soccerplayershapepose_tpu.utils.precision import pin_cpu
    pin_cpu()


def save_png(path, arr):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)
    print(f"wrote {path}")


def proxy_montage(out_path, n=4, wh=256):
    import jax
    import numpy as np
    from soccerplayershapepose_tpu.models.perception import ProxyNet
    from soccerplayershapepose_tpu.pipeline.extract import (
        ProxyExtractor, _proxy_vis)
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.perception import \
        load_perception_weights
    from soccerplayershapepose_tpu.train.quality import EVAL_SEED_BASE
    from soccerplayershapepose_tpu.train.synth import synth_crop_batch

    model = ProxyNet(with_iuv=True, channels=128)
    variables = load_perception_weights(
        os.path.join(ROOT, "weights", f"proxynet_{wh}_f16.npz"), model,
        wh=wh)
    ex = ProxyExtractor(model, variables, wh=wh, flip_tta=True)
    assets = load_assets()
    batch = synth_crop_batch(assets, jax.random.PRNGKey(EVAL_SEED_BASE + 77),
                             b=n, wh=wh, occluders=True, domain_rand=True)
    imgs = np.asarray(batch["image"] * 255).astype(np.uint8)
    panels = []
    for img, (kp, sil, _) in zip(imgs, ex(imgs)):
        if kp is None:
            panels.append(np.concatenate([img, img], axis=1))
            continue
        panels.append(np.concatenate([img, _proxy_vis(img, sil, kp)], axis=1))
    save_png(out_path, np.concatenate(panels, axis=0))


def detector_frame(out_path, hw=(256, 448),
                   weights="weights/detector_256x448_f16.npz"):
    import jax
    import numpy as np
    from soccerplayershapepose_tpu.models.detector import PlayerDetector
    from soccerplayershapepose_tpu.pipeline.extract import \
        PlayerDetectorRunner
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.perception import \
        load_perception_weights
    from soccerplayershapepose_tpu.train.quality import EVAL_SEED_BASE
    from soccerplayershapepose_tpu.train.synth import synth_frame_batch

    model = PlayerDetector(channels=128)
    variables = load_perception_weights(os.path.join(ROOT, weights), model,
                                        hw=hw)
    runner = PlayerDetectorRunner(model, variables, hw, score_thresh=0.5,
                                  flip_tta=True)
    assets = load_assets()
    batch = synth_frame_batch(assets,
                              jax.random.PRNGKey(EVAL_SEED_BASE + 99),
                              b=2, n_players=8, hw=hw)
    frames = np.asarray(batch["image"] * 255).astype(np.uint8)
    panels = []
    for frame, boxes in zip(frames, runner(frames)):
        vis = frame.copy()
        for x1, y1, x2, y2 in boxes.astype(int):
            x1, y1 = max(x1, 0), max(y1, 0)
            x2, y2 = min(x2, hw[1] - 1), min(y2, hw[0] - 1)
            vis[y1:y2 + 1, [x1, x2]] = (0, 255, 0)
            vis[[y1, y2], x1:x2 + 1] = (0, 255, 0)
        panels.append(vis)
    save_png(out_path, np.concatenate(panels, axis=0))


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "proxy"
    default = os.path.join(ROOT, "docs", "media",
                           "proxy_vis.png" if kind == "proxy"
                           else "detector_vis.png")
    out = sys.argv[2] if len(sys.argv) > 2 else default
    if kind == "proxy":
        proxy_montage(out)
    else:
        detector_frame(out)
