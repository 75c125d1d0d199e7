"""Train the main-camera frame classifier on synthetic broadcast data.

The reference hand-labels frames sampled from match videos into
main-camera vs other shots and trains a 2-layer MLP head on frozen
ResNet-18 logits (``ImageClassification/classification.py:116-179``). The
videos and labels are private, so the rebuild trains the same head on the
synth factory's frame taxonomy:

  label 1 (main camera): wide multi-player frames (synth_frame_batch —
    small player scales, broadcast aspect, field background)
  label 0 (other shots): close-ups (synth_crop_batch — one player filling
    the frame) and player-free field/crowd shots (background generator)

Features come from the in-repo :class:`FrameFeatureNet` with a FIXED seed
(frozen backbone; the head only needs train/inference consistency, which
the saved bundle guarantees by shipping the feature params alongside the
head — pipeline/classification.py:99-110).

Writes weights/frame_classifier.npz + weights/frame_classifier_eval.json.
Smoke: --frames 32 --epochs 2 --cpu.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_dataset(assets, n_frames, seed, batch=8):
    """Balanced (features-ready images, labels): ~1/2 main-camera wide
    frames, ~1/4 close-ups, ~1/4 player-free field shots."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from soccerplayershapepose_tpu.pipeline.classification import \
        preprocess_frame
    from soccerplayershapepose_tpu.train.synth import (
        _background, _photometric, synth_crop_batch, synth_frame_batch)

    base = jax.random.PRNGKey(seed)
    images, labels = [], []

    def add(img_batch, label):
        for img in np.asarray(jnp.clip(img_batch * 255, 0, 255)) \
                .astype(np.uint8):
            images.append(preprocess_frame(img))
            labels.append(label)

    n_main = n_frames // 2
    n_close = n_frames // 4
    n_bg = n_frames - n_main - n_close
    i = 0
    while sum(1 for l in labels if l == 1) < n_main:
        b = synth_frame_batch(assets, jax.random.fold_in(base, i), b=batch,
                              n_players=8, hw=(256, 448))
        add(b["image"], 1)
        i += 1
    while sum(1 for l in labels if l == 0) < n_close:
        b = synth_crop_batch(assets, jax.random.fold_in(base, 10_000 + i),
                             b=batch, wh=256)
        add(b["image"], 0)
        i += 1
    while len(labels) < n_main + n_close + n_bg:
        k = jax.random.fold_in(base, 20_000 + i)
        bg = _photometric(jax.random.fold_in(k, 1),
                          _background(k, batch, 256, 448))
        add(bg, 0)
        i += 1
    return np.stack(images), np.asarray(labels, np.int32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--eval-frames", type=int, default=128)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out", default=os.path.join(REPO, "weights",
                                                 "frame_classifier.npz"))
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        from soccerplayershapepose_tpu.utils.precision import pin_cpu
        pin_cpu()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from soccerplayershapepose_tpu.pipeline.classification import (
        FrameFeatureNet, make_frame_classifier, save_classifier,
        train_classifier)
    from soccerplayershapepose_tpu.smpl import load_assets

    assets = load_assets()
    t0 = time.time()
    feat_net = FrameFeatureNet()
    feat_params = feat_net.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 224, 224, 3)))
    fwd = jax.jit(lambda x: feat_net.apply(feat_params, x))

    def featurize(images):
        out = []
        for i in range(0, len(images), 32):
            out.append(np.asarray(fwd(jnp.asarray(images[i:i + 32]))))
        return np.concatenate(out)

    images, labels = build_dataset(assets, args.frames, args.seed,
                                   args.batch)
    feats = featurize(images)
    print(f"dataset: {len(labels)} frames "
          f"({int(labels.sum())} main-camera) in {time.time() - t0:.0f}s",
          flush=True)
    head_params, history = train_classifier(feats, labels,
                                            epochs=args.epochs, lr=args.lr,
                                            seed=args.seed)

    # Disjoint-seed held-out eval through the FULL gate (raw frame in).
    ev_images, ev_labels = build_dataset(assets, args.eval_frames,
                                         args.seed + 1_000_003, args.batch)
    gate = make_frame_classifier(head_params, feat_params)
    preds = np.asarray([gate.process((img * 255).astype(np.uint8))
                        for img in ev_images])
    acc = float((preds == (ev_labels == 1)).mean())
    main_recall = float(preds[ev_labels == 1].mean()) \
        if (ev_labels == 1).any() else float("nan")
    other_reject = float(1.0 - preds[ev_labels == 0].mean()) \
        if (ev_labels == 0).any() else float("nan")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_classifier(args.out, head_params, feat_params)
    out = {"accuracy": acc, "main_camera_recall": main_recall,
           "other_shot_rejection": other_reject,
           "n_train": int(len(labels)), "n_eval": int(len(ev_labels)),
           "epochs": args.epochs, "val_acc_history": history["val_acc"],
           "weights": os.path.relpath(args.out, REPO),
           "wall_s": round(time.time() - t0, 1),
           "note": ("held-out synth frames, disjoint seeds; classes: "
                    "wide broadcast frames vs close-ups + player-free "
                    "shots (classification.py:116-295 role)")}
    with open(os.path.splitext(args.out)[0] + "_eval.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
