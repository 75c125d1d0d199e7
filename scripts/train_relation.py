"""Train + evaluate the PoseRelationModule on synthetic correlated scenes.

Produces the weight artifacts the relate path needs to execute with real
(non-random) parameters — the capability gap VERDICT r4 #6 flagged:
``evaluate_model_relate`` existed but had only a converter targeting
absent external checkpoints.

Usage:
  python scripts/train_relation.py [--steps 3000] [--v1] [--cpu]
  python scripts/train_relation.py relate --root /tmp/distill_r05 [--cpu]

Default mode trains v0 (27 relation units, dim 8 — regressor_relate.py) or
--v1 (lifted 1024-dim variant, regressor_relate1.py) and writes
weights/relation_{v0,v1}.npz + a held-out denoising eval JSON. ``relate``
mode runs drivers.training.evaluate_model_relate over a minted distill
tree (scenes/<g>/<s>/boxes.xml as the geometry source) with the trained
weights and records metrics with and without the relation refinement.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def cmd_train(args):
    import jax
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.relation import (
        evaluate_relation, save_relation_weights, train_relation)

    tag = "v1" if args.v1 else "v0"
    t0 = time.time()
    relation, params, history = train_relation(
        jax.random.PRNGKey(args.seed), steps=args.steps, b=args.batch,
        n_players=args.players, lr=args.lr,
        lift_dim=1024 if args.v1 else None)
    assets = load_assets()
    out = evaluate_relation(relation, params, assets,
                            n_batches=args.eval_batches, b=args.batch,
                            n_players=args.players)
    out.update(variant=tag, steps=args.steps,
               train_wall_s=round(time.time() - t0, 1),
               history_tail=history[-3:])
    os.makedirs(os.path.join(REPO, "weights"), exist_ok=True)
    dst = os.path.join(REPO, "weights", f"relation_{tag}.npz")
    save_relation_weights(dst, params)
    out["weights"] = os.path.relpath(dst, REPO)
    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, "weights", f"relation_{tag}_eval.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    return 0


def cmd_relate(args):
    """evaluate_model_relate over a minted distill tree, with vs without
    the trained relation module (PyTorch3DTest.py:1501-1861 role)."""
    import jax
    from soccerplayershapepose_tpu.drivers.training import (
        evaluate_model, evaluate_model_relate)
    from soccerplayershapepose_tpu.models.regressor import \
        SingleInputRegressor
    from soccerplayershapepose_tpu.models.relation import PoseRelationModule
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.relation import \
        load_relation_weights
    from soccerplayershapepose_tpu.train.straps import load_regressor_weights

    tag = "v1" if args.v1 else "v0"
    assets = load_assets()
    regressor = SingleInputRegressor(in_channels=18)
    weights = os.path.join(REPO, "weights", "regressor_18ch_f16.npz")
    variables = load_regressor_weights(weights, regressor, assets)

    # eval_step is jitted over the state pytree — a bare namespace class
    # would be traced as an (invalid) leaf. Build the real TrainState and
    # swap in the loaded inference weights.
    from soccerplayershapepose_tpu.train.distill import make_train_state
    state, _ = make_train_state(regressor, jax.random.PRNGKey(0))
    state = state._replace(params=variables["params"],
                           batch_stats=variables["batch_stats"])

    from soccerplayershapepose_tpu.train.relation import V1_KWARGS
    rel_kwargs = V1_KWARGS if args.v1 else {}
    relation = PoseRelationModule(**rel_kwargs)
    rel_params = load_relation_weights(
        os.path.join(REPO, "weights", f"relation_{tag}.npz"), relation,
        n_players=args.players)

    roots = dict(image_root=os.path.join(args.root, "broad_images"),
                 proxy_root=os.path.join(args.root, "broad_proxies"),
                 target_root=os.path.join(args.root, "broad"))
    base = evaluate_model(assets, state=state, **roots)
    relate = evaluate_model_relate(
        assets, state=state, relation_params=rel_params,
        boxes_root=os.path.join(args.root, "scenes"),
        relation_kwargs=rel_kwargs,
        optimize_cam=args.optimize_cam, **roots)
    out = {"variant": tag, "without_relation": base,
           "with_relation": relate,
           "note": ("evaluate_model_relate on the minted distill tree vs "
                    "broad-view pseudo-GT; boxes from scenes/*/boxes.xml; "
                    "relation weights trained on synth correlated scenes "
                    "(train/relation.py)")}
    dst = os.path.join(REPO, "weights", f"relate_eval_{tag}.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", nargs="?", default="train",
                   choices=["train", "relate"])
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--players", type=int, default=6)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-batches", type=int, default=8)
    p.add_argument("--v1", action="store_true",
                   help="lifted 1024-dim variant (regressor_relate1.py)")
    p.add_argument("--root", default="/tmp/distill_r05")
    p.add_argument("--optimize-cam", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        from soccerplayershapepose_tpu.utils.precision import pin_cpu
        pin_cpu()
    return {"train": cmd_train, "relate": cmd_relate}[args.mode](args)


if __name__ == "__main__":
    sys.exit(main())
