"""Round-5 verify drive: exercise the changed public API on the real chip.

Covers (per .claude/skills/verify/SKILL.md) the round-5 additions: the
correlated scene factory (multi-view + broad renders), track sequences,
the multi-view alternating fit, the IUV 20/21-ch proxy variants with the
channel-expanded warm start (function-identity check), and the relation
module forward. Small shapes, each timed, completion forced through
scalar pulls. Prints VERIFY-DRIVE-OK on success.

(The round-3 drive this replaces — synth factory + perception train steps
+ full-frame pipeline — is covered by the committed artifact evals and
the test tiers; see git history for the old script.)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402
import numpy as np             # noqa: E402


def main():
    from soccerplayershapepose_tpu.smpl import load_assets
    from soccerplayershapepose_tpu.train.scenes import (
        synth_scene_views, synth_track_views)

    print("backend:", jax.devices()[0].platform, flush=True)
    assets = load_assets()

    t0 = time.time()
    d = synth_scene_views(assets, jax.random.PRNGKey(0), n_players=6,
                          n_views=3, wh=512)
    s = float(d["broad"]["silhouette"].sum())
    assert s > 1000, s
    print(f"scene 6p/3v+broad @512: {time.time() - t0:.1f}s "
          f"(broad sil px {s:.0f})", flush=True)
    t0 = time.time()
    synth_scene_views(assets, jax.random.PRNGKey(1), n_players=6,
                      n_views=3, wh=512)["broad"]["silhouette"].sum().block_until_ready()
    print(f"  warm: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    tr = synth_track_views(assets, jax.random.PRNGKey(2), n_players=4,
                           n_frames=8, wh=512)
    px = float(tr["silhouette"].sum())
    assert px > 1000, px
    print(f"track 4p/8f @512: {time.time() - t0:.1f}s (sil px {px:.0f})",
          flush=True)

    # Multi-view alternating fit, inside the crash envelope.
    from soccerplayershapepose_tpu.fit.engine import FitConfig
    from soccerplayershapepose_tpu.fit.multi_view import (
        MultiViewInit, multi_view_fit)
    from soccerplayershapepose_tpu.ops import batch_rodrigues
    b, v = 2, 2
    rng = np.random.RandomState(0)
    rot = batch_rodrigues(jnp.asarray(
        rng.randn(b * v, 24, 3).astype(np.float32) * 0.15)) \
        .reshape(b, v, 24, 3, 3)
    init = MultiViewInit(
        body_pose=rot[:, :, 1:], global_orient=rot[:, :, :1],
        betas=jnp.zeros((b, v, 10)),
        cam_wp=jnp.tile(jnp.array([[[0.9, 0.0, 0.0]]]), (b, v, 1)))
    sil = jnp.stack([x["silhouette"][:b] for x in d["views"][:v]], axis=1)
    j2d = jnp.stack([x["joints2d"][:b] for x in d["views"][:v]], axis=1)
    t0 = time.time()
    res = multi_view_fit(assets, init, sil, j2d,
                         FitConfig(iters=10, render_wh=128),
                         rounds=1, iters_per_phase=10)
    print(f"multi_view_fit b2 v2 r1x10 @128: {time.time() - t0:.1f}s "
          f"iou {np.asarray(res.silh_iou).round(3)}", flush=True)

    # IUV warm start: function-identity of the 21-ch expansion.
    from soccerplayershapepose_tpu.models.ief import default_initial_params
    from soccerplayershapepose_tpu.models.regressor import \
        SingleInputRegressor
    from soccerplayershapepose_tpu.train.straps import (
        expand_regressor_channels, load_regressor_weights,
        synth_regressor_batch)
    w18 = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "regressor_18ch_f16.npz")
    expand_regressor_channels(w18, "/tmp/reg21_verify.npz", 21)
    m18 = SingleInputRegressor(in_channels=18)
    m21 = SingleInputRegressor(in_channels=21)
    v18 = load_regressor_weights(w18, m18, assets)
    v21 = load_regressor_weights("/tmp/reg21_verify.npz", m21, assets)
    batch = synth_regressor_batch(assets, jax.random.PRNGKey(3), b=4,
                                  wh=256, proxy_channels=21)
    ip = default_initial_params(assets.mean_pose_rot6d, assets.mean_shape)
    _, p18, _ = m18.apply(v18, batch["proxy"][..., :18], ip)
    _, p21, _ = m21.apply(v21, batch["proxy"], ip)
    dmax = float(jnp.abs(p21 - p18).max())
    print(f"21ch proxy {tuple(batch['proxy'].shape)}; warm-start identity "
          f"max|dpose| {dmax:.2e}", flush=True)
    assert dmax < 1e-4, dmax

    # Relation module forward on device.
    from soccerplayershapepose_tpu.models.relation import PoseRelationModule
    from soccerplayershapepose_tpu.train.relation import synth_relation_batch
    rb = synth_relation_batch(jax.random.PRNGKey(4), b=2, n_players=6)
    rel = PoseRelationModule()
    rp = rel.init(jax.random.PRNGKey(5), rb["rotmats_noisy"], rb["boxes"],
                  rb["mask"])
    out = rel.apply(rp, rb["rotmats_noisy"], rb["boxes"], rb["mask"])
    print("relation fwd:", tuple(out.shape), flush=True)

    print("VERIFY-DRIVE-OK", flush=True)


if __name__ == "__main__":
    main()
