"""Proxy-extraction + detection stage drivers over real folder trees.

Driver logic (file contract, delete-on-failure, boxes.xml, crops) is tested
with oracle extractors so it is deterministic; network quality is covered by
the overfit test at the bottom (slow).
Contract being matched: create_proxy (player_recon.py:61-124), crop stages
(player_detection.py:83-250).
"""

import os

import jax
import numpy as np
import pytest

from soccerplayershapepose_tpu.io import formats as io
from soccerplayershapepose_tpu.models.perception import ProxyNet
from soccerplayershapepose_tpu.pipeline.extract import (
    ProxyExtractor, create_proxy_stage, crop_broad_player_images_stage,
    crop_broad_player_stage, crop_player_stage, detect_players_stage,
    largest_centred_component, read_image)
from soccerplayershapepose_tpu.smpl import load_assets
from soccerplayershapepose_tpu.train.synth import synth_crop_batch


def _write_tree(root, games=("g1",), scenes=("s1",), players=("1", "2"),
                views=("view_1.png",), wh=64, seed=0):
    rng = np.random.RandomState(seed)
    for g in games:
        for s in scenes:
            for p in players:
                d = os.path.join(root, g, s, p)
                os.makedirs(d, exist_ok=True)
                for v in views:
                    img = rng.randint(0, 255, (wh, wh, 3), np.uint8)
                    io.write_png(os.path.join(d, v), img)


class OracleExtractor:
    """Duck-typed stand-in returning fixed results (None → failure)."""

    def __init__(self, wh=64, fail_players=()):
        self.wh = wh
        self.fail = set(fail_players)
        self.calls = 0

    def __call__(self, images):
        self.calls += 1
        out = []
        for img in images:
            kp = np.tile(np.array([[32.0, 32.0, 0.9]]), (17, 1))
            sil = np.zeros((self.wh, self.wh), np.float32)
            sil[20:44, 24:40] = 1.0
            out.append((kp, sil, None))
        return out


def test_largest_centred_component():
    mask = np.zeros((64, 64), np.float32)
    mask[28:40, 28:36] = 1.0        # centred, mid-size
    mask[0:20, 0:20] = 1.0          # bigger but off-centre
    comp = largest_centred_component(mask)
    assert comp is not None
    assert comp[30, 30] == 1.0 and comp[5, 5] == 0.0
    # Fallback: nothing centred → largest wins.
    mask2 = np.zeros((64, 64), np.float32)
    mask2[0:20, 0:20] = 1.0
    comp2 = largest_centred_component(mask2)
    assert comp2[5, 5] == 1.0
    assert largest_centred_component(np.zeros((8, 8))) is None


def test_create_proxy_stage_contract(tmp_path):
    image_root = str(tmp_path / "crops")
    proxy_root = str(tmp_path / "proxy")
    vis_root = str(tmp_path / "vis")
    _write_tree(image_root, players=("1", "2", "3"))
    ex = OracleExtractor(wh=64)
    res = create_proxy_stage(ex, image_root, proxy_root, vis_root,
                             batch_size=4)
    # player '1' ignored (reference ignore_first, player_recon.py:90-91)
    assert res["written"] == 2
    assert not os.path.exists(os.path.join(proxy_root, "g1", "s1", "1"))
    stem = os.path.join(proxy_root, "g1", "s1", "2", "view_1")
    j2d = io.read_joints2d(stem + "_j2d.xml")
    assert j2d.shape == (17, 3)
    sil = np.load(stem + "_sil.npy")
    assert sil.shape == (64, 64) and set(np.unique(sil)) <= {0, 1}
    assert os.path.exists(os.path.join(
        vis_root, "g1", "s1", "2", "view_1_silhouette.png"))
    # skip_existing: second run writes nothing.
    res2 = create_proxy_stage(ex, image_root, proxy_root, vis_root)
    assert res2["written"] == 0


def test_create_proxy_stage_deletes_failed(tmp_path):
    image_root = str(tmp_path / "crops")
    proxy_root = str(tmp_path / "proxy")
    _write_tree(image_root, players=("2",))

    class FailingExtractor(OracleExtractor):
        def __call__(self, images):
            return [(None, None, None)] * len(images)

    res = create_proxy_stage(FailingExtractor(wh=64), image_root, proxy_root)
    assert res["written"] == 0
    assert res["failed_players"] == [os.path.join("g1", "s1", "2")]
    assert not os.path.exists(os.path.join(proxy_root, "g1", "s1", "2"))


def test_create_proxy_stage_failed_player_stays_deleted(tmp_path):
    """A player whose LATER view fails must not be resurrected by earlier
    batches having succeeded (atomic delete, player_recon.py:118-121)."""
    image_root = str(tmp_path / "crops")
    proxy_root = str(tmp_path / "proxy")
    _write_tree(image_root, players=("2",),
                views=("view_1.png", "view_2.png"))

    class ViewTwoFails(OracleExtractor):
        def __call__(self, images):
            # batch_size=1 → one view per call; fail the second call only.
            fail = self.calls == 1      # super().__call__ increments calls
            out = super().__call__(images)
            return [(None, None, None)] * len(images) if fail else out

    res = create_proxy_stage(ViewTwoFails(wh=64), image_root, proxy_root,
                             batch_size=1)
    assert res["failed_players"] == [os.path.join("g1", "s1", "2")]
    assert not os.path.exists(os.path.join(proxy_root, "g1", "s1", "2"))


class OracleRunner:
    hw = (64, 64)

    def __call__(self, frames):
        return [np.array([[8.0, 8.0, 24.0, 40.0],
                          [40.0, 20.0, 56.0, 52.0]])] * len(frames)


class EmptyRunner:
    hw = (64, 64)

    def __call__(self, frames):
        return [np.zeros((0, 4))] * len(frames)


def test_crop_player_stage(tmp_path):
    """Per-view tree in → reference-layout crop tree out
    (crop_player, player_detection.py:83-147)."""
    image_root = str(tmp_path / "views")
    out_root = str(tmp_path / "crops")
    _write_tree(image_root, players=("1", "2", "3"),
                views=("view_1.png", "view_2.png"), wh=128)
    res = crop_player_stage(OracleRunner(), image_root, out_root,
                            batch_size=3, save_mid=True)
    # player '1' skipped (check_index), 2 players x 2 views written.
    assert res["written"] == 4 and res["missed"] == []
    assert res["skipped"] == 2
    assert not os.path.exists(os.path.join(out_root, "g1", "s1", "1"))
    crop = read_image(os.path.join(out_root, "g1", "s1", "2", "view_2.png"))
    assert crop.shape == (512, 512, 3)
    assert os.path.exists(
        os.path.join(out_root, "g1", "s1", "2", "view_1_rect.png"))
    # check_board semantics: players present in the broadcast tree skipped.
    broad_root = str(tmp_path / "broad")
    os.makedirs(os.path.join(broad_root, "g1", "s1", "2"))
    res2 = crop_player_stage(OracleRunner(), image_root,
                             str(tmp_path / "crops2"),
                             skip_if_present_root=broad_root)
    assert res2["written"] == 2 and res2["skipped"] == 4


def test_crop_player_stage_missed(tmp_path):
    image_root = str(tmp_path / "views")
    _write_tree(image_root, players=("2",), wh=128)
    res = crop_player_stage(EmptyRunner(), image_root,
                            str(tmp_path / "out"))
    assert res["written"] == 0
    assert res["missed"] == [os.path.join("g1", "s1", "2", "view_1.png")]


def test_crop_broad_player_stages(tmp_path):
    """boxes.xml + vis per scene, then index.xml-driven player crops
    (crop_broad_player / crop_broad_player_images,
    player_detection.py:152-250)."""
    frame_root = str(tmp_path / "frames")
    box_root = str(tmp_path / "boxes")
    vis_root = str(tmp_path / "vis")
    image_root = str(tmp_path / "players")
    sdir = os.path.join(frame_root, "g1", "s1")
    os.makedirs(sdir)
    rng = np.random.RandomState(0)
    io.write_png(os.path.join(sdir, "broad.png"),
                 rng.randint(0, 255, (128, 128, 3), np.uint8))
    res = crop_broad_player_stage(OracleRunner(), frame_root, box_root,
                                  vis_root)
    assert res == {"scenes": 1, "frames": 1, "boxes": 2}
    boxes = io.read_boxes(os.path.join(box_root, "g1", "s1", "boxes.xml"))
    assert boxes.shape == (2, 4)
    assert os.path.exists(os.path.join(vis_root, "g1", "s1", "broad.png"))

    # Annotated indices (index.xml) name the player folders; default would
    # be 2..len+1 (player_detection.py:238).
    io.write_index(os.path.join(box_root, "g1", "s1", "index.xml"), [5, 9])
    res2 = crop_broad_player_images_stage(box_root, frame_root, image_root)
    assert res2 == {"scenes": 1, "crops": 2}
    crop = read_image(os.path.join(image_root, "g1", "s1", "5", "player.png"))
    assert crop.shape == (512, 512, 3)
    assert os.path.exists(
        os.path.join(image_root, "g1", "s1", "9", "player.png"))

    # Without index.xml, indices default to 2..len+1.
    os.remove(os.path.join(box_root, "g1", "s1", "index.xml"))
    image_root2 = str(tmp_path / "players2")
    crop_broad_player_images_stage(box_root, frame_root, image_root2)
    assert os.path.exists(
        os.path.join(image_root2, "g1", "s1", "2", "player.png"))
    assert os.path.exists(
        os.path.join(image_root2, "g1", "s1", "3", "player.png"))


def test_detect_players_stage_all_frames(tmp_path):
    """Scenes with several frames process every frame, not frames[0]."""
    frame_root = str(tmp_path / "frames")
    out_root = str(tmp_path / "det")
    sdir = os.path.join(frame_root, "g1", "s1")
    os.makedirs(sdir)
    rng = np.random.RandomState(0)
    for name in ("frame_000.png", "frame_001.png"):
        io.write_png(os.path.join(sdir, name),
                     rng.randint(0, 255, (128, 128, 3), np.uint8))
    res = detect_players_stage(OracleRunner(), frame_root, out_root)
    assert res == {"scenes": 1, "boxes": 4}
    for stem in ("frame_000", "frame_001"):
        assert io.read_boxes(os.path.join(
            out_root, "g1", "s1", stem + "_boxes.xml")).shape == (2, 4)
        assert os.path.exists(os.path.join(
            out_root, "g1", "s1", stem, "1", "player.png"))


def test_detect_players_stage(tmp_path):
    frame_root = str(tmp_path / "frames")
    out_root = str(tmp_path / "det")
    os.makedirs(os.path.join(frame_root, "g1", "s1"))
    rng = np.random.RandomState(0)
    io.write_png(os.path.join(frame_root, "g1", "s1", "broad.png"),
                 rng.randint(0, 255, (128, 128, 3), np.uint8))
    res = detect_players_stage(OracleRunner(), frame_root, out_root)
    assert res == {"scenes": 1, "boxes": 2}
    boxes = io.read_boxes(os.path.join(out_root, "g1", "s1", "boxes.xml"))
    assert boxes.shape == (2, 4)
    # Boxes rescaled to original 128px frame space (runner saw 64px).
    assert boxes[0, 0] == pytest.approx(16.0)
    crop = read_image(os.path.join(out_root, "g1", "s1", "1", "player.png"))
    assert crop.shape == (512, 512, 3)


def test_proxy_extractor_structure():
    # Random-init net: results must be structurally valid (kp may be None).
    model = ProxyNet(with_iuv=False, channels=16)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3)))
    ex = ProxyExtractor(model, variables, wh=64)
    images = np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3), np.uint8)
    results = ex(images)
    assert len(results) == 2
    for kp, sil, iuv in results:
        assert iuv is None
        if kp is not None:
            assert kp.shape == (17, 3)
            assert sil.shape == (64, 64)


def test_proxy_extractor_stride_follows_input_size():
    # Keypoints must come back in the pixel space of the batch actually
    # given, even when the extractor was configured for a different wh
    # (regression: CLI fed 256^2 crops to a wh=512 extractor and got
    # 2x-scaled coordinates).
    import jax.numpy as jnp
    model = ProxyNet(with_iuv=False, channels=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ex = ProxyExtractor(model, variables, wh=512)
    images = np.full((1, 64, 64, 3), 255, np.uint8)   # solid: mask likely on
    for kp, sil, _ in ex(images):
        assert sil is None or sil.shape == (64, 64)
        if kp is not None:
            assert float(kp[:, :2].max()) < 64.0
            assert float(kp[:, :2].min()) >= 0.0


def test_proxy_extractor_flip_tta_merge():
    """flip_tta merges the MASK as exactly 0.5·(plain + unflipped flipped)
    while keypoint logits come back as SEPARATE primary/flipped-back maps
    (coordinate-level merge happens on host); the merged mask is
    flip-equivariant end-to-end."""
    import jax.numpy as jnp
    from soccerplayershapepose_tpu.pipeline.extract import _KP_FLIP_PERM

    model = ProxyNet(with_iuv=False, channels=16)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    ex = ProxyExtractor(model, variables, wh=64, flip_tta=True)
    images_u8 = np.random.RandomState(3).randint(
        0, 255, (2, 64, 64, 3), np.uint8)
    images = jnp.asarray(images_u8, jnp.float32) / 255.0

    kp_tta, kp_flip, sil_tta, _ = ex._forward(variables, images)
    out_a = model.apply(variables, images, train=False)
    out_b = model.apply(variables, images[:, :, ::-1, :], train=False)
    np.testing.assert_allclose(np.asarray(kp_tta),
                               np.asarray(out_a.kp_logits), atol=1e-5)
    kp_flip_manual = np.asarray(out_b.kp_logits)[:, :, ::-1, :][
        ..., list(_KP_FLIP_PERM)]
    np.testing.assert_allclose(np.asarray(kp_flip), kp_flip_manual,
                               atol=1e-5)
    sil_manual = decode_sil_like(out_a.mask_logits, out_b.mask_logits)
    np.testing.assert_allclose(np.asarray(sil_tta), sil_manual, atol=1e-5)

    # end-to-end equivariance: TTA of the mirrored batch mirrors the mask
    _, _, sil_m, _ = ex._forward(variables, images[:, :, ::-1, :])
    np.testing.assert_allclose(np.asarray(sil_m),
                               np.asarray(sil_tta)[:, :, ::-1], atol=1e-5)


def test_kp_coordinate_merge():
    """Agreement-gated kp merge: agreeing joints are score-weighted
    averaged with averaged scores; disagreeing joints keep the primary
    pass coordinates with the penalty applied to the score."""
    model = ProxyNet(with_iuv=False, channels=16)
    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))
    ex = ProxyExtractor(model, variables, wh=256, flip_tta=True,
                        kp_tta_tau=0.04, kp_disagree_penalty=0.5)
    kp = np.zeros((17, 3), np.float32)
    kpf = np.zeros((17, 3), np.float32)
    # joint 0: agree (distance 4 < 10.24), scores 0.6 / 0.2
    kp[0] = [100.0, 100.0, 0.6]
    kpf[0] = [104.0, 100.0, 0.2]
    # joint 1: disagree (distance 50)
    kp[1] = [50.0, 50.0, 0.8]
    kpf[1] = [100.0, 50.0, 0.9]
    merged = ex._merge_kp(kp, kpf, 256)
    # weighted mean x = (0.6*100 + 0.2*104) / 0.8 = 101
    np.testing.assert_allclose(merged[0], [101.0, 100.0, 0.4],
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(merged[1], [50.0, 50.0, 0.4],
                               rtol=0, atol=1e-6)


def decode_sil_like(mask_a, mask_b):
    merged = 0.5 * (np.asarray(mask_a) + np.asarray(mask_b)[:, :, ::-1])
    return (merged > 0.0).astype(np.float32)


def test_proxy_extractor_flip_tta_iuv_equivariance():
    """IUV TTA: decoded part labels of a mirrored crop are the mirrored
    L/R-swapped labels, and U mirrors to 255-U on the foreground."""
    import jax.numpy as jnp
    from soccerplayershapepose_tpu.pipeline.extract import _SMPL_FLIP_PERM

    model = ProxyNet(with_iuv=True, channels=16)
    variables = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)))
    ex = ProxyExtractor(model, variables, wh=64, flip_tta=True)
    images = jnp.asarray(np.random.RandomState(7).rand(2, 64, 64, 3),
                         jnp.float32)

    _, _, _, iuv = ex._forward(variables, images)
    _, _, _, iuv_m = ex._forward(variables, images[:, :, ::-1, :])
    iuv, iuv_m = np.asarray(iuv), np.asarray(iuv_m)
    part = iuv[..., 0].astype(np.int64)
    part_m = iuv_m[:, :, ::-1, 0].astype(np.int64)
    # label swap: part p (1..24) mirrors to 1 + perm[p-1]
    swap = np.asarray((0,) + tuple(1 + j for j in _SMPL_FLIP_PERM))
    assert (part_m == swap[part]).mean() > 0.999
    fg = (part > 0) & (part_m == swap[part])
    u, u_m = iuv[..., 1], iuv_m[:, :, ::-1, 1]
    np.testing.assert_allclose(u_m[fg], 255.0 - u[fg], atol=0.05)
    v, v_m = iuv[..., 2], iuv_m[:, :, ::-1, 2]
    np.testing.assert_allclose(v_m[fg], v[fg], atol=0.05)


@pytest.mark.slow
def test_proxynet_overfit_extracts_real_proxies(tmp_path):
    """End-to-end: overfit ProxyNet on one synth batch, write those images
    as PNGs, run create_proxy_stage, check keypoint/mask fidelity."""
    import jax.numpy as jnp
    from soccerplayershapepose_tpu.train.perception import (
        make_proxynet_state, make_proxynet_train_step)

    assets = load_assets()
    wh = 128
    batch = synth_crop_batch(assets, jax.random.PRNGKey(7), b=2, wh=wh)
    model = ProxyNet(with_iuv=False, channels=32)
    state, tx = make_proxynet_state(model, jax.random.PRNGKey(8), wh=wh)
    step = jax.jit(make_proxynet_train_step(model, tx))
    for _ in range(150):
        state, losses = step(state, batch)

    image_root = str(tmp_path / "crops")
    proxy_root = str(tmp_path / "proxy")
    d = os.path.join(image_root, "g1", "s1", "2")
    os.makedirs(d)
    img0 = np.asarray(batch["image"][0] * 255, np.uint8)
    io.write_png(os.path.join(d, "view_1.png"), img0)

    ex = ProxyExtractor(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        wh=wh)
    res = create_proxy_stage(ex, image_root, proxy_root, batch_size=1)
    assert res["written"] == 1
    stem = os.path.join(proxy_root, "g1", "s1", "2", "view_1")
    sil = np.load(stem + "_sil.npy").astype(np.float32)
    gt = np.asarray(batch["silhouette"][0])
    inter = np.sum(sil * gt)
    union = np.sum(np.clip(sil + gt, 0, 1))
    assert inter / union > 0.5, f"mask IoU too low: {inter/union}"
    j2d = io.read_joints2d(stem + "_j2d.xml")
    err = np.linalg.norm(j2d[:, :2] - np.asarray(batch["joints2d"][0]),
                         axis=-1)
    assert np.median(err) < 12.0, f"median kp err {np.median(err)}px"
