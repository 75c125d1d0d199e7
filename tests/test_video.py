"""Video ingestion: video file → classified <game>/<scene> frame tree.

Covers the reference's video harvesting role
(ImageClassification/classification.py:18-76 prepare_data sampling,
:261-295 predict_with_classifier_final gating) with a tiny synthesized
fixture video: green frames are "main camera", red frames are not.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from soccerplayershapepose_tpu.pipeline.video import (  # noqa: E402
    harvest_frames_stage, sample_for_labeling, sample_video_frames,
    video_frame_count)

N_FRAMES = 40
SIZE_HW = (48, 64)      # tiny: tests resize-to-broadcast-size too


@pytest.fixture(scope="module")
def fixture_video(tmp_path_factory):
    """MJPG AVI: even frames red (class 0), odd frames green (class 1)."""
    path = str(tmp_path_factory.mktemp("vid") / "match_1_HQ.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    assert w.isOpened()
    for i in range(N_FRAMES):
        bgr = (0, 255, 0) if i % 2 else (0, 0, 255)
        w.write(np.full((48, 64, 3), bgr, np.uint8))
    w.release()
    return path


def _is_green(frame_rgb: np.ndarray) -> bool:
    return float(frame_rgb[..., 1].mean()) > float(frame_rgb[..., 0].mean())


def test_frame_count(fixture_video):
    assert video_frame_count(fixture_video) == N_FRAMES


def test_sample_video_frames_deterministic_and_resized(fixture_video):
    a = list(sample_video_frames(fixture_video, 8, seed=3,
                                 size_hw=(96, 128)))
    b = list(sample_video_frames(fixture_video, 8, seed=3,
                                 size_hw=(96, 128)))
    assert [p for p, _ in a] == [p for p, _ in b]
    assert len(a) == 8
    # no-replacement sampling: all positions distinct
    assert len({p for p, _ in a}) == 8
    for pos, frame in a:
        assert frame.shape == (96, 128, 3)       # resized up from 48x64
        assert frame.dtype == np.uint8
        # MJPG is lossy; dominant channel still identifies the class
        assert _is_green(frame) == bool(pos % 2)


def test_harvest_accept_all(fixture_video, tmp_path):
    out = str(tmp_path / "tree")
    res = harvest_frames_stage(fixture_video, out, classifier=None,
                               n_samples=10, max_accepted=200, seed=0,
                               size_hw=SIZE_HW)
    assert res["game"] == "match_1_HQ"
    assert res["accepted"] == res["sampled"] == 10
    scenes = sorted(os.listdir(os.path.join(out, res["game"])))
    assert scenes == res["scenes"]
    for scene in scenes:
        f = os.path.join(out, res["game"], scene, "broad.png")
        assert os.path.exists(f)
        assert cv2.imread(f).shape == (48, 64, 3)


def test_harvest_classifier_gate_and_cap(fixture_video, tmp_path):
    """Only green (odd) frames pass; accepted count capped."""
    out = str(tmp_path / "tree")
    res = harvest_frames_stage(fixture_video, out, classifier=_is_green,
                               n_samples=N_FRAMES, max_accepted=5, seed=1,
                               size_hw=SIZE_HW)
    assert res["accepted"] == 5
    for scene in res["scenes"]:
        assert int(scene) % 2 == 1               # scene name = frame number
        img = cv2.imread(os.path.join(out, res["game"], scene, "broad.png"))
        assert _is_green(img[..., ::-1])


def test_harvest_tree_feeds_broad_pipeline(fixture_video, tmp_path):
    """The harvested tree is the layout _scene_frames walks (extract.py)."""
    from soccerplayershapepose_tpu.pipeline.extract import _scene_frames
    out = str(tmp_path / "tree")
    harvest_frames_stage(fixture_video, out, classifier=None, n_samples=4,
                         seed=2, size_hw=SIZE_HW)
    scenes = _scene_frames(out)
    assert len(scenes) == 4
    for game, scene, frames in scenes:
        assert game == "match_1_HQ"
        assert frames == ["broad.png"]


def test_sample_for_labeling(fixture_video, tmp_path):
    out = str(tmp_path / "pool")
    res = sample_for_labeling([fixture_video], out, per_video=3, seed=0,
                              size_hw=SIZE_HW)
    assert res["written"] == 3
    assert sorted(os.listdir(out)) == res["files"]


def test_harvest_cli(fixture_video, tmp_path):
    from soccerplayershapepose_tpu.cli import main
    out = str(tmp_path / "tree")
    rc = main(["harvest-frames", "--video", fixture_video,
               "--out-root", out, "--n-samples", "3",
               "--height", "48", "--width", "64"])
    assert rc == 0
    assert len(os.listdir(os.path.join(out, "match_1_HQ"))) == 3


def test_classifier_bundle_roundtrip(tmp_path):
    """save_classifier/load_classifier + FrameFeatureNet end-to-end gate."""
    import jax
    import jax.numpy as jnp
    from soccerplayershapepose_tpu.models.classifier import ClassifyNet
    from soccerplayershapepose_tpu.pipeline.classification import (
        FrameFeatureNet, load_classifier, make_frame_classifier,
        preprocess_frame, save_classifier)

    head = ClassifyNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 1000)))
    feats = FrameFeatureNet().init(jax.random.PRNGKey(1),
                                   jnp.zeros((1, 224, 224, 3)))
    path = str(tmp_path / "classifier.npz")
    save_classifier(path, head, feats)
    clf = load_classifier(path)

    frame = np.random.RandomState(0).randint(
        0, 255, (270, 480, 3), np.uint8)
    ref = make_frame_classifier(head, feats)
    assert clf.process(frame) == ref.process(frame)
    x = preprocess_frame(frame)
    assert x.shape == (224, 224, 3) and x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0
