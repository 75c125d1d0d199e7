"""Native dataplane tests (parity between C++ library and Python fallback)."""

import json
import os

import numpy as np
import pytest

from soccerplayershapepose_tpu.io import native


def _dataset(tmp_path):
    rng = np.random.RandomState(0)
    stems = []
    for player in ("2", "3"):
        d = tmp_path / "g1" / "s1" / player
        os.makedirs(d)
        for v in (1, 2):
            stem = str(d / f"view_{v}")
            np.save(stem + "_sil.npy", (rng.rand(64, 64) > 0.5).astype(np.uint8))
            with open(stem + "_j2d.xml", "w") as f:
                json.dump(rng.uniform(0, 512, (17, 3)).round(3).tolist(), f)
            stems.append(stem)
    return stems


def test_native_library_builds_and_loads():
    assert native.native_available(), "libdataplane.so failed to build/load"


def test_scan_tree(tmp_path):
    _dataset(tmp_path)
    got = native.scan_tree(str(tmp_path), "_sil.npy")
    assert got == ["g1/s1/2/view_1_sil.npy", "g1/s1/2/view_2_sil.npy",
                   "g1/s1/3/view_1_sil.npy", "g1/s1/3/view_2_sil.npy"]


def test_load_npy_f32_dtypes(tmp_path):
    for arr in [(np.random.rand(16, 8) * 255).astype(np.uint8),
                np.random.rand(8, 16).astype(np.float32),
                np.random.rand(4, 4),
                np.arange(12, dtype=np.int64).reshape(3, 4),
                np.arange(6, dtype=np.int32).reshape(2, 3)]:
        p = str(tmp_path / "a.npy")
        np.save(p, arr)
        got = native.load_npy_f32(p)
        np.testing.assert_allclose(got, arr.astype(np.float32), rtol=1e-6)


def test_load_proxy_batch_matches_python(tmp_path):
    stems = _dataset(tmp_path)
    sil_n, j2d_n = native.load_proxy_batch(stems, wh=64, n_threads=2)
    # python fallback path
    sils = np.stack([np.load(s + "_sil.npy").astype(np.float32) for s in stems])
    joints = np.stack([np.asarray(json.load(open(s + "_j2d.xml")), np.float32)
                       for s in stems])
    np.testing.assert_array_equal(sil_n, sils)
    np.testing.assert_allclose(j2d_n, joints, atol=1e-4)


def test_load_proxy_batch_missing_file_errors(tmp_path):
    stems = _dataset(tmp_path)
    with pytest.raises(IOError):
        native.load_proxy_batch(stems + [str(tmp_path / "missing")], wh=64)
