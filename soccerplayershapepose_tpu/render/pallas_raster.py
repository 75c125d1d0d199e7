"""Pallas TPU kernel for soft-silhouette rasterization (banded + face-skip).

The XLA rasterizer (``render/softras.py``) evaluates every (face, pixel)
pair — O(F·P) VPU work. This kernel cuts that by an order of magnitude using
spatial pruning that XLA cannot express:

* faces are sorted by their screen-space min-y OUTSIDE the kernel;
* the image is processed in (band_h × tile_w) tiles (grid = (B, n_bands,
  n_xtiles)); per-chunk x/y-ranges are scalar-prefetched into SMEM: each
  band loops only over its contiguous candidate-chunk range [lo, hi)
  (exact for any order via suffix-min/prefix-max binary search), and
  per-chunk x/y overlap tests (inflated by the sigmoid support radius)
  skip the rest — most (chunk, tile) pairs never execute;
* all face geometry (F×6 f32 ≈ 330 KB) resides in VMEM, the band accumulator
  (band_h × wh) lives in a VMEM scratch, and the running Σ log1p(-D)
  aggregation happens in-register per chunk.

Both passes run as Pallas kernels in production (see soft_silhouette_fast);
the XLA rasterizer remains the correctness oracle in tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_kernel(lo_ref, hi_ref, ymin_ref, ymax_ref, xmin_ref, xmax_ref,
                 tri_ref, out_ref, acc_ref, *, n_chunks: int, chunk: int,
                 band_h: int, tile_w: int, img_wh: int, sigma_px: float,
                 margin: float):
    bi = pl.program_id(0)
    band = pl.program_id(1)
    xt = pl.program_id(2)
    y0 = (band * band_h).astype(jnp.float32)
    y1 = y0 + band_h
    x0 = (xt * tile_w).astype(jnp.float32)
    x1 = x0 + tile_w

    acc_ref[...] = jnp.zeros((band_h, tile_w), jnp.float32)

    # Mosaic requires integer iota; cast after.
    px = jax.lax.broadcasted_iota(jnp.int32, (band_h, tile_w), 1
                                  ).astype(jnp.float32) + x0
    py = jax.lax.broadcasted_iota(jnp.int32, (band_h, tile_w), 0
                                  ).astype(jnp.float32) + y0

    def chunk_body(c, _):
        cymin = ymin_ref[bi, c].astype(jnp.float32)
        cymax = ymax_ref[bi, c].astype(jnp.float32)
        cxmin = xmin_ref[bi, c].astype(jnp.float32)
        cxmax = xmax_ref[bi, c].astype(jnp.float32)

        @pl.when((cymax >= y0 - margin) & (cymin <= y1 + margin)
                 & (cxmax >= x0 - margin) & (cxmin <= x1 + margin))
        def _():
            t = tri_ref[0, pl.ds(c * chunk, chunk), :]        # (chunk, 6)
            ax, ay = t[:, 0], t[:, 1]
            bx, by = t[:, 2], t[:, 3]
            cx, cy = t[:, 4], t[:, 5]
            area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            nondeg = jnp.abs(area) > 1e-9

            # Stream edges to keep few (chunk, band_h, img_wh) arrays live —
            # VMEM is 16 MB and the naive all-edges formulation OOMs.
            def edge_update(state, x0, y0e, x1, y1e):
                all_pos, all_neg, d2min = state
                ex = (x1 - x0)[:, None, None]
                ey = (y1e - y0e)[:, None, None]
                pxr = px[None] - x0[:, None, None]
                pyr = py[None] - y0e[:, None, None]
                cross = ex * pyr - ey * pxr
                # Hoist the projection divide out of the pixel lanes: ee is
                # per-FACE, so one reciprocal per face row replaces a VPU
                # divide per (face, pixel) visit.
                iee = 1.0 / jnp.maximum(ex * ex + ey * ey, 1e-12)
                tt = jnp.clip((pxr * ex + pyr * ey) * iee, 0.0, 1.0)
                dx = pxr - tt * ex
                dy = pyr - tt * ey
                d2 = dx * dx + dy * dy
                return (all_pos & (cross >= 0), all_neg & (cross <= 0),
                        jnp.minimum(d2min, d2))

            ones = jnp.ones((chunk, band_h, tile_w), bool)
            state = (ones, ones, jnp.full((chunk, band_h, tile_w), jnp.inf))
            state = edge_update(state, ax, ay, bx, by)
            state = edge_update(state, bx, by, cx, cy)
            state = edge_update(state, cx, cy, ax, ay)
            all_pos, all_neg, d2min = state
            inside = (all_pos | all_neg) & nondeg[:, None, None]
            signed = jnp.where(inside, d2min, -d2min)
            d = jax.nn.sigmoid(signed / sigma_px)
            d = jnp.minimum(d, 1.0 - 1e-7)
            acc_ref[...] += jnp.sum(jnp.log1p(-d), axis=0)

        return 0

    # [lo, hi) from _band_chunk_bounds (exact for any chunk order); the
    # @pl.when above stays as the exact per-chunk test within the range.
    jax.lax.fori_loop(lo_ref[bi, band], hi_ref[bi, band], chunk_body, 0)
    out_ref[0] = 1.0 - jnp.exp(acc_ref[...])


import os as _os


def _tile_width(img_wh: int) -> int:
    """Pixel-tile width (lane-aligned). SPT_PALLAS_TILE_W overrides for
    tuning sweeps; tiles wider than the image clamp to it.

    Measured on v5e at 22-player fit shapes: at 256² full-width tiles beat
    128-wide by ~1.45x on fwd+bwd (per-visit/per-program overheads outweigh
    the extra pruning), while at 512² narrow 128-wide x-tiles win — the
    per-visit vector work grows with tile area and pruning pays again."""
    tw = int(_os.environ.get("SPT_PALLAS_TILE_W", "0"))
    if not tw:
        tw = img_wh if img_wh <= 256 else 128
    return min(tw, img_wh)


def default_band_h(render_wh: int) -> int:
    """Band height for the production fit path (SPT_PALLAS_BAND_H to
    override): 8 at ≤256² (best measured), 16 at ≥512² — the v5e sweep
    ranked (16, 128) at 252 ms fwd+bwd vs 265 for (32, 128) and 336+ for
    full-width tiles."""
    bh = int(_os.environ.get("SPT_PALLAS_BAND_H", "0"))
    return bh or (8 if render_wh <= 256 else 16)


def _band_chunk_bounds(cymin: jnp.ndarray, cymax: jnp.ndarray,
                       n_bands: int, band_h: int, margin: float):
    """(B, n_bands) int32 [lo, hi) candidate-chunk bounds per band.

    Exact for ANY chunk order (no monotonicity assumption on the raw
    ranges): the suffix-minimum of ``cymin`` and prefix-maximum of
    ``cymax`` ARE monotone, so a binary search over them yields the
    tightest contiguous range outside which every chunk provably fails
    the y-overlap test. Sentinel chunks (culled faces / padding) carry
    cymin=+big / cymax=-big and land outside every band's range."""
    b = cymin.shape[0]
    cyminf = cymin.astype(jnp.float32)
    cymaxf = cymax.astype(jnp.float32)
    smin = jax.lax.cummin(cyminf, axis=1, reverse=True)
    pmax = jax.lax.cummax(cymaxf, axis=1)
    y0 = jnp.arange(n_bands, dtype=jnp.float32) * band_h
    y1 = y0 + band_h
    # hi: first index whose suffix still starts above the band bottom.
    hi = jax.vmap(lambda row, v: jnp.searchsorted(row, v, side="right"))(
        smin, jnp.broadcast_to(y1 + margin, (b, n_bands)))
    # lo: number of leading chunks that all end above the band top.
    lo = jax.vmap(lambda row, v: jnp.searchsorted(row, v, side="left"))(
        pmax, jnp.broadcast_to(y0 - margin, (b, n_bands)))
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("img_wh", "sigma", "band_h",
                                             "chunk", "interpret",
                                             "backface_cull"))
def soft_silhouette_pallas(verts2d: jnp.ndarray,
                           faces: jnp.ndarray,
                           img_wh: int,
                           sigma: float = 1e-5,
                           band_h: int = 8,
                           chunk: int = 8,
                           interpret: bool = False,
                           backface_cull: bool = False) -> jnp.ndarray:
    """Pallas-accelerated forward soft silhouette.

    Args/semantics identical to ``softras.soft_silhouette`` (shared faces
    only). ``interpret=True`` runs the kernel in the Pallas interpreter
    (for CPU tests). ``backface_cull`` drops back faces via the degenerate
    sentinel (see :func:`_sorted_tri_and_ranges`) — the banded skip then
    avoids their work without per-sample face indices.
    """
    b, _, _ = verts2d.shape
    sigma_px = float(sigma) * (img_wh / 2.0) ** 2
    # sigmoid(−d²/σ) < 2e-9 once d² > 20σ: pad the band overlap test by that
    # support radius so skipped chunks are provably irrelevant.
    margin = (20.0 * sigma_px) ** 0.5 + 2.0

    setup = _sorted_tri_and_ranges(verts2d, faces, chunk, backface_cull)
    return _pallas_fwd_run(setup, img_wh, sigma_px, margin, band_h, chunk,
                           interpret)


def _pallas_fwd_run(setup, img_wh, sigma_px, margin, band_h, chunk,
                    interpret):
    """Launch the forward band kernel from precomputed sorted geometry."""
    tri, _, cymin_i, cymax_i, cxmin_i, cxmax_i, n_chunks = setup
    b = tri.shape[0]
    n_bands = -(-img_wh // band_h)
    # X-tiling: triangles span ~2-10% of the row, so evaluating full rows
    # wastes most of the VPU work; 128-wide tiles stay lane-aligned and the
    # per-chunk x-range test skips non-overlapping tiles.
    tile_w = _tile_width(img_wh)
    n_xt = -(-img_wh // tile_w)
    lo, hi = _band_chunk_bounds(cymin_i, cymax_i, n_bands, band_h, margin)
    kernel = functools.partial(
        _band_kernel, n_chunks=n_chunks, chunk=chunk, band_h=band_h,
        tile_w=tile_w, img_wh=img_wh, sigma_px=sigma_px, margin=margin)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b, n_bands, n_xt),
        in_specs=[pl.BlockSpec((1, n_chunks * chunk, 6),
                               lambda bi, band, xt, *_: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, band_h, tile_w),
                               lambda bi, band, xt, *_: (bi, band, xt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((band_h, tile_w), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_bands * band_h, n_xt * tile_w),
                                       jnp.float32),
        interpret=interpret,
    )(lo, hi, cymin_i, cymax_i, cxmin_i, cxmax_i, tri)
    return out[:, :img_wh, :img_wh]


def _sorted_tri_and_ranges(verts2d, faces, chunk, backface_cull=False,
                           keep_fraction=0.6):
    """Shared fwd/bwd preprocessing: y-sorted padded tri + chunk ranges.

    Faces are sorted by screen-space min-y so chunks of consecutive faces
    span a narrow y-slab; per-chunk x/y bounding ranges are computed with
    sentinel faces masked out, and the [lo, hi) band bounds from
    :func:`_band_chunk_bounds` are exact for any order
    (suffix-min / prefix-max). A 2D (y-bucket, x) sort was measured and
    rejected: it compacts chunk bboxes but roughly doubles the candidate
    range per band, a net wash on lane work.

    ``backface_cull`` composes culling with the banded kernel (shared-face
    layout preserved): back faces — per sample, signed screen area below the
    (1−keep_fraction) quantile, the same keep set as ``softras.cull_backfaces``
    — are overwritten with the -1e9 degenerate sentinel and sorted LAST,
    where the sentinel chunk ranges (cymin=+1e9/cymax=-1e9) exclude them
    from every band, so they do no work and get zero gradient."""
    b = verts2d.shape[0]
    f = faces.shape[0]
    tri = verts2d[:, faces].reshape(b, f, 6)
    if backface_cull:
        ax, ay = tri[..., 0], tri[..., 1]
        bx, by = tri[..., 2], tri[..., 3]
        cx, cy = tri[..., 4], tri[..., 5]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)   # (B, F)
        # k-th largest area as the keep threshold — the IDENTICAL keep set
        # to softras.cull_backfaces (top_k), so the XLA oracle and both
        # kernels agree bit-for-bit on which faces render (a quantile
        # threshold differed on grazing faces by interpolation).
        k = max(1, int(f * keep_fraction))
        thresh = jax.lax.top_k(area, k)[0][:, -1:]
        tri = jnp.where((area >= thresh)[..., None], tri, -1e9)
    ymin_f = jnp.min(tri[..., 1::2], axis=-1)                  # (B, F)
    key = jnp.where(ymin_f < -1e8, 3e7, ymin_f)   # sentinels sort last
    order = jnp.argsort(key, axis=-1)
    tri = jnp.take_along_axis(tri, order[..., None], axis=1)
    n_chunks = -(-f // chunk)
    pad = n_chunks * chunk - f
    if pad:
        tri = jnp.concatenate(
            [tri, jnp.full((b, pad, 6), -1e9, tri.dtype)], axis=1)

    def ranges(coords):
        sent_c = coords[..., 0] < -1e8                  # (B, F_pad) sentinel
        lo = jnp.min(jnp.where(sent_c[..., None], 1e9, coords)
                     .reshape(b, n_chunks, chunk, 3), axis=(2, 3))
        hi = jnp.max(jnp.where(sent_c[..., None], -1e9, coords)
                     .reshape(b, n_chunks, chunk, 3), axis=(2, 3))
        return (jnp.floor(lo).astype(jnp.int32),
                jnp.ceil(hi).astype(jnp.int32))

    cymin_i, cymax_i = ranges(tri[..., 1::2])
    cxmin_i, cxmax_i = ranges(tri[..., 0::2])
    return tri, order, cymin_i, cymax_i, cxmin_i, cxmax_i, n_chunks


# Backward-kernel selection. The original backward kernel aborted the Mosaic
# compiler (layout.h:320 rank check) because of 1-D intermediates; rewritten
# with keepdims-2-D reductions it compiles and matches the XLA gradient
# exactly on the real chip (scripts/probe_tpu.py pallas_grad2). Kill switch:
# SPT_PALLAS_BWD=0 falls back to XLA-recompute autodiff.
_USE_PALLAS_BWD = _os.environ.get("SPT_PALLAS_BWD", "1") != "0"
# EXPERIMENTAL: backward-kernel pixel reductions on the MXU (dot with a
# ones vector) instead of VPU tree reductions. Interpret-mode parity is
# pinned in tests, but on the current v5e toolchain the Mosaic compile of
# the (chunk, P)x(P, 1) dot HANGS (control compiles fine) — leave off.
_USE_DOTRED = _os.environ.get("SPT_PALLAS_DOTRED", "0") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def soft_silhouette_fast(verts2d, faces, img_wh, sigma=1e-5, band_h=8,
                         chunk=8, interpret=False, backface_cull=False):
    """Pallas-accelerated soft silhouette (fast forward; safe backward).

    Forward: the banded face-skipping kernel (~8x over XLA on v5e at 512²).
    Backward: the matching Pallas backward kernel by default (chunk-skip
    pruning, dL/ds = g·(1−S)·D/σ, envelope theorem on the clamped
    point-segment projection), parity-tested in interpreter mode;
    ``SPT_PALLAS_BWD=0`` falls back to XLA-recompute autodiff
    (see _USE_PALLAS_BWD). ``backface_cull`` composes with
    both passes (culled faces do no work and get zero gradient).
    """
    return soft_silhouette_pallas(verts2d, faces, img_wh, sigma=sigma,
                                  band_h=band_h, chunk=chunk,
                                  interpret=interpret,
                                  backface_cull=backface_cull)


def auto_pallas_chunk(n_faces: int, batch: int,
                      smem_budget: int = 700_000) -> int:
    """Smallest chunk (≥8, doubling) whose prefetched chunk-range arrays fit
    in SMEM.

    Both kernels scalar-prefetch four s32 (batch, n_chunks) chunk-range
    arrays ≈ 16·batch·n_chunks bytes of the ~1 MB SMEM. Fine chunks (8)
    prune best, but n_chunks scales SMEM linearly with batch: at the
    44-row track workload chunk 8 needs ~1.21 MB by this estimate (more
    with the lo/hi band-bound arrays on top) and the compile fails
    with an SMEM OOM (this killed every BASELINE config-5 track attempt
    through round 4). 700 KB budget leaves headroom for lo/hi bounds and
    spill slots. batch 22 → 8 (the tuned fit config, unchanged);
    44 → 16; 128 → 64.
    """
    chunk = 8
    while chunk < n_faces and 16 * batch * (-(-n_faces // chunk)) > smem_budget:
        chunk *= 2
    return chunk


def _fast_fwd(verts2d, faces, img_wh, sigma, band_h, chunk, interpret,
              backface_cull):
    # Sort/cull/chunk-ranges are computed ONCE here and carried to the
    # backward pass as residuals (the sort is ~10% of a fit iteration and
    # this also pins fwd/bwd to the identical keep set).
    sigma_px = float(sigma) * (img_wh / 2.0) ** 2
    margin = (20.0 * sigma_px) ** 0.5 + 2.0
    setup = _sorted_tri_and_ranges(verts2d, faces, chunk, backface_cull)
    s = _pallas_fwd_run(setup, img_wh, sigma_px, margin, band_h, chunk,
                        interpret)
    # setup[:6] are arrays; n_chunks is static and recomputed in the bwd.
    return s, (verts2d, faces, s, setup[:6])


def _fast_bwd(img_wh, sigma, band_h, chunk, interpret, backface_cull, res, g):
    if not (_USE_PALLAS_BWD or interpret):
        from soccerplayershapepose_tpu.render.softras import (
            cull_backfaces, soft_silhouette)
        verts2d, faces, _, _ = res

        def render(v):
            fc = cull_backfaces(v, faces) if backface_cull else faces
            return soft_silhouette(v, fc, img_wh, sigma=sigma)

        _, vjp = jax.vjp(render, verts2d)
        return (vjp(g)[0], None)
    return _pallas_bwd(img_wh, sigma, band_h, chunk, interpret,
                       backface_cull, res, g)


def _bwd_face_block(f_pad: int, chunk: int) -> int:
    """Faces per backward-kernel VMEM block (~2k face target).

    Must hold WHOLE chunks (the kernel indexes chunk ranges relative to the
    block) and satisfy the Mosaic tiling rule — a block dim smaller than the
    array's must be a multiple of the f32 sublane count (8) — so it is sized
    in units of lcm(chunk, 8). A full-array block (== f_pad) is always
    legal. (chunk=86 previously yielded 1978 ≡ 2 mod 8 → lowering error.)
    """
    lcm8 = chunk * 8 // math.gcd(chunk, 8)
    return min(f_pad, ((2048 // lcm8) * lcm8) or lcm8)


def _pallas_bwd(img_wh, sigma, band_h, chunk, interpret, backface_cull,
                res, g):
    verts2d, faces, s, setup = res
    b, v, _ = verts2d.shape
    f = faces.shape[0]
    sigma_px = float(sigma) * (img_wh / 2.0) ** 2
    margin = (20.0 * sigma_px) ** 0.5 + 2.0

    tri, order, cymin_i, cymax_i, cxmin_i, cxmax_i = setup
    n_chunks = -(-f // chunk)

    gs = (g * (1.0 - s)).astype(jnp.float32)              # dL/dA per pixel
    n_bands = -(-img_wh // band_h)
    tile_w = _tile_width(img_wh)
    n_xt = -(-img_wh // tile_w)
    pad_rows = n_bands * band_h - img_wh
    if pad_rows:
        gs = jnp.concatenate(
            [gs, jnp.zeros((b, pad_rows, img_wh), jnp.float32)], axis=1)
    pad_cols = n_xt * tile_w - img_wh
    if pad_cols:
        gs = jnp.concatenate(
            [gs, jnp.zeros((b, gs.shape[1], pad_cols), jnp.float32)], axis=2)

    # Face-block decomposition: the (F, 6) tri/dtri VMEM blocks get their
    # last dim lane-padded 6 → 128, so a monolithic block is ~7 MB and two of
    # them blow the 16 MB VMEM budget at large batch. Grid axis 1 iterates
    # face blocks (~2k faces → ~1 MB padded); bands iterate INNERMOST so each
    # dtri block stays resident across its accumulation visits.
    # The block must hold WHOLE chunks (chunks_per_block) AND satisfy the
    # Mosaic tiling rule — a non-full second-minor block dim must be a
    # multiple of the f32 sublane count (8) — so size it in units of
    # lcm(chunk, 8). (chunk=86 previously yielded f_block 1978 ≡ 2 mod 8,
    # which Mosaic rejects at lowering; the full-array fwd block never hits
    # this rule.)
    f_pad = n_chunks * chunk
    f_block = _bwd_face_block(f_pad, chunk)
    n_cblocks = -(-f_pad // f_block)
    extra = n_cblocks * f_block - f_pad
    if extra:
        tri = jnp.concatenate(
            [tri, jnp.full((b, extra, 6), -1e9, tri.dtype)], axis=1)
        pad_chunks = extra // chunk
        # Padding chunks carry inverted sentinel ranges (+2^30/-2^30): the
        # suffix-min/prefix-max band bounds exclude them from every band
        # and the exact per-chunk overlap test fails regardless.
        cymin_i = jnp.concatenate(
            [cymin_i, jnp.full((b, pad_chunks), 2**30, jnp.int32)], axis=1)
        cymax_i = jnp.concatenate(
            [cymax_i, jnp.full((b, pad_chunks), -2**30, jnp.int32)], axis=1)
        cxmin_i = jnp.concatenate(
            [cxmin_i, jnp.full((b, pad_chunks), 2**30, jnp.int32)], axis=1)
        cxmax_i = jnp.concatenate(
            [cxmax_i, jnp.full((b, pad_chunks), -2**30, jnp.int32)], axis=1)
    chunks_per_block = f_block // chunk
    lo, hi = _band_chunk_bounds(cymin_i, cymax_i, n_bands, band_h, margin)

    kernel = functools.partial(
        _band_bwd_kernel, chunks_per_block=chunks_per_block, chunk=chunk,
        band_h=band_h, tile_w=tile_w, img_wh=img_wh, sigma_px=sigma_px,
        margin=margin)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b, n_cblocks, n_bands, n_xt),
        in_specs=[pl.BlockSpec((1, f_block, 6),
                               lambda bi, cb, band, xt, *_: (bi, cb, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, band_h, tile_w),
                               lambda bi, cb, band, xt, *_: (bi, band, xt),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, f_block, 6),
                               lambda bi, cb, band, xt, *_: (bi, cb, 0),
                               memory_space=pltpu.VMEM),
    )
    dtri_sorted = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_cblocks * f_block, 6),
                                       jnp.float32),
        interpret=interpret,
    )(lo, hi, cymin_i, cymax_i, cxmin_i, cxmax_i, tri, gs)

    # un-sort and scatter edge-endpoint grads onto vertices
    inv = jnp.argsort(order, axis=-1)
    dtri = jnp.take_along_axis(dtri_sorted[:, :f], inv[..., None], axis=1)
    dverts = jnp.zeros((b, v, 2), jnp.float32).at[:, faces].add(
        dtri.reshape(b, f, 3, 2))
    return (dverts, None)


soft_silhouette_fast.defvjp(_fast_fwd, _fast_bwd)


def _band_bwd_kernel(lo_ref, hi_ref, ymin_ref, ymax_ref, xmin_ref,
                     xmax_ref, tri_ref, gs_ref, dtri_ref, *,
                     chunks_per_block: int, chunk: int, band_h: int,
                     tile_w: int, img_wh: int, sigma_px: float,
                     margin: float):
    """Backward band kernel: accumulate dL/dtri over this band's pixels.

    gs_ref carries g·(1−S) per pixel (dL/d log-miss-sum). Per (face, pixel):
    dL/ds = g(1−S)·D/σ with s = sign·d²_min; the min edge's endpoints get
    (envelope theorem) dd²/da = −2r(1−t), dd²/db = −2rt. Grid =
    (batch, face-block, band, x-tile) with tiles innermost: each
    face-block's dtri output block stays VMEM-resident across its tile
    visits and accumulates in place (initialised at the first tile).
    """
    bi = pl.program_id(0)
    cb = pl.program_id(1)
    band = pl.program_id(2)
    xt = pl.program_id(3)
    y0 = (band * band_h).astype(jnp.float32)
    y1 = y0 + band_h
    x0 = (xt * tile_w).astype(jnp.float32)
    x1 = x0 + tile_w

    @pl.when((band == 0) & (xt == 0))
    def _():
        dtri_ref[...] = jnp.zeros_like(dtri_ref)

    px = jax.lax.broadcasted_iota(jnp.int32, (band_h, tile_w), 1
                                  ).astype(jnp.float32) + x0
    py = jax.lax.broadcasted_iota(jnp.int32, (band_h, tile_w), 0
                                  ).astype(jnp.float32) + y0
    gs = gs_ref[0]                                        # (band_h, tile_w)

    def chunk_body(c, _):
        gchunk = cb * chunks_per_block + c
        cymin = ymin_ref[bi, gchunk].astype(jnp.float32)
        cymax = ymax_ref[bi, gchunk].astype(jnp.float32)
        cxmin = xmin_ref[bi, gchunk].astype(jnp.float32)
        cxmax = xmax_ref[bi, gchunk].astype(jnp.float32)

        @pl.when((cymax >= y0 - margin) & (cymin <= y1 + margin)
                 & (cxmax >= x0 - margin) & (cxmin <= x1 + margin))
        def _():
            t6 = tri_ref[0, pl.ds(c * chunk, chunk), :]   # (chunk, 6)
            ax, ay = t6[:, 0], t6[:, 1]
            bx, by = t6[:, 2], t6[:, 3]
            cx, cy = t6[:, 4], t6[:, 5]
            area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            nondeg = jnp.abs(area) > 1e-9

            def edge_d2(x0, y0e, x1, y1e):
                ex = (x1 - x0)[:, None, None]
                ey = (y1e - y0e)[:, None, None]
                pxr = px[None] - x0[:, None, None]
                pyr = py[None] - y0e[:, None, None]
                cross = ex * pyr - ey * pxr
                # Per-face reciprocal instead of a per-pixel divide (same
                # hoist as the forward kernel; must match it so fwd/bwd
                # agree on the clamped projection).
                iee = 1.0 / jnp.maximum(ex * ex + ey * ey, 1e-12)
                tt = jnp.clip((pxr * ex + pyr * ey) * iee, 0.0, 1.0)
                rx = pxr - tt * ex
                ry = pyr - tt * ey
                return cross, rx * rx + ry * ry, tt, rx, ry

            # Single pass: keep each edge's (tt, rx, ry) live for the
            # endpoint grads instead of recomputing (6 → 3 edge evals;
            # peak live VMEM ~15 × (chunk, band_h, wh) f32 ≈ 8 MB at the
            # production tile — fits, verified on-chip).
            c0, d0, t0, rx0, ry0 = edge_d2(ax, ay, bx, by)
            c1, d1, t1, rx1, ry1 = edge_d2(bx, by, cx, cy)
            c2, d2, t2, rx2, ry2 = edge_d2(cx, cy, ax, ay)
            inside = (((c0 >= 0) & (c1 >= 0) & (c2 >= 0)) |
                      ((c0 <= 0) & (c1 <= 0) & (c2 <= 0))) \
                & nondeg[:, None, None]
            d2min = jnp.minimum(d0, jnp.minimum(d1, d2))
            signed = jnp.where(inside, d2min, -d2min)
            dcov = jax.nn.sigmoid(signed / sigma_px)
            dcov = jnp.minimum(dcov, 1.0 - 1e-7)
            sign = jnp.where(inside, 1.0, -1.0)
            # dL/d(d²_min) per (face, pixel)
            gd2 = gs[None] * dcov / sigma_px * sign * nondeg[:, None, None]

            # The pixel reductions are most of the per-visit VPU work.
            # Each vertex's gradient sums TWO edge contributions (it is an
            # endpoint of two edges); combining them at pixel level FIRST
            # halves the reduction passes: 6 reductions instead of 12.
            # SPT_PALLAS_DOTRED=1 runs them as (chunk, P)·(P, 1) matmuls on
            # the otherwise-idle MXU instead.
            ones_p = jnp.ones((band_h * tile_w, 1), jnp.float32)

            def red(v):
                """(chunk, band_h, tile_w) → (chunk, 1); 2-D shapes only —
                Mosaic rejects 1-D intermediates (layout rank check)."""
                flat = v.reshape(chunk, band_h * tile_w)
                if _USE_DOTRED:
                    return jax.lax.dot_general(
                        flat, ones_p, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return jnp.sum(flat, axis=1, keepdims=True)

            # Vertex Voronoi regions tie adjacent edges exactly (distance to
            # the shared endpoint); strict priority keeps them exclusive so
            # the shared vertex is not double-counted. Envelope theorem:
            # dd²/d(endpoint0) = −2r(1−t), dd²/d(endpoint1) = −2rt on the
            # min edge's region.
            min0 = (d0 <= d1) & (d0 <= d2)
            min1 = (d1 < d0) & (d1 <= d2)
            min2 = (d2 < d0) & (d2 < d1)
            q0 = gd2 * min0
            q1 = gd2 * min1
            q2 = gd2 * min2
            # Shared per-edge products: u = q·r (endpoint-0 + endpoint-1
            # total), v = q·r·t (endpoint-1 share); endpoint 0 gets u − v.
            ux0 = q0 * rx0
            uy0 = q0 * ry0
            ux1 = q1 * rx1
            uy1 = q1 * ry1
            ux2 = q2 * rx2
            uy2 = q2 * ry2
            vx0 = ux0 * t0
            vy0 = uy0 * t0
            vx1 = ux1 * t1
            vy1 = uy1 * t1
            vx2 = ux2 * t2
            vy2 = uy2 * t2
            # Vertex a = edge0 endpoint0 + edge2 endpoint1, etc.
            g6 = jnp.concatenate(
                [red(vx0 - ux0 - vx2), red(vy0 - uy0 - vy2),
                 red(vx1 - ux1 - vx0), red(vy1 - uy1 - vy0),
                 red(vx2 - ux2 - vx1), red(vy2 - uy2 - vy1)],
                axis=1) * 2.0
            dtri_ref[0, pl.ds(c * chunk, chunk), :] += g6

        return 0

    # Candidate-chunk bounds (global chunk units) clamped into this block.
    base = cb * chunks_per_block
    start = jnp.clip(lo_ref[bi, band] - base, 0, chunks_per_block)
    end = jnp.clip(hi_ref[bi, band] - base, 0, chunks_per_block)
    jax.lax.fori_loop(start, end, chunk_body, 0)
