"""Pallas TPU hard z-buffer rasterizer (nearest face + barycentrics).

The XLA attribute rasterizer (``render/attribute.py``) evaluates every
(face, pixel) pair — O(F·P) VPU work, ~30 s for a b=16 two-body 256² synth
batch on v5e, which made in-line synth training infeasible. This kernel
reuses the banded face-skip scheme of the silhouette kernels
(``render/pallas_raster.py``): faces y-sorted outside the kernel, image
processed in (band_h × tile_w) tiles, per-band candidate-chunk ranges
scalar-prefetched, per-chunk x/y overlap tests skipping the rest.

Unlike the soft-silhouette kernels this one is attribute-agnostic: it
outputs per pixel the winning (nearest-z) face id and its barycentric
weights; the attribute gather + interpolation happens OUTSIDE as one cheap
XLA gather/einsum. One kernel therefore serves every consumer (27-channel
IUV GT pass, RGB pass, part segmentation, textured render) with a single
compiled program per resolution.

Large face counts (detector frames: 8 players × 13 776 faces) exceed a
monolithic VMEM tri block, so the grid carries a face-block axis INNERMOST
with the per-(band, tile) z/fid/bary output blocks resident across it —
the z-buffer merge across face blocks happens in VMEM, the same
revisit-accumulate pattern as the backward silhouette kernel.

Not differentiable (vis/GT/eval path only — parity contract with
``rasterize_attributes``, which remains the correctness oracle in tests).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from soccerplayershapepose_tpu.render.pallas_raster import (
    _band_chunk_bounds, _tile_width, default_band_h)


def _zbuf_kernel(lo_ref, hi_ref, ymin_ref, ymax_ref, xmin_ref, xmax_ref,
                 tri_ref, fid_ref, w0_ref, w1_ref, z_scr, *,
                 chunks_per_block: int, chunk: int, group: int,
                 band_h: int, tile_w: int, margin: float):
    bi = pl.program_id(0)
    band = pl.program_id(1)
    xt = pl.program_id(2)
    cb = pl.program_id(3)
    y0 = (band * band_h).astype(jnp.float32)
    y1 = y0 + band_h
    x0 = (xt * tile_w).astype(jnp.float32)
    x1 = x0 + tile_w

    # First face block visiting this (band, tile): clear the z-buffer.
    # z lives in scratch (persists across the innermost face-block axis);
    # fid/w are revisited output blocks (resident until the index changes).
    @pl.when(cb == 0)
    def _():
        z_scr[...] = jnp.full((band_h, tile_w), jnp.inf, jnp.float32)
        fid_ref[0] = jnp.full((band_h, tile_w), -1.0, jnp.float32)
        w0_ref[0] = jnp.zeros((band_h, tile_w), jnp.float32)
        w1_ref[0] = jnp.zeros((band_h, tile_w), jnp.float32)

    # Pixel sample points at integer coordinates (oracle convention).
    px = jax.lax.broadcasted_iota(jnp.int32, (band_h, tile_w), 1
                                  ).astype(jnp.float32) + x0
    py = jax.lax.broadcasted_iota(jnp.int32, (band_h, tile_w), 0
                                  ).astype(jnp.float32) + y0

    def chunk_body(c, _):
        gchunk = cb * chunks_per_block + c
        grp = gchunk // group
        cymin = ymin_ref[bi, grp].astype(jnp.float32)
        cymax = ymax_ref[bi, grp].astype(jnp.float32)
        cxmin = xmin_ref[bi, grp].astype(jnp.float32)
        cxmax = xmax_ref[bi, grp].astype(jnp.float32)

        @pl.when((cymax >= y0 - margin) & (cymin <= y1 + margin)
                 & (cxmax >= x0 - margin) & (cxmin <= x1 + margin))
        def _():
            t = tri_ref[0, pl.ds(c * chunk, chunk), :]        # (chunk, 9)
            ax, ay = t[:, 0], t[:, 1]
            bx, by = t[:, 2], t[:, 3]
            cx, cy = t[:, 4], t[:, 5]

            def edge(xa, ya, xb, yb):
                return ((xb - xa)[:, None, None]
                        * (py[None] - ya[:, None, None])
                        - (yb - ya)[:, None, None]
                        * (px[None] - xa[:, None, None]))

            e0 = edge(bx, by, cx, cy)        # opposite vertex 0
            e1 = edge(cx, cy, ax, ay)        # opposite vertex 1
            e2 = edge(ax, ay, bx, by)        # opposite vertex 2
            area = e0 + e1 + e2              # (chunk, bh, tw), 2× signed
            inside = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) |
                      ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))) \
                & (jnp.abs(area) > 1e-9)
            inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
            w0 = e0 * inv_area
            w1 = e1 * inv_area
            z = (w0 * t[:, 6][:, None, None] + w1 * t[:, 7][:, None, None]
                 + (1.0 - w0 - w1) * t[:, 8][:, None, None])
            z = jnp.where(inside, z, jnp.inf)

            # Vectorized within-chunk winner (no per-face ref RMW chain —
            # the unrolled-select variant measured 70x slower): min-z, then
            # the smallest face id attaining it (ties: earlier face, like
            # the oracle's argmin), then one merge into the carry.
            fidv = (jax.lax.broadcasted_iota(
                jnp.int32, (chunk, band_h, tile_w), 0)
                + gchunk * chunk).astype(jnp.float32)
            zc = jnp.min(z, axis=0)                          # (bh, tw)
            hit = (z <= zc[None]) & inside
            fidc = jnp.min(jnp.where(hit, fidv, jnp.inf), axis=0)
            first = hit & (fidv <= fidc[None])
            w0c = jnp.sum(jnp.where(first, w0, 0.0), axis=0)
            w1c = jnp.sum(jnp.where(first, w1, 0.0), axis=0)

            better = zc < z_scr[...]
            z_scr[...] = jnp.where(better, zc, z_scr[...])
            fid_ref[0] = jnp.where(better, fidc, fid_ref[0])
            w0_ref[0] = jnp.where(better, w0c, w0_ref[0])
            w1_ref[0] = jnp.where(better, w1c, w1_ref[0])

        return 0

    base = cb * chunks_per_block
    start = jnp.clip(lo_ref[bi, band] - base, 0, chunks_per_block)
    end = jnp.clip(hi_ref[bi, band] - base, 0, chunks_per_block)
    jax.lax.fori_loop(start, end, chunk_body, 0)


# SMEM holds ~1 MB per program; 4 int32 range arrays × batch × entries must
# fit, so chunk bboxes are stored at GROUP granularity (a conservative
# superset bbox over `group` consecutive chunks) once n_chunks exceeds this.
_MAX_SMEM_ENTRIES = 2048


def _sorted_tri_z_and_ranges(verts2d, verts_z, faces, chunk):
    """y-sorted (B, F_pad, 9) [xyxyxy|zzz] tri table + grouped bbox ranges.

    Same scheme as ``pallas_raster._sorted_tri_and_ranges`` but carrying
    per-vertex depth; returns (tri9, order, cymin, cymax, cxmin, cxmax,
    n_chunks, group) where the range arrays have one entry per GROUP of
    ``group`` chunks (group == 1 below _MAX_SMEM_ENTRIES chunks — exact;
    grouped bboxes are supersets, so skips stay provably safe). Padding
    faces carry the -1e9 sentinel and sort last.
    """
    b = verts2d.shape[0]
    f = faces.shape[0]
    tri = verts2d[:, faces].reshape(b, f, 6)
    tz = verts_z[:, faces]                                   # (B, F, 3)
    ymin_f = jnp.min(tri[..., 1::2], axis=-1)
    order = jnp.argsort(ymin_f, axis=-1)
    tri = jnp.take_along_axis(tri, order[..., None], axis=1)
    tz = jnp.take_along_axis(tz, order[..., None], axis=1)
    tri9 = jnp.concatenate([tri, tz], axis=-1)               # (B, F, 9)
    n_chunks = -(-f // chunk)
    group = max(1, -(-n_chunks // _MAX_SMEM_ENTRIES))
    n_groups = -(-n_chunks // group)
    n_chunks = n_groups * group          # pad chunk count to group multiple
    pad = n_chunks * chunk - f
    if pad:
        tri9 = jnp.concatenate(
            [tri9, jnp.full((b, pad, 9), -1e9, tri9.dtype)], axis=1)

    def ranges(coords):
        sent_c = coords[..., 0] < -1e8
        lo = jnp.min(jnp.where(sent_c[..., None], 1e9, coords)
                     .reshape(b, n_groups, group * chunk, 3), axis=(2, 3))
        hi = jnp.max(jnp.where(sent_c[..., None], -1e9, coords)
                     .reshape(b, n_groups, group * chunk, 3), axis=(2, 3))
        return (jnp.floor(lo).astype(jnp.int32),
                jnp.ceil(hi).astype(jnp.int32))

    cymin_i, cymax_i = ranges(tri9[..., 1:6:2])
    cxmin_i, cxmax_i = ranges(tri9[..., 0:6:2])
    return (tri9, order, cymin_i, cymax_i, cxmin_i, cxmax_i, n_chunks,
            group)


@functools.partial(jax.jit, static_argnames=("img_wh", "band_h", "chunk",
                                             "interpret"))
def rasterize_bary_pallas(verts2d: jnp.ndarray, verts_z: jnp.ndarray,
                          faces: jnp.ndarray, img_wh: int,
                          band_h: int = 0, chunk: int = 8,
                          interpret: bool = False):
    """Per-pixel nearest face + barycentrics via the banded z-buffer kernel.

    Returns (sorted_fid (B, wh, wh) int32 — index into the y-SORTED face
    order, −1 where empty; w (B, wh, wh, 3) barycentric weights;
    order (B, F) sorted→original face map; mask (B, wh, wh) bool).
    """
    b = verts2d.shape[0]
    band_h = band_h or default_band_h(img_wh)
    tile_w = _tile_width(img_wh)
    n_bands = -(-img_wh // band_h)
    n_xt = -(-img_wh // tile_w)
    margin = 1.0

    setup = _sorted_tri_z_and_ranges(verts2d, verts_z, faces, chunk)
    (tri9, order, cymin_i, cymax_i, cxmin_i, cxmax_i, n_chunks,
     group) = setup

    # Face-block the tri table: a monolithic lane-padded (F, 9→128) block
    # is ~7 MB per 13k faces; ~2k-face blocks stream through VMEM on the
    # innermost grid axis while the z-buffer blocks stay resident. Blocks
    # are multiples of (chunk·group) faces so range entries stay aligned.
    f_pad = n_chunks * chunk
    unit = chunk * group
    f_block = min(f_pad, max(unit, (2048 // unit) * unit))
    n_cblocks = -(-f_pad // f_block)
    extra = n_cblocks * f_block - f_pad
    if extra:
        tri9 = jnp.concatenate(
            [tri9, jnp.full((b, extra, 9), -1e9, tri9.dtype)], axis=1)
        pad_groups = extra // unit
        cymin_i = jnp.concatenate(
            [cymin_i, jnp.full((b, pad_groups), 2**30, jnp.int32)], axis=1)
        cymax_i = jnp.concatenate(
            [cymax_i, jnp.full((b, pad_groups), -2**30, jnp.int32)], axis=1)
        cxmin_i = jnp.concatenate(
            [cxmin_i, jnp.full((b, pad_groups), 2**30, jnp.int32)], axis=1)
        cxmax_i = jnp.concatenate(
            [cxmax_i, jnp.full((b, pad_groups), -2**30, jnp.int32)], axis=1)
    chunks_per_block = f_block // chunk
    # Band bounds come back in GROUP units (the range arrays are grouped);
    # scale to chunk units for the kernel's fori bounds.
    lo_g, hi_g = _band_chunk_bounds(cymin_i, cymax_i, n_bands, band_h,
                                    margin)
    lo = lo_g * group
    hi = hi_g * group

    kernel = functools.partial(
        _zbuf_kernel, chunks_per_block=chunks_per_block, chunk=chunk,
        group=group, band_h=band_h, tile_w=tile_w, margin=margin)

    out_spec = pl.BlockSpec((1, band_h, tile_w),
                            lambda bi, band, xt, cb, *_: (bi, band, xt),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n_bands * band_h, n_xt * tile_w),
                                     jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b, n_bands, n_xt, n_cblocks),
        in_specs=[pl.BlockSpec((1, f_block, 9),
                               lambda bi, band, xt, cb, *_: (bi, cb, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec] * 3,
        scratch_shapes=[pltpu.VMEM((band_h, tile_w), jnp.float32)],
    )
    fid, w0, w1 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_shape] * 3,
        interpret=interpret,
    )(lo, hi, cymin_i, cymax_i, cxmin_i, cxmax_i, tri9)

    fid = fid[:, :img_wh, :img_wh]
    w0 = w0[:, :img_wh, :img_wh]
    w1 = w1[:, :img_wh, :img_wh]
    w = jnp.stack([w0, w1, 1.0 - w0 - w1], axis=-1)
    mask = fid >= 0.0
    return fid.astype(jnp.int32), w, order, mask


@functools.partial(jax.jit, static_argnames=("img_wh", "band_h", "chunk",
                                             "interpret"))
def rasterize_attributes_fast(verts2d: jnp.ndarray, verts_z: jnp.ndarray,
                              vert_attrs: jnp.ndarray, faces: jnp.ndarray,
                              img_wh: int, band_h: int = 0, chunk: int = 8,
                              interpret: bool = False):
    """Drop-in fast path for ``attribute.rasterize_attributes``.

    Kernel finds the winning face; the A-channel interpolation is one XLA
    gather + weighted sum out here, so arbitrary attribute widths share one
    compiled kernel per resolution.
    """
    b, _, a = vert_attrs.shape
    p = img_wh * img_wh
    fid, w, order, mask = rasterize_bary_pallas(
        verts2d, verts_z, faces, img_wh, band_h=band_h, chunk=chunk,
        interpret=interpret)
    sid = jnp.clip(fid.reshape(b, p), 0)                # sorted face index
    orig = jnp.take_along_axis(order, sid, axis=1)      # (B, P) original id
    fv = faces[orig]                                    # (B, P, 3) vertices
    attrs3 = jnp.take_along_axis(
        vert_attrs, fv.reshape(b, 3 * p, 1), axis=1).reshape(b, p, 3, a)
    out = jnp.einsum("bpk,bpka->bpa", w.reshape(b, p, 3), attrs3)
    out = out * mask.reshape(b, p, 1)
    return out.reshape(b, img_wh, img_wh, a), mask


_USE_FAST_ATTR = _os.environ.get("SPT_FAST_ATTR", "1") != "0"


def use_fast_attributes() -> bool:
    """Production dispatch: Pallas z-buffer off-CPU (SPT_FAST_ATTR=0 kills)."""
    from soccerplayershapepose_tpu.utils.precision import default_platform
    return _USE_FAST_ATTR and default_platform() not in ("cpu",)
