"""Pallas TPU kernel for soft-silhouette rasterization (banded + face-skip).

The XLA rasterizer (``render/softras.py``) evaluates every (face, pixel)
pair — O(F·P) VPU work. This kernel cuts that by an order of magnitude using
spatial pruning that XLA cannot express:

* faces are sorted by their screen-space min-y OUTSIDE the kernel;
* the image is processed in horizontal bands (grid = (B, n_bands)); per-chunk
  y-ranges are scalar-prefetched into SMEM, and a band skips every face chunk
  whose y-interval (inflated by the sigmoid support radius) misses the band —
  with F/n_bands locality this skips ~(1 - 1/n_bands) of all chunk work;
* all face geometry (F×6 f32 ≈ 330 KB) resides in VMEM, the band accumulator
  (band_h × wh) lives in a VMEM scratch, and the running Σ log1p(-D)
  aggregation happens in-register per chunk.

Forward-only: the fitting loss keeps the XLA path for gradients (a fused
backward kernel is the planned follow-up); metric/inference renders use this
kernel via ``hard=True``-style thresholding of the sharp-σ output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_kernel(ymin_ref, ymax_ref, tri_ref, out_ref, acc_ref, *,
                 n_chunks: int, chunk: int, band_h: int, img_wh: int,
                 sigma_px: float, margin: float):
    bi = pl.program_id(0)
    band = pl.program_id(1)
    y0 = (band * band_h).astype(jnp.float32)
    y1 = y0 + band_h

    acc_ref[...] = jnp.zeros((band_h, img_wh), jnp.float32)

    # Mosaic requires integer iota; cast after.
    px = jax.lax.broadcasted_iota(jnp.int32, (band_h, img_wh), 1
                                  ).astype(jnp.float32)
    py = jax.lax.broadcasted_iota(jnp.int32, (band_h, img_wh), 0
                                  ).astype(jnp.float32) + y0

    def chunk_body(c, _):
        cymin = ymin_ref[bi, c].astype(jnp.float32)
        cymax = ymax_ref[bi, c].astype(jnp.float32)

        @pl.when((cymax >= y0 - margin) & (cymin <= y1 + margin))
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
                ee = jnp.maximum(ex * ex + ey * ey, 1e-12)
                tt = jnp.clip((pxr * ex + pyr * ey) / ee, 0.0, 1.0)
                dx = pxr - tt * ex
                dy = pyr - tt * ey
                d2 = dx * dx + dy * dy
                return (all_pos & (cross >= 0), all_neg & (cross <= 0),
                        jnp.minimum(d2min, d2))

            ones = jnp.ones((chunk, band_h, img_wh), bool)
            state = (ones, ones, jnp.full((chunk, band_h, img_wh), jnp.inf))
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

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    out_ref[0] = 1.0 - jnp.exp(acc_ref[...])


@functools.partial(jax.jit, static_argnames=("img_wh", "sigma", "band_h",
                                             "chunk", "interpret",
                                             "backface_cull"))
def soft_silhouette_pallas(verts2d: jnp.ndarray,
                           faces: jnp.ndarray,
                           img_wh: int,
                           sigma: float = 1e-5,
                           band_h: int = 32,
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

    tri, _, cymin_i, cymax_i, n_chunks = _sorted_tri_and_ranges(
        verts2d, faces, chunk, backface_cull)

    n_bands = -(-img_wh // band_h)
    kernel = functools.partial(
        _band_kernel, n_chunks=n_chunks, chunk=chunk, band_h=band_h,
        img_wh=img_wh, sigma_px=sigma_px, margin=margin)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_bands),
        in_specs=[pl.BlockSpec((1, n_chunks * chunk, 6),
                               lambda bi, band, *_: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, band_h, img_wh),
                               lambda bi, band, *_: (bi, band, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((band_h, img_wh), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_bands * band_h, img_wh),
                                       jnp.float32),
        interpret=interpret,
    )(cymin_i, cymax_i, tri)
    return out[:, :img_wh]


def _sorted_tri_and_ranges(verts2d, faces, chunk, backface_cull=False,
                           keep_fraction=0.6):
    """Shared fwd/bwd preprocessing: y-sorted padded tri + chunk y-ranges.

    ``backface_cull`` composes culling with the banded kernel (shared-face
    layout preserved): back faces — per sample, signed screen area below the
    (1−keep_fraction) quantile, the same keep set as ``softras.cull_backfaces``
    — are overwritten with the -1e9 degenerate sentinel. The min-y sort then
    clusters them into leading chunks whose y-range overlaps no band, so the
    kernel skips their work entirely (and they receive zero gradient)."""
    b = verts2d.shape[0]
    f = faces.shape[0]
    tri = verts2d[:, faces].reshape(b, f, 6)
    if backface_cull:
        ax, ay = tri[..., 0], tri[..., 1]
        bx, by = tri[..., 2], tri[..., 3]
        cx, cy = tri[..., 4], tri[..., 5]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)   # (B, F)
        thresh = jnp.quantile(area, 1.0 - keep_fraction, axis=-1,
                              keepdims=True)
        tri = jnp.where((area >= thresh)[..., None], tri, -1e9)
    order = jnp.argsort(jnp.min(tri[..., 1::2], axis=-1), axis=-1)
    tri = jnp.take_along_axis(tri, order[..., None], axis=1)
    n_chunks = -(-f // chunk)
    pad = n_chunks * chunk - f
    if pad:
        tri = jnp.concatenate(
            [tri, jnp.full((b, pad, 6), -1e9, tri.dtype)], axis=1)
    ys = tri[..., 1::2]
    cymin = jnp.min(ys.reshape(b, n_chunks, chunk, 3), axis=(2, 3))
    cymax = jnp.max(ys.reshape(b, n_chunks, chunk, 3), axis=(2, 3))
    cymin_i = jnp.floor(cymin).astype(jnp.int32)
    cymax_i = jnp.ceil(jnp.where(cymax < -1e8, -1e9, cymax)).astype(jnp.int32)
    return tri, order, cymin_i, cymax_i, n_chunks


# Backward-kernel selection. The original backward kernel aborted the Mosaic
# compiler (layout.h:320 rank check) because of 1-D intermediates; rewritten
# with keepdims-2-D reductions it compiles and matches the XLA gradient
# exactly on the real chip (scripts/probe_tpu.py pallas_grad2). Kill switch:
# SPT_PALLAS_BWD=0 falls back to XLA-recompute autodiff.
import os as _os
_USE_PALLAS_BWD = _os.environ.get("SPT_PALLAS_BWD", "1") != "0"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def soft_silhouette_fast(verts2d, faces, img_wh, sigma=1e-5, band_h=32,
                         chunk=8, interpret=False, backface_cull=False):
    """Pallas-accelerated soft silhouette (fast forward; safe backward).

    Forward: the banded face-skipping kernel (~8x over XLA on v5e at 512²).
    Backward: XLA-recompute autodiff by default (see _USE_PALLAS_BWD); the
    matching Pallas backward kernel (chunk-skip pruning, dL/ds = g·(1−S)·D/σ,
    envelope theorem on the clamped point-segment projection) is available
    and parity-tested in interpreter mode. ``backface_cull`` composes with
    both passes (culled faces do no work and get zero gradient).
    """
    return soft_silhouette_pallas(verts2d, faces, img_wh, sigma=sigma,
                                  band_h=band_h, chunk=chunk,
                                  interpret=interpret,
                                  backface_cull=backface_cull)


def _fast_fwd(verts2d, faces, img_wh, sigma, band_h, chunk, interpret,
              backface_cull):
    s = soft_silhouette_pallas(verts2d, faces, img_wh, sigma=sigma,
                               band_h=band_h, chunk=chunk,
                               interpret=interpret,
                               backface_cull=backface_cull)
    return s, (verts2d, faces, s)


def _fast_bwd(img_wh, sigma, band_h, chunk, interpret, backface_cull, res, g):
    if not (_USE_PALLAS_BWD or interpret):
        from soccerplayershapepose_tpu.render.softras import (
            cull_backfaces, soft_silhouette)
        verts2d, faces, _ = res

        def render(v):
            fc = cull_backfaces(v, faces) if backface_cull else faces
            return soft_silhouette(v, fc, img_wh, sigma=sigma)

        _, vjp = jax.vjp(render, verts2d)
        return (vjp(g)[0], None)
    return _pallas_bwd(img_wh, sigma, band_h, chunk, interpret,
                       backface_cull, res, g)


def _pallas_bwd(img_wh, sigma, band_h, chunk, interpret, backface_cull,
                res, g):
    verts2d, faces, s = res
    b, v, _ = verts2d.shape
    f = faces.shape[0]
    sigma_px = float(sigma) * (img_wh / 2.0) ** 2
    margin = (20.0 * sigma_px) ** 0.5 + 2.0

    tri, order, cymin_i, cymax_i, n_chunks = _sorted_tri_and_ranges(
        verts2d, faces, chunk, backface_cull)

    gs = (g * (1.0 - s)).astype(jnp.float32)              # dL/dA per pixel
    n_bands = -(-img_wh // band_h)
    pad_rows = n_bands * band_h - img_wh
    if pad_rows:
        gs = jnp.concatenate(
            [gs, jnp.zeros((b, pad_rows, img_wh), jnp.float32)], axis=1)

    # Face-block decomposition: the (F, 6) tri/dtri VMEM blocks get their
    # last dim lane-padded 6 → 128, so a monolithic block is ~7 MB and two of
    # them blow the 16 MB VMEM budget at large batch. Grid axis 1 iterates
    # face blocks (~2k faces → ~1 MB padded); bands iterate INNERMOST so each
    # dtri block stays resident across its accumulation visits.
    f_pad = n_chunks * chunk
    f_block = min(f_pad, ((2048 // chunk) * chunk) or chunk)
    n_cblocks = -(-f_pad // f_block)
    extra = n_cblocks * f_block - f_pad
    if extra:
        tri = jnp.concatenate(
            [tri, jnp.full((b, extra, 6), -1e9, tri.dtype)], axis=1)
        pad_chunks = extra // chunk
        cymin_i = jnp.concatenate(
            [cymin_i, jnp.full((b, pad_chunks), 0, jnp.int32)], axis=1)
        cymax_i = jnp.concatenate(
            [cymax_i, jnp.full((b, pad_chunks), -2**30, jnp.int32)], axis=1)
    chunks_per_block = f_block // chunk

    kernel = functools.partial(
        _band_bwd_kernel, chunks_per_block=chunks_per_block, chunk=chunk,
        band_h=band_h, img_wh=img_wh, sigma_px=sigma_px, margin=margin)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_cblocks, n_bands),
        in_specs=[pl.BlockSpec((1, f_block, 6),
                               lambda bi, cb, band, *_: (bi, cb, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, band_h, img_wh),
                               lambda bi, cb, band, *_: (bi, band, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, f_block, 6),
                               lambda bi, cb, band, *_: (bi, cb, 0),
                               memory_space=pltpu.VMEM),
    )
    dtri_sorted = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_cblocks * f_block, 6),
                                       jnp.float32),
        interpret=interpret,
    )(cymin_i, cymax_i, tri, gs)

    # un-sort and scatter edge-endpoint grads onto vertices
    inv = jnp.argsort(order, axis=-1)
    dtri = jnp.take_along_axis(dtri_sorted[:, :f], inv[..., None], axis=1)
    dverts = jnp.zeros((b, v, 2), jnp.float32).at[:, faces].add(
        dtri.reshape(b, f, 3, 2))
    return (dverts, None)


soft_silhouette_fast.defvjp(_fast_fwd, _fast_bwd)


def _band_bwd_kernel(ymin_ref, ymax_ref, tri_ref, gs_ref, dtri_ref, *,
                     chunks_per_block: int, chunk: int, band_h: int,
                     img_wh: int, sigma_px: float, margin: float):
    """Backward band kernel: accumulate dL/dtri over this band's pixels.

    gs_ref carries g·(1−S) per pixel (dL/d log-miss-sum). Per (face, pixel):
    dL/ds = g(1−S)·D/σ with s = sign·d²_min; the min edge's endpoints get
    (envelope theorem) dd²/da = −2r(1−t), dd²/db = −2rt. Grid =
    (batch, face-block, band) with bands innermost: each face-block's dtri
    output block stays VMEM-resident across its band visits and accumulates
    in place (initialised at band 0).
    """
    bi = pl.program_id(0)
    cb = pl.program_id(1)
    band = pl.program_id(2)
    y0 = (band * band_h).astype(jnp.float32)
    y1 = y0 + band_h

    @pl.when(band == 0)
    def _():
        dtri_ref[...] = jnp.zeros_like(dtri_ref)

    px = jax.lax.broadcasted_iota(jnp.int32, (band_h, img_wh), 1
                                  ).astype(jnp.float32)
    py = jax.lax.broadcasted_iota(jnp.int32, (band_h, img_wh), 0
                                  ).astype(jnp.float32) + y0
    gs = gs_ref[0]                                        # (band_h, img_wh)

    def chunk_body(c, _):
        gchunk = cb * chunks_per_block + c
        cymin = ymin_ref[bi, gchunk].astype(jnp.float32)
        cymax = ymax_ref[bi, gchunk].astype(jnp.float32)

        @pl.when((cymax >= y0 - margin) & (cymin <= y1 + margin))
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
                ee = jnp.maximum(ex * ex + ey * ey, 1e-12)
                tt = jnp.clip((pxr * ex + pyr * ey) / ee, 0.0, 1.0)
                rx = pxr - tt * ex
                ry = pyr - tt * ey
                return cross, rx * rx + ry * ry, tt, rx, ry

            # pass 1 (cheap recompute): inside flag + min-edge selection
            c0, d0, _, _, _ = edge_d2(ax, ay, bx, by)
            c1, d1, _, _, _ = edge_d2(bx, by, cx, cy)
            c2, d2, _, _, _ = edge_d2(cx, cy, ax, ay)
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

            def endpoint_grads(is_min, x0, y0e, x1, y1e):
                """Grads for the edge (x0,y0e)-(x1,y1e) on its min-region.

                All reductions keep 2-D shapes (chunk, 1) — Mosaic rejects
                1-D intermediates (layout rank check)."""
                _, d, tt, rx, ry = edge_d2(x0, y0e, x1, y1e)
                w = gd2 * is_min

                def red(v):
                    return jnp.sum((w * v).reshape(chunk, -1), axis=1,
                                   keepdims=True)
                return (red(-2.0 * rx * (1.0 - tt)),
                        red(-2.0 * ry * (1.0 - tt)),
                        red(-2.0 * rx * tt),
                        red(-2.0 * ry * tt))

            # Vertex Voronoi regions tie adjacent edges exactly (distance to
            # the shared endpoint); strict priority keeps them exclusive so
            # the shared vertex is not double-counted.
            min0 = (d0 <= d1) & (d0 <= d2)
            min1 = (d1 < d0) & (d1 <= d2)
            min2 = (d2 < d0) & (d2 < d1)
            e0x0, e0y0, e0x1, e0y1 = endpoint_grads(min0, ax, ay, bx, by)
            e1x0, e1y0, e1x1, e1y1 = endpoint_grads(min1, bx, by, cx, cy)
            e2x0, e2y0, e2x1, e2y1 = endpoint_grads(min2, cx, cy, ax, ay)

            g6 = jnp.concatenate([e0x0 + e2x1, e0y0 + e2y1,
                                  e0x1 + e1x0, e0y1 + e1y0,
                                  e1x1 + e2x0, e1y1 + e2y0], axis=1)
            dtri_ref[0, pl.ds(c * chunk, chunk), :] += g6

        return 0

    jax.lax.fori_loop(0, chunks_per_block, chunk_body, 0)
