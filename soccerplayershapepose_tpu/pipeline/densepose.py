"""DensePose IUV result handling.

Role of the reference DensePose plumbing
(``/root/reference/Python/Soccer/PlayerReconstruction/DensePose/densepose/structures.py:438``
``DensePoseResult.decode_png_data`` and the wrappers in
``predict/predict_densepose.py:76-158``): DensePose predictors emit a
PNG-compressed (H, W, 3) IUV byte image per detection box; the pipeline
decodes it, pastes it into a full-frame IUV canvas, derives the binary
silhouette from the I channel, and optionally colormaps for vis.

The PNG decode here is a self-contained implementation (zlib inflate +
scanline unfiltering for 8-bit RGB/gray, the only formats DensePose emits) —
no OpenCV/PIL dependency on the hot path.
"""

from __future__ import annotations

import base64
import struct
import zlib
from typing import Tuple

import numpy as np


def decode_png(data: bytes) -> np.ndarray:
    """Minimal PNG decoder: 8-bit gray/RGB/RGBA, non-interlaced.

    Returns (H, W) or (H, W, C) uint8.
    """
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    width = height = None
    color_type = None
    idat = b""
    while pos < len(data):
        length, ctype = struct.unpack(">I4s", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", chunk)
            assert bit_depth == 8, f"unsupported bit depth {bit_depth}"
            assert interlace == 0, "interlaced PNG unsupported"
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break

    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride = width * channels
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(height):
        filt = raw[pos]
        line = np.frombuffer(raw[pos + 1:pos + 1 + stride], np.uint8).copy()
        pos += 1 + stride
        if filt == 0:
            rec = line
        elif filt == 1:       # Sub
            rec = line
            for x in range(channels, stride):
                rec[x] = (rec[x] + rec[x - channels]) & 0xFF
        elif filt == 2:       # Up
            rec = (line.astype(np.int32) + prev).astype(np.uint8)
        elif filt == 3:       # Average
            rec = line
            for x in range(stride):
                left = rec[x - channels] if x >= channels else 0
                rec[x] = (rec[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif filt == 4:       # Paeth
            rec = line
            for x in range(stride):
                a = int(rec[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {filt}")
        out[y] = rec
        prev = out[y]
    img = out.reshape(height, width, channels)
    return img[..., 0] if channels == 1 else img


def decode_iuv_result(shape: Tuple[int, int, int], data) -> np.ndarray:
    """DensePoseResult payload → (H, W, 3) IUV array.

    Accepts raw PNG bytes or the base64 string form the reference stores
    (structures.py encode/decode pair).
    """
    if isinstance(data, str):
        data = base64.b64decode(data)
    img = decode_png(bytes(data))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    assert img.shape[:2] == tuple(shape[1:3]) or shape is None, \
        (img.shape, shape)
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_png` (filter 0 only) — used by tests and to
    write reference-compatible compressed IUV payloads."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def paste_iuv_into_frame(frame_hw: Tuple[int, int], iuv_patch: np.ndarray,
                         box: np.ndarray) -> np.ndarray:
    """Paste a per-detection IUV patch into a full-frame canvas at its box
    (predict_densepose.py:96-118 semantics) and return the canvas."""
    canvas = np.zeros(frame_hw + (3,), np.uint8)
    x1, y1 = int(round(float(box[0]))), int(round(float(box[1])))
    h, w = iuv_patch.shape[:2]
    x2, y2 = min(x1 + w, frame_hw[1]), min(y1 + h, frame_hw[0])
    canvas[y1:y2, x1:x2] = iuv_patch[:y2 - y1, :x2 - x1]
    return canvas


def iuv_to_silhouette(iuv: np.ndarray) -> np.ndarray:
    """Binary silhouette from the I (part) channel — non-zero part = person
    (predict_densepose.py:112-120 + label_conversions semantics)."""
    return (iuv[..., 0] != 0).astype(np.uint8)
