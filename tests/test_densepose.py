"""DensePose IUV decode tests (PNG roundtrip + frame paste + silhouette)."""

import base64

import numpy as np

from soccerplayershapepose_tpu.pipeline.densepose import (
    decode_png, encode_png, decode_iuv_result, paste_iuv_into_frame,
    iuv_to_silhouette)


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (20, 17, 3), np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_gray():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (9, 33), np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def test_png_all_filters():
    """Decode a PNG written with per-row filters 0..4."""
    import struct
    import zlib
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (5, 8, 3), np.uint8)
    rows = []
    prev = np.zeros(24, np.int32)
    for y, filt in enumerate([0, 1, 2, 3, 4]):
        line = img[y].reshape(-1).astype(np.int32)
        if filt == 0:
            enc = line
        elif filt == 1:
            enc = line.copy()
            enc[3:] = (line[3:] - line[:-3]) % 256
        elif filt == 2:
            enc = (line - prev) % 256
        elif filt == 3:
            enc = line.copy()
            for x in range(24):
                left = line[x - 3] if x >= 3 else 0
                enc[x] = (line[x] - ((left + prev[x]) >> 1)) % 256
        else:
            enc = line.copy()
            for x in range(24):
                a = line[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pred) % 256
        rows.append(bytes([filt]) + bytes(enc.astype(np.uint8)))
        prev = line

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 5, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(data), img)


def test_decode_iuv_result_base64():
    rng = np.random.RandomState(3)
    iuv = rng.randint(0, 25, (10, 12, 3), np.uint8)
    payload = base64.b64encode(encode_png(iuv)).decode()
    got = decode_iuv_result((3, 10, 12), payload)
    np.testing.assert_array_equal(got, iuv)


def test_paste_and_silhouette():
    patch = np.zeros((4, 4, 3), np.uint8)
    patch[..., 0] = 7
    canvas = paste_iuv_into_frame((10, 10), patch, np.array([3.0, 2.0, 7, 6]))
    sil = iuv_to_silhouette(canvas)
    assert sil.sum() == 16
    assert sil[2:6, 3:7].all()
