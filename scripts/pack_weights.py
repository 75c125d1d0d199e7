"""Pack trained inference weights for committing: f32 → f16, compressed.

Usage: python scripts/pack_weights.py SRC.npz DST.npz

``train.perception.load_perception_weights`` casts leaves back to the
model dtype via the init template, so f16 on disk is transparent to
consumers (the committed-artifact role of the reference's downloaded
checkpoint files, predict_3D.py:35-64).
"""

import sys

import numpy as np


def main():
    src, dst = sys.argv[1], sys.argv[2]
    flat = dict(np.load(src))
    out = {k: v.astype(np.float16) if v.dtype == np.float32 else v
           for k, v in flat.items()}
    np.savez_compressed(dst, **out)
    n = sum(v.size for v in out.values())
    print(f"{dst}: {n/1e6:.1f}M params")


if __name__ == "__main__":
    main()
