#!/usr/bin/env python3
"""Generate the golden fixture for q31_multimodal (REAL image decode).

q31 builds a deterministic synthetic grayscale PNG per document
(Multimodal.syntheticImagePng): width = 16 + doc_id % 32, height =
16 + (doc_id * 7) % 32, pixel (x, y) value = (doc_id*31 + x*7 + y*13)
% 256 — then PNG-encodes, decodes with javax.imageio, rescales to
128x96 and re-decodes, and reports true dims + a 4x4 mean-luma grid
(floor(mean * 10000) per cell, row-major, comma-joined).

This generator reproduces every expected value STRAIGHT FROM THE PIXEL
FORMULA, without any PNG or image library — so the oracle only matches
if the Spark side's encode -> decode round-trip genuinely reads pixels.
Float parity: the Java side sums integer-valued doubles (exact) and
divides by the count (IEEE double division, bit-identical to Python),
then truncates to float32 (numpy replicates) before the x10000 floor.

n_frames is 1 per image (duration 0 -> one frame at ts 0); the resized
dims are the target (128, 96) by the lossless-PNG re-encode contract.

Keyed by doc_id only: the image derives from the id, not the text, so
testdata regeneration cannot silently stale this fixture (a missing or
extra doc_id < 100 still surfaces as a rowcount mismatch via the join).
Dev tool only — not part of the library.

Usage: gen_golden_q31.py [outParquet]"""
import math
import os
import sys

import numpy as np
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q31_multimodal.parquet"

GRID = 4


def luma_grid(seed: int, w: int, h: int) -> str:
    cells = []
    for ci in range(GRID):
        y0 = ci * h // GRID
        y1 = min(h, max(y0 + 1, (ci + 1) * h // GRID))
        for cj in range(GRID):
            x0 = cj * w // GRID
            x1 = min(w, max(x0 + 1, (cj + 1) * w // GRID))
            total = 0
            n = 0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    total += (seed * 31 + x * 7 + y * 13) % 256
                    n += 1
            mean32 = float(np.float32(total / n)) if n else 0.0
            cells.append(str(math.floor(mean32 * 10000)))
    return ",".join(cells)


rows = []
for doc_id in range(100):
    w = 16 + doc_id % 32
    h = 16 + (doc_id * 7) % 32
    rows.append((doc_id, w, h, 128, 96, 1, luma_grid(doc_id, w, h)))

fix = pd.DataFrame(rows, columns=[
    "doc_id", "width", "height", "r_width", "r_height", "n_frames", "luma"])
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
