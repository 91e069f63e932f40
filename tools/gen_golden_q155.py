#!/usr/bin/env python3
"""Generate the golden fixture for q155_multimodal_gif (REAL animated-GIF
multi-frame decode).

q155 builds a deterministic synthetic animated grayscale GIF per document
(Multimodal.syntheticAnimatedGif): width = 8 + doc_id % 8, height =
8 + (doc_id*3) % 8, frames = 2 + doc_id % 3, per-frame delay =
(5 + (doc_id % 4)*5) centiseconds, and frame f's pixel (x, y) has gray
value (doc_id*31 + x*7 + y*13 + f*17) % 256 — then decodes it with
javax.imageio's multi-frame reader and reports:

- duration_ms = frames * delay_cs * 10 (sum of the GraphicControl stamps)
- n_frames    = min(64, duration_ms // 50 + 1)   (the 50 ms sample grid)
- luma0       = 4x4 mean-luma grid of frame 0 (floor(mean32 * 10000))
- luma_mid    = the same grid of the GIF frame the MIDDLE sampled
                timestamp lands on: sample index n_frames // 2, ts =
                that * 50 ms, frame = min(frames-1, ts // (delay_cs*10))
                — matches only if frame selection walks the real delays

This generator reproduces every expected value STRAIGHT FROM THE PIXEL
FORMULA, without any GIF/image library. Float parity: integer-valued
double sums are exact (<= 2^53), divided once (IEEE double), truncated to
float32 (numpy replicates) before the x10000 floor — the ImageIODecoder
discipline shared with q31/q153.

Keyed by doc_id only (q31's reasoning): the GIF derives from the id, not
the text, so testdata regeneration cannot silently stale this fixture.
Dev tool only — not part of the library.

Usage: gen_golden_q155.py [outParquet]"""
import math
import os
import sys

import numpy as np
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q155_multimodal_gif.parquet"

GRID = 4
EVERY_MS = 50
MAX_FRAMES = 64


def luma_grid(seed: int, w: int, h: int, f: int) -> str:
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
                    total += (seed * 31 + x * 7 + y * 13 + f * 17) % 256
                    n += 1
            mean32 = float(np.float32(total / n)) if n else 0.0
            cells.append(str(math.floor(mean32 * 10000)))
    return ",".join(cells)


rows = []
for doc_id in range(100):
    w = 8 + doc_id % 8
    h = 8 + (doc_id * 3) % 8
    frames = 2 + doc_id % 3
    delay_cs = 5 + (doc_id % 4) * 5
    dur_ms = frames * delay_cs * 10
    n_frames = min(MAX_FRAMES, dur_ms // EVERY_MS + 1)
    mid_ts = (n_frames // 2) * EVERY_MS
    mid_f = min(frames - 1, mid_ts // (delay_cs * 10))
    rows.append((doc_id, w, h, dur_ms, n_frames,
                 luma_grid(doc_id, w, h, 0),
                 luma_grid(doc_id, w, h, mid_f)))

fix = pd.DataFrame(rows, columns=[
    "doc_id", "width", "height", "duration_ms", "n_frames",
    "luma0", "luma_mid"])
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
