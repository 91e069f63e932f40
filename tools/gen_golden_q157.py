#!/usr/bin/env python3
"""Generate the golden fixture for q157_multimodal_video (REAL
MJPEG-in-AVI container parse + per-frame JPEG decode).

q157 builds a deterministic synthetic MJPEG-AVI clip per document
(Multimodal.syntheticMjpegAvi): width = 16*(2 + doc_id % 2), height =
16*(1 + (doc_id % 3)), frames = 2 + doc_id % 4, frame clock rate =
10 + (doc_id % 3)*5 fps (scale 1), and frame f is a grid of 16x16
constant-gray tiles where tile (qx, qy) has value
(doc_id*31 + qx*7 + qy*13 + f*17) % 256 — then parses the RIFF/AVI
container, decodes frames with javax.imageio's JPEG reader, and reports:

- width/height  = the DECODED frame-0 pixel dimensions
- duration_ms   = n_clip_frames * 1000 // rate  (the strh clock)
- n_frames      = min(64, duration_ms // 50 + 1)  (the 50 ms sample grid)
- luma0         = 4x4 mean-luma grid of frame 0 (floor(mean32 * 10000))
- luma_mid      = the same grid of the clip frame the MIDDLE sampled
                  timestamp lands on: sample index n_frames // 2, ts =
                  that * 50 ms, frame = min(frames-1, ts * rate // 1000)
                  — matches only if frame selection walks the real clock

This generator reproduces every expected value STRAIGHT FROM THE TILE
FORMULA, without any AVI/JPEG/image library. That is sound because the
clip's frames are 16x16-aligned constant tiles encoded at JPEG quality
1.0, where the roundtrip is BIT-EXACT (flat 8x8 DCT blocks carry only a
DC coefficient, the q=1.0 tables quantize it losslessly, gray pixels
survive YCbCr exactly — verified empirically, 0/1024 mismatches). Float
parity: integer-valued double sums are exact (<= 2^53), divided once
(IEEE double), truncated to float32 (numpy replicates) before the
x10000 floor — the ImageIODecoder discipline shared with q31/q153/q155.

Keyed by doc_id only (q31's reasoning): the clip derives from the id,
not the text, so testdata regeneration cannot silently stale this
fixture. Dev tool only — not part of the library.

Usage: gen_golden_q157.py [outParquet]"""
import math
import os
import sys

import numpy as np
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q157_multimodal_video.parquet"

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
                    total += (seed * 31 + (x // 16) * 7
                              + (y // 16) * 13 + f * 17) % 256
                    n += 1
            mean32 = float(np.float32(total / n)) if n else 0.0
            cells.append(str(math.floor(mean32 * 10000)))
    return ",".join(cells)


rows = []
for doc_id in range(100):
    w = 16 * (2 + doc_id % 2)
    h = 16 * (1 + doc_id % 3)
    clip_frames = 2 + doc_id % 4
    rate = 10 + (doc_id % 3) * 5
    dur_ms = clip_frames * 1000 // rate
    n_frames = min(MAX_FRAMES, dur_ms // EVERY_MS + 1)
    mid_ts = (n_frames // 2) * EVERY_MS
    mid_f = min(clip_frames - 1, mid_ts * rate // 1000)
    rows.append((doc_id, w, h, dur_ms, n_frames,
                 luma_grid(doc_id, w, h, 0),
                 luma_grid(doc_id, w, h, mid_f)))

fix = pd.DataFrame(rows, columns=[
    "doc_id", "width", "height", "duration_ms", "n_frames",
    "luma0", "luma_mid"])
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
