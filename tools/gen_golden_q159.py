#!/usr/bin/env python3
"""Generate the golden fixture for q159_multimodal_video_resize (REAL
per-frame MJPEG rescale + AVI container reassembly).

q159 builds a CONSTANT-frame synthetic clip per document
(Multimodal.syntheticMjpegAvi with w = h = 16, a single 16x16 tile):
frame f is everywhere (doc_id*31 + f*17) % 256, with frames =
2 + doc_id % 4 and rate = 10 + (doc_id % 3)*5 fps — then resizes the
clip to 24x24 through ImageIOResizer -> AviMjpeg.resizeClip (decode
each frame, bilinear rescale, re-encode at JPEG quality 1.0, reassemble
the container with the SAME clock) and re-decodes:

- width/height  = 24 (the resize target, read back from decoded pixels)
- duration_ms   = clip_frames * 1000 // rate   (clock preserved by resize)
- n_frames      = min(64, duration_ms // 50 + 1)
- luma0         = frame-0 grid: all 16 cells = (doc_id*31) % 256 * 10000
- luma_mid      = the mid-sample frame's constant, same selection rule
                  as q157 (sample index n_frames // 2, ts = that * 50,
                  frame = min(frames-1, ts * rate // 1000))

Constant frames are what make this computable with NO image library:
bilinear interpolation of a constant field is that constant, and a
quality-1.0 JPEG of a constant image roundtrips bit-exactly at ANY
dimensions (every 8x8 block is flat: DC-only, losslessly quantized).
Integer gray v -> float32 is exact, so each cell is exactly v * 10000.

Keyed by doc_id only (q31's reasoning). Dev tool only — not part of the
library.

Usage: gen_golden_q159.py [outParquet]"""
import os
import sys

import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q159_multimodal_video_resize.parquet"

EVERY_MS = 50
MAX_FRAMES = 64


def const_grid(v: int) -> str:
    return ",".join([str(v * 10000)] * 16)


rows = []
for doc_id in range(100):
    clip_frames = 2 + doc_id % 4
    rate = 10 + (doc_id % 3) * 5
    dur_ms = clip_frames * 1000 // rate
    n_frames = min(MAX_FRAMES, dur_ms // EVERY_MS + 1)
    mid_ts = (n_frames // 2) * EVERY_MS
    mid_f = min(clip_frames - 1, mid_ts * rate // 1000)
    rows.append((doc_id, 24, 24, dur_ms, n_frames,
                 const_grid((doc_id * 31) % 256),
                 const_grid((doc_id * 31 + mid_f * 17) % 256)))

fix = pd.DataFrame(rows, columns=[
    "doc_id", "width", "height", "duration_ms", "n_frames",
    "luma0", "luma_mid"])
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
