#!/usr/bin/env python3
"""Generate the golden fixture for q165_video_thash (REAL temporal +
spatial perceptual video hashing) — also the oracle source for
q166_video_neardup.

q165 builds a deterministic synthetic MJPEG-AVI clip per document with
seed = doc_id % 50 (so doc i and doc i+50 carry IDENTICAL clips —
planted hamming-0 twins for q166): width = 16*(2 + seed % 2), height =
16*(1 + seed % 3), frames = 40 + (seed*7) % 60, and frame f is a grid
of 16x16 constant-gray tiles where tile (qx, qy) has value
(seed*31 + qx*7 + qy*13 + f*17) % 256 — then parses the container,
decodes every frame, and computes:

- thash: the temporal luma-trajectory hash — per-frame mean luma, 65
  equal frame windows (window b covers frames [b*F//65,
  max(f0+1, (b+1)*F//65)) clamped to F — the aHash bounds), window
  mean = running-sum of the per-frame means in frame order / count,
  bit k set iff mean(k) > mean(k+1) (strict).
- dhash: the frame-0 spatial hash — the q161 8-row x 9-col block-mean
  grid over frame 0's pixels, bit r*8+c set iff
  mean(r, c) > mean(r, c+1) (strict).

This generator recomputes BOTH hashes STRAIGHT FROM THE TILE FORMULA,
without any AVI/JPEG/image library. That is sound because the clip's
frames are 16x16-aligned constant tiles encoded at JPEG quality 1.0,
where the roundtrip is BIT-EXACT (the q157 argument: flat 8x8 DCT
blocks carry only a losslessly-quantized DC coefficient and gray
pixels survive YCbCr exactly). Float parity: gray pixels make each
luma term (3v)/3.0 = v exactly, so frame/block sums are integer-valued
doubles (exact <= 2^53) divided once; the 65-window means then
accumulate the per-frame DOUBLES in ascending frame order before one
division — the exact operation sequence Multimodal.tHash64 runs, so
every IEEE rounding matches. Hashes are stored as signed int64 (Java
Long bit pattern). Keyed by doc_id only (q31's reasoning). Dev tool
only — not part of the library.

Usage: gen_golden_q165.py [outParquet]"""
import os
import sys

import pandas as pd


def to_i64(hv: int) -> int:
    return hv - (1 << 64) if hv >= 1 << 63 else hv


def frame_mean(seed: int, w: int, h: int, f: int) -> float:
    total = 0
    for qy in range(h // 16):
        for qx in range(w // 16):
            total += (seed * 31 + qx * 7 + qy * 13 + f * 17) % 256
    return (total * 256) / (w * h)


def thash(seed: int, w: int, h: int, frames: int) -> int:
    ms = [frame_mean(seed, w, h, f) for f in range(frames)]
    means = [0.0] * 65
    for b in range(65):
        f0 = b * frames // 65
        f1 = min(frames, max(f0 + 1, (b + 1) * frames // 65))
        s = 0.0
        n = 0
        for f in range(f0, f1):
            s += ms[f]
            n += 1
        means[b] = s / n if n else 0.0
    hv = 0
    for k in range(64):
        if means[k] > means[k + 1]:
            hv |= 1 << k
    return to_i64(hv)


def dhash(seed: int, w: int, h: int) -> int:
    means = [[0.0] * 9 for _ in range(8)]
    for r in range(8):
        y0 = r * h // 8
        y1 = min(h, max(y0 + 1, (r + 1) * h // 8))
        for c in range(9):
            x0 = c * w // 9
            x1 = min(w, max(x0 + 1, (c + 1) * w // 9))
            total = 0
            n = 0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    total += (seed * 31 + (x // 16) * 7 + (y // 16) * 13) % 256
                    n += 1
            means[r][c] = total / n if n else 0.0
    hv = 0
    for k in range(64):
        r, c = k // 8, k % 8
        if means[r][c] > means[r][c + 1]:
            hv |= 1 << k
    return to_i64(hv)


out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q165_video_thash.parquet"

rows = []
for doc_id in range(100):
    seed = doc_id % 50
    w = 16 * (2 + seed % 2)
    h = 16 * (1 + seed % 3)
    frames = 40 + (seed * 7) % 60
    rows.append((doc_id, thash(seed, w, h, frames), dhash(seed, w, h)))

fix = pd.DataFrame(rows, columns=["doc_id", "thash", "dhash"])
fix["thash"] = fix["thash"].astype("int64")
fix["dhash"] = fix["dhash"].astype("int64")
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
