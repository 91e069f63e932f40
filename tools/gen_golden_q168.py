#!/usr/bin/env python3
"""Generate the golden fixture for q168_media_curation (the composed
media-curation pipeline: signals gate -> perceptual dedup).

q168 stages one payload per document for doc_id < 100: ids with
doc_id % 10 == 7 carry junk bytes (ok = false — the decodability
filter's food); every other id carries the q161-formula PNG with
seed = doc_id % 50 (width = 16 + seed % 16, height = 16 + (seed*3) %
16, pixel (x, y) = (seed*31 + x*7 + y*13) % 256 — ids i and i+50 are
planted identical twins). The fixture carries, per doc:

- ok          decodable flag (false for the junk class)
- brightness / contrast / sharpness   the mediaSignals visual
  arithmetic (mean luma; population stddev with the divisions in
  documented order; mean |horizontal gradient|)
- dhash       the q161 8x9 block-mean dHash of the same image

The oracle SQL replays the whole composition relationally: gate =
ok AND contrast >= 71.0 AND sharpness >= 12.5 AND brightness BETWEEN
16 AND 240; survivors = gate rows that are nobody's larger-id
near-duplicate (bit_count(xor(dhash)) <= 3) WITHIN the gate set —
dedup only ever sees what the gate passed, the composed semantics.

Everything is recomputed STRAIGHT FROM THE PIXEL FORMULA with no image
library (PNG is lossless; float parity per gen_golden_q167.py). Keyed
by doc_id only (q31's reasoning). Dev tool only — not part of the
library.

Usage: gen_golden_q168.py [outParquet]"""
import math
import os
import sys

import pandas as pd


def visual(seed, w, h):
    tot = 0
    totsq = 0
    gtot = 0
    for y in range(h):
        prev = 0
        for x in range(w):
            v = (seed * 31 + x * 7 + y * 13) % 256
            tot += v
            totsq += v * v
            if x > 0:
                gtot += abs(v - prev)
            prev = v
    n = w * h
    mean = tot / n
    contrast = math.sqrt(max(0.0, totsq / n - mean * mean))
    sharp = gtot / ((w - 1) * h) if w > 1 else 0.0
    return mean, contrast, sharp


def dhash(seed, w, h):
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
                    total += (seed * 31 + x * 7 + y * 13) % 256
                    n += 1
            means[r][c] = total / n if n else 0.0
    hv = 0
    for k in range(64):
        r, c = k // 8, k % 8
        if means[r][c] > means[r][c + 1]:
            hv |= 1 << k
    if hv >= 1 << 63:
        hv -= 1 << 64
    return hv


out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q168_media_curation.parquet"

rows = []
for doc_id in range(100):
    if doc_id % 10 == 7:
        rows.append((doc_id, False, -1.0, -1.0, -1.0, 0))
        continue
    seed = doc_id % 50
    w = 16 + seed % 16
    h = 16 + (seed * 3) % 16
    b, c, s = visual(seed, w, h)
    rows.append((doc_id, True, b, c, s, dhash(seed, w, h)))

fix = pd.DataFrame(rows, columns=[
    "doc_id", "ok", "brightness", "contrast", "sharpness", "dhash"])
fix["dhash"] = fix["dhash"].astype("int64")
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
