#!/usr/bin/env python3
"""Generate the golden fixture for q161_image_dhash (REAL perceptual
image hashing) — also the oracle source for q162_image_neardup.

q161 builds a deterministic synthetic grayscale PNG per document with
seed = doc_id % 50 (so doc i and doc i+50 carry IDENTICAL images —
planted hamming-0 twins for q162): width = 16 + seed % 16, height =
16 + (seed*3) % 16, pixel (x, y) gray value (seed*31 + x*7 + y*13) % 256
— then computes the 64-bit dHash: an 8-row x 9-col block-mean luma grid
(integer pixel boxes, the ImageIODecoder arithmetic) and bit r*8+c set
iff mean(r, c) > mean(r, c+1) (strict).

This generator recomputes every hash STRAIGHT FROM THE PIXEL FORMULA,
without any PNG/image library. Float parity: gray pixels make each
luma term (3v)/3.0 = v exactly, so the block sums are integer-valued
doubles (exact <= 2^53) divided once — bit-identical comparisons on
both sides. The hash is stored as a signed int64 (Java Long bit
pattern). Keyed by doc_id only (q31's reasoning). Dev tool only — not
part of the library.

Usage: gen_golden_q161.py [outParquet]"""
import os
import sys

import pandas as pd


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
                    total += (seed * 31 + x * 7 + y * 13) % 256
                    n += 1
            means[r][c] = total / n if n else 0.0
    hv = 0
    for k in range(64):
        r, c = k // 8, k % 8
        if means[r][c] > means[r][c + 1]:
            hv |= 1 << k
    # Java Long is signed: wrap the bit pattern into int64
    if hv >= 1 << 63:
        hv -= 1 << 64
    return hv


out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q161_image_dhash.parquet"

rows = []
for doc_id in range(100):
    seed = doc_id % 50
    w = 16 + seed % 16
    h = 16 + (seed * 3) % 16
    rows.append((doc_id, dhash(seed, w, h)))

fix = pd.DataFrame(rows, columns=["doc_id", "dhash"])
fix["dhash"] = fix["dhash"].astype("int64")
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
