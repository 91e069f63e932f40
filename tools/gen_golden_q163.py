#!/usr/bin/env python3
"""Generate the golden fixture for q163_audio_ahash (REAL perceptual
audio hashing) — also the oracle source for q164_audio_neardup.

q163 builds a deterministic synthetic PCM16 WAV per document with
seed = doc_id % 50 (docs i and i+50 carry IDENTICAL clips — planted
hamming-0 twins for q164): rate = 8000 + (seed % 3)*2000, channels =
1 + seed % 2, frames = 800 + (seed*13) % 1600, sample(i, c) =
(seed*31 + i*7 + c*11) % 4096 - 2048 — then computes the 64-bit aHash:
the PCM stream splits into 65 equal sample-frame windows (channels
pooled), each reduced to its mean |amplitude|, and bit k is set iff
mean(k) > mean(k+1) (strict).

This generator recomputes every hash STRAIGHT FROM THE SAMPLE FORMULA,
without any audio library or WAV parsing. Float parity: |sample| sums
are integer-valued doubles (exact <= 2^53) divided once — bit-identical
comparisons on both sides. The hash is stored as a signed int64 (Java
Long bit pattern). Keyed by doc_id only (q31's reasoning). Dev tool
only — not part of the library.

Usage: gen_golden_q163.py [outParquet]"""
import os
import sys

import pandas as pd


def ahash(seed: int, channels: int, frames: int) -> int:
    def sample(i, c):
        return (seed * 31 + i * 7 + c * 11) % 4096 - 2048

    means = [0.0] * 65
    for b in range(65):
        f0 = b * frames // 65
        f1 = min(frames, max(f0 + 1, (b + 1) * frames // 65))
        total = 0
        n = 0
        for i in range(f0, f1):
            for c in range(channels):
                total += abs(sample(i, c))
                n += 1
        means[b] = total / n if n else 0.0
    hv = 0
    for k in range(64):
        if means[k] > means[k + 1]:
            hv |= 1 << k
    if hv >= 1 << 63:
        hv -= 1 << 64
    return hv


out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q163_audio_ahash.parquet"

rows = []
for doc_id in range(100):
    seed = doc_id % 50
    channels = 1 + seed % 2
    frames = 800 + (seed * 13) % 1600
    rows.append((doc_id, ahash(seed, channels, frames)))

fix = pd.DataFrame(rows, columns=["doc_id", "ahash"])
fix["ahash"] = fix["ahash"].astype("int64")
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
