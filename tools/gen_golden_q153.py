#!/usr/bin/env python3
"""Generate the golden fixture for q153_multimodal_audio (REAL WAV decode).

q153 builds a deterministic synthetic PCM16 WAV per document
(Multimodal.syntheticWavPcm16): sample_rate = 8000 + (doc_id % 3)*2000,
channels = 1 + doc_id % 2, frames = 800 + (doc_id*13) % 1600, and sample
(frame i, channel c) = (doc_id*31 + i*7 + c*11) % 4096 - 2048 — then
decodes it with javax.sound.sampled and reports the true rate/channels,
duration_ms = frames*1000 // rate (floor), n_frames sampled at 50 ms
(min(64, duration_ms // 50 + 1)), and a 16-bin mean-absolute-amplitude
envelope: bin b covers frames [b*F//16, (b+1)*F//16) (image-grid block
bounds), value = floor(float32((sum|s| / count) / 32768) * 1e6).

This generator reproduces every expected value STRAIGHT FROM THE SAMPLE
FORMULA, without any audio library or WAV parsing — so the oracle only
matches if the Spark side's hand-assembled-RIFF -> javax.sound decode
genuinely parses the container and reads PCM samples. Float parity: the
Java side sums integer-valued doubles (exact <= 2^53) and divides twice
(IEEE double, bit-identical to Python), then truncates to float32 (numpy
replicates) before the x1e6 floor.

Keyed by doc_id only (q31's reasoning): the WAV derives from the id, not
the text, so testdata regeneration cannot silently stale this fixture.
Dev tool only — not part of the library.

Usage: gen_golden_q153.py [outParquet]"""
import math
import os
import sys

import numpy as np
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q153_multimodal_audio.parquet"

BINS = 16
EVERY_MS = 50
MAX_FRAMES = 64


def envelope(seed: int, channels: int, frames: int) -> str:
    cells = []
    for b in range(BINS):
        f0 = b * frames // BINS
        f1 = min(frames, max(f0 + 1, (b + 1) * frames // BINS))
        total = 0
        n = 0
        for i in range(f0, f1):
            for c in range(channels):
                total += abs((seed * 31 + i * 7 + c * 11) % 4096 - 2048)
                n += 1
        mean32 = float(np.float32((total / n) / 32768.0)) if n else 0.0
        cells.append(str(math.floor(mean32 * 1000000)))
    return ",".join(cells)


rows = []
for doc_id in range(100):
    rate = 8000 + (doc_id % 3) * 2000
    channels = 1 + doc_id % 2
    frames = 800 + (doc_id * 13) % 1600
    dur_ms = frames * 1000 // rate
    n_frames = min(MAX_FRAMES, dur_ms // EVERY_MS + 1)
    rows.append((doc_id, rate, channels, dur_ms, n_frames,
                 envelope(doc_id, channels, frames)))

fix = pd.DataFrame(rows, columns=[
    "doc_id", "sample_rate", "channels", "duration_ms", "n_frames",
    "envelope"])
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
