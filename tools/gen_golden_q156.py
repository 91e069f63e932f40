#!/usr/bin/env python3
"""Generate the golden fixture for q156_multimodal_resample (REAL audio
resample: linear interpolation + channel mixdown over PCM16).

q156 takes q153's synthetic WAVs — sample_rate = 8000 + (doc_id % 3)*2000,
channels = 1 + doc_id % 2, frames = 800 + (doc_id*13) % 1600, sample
(frame i, channel c) = (doc_id*31 + i*7 + c*11) % 4096 - 2048 — and
resamples each to 6000 Hz mono through Multimodal.WavPcmResizer:

  mixed(i)   = mean over channels of sample(i, c)        (float division)
  outFrames  = max(1, frames * 6000 // srcRate)          (integer floor)
  pos(j)     = j * srcRate / 6000                        (IEEE double)
  v(j)       = mixed(i0)*(1-frac) + mixed(i1)*frac,
               i0 = min(frames-1, int(pos)), i1 = min(frames-1, i0+1)
  out(j)     = clamp(floor(v + 0.5), -32768, 32767)      (half-up)

and then re-decodes: duration_ms = outFrames * 1000 // 6000 and the
16-bin envelope (bin mean of |out| / 32768, float32-truncated,
floor(x * 1e6)) — the WavPcmDecoder discipline shared with q153.

This generator replays that arithmetic STRAIGHT FROM THE SAMPLE FORMULA
without any audio library or WAV parsing, so the oracle only matches if
the resampler's DSP and its hand-assembled output container are exactly
as documented. Keyed on doc_id only (q31's reasoning).
Dev tool only — not part of the library.

Usage: gen_golden_q156.py [outParquet]"""
import math
import os
import sys

import numpy as np
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q156_multimodal_resample.parquet"

BINS = 16
DST_RATE = 6000


def envelope(samples) -> str:
    frames = len(samples)
    cells = []
    for b in range(BINS):
        f0 = b * frames // BINS
        f1 = min(frames, max(f0 + 1, (b + 1) * frames // BINS))
        total = sum(abs(samples[i]) for i in range(f0, f1))
        n = f1 - f0
        mean32 = float(np.float32((total / n) / 32768.0)) if n else 0.0
        cells.append(str(math.floor(mean32 * 1000000)))
    return ",".join(cells)


rows = []
for doc_id in range(100):
    src_rate = 8000 + (doc_id % 3) * 2000
    channels = 1 + doc_id % 2
    frames = 800 + (doc_id * 13) % 1600

    def sample(i, c):
        return (doc_id * 31 + i * 7 + c * 11) % 4096 - 2048

    def mixed(i):
        return sum(sample(i, c) for c in range(channels)) / channels

    out_frames = max(1, frames * DST_RATE // src_rate)
    resampled = []
    for j in range(out_frames):
        pos = j * src_rate / DST_RATE
        i0 = min(frames - 1, int(pos))
        i1 = min(frames - 1, i0 + 1)
        frac = pos - i0
        v = mixed(i0) * (1.0 - frac) + mixed(i1) * frac
        resampled.append(int(max(-32768.0, min(32767.0, math.floor(v + 0.5)))))
    dur_ms = out_frames * 1000 // DST_RATE
    rows.append((doc_id, DST_RATE, 1, dur_ms, envelope(resampled)))

fix = pd.DataFrame(rows, columns=[
    "doc_id", "sample_rate", "channels", "duration_ms", "envelope"])
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
