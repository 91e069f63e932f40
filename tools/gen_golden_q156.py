#!/usr/bin/env python3
"""Generate the golden fixture for q156_multimodal_resample (REAL audio
resample: linear interpolation + channel mixdown over PCM16).

q156 takes q153's synthetic WAVs — sample_rate = 8000 + (doc_id % 3)*2000,
channels = 1 + doc_id % 2, frames = 800 + (doc_id*13) % 1600, sample
(frame i, channel c) = (doc_id*31 + i*7 + c*11) % 4096 - 2048 — and
resamples each to 6000 Hz mono through Multimodal.WavPcmResizer.

Since every source rate here exceeds 6000 Hz, the ANTI-ALIASING low-pass
is armed (downsampling only): a Hann-windowed sinc FIR at cutoff
6000/2 Hz, half-width K = 16, whose taps are INTEGER-QUANTIZED at 2^20 —

  fc   = 6000 / (2.0 * srcRate)
  c(t) = 2*fc if t == 0 else sin(2*pi*fc*t) / (pi*t)     (t in [-K, K])
  w(t) = 0.5 + 0.5*cos(pi*t/K)
  q(t) = floor(c*w * 2^20 + 0.5)                         (exact int)

convolved in EXACT INTEGER arithmetic over the channel-SUM stream (edge
frames clamp-replicated), then normalized by the exact tap sum and the
channel count (two correctly-rounded IEEE divisions):

  m(i)       = sum_t q(t)*chanSum(clamp(i+t)) / sum(q) / channels
  outFrames  = max(1, frames * 6000 // srcRate)          (integer floor)
  pos(j)     = j * srcRate / 6000                        (IEEE double)
  v(j)       = m(i0)*(1-frac) + m(i1)*frac,
               i0 = min(frames-1, int(pos)), i1 = min(frames-1, i0+1)
  out(j)     = clamp(floor(v + 0.5), -32768, 32767)      (half-up)

and then re-decodes: duration_ms = outFrames * 1000 // 6000 and the
16-bin envelope (bin mean of |out| / 32768, float32-truncated,
floor(x * 1e6)) — the WavPcmDecoder discipline shared with q153.

The integer-quantized taps are what make the filter replayable
bit-exactly across languages: the convolution is exact integer math on
both sides, the normalizing divisions are correctly-rounded IEEE on
identical operands, and the 2^20 quantization tolerates the <= 1 ulp
sin/cos differences between StrictMath (fdlibm) and the platform libm.

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


K = 16  # Multimodal.WavPcmResizer.FilterHalfWidth

rows = []
for doc_id in range(100):
    src_rate = 8000 + (doc_id % 3) * 2000
    channels = 1 + doc_id % 2
    frames = 800 + (doc_id * 13) % 1600

    def sample(i, c):
        return (doc_id * 31 + i * 7 + c * 11) % 4096 - 2048

    # integer-quantized Hann-windowed sinc at cutoff DST_RATE/2 — the
    # exact tap values WavPcmResizer computes (downsampling is always
    # armed here: every src_rate > 6000)
    fc = DST_RATE / (2.0 * src_rate)
    q = []
    for t in range(-K, K + 1):
        c = 2 * fc if t == 0 else math.sin(2 * math.pi * fc * t) / (math.pi * t)
        w = 0.5 + 0.5 * math.cos(math.pi * t / K)
        q.append(int(math.floor(c * w * (1 << 20) + 0.5)))
    sum_q = sum(q)

    def chan_sum(i):
        f = max(0, min(frames - 1, i))
        return sum(sample(f, c) for c in range(channels))

    def m(i):
        acc = sum(q[t + K] * chan_sum(i + t) for t in range(-K, K + 1))
        return acc / sum_q / channels

    out_frames = max(1, frames * DST_RATE // src_rate)
    resampled = []
    for j in range(out_frames):
        pos = j * src_rate / DST_RATE
        i0 = min(frames - 1, int(pos))
        i1 = min(frames - 1, i0 + 1)
        frac = pos - i0
        v = m(i0) * (1.0 - frac) + m(i1) * frac
        resampled.append(int(max(-32768.0, min(32767.0, math.floor(v + 0.5)))))
    dur_ms = out_frames * 1000 // DST_RATE
    rows.append((doc_id, DST_RATE, 1, dur_ms, envelope(resampled)))

fix = pd.DataFrame(rows, columns=[
    "doc_id", "sample_rate", "channels", "duration_ms", "envelope"])
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
