#!/usr/bin/env python3
"""Generate the golden fixture for q160_multimodal_audio_frames (REAL
audio frame sampling: a 1-second PCM window re-assembled as a WAV).

q160 samples q153's synthetic WAVs — sample_rate = 8000 + (doc_id % 3)
* 2000, channels = 1 + doc_id % 2, frames = 800 + (doc_id*13) % 1600,
sample(i, c) = (doc_id*31 + i*7 + c*11) % 4096 - 2048 — on the 50 ms
grid and re-decodes the MIDDLE sampled frame as audio. The sampler's
contract (ImageFrameSampler.audioWindow):

  n_frames = min(64, (frames*1000 // rate) // 50 + 1)
  mid_ts   = (n_frames // 2) * 50
  start    = min(frames - 1, mid_ts * rate // 1000)
  end      = min(frames, start + 1000 * rate // 1000)   (1-second window)
  window   = source sample frames [start, end), same rate/channels

The re-decode reports sample_rate/channels unchanged, duration_ms =
(end - start) * 1000 // rate, and the 16-bin mean-|amplitude| envelope
over the WINDOW's samples (channels pooled; float32-truncated,
floor(x * 1e6) — the q153 discipline). This generator recomputes all of
it straight from the sample formula with NO audio library: the envelope
only matches if the emitted window genuinely carries the source samples
from the right offset. Keyed by doc_id only (q31's reasoning). Dev tool
only — not part of the library.

Usage: gen_golden_q160.py [outParquet]"""
import math
import os
import sys

import numpy as np
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q160_multimodal_audio_frames.parquet"

BINS = 16
EVERY_MS = 50
MAX_FRAMES = 64
WINDOW_MS = 1000

rows = []
for doc_id in range(100):
    rate = 8000 + (doc_id % 3) * 2000
    channels = 1 + doc_id % 2
    frames = 800 + (doc_id * 13) % 1600

    def sample(i, c):
        return (doc_id * 31 + i * 7 + c * 11) % 4096 - 2048

    dur_ms = frames * 1000 // rate
    n_frames = min(MAX_FRAMES, dur_ms // EVERY_MS + 1)
    mid_ts = (n_frames // 2) * EVERY_MS
    start = min(frames - 1, mid_ts * rate // 1000)
    end = min(frames, start + WINDOW_MS * rate // 1000)
    n = max(1, end - start)
    win_dur = n * 1000 // rate

    cells = []
    for b in range(BINS):
        f0 = b * n // BINS
        f1 = min(n, max(f0 + 1, (b + 1) * n // BINS))
        total = 0
        cnt = 0
        for i in range(f0, f1):
            for c in range(channels):
                total += abs(sample(start + i, c))
                cnt += 1
        mean32 = float(np.float32((total / cnt) / 32768.0)) if cnt else 0.0
        cells.append(str(math.floor(mean32 * 1000000)))

    rows.append((doc_id, rate, channels, win_dur, n_frames, ",".join(cells)))

fix = pd.DataFrame(rows, columns=[
    "doc_id", "sample_rate", "channels", "duration_ms", "n_frames",
    "envelope"])
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
