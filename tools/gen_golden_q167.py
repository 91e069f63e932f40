#!/usr/bin/env python3
"""Generate the golden fixture for q167_media_signals (REAL media
quality signals over all three modalities).

q167 builds one deterministic synthetic payload per document, modality
by doc_id % 3:

- 0 → image PNG (Multimodal.syntheticImagePng): width = 16 + id % 16,
  height = 16 + (id*3) % 16, pixel (x, y) = (id*31 + x*7 + y*13) % 256.
- 1 → audio WAV (Multimodal.syntheticWavPcm16): rate = 8000 +
  (id % 3)*2000, channels = 1 + id % 2, frames = 800 + (id*13) % 1600,
  sample (frame i, channel c) = ((id*31 + i*7 + c*11) % 4096) - 2048.
- 2 → video MJPEG-AVI (Multimodal.syntheticMjpegAvi): width =
  16*(2 + id % 2), height = 16*(1 + id % 3), frames = 2 + id % 4,
  rate = 10 + (id % 3)*5 fps, frame-f tile (qx, qy) =
  (id*31 + qx*7 + qy*13 + f*17) % 256.

Signals (Multimodal.mediaSignals arithmetic):

- visual (image, video frame 0): brightness = mean luma, contrast =
  population stddev of luma (sqrt(max(0, E[v^2] - E[v]^2)) with the
  divisions in that order), sharpness = mean |horizontal gradient|
  (sum of |v(x+1,y) - v(x,y)| / ((w-1)*h)); duration_ms = 0 for
  stills, clip frames * 1000 // fps for video.
- audio: rms = sqrt(sum(s^2)/n)/32768, clip_frac = count(|s| >=
  32704)/n, silence_frac = count(|s| < 328)/n; duration_ms =
  frames * 1000 // rate; width = rate, height = channels.
- each modality's inapplicable signals are -1.0 (the query's coalesce).

This generator recomputes every value STRAIGHT FROM THE FORMULAS,
without any media library. Soundness: PNG is lossless; q=1.0 JPEG of
16-aligned constant tiles roundtrips bit-exactly (the q157 argument);
WAV PCM16 parses back the written samples. Float parity: gray pixels
make each luma term (3v)/3.0 = v exactly, so all sums are
integer-valued doubles (exact <= 2^53) and the division/multiply/
subtract/sqrt sequence here mirrors the Scala operation order —
bit-identical IEEE results. Keyed by doc_id only (q31's reasoning).
Dev tool only — not part of the library.

Usage: gen_golden_q167.py [outParquet]"""
import math
import os
import sys

import pandas as pd


def visual(pix, w, h):
    tot = 0
    totsq = 0
    gtot = 0
    for y in range(h):
        prev = 0
        for x in range(w):
            v = pix(x, y)
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


out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q167_media_signals.parquet"

rows = []
for doc_id in range(99):
    m = doc_id % 3
    if m == 0:
        w = 16 + doc_id % 16
        h = 16 + (doc_id * 3) % 16
        b, c, s = visual(
            lambda x, y: (doc_id * 31 + x * 7 + y * 13) % 256, w, h)
        rows.append((doc_id, "image", w, h, 0, b, c, s, -1.0, -1.0, -1.0))
    elif m == 1:
        rate = 8000 + (doc_id % 3) * 2000
        channels = 1 + doc_id % 2
        frames = 800 + (doc_id * 13) % 1600
        n = frames * channels
        totsq = 0
        clip = 0
        silent = 0
        for i in range(frames):
            for ch in range(channels):
                samp = (doc_id * 31 + i * 7 + ch * 11) % 4096 - 2048
                a = abs(samp)
                totsq += samp * samp
                if a >= 32704:
                    clip += 1
                if a < 328:
                    silent += 1
        rows.append((doc_id, "audio", rate, channels, frames * 1000 // rate,
                     -1.0, -1.0, -1.0,
                     math.sqrt(totsq / n) / 32768.0, clip / n, silent / n))
    else:
        w = 16 * (2 + doc_id % 2)
        h = 16 * (1 + doc_id % 3)
        frames = 2 + doc_id % 4
        fps = 10 + (doc_id % 3) * 5
        b, c, s = visual(
            lambda x, y: (doc_id * 31 + (x // 16) * 7 + (y // 16) * 13) % 256,
            w, h)
        rows.append((doc_id, "video", w, h, frames * 1000 // fps,
                     b, c, s, -1.0, -1.0, -1.0))

fix = pd.DataFrame(rows, columns=[
    "doc_id", "modality", "width", "height", "duration_ms",
    "brightness", "contrast", "sharpness", "rms", "clip_frac",
    "silence_frac"])
for col in ["width", "height"]:
    fix[col] = fix[col].astype("int32")
fix["duration_ms"] = fix["duration_ms"].astype("int64")
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
