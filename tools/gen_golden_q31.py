#!/usr/bin/env python3
"""Generate the golden fixture for q31_multimodal.

The multimodal decode is a documented deterministic STUB (no codecs in the
container): width/height derive from a signed-byte FNV-ish fold of the
payload (Multimodal.StubDecoder). This reimplements that fold
INDEPENDENTLY in Python (Java long overflow + floorMod semantics emulated
explicitly) so the oracle checks the Spark plumbing end-to-end rather than
trusting its own output. n_frames is 1 for every image payload by
construction (image duration is 0 -> exactly one sampled frame).

Keys on (doc_id, md5(text)) like q96 so a testdata regeneration surfaces
as a loud rowcount mismatch. Union over all scale factors; q31 reads
doc_id < 100 but the fixture covers every doc so the WHERE stays in SQL.
Dev tool only — not part of the library.

Usage: gen_golden_q31.py [outParquet]"""
import sys, hashlib, os
import duckdb
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q31_multimodal.parquet"

MASK = (1 << 64) - 1

def to_signed(h):
    return h - (1 << 64) if h >= (1 << 63) else h

def byte_fold(seed, data: bytes) -> int:
    h = seed
    for b in data:
        sb = b - 256 if b > 127 else b      # Java bytes are signed
        h = (31 * h + sb) & MASK
    return to_signed(h)

def decode_dims(text: str):
    h = byte_fold(1125899906842597, text.encode("utf-8"))
    w = 64 + (h % 512)                      # Python % == Java floorMod here
    ht = 64 + ((h >> 9) % 512)              # arithmetic shift on signed int
    return int(w), int(ht)

rows = {}
for sf in ["sf0.001", "sf0.01", "sf0.1"]:
    df = duckdb.sql(
        f"select doc_id, text from '/root/testdata/{sf}/documents.parquet'").df()
    for doc_id, text in df.itertuples(index=False):
        key = (int(doc_id), hashlib.md5(text.encode("utf-8")).hexdigest())
        w, h = decode_dims(text)
        rows[key] = (w, h, 1)

fix = pd.DataFrame(
    [(k[0], k[1], v[0], v[1], v[2]) for k, v in sorted(rows.items())],
    columns=["doc_id", "text_md5", "width", "height", "n_frames"])
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
