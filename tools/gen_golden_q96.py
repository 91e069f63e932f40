#!/usr/bin/env python3
"""Generate the golden fixture for q96_compression_ratio.

The deflate ratio is deterministic but DuckDB ships no deflate function, so
the oracle joins the documents table against a committed fixture of
independently-computed ratios (Python zlib raw deflate, level 6 — verified
byte-identical to java.util.zip.Deflater(6, nowrap=true) on this JVM). Rows
are keyed by (doc_id, md5(text)) so a future testdata regeneration that
changes any text produces a LOUD rowcount mismatch instead of silently
matching a stale value. The fixture is the union over every generated scale
factor, so one fixture serves sf0.001/sf0.01/sf0.1.

Rounding happens HERE (decimal HALF_UP at 4 places — the same semantics as
Spark's round()) so the oracle never re-rounds and no cross-engine rounding
edge can bite. Dev tool only — not part of the library.

Usage: gen_golden_q96.py [outParquet]"""
import sys, zlib, hashlib, decimal
import duckdb
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q96_compression_ratio.parquet"

def ratio_r4(text: str) -> float:
    b = text.encode("utf-8")
    if not b:
        return 1.0
    c = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate == Deflater(6, true)
    n = len(c.compress(b) + c.flush())
    r = decimal.Decimal(repr(n / len(b))).quantize(
        decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP)
    return float(r)

rows = {}
for sf in ["sf0.001", "sf0.01", "sf0.1"]:
    df = duckdb.sql(
        f"select doc_id, text from '/root/testdata/{sf}/documents.parquet'").df()
    for doc_id, text in df.itertuples(index=False):
        key = (int(doc_id), hashlib.md5(text.encode("utf-8")).hexdigest())
        rows[key] = ratio_r4(text)

fix = pd.DataFrame(
    [(k[0], k[1], v) for k, v in sorted(rows.items())],
    columns=["doc_id", "text_md5", "compression_ratio"])
import os
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
