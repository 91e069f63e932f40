#!/usr/bin/env python3
"""Generate the golden fingerprint fixture for q24_text_quality.

The document fingerprint is a deterministic xxhash64 chain over the token
stream (acc <- xxhash64(acc, token), seed 42). DuckDB has no xxhash64, so
the oracle joins a committed fixture computed by this INDEPENDENT pure-
Python XXH64 implementation (public-domain algorithm; Java trim/split
semantics emulated explicitly). Verified byte-identical to Spark's
XxHash64 expression on the full sf0.01 corpus before committing.

Keys on (doc_id, md5(text)) like q96/q31 so testdata drift fails loudly.
Dev tool only — not part of the library.

Usage: gen_golden_q24.py [outParquet]"""
import sys, os, hashlib
import re, struct
import duckdb
import pandas as pd

M = (1 << 64) - 1
P1=0x9E3779B185EBCA87; P2=0xC2B2AE3D27D4EB4F; P3=0x165667B19E3779F9
P4=0x85EBCA77C2B2AE63; P5=0x27D4EB2F165667C5

def rotl(x, r): return ((x << r) | (x >> (64 - r))) & M

def xxh64(data: bytes, seed: int) -> int:
    n = len(data); i = 0; seed &= M
    if n >= 32:
        v1=(seed+P1+P2)&M; v2=(seed+P2)&M; v3=seed; v4=(seed-P1)&M
        while i + 32 <= n:
            x1,x2,x3,x4 = struct.unpack_from('<QQQQ', data, i)
            v1 = (rotl((v1 + x1*P2) & M, 31) * P1) & M
            v2 = (rotl((v2 + x2*P2) & M, 31) * P1) & M
            v3 = (rotl((v3 + x3*P2) & M, 31) * P1) & M
            v4 = (rotl((v4 + x4*P2) & M, 31) * P1) & M
            i += 32
        h = (rotl(v1,1) + rotl(v2,7) + rotl(v3,12) + rotl(v4,18)) & M
        for v in (v1,v2,v3,v4):
            k = (rotl((v*P2)&M, 31) * P1) & M
            h ^= k; h = (h*P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        k = struct.unpack_from('<Q', data, i)[0]
        k = (rotl((k*P2)&M, 31) * P1) & M
        h ^= k; h = (rotl(h,27)*P1 + P4) & M
        i += 8
    if i + 4 <= n:
        k = struct.unpack_from('<I', data, i)[0]
        h ^= (k * P1) & M
        h = (rotl(h,23)*P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (rotl(h,11)*P1) & M
        i += 1
    h ^= h >> 33; h = (h*P2) & M; h ^= h >> 29; h = (h*P3) & M; h ^= h >> 32
    return h

def xxh64_long(l: int, seed: int) -> int:
    return xxh64(struct.pack('<q', ((l + (1<<63)) % (1<<64)) - (1<<63)), seed)

def sql_trim(s):
    # Spark SQL trim() strips the SPACE character only (StringTrim) — NOT
    # Java String.trim's "all chars <= 0x20". A text edged with \t or \n
    # keeps that char, and split then emits a leading/trailing '' token
    # that the fingerprint chain hashes.
    return s.strip(' ')

def fingerprint(text: str) -> int:
    t = sql_trim(text).lower()
    toks = re.split(r'\s+', t, flags=re.ASCII) if t != '' else ['']
    acc = 0
    for w in toks:
        h = xxh64_long(acc, 42)
        h = xxh64(w.encode('utf-8'), h)
        acc = ((h + (1<<63)) % (1<<64)) - (1<<63)   # to signed long
    return acc


out = sys.argv[1] if len(sys.argv) > 1 else \
    "src/test/resources/golden/q24_fingerprint.parquet"
rows = {}
for sf in ["sf0.001", "sf0.01", "sf0.1"]:
    df = duckdb.sql(
        f"select doc_id, text from '/root/testdata/{sf}/documents.parquet'").df()
    for doc_id, text in df.itertuples(index=False):
        key = (int(doc_id), hashlib.md5(text.encode("utf-8")).hexdigest())
        rows[key] = fingerprint(text)
fix = pd.DataFrame(
    [(k[0], k[1], v) for k, v in sorted(rows.items())],
    columns=["doc_id", "text_md5", "fp"])
fix["fp"] = fix["fp"].astype("int64")
os.makedirs(os.path.dirname(out), exist_ok=True)
fix.to_parquet(out, index=False)
print(f"wrote {len(fix)} rows to {out}")
