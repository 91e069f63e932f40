#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet under OUTDIR, run the corresponding oracle SQL from oracle_sql.json
in DuckDB over the testdata tables, and compare the two results the way the
driver does — BOTH sides loaded into pandas (Spark via pyarrow, where
DECIMAL becomes decimal.Decimal objects; DuckDB via .df(), where DECIMAL
becomes float64), columns sorted by name, rows sorted with sort_values,
cells compared as str(). This is intentionally round-trip faithful: a Spark
DECIMAL(22,2) "254462.00" vs a DuckDB float64 "254462.0" is a FAILURE here
(it is one in the driver), which is why SparkEntry casts final aggregate
outputs to DOUBLE/BIGINT on both sides. Dev tool only — not part of the
library. Usage: check_oracle.py <sfDir> <outDir>"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    path = f"{outdir}/{name}"
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    try:
        got = pd.read_parquet(path)
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails.append(name); continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs {ecols}"); fails.append(name); continue
    def norm(df):
        df = df[sorted(df.columns)]
        try:
            df = df.sort_values(list(df.columns))
        except Exception as e:
            raise RuntimeError(f"unsortable result (driver would error too): {e}")
        return [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    try:
        g, e = norm(got), norm(exp)
    except RuntimeError as e:
        print(f"FAIL {name}: {e}"); fails.append(name); continue
    if len(g) != len(e):
        print(f"FAIL {name}: rowcount {len(g)} vs {len(e)}"); fails.append(name); continue
    if g != e:
        diff = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs at {diff}")
        for i in diff[:2]:
            print(f"   got {g[i]}\n   exp {e[i]}")
        fails.append(name); continue
    print(f"OK   {name} ({len(g)} rows)")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} matched; failures: {fails}")
sys.exit(1 if fails else 0)
