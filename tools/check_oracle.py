#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet under OUTDIR, run the corresponding oracle SQL from oracle_sql.json
in DuckDB over the testdata tables, and compare as exact multisets
(columns sorted by name, rows sorted). Dev tool only — not part of the
library. Usage: check_oracle.py <sfDir> <outDir>"""
import json, sys, glob, os
import duckdb

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
        got = con.execute(f"SELECT * FROM read_parquet('{path}/*.parquet')").fetch_arrow_table()
        exp = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails.append(name); continue
    gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs {ecols}"); fails.append(name); continue
    def norm(tbl):
        rows = []
        for row in zip(*[tbl.column(c).to_pylist() for c in sorted(tbl.column_names)]):
            rows.append(tuple(str(v) for v in row))
        return sorted(rows)
    g, e = norm(got), norm(exp)
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
