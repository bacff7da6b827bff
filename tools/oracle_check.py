#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare sorted values exactly.

Usage: python3 tools/oracle_check.py [sfDir] [outDir]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
only = os.environ.get("GRAFT_CHECK_ONLY")
if only:
    keys = {k.strip() for k in only.split(",")}
    oracle = {k: v for k, v in oracle.items() if k in keys}
fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} vs {wc}"); fails += 1; continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[wc].sort_values(wc).reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fails += 1; continue
    # exact compare after canonicalizing to strings (what a value-hash sees)
    mism = (g.astype(str) != w.astype(str)).any(axis=1)
    if mism.any():
        i = mism.idxmax()
        print(f"FAIL {name}: value mismatch at sorted row {i}:\n  got {g.iloc[i].to_dict()}\n  want {w.iloc[i].to_dict()}")
        fails += 1; continue
    print(f"OK   {name}: {len(g)} rows")
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
