#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script runs
each oracle SQL in DuckDB against the same tables and diffs the
parquet results (columns sorted by name, values compared cell-wise).
"""
import duckdb, json, sys, glob, os
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"create view {name} as select * from '{t}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
        fail += 1
        continue
    try:
        got = duckdb.connect().execute(
            f"select * from '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: spark result missing {e}")
        fail += 1
        continue
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    got = got[sorted(got.columns)].reset_index(drop=True)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns got={list(got.columns)} exp={list(exp.columns)}")
        fail += 1
        continue
    if exp.shape != got.shape:
        print(f"FAIL {name}: shape got={got.shape} exp={exp.shape}")
        fail += 1
        continue
    bad = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        if str(e.dtype) != str(g.dtype):
            bad.append(f"{c}: dtype {g.dtype} vs {e.dtype}")
        eq = (e.values == g.values) | (pd.isna(e.values) & pd.isna(g.values))
        if not eq.all():
            i = int(np.argmin(eq))
            bad.append(f"{c}: {int((~eq).sum())} diffs, first row {i}: got={g.iloc[i]!r} exp={e.iloc[i]!r}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad))
        fail += 1
    else:
        print(f"ok   {name} ({exp.shape[0]} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail, {len([q for q in json.load(open(f'{outdir}/oracle_sql.json'))])} oracles")
# rows-only queries (no oracle): empty or unreadable counts as failure
for d in sorted(glob.glob(f"{outdir}/*/")):
    qn = os.path.basename(d.rstrip("/"))
    if qn not in oracle:
        try:
            n = duckdb.connect().execute(f"select count(*) from '{d}*.parquet'").fetchone()[0]
            print(f"rows-only {qn}: {n} rows {'ok' if n > 0 else 'EMPTY!'}")
            if n == 0:
                fail += 1
        except Exception as e:
            print(f"rows-only {qn}: ERROR {e}")
            fail += 1
sys.exit(1 if fail else 0)
