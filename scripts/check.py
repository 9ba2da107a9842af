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
# optional third arg: write a per-query JSON in the driver's
# CORRECTNESS_r{N}.json format ({query: {rows_match, schema_match,
# hash_match, spark_rows, oracle_rows, err}}) so each round can COMMIT
# its own correctness artifact — round 12's driver artifact landed
# empty and only a judge re-run reconstructed the signal.
report_path = sys.argv[3] if len(sys.argv) > 3 else None
report = {}
# Streamed per-verdict evidence: every rec() appends one JSONL line
# immediately (flushed), so a checker run cut off mid-way still leaves
# per-query verdicts — the r12/r13 empty-driver-artifact lesson.
stream_path = (report_path + ".jsonl") if report_path else f"{outdir}/check_verdicts.jsonl"
stream = open(stream_path, "w")
con = duckdb.connect()
for t in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"create view {name} as select * from '{t}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
def rec(name, rows_match, schema_match, hash_match, spark_rows, oracle_rows, err):
    report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                    "hash_match": hash_match, "spark_rows": spark_rows,
                    "oracle_rows": oracle_rows, "err": err}
    stream.write(json.dumps({"query": name, **report[name]}) + "\n")
    stream.flush()

for name in sorted(oracle):
    sql = oracle[name]
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
        rec(name, False, False, False, None, None, f"oracle error: {type(e).__name__}: {e}"[:200])
        fail += 1
        continue
    try:
        got = duckdb.connect().execute(
            f"select * from '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: spark result missing {e}")
        rec(name, False, False, False, None, len(exp), f"spark result missing: {e}"[:200])
        fail += 1
        continue
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    got = got[sorted(got.columns)].reset_index(drop=True)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns got={list(got.columns)} exp={list(exp.columns)}")
        rec(name, len(got) == len(exp), False, False, len(got), len(exp),
            f"columns got={list(got.columns)} exp={list(exp.columns)}"[:200])
        fail += 1
        continue
    if exp.shape != got.shape:
        print(f"FAIL {name}: shape got={got.shape} exp={exp.shape}")
        rec(name, False, True, False, len(got), len(exp),
            f"shape got={got.shape} exp={exp.shape}")
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
        rec(name, True, True, False, len(got), len(exp), "; ".join(bad)[:200])
        fail += 1
    else:
        print(f"ok   {name} ({exp.shape[0]} rows)")
        rec(name, True, True, True, len(got), len(exp), None)
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
if report_path:
    # rows-only queries enter the report too (rows_match = non-empty;
    # no oracle → schema/hash are recorded as a weaker rows-only check,
    # matching the driver's "weaker rows-only check" semantics)
    for d in sorted(glob.glob(f"{outdir}/*/")):
        qn = os.path.basename(d.rstrip("/"))
        if qn not in oracle:
            try:
                n = duckdb.connect().execute(
                    f"select count(*) from '{d}*.parquet'").fetchone()[0]
                rec(qn, n > 0, None, None, n, None,
                    None if n > 0 else "rows-only query returned 0 rows")
            except Exception as e:
                rec(qn, False, None, None, None, None, str(e)[:200])
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"per-query report written to {report_path} ({len(report)} entries)")
sys.exit(1 if fail else 0)
