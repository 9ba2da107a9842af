#!/usr/bin/env python3
"""Regenerate the BASELINE.md budget table from a bench series.

Usage: baseline_from_series.py <series.jsonl> [prior_BASELINE.md]

Baseline = per-query MIN across all runs, also folding in each run's
`retimed` values (the bench's own warm re-reps of over-budget queries
-- same min-approximates-uncontended-cost reasoning as the series
min). With a prior BASELINE.md, each query's prior baseline joins the
min (a pure ratchet: the combined series only ever lowers a
baseline; queries new to the surface enter at their series min).
Budget = 2x baseline rounded UP to 2 decimals, floored at 0.5 s.
Prints the markdown table plus totals.
"""
import json
import math
import re
import sys

runs = []
with open(sys.argv[1]) as f:
    for line in f:
        line = line.strip()
        if line:
            runs.append(json.loads(line))

if not runs:
    sys.exit("no runs in series file")

best: dict[str, float] = {}
for r in runs:
    for q, t in r["queries"].items():
        best[q] = min(best.get(q, 1e9), t)
    for q, t in r.get("retimed", {}).items():
        best[q] = min(best.get(q, 1e9), t)
    if r.get("errors"):
        sys.exit(f"run has errors: {r['errors']}")

if len(sys.argv) > 2:
    with open(sys.argv[2]) as f:
        for line in f:
            # full-line anchor: only the budget table's exact
            # `| name | baseline | budget |` shape — the scale-point
            # tables share the same three leading columns and their
            # cells are NOT sf0.1 baselines (same fix as graft.Bench's
            # budget parser)
            m = re.match(r"^\|\s*`?(\w+)`?\s*\|\s*([\d.]+)\s*\|\s*([\d.]+)\s*\|\s*$",
                         line)
            if m and m.group(1) != "query" and \
                    float(m.group(3)) >= float(m.group(2)):
                q = m.group(1)
                # ratchet only queries the CURRENT series still runs —
                # a renamed/removed query must not be resurrected from
                # the prior table (it would inflate totals forever)
                if q in best:
                    best[q] = min(best[q], float(m.group(2)))
                else:
                    print(f"dropping stale prior-baseline row: {q}", file=sys.stderr)

rows = []
for q in sorted(best):
    b = best[q]
    budget = max(0.5, math.ceil(b * 2 * 100) / 100)
    rows.append((q, b, budget))

print(f"runs: {len(runs)}; totals per run: "
      + ", ".join(f"{r['value']:.1f}s" for r in runs))
print()
print("| query | baseline | budget (2x) |")
print("|---|---|---|")
for q, b, budget in rows:
    print(f"| `{q}` | {b:.2f} | {budget:.2f} |")
print()
print(f"total baseline: {sum(b for _, b, _ in rows):.1f} s over {len(rows)} queries; "
      f"total budget: {sum(bud for _, _, bud in rows):.1f} s")
