#!/usr/bin/env python3
"""Emit the BASELINE.md scale-point table: per-query effective seconds
at two scale factors and the growth ratio, sorted by ratio.

Usage: scale_report.py <bench_small.jsonl> <bench_big.jsonl> [rows_factor]

Effective time = min(raw, retimed) per query — the same rule
BASELINE.md applies to a single run on this shared VM. When a file has
several runs (a series), the per-query minimum across runs is used.
"""
import json
import sys


def effective(path):
    eff = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            b = json.loads(line)
            rt = b.get("retimed", {})
            for k, v in b["queries"].items():
                e = min(v, rt.get(k, v))
                eff[k] = min(e, eff.get(k, e))
    return eff


def main():
    small, big = effective(sys.argv[1]), effective(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for k, vb in big.items():
        vs = small.get(k)
        rows.append((k, vs, vb, vb / vs if vs else None))
    rows.sort(key=lambda r: -(r[3] or 0))
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for k, vs, vb, r in rows:
        print(f"| `{k}` | {vs:.2f} | {vb:.2f} | {r:.1f}x |"
              if vs else f"| `{k}` | — | {vb:.2f} | — |")
    ts, tb = sum(v for v in small.values()), sum(big.values())
    print(f"\ntotals: {ts:.1f}s -> {tb:.1f}s = {tb / ts:.2f}x "
          f"for {factor:.0f}x rows")
    sup = [k for k, vs, vb, r in rows if r and r > factor]
    print("superlinear (> rows factor):", ", ".join(sup) if sup else "none")


if __name__ == "__main__":
    main()
