#!/usr/bin/env python3
"""Compare two Bench JSON records (e.g. BENCH_full_r05 vs r08): per-query
ratios, sorted by regression, with totals over the common query set."""
import json, sys

def load(p):
    d = json.load(open(p))
    return d["queries"] if "queries" in d else d

a, b = load(sys.argv[1]), load(sys.argv[2])
common = sorted(set(a) & set(b))
ra = sum(a[q] for q in common); rb = sum(b[q] for q in common)
rows = sorted(((b[q] / a[q] if a[q] > 0 else float("inf"), q) for q in common),
              reverse=True)
print(f"common queries: {len(common)}  {sys.argv[1]}: {ra:.1f}s  "
      f"{sys.argv[2]}: {rb:.1f}s  ratio {rb/ra:.2f}x")
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
print(f"queries with ratio > {thr}x:")
for r, q in rows:
    if r > thr:
        print(f"  {q:36s} {a[q]:7.3f} -> {b[q]:7.3f}  ({r:.1f}x)")
only_b = sorted(set(b) - set(a))
if only_b:
    print(f"new in {sys.argv[2]}: {', '.join(only_b)}")
