#!/usr/bin/env python3
"""Build the BENCH_SCALING.md per-query table from generated-fixture bench
records at two (or three) scale factors. Driver-side analysis tooling only.

Usage: python3 tools/scaling_report.py <bench_sfA.json> <bench_sfB.json> [factor]
  factor = data ratio B/A (default 10). Prints a markdown table sorted by
  wall-time ratio, flagging queries whose growth exceeds ~1.2x the data
  ratio (the super-linear threshold the round-4 verdict set: >12x for 10x).
"""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
thresh = 1.2 * factor

qa, qb = a["queries"], b["queries"]
rows = []
for name in sorted(qa):
    if name not in qb:
        continue
    ta, tb = qa[name], qb[name]
    ratio = tb / ta if ta > 0 else float("inf")
    rows.append((name, ta, tb, ratio))
rows.sort(key=lambda r: -r[3])

print(f"| query | {a['sf'].split('/')[-1]} s | {b['sf'].split('/')[-1]} s | ratio | flag |")
print("|---|---|---|---|---|")
n_flag = 0
for name, ta, tb, ratio in rows:
    flag = "**super-linear**" if ratio > thresh else ""
    if flag:
        n_flag += 1
    print(f"| {name} | {ta:.2f} | {tb:.2f} | {ratio:.1f}x | {flag} |")
print(f"\ntotals: {a['value']:.1f}s -> {b['value']:.1f}s "
      f"({b['value']/a['value']:.1f}x for {factor:.0f}x data); "
      f"{n_flag} queries over the {thresh:.0f}x super-linear threshold")
