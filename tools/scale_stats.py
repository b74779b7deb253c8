#!/usr/bin/env python3
"""Summarize a pair of full-catalog bench JSONs (sf0.1 vs sf1) for
BENCH_SCALE.md: totals, per-family mean/max ratios over the timing
floor, and the per-query ratio table.

Usage: python3 tools/scale_stats.py /tmp/bench_scale_sf01.json /tmp/bench_scale_sf1.json
"""
import json
import re
import sys

FLOOR = 0.05  # s at sf0.1: below this a ratio measures overhead, not work

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
print(f"sf0.1 total {a['value']:.1f}s  n_err {a['n_err']}")
print(f"sf1   total {b['value']:.1f}s  n_err {b['n_err']}")
if a.get("errors"):
    print("sf0.1 errors:", a["errors"])
if b.get("errors"):
    print("sf1 errors:", b["errors"])

common = [q for q in qa if q in qb and qa[q] >= FLOOR and qb[q] > 0]
ratios = {q: qb[q] / qa[q] for q in common}
print(f"\n{len(common)} queries above the {FLOOR}s floor")

fams = {}
for q, r in ratios.items():
    fam = re.match(r"([a-z]+)", q).group(1)
    fams.setdefault(fam, []).append(r)
print("\n| family | n | mean ratio | max ratio |")
print("|---|---|---|---|")
for fam in sorted(fams):
    rs = fams[fam]
    print(f"| {fam} | {len(rs)} | {sum(rs)/len(rs):.1f}x | {max(rs):.1f}x |")

print("\nper-query ratios >= 2.5x:")
print("| query | sf0.1 s | sf1 s | ratio |")
print("|---|---|---|---|")
for q in sorted(ratios, key=lambda q: -ratios[q]):
    if ratios[q] >= 2.5:
        print(f"| {q} | {qa[q]:.2f} | {qb[q]:.2f} | {ratios[q]:.1f}x |")

worst = max(ratios.values())
print(f"\nworst ratio: {worst:.1f}x  (linear for 10x data = 10x)")
sup = [q for q, r in ratios.items() if r > 10.0]
print("super-linear entries:", sup if sup else "none")

ph_a, ph_b = a.get("phases", {}), b.get("phases", {})
if ph_a and ph_b:
    print("\nphases (build/serve s) sf0.1 -> sf1:")
    for q in sorted(ph_a):
        if q in ph_b:
            print(f"  {q}: build {ph_a[q]['build']:.2f}->{ph_b[q]['build']:.2f}"
                  f"  serve {ph_a[q]['serve']:.2f}->{ph_b[q]['serve']:.2f}")
