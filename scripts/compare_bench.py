#!/usr/bin/env python3
"""Compare two Bench JSON artifacts: per-query and per-family ratios.

Usage: compare_bench.py BASE.json SCALED.json [ratio_floor]

Prints family subtotals and every query whose scaled/base ratio exceeds
the floor (default 3.0), plus the aggregate ratio — the shape of the
SCALE.md scale-leg tables.
"""
import json
import sys
from collections import defaultdict


def main():
    base = json.load(open(sys.argv[1]))["queries"]
    scaled = json.load(open(sys.argv[2]))["queries"]
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    shared = sorted(set(base) & set(scaled))
    tb = sum(base[q] for q in shared)
    ts = sum(scaled[q] for q in shared)
    print(f"shared={len(shared)}  base={tb:.1f}s  scaled={ts:.1f}s  "
          f"ratio={ts / tb:.2f}x")
    fam_b, fam_s = defaultdict(float), defaultdict(float)
    for q in shared:
        f = q.split("_")[0][0]
        fam_b[f] += base[q]
        fam_s[f] += scaled[q]
    print("\nfamily  base_s  scaled_s  ratio")
    for f in sorted(fam_b):
        print(f"  {f}     {fam_b[f]:7.2f} {fam_s[f]:8.2f}  "
              f"{fam_s[f] / fam_b[f]:5.2f}x")
    print(f"\nqueries with ratio > {floor}x (or > 5s scaled):")
    rows = [(scaled[q] / max(base[q], 1e-9), base[q], scaled[q], q)
            for q in shared]
    for r, b, s, q in sorted(rows, reverse=True):
        if r > floor or s > 5.0:
            print(f"  {q:28s} {b:7.2f}s -> {s:8.2f}s  {r:6.1f}x")


if __name__ == "__main__":
    main()
