#!/usr/bin/env python3
"""Elasticity table from two tracked bench artifacts.

Usage: python3 tools/elasticity.py bench/BENCH_SF001.json bench/BENCH_LOCAL.json [threshold]

Prints wall ratio, median/p90 per-query ratio, and every query whose
ratio exceeds the threshold (default 10x), with per-rep mins so a
contention-spiked median is distinguishable from real super-linear work.
"""
import json
import sys


def main() -> None:
    small, big = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    a = json.load(open(small))
    b = json.load(open(big))
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    ratios = []
    for q in common:
        sa, sb = qa[q]["sec"], qb[q]["sec"]
        if sa > 0:
            ratios.append((sb / sa, q, sa, sb))
    ratios.sort()
    vals = [r[0] for r in ratios]
    n = len(vals)
    print(f"common queries: {n}")
    print(f"wall: {a['value']:.1f} -> {b['value']:.1f} s "
          f"(x{b['value'] / a['value']:.2f})")
    print(f"median ratio: {vals[n // 2]:.2f}x   p90: {vals[int(n * 0.9)]:.2f}x")
    over = [r for r in ratios if r[0] > threshold]
    print(f"> {threshold:g}x: {len(over)}")
    for ratio, q, sa, sb in over:
        mins = (qa[q].get("min", sa), qb[q].get("min", sb))
        min_ratio = mins[1] / mins[0] if mins[0] > 0 else float("nan")
        print(f"  {q}: {sa:.2f} -> {sb:.2f} s ({ratio:.1f}x; min-rep ratio {min_ratio:.1f}x)")


if __name__ == "__main__":
    main()
