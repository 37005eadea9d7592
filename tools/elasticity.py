#!/usr/bin/env python3
"""Elasticity table from two bench artifacts (same-protocol runs).

Usage: python3 tools/elasticity.py <small.json> <big.json> [data_factor]

Prints median/p90 per-query time ratios for the data_factor (default 10x)
scale-up, the count of super-linear queries (> data_factor), and the
worst movers with their per-rep detail -- the table PERF.md's scale
section reads.
"""
import json
import sys


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    sq, bq = small["queries"], big["queries"]
    common = sorted(set(sq) & set(bq))
    ratios = {}
    for name in common:
        s, b = sq[name]["sec"], bq[name]["sec"]
        if s > 0:
            ratios[name] = b / s
    vals = sorted(ratios.values())
    n = len(vals)
    med = vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2
    p90 = vals[int(n * 0.9)]
    over = {k: v for k, v in ratios.items() if v > factor}
    over15 = {k: v for k, v in ratios.items() if v > factor * 1.5}
    print(f"common queries: {n}")
    print(f"walls: {small['value']:.1f} s -> {big['value']:.1f} s "
          f"(x{big['value']/small['value']:.2f} for x{factor:g} data)")
    print(f"median ratio: {med:.2f}x   p90: {p90:.2f}x")
    print(f"> {factor:g}x (super-linear): {len(over)}   "
          f"> {factor*1.5:g}x: {len(over15)}")
    print("\nworst movers:")
    for name, r in sorted(ratios.items(), key=lambda kv: -kv[1])[:12]:
        s, b = sq[name], bq[name]
        print(f"  {name}: {s['sec']:.2f} -> {b['sec']:.2f} s ({r:.1f}x)  "
              f"reps {['%.2f' % x for x in b['reps']]} gc {b['gc_ms']}")
    if small.get("errors") or big.get("errors"):
        print("\nerrors:", small.get("errors"), big.get("errors"))


if __name__ == "__main__":
    main()
