#!/usr/bin/env python3
"""Shuffle-volume audit over a Bench artifact (round 10): rank queries by
measured shuffle bytes (the per-rep MAX of read/write recorded by
graft.tools.ShuffleTelemetry) and flag spill. Feeds the PERF.md 100 TB
audit with measured bytes instead of plan shapes.

Round 14: `--json <path>` additionally writes a machine-readable artifact
(per-query read/write/spill bytes + suite totals + the top-N list), the
shape close_bench.py diffs round-over-round so top-10 shuffle growth is
caught BEFORE it is slow enough to move wall-clock ratios.

Usage: python3 tools/shuffle_audit.py [bench/BENCH_SF1.json] [topN] [--json path]
"""
import json, sys

argv = list(sys.argv[1:])
json_out = None
if "--json" in argv:
    i = argv.index("--json")
    json_out = argv[i + 1]
    del argv[i:i + 2]

path = argv[0] if len(argv) > 0 else "bench/BENCH_SF1.json"
top = int(argv[1]) if len(argv) > 1 else 10

d = json.load(open(path))
rows = []
for name, q in d["queries"].items():
    rw = q.get("shuffle_rw_bytes")
    if not rw:
        continue
    spill = q.get("spill_bytes", [0, 0])
    rows.append((name, rw[0], rw[1], spill[0], spill[1], q["sec"]))

def mb(b): return f"{b/1e6:10.1f}"

rows.sort(key=lambda r: -(r[1] + r[2]))
print(f"{'query':42} {'read_MB':>10} {'write_MB':>10} {'memspill_MB':>11} {'diskspill_MB':>12} {'sec':>8}")
for r in rows[:top]:
    print(f"{r[0]:42} {mb(r[1])} {mb(r[2])} {mb(r[3]):>11} {mb(r[4]):>12} {r[5]:8.2f}")

tot_r = sum(r[1] for r in rows)
tot_w = sum(r[2] for r in rows)
spillers = [r for r in rows if r[3] + r[4] > 0]
print(f"\nsuite totals: read {tot_r/1e9:.2f} GB, write {tot_w/1e9:.2f} GB, "
      f"{len(rows)} instrumented queries, {len(spillers)} with spill")
for r in spillers:
    print(f"  SPILL {r[0]}: mem {r[3]/1e6:.1f} MB disk {r[4]/1e6:.1f} MB")

if json_out:
    art = {
        "source_bench": path,
        "sf": d.get("sf"),
        "totals": {"read_bytes": tot_r, "write_bytes": tot_w,
                   "n_instrumented": len(rows), "n_spillers": len(spillers)},
        "top": [{"query": r[0], "read_bytes": r[1], "write_bytes": r[2],
                 "spill_mem_bytes": r[3], "spill_disk_bytes": r[4],
                 "sec": r[5]} for r in rows[:top]],
        "queries": {r[0]: {"read_bytes": r[1], "write_bytes": r[2],
                           "spill_mem_bytes": r[3], "spill_disk_bytes": r[4]}
                    for r in rows},
    }
    with open(json_out, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"\nwrote {json_out}")
