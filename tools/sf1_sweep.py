#!/usr/bin/env python3
"""Full-registry sf1 correctness sweep with a PER-QUERY oracle timeout:
some DuckDB oracles (the full LSH/MinHash replays) are exact but
combinatorially expensive at sf1 — a monolithic local_check run can sit
hours inside one of them. This driver runs local_check per query in a
subprocess with a wall timeout; timeouts are recorded as
oracle_timeout (NOT failures — those rows are hash-verified at sf0.1
and their sf1 RESULTS were produced without error by graft.Verify).

Usage: sf1_sweep.py <sfDir> <outDir> <artifact.json> [timeout_sec] [onlyCsv]

`onlyCsv` (round 13) restricts the sweep to the named queries — for
partial-registry dumps like the sf3 heavies, where oracle_sql.json still
carries every oracle but only the named outputs exist.
"""
import json, subprocess, sys, time

sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 240
only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
report, ok, fail, timed_out = {}, [], [], []
t0 = time.time()


def dump(partial):
    """Write the artifact after every query (round 13): a killed sweep
    leaves a valid partial record instead of nothing."""
    with open(artifact, "w") as f:
        json.dump({"sf_dir": sf_dir, "per_query_timeout_sec": timeout,
                   "partial": partial, "n_done": len(report),
                   "n_total": len(oracle),
                   "n_ok": len(ok), "n_fail": len(fail),
                   "n_oracle_timeout": len(timed_out),
                   "oracle_timeouts": sorted(timed_out),
                   "fails": sorted(fail), "queries": report},
                  f, indent=1, sort_keys=True)
for name in sorted(oracle):
    per = f"/tmp/sf1_sweep_{name}.json"
    try:
        r = subprocess.run(
            [sys.executable, "tools/local_check.py", sf_dir, out_dir, name,
             "--json", per],
            capture_output=True, text=True, timeout=timeout)
        q = json.load(open(per))["queries"].get(name,
            {"rows_match": False, "schema_match": False, "hash_match": False,
             "err": "missing from per-query artifact"})
        report[name] = q
        (ok if q.get("hash_match") else fail).append(name)
        tag = "ok  " if q.get("hash_match") else "FAIL"
        print(f"{tag} {name} ({time.time()-t0:7.0f}s elapsed)", flush=True)
    except subprocess.TimeoutExpired:
        report[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "oracle_timeout_sec": timeout}
        timed_out.append(name)
        print(f"TIME {name} (oracle > {timeout}s)", flush=True)
    dump(partial=True)

dump(partial=False)
print(f"\n{len(ok)} ok, {len(fail)} FAIL, {len(timed_out)} oracle-timeout")
sys.exit(1 if fail else 0)
