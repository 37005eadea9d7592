#!/usr/bin/env python3
"""Round-close bench protocol (round 13, verdict ask #7).

Twice in round 12 a uniform 1.1-1.17x wall inflation had to be
adjudicated as ambient host drift. This driver encodes the procedure so
close artifacts are produced through it and drift never reaches the
committed record:

  1. QUIET-HOST GATE: wait until 1-min loadavg < --load-max before
     starting (abort after --quiet-timeout).
  2. Run graft.Bench (which itself does interleaved reps + per-rep GC +
     load provenance) with SPARK_GRAFT_BENCH_OUT=<out>.
  3. Compare per-query medians against the PREVIOUS committed artifact
     on common, non-error rows with ref >= --min-sec:
       - median common-row ratio <= --max-ratio  -> ACCEPT.
       - ratio > --max-ratio with UNIFORM shape (no single mover beyond
         --mover-ratio, >= 60% of rows within [0.8, 1.3]x the median
         ratio) -> ambient contention: REJECT and rerun (a genuine plan
         regression is never uniform across hundreds of unrelated
         queries).
       - ratio > --max-ratio driven by specific movers -> ACCEPT but list
         the movers loudly (a rerun cannot fix a plan regression; it
         needs investigation, not suppression).
  4. SHUFFLE GATE (round 14, verdict ask #5): diff the top-10 shuffle
     volume (read+write bytes of the 10 heaviest instrumented queries)
     against the reference artifact. Shuffle bytes are DETERMINISTIC —
     ambient load never inflates them — so growth > --shuffle-ratio is a
     plan change, not noise: REJECT the close unless --shuffle-cause
     names why (the named cause is recorded in the protocol artifact).
     Wall ratios catch slow; this catches WASTEFUL before it is slow.
  5. Write <out>.protocol.json recording every attempt, the gate values,
     and the accept/reject reasoning, plus <out>.shuffle.json (the
     shuffle_audit.py --json shape) as the tracked round-over-round
     shuffle record.

Usage:
  close_bench.py <sfDir> <outArtifact> <refArtifact>
      [--reps 3] [--attempts 3] [--load-max 4.0] [--quiet-timeout 1800]
      [--max-ratio 1.1] [--mover-ratio 1.9] [--min-sec 0.3]
      [--shuffle-ratio 1.5] [--shuffle-cause "reason"]
"""
import argparse, json, os, statistics, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_quiet(load_max, timeout):
    t0 = time.time()
    while True:
        load = os.getloadavg()[0]
        if load < load_max:
            return load
        if time.time() - t0 > timeout:
            sys.exit(f"host never went quiet: load {load:.1f} >= {load_max} "
                     f"after {timeout}s — refusing to produce a close artifact")
        print(f"waiting for quiet host: load {load:.1f} >= {load_max}", flush=True)
        time.sleep(30)


def run_bench(sf_dir, out, reps):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_OUT=out,
               SPARK_GRAFT_REPS=str(reps))
    r = subprocess.run([os.path.join(REPO, "tools/run_main.sh"),
                        "-Xmx24g", "graft.Bench"],
                       env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.exit(f"bench run failed (exit {r.returncode}):\n{r.stderr[-2000:]}")
    return json.load(open(out))


def compare(cur, ref, min_sec):
    """Per-query median ratios on common non-error rows above min_sec."""
    cq, rq = cur["queries"], ref["queries"]
    ratios = {}
    for name, rv in rq.items():
        if name in cq and rv.get("sec", 0) >= min_sec and "partial" not in rv \
                and "partial" not in cq[name]:
            ratios[name] = cq[name]["sec"] / rv["sec"]
    return ratios


def shuffle_top10(artifact):
    """(sum of read+write bytes over the 10 heaviest queries, their names)."""
    rows = sorted(((n, sum(q.get("shuffle_rw_bytes", [0, 0])))
                   for n, q in artifact.get("queries", {}).items()
                   if q.get("shuffle_rw_bytes")), key=lambda r: -r[1])[:10]
    return sum(r[1] for r in rows), [r[0] for r in rows]


def shuffle_verdict(cur, ref, shuffle_ratio, cause):
    """Deterministic-bytes gate: top-10 shuffle growth is a plan change."""
    cur_b, cur_top = shuffle_top10(cur)
    ref_b, _ = shuffle_top10(ref)
    info = {"top10_bytes": cur_b, "ref_top10_bytes": ref_b, "top10": cur_top}
    if ref_b <= 0:
        return "accept", "no reference shuffle record (first close)", info
    ratio = cur_b / ref_b
    info["ratio"] = round(ratio, 3)
    if ratio <= shuffle_ratio:
        return "accept", f"top-10 shuffle ratio {ratio:.3f} <= {shuffle_ratio}", info
    if cause:
        info["named_cause"] = cause
        return ("accept", f"top-10 shuffle ratio {ratio:.3f} > {shuffle_ratio} "
                f"ACCEPTED with named cause: {cause}", info)
    return ("reject", f"top-10 shuffle volume grew {ratio:.2f}x "
            f"({ref_b/1e9:.2f} -> {cur_b/1e9:.2f} GB) with no named cause — "
            "shuffle bytes are deterministic, a rerun cannot fix this; name "
            "the plan change via --shuffle-cause or fix it", info)


def verdict(ratios, max_ratio, mover_ratio):
    if not ratios:
        return "accept", "no comparable rows (first close at this SF)", {}
    med = statistics.median(ratios.values())
    movers = {n: round(r, 3) for n, r in ratios.items()
              if r > mover_ratio or r < 1 / mover_ratio}
    if med <= max_ratio:
        return "accept", f"median common-row ratio {med:.3f} <= {max_ratio}", movers
    near = sum(1 for r in ratios.values() if 0.8 * med <= r <= 1.3 * med)
    uniform = not movers and near / len(ratios) >= 0.6
    if uniform:
        return ("reject",
                f"UNIFORM inflation: median ratio {med:.3f} > {max_ratio}, "
                f"{near}/{len(ratios)} rows within [0.8,1.3]x median, no mover "
                f"beyond {mover_ratio}x — ambient contention, rerunning", movers)
    return ("accept",
            f"median ratio {med:.3f} > {max_ratio} but NON-uniform "
            f"({len(movers)} movers beyond {mover_ratio}x) — real movement, "
            "investigate the movers", movers)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir"); ap.add_argument("out"); ap.add_argument("ref")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--load-max", type=float, default=4.0)
    ap.add_argument("--quiet-timeout", type=int, default=1800)
    ap.add_argument("--max-ratio", type=float, default=1.1)
    ap.add_argument("--mover-ratio", type=float, default=1.9)
    ap.add_argument("--min-sec", type=float, default=0.3)
    ap.add_argument("--shuffle-ratio", type=float, default=1.5)
    ap.add_argument("--shuffle-cause", default=None)
    a = ap.parse_args()

    ref = json.load(open(a.ref)) if os.path.exists(a.ref) else {"queries": {}}
    attempts = []
    for attempt in range(1, a.attempts + 1):
        load0 = wait_quiet(a.load_max, a.quiet_timeout)
        print(f"attempt {attempt}: load {load0:.2f}, running bench "
              f"(reps={a.reps}, sf={a.sf_dir})", flush=True)
        cur = run_bench(a.sf_dir, a.out, a.reps)
        ratios = compare(cur, ref, a.min_sec)
        decision, why, movers = verdict(ratios, a.max_ratio, a.mover_ratio)
        sdecision, swhy, sinfo = shuffle_verdict(cur, ref, a.shuffle_ratio,
                                                 a.shuffle_cause)
        med = statistics.median(ratios.values()) if ratios else None
        attempts.append({"attempt": attempt, "load_before": load0,
                         "load_after": cur.get("load_avg_end"),
                         "value_sec": cur.get("value"),
                         "n_common": len(ratios), "median_ratio": med,
                         "movers": movers, "decision": decision, "why": why,
                         "shuffle": dict(sinfo, decision=sdecision, why=swhy)})
        print(f"attempt {attempt}: total {cur.get('value'):.1f}s, "
              f"median ratio {med if med is None else round(med, 3)} -> "
              f"{decision.upper()}: {why}", flush=True)
        if movers:
            print(f"  movers: {movers}", flush=True)
        print(f"shuffle gate: {sdecision.upper()}: {swhy}", flush=True)
        if sdecision == "reject":
            # deterministic bytes — retrying is pointless; fail the close now
            attempts[-1]["decision"] = "reject"
            attempts[-1]["why"] += f"; SHUFFLE GATE: {swhy}"
            break
        if decision == "accept":
            break
    else:
        print("all attempts rejected as ambient — keeping the LAST run's "
              "artifact, flagged; do not commit without adjudication", flush=True)

    with open(a.out + ".protocol.json", "w") as f:
        json.dump({"ref": a.ref, "sf_dir": a.sf_dir,
                   "gates": {"load_max": a.load_max, "max_ratio": a.max_ratio,
                             "mover_ratio": a.mover_ratio, "min_sec": a.min_sec,
                             "reps": a.reps, "shuffle_ratio": a.shuffle_ratio},
                   "attempts": attempts,
                   "accepted": attempts[-1]["decision"] == "accept"},
                  f, indent=1, sort_keys=True)
    # tracked round-over-round shuffle record next to the bench artifact
    subprocess.run([sys.executable, os.path.join(REPO, "tools/shuffle_audit.py"),
                    a.out, "10", "--json", a.out.replace(".json", "") + ".shuffle.json"],
                   check=False)
    sys.exit(0 if attempts[-1]["decision"] == "accept" else 1)


if __name__ == "__main__":
    main()
