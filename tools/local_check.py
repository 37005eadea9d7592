#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate: run after
`graft.Verify <sfDir> <outDir>` to compare each Spark result parquet against
its DuckDB oracle SQL (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/local_check.py [sfDir] [outDir] [only_prefix]
"""
import duckdb, json, sys, glob

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
only = sys.argv[3] if len(sys.argv) > 3 else ""

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, fail = [], []
for name in sorted(oracle):
    if only and not name.startswith(only):
        continue
    sql = oracle[name]
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail.append(name); continue
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
    except Exception as e:
        print(f"FAIL {name}: read spark output: {e}"); fail.append(name); continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fail.append(name); continue
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    if list(sdf.columns) != list(odf.columns):
        print(f"FAIL {name}: schema spark={list(sdf.columns)} oracle={list(odf.columns)}")
        fail.append(name); continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
        fail.append(name); continue

    def norm(df):
        d = df.copy()
        for c in d.columns:
            d[c] = d[c].map(lambda v: repr(v.tolist()) if hasattr(v, "tolist") else repr(v))
        return d.sort_values(list(d.columns), kind="mergesort").reset_index(drop=True)

    ns, no = norm(sdf), norm(odf)
    if ns.equals(no):
        print(f"ok   {name} ({len(sdf)} rows)"); ok.append(name)
    else:
        diff = (ns != no)
        bad = diff.any(axis=1)
        print(f"FAIL {name}: value mismatch in {int(bad.sum())}/{len(ns)} rows; first:")
        idx = ns.index[bad][:3]
        for i in idx:
            for c in ns.columns:
                if ns.at[i, c] != no.at[i, c]:
                    print(f"   row{i} {c}: spark={ns.at[i, c]} oracle={no.at[i, c]}")
        fail.append(name)

print(f"\n{len(ok)} ok, {len(fail)} FAIL" + (f": {fail}" if fail else ""))
sys.exit(1 if fail else 0)
