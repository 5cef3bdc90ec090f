#!/usr/bin/env python3
"""Time the DuckDB oracle itself over the declared corpus (dev tool
backing BASELINE.md's engine-vs-oracle comparison — the engine bench is
graft.Bench; this is the other side of that ledger).

Usage: python3 tools/oracle_bench.py <sfdir> <verify_out_dir> [reps]

Reads oracle_sql.json from a `graft.Verify` dump (so the timed texts are
exactly the hash-checked ones), runs each query `reps` times in DuckDB
over the parquet tables in <sfdir>, and prints per-query medians + the
total. DuckDB gets all cores (threads defaults to the host), matching
the engine's local[32].
"""
import sys, os, json, statistics, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sfdir, outdir, reps=3):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    meds = {}
    for name in sorted(oracle):
        times = []
        for _ in range(reps):
            t0 = time.time()
            con.sql(oracle[name]).fetchall()
            times.append(time.time() - t0)
        meds[name] = statistics.median(times)
        print(f"{name}: {meds[name]:.3f} s (runs: {', '.join(f'{x:.3f}' for x in times)})")
    total = sum(meds.values())
    print(f"\nTOTAL (sum of per-query medians, {len(meds)} oracle queries): {total:.1f} s")
    for name, m in sorted(meds.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  top: {name} {m:.2f} s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
