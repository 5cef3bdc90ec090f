#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfdir> <verify_out_dir>

Reads each <name>/ parquet dump written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same testdata
parquet, and compares: column names (sorted), row count, and cell
values (canonical string form, columns sorted by name, rows in result
order). Prints PASS/FAIL per query.
"""
import sys, os, json, glob, decimal, datetime
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return ""
    if isinstance(v, float):
        # repr roundtrip; driver likely similar. Flag floats loudly elsewhere.
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


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
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"SKIP {name}: no parquet dump")
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})")
        gcols, grows = got.columns, got.fetchall()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(grows)} rows, cols={gcols}")
            continue
        exp = con.sql(oracle[name])
        ecols, erows = exp.columns, exp.fetchall()
        ok = True
        msgs = []
        if sorted(gcols) != sorted(ecols):
            ok = False
            msgs.append(f"cols {sorted(gcols)} != {sorted(ecols)}")
        if len(grows) != len(erows):
            ok = False
            msgs.append(f"rowcount {len(grows)} != {len(erows)}")
        if ok:
            gidx = [gcols.index(c) for c in sorted(gcols)]
            eidx = [ecols.index(c) for c in sorted(ecols)]
            for i, (gr, er) in enumerate(zip(grows, erows)):
                gs = [canon(gr[j]) for j in gidx]
                es = [canon(er[j]) for j in eidx]
                if gs != es:
                    ok = False
                    msgs.append(f"row {i}: {gs} != {es}")
                    break
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(grows)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(msgs)}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
