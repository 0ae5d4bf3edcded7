#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
sf parquet tables, loads the Spark result parquet from <outdir>/<name>/,
and compares row count, column names, and values (strict equality,
column-sorted like the driver). Usage:

    python3 scripts/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            scols = [d[0] for d in spark_rel.description]
            srows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            dcols = [d[0] for d in duck_rel.description]
            drows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            sidx = [scols.index(c) for c in sorted(scols)]
            didx = [dcols.index(c) for c in sorted(dcols)]
            for i, (sr, dr) in enumerate(zip(srows, drows)):
                sv = tuple(norm(sr[j]) for j in sidx)
                dv = tuple(norm(dr[j]) for j in didx)
                if sv != dv:
                    print(f"FAIL {name}: row {i} differs\n  spark={sv}\n  duck ={dv}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
