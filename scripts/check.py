#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate — strict variant.

Round-1 lesson (ADVICE.md): reading the Spark parquet *through DuckDB*
normalizes away representation differences (DECIMAL(38,10) vs DOUBLE)
that the driver's raw-value hash detects, so the old local PASS did not
imply a driver PASS. This version is strictly stronger than the driver:

  - the Spark result is read with pyarrow, preserving physical types
    (Decimal stays Decimal, float stays float64);
  - value compare is on (type-name, canonical rendering): floats match
    only on identical IEEE-754 bits, Decimals only on identical digits
    and scale, so any representation skew fails locally first.

Usage:  python3 scripts/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import glob, json, math, struct, sys
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """(type-tag, canonical value) — equal iff the driver's raw-value
    hash would agree. Floats compare by exact bit pattern."""
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f64", "NaN")
        return ("f64", struct.pack("<d", v).hex())
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, (list, tuple)):
        return ("list", tuple(canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, canon(x)) for k, x in v.items())))
    if hasattr(v, "isoformat"):  # datetime / date / pandas.Timestamp —
        # pyarrow hands back pandas.Timestamp for ns-unit columns; same
        # instant renders identically, so compare on the rendering.
        return ("ts", str(v))
    return (type(v).__name__, str(v))


def type_family(t):
    """Collapse an arrow type to the equivalence class the driver's
    raw-value hash distinguishes. Integer width doesn't change a
    Python int, so all ints collapse; but DuckDB types an uncast
    integer SUM as HUGEINT, which arrow exports as decimal128(38,0) —
    a DIFFERENT family than Spark's int64, caught here even when the
    result has zero rows (round-4 lesson: the plain DuckDB client
    erases HUGEINT back to `int`, hiding exactly this skew)."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return f"decimal(s{t.scale})"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_family(t.value_type)}>"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    return str(t)


def table_rows(tbl):
    cols = tbl.column_names
    fams = {f.name: type_family(f.type) for f in tbl.schema}
    rows = [tuple(d.values()) for d in tbl.to_pylist()]
    return cols, fams, rows


def spark_rows(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        raise RuntimeError(f"no parquet under {outdir}/{name}")
    tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(files)
    return table_rows(tbl)


def main(outdir, sfdir, only=None):
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        # driver testdata is one file per table; ScaleGen replicas are
        # Spark-written DIRECTORIES of part files — glob those
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:  # optional comma-separated subset, for chunked/targeted runs
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            scols, sfams, srows = spark_rows(outdir, name)
            # fetch through arrow: DuckDB HUGEINT/DECIMAL keep their
            # physical type (the plain client would hand back `int`)
            dcols, dfams, drows = table_rows(con.execute(sql).arrow())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        ok = True
        fam_skew = {c: (sfams[c], dfams[c]) for c in sfams
                    if c in dfams and sfams[c] != dfams[c]}
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif fam_skew:
            print(f"FAIL {name}: type skew {fam_skew} (spark, duck)")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            sidx = [scols.index(c) for c in sorted(scols)]
            didx = [dcols.index(c) for c in sorted(dcols)]
            for i, (sr, dr) in enumerate(zip(srows, drows)):
                sv = tuple(canon(sr[j]) for j in sidx)
                dv = tuple(canon(dr[j]) for j in didx)
                if sv != dv:
                    print(f"FAIL {name}: row {i} differs (cols {sorted(scols)})"
                          f"\n  spark={sv}\n  duck ={dv}")
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
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
