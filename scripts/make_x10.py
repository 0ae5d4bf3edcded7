#!/usr/bin/env python3
"""Build the x10 scale replica — the third local gate (see the verify
skill): each sf0.1 table unioned 10x, with every key column shifted by
replica_index * (referenced domain max + 1) so each replica is a
DISJOINT but internally join-consistent sub-database, and CONTENT made
genuinely 10x (the r11 lesson: exact content duplication makes
similarity buckets quadratic in copy count and under-costs text ops):

  - documents.text: per-replica Caesar rotation of letters (replica i
    rotates a-z/A-Z by i) — length-preserving, textually disjoint, so
    the vocab/shingle space really is 10x;
  - embeddings.embedding: deterministic per-replica geometric
    perturbation (scale by 1 + 0.003*i, plus a tiny per-dimension,
    per-replica offset) — every vector distinct, same within-replica
    cosine structure.

Timestamps keep their base values (replicas share the time window:
windows/seasonality stay dense, which is the harsher direction for
window operators).

Usage: python3 scripts/make_x10.py [src_dir] [dst_dir] [n]
       (defaults: /root/testdata/sf0.1 /tmp/graft_scale_x10 10)
"""
import os, sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_scale_x10"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key column -> the table whose primary-key domain its shift follows
# (a foreign key shifts by the REFERENCED domain so joins stay
# consistent inside each replica)
DOMAIN = {
    "r_regionkey": ("region", "r_regionkey"),
    "n_nationkey": ("nation", "n_nationkey"),
    "n_regionkey": ("region", "r_regionkey"),
    "c_custkey": ("customer", "c_custkey"),
    "c_nationkey": ("nation", "n_nationkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "s_nationkey": ("nation", "n_nationkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ROT = ("abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ")


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    span = {}  # (table, col) -> max + 1
    for t in TABLES:
        cols = con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        for c, _ty, *_ in cols:
            key = DOMAIN.get(c)
            if key and key == (t, c):
                span[(t, c)] = con.sql(
                    f"SELECT MAX({c}) + 1 FROM '{SRC}/{t}.parquet'"
                ).fetchone()[0]
    for t in TABLES:
        cols = con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        pieces = []
        for i in range(N):
            sel = []
            for c, ty, *_ in cols:
                if c in DOMAIN:
                    dt, dc = DOMAIN[c]
                    sel.append(
                        f"CAST({c} + {i} * {span[(dt, dc)]} AS {ty}) AS {c}")
                elif t == "documents" and c == "text":
                    lo = ROT[0][i % 26:] + ROT[0][:i % 26]
                    hi = ROT[1][i % 26:] + ROT[1][:i % 26]
                    sel.append(
                        f"translate(text, '{ROT[0]}{ROT[1]}', "
                        f"'{lo}{hi}') AS text")
                elif t == "embeddings" and c == "embedding":
                    sel.append(
                        "CAST(list_transform(embedding, x -> "
                        f"x * (1.0 + 0.003 * {i}) + 0.0001 * {i}) "
                        f"AS FLOAT[]) AS embedding")
                else:
                    sel.append(c)
            pieces.append(
                f"SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet'")
        q = " UNION ALL ".join(pieces)
        con.sql(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
