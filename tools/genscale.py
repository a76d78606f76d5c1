#!/usr/bin/env python3
"""Generate a 3x replicated-and-decorrelated scale slice from sf0.1.

Usage: python3 tools/genscale.py [src_dir] [dst_dir] [copies]

The driver's generators live driver-side, so the third scale-ramp point
is built by REPLICATION with coherent key offsets: every copy shifts all
foreign/primary keys by copy * 1e8, so joins stay internally consistent
per copy and group cardinalities on key-ish columns scale linearly —
the same shape a larger driver SF would have. Fixed dimensions
(region, nation) stay single-copy, as in TPC-H scaling.

Copies are DECORRELATED where replication would otherwise manufacture
similarity structure a real corpus would not have:
  - documents: each copy > 0 applies a bijective CHARACTER rotation
    (letters shifted by the copy index, spaces/punctuation fixed), so
    WITHIN-copy word-shingle AND char-shingle structure is preserved
    exactly (bijective maps preserve Jaccard) while cross-copy overlap
    collapses. An earlier word-SUFFIX transform was wrong in an
    instructive way: stamping "_cN" into every word injected the same
    char-grams into every copy-N document — manufactured boilerplate
    that blew char-gram LSH buckets quadratically (q58b 100 s at
    sf0.3).
  - embeddings: copy 1 negates the vector, copy 2 reverses it — both
    orthogonal transforms (within-copy inner products preserved), and
    cross-copy cosines land away from the near-dup regime.

This slice exists ONLY for wall-clock scale-ramp measurement
(tools/scaling.py 3-point fit); correctness gates run on driver data.
"""
import os
import sys

import duckdb

OFF = 100_000_000


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_scale/sf0.3"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    # only 3 distinct decorrelation transforms exist (identity / negate /
    # reverse for vectors; rotations repeat at 26 for text) — more copies
    # would manufacture exact cross-copy duplicates, the failure mode
    # this script exists to avoid
    assert 1 <= copies <= 3, "copies must be 1..3 (distinct transforms)"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    NFILES = 16

    def emit(table, select_for_copy, row_group=None):
        q = " UNION ALL ".join(
            select_for_copy(c, c * OFF) for c in range(copies))
        # MULTIPLE FILES per table, like the driver's generator: Spark
        # assigns scan tasks by file/byte ranges, so one 30 MB parquet
        # file is ONE task no matter how the data inside is row-grouped
        # — the sf0.3 documents table measured 8x slower purely from
        # that lost parallelism. 16 round-robin slices restore it.
        rg = f", ROW_GROUP_SIZE {row_group}" if row_group else ""
        con.execute(f"CREATE OR REPLACE TEMP TABLE _stage AS ({q})")
        tdir = f"{dst}/{table}.parquet"
        os.makedirs(tdir, exist_ok=True)
        for i in range(NFILES):
            con.execute(
                f"COPY (SELECT * FROM _stage WHERE rowid % {NFILES} = {i}) "
                f"TO '{tdir}/part_{i:02d}.parquet' (FORMAT PARQUET{rg})")
        n = con.execute(f"SELECT count(*) FROM '{tdir}/*.parquet'").fetchone()[0]
        print(f"{table}: {n} rows / {NFILES} files")

    # fixed dims: single copy
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                    f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: single copy")

    emit("customer", lambda c, off:
         f"SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey, "
         f"c_acctbal, c_mktsegment FROM '{src}/customer.parquet'", row_group=2048)
    emit("supplier", lambda c, off:
         f"SELECT s_suppkey + {off} AS s_suppkey, s_name, s_nationkey, "
         f"s_acctbal FROM '{src}/supplier.parquet'", row_group=512)
    emit("part", lambda c, off:
         f"SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, p_type, "
         f"p_size, p_retailprice FROM '{src}/part.parquet'", row_group=2048)
    emit("orders", lambda c, off:
         f"SELECT o_orderkey + {off} AS o_orderkey, o_custkey + {off} AS "
         f"o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
         f"o_orderpriority FROM '{src}/orders.parquet'", row_group=16384)
    emit("lineitem", lambda c, off:
         f"SELECT l_orderkey + {off} AS l_orderkey, l_partkey + {off} AS "
         f"l_partkey, l_suppkey + {off} AS l_suppkey, l_linenumber, "
         f"l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
         f"l_linestatus, l_shipdate FROM '{src}/lineitem.parquet'", row_group=65536)
    emit("events", lambda c, off:
         f"SELECT event_id + {off} AS event_id, ts, user_id + {off} AS "
         f"user_id, event_type, value, props FROM '{src}/events.parquet'", row_group=8192)

    def doc_select(c, off):
        if c == 0:
            return (f"SELECT doc_id, text, lang, source, n_chars "
                    f"FROM '{src}/documents.parquet'")
        lower = "abcdefghijklmnopqrstuvwxyz"
        upper = lower.upper()
        rl = lower[c:] + lower[:c]
        ru = upper[c:] + upper[:c]
        # bijective char rotation: length (n_chars) and every shingle
        # relation preserved within the copy, cross-copy overlap gone
        return (f"SELECT doc_id + {off} AS doc_id, "
                f"translate(text, '{lower}{upper}', '{rl}{ru}') AS text, "
                f"lang, source, n_chars "
                f"FROM '{src}/documents.parquet'")
    emit("documents", doc_select, row_group=512)

    def emb_select(c, off):
        if c == 0:
            return (f"SELECT vec_id, embedding, label "
                    f"FROM '{src}/embeddings.parquet'")
        tx = ("list_transform(embedding, x -> -x)" if c == 1
              else "list_reverse(embedding)")
        return (f"SELECT vec_id + {off} AS vec_id, "
                f"CAST({tx} AS FLOAT[]) AS embedding, label "
                f"FROM '{src}/embeddings.parquet'")
    emit("embeddings", emb_select, row_group=256)


if __name__ == "__main__":
    main()
