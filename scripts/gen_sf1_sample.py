#!/usr/bin/env python
"""Synthesize an sf1.0-scale table dir for the heavy-query spot sweep.

/root/testdata is read-only and driver-generated up to sf0.1, so the
10x tier is built here by id-offset replication of the sf0.1 tables:
each replica k shifts every key column by k * (max_key + 1), which
preserves referential integrity (orders<->lineitem, embeddings) and
keeps every doc_id-derived fixture construction valid — both engines
compute from the same parquet, so any id population is a legitimate
certification input (VERDICT r4 task 8: the 10x net has caught real
divergences twice). Payloads that drive similarity/dedup operators are
PERTURBED per replica (k-dependent letter translation for text,
k-position component rotation for embeddings): verbatim copies would
make every doc a member of a 10-wide exact-dup cluster, which
quadratically explodes LSH candidate volume into something no real 10x
corpus exhibits, while the perturbations keep the base corpus's
designed duplicate structure intact within each replica.

Usage: python scripts/gen_sf1_sample.py [out_dir] [replicas]
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1_sample"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows", flush=True)

    # dimension tables pass through unchanged (they are dimension-sized
    # at any corpus scale; fact keys referencing them stay valid)
    for t in ("region", "nation", "customer", "supplier", "part"):
        write(t, f"SELECT * FROM {src(t)}")

    rep = f"(SELECT unnest(range({reps})) AS k)"

    n_docs = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM {src('documents')}"
    ).fetchone()[0]
    # k-dependent letter translation: shingle sets diverge across
    # replicas (no cross-replica near-dup explosion), lengths and word
    # structure preserved, replica 0 verbatim
    base, cyc = "etaoins", "etaoinsetaoins"
    write(
        "documents",
        f"SELECT doc_id + k * {n_docs} AS doc_id,"
        f" CASE WHEN k = 0 THEN text ELSE"
        f" translate(text, '{base}', substr('{cyc}', CAST(k AS INT) % 7 + 1,"
        f" 7)) END AS text,"
        f" lang, source, n_chars FROM {src('documents')}, {rep}",
    )

    n_vec = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM {src('embeddings')}"
    ).fetchone()[0]
    # k-position rotation: preserves the norm and the value population
    # but decorrelates replica directions, so ANN/LSH bucket loads stay
    # realistic instead of 10-deep verbatim collisions
    write(
        "embeddings",
        f"SELECT vec_id + k * {n_vec} AS vec_id,"
        f" CAST(list_concat(embedding[(CAST(k AS INT) + 1):],"
        f" embedding[1:CAST(k AS INT)]) AS FLOAT[]) AS embedding, label"
        f" FROM {src('embeddings')}, {rep}",
    )

    n_ord = con.execute(
        f"SELECT MAX(o_orderkey) + 1 FROM {src('orders')}"
    ).fetchone()[0]
    write(
        "orders",
        f"SELECT o_orderkey + k * {n_ord} AS o_orderkey, o_custkey,"
        f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        f" FROM {src('orders')}, {rep}",
    )
    write(
        "lineitem",
        f"SELECT l_orderkey + k * {n_ord} AS l_orderkey, l_partkey,"
        f" l_suppkey, l_linenumber, l_quantity, l_extendedprice,"
        f" l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
        f" FROM {src('lineitem')}, {rep}",
    )

    n_ev = con.execute(
        f"SELECT MAX(event_id) + 1 FROM {src('events')}"
    ).fetchone()[0]
    write(
        "events",
        f"SELECT event_id + k * {n_ev} AS event_id, ts,"
        f" user_id + k * 100000 AS user_id, event_type, value, props"
        f" FROM {src('events')}, {rep}",
    )


if __name__ == "__main__":
    main()
