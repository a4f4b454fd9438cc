#!/usr/bin/env python3
"""SKEW-but-LEGAL world generator (round-12 VERDICT #4, the sibling of
degen_world.py): transforms sf0.001 into the pathological-but-legal SKEW
corner — one user holding ~99% of events, one hot order day / customer /
part / supplier / brand / nation, a boilerplate prefix shared by a third
of all documents (one gram in ~99% of docs), and half of all embedding
vectors exactly equal — while keeping every schema, key column, row count
and FK relationship intact, so the FULL Verify + check.py gate runs
against it unchanged.

The degenerate world proves clamp/empty-input behavior; THIS world proves
the cap/bucket machinery (d-family pair caps, LSH band caps, boilerplate
exclusion, AQE skew handling, salting) never goes quadratic or wrong when
one key dominates — every `groupBy(key)` the degen world collapses to a
single group anyway gets a real hot-vs-tail distribution here.

Usage:  python3 scripts/skew_world.py [outdir] [srcdir]
        (defaults /tmp/graft_skew, /root/testdata/sf0.001; pass
        /root/testdata/sf0.1 as srcdir for the SKEW BENCH world — same
        transforms at bench scale, r13 verdict #4)
Then:   sbt "runMain graft.Verify <outdir> /tmp/out_skew"
        python3 scripts/check.py <outdir> /tmp/out_skew
"""
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_skew"
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

# the one hot calendar day ~99% of orders land on (legal mid-range date)
HOT_DAY = "TIMESTAMP '1996-03-11 00:00:00'"

TRANSFORMS = {
    # dimension tables: keep verbatim (tiny, already minimal)
    "region": "SELECT * FROM __SRC__",
    "nation": "SELECT * FROM __SRC__",
    # ~99% of customers in one nation + one segment; balances untouched
    "customer": """SELECT c_custkey, c_name,
        CASE WHEN c_custkey % 100 = 0 THEN c_nationkey ELSE 0 END AS c_nationkey,
        c_acctbal,
        CASE WHEN c_custkey % 100 = 0 THEN c_mktsegment ELSE 'BUILDING' END AS c_mktsegment
        FROM __SRC__""",
    # ~99% of suppliers in one nation
    "supplier": """SELECT s_suppkey, s_name,
        CASE WHEN s_suppkey % 100 = 0 THEN s_nationkey ELSE 0 END AS s_nationkey,
        s_acctbal FROM __SRC__""",
    # one hot brand/type on ~99% of parts; prices untouched
    "part": """SELECT p_partkey, p_name,
        CASE WHEN p_partkey % 100 = 0 THEN p_brand ELSE 'Brand#11' END AS p_brand,
        CASE WHEN p_partkey % 100 = 0 THEN p_type ELSE 'HOT TYPE' END AS p_type,
        p_size, p_retailprice FROM __SRC__""",
    # ~99% of orders from ONE customer on ONE day; totals/status untouched
    # (the hot custkey is a REAL key — min(o_custkey) — so the orders⋈customer
    # FK stays intact and the join gets a genuinely hot probe key)
    "orders": f"""SELECT o_orderkey,
        CASE WHEN o_orderkey % 100 = 0 THEN o_custkey
             ELSE (SELECT MIN(o_custkey) FROM __SRC__) END AS o_custkey,
        o_orderstatus, o_totalprice,
        CASE WHEN o_orderkey % 100 = 0 THEN o_orderdate ELSE {HOT_DAY} END AS o_orderdate,
        o_orderpriority FROM __SRC__""",
    # ~99% of lineitems naming ONE part and ONE supplier (min keys — FKs
    # intact); quantities/prices/dates untouched so aggregates stay varied
    "lineitem": """SELECT l_orderkey,
        CASE WHEN l_orderkey % 100 = 0 THEN l_partkey
             ELSE (SELECT MIN(l_partkey) FROM __SRC__) END AS l_partkey,
        CASE WHEN l_orderkey % 100 = 0 THEN l_suppkey
             ELSE (SELECT MIN(l_suppkey) FROM __SRC__) END AS l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount,
        l_tax, l_returnflag, l_linestatus, l_shipdate FROM __SRC__""",
    # ONE user holds ~99% of events; timestamps/types/values untouched
    # (event_id stays unique — order-sensitive folds tie-break on it)
    "events": """SELECT event_id, ts,
        CASE WHEN event_id % 100 = 0 THEN user_id ELSE CAST(42 AS BIGINT) END AS user_id,
        event_type, value, props FROM __SRC__""",
    # a third of all docs share a LONG boilerplate prefix (huge near-dup
    # cluster + grams with df ≈ 33–99%); every doc still carries one hot
    # token (df ~100%); n_chars recomputed so the schema contract holds
    "documents": """SELECT doc_id,
        CASE WHEN doc_id % 3 = 0
             THEN 'hotgram the shared boilerplate header every third document repeats verbatim before its own words ' || text
             ELSE 'hotgram ' || text END AS text,
        lang, source,
        CAST(LENGTH(CASE WHEN doc_id % 3 = 0
             THEN 'hotgram the shared boilerplate header every third document repeats verbatim before its own words ' || text
             ELSE 'hotgram ' || text END) AS BIGINT) AS n_chars FROM __SRC__""",
    # HALF of all vectors exactly equal (one all-ones hot point): ANN/LSH
    # buckets, cosine ties and centroid elections all get a mass point;
    # labels skew 99% to one class
    "embeddings": """SELECT vec_id,
        CASE WHEN vec_id % 2 = 0
             THEN CAST([1.0 for i in range(len(embedding))] AS FLOAT[])
             ELSE embedding END AS embedding,
        CASE WHEN vec_id % 100 = 0 THEN label ELSE 0 END AS label FROM __SRC__""",
}


def main() -> None:
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for table, sql in TRANSFORMS.items():
        q = sql.replace("__SRC__", f"'{SRC}/{table}.parquet'")
        con.execute(f"COPY ({q}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")
    print(f"skew world written to {OUT}")


if __name__ == "__main__":
    main()
