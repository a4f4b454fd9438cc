#!/usr/bin/env python3
"""Degenerate-but-LEGAL world generator (round-12 VERDICT #4): transforms
sf0.001 into the adversarial corner every clamp bug hides in — a single
user, a single instant, all-equal prices/values/balances/vectors, empty
strings and one-token documents — while keeping every schema, key column,
row count and FK relationship intact, so the FULL Verify + check.py gate
can run against it unchanged.

This converts the CLAUDE.md division-sweep discipline (per-site audit of
zero-able denominators: t25/d25/s38/q190 all shipped clamp bugs first)
from audit into a regression gate: any future query whose denominator,
window, recursion or tie-break silently assumes "many users / many days /
distinct values / non-empty text" fails HERE instead of on a production
corpus.

Usage:  python3 scripts/degen_world.py [outdir]     (default /tmp/graft_degen)
Then:   sbt "runMain graft.Verify <outdir> /tmp/out_degen"
        python3 scripts/check.py <outdir> /tmp/out_degen
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.001"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_degen"

# one legal mid-range instant for EVERY timestamp in the world
INSTANT = "TIMESTAMP '1997-06-15 12:00:00'"

TRANSFORMS = {
    # dimension tables: keep verbatim (tiny, already minimal)
    "region": "SELECT * FROM __SRC__",
    "nation": "SELECT * FROM __SRC__",
    # all-equal balances, one market segment, one nation
    "customer": """SELECT c_custkey, c_name, 0 AS c_nationkey,
        CAST(0.0 AS DOUBLE) AS c_acctbal, 'BUILDING' AS c_mktsegment FROM __SRC__""",
    "supplier": """SELECT s_suppkey, s_name, 0 AS s_nationkey,
        CAST(0.0 AS DOUBLE) AS s_acctbal FROM __SRC__""",
    # one brand/type/size, all-equal price
    "part": """SELECT p_partkey, p_name, 'Brand#00' AS p_brand,
        'TYPE' AS p_type, 1 AS p_size, CAST(100.0 AS DOUBLE) AS p_retailprice FROM __SRC__""",
    # single day, single status/priority, all-equal totals
    "orders": f"""SELECT o_orderkey, o_custkey, 'F' AS o_orderstatus,
        CAST(100.0 AS DOUBLE) AS o_totalprice, {INSTANT} AS o_orderdate,
        '1-URGENT' AS o_orderpriority FROM __SRC__""",
    # all-equal quantities/prices, zero discount/tax, one flag/status/day
    "lineitem": f"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        CAST(1.0 AS DOUBLE) AS l_quantity, CAST(100.0 AS DOUBLE) AS l_extendedprice, CAST(0.0 AS DOUBLE) AS l_discount,
        CAST(0.0 AS DOUBLE) AS l_tax, 'N' AS l_returnflag, 'O' AS l_linestatus,
        {INSTANT} AS l_shipdate FROM __SRC__""",
    # SINGLE user, SINGLE instant, all-equal value, constant props;
    # event_id stays unique (order-sensitive folds tie-break on it)
    "events": f"""SELECT event_id, {INSTANT} AS ts, CAST(7 AS BIGINT) AS user_id,
        event_type, CAST(1.0 AS DOUBLE) AS value, '{{"k": 0}}' AS props FROM __SRC__""",
    # one-token docs with a sprinkle of EMPTY strings; one lang, one source
    "documents": """SELECT doc_id,
        CASE WHEN doc_id % 5 = 0 THEN '' ELSE 'a' END AS text,
        'en' AS lang, 'src1' AS source,
        CASE WHEN doc_id % 5 = 0 THEN CAST(0 AS BIGINT) ELSE 1 END AS n_chars FROM __SRC__""",
    # all-equal (constant all-ones) vectors, one label: every cosine ties
    "embeddings": """SELECT vec_id,
        CAST([1.0 for i in range(len(embedding))] AS FLOAT[]) AS embedding,
        0 AS label FROM __SRC__""",
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
    print(f"degenerate world written to {OUT}")


if __name__ == "__main__":
    main()
