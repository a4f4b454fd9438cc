#!/usr/bin/env python3
"""EMPTY-world generator (round 13, fourth gate axis): every table keeps
its exact schema but ZERO rows. A 100 TB deployment meets this constantly
— a fresh topic, an empty replay window, a partition with no data — and
every query must either return its oracle's empty/NULL-row result or
refuse with a CLEAR contract error (index training on an empty corpus),
never an accidental None.get / VOID-literal analysis crash.

Gate contract (DEGEN_GATE.md "Empty-world" section): queries are green if
Spark ≡ DuckDB on the empty tables; index-training queries REFUSE with
`requirement failed: ... non-empty` messages and are enumerated in the
gate doc — a refusal message that names the contract is a pass, an
accidental exception is a bug.

Usage:  python3 scripts/empty_world.py [outdir]   (default /tmp/graft_empty)
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.001"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_empty"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet' LIMIT 0) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: 0 rows")
    print(f"empty world written to {OUT}")


if __name__ == "__main__":
    main()
