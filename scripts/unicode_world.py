#!/usr/bin/env python3
"""UNICODE-but-LEGAL world generator (round 13, the third gate axis after
degen_world.py and skew_world.py): transforms sf0.001 so every document
carries real multilingual text — combining accents, CJK, RTL scripts,
supplementary-plane emoji (surrogate pairs in UTF-16 engines, 4-byte
sequences in UTF-8), and mixed-script tokens — while keeping schemas, key
columns, row counts and FK relationships intact.

What this gate is for: every text operator in the engine (tokenizers,
n-gram hashers, BPE symbol strings, winnowing, md5 60-bit prefixes, byte
vs code-point lengths, UTF-8 vs UTF-16 sort order) must agree with the
DuckDB oracle on NON-ASCII input, because a 100 TB training corpus is
multilingual by construction. Any char-vs-byte or code-unit-vs-code-point
divergence between Spark's UTF8String semantics and DuckDB's VARCHAR
semantics fails HERE instead of on production data.

Only documents.text (and its derived n_chars) changes — the TPC-H tables
and events are ASCII-keyed surfaces; the text pipeline is the one that
meets unicode.

Usage:  python3 scripts/unicode_world.py [outdir]   (default /tmp/graft_uni)
Then:   sbt "runMain graft.Verify <outdir> /tmp/out_uni"
        python3 scripts/check.py <outdir> /tmp/out_uni
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.001"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_uni"

# injected multilingual fragments — deterministic per doc_id % 8.
# NFC composed é (doc%8=1) AND decomposed e+U+0301 (doc%8=2) both appear,
# so normalization-sensitive code paths face both forms; 🚀 is
# supplementary-plane (one code point, 4 UTF-8 bytes, 2 UTF-16 units).
FRAGS = [
    "",  # 0: untouched ASCII
    "caf\u00e9 na\u00efve r\u00e9sum\u00e9",  # 1: NFC composed latin accents
    "cafe\u0301 deja\u0300 vu",  # 2: DECOMPOSED combining marks
    "\u6771\u4eac \u30c7\u30fc\u30bf \u5206\u6790",  # 3: CJK + katakana
    "\u0645\u0631\u062d\u0628\u0627 \u0634\u0643\u0631\u0627",  # 4: arabic RTL
    "\U0001f680 \U0001f916 \u2728",  # 5: emoji incl. supplementary plane
    "\u00dcber stra\u00dfe gr\u00f6\u00dfe",  # 6: sharp-s / umlauts
    "\u0916\u094b\u091c \u0939\u093f\u0902\u0926\u0940",  # 7: devanagari
]

CASE = "CASE doc_id % 8 " + " ".join(
    f"WHEN {i} THEN text || ' ' || '{f}'" for i, f in enumerate(FRAGS) if i > 0
) + " ELSE text END"

TRANSFORMS = {
    "region": "SELECT * FROM __SRC__",
    "nation": "SELECT * FROM __SRC__",
    "customer": "SELECT * FROM __SRC__",
    "supplier": "SELECT * FROM __SRC__",
    "part": "SELECT * FROM __SRC__",
    "orders": "SELECT * FROM __SRC__",
    "lineitem": "SELECT * FROM __SRC__",
    "events": "SELECT * FROM __SRC__",
    "embeddings": "SELECT * FROM __SRC__",
    # every 8th doc keeps pure ASCII (the control stratum); n_chars stays
    # the CODE-POINT length contract
    "documents": f"""SELECT doc_id, {CASE} AS text, lang, source,
        CAST(LENGTH({CASE}) AS BIGINT) AS n_chars FROM __SRC__""",
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
    print(f"unicode world written to {OUT}")


if __name__ == "__main__":
    main()
