#!/usr/bin/env python3
"""Skew-bench comparison (r13 verdict #4): same-host, same-tree bench runs
over the UNIFORM sf0.1 world and the SKEW world generated from it
(`skew_world.py /tmp/graft_skew01 /root/testdata/sf0.1` — one user with
~99% of events, one hot day/customer/part/supplier, boilerplate prefix on
a third of docs, half of all vectors identical). Row counts are IDENTICAL
by construction, so any wall-clock ratio is pure key-distribution effect:
a query whose skew/uniform ratio blows up is where an unsalted
groupBy/window or a non-AQE join stalls on one task at 100x.

Usage: skew_bench.py <bench_full_uniform.json> <bench_full_skew.json>
       [out.json]

Writes bench_skew.json and prints the >= 2x rows (RunOne-confirm each
against the skew dir before believing it — the streaming-drain jitter
rule applies here too).
"""
import json
import sys


def main() -> int:
    uni = json.load(open(sys.argv[1]))
    skw = json.load(open(sys.argv[2]))
    out_path = sys.argv[3] if len(sys.argv) > 3 else "bench_skew.json"
    qs = sorted(set(uni["queries"]) & set(skw["queries"]))
    rows = {}
    flagged = []
    for q in qs:
        a, b = uni["queries"][q], skw["queries"][q]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        rows[q] = {"uniform_sec": round(a, 3), "skew_sec": round(b, 3),
                   "ratio": round(ratio, 2)}
        # the r12 confirm rule, skew edition: any >=2x, plus >=1.3x where
        # either side is >=1.5 s
        if ratio >= 2.0 or (ratio >= 1.3 and max(a, b) >= 1.5):
            flagged.append(q)
    ratios = sorted(r["ratio"] for r in rows.values())
    summary = {
        "n_queries": len(rows),
        "median_ratio": ratios[len(ratios) // 2] if ratios else None,
        "max_ratio": ratios[-1] if ratios else None,
        "flagged": flagged,
        "queries": rows,
    }
    json.dump(summary, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"n={summary['n_queries']} median={summary['median_ratio']} "
          f"max={summary['max_ratio']}")
    for q in flagged:
        r = rows[q]
        print(f"FLAG {q}: uniform={r['uniform_sec']}s skew={r['skew_sec']}s "
              f"ratio={r['ratio']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
