#!/usr/bin/env python3
"""Scale-factor growth check: compare two bench_full.json runs (sf0.01 vs
sf0.1 — 10x the data) and emit bench_scaling.json with per-query ratios.

A query whose time grows >> 10x on 10x data hides a super-linear shape the
flat sf0.1 numbers can't expose. Sub-second queries are dominated by fixed
scheduler/JIT overhead, so their ratios sit well BELOW 10x; the signal is a
LARGE ratio, especially from a non-trivial base.

Usage: scaling.py <bench_full_sf0.01.json> <bench_full_sf0.1.json> [out.json]
"""
import json
import sys


def main() -> int:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    out_path = sys.argv[3] if len(sys.argv) > 3 else "bench_scaling.json"
    qs = sorted(set(small["queries"]) & set(big["queries"]))
    rows = {}
    suspects = []
    for q in qs:
        a, b = small["queries"][q], big["queries"][q]
        if a <= 0 or b <= 0:  # failed query sentinel
            continue
        ratio = b / a
        rows[q] = {"sf001_sec": round(a, 3), "sf01_sec": round(b, 3),
                   "ratio": round(ratio, 2)}
        # data grows 10x; flag clearly super-linear growth from a
        # non-noise base (>0.2 s at sf0.01)
        if ratio > 15 and a > 0.2:
            suspects.append(q)
    ratios = sorted(r["ratio"] for r in rows.values())
    summary = {
        "n_queries": len(rows),
        "median_ratio": ratios[len(ratios) // 2] if ratios else None,
        "max_ratio": ratios[-1] if ratios else None,
        "data_growth": 10.0,
        "superlinear_suspects": suspects,
        "queries": rows,
    }
    json.dump(summary, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"{len(rows)} queries, median ratio {summary['median_ratio']}, "
          f"max {summary['max_ratio']}, suspects: {suspects or 'none'}")
    top = sorted(rows.items(), key=lambda kv: -kv[1]["ratio"])[:10]
    for q, r in top:
        print(f"  {q:34s} {r['sf001_sec']:7.3f} -> {r['sf01_sec']:7.3f}  x{r['ratio']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
