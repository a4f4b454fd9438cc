#!/usr/bin/env python3
"""Empty-world gate companion: assert the set of queries that REFUSED on
the empty world equals exactly the documented contract list
(scripts/empty_refusals.txt). Any extra refusal is a new bug; any
disappearance means a contract changed and the list must be updated
deliberately.

Usage: check_empty_refusals.py <verify-outdir>   (after graft.Verify on
the empty world; run check.py separately for the parity half).

A missing output dir only means "refused" when the Verify run attempted
EVERY query: a run filtered with Verify's optional 3rd only-names arg (or
one that died mid-way) would report every unattempted query as a refusal.
Verify stamps the names it attempted into attempted.json; we require it to
equal the full registry before reading absences as refusals.
"""
import json
import os
import sys

out = sys.argv[1]
names = json.load(open(os.path.join(out, "queries.json")))
attempted_path = os.path.join(out, "attempted.json")
if not os.path.exists(attempted_path):
    sys.exit("no attempted.json in outdir — rerun graft.Verify (full, no "
             "only-names filter) with the current build")
attempted = json.load(open(attempted_path))
if sorted(attempted) != sorted(names):
    missing_run = sorted(set(names) - set(attempted))
    sys.exit(f"Verify did not attempt the full registry ({len(attempted)}/"
             f"{len(names)}; e.g. {missing_run[:5]}) — a filtered or "
             "interrupted run cannot distinguish 'refused' from 'not run'")
done = set(os.listdir(out))
missing = sorted(n for n in names if n not in done)
expected = sorted(
    l.strip() for l in open("scripts/empty_refusals.txt") if l.strip())
extra = sorted(set(missing) - set(expected))
gone = sorted(set(expected) - set(missing))
if extra:
    print(f"NEW refusals (bugs?): {extra}")
if gone:
    print(f"expected refusals now succeed (update the list): {gone}")
if extra or gone:
    sys.exit(1)
print(f"empty-world refusals: exactly the {len(expected)} documented contracts")
