#!/usr/bin/env python3
"""Empty-world gate companion: assert the set of queries that REFUSED on
the empty world equals exactly the documented contract list
(scripts/empty_refusals.txt). Any extra refusal is a new bug; any
disappearance means a contract changed and the list must be updated
deliberately.

Usage: check_empty_refusals.py <verify-outdir>   (after graft.Verify on
the empty world; run check.py separately for the parity half).
"""
import json
import os
import sys

out = sys.argv[1]
names = json.load(open(os.path.join(out, "queries.json")))
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
