"""Round-start schema drift detector.

The driver regenerates /root/testdata between rounds and its dtypes have
drifted before (round 4: events.ts changed TIMESTAMP(NANOS) -> timestamp[us]
and silently broke 35 queries for a full round). This probe pyarrow-reads
every table schema at every scale factor and diffs it against the committed
snapshot (SCHEMAS.json at the repo root).

Usage:
    python tools/schema_probe.py            # diff against snapshot; exit 1 on drift
    python tools/schema_probe.py --update   # rewrite the snapshot from disk

Run it FIRST THING each round (see README). On drift: fix the dtype dispatch
in kdb_spark/tables.py (ts_us_expr already handles ns-long vs timestamp[us]),
then --update and commit the new snapshot with the fix.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(ROOT, "SCHEMAS.json")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SFS = ("sf0.001", "sf0.01", "sf0.1")


def read_schemas() -> dict[str, dict[str, list[list[str]]]]:
    out: dict[str, dict[str, list[list[str]]]] = {}
    for sf in SFS:
        d = os.path.join(TESTDATA, sf)
        if not os.path.isdir(d):
            continue
        out[sf] = {}
        for p in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            s = pq.read_schema(p)
            out[sf][os.path.basename(p)] = [[f.name, str(f.type)] for f in s]
    return out


def main() -> int:
    got = read_schemas()
    if "--update" in sys.argv:
        with open(SNAPSHOT, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"snapshot written: {SNAPSHOT}")
        return 0
    if not os.path.exists(SNAPSHOT):
        print(f"no snapshot at {SNAPSHOT}; run with --update first", file=sys.stderr)
        return 2
    want = json.load(open(SNAPSHOT))
    drift = []
    for sf in sorted(set(want) | set(got)):
        w, g = want.get(sf, {}), got.get(sf, {})
        for t in sorted(set(w) | set(g)):
            if w.get(t) != g.get(t):
                drift.append((sf, t, w.get(t), g.get(t)))
    if not drift:
        print(f"schema probe: OK ({sum(len(v) for v in got.values())} tables match)")
        return 0
    print("SCHEMA DRIFT DETECTED — fix kdb_spark/tables.py dispatch, then --update:")
    for sf, t, w, g in drift:
        print(f"  {sf}/{t}:")
        print(f"    snapshot: {w}")
        print(f"    on disk : {g}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
