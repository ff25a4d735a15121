#!/usr/bin/env python
"""Per-key bench-vs-baseline flip audit.

Parses every `| `key` | cold | warm |`-shaped row in BASELINE.md in file
order (LATER rows supersede earlier ones — that is the re-record
protocol) and compares a bench_full.json-style {"queries": {key: sec}}
run against the cold column. Prints keys over --threshold (default 2.0)
and the summed ratio. Replaces the hand audit done every round.

Usage: python tools/flip_audit.py [bench_full.json ...] [--threshold 2.0]
With two+ run files, a key is flagged only if it breaches in ALL of
them (the noise-robust cut from the r13 verdict).
"""

from __future__ import annotations

import argparse
import json
import re


def baselines(path: str = "BASELINE.md") -> dict[str, float]:
    base: dict[str, float] = {}
    pat = re.compile(r"^\| `([a-z0-9_]+)` \| ([0-9.]+) \|(?: ([0-9.]+) \|)?")
    for line in open(path):
        m = pat.match(line)
        if m:
            base[m.group(1)] = float(m.group(2))
    return base


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="bench_full.json files")
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args()

    base = baselines()
    runs = []
    for p in args.runs:
        with open(p) as fh:
            d = json.load(fh)
        runs.append(d.get("queries", d))

    common = set(base)
    for r in runs:
        common &= set(r)
    flips = []
    for k in sorted(common):
        ratios = [r[k] / base[k] for r in runs]
        if all(x > args.threshold for x in ratios):
            flips.append((max(ratios), k, base[k], [round(r[k], 3) for r in runs]))
    tot = [sum(r[k] for k in common) for r in runs]
    tb = sum(base[k] for k in common)
    print(f"{len(common)} keys with baselines; summed ratios: "
          + ", ".join(f"{t / tb:.3f}x" for t in tot))
    missing = [k for k in runs[0] if k not in base]
    if missing:
        print(f"no baseline row (new keys?): {missing}")
    if not flips:
        print(f"no key > {args.threshold}x in all {len(runs)} run(s)")
        return 0
    print(f"keys > {args.threshold}x baseline in ALL run(s):")
    for mx, k, b, vals in sorted(flips, reverse=True):
        print(f"  {k:28s} base {b:7.3f}  runs {vals}  max {mx:.2f}x")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
