"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query at sf0.001; each `queries()[name]`
runs at sf0.01 and is hash-compared against `oracle_sql()[name]` via DuckDB.

Cross-engine conventions (see kdb_spark/tables.py):
- event timestamps are compared at µs epoch: Spark normalizes `ts` to a
  `ts_us` long via tables.ts_us_expr (dtype-dispatched: ns-long or
  timestamp[us] input), matching DuckDB's `epoch_us(ts)`;
- money sums are bigint cents (per-row round(x*100) is bit-deterministic in
  both engines; bigint sums are order-independent, double sums are not);
- averages/cosines are ROUND()ed identically on both sides;
- computed integers are cast to BIGINT on both sides (DuckDB SUM(BIGINT)
  would otherwise surface as HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kdb_spark.analytics import aggregations as agg
from kdb_spark.oracles import REG_ORDER, build_registry
from kdb_spark.tables import events_us

# The 327-key registry lives in kdb_spark/oracles/ (r14 split): one module
# per family, merged in the frozen REG_ORDER so the driver-visible
# registration order is bit-identical to the pre-split monolith.
_Q, _ORACLE = build_registry()
assert list(_Q) == REG_ORDER


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-event-type hourly resample (count/sum/avg/min/max) —
    the rollup the reference's dense slot grid exists to feed."""
    return agg.agg_resample(events_us(spark, "/root/testdata/sf0.001"))


def _driver_check_history() -> dict[str, int]:
    """Last round each key received a PASSING driver CORRECTNESS row, read
    from the committed CORRECTNESS_r*.json artifacts next to this file
    (never-checked keys are absent and sort as round 0). A FAILED row does
    not count as checked — a key that regresses must stay in (or fall back
    into) the check window next round, not age out of it for
    ceil(N/50) rounds. Unreadable files are skipped."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for key, row in rows.items():
            ok = isinstance(row, dict) and not row.get("err") and all(
                row.get(f, True) for f in ("rows_match", "schema_match", "hash_match")
            )
            if ok:
                last[key] = max(last.get(key, 0), rnd)
    return last


_ROTATION_SNAPSHOT: list[str] | None = None


def _rotated(names: list[str]) -> list[str]:
    """ROTATION POLICY (round 7+): the driver's correctness gate covers the
    first 50 registered keys, so the registry is returned ordered by the
    round of each key's most recent driver CORRECTNESS row — never-checked
    keys first, then stalest — with ties broken by registration order
    (stable sort). Freshly-checked keys rotate to the back automatically
    when the driver commits the round's CORRECTNESS file, so every key
    receives a hard driver row within ceil(len(registry)/50) rounds and no
    family can park outside the check window. The order is computed ONCE
    per process and snapshotted: queries() and oracle_sql() must walk in
    lockstep even if a new CORRECTNESS file lands between the two calls."""
    global _ROTATION_SNAPSHOT
    if _ROTATION_SNAPSHOT is None or set(_ROTATION_SNAPSHOT) != set(names):
        last = _driver_check_history()
        _ROTATION_SNAPSHOT = sorted(names, key=lambda k: last.get(k, 0))
    return _ROTATION_SNAPSHOT


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _Q[k] for k in _rotated(list(_Q))}


def oracle_sql() -> dict[str, str]:
    return {k: _ORACLE[k] for k in _rotated(list(_Q)) if k in _ORACLE}


def registration_order() -> list[str]:
    """Stable registration-order key list for the BENCH harness. Per-key
    cold timings must be comparable ACROSS rounds, but the driver-rotation
    order (stalest-first) reshuffles which keys sit at the session head
    each round, and head keys absorb residual startup cost despite the
    warmup blocks (r13 flip audit: the only two-consecutive >2× cold
    flips were bench positions 1 and 4 with untouched code and clean warm
    ratios). bench.py therefore times keys in this fixed order; the
    driver contract — queries()/oracle_sql() rotation — is unchanged."""
    return list(_Q)

