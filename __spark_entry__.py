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
from pyspark.sql import functions as F

from kdb_spark.analytics import aggregations as agg
from kdb_spark.analytics import behavior as bh
from kdb_spark.analytics import joins as jn
from kdb_spark.analytics import kernel as kn
from kdb_spark.analytics import scalars as sc
from kdb_spark.analytics import setops as so
from kdb_spark.analytics import sorts as st
from kdb_spark.analytics import windows as wn
from kdb_spark import sources as src
from kdb_spark import streaming as sm
from kdb_spark.llm import curation as cu
from kdb_spark.llm import dedup as dd
from kdb_spark.llm import multimodal as mm
from kdb_spark.llm import similarity as sim
from kdb_spark.llm import textstats as tx
from kdb_spark.tables import DAY_US, HOUR_US, events_us, load

# epoch-µs constants (UTC), events span 2024-01-01 .. 2024-01-30
T_JAN10 = 1_704_844_800_000_000
T_JAN12 = 1_705_017_600_000_000
T_JAN17 = 1_705_449_600_000_000
NOW_JAN20 = 1_705_708_800_000_000
CUT_JAN08 = 1_704_672_000_000_000
MIN_PRICE = 300_000.0

_Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLE: dict[str, str] = {}


def _reg(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
    _Q[name] = fn
    if sql is not None:
        _ORACLE[name] = sql


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


# --------------------------------------------------------------------- kernel

_reg(
    "kernel_get_dense",
    lambda s, d: kn.get_dense(events_us(s, d), s, 7, "view", T_JAN10, T_JAN12),
    f"""
    WITH spine AS (SELECT range AS slot_us FROM range({T_JAN10}, {T_JAN12}, 60000000)),
    d AS (
      SELECT epoch_us(ts) - epoch_us(ts) % 60000000 AS slot_us,
             arg_max(value, event_id) AS v
      FROM events
      WHERE user_id = 7 AND event_type = 'view'
        AND epoch_us(ts) >= {T_JAN10} AND epoch_us(ts) < {T_JAN12}
      GROUP BY 1)
    SELECT s.slot_us, coalesce(d.v, 0.0) AS value
    FROM spine s LEFT JOIN d USING (slot_us)
    """,
)

_reg(
    "kernel_find_dense",
    lambda s, d: kn.find_dense(
        events_us(s, d), s, 7, None, T_JAN10, T_JAN17, res=HOUR_US
    ),
    f"""
    WITH data AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, value, event_id
      FROM events
      WHERE user_id = 7 AND epoch_us(ts) >= {T_JAN10} AND epoch_us(ts) < {T_JAN17}),
    series AS (SELECT DISTINCT user_id, event_type FROM data),
    spine AS (SELECT range AS slot_us FROM range({T_JAN10}, {T_JAN17}, 3600000000)),
    lww AS (
      SELECT user_id, event_type, ts_us - ts_us % 3600000000 AS slot_us,
             arg_max(value, event_id) AS v
      FROM data GROUP BY 1, 2, 3)
    SELECT s.user_id, s.event_type, p.slot_us, coalesce(l.v, 0.0) AS value
    FROM series s CROSS JOIN spine p
    LEFT JOIN lww l ON l.user_id = s.user_id AND l.event_type = s.event_type
                   AND l.slot_us = p.slot_us
    """,
)

_reg(
    "kernel_ingest_validate",
    lambda s, d: kn.ingest_validate(events_us(s, d), NOW_JAN20),
    f"""
    SELECT epoch_us(ts) - epoch_us(ts) % {DAY_US} AS bucket_us,
           CASE WHEN epoch_us(ts) > {NOW_JAN20} THEN 'future' ELSE 'ok' END AS status,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)

_reg(
    "kernel_retention",
    lambda s, d: kn.retention_filter(events_us(s, d), CUT_JAN08),
    f"""
    SELECT bucket_us, count(*) AS n FROM (
      SELECT epoch_us(ts) - epoch_us(ts) % {DAY_US} AS bucket_us FROM events)
    WHERE bucket_us >= {CUT_JAN08} GROUP BY 1
    """,
)

_reg(
    "series_filter",
    lambda s, d: kn.series_filter(events_us(s, d), 7, "click", T_JAN10, T_JAN17),
    f"""
    SELECT event_id, epoch_us(ts) AS ts_us, value FROM events
    WHERE user_id = 7 AND event_type = 'click'
      AND epoch_us(ts) >= {T_JAN10} AND epoch_us(ts) < {T_JAN17}
    """,
)

_reg(
    "payload_project",
    lambda s, d: kn.payload_project(load(s, d, "events")),
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
    FROM events
    """,
)

# ------------------------------------------------------------ sources / sinks
# Adapters in kdb_spark/sources.py; round-trips normalize to exact integer
# types before the write so format transit is bit-exact (see module note).

_reg(
    "scan_parquet",
    src.q_scan_parquet,
    """
    SELECT p_partkey, p_brand, CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
    FROM part WHERE p_size = 15
    """,
)

_reg(
    "scan_csv",
    src.q_scan_csv,
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)

_reg(
    "scan_json",
    src.q_scan_json,
    """
    SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS date_us,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
    FROM orders WHERE o_orderstatus = 'F'
    """,
)

_reg(
    "scan_text",
    src.q_scan_text,
    """
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_line
    FROM documents
    """,
)

_reg(
    "scan_orc",
    src.q_scan_orc,
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
           CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)

_reg(
    "scan_binary",
    src.q_scan_binary,
    """
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents ORDER BY doc_id LIMIT 50
    """,
)

_reg(
    "sink_delta_like",
    src.q_sink_delta_like,
    """
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
    FROM orders
    WHERE o_orderpriority <> '1-URGENT' OR o_orderkey % 2 = 0
    GROUP BY 1
    """,
)

_reg(
    "sink_bucketed",
    src.q_sink_bucketed,
    """
    SELECT c_mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)

_reg(
    "sink_zorder",
    src.q_scan_zorder,
    # clustering must change the LAYOUT only, never the answer: the oracle
    # is the plain two-dimensional filter over the original events table
    f"""
    SELECT user_id, epoch_us(ts) // {DAY_US} AS day_idx,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
    FROM events
    WHERE user_id BETWEEN 10 AND 40
      AND epoch_us(ts) // {DAY_US} BETWEEN 19730 AND 19736
    GROUP BY 1, 2
    """,
)

# --------------------------------------------------------------- aggregations

_reg(
    "agg_resample",
    lambda s, d: agg.agg_resample(events_us(s, d)),
    """
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_value_c,
             min(value) AS min_value,
             max(value) AS max_value
      FROM events GROUP BY 1, 2)
    SELECT event_type, hour_us, n, sum_value_c,
           CAST((CASE WHEN sum_value_c < 0 THEN -1 ELSE 1 END)
                * CAST((20000 * CAST(abs(sum_value_c) AS HUGEINT) + 100 * n)
                       // (200 * CAST(n AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e4 AS avg_value,
           min_value, max_value
    FROM g
    """,
)

_reg(
    "agg_distinct",
    lambda s, d: agg.agg_distinct(load(s, d, "lineitem")),
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
           count(*) AS n_rows
    FROM lineitem GROUP BY 1
    """,
)

# Sketch audits: HLL estimates are engine-specific, so a byte-exact oracle is
# impossible — instead the adjudicated query joins the sketch estimate against
# the exact distinct computed on the same data and emits a deterministic
# `est_within_tol` boolean (|est - exact| <= max(1, 5% * exact); rsd=0.02 /
# lgK=12 sit well inside 5%). The oracle asserts TRUE, so the driver
# value-checks the estimate every round instead of recording rows-only. The
# same envelope is pytest-asserted in tests/test_sketches.py. At 100 TB this
# audit shape runs on a sample; the production op is the sketch alone
# (kdb_spark/analytics/aggregations.py:46,56).
_EST_TOL = "abs(approx_users - exact_users) <= greatest(1.0, 0.05 * exact_users)"


def _q_approx_distinct(s: SparkSession, d: str) -> DataFrame:
    ev = events_us(s, d)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        agg.agg_approx_distinct(ev)
        .join(exact, "event_type")
        .select(
            "event_type",
            "n",
            F.col("exact_users").cast("long").alias("exact_users"),
            F.expr(_EST_TOL).alias("est_within_tol"),
        )
    )


_reg(
    "agg_approx_distinct",
    _q_approx_distinct,
    """
    SELECT event_type, count(*) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_within_tol
    FROM events GROUP BY 1
    """,
)


def _q_hll_merge(s: SparkSession, d: str) -> DataFrame:
    ev = events_us(s, d)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        agg.agg_hll_merge(ev)
        .join(exact, "event_type")
        .select(
            "event_type",
            F.col("n_day_sketches").cast("long").alias("n_day_sketches"),
            F.col("exact_users").cast("long").alias("exact_users"),
            F.expr(_EST_TOL).alias("est_within_tol"),
        )
    )


_reg(
    "agg_hll_merge",
    _q_hll_merge,
    f"""
    SELECT event_type,
           CAST(count(DISTINCT epoch_us(ts) - epoch_us(ts) % {DAY_US}) AS BIGINT)
             AS n_day_sketches,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_within_tol
    FROM events GROUP BY 1
    """,
)

_reg(
    "agg_percentile",
    lambda s, d: agg.agg_percentile(events_us(s, d)),
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)

_reg(
    "agg_mode",
    lambda s, d: agg.agg_mode(events_us(s, d)),
    """
    SELECT user_id, event_type AS mode_event_type, CAST(n AS BIGINT) AS n_events
    FROM (
      SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type) AS rk
      FROM events GROUP BY user_id, event_type)
    WHERE rk = 1
    """,
)

_reg(
    "agg_stats",
    lambda s, d: agg.agg_stats(events_us(s, d)),
    """
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS s1,
             sum(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS HUGEINT)) AS s2,
             CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mx,
             CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mn
      FROM events GROUP BY 1)
    SELECT event_type,
           CASE WHEN n > 1 THEN
             round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
                        / CAST(n * (n - 1) AS DOUBLE) / 1e4), 4)
           END AS sd,
           CAST(CASE WHEN n > 1 THEN
             CAST((20000 * (n * s2 - s1 * s1)
                   + n * (n - 1) * CAST(10000 AS HUGEINT))
                  // (2 * n * (n - 1) * CAST(10000 AS HUGEINT)) AS BIGINT)
           END AS DOUBLE) / 1e4 AS vr,
           CAST((mx - mn) * CAST(100 AS BIGINT) AS DOUBLE) / 1e4 AS spread,
           CAST(n AS BIGINT) AS n
    FROM g
    """,
)

_reg(
    "agg_corr",
    lambda s, d: agg.agg_corr(events_us(s, d)),
    f"""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(u) AS HUGEINT) AS su,
             CAST(sum(v) AS HUGEINT) AS sv,
             sum(CAST(u AS HUGEINT) * u) AS suu,
             sum(CAST(v AS HUGEINT) * v) AS svv,
             sum(CAST(u AS HUGEINT) * v) AS suv
      FROM (SELECT event_type,
                   (epoch_us(ts) // {HOUR_US}) % 24 AS u,
                   CAST(round(value * 100) AS BIGINT) AS v
            FROM events)
      GROUP BY 1),
    t AS (
      SELECT event_type, n,
             n * suv - su * sv AS cm,
             n * suu - su * su AS a,
             n * svv - sv * sv AS b
      FROM s)
    SELECT event_type,
           CASE WHEN a > 0 AND b > 0 THEN
             floor(CAST(cm AS DOUBLE)
                   / sqrt(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
                   * 1e4 + 0.5) / 1e4
           END AS corr_vh,
           CAST(CASE WHEN n > 1 THEN
             (CASE WHEN cm < 0 THEN -1 ELSE 1 END)
             * CAST((20000 * abs(cm) + 100 * n * (n - 1))
                    // (200 * n * (n - 1)) AS HUGEINT)
           END AS DOUBLE) / 1e4 AS cov_vh,
           CAST(n AS BIGINT) AS n
    FROM t
    """,
)

_reg(
    "agg_wavg",
    lambda s, d: agg.agg_wavg(load(s, d, "lineitem")),
    """
    WITH g AS (
      SELECT l_returnflag,
             sum(CAST(l_quantity AS HUGEINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS swx,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sw,
             count(*) AS n
      FROM lineitem GROUP BY 1)
    SELECT l_returnflag,
           CAST((CASE WHEN swx < 0 THEN -1 ELSE 1 END)
                * CAST((20000 * abs(swx) + sw) // (2 * sw) AS BIGINT) AS DOUBLE)
             / 1e4 AS wavg_price_c,
           n
    FROM g
    """,
)

_reg(
    "agg_pivot",
    lambda s, d: agg.agg_pivot(events_us(s, d)),
    """
    SELECT user_id,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup
    FROM events GROUP BY user_id
    """,
)

_reg(
    "agg_unpivot",
    lambda s, d: agg.agg_unpivot(events_us(s, d)),
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    t(event_type) AS (SELECT * FROM (VALUES ('click'), ('view'), ('purchase'),
                                            ('error'), ('signup'))),
    c AS (SELECT user_id, event_type, count(*) AS n
          FROM events GROUP BY user_id, event_type)
    SELECT u.user_id, t.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n
    FROM u CROSS JOIN t
    LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
    """,
)

_reg(
    "agg_rollup",
    lambda s, d: agg.agg_rollup(load(s, d, "lineitem")),
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)

_reg(
    "agg_cube",
    lambda s, d: agg.agg_cube(load(s, d, "orders")),
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS g
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)

_reg(
    "agg_grouping_sets",
    lambda s, d: agg.agg_grouping_sets(load(s, d, "lineitem")),
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g
    FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)

# ------------------------------------------------------------------- windows

_reg(
    "win_moving_avg",
    lambda s, d: wn.win_moving_avg(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id,
             sum(CAST(round(value * 100) AS BIGINT)) OVER w AS sc,
             count(*) OVER w AS cnt
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id,
           CAST((CASE WHEN sc < 0 THEN -1 ELSE 1 END)
                * CAST((20000 * CAST(abs(sc) AS HUGEINT)
                        + 100 * CAST(cnt AS HUGEINT))
                       // (200 * CAST(cnt AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e4 AS mavg
    FROM t
    """,
)

_reg(
    "win_moving_median",
    lambda s, d: wn.win_moving_median(events_us(s, d)),
    """
    SELECT event_id, user_id,
           round(median(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS mmed
    FROM events
    """,
)

_reg(
    "win_rank",
    lambda s, d: wn.win_rank(load(s, d, "orders")),
    """
    SELECT o_orderkey, o_custkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(row_number() OVER w AS BIGINT) AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)

_reg(
    "win_lag_delta",
    lambda s, d: wn.win_lag_delta(events_us(s, d)),
    """
    SELECT event_id, user_id, event_type,
           value - lag(value) OVER (PARTITION BY user_id, event_type
                                    ORDER BY epoch_us(ts), event_id) AS delta
    FROM events
    """,
)

_reg(
    "agg_entropy",
    lambda s, d: agg.agg_entropy(events_us(s, d)),
    """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2)
    SELECT user_id,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy_bits
    FROM c GROUP BY 1
    """,
)

_reg(
    "win_counter_rate",
    lambda s, d: wn.win_counter_rate(events_us(s, d)),
    """
    WITH l AS (
      SELECT event_id, user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS c, epoch_us(ts) AS ts_us,
             lag(CAST(round(value * 100) AS BIGINT)) OVER w AS pc,
             lag(epoch_us(ts)) OVER w AS pts
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id)),
    i AS (
      SELECT event_id, user_id, event_type, ts_us - pts AS dt_us,
             CASE WHEN c >= pc THEN c - pc ELSE c END AS inc_c
      FROM l WHERE pc IS NOT NULL)
    SELECT event_id, user_id, event_type,
           CAST(inc_c * 10000 AS DOUBLE) / 1e6 AS increase,
           CASE WHEN dt_us > 0 THEN
             CAST((CASE WHEN inc_c < 0 THEN -1 ELSE 1 END)
                  * CAST((20000000000 * CAST(abs(inc_c) AS HUGEINT) + dt_us)
                         // (2 * CAST(dt_us AS HUGEINT)) AS BIGINT) AS DOUBLE)
               / 1e6
           END AS rate_per_sec
    FROM i
    """,
)

_reg(
    "win_ntile",
    lambda s, d: wn.win_ntile(load(s, d, "orders")),
    """
    WITH t AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS np
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey))
    SELECT o_orderkey, o_orderpriority, quartile,
           CAST(CASE WHEN np > 1 THEN
             CAST((2000000 * CAST(rn - 1 AS HUGEINT) + (np - 1))
                  // (2 * CAST(np - 1 AS HUGEINT)) AS BIGINT)
           ELSE 0 END AS DOUBLE) / 1e6 AS prk,
           CAST(CAST((2000000 * CAST(rn AS HUGEINT) + np)
                     // (2 * CAST(np AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS cd
    FROM t
    """,
)

_reg(
    "sessionize",
    lambda s, d: wn.sessionize(events_us(s, d)),
    """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
    o AS (SELECT event_id, user_id, ts_us,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w >= 1800000000
                      THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
    SELECT event_id, user_id, ts_us,
           CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM o
    """,
)

_reg(
    "win_first_last",
    lambda s, d: wn.win_first_last(events_us(s, d)),
    """
    SELECT event_id, user_id, event_type,
           first_value(value) OVER w AS first_value,
           last_value(value) OVER w AS last_value,
           nth_value(value, 2) OVER w AS second_value
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)

_reg(
    "win_range_frame",
    lambda s, d: wn.win_range_frame(events_us(s, d)),
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trail_sum_c
    FROM events
    """,
)

_reg(
    "win_cumsum",
    lambda s, d: wn.win_cumsum(events_us(s, d)),
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
    FROM events
    """,
)

_reg(
    "win_interpolate",
    lambda s, d: wn.win_interpolate(events_us(s, d), T_JAN10, T_JAN12),
    f"""
    WITH slots AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(ts) % 3600000000 AS slot_us,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vn,
             CAST(count(*) AS BIGINT) AS vd
      FROM events
      WHERE epoch_us(ts) >= {T_JAN10} AND epoch_us(ts) < {T_JAN12}
      GROUP BY 1, 2),
    grid AS (
      SELECT u.user_id, s.slot_us
      FROM (SELECT DISTINCT user_id FROM slots) u
      CROSS JOIN (SELECT range AS slot_us
                  FROM range({T_JAN10}, {T_JAN12}, 3600000000)) s),
    sparse AS (
      SELECT g.user_id, g.slot_us, t.vn, t.vd FROM grid g
      LEFT JOIN slots t USING (user_id, slot_us)),
    carried AS (
      SELECT user_id, slot_us, vn, vd,
        last_value(vn IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY slot_us
           ROWS UNBOUNDED PRECEDING) AS pvn,
        last_value(vd IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY slot_us
           ROWS UNBOUNDED PRECEDING) AS pvd,
        last_value(CASE WHEN vn IS NOT NULL THEN slot_us END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY slot_us
           ROWS UNBOUNDED PRECEDING) AS pt,
        first_value(vn IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY slot_us
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nvn,
        first_value(vd IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY slot_us
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nvd,
        first_value(CASE WHEN vn IS NOT NULL THEN slot_us END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY slot_us
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM sparse),
    -- exact rational interpolation: num/den staged, then the sign-aware
    -- integer round-to-4dp (mirrors the engine's decimal DIV device)
    frac AS (
      SELECT user_id, slot_us, vn, vd, pvn, nvn,
             CAST(pvn AS HUGEINT) * nvd * (nt - pt)
               + (CAST(nvn AS HUGEINT) * pvd
                  - CAST(pvn AS HUGEINT) * nvd) * (slot_us - pt) AS inum,
             CAST(pvd AS HUGEINT) * nvd * (nt - pt) AS iden
      FROM carried)
    SELECT user_id, slot_us,
           CASE WHEN vn IS NOT NULL THEN
             CAST((CASE WHEN vn < 0 THEN -1 ELSE 1 END)
                  * CAST((20000 * CAST(abs(vn) AS HUGEINT) + vd)
                         // (2 * CAST(vd AS HUGEINT)) AS BIGINT) AS DOUBLE)
               / 1e4
           WHEN pvn IS NOT NULL AND nvn IS NOT NULL THEN
             CAST((CASE WHEN inum < 0 THEN -1 ELSE 1 END)
                  * CAST((20000 * abs(inum) + iden)
                         // (2 * iden) AS BIGINT) AS DOUBLE) / 1e4
           END AS value_c
    FROM frac
    """,
)

_reg(
    "win_ffill",
    lambda s, d: wn.win_ffill(events_us(s, d), T_JAN10, T_JAN12),
    f"""
    WITH slots AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(ts) % 3600000000 AS slot_us,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vn,
             CAST(count(*) AS BIGINT) AS vd
      FROM events
      WHERE epoch_us(ts) >= {T_JAN10} AND epoch_us(ts) < {T_JAN12}
      GROUP BY 1, 2),
    grid AS (
      SELECT u.user_id, s.slot_us
      FROM (SELECT DISTINCT user_id FROM slots) u
      CROSS JOIN (SELECT range AS slot_us
                  FROM range({T_JAN10}, {T_JAN12}, 3600000000)) s),
    rounded AS (
      SELECT user_id, slot_us,
             CAST((CASE WHEN vn < 0 THEN -1 ELSE 1 END)
                  * CAST((20000 * CAST(abs(vn) AS HUGEINT) + vd)
                         // (2 * CAST(vd AS HUGEINT)) AS BIGINT) AS DOUBLE)
               / 1e4 AS v
      FROM slots)
    SELECT g.user_id, g.slot_us,
           last_value(t.v IGNORE NULLS) OVER
             (PARTITION BY g.user_id ORDER BY g.slot_us
              ROWS UNBOUNDED PRECEDING) AS value_c
    FROM grid g LEFT JOIN rounded t USING (user_id, slot_us)
    """,
)

# Finite-horizon EWMA, r10 parity contract: the oracle's lag chain is
# generated from the SAME integer weight literals the engine uses
# (windows.ewma_weights_int), folded in HUGEINT — exact, order-independent
# — and the round(6) is a sign-aware integer floor-division, never a
# double round() (the r9 win_macd half-boundary failure mode).


def _ewma_int_sql(col: str, alpha: float, win: str = "w") -> tuple[str, str]:
    """(numerator, denominator) HUGEINT lag-chain SQL over integer column
    ``col``, from the SAME ewma_weights_int literals as the Spark side."""
    num = " + ".join(
        f"coalesce(lag({col}, {k}) OVER {win}, 0) * {wk}::HUGEINT"
        for k, wk in enumerate(wn.ewma_weights_int(alpha))
    )
    den = " + ".join(
        f"(CASE WHEN lag({col}, {k}) OVER {win} IS NOT NULL"
        f" THEN {wk}::HUGEINT ELSE 0::HUGEINT END)"
        for k, wk in enumerate(wn.ewma_weights_int(alpha))
    )
    return num, den


def _idiv6_sql(num: str, den: str) -> str:
    """round(num/den, 6) in integer space — the DuckDB mirror of the
    engine's windows._iround6 (sign-aware half-away-from-zero //)."""
    return (
        f"CAST((CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END)"
        f" * ((2000000 * abs({num}) + ({den})) // (2 * ({den})))"
        f" AS DOUBLE) / 1e6"
    )


_EWMA_NUM, _EWMA_DEN = _ewma_int_sql("xc", wn.EWMA_ALPHA)

_EWMA_ORACLE = f"""
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events),
    e AS (
      SELECT event_id, user_id, event_type,
             ({_EWMA_NUM}) AS num, ({_EWMA_DEN}) AS den
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts_us, event_id))
    SELECT event_id, user_id, event_type,
           {_idiv6_sql("num", "100 * den")} AS ewma
    FROM e
    """

_reg(
    "win_ewma",
    lambda s, d: wn.win_ewma(events_us(s, d)),
    _EWMA_ORACLE,
)

_reg(
    "win_zscore",
    lambda s, d: wn.win_zscore(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS xc,
             CAST(count(*) OVER w AS DOUBLE) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) AS s1,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 31 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, event_type,
           round(CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0
                      THEN (CAST(xc AS DOUBLE) - s1 / n)
                           / sqrt(s2 / n - (s1 / n) * (s1 / n)) END, 4) AS z,
           (CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0
                 THEN (CAST(xc AS DOUBLE) - s1 / n)
                      / sqrt(s2 / n - (s1 / n) * (s1 / n)) END IS NOT NULL
            AND abs(CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0
                         THEN (CAST(xc AS DOUBLE) - s1 / n)
                              / sqrt(s2 / n - (s1 / n) * (s1 / n)) END) >= 3.0)
             AS is_outlier
    FROM t
    """,
)

# CUSUM's sequential fold replays in SQL as a list_reduce with the running
# max packed into the accumulator's high 32 bits (both components stay far
# below 2^32 on this data, asserted by the n*max-drift bound).
_reg(
    "win_cusum",
    lambda s, d: wn.win_cusum(events_us(s, d)),
    """
    WITH r AS (
      SELECT user_id, event_type,
             list(CAST(round(value * 100) AS BIGINT)
                  ORDER BY epoch_us(ts), event_id) AS xs
      FROM events GROUP BY 1, 2),
    f AS (
      SELECT user_id, event_type, len(xs) AS n,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT), xs),
               (acc, x) -> greatest(CAST(0 AS BIGINT), acc % 4294967296 + x - 30000)
                           + greatest(acc // 4294967296,
                                      greatest(CAST(0 AS BIGINT),
                                               acc % 4294967296 + x - 30000))
                             * 4294967296) AS packed
      FROM r)
    SELECT user_id, event_type,
           CAST(packed % 4294967296 AS BIGINT) AS cusum_final,
           CAST(packed // 4294967296 AS BIGINT) AS cusum_max,
           (packed // 4294967296) >= 100000 AS alarmed,
           CAST(n AS BIGINT) AS n
    FROM f
    """,
)

_reg(
    "agg_histogram",
    lambda s, d: agg.agg_histogram(events_us(s, d)),
    """
    SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
           CAST(floor(value / 10.0) AS BIGINT) * 10.0 AS bin_start,
           count(*) AS n, min(value) AS lo, max(value) AS hi
    FROM events GROUP BY 1, 2
    """,
)

# Deterministic count-min sketch (md5-prefix hashes, no engine seed) — the
# estimate column itself is oracle-checkable, unlike the native HLL ops.
_reg(
    "agg_count_min",
    lambda s, d: agg.agg_count_min(events_us(s, d)),
    """
    WITH counts AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
    hashes AS (
      SELECT user_id, n, j,
             ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
                                 CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 64 AS bucket
      FROM counts CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
    cms AS (SELECT j, bucket, sum(n) AS bsum FROM hashes GROUP BY 1, 2),
    top AS (SELECT user_id, n FROM counts ORDER BY n DESC, user_id LIMIT 20)
    SELECT t.user_id, CAST(t.n AS BIGINT) AS n_exact,
           CAST(min(c.bsum) AS BIGINT) AS n_cms
    FROM top t
    JOIN hashes h ON h.user_id = t.user_id
    JOIN cms c ON c.j = h.j AND c.bucket = h.bucket
    GROUP BY 1, 2
    """,
)

# Mergeable fixed-domain histogram quantiles — like the CMS, the estimate
# itself is deterministic integer arithmetic, so it is fully hash-checked.
_reg(
    "agg_quantile_sketch",
    lambda s, d: agg.agg_quantile_sketch(events_us(s, d)),
    """
    WITH hist AS (
      SELECT event_type,
             least(63, greatest(0, CAST(floor((value - 0.0) / 16.0) AS BIGINT))) AS bin,
             count(*) AS c
      FROM events GROUP BY 1, 2),
    cum AS (
      SELECT event_type, bin, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
             coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM hist),
    cq AS (
      SELECT *, CAST(ceil(0.5 * n) AS BIGINT) AS t50,
                CAST(ceil(0.95 * n) AS BIGINT) AS t95
      FROM cum)
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           max(CASE WHEN cum >= t50 AND cum_before < t50 THEN
             CAST(CAST((20000 * (16 * (bin * CAST(c AS HUGEINT)
                                       + t50 - cum_before)) + c)
                       // (2 * CAST(c AS HUGEINT)) AS BIGINT) AS DOUBLE)
               / 1e4
           END) AS est_p50,
           max(CASE WHEN cum >= t95 AND cum_before < t95 THEN
             CAST(CAST((20000 * (16 * (bin * CAST(c AS HUGEINT)
                                       + t95 - cum_before)) + c)
                       // (2 * CAST(c AS HUGEINT)) AS BIGINT) AS DOUBLE)
               / 1e4
           END) AS est_p95
    FROM cq GROUP BY 1
    """,
)

# table_profile's oracle is generated per column from the same kind
# dispatch the engine uses (numeric/timestamp → double min/max, string →
# lexical), so both sides profile identical shapes.
_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_leg(name: str, kind: str) -> str:
    if kind == "str":
        mn = "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num"
        ms = f"min({name}) AS min_str, max({name}) AS max_str"
    else:
        expr = f"epoch_us({name})" if kind == "ts" else name
        mn = (
            f"CAST(min({expr}) AS DOUBLE) AS min_num, "
            f"CAST(max({expr}) AS DOUBLE) AS max_num"
        )
        ms = "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
    return f"""
    SELECT '{name}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({name}) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {name}) AS BIGINT) AS ndv, {mn}, {ms}
    FROM orders"""


_reg(
    "table_profile",
    lambda s, d: agg.table_profile(load(s, d, "orders")),
    "\nUNION ALL".join(_profile_leg(n, k) for n, k in _PROFILE_COLS),
)

_reg(
    "sql_pricing_summary",
    lambda s, d: agg.sql_pricing_summary(load(s, d, "lineitem")),
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS sum_disc_price_c,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)

_reg(
    "udaf_max_gap",
    lambda s, d: agg.udaf_max_gap(events_us(s, d), event_type="purchase"),
    """
    WITH g AS (
      SELECT user_id, event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY epoch_us(ts)) AS gap
      FROM events WHERE event_type = 'purchase')
    SELECT user_id, event_type,
           CAST(max(gap) AS BIGINT) AS max_gap_us,
           CAST(count(*) AS BIGINT) AS n
    FROM g GROUP BY 1, 2 HAVING max(gap) IS NOT NULL
    """,
)

_reg(
    "agg_mad",
    lambda s, d: agg.agg_mad(events_us(s, d)),
    """
    WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                 FROM events GROUP BY 1)
    SELECT e.event_type,
           round(min(m.med), 4) AS median,
           round(quantile_cont(abs(e.value - m.med), 0.5), 4) AS mad,
           CAST(count(*) AS BIGINT) AS n
    FROM events e JOIN med m USING (event_type)
    GROUP BY 1
    """,
)

_reg(
    "agg_gini",
    lambda s, d: agg.agg_gini(events_us(s, d)),
    """
    WITH r AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xc,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(round(value * 100) AS BIGINT),
                                         event_id) AS i
      FROM events)
    , g AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(xc) AS HUGEINT) AS sx,
             sum(CAST(i AS HUGEINT) * xc) AS six
      FROM r GROUP BY 1)
    SELECT event_type,
           CAST((CASE WHEN (2 * six - (n + 1) * sx) < 0 THEN -1 ELSE 1 END)
                * (CASE WHEN sx < 0 THEN -1 ELSE 1 END)
                * CAST((2000000 * abs(2 * six - (n + 1) * sx) + abs(n * sx))
                       // (2 * abs(n * sx)) AS BIGINT) AS DOUBLE)
             / 1e6 AS gini,
           CAST(n AS BIGINT) AS n
    FROM g
    """,
)

# ----- behavioral analytics: funnel / cohort retention / streaks

_reg(
    "agg_funnel",
    lambda s, d: bh.agg_funnel(events_us(s, d)),
    """
    WITH b AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
    s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_us END)
                     OVER (PARTITION BY user_id) AS t1_us FROM b),
    s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > t1_us
                              THEN ts_us END)
                     OVER (PARTITION BY user_id) AS t2_us FROM s1),
    s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us > t2_us
                              THEN ts_us END)
                     OVER (PARTITION BY user_id) AS t3_us FROM s2)
    SELECT user_id, min(t1_us) AS t1_us, min(t2_us) AS t2_us,
           min(t3_us) AS t3_us,
           CAST(CASE WHEN min(t3_us) IS NOT NULL THEN 3
                     WHEN min(t2_us) IS NOT NULL THEN 2
                     WHEN min(t1_us) IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS reached
    FROM s3 GROUP BY 1
    """,
)

_reg(
    "retention_cohort",
    lambda s, d: bh.retention_cohort(events_us(s, d)),
    """
    WITH a AS (SELECT DISTINCT user_id,
                      epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us
               FROM events),
    c AS (SELECT user_id, day_us,
                 min(day_us) OVER (PARTITION BY user_id) AS cohort_us
          FROM a)
    SELECT cohort_us,
           CAST((day_us - cohort_us) / 86400000000 AS BIGINT) AS day_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM c GROUP BY 1, 2
    """,
)

_reg(
    "win_streaks",
    lambda s, d: bh.win_streaks(events_us(s, d)),
    """
    WITH a AS (SELECT DISTINCT user_id,
                      epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us
               FROM events),
    i AS (SELECT user_id, day_us,
                 day_us - row_number() OVER (PARTITION BY user_id
                                             ORDER BY day_us) * 86400000000
                   AS anchor
          FROM a),
    g AS (SELECT user_id, anchor, count(*) AS len_days FROM i GROUP BY 1, 2)
    SELECT user_id, CAST(max(len_days) AS BIGINT) AS max_streak_days,
           CAST(sum(len_days) AS BIGINT) AS n_active_days
    FROM g GROUP BY 1
    """,
)

_reg(
    "agg_ohlc",
    lambda s, d: agg.agg_ohlc(events_us(s, d)),
    """
    SELECT event_type,
           epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
           first(value ORDER BY epoch_us(ts), event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY epoch_us(ts), event_id) AS close,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)

# --------------------------------------------------------------------- joins

_reg(
    "join_enrich_broadcast",
    lambda s, d: jn.join_enrich_broadcast(
        load(s, d, "orders"), load(s, d, "customer"), load(s, d, "nation"), load(s, d, "region")
    ),
    """
    SELECT r_name, n_name, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
)

_reg(
    "join_equi_shuffle",
    lambda s, d: jn.join_equi_shuffle(load(s, d, "lineitem"), load(s, d, "orders")),
    """
    SELECT o_orderpriority, count(*) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)

# identical result contract to join_equi_shuffle — the salt must not change
# the answer, only the shuffle layout; hence the same oracle SQL
_reg(
    "join_skew_salted",
    lambda s, d: jn.join_skew_salted(load(s, d, "lineitem"), load(s, d, "orders")),
    """
    SELECT o_orderpriority, count(*) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)

_reg(
    "join_asof",
    lambda s, d: jn.join_asof(events_us(s, d)),
    """
    WITH err AS (
      SELECT user_id, epoch_us(ts) AS ts_us, arg_max(value, event_id) AS err_value
      FROM events WHERE event_type = 'error' GROUP BY 1, 2),
    clk AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, e.err_value AS asof_value
    FROM clk c ASOF JOIN err e
      ON c.user_id = e.user_id AND c.ts_us >= e.ts_us
    """,
)

_reg(
    "join_asof_forward",
    lambda s, d: jn.join_asof_forward(events_us(s, d)),
    """
    WITH err AS (
      SELECT user_id, epoch_us(ts) AS ts_us, arg_max(value, event_id) AS err_value
      FROM events WHERE event_type = 'error' GROUP BY 1, 2),
    clk AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, e.err_value AS next_value
    FROM clk c ASOF JOIN err e
      ON c.user_id = e.user_id AND c.ts_us <= e.ts_us
    """,
)

_reg(
    "join_asof_tolerance",
    lambda s, d: jn.join_asof_tolerance(events_us(s, d)),
    """
    WITH err AS (
      SELECT user_id, epoch_us(ts) AS ts_us, arg_max(value, event_id) AS err_value
      FROM events WHERE event_type = 'error' GROUP BY 1, 2),
    clk AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, e.err_value AS asof_value,
           c.ts_us - e.ts_us AS staleness_us
    FROM clk c ASOF JOIN err e
      ON c.user_id = e.user_id AND c.ts_us >= e.ts_us
    WHERE c.ts_us - e.ts_us <= 1800000000
    """,
)

_reg(
    "join_interval",
    lambda s, d: jn.join_interval(events_us(s, d)),
    """
    SELECT e.event_id, e.user_id, count(*) AS n_clicks
    FROM events e JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click'
     AND epoch_us(c.ts) >= epoch_us(e.ts)
     AND epoch_us(c.ts) < epoch_us(e.ts) + 600000000
    WHERE e.event_type = 'error'
    GROUP BY 1, 2
    """,
)

_reg(
    "join_window",
    lambda s, d: jn.join_window(events_us(s, d)),
    """
    WITH err AS (
      SELECT event_id, user_id, epoch_us(ts) AS err_us
      FROM events WHERE event_type = 'error'),
    clk AS (
      SELECT user_id, epoch_us(ts) AS c_us, value
      FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id,
           CAST(count(c.c_us) AS BIGINT) AS n_in_win,
           round(avg(c.value), 4) AS avg_in_win
    FROM err e LEFT JOIN clk c
      ON e.user_id = c.user_id
     AND c.c_us >= e.err_us - 600000000 AND c.c_us < e.err_us + 600000000
    GROUP BY 1, 2
    """,
)

# The oracle is the naive per-probe LATERAL scan (fine for DuckDB at
# sf0.01); the engine's union-and-carry form is the O(n log n) scale path.
_reg(
    "join_nearest",
    lambda s, d: jn.join_nearest(events_us(s, d)),
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             arg_max(value, event_id) AS err_value
      FROM events WHERE event_type = 'error' GROUP BY 1, 2),
    c AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, n.nearest_value, n.dist_us
    FROM c, LATERAL (
      SELECT e.err_value AS nearest_value,
             abs(e.ts_us - c.ts_us) AS dist_us
      FROM e WHERE e.user_id = c.user_id
      ORDER BY abs(e.ts_us - c.ts_us), e.ts_us
      LIMIT 1) n
    """,
)

_reg(
    "join_semi",
    lambda s, d: jn.join_semi(load(s, d, "customer"), load(s, d, "orders"), MIN_PRICE),
    f"""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > {MIN_PRICE})
    """,
)

_reg(
    "join_anti",
    lambda s, d: jn.join_anti(load(s, d, "customer"), load(s, d, "orders"), MIN_PRICE),
    f"""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > {MIN_PRICE})
    """,
)

_reg(
    "join_multiway",
    lambda s, d: jn.join_multiway(
        load(s, d, "customer"), load(s, d, "orders"), load(s, d, "lineitem"),
        load(s, d, "supplier"), load(s, d, "nation"), load(s, d, "region"),
    ),
    """
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
    GROUP BY n_name
    """,
)

# -------------------------------------------------------------- sorts / top-k

_reg(
    "sort_series",
    lambda s, d: st.sort_series(events_us(s, d), 7),
    """
    SELECT CAST(row_number() OVER (ORDER BY epoch_us(ts), event_id) AS BIGINT) AS pos,
           event_id, epoch_us(ts) AS ts_us, value
    FROM events WHERE user_id = 7
    """,
)

_reg(
    "topk_per_group",
    lambda s, d: st.topk_per_group(load(s, d, "orders")),
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
    FROM orders QUALIFY rn <= 3
    """,
)

_reg(
    "topk_global",
    lambda s, d: st.topk_global(load(s, d, "orders")),
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)

# ------------------------------------------------------------------- set ops

_reg(
    "set_union",
    lambda s, d: so.set_union(load(s, d, "customer"), "BUILDING", "AUTOMOBILE"),
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)

_reg(
    "set_intersect",
    lambda s, d: so.set_intersect(load(s, d, "part")),
    """
    SELECT p_brand FROM part WHERE p_size > 40
    INTERSECT
    SELECT p_brand FROM part WHERE p_type = 'ECONOMY'
    """,
)

_reg(
    "set_except",
    lambda s, d: so.set_except(load(s, d, "customer"), load(s, d, "orders"), MIN_PRICE),
    f"""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > {MIN_PRICE}
    """,
)

# ------------------------------------------------------------------- scalars

_reg(
    "scalar_datetime",
    lambda s, d: sc.scalar_datetime(load(s, d, "orders")),
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           count(*) AS n
    FROM orders GROUP BY 1, 2, 3
    """,
)

_reg(
    "scalar_string",
    lambda s, d: sc.scalar_string(load(s, d, "part")),
    """
    SELECT p_partkey,
           lower(p_name) AS lname,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_name, 1, 5) AS prefix5,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    """,
)

_reg(
    "scalar_math",
    lambda s, d: sc.scalar_math(load(s, d, "lineitem")),
    """
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice) AS BIGINT) AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
           round(l_extendedprice, 1) AS rnd1,
           abs(l_discount - 0.05) AS adiff,
           sqrt(l_quantity) AS sq,
           CAST(l_orderkey % 7 AS BIGINT) AS m7
    FROM lineitem WHERE l_orderkey < 100
    """,
)

_reg(
    "scalar_array",
    lambda s, d: sc.scalar_array(load(s, d, "embeddings")),
    """
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings)
    SELECT vec_id,
           CAST(len(v) AS BIGINT) AS dim,
           v[1] AS first_el,
           round(list_sum(v), 5) AS el_sum,
           round(list_sum(v[1:8]), 5) AS head8_sum
    FROM e
    """,
)

_reg(
    "scalar_map",
    lambda s, d: sc.scalar_map(load(s, d, "events")),
    """
    WITH kv AS (
      SELECT len(json_keys(props)) AS n_keys,
             unnest(json_keys(props)) AS key, props
      FROM events)
    SELECT key, count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.' || key) AS BIGINT)) AS BIGINT) AS sum_val,
           CAST(min(CAST(json_extract(props, '$.' || key) AS BIGINT)) AS BIGINT) AS min_val,
           CAST(max(CAST(json_extract(props, '$.' || key) AS BIGINT)) AS BIGINT) AS max_val,
           CAST(sum(n_keys) AS BIGINT) AS sum_keys
    FROM kv GROUP BY key
    """,
)

_reg(
    "scalar_json",
    lambda s, d: sc.scalar_json(load(s, d, "events")),
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)

# ----------------------------------------------------------------- streaming
# Each op is a Structured Streaming program run in batch-equivalence mode
# (AvailableNow trigger drained to a sink; see kdb_spark/streaming.py). The
# oracle is the equivalent batch SQL — the standard streaming correctness
# contract, so these get full value-hash checks, not rows-only.

_reg(
    "ingest_stream",
    lambda s, d: sm.ingest_stream(s, d, NOW_JAN20),
    f"""
    SELECT epoch_us(ts) - epoch_us(ts) % {DAY_US} AS bucket_us,
           CASE WHEN epoch_us(ts) > {NOW_JAN20} THEN 'future' ELSE 'ok' END AS status,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)

_reg(
    "stream_tumbling_agg",
    sm.stream_tumbling_agg,
    """
    SELECT event_type,
           epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
)

_reg(
    "stream_sliding_agg",
    sm.stream_sliding_agg,
    """
    WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, value FROM events),
    x AS (
      SELECT event_type, ts_us - ts_us % 3600000000 AS w, value FROM e
      UNION ALL
      SELECT event_type, ts_us - ts_us % 3600000000 - 3600000000 AS w, value FROM e)
    SELECT event_type, w AS win_start_us, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM x GROUP BY 1, 2
    """,
)

_reg(
    "stream_session_agg",
    sm.stream_session_agg,
    """
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
    o AS (SELECT user_id, ts_us, value,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w >= 1800000000
                      THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
    s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM o)
    SELECT user_id,
           min(ts_us) AS session_start_us,
           max(ts_us) + 1800000000 AS session_end_us,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM s GROUP BY user_id, sid
    """,
)

_reg(
    "stream_stream_join",
    sm.stream_stream_join,
    """
    SELECT e.event_id, e.user_id, count(*) AS n_clicks
    FROM events e JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click'
     AND epoch_us(c.ts) >= epoch_us(e.ts)
     AND epoch_us(c.ts) < epoch_us(e.ts) + 600000000
    WHERE e.event_type = 'error'
    GROUP BY 1, 2
    """,
)

_reg(
    "stream_dedup",
    sm.stream_dedup,
    f"""
    SELECT DISTINCT user_id, event_type,
           epoch_us(ts) - epoch_us(ts) % {DAY_US} AS day_us
    FROM events
    """,
)

_reg(
    "stream_counter_delta",
    sm.stream_counter_delta,
    """
    SELECT user_id, event_type, ts_us, event_id, delta FROM (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             value - lag(value) OVER (PARTITION BY user_id, event_type
                                      ORDER BY epoch_us(ts), event_id) AS delta
      FROM events) WHERE delta IS NOT NULL
    """,
)

# The bounded 16-row horizon of win_ewma is what makes its streaming port
# O(1) state per series; the oracle is the SAME integer lag chain the batch
# op uses (the stateful body reproduces the exact int64 fold + DIV round).
_reg(
    "stream_ewma",
    sm.stream_ewma,
    _EWMA_ORACLE,
)

# win_zscore's bounded frame ports to streaming the same way win_ewma's
# horizon does — 31 cent-samples of state; integer frame sums make the
# parity exact with no float caveats. Oracle = the batch window SQL.
_reg(
    "stream_zscore",
    sm.stream_zscore,
    _ORACLE["win_zscore"],
)

# the streaming state IS agg_quantile_sketch's mergeable histogram, so the
# drained final rows share the batch op's oracle verbatim
_reg(
    "stream_quantile",
    sm.stream_quantile,
    _ORACLE["agg_quantile_sketch"],
)

_reg(
    "stream_latest_state",
    sm.stream_latest_state,
    """
    SELECT user_id, event_type, ts_us AS last_ts_us, value AS last_value FROM (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)


# ------------------------------------------------------------------- LLM ops

_reg(
    "dedup_exact",
    lambda s, d: dd.dedup_exact(load(s, d, "documents")),
    """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
)

_NGRAM_JACCARD_SQL = """
WITH d AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]) AS sh
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)),
flat AS (SELECT doc_id, unnest(sh) AS s FROM d),
sizes AS (SELECT doc_id, len(sh) AS n_sh FROM d),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM flat a JOIN flat b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
"""

_reg(
    "dedup_ngram_jaccard",
    lambda s, d: dd.dedup_ngram_jaccard(load(s, d, "documents")),
    _NGRAM_JACCARD_SQL,
)

_reg(
    "dedup_substring",
    lambda s, d: dd.dedup_substring(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    w AS (SELECT doc_id, array_to_string(toks[i:i+15], ' ') AS span
          FROM t CROSS JOIN unnest(range(1, len(toks) - 16 + 2)) s(i)
          WHERE len(toks) >= 16),
    h AS (SELECT span_hash, doc_id FROM (
            SELECT ('0x' || substr(md5(span), 1, 15))::BIGINT AS span_hash, doc_id
            FROM w) WHERE span_hash % 8 = 0)
    SELECT span_hash,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occ,
           min(doc_id) AS min_doc
    FROM h GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2
    """,
)

# MinHash-LSH: probabilistic candidates, exact verify. The oracle is the
# exact-jaccard ground truth; at 16 bands × 2 rows recall at j>=0.5 is ~0.99
# (≈1 at the j>=0.9 pairs this corpus contains) — verified equal at sf0.01.
_reg(
    "dedup_near_minhash",
    lambda s, d: dd.dedup_near_minhash(load(s, d, "documents")),
    _NGRAM_JACCARD_SQL,
)

# Cross-corpus (incremental-ingest) dedup: oracle = exact jaccard across the
# md5-slot split, aggregated per incoming doc. Same recall argument as
# dedup_near_minhash (16×2 banding, ≥0.99 at j≥0.5; exact verify). Shared by
# the batch op and its streaming twin (stream-static LSH join), whose drained
# result must converge to the same answer.
_CROSS_CORPUS_SQL = """
    WITH d AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 20
               AS incoming,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            FOR i IN range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents)
      WHERE len(toks) >= 3),
    flat AS (SELECT doc_id, incoming, unnest(sh) AS s FROM d),
    sizes AS (SELECT doc_id, len(sh) AS n_sh FROM d),
    inter AS (
      SELECT n.doc_id AS doc_new, b.doc_id AS doc_base, count(*) AS n_inter
      FROM flat n JOIN flat b ON n.s = b.s AND n.incoming AND NOT b.incoming
      GROUP BY 1, 2),
    j AS (
      SELECT doc_new, doc_base,
             n_inter / (sn.n_sh + sb.n_sh - n_inter) AS jaccard
      FROM inter
      JOIN sizes sn ON sn.doc_id = doc_new
      JOIN sizes sb ON sb.doc_id = doc_base
      WHERE n_inter / (sn.n_sh + sb.n_sh - n_inter) >= 0.5)
    SELECT doc_new AS doc_id,
           CAST(count(*) AS BIGINT) AS n_dups,
           min(doc_base) AS min_base,
           max(jaccard) AS best_jaccard
    FROM j GROUP BY 1
    """

_reg(
    "dedup_cross_corpus",
    lambda s, d: dd.dedup_cross_corpus(load(s, d, "documents")),
    _CROSS_CORPUS_SQL,
)

_reg(
    "stream_cross_dedup",
    lambda s, d: sm.stream_cross_dedup(s, d),
    _CROSS_CORPUS_SQL,
)

# Fuzzy entity matching over part names: the oracle replays the q-gram
# blocking exactly (blocking is part of the operator contract — see
# dedup_fuzzy's docstring for the provable-recall length bound), and both
# engines implement classic Levenshtein.
_reg(
    "dedup_fuzzy",
    lambda s, d: dd.dedup_fuzzy(load(s, d, "part")),
    """
    WITH names AS (
      SELECT lower(p_name) AS name, CAST(count(*) AS BIGINT) AS n_rows
      FROM part GROUP BY 1 HAVING length(lower(p_name)) >= 3),
    g AS (
      SELECT DISTINCT name,
             unnest([substr(name, i, 3) FOR i IN range(1, length(name) - 1)]) AS g
      FROM names),
    cand AS (
      SELECT DISTINCT a.name AS name_a, b.name AS name_b
      FROM g a JOIN g b ON a.g = b.g AND a.name < b.name)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist,
           na.n_rows AS n_rows_a, nb.n_rows AS n_rows_b
    FROM cand
    JOIN names na ON na.name = name_a
    JOIN names nb ON nb.name = name_b
    WHERE levenshtein(name_a, name_b) <= 2
    """,
)

def _simhash_oracle() -> str:
    """DuckDB mirror of simhash64 + band blocking: md5 token hashes are
    byte-identical across engines, so the 64 ±1 sums, the assembled
    signature, and the hamming verify all value-match exactly."""
    sums = ",\n             ".join(
        f"sum(CASE WHEN ({'h1' if i < 32 else 'h2'} >> {i % 32}) & 1 = 1"
        f" THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    consts = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]
    sim = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {'(-9223372036854775807 - 1)' if i == 63 else consts[i]}::BIGINT ELSE 0 END)"
        for i in range(64)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
      FROM documents),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5(t), 1, 8))::BIGINT AS h1,
             ('0x' || substr(md5(t), 9, 8))::BIGINT AS h2
      FROM tok),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM h GROUP BY doc_id),
    sh AS (SELECT doc_id, {sim} AS simhash FROM sums),
    bands AS (
      SELECT doc_id, simhash, t.band, (simhash >> (t.band * 16)) & 65535 AS bits
      FROM sh, (VALUES (0), (1), (2), (3)) t(band))
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    """


_reg(
    "dedup_simhash",
    lambda s, d: dd.dedup_simhash(load(s, d, "documents")),
    _simhash_oracle(),
)

_reg(
    "dedup_cluster",
    lambda s, d: dd.dedup_cluster(load(s, d, "documents")),
    f"""
    WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL.replace("SELECT doc_a", "SELECT doc_a").strip()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
    SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS canonical_id
    FROM reach GROUP BY a
    """,
)

_reg(
    "text_stats",
    lambda s, d: tx.text_stats(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, text,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents)
    , c AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_m,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
             CAST(coalesce(list_sum([CAST(length(t) AS BIGINT) FOR t IN toks]),
                           0) AS BIGINT) AS sum_len,
             CAST(len([t FOR t IN toks IF list_contains(['the','a','of','and','to','in','is'], t)]) AS BIGINT) AS n_stop,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
      FROM t)
    SELECT doc_id, n_chars_m, n_tokens, n_uniq,
           CAST(CAST((20000 * CAST(sum_len AS HUGEINT) + greatest(n_tokens, 1))
                     // (2 * CAST(greatest(n_tokens, 1) AS HUGEINT)) AS BIGINT)
                AS DOUBLE) / 1e4 AS avg_tok_len,
           n_stop, n_digits
    FROM c
    """,
)

_reg(
    "lang_id",
    lambda s, d: tx.lang_id(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, lang,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    r AS (SELECT doc_id, lang,
                 CAST(len([t FOR t IN toks IF list_contains(['the','a','of','and','to','in','is'], t)]) AS BIGINT) AS hits,
                 CAST(greatest(len(toks), 1) AS BIGINT) AS nt
          FROM t)
    SELECT doc_id, lang,
           CAST(CAST((2000000 * CAST(hits AS HUGEINT) + nt)
                     // (2 * CAST(nt AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS stop_ratio,
           CASE WHEN hits / nt >= 0.05 THEN 'en' ELSE 'unk' END AS pred
    FROM r
    """,
)

_reg(
    "token_count_bpe",
    lambda s, d: tx.token_count_bpe(load(s, d, "documents")),
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_word_tokens
    FROM documents
    """,
)

_reg(
    "quality_score",
    lambda s, d: tx.quality_score(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, text,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    r AS (SELECT doc_id,
                 len(toks) AS n_toks,
                 len([x FOR x IN toks IF list_contains(['the','a','of','and','to','in','is'], x)])
                   / greatest(len(toks), 1) AS stop_ratio,
                 len(regexp_extract_all(text, '[0-9]')) / greatest(length(text), 1) AS digit_ratio,
                 list_sum([CAST(length(x) AS DOUBLE) FOR x IN toks]) / greatest(len(toks), 1) AS avg_tok
          FROM t),
    s AS (SELECT doc_id,
                 (CASE WHEN n_toks >= 10 THEN 1 ELSE 0 END
                + CASE WHEN stop_ratio >= 0.05 THEN 1 ELSE 0 END
                + CASE WHEN digit_ratio <= 0.3 THEN 1 ELSE 0 END
                + CASE WHEN avg_tok >= 3.0 AND avg_tok <= 12.0 THEN 1 ELSE 0 END) AS score
          FROM r)
    SELECT doc_id, CAST(score AS BIGINT) AS score,
           CASE WHEN score >= 3 THEN 'keep' ELSE 'drop' END AS verdict
    FROM s
    """,
)

_reg(
    "ngram_topk",
    lambda s, d: tx.ngram_topk(load(s, d, "documents")),
    """
    WITH g AS (
      SELECT unnest(list_distinct(
               [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
             )) AS gram
      FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents))
    SELECT gram, count(*) AS n FROM g
    GROUP BY gram ORDER BY n DESC, gram LIMIT 20
    """,
)

_reg(
    "udtf_tokenize",
    lambda s, d: tx.udtf_tokenize(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(unnest(range(len(toks))) AS BIGINT) AS pos,
           unnest(toks) AS token
    FROM t
    """,
)

_reg(
    "doc_fingerprint",
    lambda s, d: tx.doc_fingerprint(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id,
                      [17 * CAST(length(t) AS BIGINT) + ascii(t)
                       FOR t IN regexp_extract_all(lower(text), '[a-z0-9]+')] AS codes
               FROM documents)
    SELECT doc_id,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
                            (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT) AS fingerprint
    FROM t
    """,
)

_reg(
    "text_repetition",
    lambda s, d: tx.text_repetition(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    s AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_trigrams,
                 CAST(len(list_distinct([array_to_string(toks[i:i+2], ' ')
                                         FOR i IN range(1, len(toks) - 1)])) AS BIGINT)
                   AS n_tri_uniq,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq
          FROM t)
    SELECT doc_id, n_tokens, n_trigrams, n_tri_uniq,
           round(1.0 - n_tri_uniq / greatest(n_trigrams, 1), 6) AS rep_tri_ratio,
           round(1.0 - n_uniq / greatest(n_tokens, 1), 6) AS dup_tok_ratio,
           (n_trigrams > 0 AND (1.0 - n_tri_uniq / greatest(n_trigrams, 1)) >= 0.2) AS is_repetitive
    FROM s
    """,
)

_reg(
    "sim_search_topk",
    lambda s, d: sim.sim_search_topk(load(s, d, "embeddings")),
    """
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
    s AS (SELECT q.query_id, n.vec_id AS match_id,
                 list_sum([qv[i] * v[i] FOR i IN range(1, len(v) + 1)]) / (qn * nrm) AS raw
          FROM n CROSS JOIN q WHERE n.vec_id != q.query_id)
    SELECT query_id, match_id, round(raw, 6) AS cos,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, match_id) AS BIGINT) AS rn
    FROM s QUALIFY rn <= 5
    """,
)

_reg(
    "emb_near_dup",
    lambda s, d: sim.emb_near_dup(load(s, d, "embeddings")),
    """
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_sum([a.v[i] * b.v[i] FOR i IN range(1, len(a.v) + 1)])
                 / (a.nrm * b.nrm), 6) AS cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_sum([a.v[i] * b.v[i] FOR i IN range(1, len(a.v) + 1)]) / (a.nrm * b.nrm) >= 0.4
    """,
)

_reg(
    "emb_cluster",
    lambda s, d: sim.emb_cluster(load(s, d, "embeddings")),
    """
    WITH RECURSIVE e AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_sum([a.v[i] * b.v[i] FOR i IN range(1, len(a.v) + 1)])
            / (a.nrm * b.nrm) >= 0.45),
    edges AS (
      SELECT vec_a AS src, vec_b AS dst FROM pairs
      UNION ALL
      SELECT vec_b AS src, vec_a AS dst FROM pairs),
    reach(a, b) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.a, e2.dst FROM reach r JOIN edges e2 ON r.b = e2.src)
    SELECT a AS vec_id, CAST(min(b) AS BIGINT) AS canonical_id
    FROM reach GROUP BY a
    """,
)

_reg(
    "emb_normalize",
    lambda s, d: sim.emb_normalize(load(s, d, "embeddings")),
    """
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm,
                 list_max([abs(x) FOR x IN v]) AS amax FROM e)
    SELECT vec_id,
           round(nrm, 4) AS l2_norm,
           round(CASE WHEN nrm > 0 THEN v[1] / nrm ELSE 0.0 END, 4) AS u0,
           array_to_string(
             [CAST(CASE WHEN amax > 0 THEN CAST(round(127.0 * x / amax) AS INT)
                        ELSE 0 END AS VARCHAR) FOR x IN v], ',') AS q8_csv
    FROM n
    """,
)

def _ann_oracle(n_queries: int = 5, k: int = 5, n_tables: int = 4, n_bits: int = 4) -> str:
    """DuckDB mirror of multi-table sign-LSH ANN. Approximate vs brute
    force, but DETERMINISTIC given the hyperplanes — which are plan-time
    literals from a seeded PRNG, so the oracle inlines the exact same
    floats (repr round-trips to the identical double) and reproduces
    buckets, candidates, and scores value-for-value."""
    from kdb_spark.llm.similarity import hyperplanes

    selects = []
    for t in range(n_tables):
        planes = hyperplanes(64, n_bits, seed=42 + 1000 * t)
        bits = " + ".join(
            "(CASE WHEN list_sum([v[i] * ("
            + "[" + ", ".join(repr(x) for x in p) + "]"
            + f")[i] FOR i IN range(1, 65)]) > 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        selects.append(f"SELECT vec_id, v, nrm, {t} AS tbl, {bits} AS bkt FROM n")
    union = "\n      UNION ALL ".join(selects)
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    b AS ({union}),
    q AS (SELECT vec_id AS query_id, tbl, bkt FROM b WHERE vec_id < {n_queries}),
    cand AS (
      SELECT DISTINCT q.query_id, b.vec_id AS match_id
      FROM b JOIN q USING (tbl, bkt) WHERE b.vec_id <> q.query_id),
    scored AS (
      SELECT c.query_id, c.match_id,
             list_sum([a.v[i] * m.v[i] FOR i IN range(1, 65)]) / (a.nrm * m.nrm) AS raw
      FROM cand c
      JOIN n a ON a.vec_id = c.query_id
      JOIN n m ON m.vec_id = c.match_id)
    SELECT query_id, match_id, round(raw, 6) AS cos,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, match_id) AS BIGINT) AS rn
    FROM scored QUALIFY rn <= {k}
    """


_reg(
    "ann_search_topk",
    lambda s, d: sim.ann_search_topk(load(s, d, "embeddings")),
    _ann_oracle(),
)

# IVF probes a subset of lists (approximate vs brute force) but every step —
# deterministic init, one Lloyd refinement, stable nearest-centroid ties —
# is reproducible, so the unrolled CTE chain value-checks it exactly.
_IVF_DOT = "list_sum([{a}[i] * {b}[i] FOR i IN range(1, 65)])"


def _ivf_oracle(n_queries: int = 5, k: int = 5, n_clusters: int = 16, nprobe: int = 2) -> str:
    dot_nc = _IVF_DOT.format(a="n.v", b="c.cv")
    dot_qm = _IVF_DOT.format(a="q.v", b="m.v")
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    c0 AS (SELECT vec_id AS cid, v AS cv,
                  sqrt(list_sum([x * x FOR x IN v])) AS cnrm
           FROM e WHERE vec_id < {n_clusters}),
    a0 AS (
      SELECT n.vec_id, c.cid,
             row_number() OVER (PARTITION BY n.vec_id
               ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
      FROM n CROSS JOIN c0 c),
    asg0 AS (SELECT vec_id, cid FROM a0 WHERE rk = 1),
    mdim AS (
      SELECT a.cid, t.i AS pos, avg(e.v[t.i]) AS x
      FROM asg0 a JOIN e ON e.vec_id = a.vec_id
      CROSS JOIN range(1, 65) t(i)
      GROUP BY a.cid, t.i),
    c1l AS (SELECT cid, list(x ORDER BY pos) AS cv FROM mdim GROUP BY cid),
    c1 AS (SELECT cid, cv, sqrt(list_sum([y * y FOR y IN cv])) AS cnrm FROM c1l),
    corpus AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c1 c) WHERE rk = 1),
    qprobe AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c1 c WHERE n.vec_id < {n_queries}) WHERE rk <= {nprobe}),
    scored AS (
      SELECT p.query_id, x.vec_id AS match_id,
             {dot_qm} / (q.nrm * m.nrm) AS raw
      FROM qprobe p
      JOIN corpus x ON x.cid = p.cid AND x.vec_id <> p.query_id
      JOIN n q ON q.vec_id = p.query_id
      JOIN n m ON m.vec_id = x.vec_id)
    SELECT query_id, match_id, round(raw, 6) AS cos,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, match_id) AS BIGINT) AS rn
    FROM scored QUALIFY rn <= {k}
    """


_reg(
    "ivf_search_topk",
    lambda s, d: sim.ivf_search_topk(load(s, d, "embeddings")),
    _ivf_oracle(),
)


def _pq_oracle(n_queries: int = 5, k: int = 5, m: int = 16, ksub: int = 32) -> str:
    """SQL mirror of pq_search_topk's deterministic construction: normalize,
    split into m 4-dim subspaces, seeded init + one Lloyd step per
    subspace (empty codewords drop out of the GROUP BY), encode by argmin
    L2 (ties → lowest codeword), ADC-score, top-k."""
    sd = 64 // m
    l2 = (
        "list_sum([(v.sv[i] - c.cv[i]) * (v.sv[i] - c.cv[i]) "
        f"FOR i IN range(1, {sd + 1})])"
    )
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id,
                 [x / greatest(sqrt(list_sum([y * y FOR y IN v])), 1e-30) FOR x IN v] AS nv
          FROM e),
    subv AS (SELECT vec_id, t.s AS sub, nv[t.s * {sd} + 1 : t.s * {sd} + {sd}] AS sv
             FROM n CROSS JOIN range(0, {m}) t(s)),
    c0 AS (SELECT sub, vec_id AS cid, sv AS cv FROM subv WHERE vec_id < {ksub}),
    a0 AS (SELECT v.vec_id, v.sub, c.cid,
                  row_number() OVER (PARTITION BY v.vec_id, v.sub
                    ORDER BY {l2} ASC, c.cid) AS rk
           FROM subv v JOIN c0 c ON c.sub = v.sub),
    asg0 AS (SELECT vec_id, sub, cid FROM a0 WHERE rk = 1),
    mdim AS (SELECT a.sub, a.cid, t.i AS pos, avg(v.sv[t.i]) AS x
             FROM asg0 a JOIN subv v ON v.vec_id = a.vec_id AND v.sub = a.sub
             CROSS JOIN range(1, {sd + 1}) t(i)
             GROUP BY a.sub, a.cid, t.i),
    c1 AS (SELECT sub, cid, list(x ORDER BY pos) AS cv FROM mdim GROUP BY sub, cid),
    codes AS (SELECT vec_id, sub, cid FROM (
        SELECT v.vec_id, v.sub, c.cid,
               row_number() OVER (PARTITION BY v.vec_id, v.sub
                 ORDER BY {l2} ASC, c.cid) AS rk
        FROM subv v JOIN c1 c ON c.sub = v.sub) WHERE rk = 1),
    adc AS (SELECT v.vec_id AS query_id, c.sub, c.cid,
                   list_sum([v.sv[i] * c.cv[i] FOR i IN range(1, {sd + 1})]) AS qd
            FROM subv v JOIN c1 c ON c.sub = v.sub WHERE v.vec_id < {n_queries}),
    scored AS (SELECT a.query_id, x.vec_id AS match_id, sum(a.qd) AS score_pq
               FROM codes x JOIN adc a ON a.sub = x.sub AND a.cid = x.cid
               WHERE x.vec_id <> a.query_id
               GROUP BY 1, 2)
    SELECT query_id, match_id, round(score_pq, 6) AS score_pq,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_pq DESC, match_id) AS BIGINT) AS rn
    FROM scored QUALIFY rn <= {k}
    """


_reg(
    "pq_search_topk",
    lambda s, d: sim.pq_search_topk(load(s, d, "embeddings")),
    _pq_oracle(),
)


def _pca_oracle(n_components: int = 2, iters: int = 8, d: int = 64) -> str:
    """Symbolic mirror of emb_pca: covariance from raw moments, fixed-e₁
    power iteration (unrolled), deflation, map-side projection. The
    matrix lives as a (i, j, c) table; each iteration is one matvec join
    + one normalization subquery."""
    ctes = [
        f"e AS MATERIALIZED (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings)",
        f"dims AS MATERIALIZED (SELECT i FROM range(1, {d + 1}) t(i))",
        "mu AS MATERIALIZED (SELECT i, avg(v[i]) AS m FROM e CROSS JOIN dims GROUP BY i)",
        """c0 AS MATERIALIZED (SELECT di.i AS i, dj.i AS j, avg(e.v[di.i] * e.v[dj.i]) AS raw
       FROM e CROSS JOIN dims di CROSS JOIN dims dj GROUP BY 1, 2)""",
        """cov1 AS MATERIALIZED (SELECT c0.i, c0.j, c0.raw - a.m * b.m AS c
       FROM c0 JOIN mu a ON a.i = c0.i JOIN mu b ON b.i = c0.j)""",
    ]
    projs = []
    for comp in range(1, n_components + 1):
        cv = f"cov{comp}"
        ctes.append(
            f"v{comp}_0 AS MATERIALIZED (SELECT i, CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END AS x FROM dims)"
        )
        for it in range(1, iters + 1):
            prev = f"v{comp}_{it - 1}"
            raw = f"v{comp}_{it}r"
            ctes.append(
                f"{raw} AS MATERIALIZED (SELECT {cv}.i, sum({cv}.c * v.x) AS x "
                f"FROM {cv} JOIN {prev} v ON v.i = {cv}.j GROUP BY 1)"
            )
            ctes.append(
                f"v{comp}_{it} AS MATERIALIZED (SELECT i, x / (SELECT sqrt(sum(x * x)) FROM {raw}) AS x FROM {raw})"
            )
        vfin = f"v{comp}_{iters}"
        ctes.append(
            f"lam{comp} AS MATERIALIZED (SELECT sum({cv}.c * a.x * b.x) AS l "
            f"FROM {cv} JOIN {vfin} a ON a.i = {cv}.i JOIN {vfin} b ON b.i = {cv}.j)"
        )
        if comp < n_components:
            ctes.append(
                f"cov{comp + 1} AS MATERIALIZED (SELECT {cv}.i, {cv}.j, "
                f"{cv}.c - (SELECT l FROM lam{comp}) * a.x * b.x AS c "
                f"FROM {cv} JOIN {vfin} a ON a.i = {cv}.i JOIN {vfin} b ON b.i = {cv}.j)"
            )
        ctes.append(
            f"p{comp} AS MATERIALIZED (SELECT e.vec_id, sum(e.v[w.i] * w.x) AS dotv "
            f"FROM e CROSS JOIN {vfin} w GROUP BY 1)"
        )
        ctes.append(
            f"s{comp} AS MATERIALIZED (SELECT sum(mu.m * w.x) AS sh FROM mu JOIN {vfin} w USING (i))"
        )
        projs.append(
            f"round(p{comp}.dotv - (SELECT sh FROM s{comp}), 4) AS pc{comp}"
        )
    joins = " ".join(
        f"JOIN p{c} ON p{c}.vec_id = p1.vec_id" for c in range(2, n_components + 1)
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT p1.vec_id, {', '.join(projs)} FROM p1 {joins}"
    )


_reg(
    "emb_pca",
    lambda s, d: sim.emb_pca(load(s, d, "embeddings")),
    _pca_oracle(),
)

def _mm_summary(s: SparkSession, d: str) -> DataFrame:
    """multimodal_table projected to its oracle-comparable summary (the
    binary payload itself is checked via byte length)."""
    from pyspark.sql import functions as F

    t = mm.multimodal_table(load(s, d, "documents"), load(s, d, "embeddings"))
    return t.select(
        "doc_id",
        F.length("payload").cast("long").alias("byte_len"),
        F.col("meta.lang").alias("lang"),
        F.size("embedding").cast("long").alias("dim"),
        F.col("meta.label").alias("label"),
    )


_reg(
    "multimodal_table",
    _mm_summary,
    """
    SELECT d.doc_id,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS byte_len,
           d.lang,
           CAST(len(e.embedding) AS BIGINT) AS dim,
           CAST(e.label AS BIGINT) AS label
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)

_reg(
    "mm_frame_sample",
    lambda s, d: mm.mm_frame_sample(
        mm.multimodal_table(load(s, d, "documents"), load(s, d, "embeddings"))
    ),
    """
    WITH b AS (
      SELECT d.doc_id, CAST(octet_length(encode(d.text)) AS BIGINT) AS blen
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
    f AS (
      SELECT doc_id, blen,
             unnest(range(0, CAST(ceil(blen / 64.0) AS BIGINT), 4)) AS frame_idx
      FROM b)
    SELECT doc_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * 64 AS BIGINT) AS off_bytes,
           CAST(least(64, blen - frame_idx * 64) AS BIGINT) AS frame_len
    FROM f
    """,
)

# The payload is deterministic utf-8 bytes (ASCII corpus), so the oracle
# recomputes the byte-block signature from character codes — the one case
# where a binary-column op gets an exact SQL mirror.
_reg(
    "mm_phash_dedup",
    lambda s, d: mm.mm_phash_dedup(
        mm.multimodal_table(load(s, d, "documents"), load(s, d, "embeddings"))
    ),
    """
    WITH ch AS (
      SELECT d.doc_id, [unicode(x) FOR x IN string_split(d.text, '')] AS codes
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      WHERE length(d.text) > 0),
    pos AS (
      SELECT doc_id, unnest(codes) AS code,
             generate_subscripts(codes, 1) AS pos, len(codes) AS n
      FROM ch),
    blk AS (
      SELECT doc_id, ((pos - 1) * 32) // n AS block, n,
             sum(code) AS bsum, count(*) AS cnt
      FROM pos GROUP BY 1, 2, 3),
    tot AS (SELECT doc_id, sum(bsum) AS total FROM blk GROUP BY 1),
    sig AS (
      SELECT b.doc_id,
             sum(CASE WHEN b.bsum * b.n > t.total * b.cnt
                      THEN (CAST(1 AS BIGINT) << b.block) ELSE 0 END) AS phash
      FROM blk b JOIN tot t USING (doc_id) GROUP BY 1),
    bands AS (
      SELECT doc_id, phash, t.b AS band, (phash >> (t.b * 8)) & 255 AS bits
      FROM sig CROSS JOIN range(0, 4) t(b)),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.phash, b.phash)) AS hamming
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
    FROM pairs WHERE hamming <= 6
    """,
)

_reg(
    "mm_features",
    lambda s, d: mm.mm_features(
        mm.multimodal_table(load(s, d, "documents"), load(s, d, "embeddings"))
    ),
    """
    SELECT d.doc_id,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS byte_len,
           CAST(ascii(substr(d.text, 1, 1)) AS BIGINT) AS first_byte,
           d.lang
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)

_reg(
    "mm_decode_features",
    lambda s, d: mm.mm_decode_features(mm.mm_bmp_table(load(s, d, "documents"))),
    # the decoded channel sums have closed forms in (doc_id, n_chars, w, h):
    # B=(doc_id%200)+x, G=(n_chars%200)+y, R=x+y over the w×h pixel grid —
    # so the oracle adjudicates the REAL encode→parse→sum round-trip
    """
    WITH g AS (
      SELECT doc_id, n_chars,
             5 + doc_id % 3 AS w, 5 + doc_id % 4 AS h
      FROM documents)
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(h * w * (doc_id % 200) + h * (w * (w - 1) // 2) AS BIGINT) AS sum_b,
           CAST(w * h * (n_chars % 200) + w * (h * (h - 1) // 2) AS BIGINT) AS sum_g,
           CAST(h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2) AS BIGINT) AS sum_r
    FROM g
    """,
)

_reg(
    "mm_audio_features",
    lambda s, d: mm.mm_audio_features(mm.mm_wav_table(load(s, d, "documents"))),
    # sample i of doc d is (d*7 + i) mod 255; per-frame energy/peak are sums
    # over generate_series — the oracle replays the REAL WAV encode→parse→
    # frame round-trip sample by sample
    """
    WITH s AS (
      SELECT d.doc_id, f.range AS frame_idx, i.range AS i,
             (d.doc_id * 7 + f.range * 256 + i.range) % 255 - 128 AS dev
      FROM documents d, range(0, 4) f, range(0, 256) i)
    SELECT doc_id, frame_idx,
           CAST(256 AS BIGINT) AS n_samples,
           CAST(sum(dev * dev) AS BIGINT) AS energy,
           CAST(max(abs(dev)) AS BIGINT) AS peak
    FROM s GROUP BY 1, 2
    """,
)

_reg(
    "dataset_split",
    lambda s, d: cu.dataset_split(load(s, d, "documents")),
    """
    WITH b AS (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
               FROM documents)
    SELECT doc_id, bucket,
           CASE WHEN bucket < 'c0' THEN 'train'
                WHEN bucket < 'e0' THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)

_reg(
    "sample_hash",
    lambda s, d: cu.sample_hash(load(s, d, "documents"), pct=10),
    """
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 10
    """,
)

_reg(
    "pii_redact",
    lambda s, d: cu.pii_redact(load(s, d, "documents")),
    r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{10,}', '<NUM>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '[0-9]{10,}')) AS BIGINT) AS n_longnums
    FROM documents
    """,
)

_reg(
    "pack_sequences",
    lambda s, d: cu.pack_sequences(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 64 AS bucket,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tok
      FROM documents),
    c AS (
      SELECT doc_id, bucket, n_tok,
             sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id) - n_tok AS start_off
      FROM t)
    SELECT doc_id, bucket, n_tok,
           CAST(bucket * 1000000000 + start_off // 256 AS BIGINT) AS pack_id,
           CAST(start_off % 256 AS BIGINT) AS pack_offset
    FROM c
    """,
)

_reg(
    "chunk_documents",
    lambda s, d: cu.chunk_documents(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(1, CAST(ceil((len(toks) - 8) / 56.0) AS INT)))) AS chunk_id
      FROM t)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(toks[chunk_id * 56 + 1 : chunk_id * 56 + 64], ' ') AS chunk_text,
           CAST(least(len(toks) - chunk_id * 56, 64) AS BIGINT) AS n_tok_chunk
    FROM c
    """,
)

_reg(
    "stratified_sample",
    lambda s, d: cu.stratified_sample(load(s, d, "documents")),
    """
    SELECT doc_id, lang, source FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 <
          CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50 WHEN 'fr' THEN 25 ELSE 0 END
    """,
)

_reg(
    "quality_rarity",
    lambda s, d: tx.quality_rarity(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id,
                      unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
               FROM documents),
    f AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1),
    j AS (SELECT doc_id, cnt FROM t JOIN f USING (tok))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(cnt) AS BIGINT) AS sum_freq,
           round(CAST(sum(cnt) AS DOUBLE) / count(*), 6) AS avg_tok_freq
    FROM j GROUP BY 1
    """,
)

_reg(
    "mix_weights",
    lambda s, d: cu.mix_weights(load(s, d, "documents")),
    """
    WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(n_chars) AS BIGINT) AS chars
                 FROM documents GROUP BY 1),
    tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS k
            FROM per)
    SELECT source, n_docs, chars AS n_chars_sum,
           round(least(1.0, (CAST(total AS DOUBLE) / k) / chars), 6) AS mix_rate,
           CAST(round(round(least(1.0, (CAST(total AS DOUBLE) / k) / chars), 6)
                      * chars) AS BIGINT) AS expected_chars
    FROM per CROSS JOIN tot
    """,
)

# Composition proof: normalize → quality-gate → content-hash dedup →
# md5-bucket split → per-split accounting, one content-hash shuffle total.
_reg(
    "pipeline_corpus_prep",
    lambda s, d: cu.pipeline_corpus_prep(load(s, d, "documents")),
    r"""
    WITH c AS (
      SELECT doc_id, text,
             lower(trim(regexp_replace(
               regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
               '[\s]+', ' ', 'g'))) AS norm_text,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    r AS (SELECT doc_id, norm_text,
                 len(toks) AS n_toks,
                 len([x FOR x IN toks
                      IF list_contains(['the','a','of','and','to','in','is'], x)])
                   / greatest(len(toks), 1) AS stop_ratio,
                 len(regexp_extract_all(text, '[0-9]'))
                   / greatest(length(text), 1) AS digit_ratio,
                 list_sum([CAST(length(x) AS DOUBLE) FOR x IN toks])
                   / greatest(len(toks), 1) AS avg_tok
          FROM c),
    kept AS (
      SELECT doc_id, md5(norm_text) AS h,
             CAST(length(norm_text) AS BIGINT) AS n_chars_norm,
             CAST(len(regexp_extract_all(norm_text, '[a-z0-9]+')) AS BIGINT)
               AS n_toks_norm
      FROM r
      WHERE (CASE WHEN n_toks >= 10 THEN 1 ELSE 0 END
           + CASE WHEN stop_ratio >= 0.05 THEN 1 ELSE 0 END
           + CASE WHEN digit_ratio <= 0.3 THEN 1 ELSE 0 END
           + CASE WHEN avg_tok >= 3.0 AND avg_tok <= 12.0 THEN 1 ELSE 0 END) >= 3),
    canon AS (
      SELECT h, min(doc_id) AS doc_id,
             min(n_chars_norm) AS n_chars_norm, min(n_toks_norm) AS n_toks_norm
      FROM kept GROUP BY h),
    s AS (
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e0' THEN 'val'
                  ELSE 'test' END AS split,
             n_chars_norm, n_toks_norm
      FROM canon)
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars_norm) AS BIGINT) AS n_chars_sum,
           CAST(sum(n_toks_norm) AS BIGINT) AS n_tokens_sum
    FROM s GROUP BY 1
    """,
)

_reg(
    "mix_apply",
    lambda s, d: cu.mix_apply(load(s, d, "documents")),
    """
    WITH per AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
                 FROM documents GROUP BY 1),
    tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS k FROM per),
    rates AS (
      SELECT source,
             round(least(1.0, (CAST(total AS DOUBLE) / k) / chars), 6) AS mix_rate
      FROM per CROSS JOIN tot)
    SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d JOIN rates r USING (source)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT % 1000000
          < CAST(round(r.mix_rate * 1000000) AS BIGINT)
    """,
)

_reg(
    "token_histogram",
    lambda s, d: tx.token_histogram(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tok
      FROM documents)
    SELECT CAST(pow(2, floor(log2(greatest(n_tok, 1)))) AS BIGINT) AS bin_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM t GROUP BY 1
    """,
)

_reg(
    "text_normalize",
    lambda s, d: tx.text_normalize(load(s, d, "documents")),
    r"""
    WITH c AS (
      SELECT doc_id, text,
             lower(trim(regexp_replace(
               regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
               '[\s]+', ' ', 'g'))) AS norm_text
      FROM documents)
    SELECT doc_id, norm_text,
           CAST(length(text) - length(norm_text) AS BIGINT) AS chars_removed
    FROM c
    """,
)

_reg(
    "decontaminate",
    lambda s, d: cu.decontaminate(load(s, d, "documents")),
    """
    WITH d AS (
      SELECT doc_id,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= 'e0' AS is_test,
             list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)),
    flat AS (SELECT doc_id, is_test, unnest(sh) AS s FROM d),
    ev AS (SELECT DISTINCT s FROM flat WHERE is_test)
    SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM flat f JOIN ev ON f.s = ev.s
    WHERE NOT f.is_test
    GROUP BY f.doc_id
    """,
)

def _kmeans_oracle(n_clusters: int = 8, iters: int = 3) -> str:
    """DuckDB mirror of emb_kmeans: the fixed ``iters`` Lloyd rounds unroll
    into a generated CTE chain (assign → per-dim means → coalesce empty
    clusters with their previous centroid), so even the "iterative" op gets
    an exact value check. Same assignment convention as ivf: cosine,
    ties → lowest cluster id."""
    dot = "list_sum([n.v[i] * c.cv[i] FOR i IN range(1, 65)])"
    parts = [
        "e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings)",
        "n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e)",
        f"c0l AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {n_clusters})",
        "c0 AS (SELECT cid, cv, sqrt(list_sum([y * y FOR y IN cv])) AS cnrm FROM c0l)",
    ]
    for j in range(iters):
        parts += [
            f"""a{j} AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c{j} c) WHERE rk = 1)""",
            f"""md{j} AS (
      SELECT a.cid, t.i AS pos, avg(e.v[t.i]) AS x
      FROM a{j} a JOIN e ON e.vec_id = a.vec_id
      CROSS JOIN range(1, 65) t(i)
      GROUP BY a.cid, t.i)""",
            f"cl{j} AS (SELECT cid, list(x ORDER BY pos) AS cv FROM md{j} GROUP BY cid)",
            f"""c{j + 1} AS (
      SELECT p.cid, COALESCE(f.cv, p.cv) AS cv,
             sqrt(list_sum([y * y FOR y IN COALESCE(f.cv, p.cv)])) AS cnrm
      FROM c{j} p LEFT JOIN cl{j} f ON f.cid = p.cid)""",
        ]
    parts.append(
        f"""final AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c{iters} c) WHERE rk = 1)"""
    )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
           CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_members
    FROM final
    """


_reg(
    "emb_kmeans",
    lambda s, d: sim.emb_kmeans(load(s, d, "embeddings")),
    _kmeans_oracle(),
)



# ------------------------------------------------------------ round-7 extras
# TF-IDF / BM25 sparse retrieval, PageRank, Markov transitions — the
# indexer/ranker companions to the ANN + dedup families above.

from kdb_spark.analytics import graph as gr  # noqa: E402

_reg(
    "text_tfidf_topk",
    lambda s, d: tx.text_tfidf_topk(load(s, d, "documents")),
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    nn AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
             round(tf * ln(n_docs / df), 6) AS score
      FROM tf JOIN df USING (term) CROSS JOIN nn)
    SELECT doc_id, term, tf, df, score, rnk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term) AS BIGINT) AS rnk
      FROM scored) WHERE rnk <= 5
    """,
)

_reg(
    "text_bm25_topk",
    lambda s, d: tx.text_bm25_topk(load(s, d, "documents")),
    """
    WITH base AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    d AS (SELECT doc_id, len(toks) AS dl,
                 list_filter(toks, t -> t IN ('vector', 'hash', 'merge')) AS hits
          FROM base),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d),
    tfc AS (SELECT doc_id, dl, term, count(*) AS tf
            FROM (SELECT doc_id, dl, unnest(hits) AS term FROM d)
            GROUP BY 1, 2, 3),
    df AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_hits,
           round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * (1.2 + 1.0)
                     / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl
                        / (CAST(sum_dl AS DOUBLE) / n_docs)))), 6) AS bm25
    FROM tfc JOIN df USING (term) CROSS JOIN stats
    GROUP BY doc_id, n_docs, sum_dl
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)

_reg(
    "graph_pagerank",
    lambda s, d: gr.pagerank(gr.trade_graph(load(s, d, "orders"), load(s, d, "lineitem"))),
    """
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s AS src, c AS dst FROM pairs),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    verts AS (SELECT DISTINCT src AS v FROM edges),
    nn AS (SELECT count(*) AS n FROM verts),
    base AS (SELECT v, n FROM verts CROSS JOIN nn),
    r0 AS (SELECT v, 1.0 / n AS r FROM base),
    m1 AS (SELECT e.dst AS v, sum(r.r / d.deg) AS m
           FROM edges e JOIN deg d ON d.src = e.src JOIN r0 r ON r.v = e.src
           GROUP BY e.dst),
    r1 AS (SELECT b.v, (1.0 - 0.85) / b.n + 0.85 * coalesce(m1.m, 0.0) AS r
           FROM base b LEFT JOIN m1 ON m1.v = b.v),
    m2 AS (SELECT e.dst AS v, sum(r.r / d.deg) AS m
           FROM edges e JOIN deg d ON d.src = e.src JOIN r1 r ON r.v = e.src
           GROUP BY e.dst),
    r2 AS (SELECT b.v, (1.0 - 0.85) / b.n + 0.85 * coalesce(m2.m, 0.0) AS r
           FROM base b LEFT JOIN m2 ON m2.v = b.v),
    m3 AS (SELECT e.dst AS v, sum(r.r / d.deg) AS m
           FROM edges e JOIN deg d ON d.src = e.src JOIN r2 r ON r.v = e.src
           GROUP BY e.dst),
    r3 AS (SELECT b.v, (1.0 - 0.85) / b.n + 0.85 * coalesce(m3.m, 0.0) AS r
           FROM base b LEFT JOIN m3 ON m3.v = b.v)
    SELECT r3.v, round(r3.r, 9) AS rank, CAST(deg AS BIGINT) AS out_deg
    FROM r3 JOIN deg ON deg.src = r3.v
    """,
)

# CC over the repeat-trade bipartite graph: the engine side reuses the
# converging min-label Pregel core (dedup.connected_components — pointer
# jumping, edge-vertex-only label table); the oracle is the textbook
# recursive reachability closure + min, tractable because the ≥3-orders
# threshold keeps components small at oracle scale.
_reg(
    "graph_connected_components",
    lambda s, d: _q_graph_cc(s, d),
    """
    WITH RECURSIVE pr AS (
      SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders
      JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) li
        ON o_orderkey = l_orderkey
      GROUP BY 1, 2 HAVING count(*) >= 3),
    edges AS (SELECT a AS src, b AS dst FROM pr
              UNION ALL SELECT b, a FROM pr),
    verts AS (SELECT c_custkey * 2 AS v FROM customer
              UNION SELECT s_suppkey * 2 + 1 FROM supplier),
    reach(a, b) AS (
      SELECT v, v FROM verts
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
    SELECT CAST(a AS BIGINT) AS v, CAST(min(b) AS BIGINT) AS canonical_id
    FROM reach GROUP BY a
    """,
)

# Degree-ordered triangle counting over the customer co-purchase projection
# (≥3 shared parts). The oracle enumerates each triangle once via the
# id-ordered 3-join (a<b<c); the engine's degree orientation finds the
# identical triangle set (both count each exactly once), so the per-vertex
# rollup hash-matches while the engine's plan is the skew-safe one.
_reg(
    "graph_triangle_count",
    lambda s, d: gr.triangle_count(
        # max_per_part is the hub guard (SCALE.md r9): never binds at
        # harness scales (≤53 customers/part at sf0.1) so the oracle
        # compare stays exact, but keeps the salted K=32 probe linear
        gr.co_purchase_edges(
            load(s, d, "orders"), load(s, d, "lineitem"), max_per_part=500
        )
    ),
    """
    WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT a.c AS a, b.c AS b FROM cp a JOIN cp b
          ON a.p = b.p AND a.c < b.c
          GROUP BY 1, 2 HAVING count(*) >= 3),
    d AS (SELECT v, count(*) AS deg FROM
            (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
    tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
            FROM e e1 JOIN e e2 ON e2.a = e1.b
                      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    x AS (SELECT u AS v FROM tri UNION ALL SELECT v FROM tri
          UNION ALL SELECT w FROM tri),
    t AS (SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM x GROUP BY 1)
    SELECT CAST(d.v AS BIGINT) AS v, CAST(d.deg AS BIGINT) AS deg,
           coalesce(t.n_tri, 0) AS n_tri
    FROM d LEFT JOIN t USING (v)
    """,
)


def _q_graph_cc(s: SparkSession, d: str) -> DataFrame:
    from kdb_spark.llm.dedup import connected_components

    edges = gr.repeat_trade_edges(load(s, d, "orders"), load(s, d, "lineitem"))
    universe = (
        load(s, d, "customer")
        .select((F.col("c_custkey") * 2).alias("v"))
        .unionAll(
            load(s, d, "supplier").select((F.col("s_suppkey") * 2 + 1).alias("v"))
        )
    )
    return connected_components(edges, universe).select(
        F.col("doc_id").alias("v"), "canonical_id"
    )


_reg(
    "agg_transitions",
    lambda s, d: bh.agg_transitions(events_us(s, d)),
    """
    WITH p AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev_type,
             event_type AS next_type
      FROM events),
    m AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
          FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
    , w AS (
      SELECT prev_type, next_type, n,
             CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total
      FROM m)
    SELECT prev_type, next_type, n,
           CAST(CAST((2000000 * CAST(n AS HUGEINT) + row_total)
                     // (2 * CAST(row_total AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS prob
    FROM w
    """,
)


_reg(
    "agg_twap",
    lambda s, d: agg.agg_twap(events_us(s, d)),
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS c,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts), event_id) AS t_next
      FROM events)
    , g AS (
      SELECT user_id, event_type,
             CAST(count(*) AS BIGINT) AS n_intervals,
             CAST(sum(t_next - ts_us) AS BIGINT) AS duration_us,
             sum(CAST(c AS HUGEINT) * (t_next - ts_us)) AS scd
      FROM t WHERE t_next IS NOT NULL
      GROUP BY user_id, event_type)
    SELECT user_id, event_type, n_intervals, duration_us,
           CAST((CASE WHEN scd < 0 THEN -1 ELSE 1 END)
                * CAST((20000 * abs(scd) + duration_us)
                       // (2 * CAST(duration_us AS HUGEINT)) AS BIGINT)
                AS DOUBLE) / 1e4 AS twap_c
    FROM g
    """,
)

_reg(
    "win_fby",
    lambda s, d: wn.win_fby(events_us(s, d)),
    """
    SELECT event_id, user_id, event_type, value, grp_max, grp_n FROM (
      SELECT event_id, user_id, event_type, value,
             max(value) OVER w AS grp_max,
             CAST(count(*) OVER w AS BIGINT) AS grp_n
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type))
    WHERE value = grp_max
    """,
)


def _qmean_sql(x: str, grid: str = "16777216.0") -> str:
    """DuckDB mirror of similarity._qmean: exact HUGEINT sum on the grid,
    then the identical double divide-out expression."""
    return (
        f"CAST(sum(CAST(round({x} * {grid}) AS HUGEINT)) AS DOUBLE)"
        f" / (CAST(count(*) AS DOUBLE) * {grid})"
    )


def _emb_outliers_oracle(dim: int = 64) -> str:
    cents = ", ".join(
        f"{_qmean_sql(f'v[{i + 1}]')} AS c{i + 1}" for i in range(dim)
    )
    # left-assoc + chain mirrors Spark's sequential fold order exactly
    sq = " + ".join(f"(v[{i + 1}] - c{i + 1}) * (v[{i + 1}] - c{i + 1})" for i in range(dim))
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
               FROM embeddings),
    c AS (SELECT {cents} FROM e),
    scored AS (SELECT vec_id, sqrt(0.0 + {sq}) AS dist FROM e CROSS JOIN c),
    st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(sum(CAST(round(dist * 1000000.0) AS HUGEINT)) AS DOUBLE) AS s1,
                  CAST(sum(CAST(round(dist * 1000000.0) * round(dist * 1000000.0)
                                AS HUGEINT)) AS DOUBLE) AS s2
           FROM scored),
    zs AS (SELECT vec_id, dist, round(dist * 1000000.0) AS dq, s1 / n AS mu_q,
                  CASE WHEN n > 1.0 AND (s2 - s1 * s1 / n) / (n - 1.0) > 0.0
                       THEN sqrt((s2 - s1 * s1 / n) / (n - 1.0)) END AS sd_q
           FROM scored CROSS JOIN st)
    SELECT vec_id, round(dist, 4) AS dist,
           round((dq - mu_q) / sd_q, 4) AS z,
           (dq - mu_q) / sd_q > 2.0 AS is_outlier
    FROM zs
    """


_reg(
    "emb_outliers",
    lambda s, d: sim.emb_outliers(load(s, d, "embeddings")),
    _emb_outliers_oracle(),
)


_reg(
    "stream_topk",
    sm.stream_topk,
    """
    WITH c AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2)
    SELECT event_type, user_id, n, rnk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY event_type
                 ORDER BY n DESC, user_id) AS BIGINT) AS rnk
      FROM c) WHERE rnk <= 5
    """,
)


_reg(
    "win_bollinger",
    lambda s, d: wn.win_bollinger(events_us(s, d)),
    """
    WITH m AS (
      SELECT event_id, user_id, event_type, value,
             CAST(round(value * 100) AS BIGINT) AS c,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) AS s1,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) AS s2,
             CAST(count(*) OVER w AS DOUBLE) AS n
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
    b AS (
      SELECT event_id, user_id, event_type, value, c, s1 / n AS mu_c,
             CASE WHEN n > 1.0
                  THEN sqrt((s2 - s1 * s1 / n) / (n - 1.0)) END AS sd_c
      FROM m)
    SELECT event_id, user_id, event_type, value,
           round(mu_c / 100.0, 6) AS mid,
           round((mu_c + 2.0 * sd_c) / 100.0, 6) AS upper,
           round((mu_c - 2.0 * sd_c) / 100.0, 6) AS lower,
           CASE WHEN sd_c IS NULL THEN NULL
                WHEN CAST(c AS DOUBLE) > mu_c + 2.0 * sd_c THEN 'above'
                WHEN CAST(c AS DOUBLE) < mu_c - 2.0 * sd_c THEN 'below'
                ELSE 'in' END AS band
    FROM b
    """,
)

_reg(
    "agg_distinct_overlap",
    lambda s, d: agg.agg_distinct_overlap(events_us(s, d)),
    """
    WITH pu AS (
      SELECT event_type, user_id,
             min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(sum(CASE WHEN first_us < 1705276800000000
                          AND last_us >= 1705276800000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_both,
           CAST(sum(CASE WHEN first_us < 1705276800000000
                          AND last_us < 1705276800000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_only_before,
           CAST(sum(CASE WHEN first_us >= 1705276800000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_only_after,
           CAST(count(*) AS BIGINT) AS n_users
    FROM pu GROUP BY event_type
    """,
)


_reg(
    "agg_autocorr",
    lambda s, d: agg.agg_autocorr(events_us(s, d)),
    """
    WITH p AS (
      SELECT user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS x,
             lag(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts), event_id) AS y
      FROM events),
    m AS (
      SELECT user_id, event_type, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM p WHERE y IS NOT NULL
      GROUP BY 1, 2 HAVING count(*) >= 3)
    SELECT user_id, event_type, CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                 AND CAST(n * syy - sy * sy AS DOUBLE) > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE)), 4)
           END AS ac1
    FROM m
    """,
)

_reg(
    "sql_region_revenue",
    lambda s, d: agg.sql_region_revenue(
        load(s, d, "customer"), load(s, d, "orders"), load(s, d, "lineitem"),
        load(s, d, "nation"), load(s, d, "region"),
    ),
    """
    SELECT r.r_name AS region, o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_c
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, o.o_orderpriority
    """,
)

_reg(
    "sql_ship_priority",
    lambda s, d: agg.sql_ship_priority(
        load(s, d, "customer"), load(s, d, "orders"), load(s, d, "lineitem")
    ),
    """
    SELECT l.l_orderkey, epoch_us(o.o_orderdate) AS orderdate_us,
           o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_c
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_c DESC, l.l_orderkey LIMIT 10
    """,
)

_reg(
    "sql_returned_customers",
    lambda s, d: agg.sql_returned_customers(
        load(s, d, "customer"), load(s, d, "orders"), load(s, d, "lineitem"),
        load(s, d, "nation"),
    ),
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_c
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_c DESC, c.c_custkey LIMIT 20
    """,
)

_reg(
    "win_drawdown",
    lambda s, d: wn.win_drawdown(events_us(s, d)),
    """
    WITH m AS (
      SELECT event_id, user_id, event_type, value,
             CAST(round(value * 100) AS BIGINT) AS c,
             max(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_c
      FROM events)
    SELECT event_id, user_id, event_type, value,
           CAST(peak_c AS DOUBLE) / 100.0 AS peak,
           CAST(peak_c - c AS DOUBLE) / 100.0 AS drawdown,
           CAST(CASE WHEN peak_c > 0
                THEN CAST((2000000 * CAST(peak_c - c AS HUGEINT) + peak_c)
                          // (2 * CAST(peak_c AS HUGEINT)) AS BIGINT)
           END AS DOUBLE) / 1e6 AS dd_frac
    FROM m
    """,
)


_reg(
    "win_rsi",
    lambda s, d: wn.win_rsi(events_us(s, d)),
    """
    WITH s AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT)
               - lag(CAST(round(value * 100) AS BIGINT)) OVER w AS d
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id)),
    f AS (
      SELECT event_id, user_id, event_type,
             sum(greatest(d, 0)) OVER wf AS gain,
             sum(greatest(-d, 0)) OVER wf AS loss,
             count(d) OVER wf AS n_d
      FROM s
      WINDOW wf AS (PARTITION BY user_id, event_type
                    ORDER BY ts_us, event_id
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, event_type,
           CAST(n_d AS BIGINT) AS n_deltas,
           CAST(CASE WHEN gain + loss > 0
                THEN CAST((2000000 * CAST(gain AS HUGEINT) + (gain + loss))
                          // (2 * CAST(gain + loss AS HUGEINT)) AS BIGINT)
           END AS DOUBLE) / 1e4 AS rsi
    FROM f
    """,
)


_reg(
    "rollup_serve",
    src.q_rollup_serve,
    """
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
             CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_c,
             CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_c
      FROM events GROUP BY 1, 2)
    SELECT event_type, hour_us, n, sum_c, min_c, max_c,
           CAST((CASE WHEN sum_c < 0 THEN -1 ELSE 1 END)
                * CAST((2000000 * CAST(abs(sum_c) AS HUGEINT) + 100 * n)
                       // (200 * CAST(n AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS avg_value
    FROM g
    """,
)


def _q_ivf_index_search(s: SparkSession, d: str) -> DataFrame:
    import tempfile

    return sim.ivf_index_search(
        load(s, d, "embeddings"), tempfile.mkdtemp(prefix="kdbs_ivfidx_")
    )


_reg("ivf_index_search", _q_ivf_index_search, _ivf_oracle())


_reg(
    "stream_rollup_maintain",
    sm.stream_rollup_maintain,
    """
    SELECT event_type,
           epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_c,
           CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_c
    FROM events
    GROUP BY 1, 2
    """,
)


_reg(
    "win_hampel",
    lambda s, d: wn.win_hampel(events_us(s, d)),
    """
    WITH f AS (
      SELECT event_id, user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS c,
             list_sort(list(CAST(round(value * 100) AS BIGINT)) OVER w) AS frame
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
    m AS (
      SELECT *, len(frame) AS n,
             CASE WHEN len(frame) % 2 = 1
                  THEN CAST(frame[(len(frame) + 1) // 2] AS DOUBLE)
                  ELSE (CAST(frame[len(frame) // 2] AS DOUBLE)
                        + CAST(frame[len(frame) // 2 + 1] AS DOUBLE)) / 2.0
             END AS med
      FROM f),
    d AS (
      SELECT *, list_sort([abs(CAST(x AS DOUBLE) - med) FOR x IN frame]) AS devs
      FROM m),
    md AS (
      SELECT *,
             CASE WHEN n % 2 = 1 THEN devs[(n + 1) // 2]
                  ELSE (devs[n // 2] + devs[n // 2 + 1]) / 2.0
             END AS mad
      FROM d)
    SELECT event_id, user_id, event_type,
           round(med / 100.0, 6) AS med,
           round(mad / 100.0, 6) AS mad,
           CASE WHEN mad > 0 THEN abs(CAST(c AS DOUBLE) - med) > 3.0 * mad
                ELSE abs(CAST(c AS DOUBLE) - med) > 0 END AS is_spike
    FROM md
    """,
)


_reg(
    "scan_evolved",
    src.q_scan_evolved,
    """
    WITH merged AS (
      SELECT doc_id, text, NULL AS lang FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 1)
    SELECT coalesce(lang, '<pre-schema>') AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM merged GROUP BY 1
    """,
)

_reg(
    "sink_compact",
    src.q_sink_compact,
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
    FROM events GROUP BY 1
    """,
)


_reg(
    "decontaminate_fuzzy",
    lambda s, d: dd.decontaminate_fuzzy(load(s, d, "documents")),
    """
    WITH d AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 20
               AS is_test,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            FOR i IN range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents)
      WHERE len(toks) >= 3),
    flat AS (SELECT doc_id, is_test, unnest(sh) AS s FROM d),
    sizes AS (SELECT doc_id, len(sh) AS n_sh FROM d),
    inter AS (
      SELECT t.doc_id AS doc_new, e.doc_id AS doc_base, count(*) AS n_inter
      FROM flat t JOIN flat e ON t.s = e.s AND NOT t.is_test AND e.is_test
      GROUP BY 1, 2),
    j AS (
      SELECT doc_new, doc_base,
             n_inter / (sn.n_sh + sb.n_sh - n_inter) AS jaccard
      FROM inter
      JOIN sizes sn ON sn.doc_id = doc_new
      JOIN sizes sb ON sb.doc_id = doc_base
      WHERE n_inter / (sn.n_sh + sb.n_sh - n_inter) >= 0.3)
    SELECT doc_new AS doc_id,
           CAST(count(*) AS BIGINT) AS n_test_matches,
           min(doc_base) AS min_test_id,
           max(jaccard) AS best_jaccard
    FROM j GROUP BY 1
    """,
)


def _mmr_oracle(n_queries: int = 5, m: int = 10) -> str:
    dot_qc = _IVF_DOT.format(a="q.v", b="c.v")
    dot_ab = _IVF_DOT.format(a="na.v", b="nb.v")
    # λ literal mirrors Python: 0.7 and (1.0 - 0.7) — the latter is NOT 0.3
    # in IEEE, and both engines must compute the same subtraction
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
               FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    scored0 AS (
      SELECT q.vec_id AS query_id, c.vec_id AS match_id,
             {dot_qc} / (q.nrm * c.nrm) AS rel
      FROM n q JOIN n c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {n_queries}),
    cand AS (
      SELECT query_id, match_id, rel FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY rel DESC, match_id) AS rn
        FROM scored0) WHERE rn <= {m}),
    pair AS (
      SELECT a.query_id, a.match_id AS pa, b.match_id AS pb,
             {dot_ab} / (na.nrm * nb.nrm) AS sim
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id AND a.match_id <> b.match_id
      JOIN n na ON na.vec_id = a.match_id
      JOIN n nb ON nb.vec_id = b.match_id),
    s1 AS (
      SELECT query_id, match_id, rel,
             0.7 * rel - (1.0 - 0.7) * 0.0 AS score FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY 0.7 * rel - (1.0 - 0.7) * 0.0 DESC, match_id) AS rk
        FROM cand) WHERE rk = 1),
    m2 AS (
      SELECT c.query_id, c.match_id, c.rel,
             0.7 * c.rel - (1.0 - 0.7) * p.sim AS score
      FROM cand c
      JOIN s1 ON s1.query_id = c.query_id AND c.match_id <> s1.match_id
      JOIN pair p ON p.query_id = c.query_id AND p.pa = c.match_id
                 AND p.pb = s1.match_id),
    s2 AS (
      SELECT query_id, match_id, rel, score FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, match_id) AS rk
        FROM m2) WHERE rk = 1),
    m3 AS (
      SELECT c.query_id, c.match_id, c.rel,
             0.7 * c.rel - (1.0 - 0.7) * greatest(p1.sim, p2.sim) AS score
      FROM cand c
      JOIN s1 ON s1.query_id = c.query_id
      JOIN s2 ON s2.query_id = c.query_id
      JOIN pair p1 ON p1.query_id = c.query_id AND p1.pa = c.match_id
                  AND p1.pb = s1.match_id
      JOIN pair p2 ON p2.query_id = c.query_id AND p2.pa = c.match_id
                  AND p2.pb = s2.match_id
      WHERE c.match_id <> s1.match_id AND c.match_id <> s2.match_id),
    s3 AS (
      SELECT query_id, match_id, rel, score FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, match_id) AS rk
        FROM m3) WHERE rk = 1)
    SELECT query_id, match_id, CAST(1 AS BIGINT) AS round,
           round(rel, 6) AS rel, round(score, 6) AS mmr FROM s1
    UNION ALL
    SELECT query_id, match_id, CAST(2 AS BIGINT), round(rel, 6), round(score, 6) FROM s2
    UNION ALL
    SELECT query_id, match_id, CAST(3 AS BIGINT), round(rel, 6), round(score, 6) FROM s3
    """


_reg(
    "emb_mmr_rerank",
    lambda s, d: sim.emb_mmr_rerank(load(s, d, "embeddings")),
    _mmr_oracle(),
)


_reg(
    "agg_kmv_overlap",
    lambda s, d: agg.agg_kmv_overlap(events_us(s, d)),
    """
    WITH mem AS (
      SELECT DISTINCT event_type,
             epoch_us(ts) >= 1705276800000000 AS late,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
                  AS DOUBLE) / 281474976710656.0 AS u
      FROM events),
    sk AS (
      SELECT event_type, late, u FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type, late
                   ORDER BY u) AS rn FROM mem) WHERE rn <= 64),
    side AS (
      SELECT event_type, late, max(u) AS kth, count(*) AS n
      FROM sk GROUP BY 1, 2),
    uni AS (
      SELECT event_type, max(u) AS kth_u, count(*) AS n_u FROM (
        SELECT event_type, u, row_number() OVER (PARTITION BY event_type
                 ORDER BY u) AS rn
        FROM (SELECT DISTINCT event_type, u FROM sk)) x
      WHERE rn <= 64 GROUP BY 1),
    j AS (
      SELECT a.event_type,
             CASE WHEN a.n < 64 THEN CAST(a.n AS DOUBLE) ELSE 63 / a.kth END AS ea,
             CASE WHEN b.n < 64 THEN CAST(b.n AS DOUBLE) ELSE 63 / b.kth END AS eb,
             CASE WHEN u.n_u < 64 THEN CAST(u.n_u AS DOUBLE) ELSE 63 / u.kth_u END AS eu
      FROM side a JOIN side b ON a.event_type = b.event_type
                 AND NOT a.late AND b.late
      JOIN uni u ON u.event_type = a.event_type)
    SELECT event_type,
           round(ea, 4) AS est_before, round(eb, 4) AS est_after,
           round(eu, 4) AS est_union, round(ea + eb - eu, 4) AS est_both
    FROM j
    """,
)


_reg(
    "mm_segment_bounds",
    lambda s, d: mm.mm_segment_bounds(mm.mm_wav_table(load(s, d, "documents"))),
    """
    WITH s AS (
      SELECT d.doc_id, f.range AS frame_idx, i.range AS i,
             (d.doc_id * 7 + f.range * 256 + i.range) % 255 - 128 AS dev
      FROM documents d, range(0, 4) f, range(0, 256) i),
    e AS (
      SELECT doc_id, frame_idx, CAST(sum(dev * dev) AS BIGINT) AS energy
      FROM s GROUP BY 1, 2),
    l AS (
      SELECT doc_id, frame_idx, energy,
             lag(energy) OVER w AS prev_energy,
             CASE WHEN lag(energy) OVER w IS NULL THEN TRUE
                  ELSE abs(energy - lag(energy) OVER w) * 10
                       > lag(energy) OVER w * 3 END AS is_boundary
      FROM e WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx))
    SELECT doc_id, frame_idx, energy, prev_energy, is_boundary,
           CAST(sum(CASE WHEN is_boundary THEN 1 ELSE 0 END) OVER (
             PARTITION BY doc_id ORDER BY frame_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS segment_id
    FROM l
    """,
)


_reg(
    "stream_asof_enrich",
    sm.stream_asof_enrich,
    """
    WITH err AS (
      SELECT user_id, epoch_us(ts) AS ts_us, arg_max(value, event_id) AS err_value
      FROM events WHERE event_type = 'error' GROUP BY 1, 2),
    clk AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, e.err_value AS asof_value
    FROM clk c ASOF JOIN err e
      ON c.user_id = e.user_id AND c.ts_us >= e.ts_us
    """,
)


_reg(
    "text_pmi_bigrams",
    lambda s, d: tx.text_pmi_bigrams(load(s, d, "documents")),
    """
    WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
               FROM documents),
    big AS (
      SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
      FROM (SELECT unnest([t[i] || ' ' || t[i + 1]
                           FOR i IN range(1, len(t))]) AS bg
            FROM t WHERE len(t) >= 2)),
    nbg AS (SELECT w1, w2, count(*) AS n_ab FROM big GROUP BY 1, 2),
    nl AS (SELECT w1, count(*) AS n_a FROM big GROUP BY 1),
    nr AS (SELECT w2, count(*) AS n_b FROM big GROUP BY 1),
    tot AS (SELECT sum(n_ab) AS n_total FROM nbg),
    scored AS (
      SELECT b.w1, b.w2,
             CAST(b.n_ab AS BIGINT) AS n_ab,
             CAST(nl.n_a AS BIGINT) AS n_a,
             CAST(nr.n_b AS BIGINT) AS n_b,
             round(ln(CAST(n_total AS DOUBLE) * b.n_ab
                      / (CAST(nl.n_a AS DOUBLE) * nr.n_b)), 6) AS pmi
      FROM nbg b JOIN nl USING (w1) JOIN nr USING (w2) CROSS JOIN tot
      WHERE b.n_ab >= 5)
    SELECT w1, w2, n_ab, n_a, n_b, pmi,
           CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT) AS rnk
    FROM scored QUALIFY rnk <= 30
    """,
)


_reg(
    "agg_cohort_ltv",
    lambda s, d: bh.agg_cohort_ltv(events_us(s, d)),
    """
    WITH st AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us,
             CAST(round(value * 100) AS BIGINT) AS c,
             min(epoch_us(ts) - epoch_us(ts) % 86400000000)
               OVER (PARTITION BY user_id) AS cohort_us
      FROM events),
    po AS (
      SELECT cohort_us,
             CAST((day_us - cohort_us) // 86400000000 AS BIGINT) AS day_offset,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(sum(c) AS BIGINT) AS value_c
      FROM st GROUP BY 1, 2)
    SELECT cohort_us, day_offset, n_users, value_c,
           CAST(sum(value_c) OVER (PARTITION BY cohort_us ORDER BY day_offset
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_value_c
    FROM po
    """,
)


# Market-basket association rules: all metrics from exact bigint counts,
# one shared double expression per column (cast-then-divide in the same
# order on both engines), integer-count top-k with (a, b) total tie-break
# so the k=50 cut is engine-independent.
_reg(
    "agg_assoc_rules",
    lambda s, d: bh.agg_assoc_rules(load(s, d, "orders"), load(s, d, "lineitem")),
    """
    WITH op AS (SELECT DISTINCT o_orderkey AS o, l_partkey AS p
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    nn AS (SELECT count(*) AS n_total FROM orders),
    item AS (SELECT p, count(*) AS n_item FROM op GROUP BY 1),
    pairs AS (SELECT x.p AS a, y.p AS b, count(*) AS n_both
              FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
              GROUP BY 1, 2 HAVING count(*) >= 3)
    SELECT a, b, CAST(n_both AS BIGINT) AS n_both,
           CAST(ia.n_item AS BIGINT) AS n_a, CAST(ib.n_item AS BIGINT) AS n_b,
           CAST(CAST((2000000 * CAST(n_both AS HUGEINT) + n_total)
                     // (2 * CAST(n_total AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS support,
           CAST(CAST((2000000 * CAST(n_both AS HUGEINT) + ia.n_item)
                     // (2 * CAST(ia.n_item AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS conf_a_b,
           CAST(CAST((2000000 * CAST(n_both AS HUGEINT) + ib.n_item)
                     // (2 * CAST(ib.n_item AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS conf_b_a,
           CAST(CAST((2000000 * CAST(n_both AS HUGEINT) * n_total
                      + CAST(ia.n_item AS HUGEINT) * ib.n_item)
                     // (2 * CAST(ia.n_item AS HUGEINT) * ib.n_item)
                     AS BIGINT) AS DOUBLE)
             / 1e6 AS lift
    FROM pairs JOIN item ia ON ia.p = a JOIN item ib ON ib.p = b
    CROSS JOIN nn
    ORDER BY n_both DESC, a, b LIMIT 50
    """,
)


def _centroid_classify_oracle(dim: int = 64) -> str:
    avgs = ", ".join(
        f"{_qmean_sql(f'v[{i + 1}]')} AS c{i + 1}" for i in range(dim)
    )
    cv = "[" + ", ".join(f"c{i + 1}" for i in range(dim)) + "]"
    dot_vc = _IVF_DOT.format(a="n.v", b="c.cv")
    return f"""
    WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                      [CAST(x AS DOUBLE) FOR x IN embedding] AS v
               FROM embeddings),
    n AS (SELECT vec_id, label, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm
          FROM e),
    craw AS (SELECT label AS clabel, {avgs} FROM e GROUP BY label),
    c AS (SELECT clabel, {cv} AS cv,
                 sqrt(list_sum([y * y FOR y IN {cv}])) AS cnrm
          FROM craw),
    scored AS (
      SELECT n.vec_id, n.label, c.clabel,
             {dot_vc} / (n.nrm * c.cnrm) AS cos
      FROM n CROSS JOIN c),
    pred AS (
      SELECT vec_id, label, clabel FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, clabel) AS rn
        FROM scored) WHERE rn = 1)
    SELECT label AS true_label, clabel AS pred_label,
           CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
    """


_reg(
    "emb_centroid_classify",
    lambda s, d: sim.emb_centroid_classify(load(s, d, "embeddings")),
    _centroid_classify_oracle(),
)


_reg(
    "agg_vwap",
    lambda s, d: agg.agg_vwap(events_us(s, d)),
    """
    WITH g AS (
      SELECT user_id, event_type,
             CAST(count(*) AS BIGINT) AS n_ticks,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                  AS BIGINT) AS volume,
             sum(CAST(round(value * 100) AS HUGEINT)
                 * CAST(json_extract_string(props, '$.k') AS BIGINT)) AS vnum
      FROM events
      GROUP BY user_id, event_type)
    SELECT user_id, event_type, n_ticks, volume,
           CASE WHEN volume > 0 THEN
             CAST((CASE WHEN vnum < 0 THEN -1 ELSE 1 END)
                  * ((20000 * abs(vnum) + volume)
                     // (2 * CAST(volume AS HUGEINT))) AS DOUBLE) / 1e4
           END AS vwap_c
    FROM g
    """,
)

_reg(
    "agg_seasonality",
    lambda s, d: agg.agg_seasonality(events_us(s, d)),
    """
    SELECT event_type,
           CAST(((epoch_us(ts) // 3600000000) % 24 + 24) % 24 AS INT)
             AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_value_c,
           CAST((CASE WHEN sum(CAST(round(value * 100) AS BIGINT)) < 0
                      THEN -1 ELSE 1 END)
                * ((200 * abs(CAST(sum(CAST(round(value * 100) AS BIGINT))
                                   AS HUGEINT)) + count(*))
                   // (2 * CAST(count(*) AS HUGEINT))) AS DOUBLE) / 10000.0
             AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)

_reg(
    "sql_top_supplier",
    lambda s, d: agg.sql_top_supplier(load(s, d, "supplier"), load(s, d, "lineitem")),
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS total_revenue_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey),
    ranked AS (
      SELECT supplier_no, total_revenue_c,
             max(total_revenue_c) OVER () AS max_revenue_c
      FROM revenue)
    SELECT s.s_suppkey, s.s_name, r.total_revenue_c
    FROM supplier s
    JOIN ranked r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_c = r.max_revenue_c
    ORDER BY s.s_suppkey
    """,
)

_reg(
    "win_donchian",
    lambda s, d: wn.win_donchian(events_us(s, d)),
    """
    SELECT event_id, user_id, event_type, value,
           CAST(hi_c AS DOUBLE) / 100.0 AS hi,
           CAST(lo_c AS DOUBLE) / 100.0 AS lo,
           CASE WHEN hi_c > lo_c
                THEN CAST((2000000 * CAST(c - lo_c AS HUGEINT)
                           + (hi_c - lo_c))
                          // (2 * CAST(hi_c - lo_c AS HUGEINT))
                          AS DOUBLE) / 1e6
           END AS chan_pos
    FROM (
      SELECT event_id, user_id, event_type, value,
             CAST(round(value * 100) AS BIGINT) AS c,
             max(CAST(round(value * 100) AS BIGINT)) OVER w AS hi_c,
             min(CAST(round(value * 100) AS BIGINT)) OVER w AS lo_c
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
    """,
)

_reg(
    "text_hash_features",
    lambda s, d: tx.text_hash_features(load(s, d, "documents")),
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS tok
      FROM documents)
    SELECT doc_id,
           CAST(CAST('0x' || substring(md5(tok), 1, 4) AS BIGINT) % 256
                AS INT) AS slot,
           CAST(count(*) AS BIGINT) AS cnt
    FROM toks
    GROUP BY 1, 2
    """,
)


def _ivfpq_oracle(
    n_queries: int = 5,
    k: int = 5,
    m: int = 16,
    ksub: int = 32,
    n_clusters: int = 16,
    nprobe: int = 2,
) -> str:
    """SQL mirror of ivfpq_search_topk: the _ivf_oracle coarse CTEs pick
    each query's probed lists and every vector's home list; the _pq_oracle
    CTEs build codebooks/codes/ADC tables; the score join keeps only
    (query, vector) pairs whose home list is probed by that query."""
    sd = 64 // m
    dot_nc = _IVF_DOT.format(a="n.v", b="c.cv")
    l2 = (
        "list_sum([(v.sv[i] - c.cv[i]) * (v.sv[i] - c.cv[i]) "
        f"FOR i IN range(1, {sd + 1})])"
    )
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    c0c AS (SELECT vec_id AS cid, v AS cv,
                   sqrt(list_sum([x * x FOR x IN v])) AS cnrm
            FROM e WHERE vec_id < {n_clusters}),
    a0c AS (
      SELECT n.vec_id, c.cid,
             row_number() OVER (PARTITION BY n.vec_id
               ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
      FROM n CROSS JOIN c0c c),
    asg0c AS (SELECT vec_id, cid FROM a0c WHERE rk = 1),
    mdimc AS (
      SELECT a.cid, t.i AS pos, avg(e.v[t.i]) AS x
      FROM asg0c a JOIN e ON e.vec_id = a.vec_id
      CROSS JOIN range(1, 65) t(i)
      GROUP BY a.cid, t.i),
    c1cl AS (SELECT cid, list(x ORDER BY pos) AS cv FROM mdimc GROUP BY cid),
    c1c AS (SELECT cid, cv, sqrt(list_sum([y * y FOR y IN cv])) AS cnrm FROM c1cl),
    corpus AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c1c c) WHERE rk = 1),
    qprobe AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c1c c WHERE n.vec_id < {n_queries}) WHERE rk <= {nprobe}),
    nn AS (SELECT vec_id,
                  [x / greatest(sqrt(list_sum([y * y FOR y IN v])), 1e-30) FOR x IN v] AS nv
           FROM e),
    subv AS (SELECT vec_id, t.s AS sub, nv[t.s * {sd} + 1 : t.s * {sd} + {sd}] AS sv
             FROM nn CROSS JOIN range(0, {m}) t(s)),
    b0 AS (SELECT sub, vec_id AS cid, sv AS cv FROM subv WHERE vec_id < {ksub}),
    ab0 AS (SELECT v.vec_id, v.sub, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id, v.sub
                     ORDER BY {l2} ASC, c.cid) AS rk
            FROM subv v JOIN b0 c ON c.sub = v.sub),
    basg0 AS (SELECT vec_id, sub, cid FROM ab0 WHERE rk = 1),
    bmdim AS (SELECT a.sub, a.cid, t.i AS pos, avg(v.sv[t.i]) AS x
              FROM basg0 a JOIN subv v ON v.vec_id = a.vec_id AND v.sub = a.sub
              CROSS JOIN range(1, {sd + 1}) t(i)
              GROUP BY a.sub, a.cid, t.i),
    b1 AS (SELECT sub, cid, list(x ORDER BY pos) AS cv FROM bmdim GROUP BY sub, cid),
    codes AS (SELECT vec_id, sub, cid FROM (
        SELECT v.vec_id, v.sub, c.cid,
               row_number() OVER (PARTITION BY v.vec_id, v.sub
                 ORDER BY {l2} ASC, c.cid) AS rk
        FROM subv v JOIN b1 c ON c.sub = v.sub) WHERE rk = 1),
    adc AS (SELECT v.vec_id AS query_id, c.sub, c.cid,
                   list_sum([v.sv[i] * c.cv[i] FOR i IN range(1, {sd + 1})]) AS qd
            FROM subv v JOIN b1 c ON c.sub = v.sub WHERE v.vec_id < {n_queries}),
    scored AS (SELECT a.query_id, x.vec_id AS match_id, sum(a.qd) AS score_pq
               FROM codes x
               JOIN corpus cx ON cx.vec_id = x.vec_id
               JOIN adc a ON a.sub = x.sub AND a.cid = x.cid
               JOIN qprobe p ON p.query_id = a.query_id AND p.cid = cx.cid
               WHERE x.vec_id <> a.query_id
               GROUP BY 1, 2)
    SELECT query_id, match_id, round(score_pq, 6) AS score_pq,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_pq DESC, match_id) AS BIGINT) AS rn
    FROM scored QUALIFY rn <= {k}
    """


_reg(
    "ivfpq_search_topk",
    lambda s, d: sim.ivfpq_search_topk(load(s, d, "embeddings")),
    _ivfpq_oracle(),
)


_reg(
    "mix_temperature",
    lambda s, d: cu.mix_temperature(load(s, d, "documents")),
    """
    WITH per AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
                 FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total FROM per),
    wt AS (SELECT source, chars, total,
                  CAST(round(sqrt(CAST(chars AS DOUBLE) / total) * 1e12)
                       AS BIGINT) AS t
           FROM per CROSS JOIN tot),
    dn AS (SELECT CAST(sum(t) AS BIGINT) AS denom FROM wt)
    SELECT source, CAST(chars AS BIGINT) AS n_chars_sum,
           CAST(CAST((2000000 * CAST(t AS HUGEINT) + denom)
                     // (2 * CAST(denom AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS target_share,
           CAST(least(CAST(1000000 AS BIGINT),
                CAST((2000000 * CAST(t AS HUGEINT) * total
                      + CAST(denom AS HUGEINT) * chars)
                     // (2 * CAST(denom AS HUGEINT) * chars)
                     AS BIGINT)) AS DOUBLE)
             / 1e6 AS mix_rate
    FROM wt CROSS JOIN dn
    """,
)

_reg(
    "curation_token_budget",
    lambda s, d: cu.curation_token_budget(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, text,
                      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    r AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 len(toks) AS n_toks,
                 len([x FOR x IN toks IF list_contains(['the','a','of','and','to','in','is'], x)])
                   / greatest(len(toks), 1) AS stop_ratio,
                 len(regexp_extract_all(text, '[0-9]')) / greatest(length(text), 1) AS digit_ratio,
                 list_sum([CAST(length(x) AS DOUBLE) FOR x IN toks]) / greatest(len(toks), 1) AS avg_tok
          FROM t),
    scored AS (SELECT doc_id, n_tokens,
                 CAST(CASE WHEN n_toks >= 10 THEN 1 ELSE 0 END
                    + CASE WHEN stop_ratio >= 0.05 THEN 1 ELSE 0 END
                    + CASE WHEN digit_ratio <= 0.3 THEN 1 ELSE 0 END
                    + CASE WHEN avg_tok >= 3.0 AND avg_tok <= 12.0 THEN 1 ELSE 0 END
                   AS BIGINT) AS score
               FROM r),
    levels AS (
      SELECT score, sum(n_tokens) AS level_tokens,
             coalesce(sum(sum(n_tokens)) OVER (
               ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
      FROM scored GROUP BY score),
    rates AS (
      SELECT score,
             CASE WHEN greatest(0, 10000 - above) >= level_tokens THEN 1.0
                  WHEN greatest(0, 10000 - above) <= 0 THEN 0.0
                  ELSE CAST(greatest(0, 10000 - above) AS DOUBLE)
                       / CAST(level_tokens AS DOUBLE)
             END AS keep_rate
      FROM levels)
    SELECT s.doc_id, s.score, s.n_tokens
    FROM scored s JOIN rates v ON v.score = s.score
    WHERE CAST('0x' || substring(md5(CAST(s.doc_id AS VARCHAR)), 1, 6) AS BIGINT)
            % 1000000
          < CAST(round(v.keep_rate * 1000000) AS BIGINT)
    """,
)


_reg(
    "scan_time_travel",
    src.q_scan_time_travel,
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE epoch_us(ts) // {DAY_US} - 19723 < 20
    GROUP BY event_type
    """,
)


_reg(
    "sink_upsert",
    src.q_sink_upsert,
    # merged table = untouched days <10 at original cents, days 10..19 at
    # cents+100 (days 10..14 REPLACED once, 15..19 appended)
    f"""
    WITH d AS (SELECT event_type,
                      CAST(round(value * 100) AS BIGINT) AS c,
                      epoch_us(ts) // {DAY_US} - 19723 AS day
               FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN day < 10 THEN c ELSE c + 100 END) AS BIGINT)
             AS sum_c
    FROM d WHERE day < 20
    GROUP BY event_type
    """,
)


_MACD_NF, _MACD_FD = _ewma_int_sql("xc", 0.4)
_MACD_NS, _MACD_SD = _ewma_int_sql("xc", 0.15)
_MACD_N2, _MACD_D2 = _ewma_int_sql("macd_e6", 0.4)

_reg(
    "win_macd",
    lambda s, d: wn.win_macd(events_us(s, d)),
    # exact mirror of the engine's r10 contract: integer-weight cent folds,
    # macd line quantized once to the output's 1e-6 grid by sign-aware //,
    # signal EWMA over those exact bigints, integer round(6) at the output
    f"""
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events),
    e AS (
      SELECT event_id, user_id, event_type, ts_us,
             ({_MACD_NF}) AS nf, ({_MACD_FD}) AS fd,
             ({_MACD_NS}) AS ns, ({_MACD_SD}) AS sd
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts_us, event_id)),
    m AS (
      SELECT event_id, user_id, event_type, ts_us,
             nf * sd - ns * fd AS mn, 100 * fd * sd AS md
      FROM e),
    q AS (
      SELECT event_id, user_id, event_type, ts_us,
             (CASE WHEN mn < 0 THEN -1 ELSE 1 END)
               * ((2000000 * abs(mn) + md) // (2 * md)) AS macd_e6
      FROM m),
    s AS (
      SELECT event_id, user_id, event_type, macd_e6,
             ({_MACD_N2}) AS n2, ({_MACD_D2}) AS d2
      FROM q
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts_us, event_id))
    SELECT event_id, user_id, event_type,
           CAST(macd_e6 AS DOUBLE) / 1e6 AS macd,
           {_idiv6_sql("n2", "1000000 * d2")} AS signal,
           {_idiv6_sql("macd_e6 * d2 - n2", "1000000 * d2")} AS hist
    FROM s
    """,
)


_reg(
    "agg_bitmap_distinct",
    lambda s, d: agg.agg_bitmap_distinct(events_us(s, d)),
    f"""
    WITH w AS (
      SELECT event_type, epoch_us(ts) // {DAY_US} AS day_idx,
             user_id // 62 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 62 AS INT)) AS word
      FROM events
      GROUP BY 1, 2, 3)
    SELECT event_type, day_idx,
           CAST(sum(bit_count(word)) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_words
    FROM w GROUP BY 1, 2
    """,
)


_reg(
    "sql_forecast_revenue",
    lambda s, d: agg.sql_forecast_revenue(load(s, d, "lineitem")),
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= CAST(0.05 AS DOUBLE)
      AND l_discount <= CAST(0.07 AS DOUBLE)
      AND l_quantity < CAST(24 AS DOUBLE)
    """,
)


_reg(
    "sql_nation_volume",
    lambda s, d: agg.sql_nation_volume(
        load(s, d, "lineitem"), load(s, d, "orders"), load(s, d, "customer"),
        load(s, d, "supplier"), load(s, d, "nation"),
    ),
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)


_reg(
    "sql_market_share",
    lambda s, d: agg.sql_market_share(
        load(s, d, "part"), load(s, d, "lineitem"), load(s, d, "orders"),
        load(s, d, "customer"), load(s, d, "supplier"), load(s, d, "nation"),
        load(s, d, "region"),
    ),
    """
    WITH flat AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS vol_c,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE p.p_type = 'ECONOMY' AND r.r_name = 'ASIA')
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol_c
                         ELSE 0 END) AS BIGINT) AS nation_vol_c,
           CAST(sum(vol_c) AS BIGINT) AS total_vol_c,
           CAST((2000000 * CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                                         THEN vol_c ELSE 0 END) AS HUGEINT)
                 + sum(vol_c))
                // (2 * CAST(sum(vol_c) AS HUGEINT)) AS DOUBLE)
             / 1000000.0 AS mkt_share
    FROM flat
    GROUP BY o_year
    """,
)


_reg(
    "sql_promo_revenue",
    lambda s, d: agg.sql_promo_revenue(load(s, d, "lineitem"), load(s, d, "part")),
    """
    SELECT year(l.l_shipdate) AS y, month(l.l_shipdate) AS m,
           CAST(sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(round(l.l_extendedprice
                                         * (1 - l.l_discount) * 100)
                                   AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS promo_revenue_c,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS total_revenue_c,
           CAST((200000000 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                           THEN CAST(round(l.l_extendedprice
                                                           * (1 - l.l_discount)
                                                           * 100) AS BIGINT)
                                           ELSE 0 END) AS HUGEINT)
                 + sum(CAST(round(l.l_extendedprice
                                  * (1 - l.l_discount) * 100) AS BIGINT)))
                // (2 * CAST(sum(CAST(round(l.l_extendedprice
                                            * (1 - l.l_discount) * 100)
                                      AS BIGINT)) AS HUGEINT)) AS DOUBLE)
             / 1000000.0 AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY year(l.l_shipdate), month(l.l_shipdate)
    """,
)


_reg(
    "sql_small_qty_revenue",
    lambda s, d: agg.sql_small_qty_revenue(
        load(s, d, "lineitem"), load(s, d, "part")
    ),
    """
    WITH part_avg AS (
      SELECT l_partkey, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN part_avg pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < 0.5 * pa.avg_qty
    """,
)


_reg(
    "sql_large_orders",
    lambda s, d: agg.sql_large_orders(
        load(s, d, "customer"), load(s, d, "orders"), load(s, d, "lineitem")
    ),
    """
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > CAST(200 AS DOUBLE))
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_c,
           b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice_c DESC, o.o_orderkey
    LIMIT 100
    """,
)


_reg(
    "sql_bracketed_revenue",
    lambda s, d: agg.sql_bracketed_revenue(
        load(s, d, "lineitem"), load(s, d, "part")
    ),
    """
    SELECT CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN CAST(1 AS DOUBLE) AND CAST(11 AS DOUBLE))
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity BETWEEN CAST(10 AS DOUBLE) AND CAST(20 AS DOUBLE))
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN CAST(20 AS DOUBLE) AND CAST(30 AS DOUBLE))
    """,
)


_reg(
    "sql_idle_rich_customers",
    lambda s, d: agg.sql_idle_rich_customers(
        load(s, d, "customer"), load(s, d, "orders")
    ),
    """
    WITH avg_bal AS (
      SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT)) AS ab_c
      FROM customer WHERE c_acctbal > CAST(0 AS DOUBLE))
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS total_bal_c
    FROM customer c, avg_bal
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > avg_bal.ab_c
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
)


_reg(
    "agg_skew_kurtosis",
    lambda s, d: agg.agg_skew_kurtosis(events_us(s, d)),
    """
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xc
      FROM events),
    g AS (
      SELECT event_type, count(*) AS n, sum(xc) AS s1,
             sum(CAST(xc AS HUGEINT) * xc) AS s2,
             sum(CAST(xc AS HUGEINT) * xc * xc) AS s3,
             sum(CAST(xc AS HUGEINT) * xc * xc * xc) AS s4
      FROM c GROUP BY 1),
    m AS (
      SELECT event_type, n, s1,
             CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
             CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
             CAST(s4 AS DOUBLE) AS s4d
      FROM g),
    k AS (
      SELECT event_type, n, s1,
             s2d / nd - (s1d / nd) * (s1d / nd) AS m2,
             s3d / nd - 3.0 * (s1d / nd) * (s2d / nd)
               + 2.0 * (s1d / nd) * (s1d / nd) * (s1d / nd) AS m3,
             s4d / nd - 4.0 * (s1d / nd) * (s3d / nd)
               + 6.0 * (s1d / nd) * (s1d / nd) * (s2d / nd)
               - 3.0 * (s1d / nd) * (s1d / nd) * (s1d / nd) * (s1d / nd)
               AS m4
      FROM m)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST((CASE WHEN s1 < 0 THEN -1 ELSE 1 END)
                * ((200 * abs(s1) + n) // (2 * CAST(n AS HUGEINT)))
                AS DOUBLE) / 10000.0 AS mean,
           round(CASE WHEN m2 > 0 THEN m3 / pow(sqrt(m2), 3.0) END, 6)
             AS skewness,
           round(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 END, 6)
             AS kurtosis_excess
    FROM k
    """,
)


_reg(
    "agg_hdr_histogram",
    lambda s, d: agg.agg_hdr_histogram(events_us(s, d)),
    """
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xc
      FROM events),
    b AS (
      SELECT event_type, CAST(length(bin(xc)) - 1 AS INT) AS bucket,
             count(*) AS cnt
      FROM c WHERE xc >= 1 GROUP BY 1, 2),
    w AS (
      SELECT event_type, bucket, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
      FROM b),
    p AS (
      SELECT event_type, CAST(max(total) AS BIGINT) AS n,
             min(CASE WHEN cum * 100 >= 50 * total THEN bucket END)
               AS p50_bucket,
             min(CASE WHEN cum * 100 >= 95 * total THEN bucket END)
               AS p95_bucket,
             min(CASE WHEN cum * 100 >= 99 * total THEN bucket END)
               AS p99_bucket
      FROM w GROUP BY event_type)
    SELECT event_type, n,
           p50_bucket, pow(2.0, p50_bucket) / 100.0 AS p50_lo,
           p95_bucket, pow(2.0, p95_bucket) / 100.0 AS p95_lo,
           p99_bucket, pow(2.0, p99_bucket) / 100.0 AS p99_lo
    FROM p
    """,
)


# typical carried as the 3x-scaled bigint hc+lc+cc; mult=2.0 enters as the
# integer 3*round(2.0*1000) = 6000 — the engine's exact r10 contract
_KELT_NT, _KELT_DT = _ewma_int_sql("t3", 0.25)
_KELT_NR, _ = _ewma_int_sql("rngc", 0.25)

_reg(
    "win_keltner",
    lambda s, d: wn.win_keltner(events_us(s, d)),
    f"""
    WITH bars AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
             CAST(round(max(value) * 100) AS BIGINT) AS hc,
             CAST(round(min(value) * 100) AS BIGINT) AS lc,
             CAST(round(last(value ORDER BY epoch_us(ts), event_id) * 100)
                  AS BIGINT) AS cc
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT event_type, hour_us,
             hc + lc + cc AS t3, hc - lc AS rngc
      FROM bars),
    e AS (
      SELECT event_type, hour_us,
             ({_KELT_NT}) AS nt, ({_KELT_NR}) AS nr, ({_KELT_DT}) AS dt
      FROM t
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_us))
    SELECT event_type, hour_us,
           {_idiv6_sql("nt", "300 * dt")} AS middle,
           {_idiv6_sql("1000 * nt + 6000 * nr", "300000 * dt")} AS upper,
           {_idiv6_sql("1000 * nt - 6000 * nr", "300000 * dt")} AS lower
    FROM e
    """,
)


_reg(
    "emb_dim_stats",
    lambda s, d: sim.emb_dim_stats(load(s, d, "embeddings")),
    """
    WITH flat AS (
      SELECT unnest(range(len(embedding))) AS pos,
             unnest(embedding) AS v
      FROM embeddings),
    c AS (
      SELECT pos, v, CAST(round(v * 1e6) AS BIGINT) AS v6 FROM flat),
    g AS (
      SELECT pos, count(*) AS n, sum(v6) AS s1,
             sum(CAST(v6 AS HUGEINT) * v6) AS s2,
             min(v) AS lo, max(v) AS hi
      FROM c GROUP BY 1)
    SELECT CAST(pos AS BIGINT) AS pos, CAST(n AS BIGINT) AS n,
           CAST((CASE WHEN s1 < 0 THEN -1 ELSE 1 END)
                * ((2 * abs(CAST(s1 AS HUGEINT)) + n)
                   // (2 * CAST(n AS HUGEINT))) AS DOUBLE)
             / 1000000.0 AS mean,
           round(sqrt(greatest(
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)),
             0.0)) / 1e6, 6) AS std,
           lo, hi
    FROM g
    """,
)


_reg(
    "agg_linreg",
    lambda s, d: agg.agg_linreg(events_us(s, d)),
    """
    WITH c AS (
      SELECT user_id, event_type,
             epoch_us(ts) // 3600000000 AS h,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events),
    g AS (
      SELECT user_id, event_type, count(*) AS n,
             sum(h) AS sx, sum(y) AS sy,
             sum(CAST(h AS HUGEINT) * h) AS sxx,
             sum(CAST(h AS HUGEINT) * y) AS sxy
      FROM c GROUP BY 1, 2),
    d AS (
      SELECT user_id, event_type, n, sx, sy,
             CAST(n AS HUGEINT) * sxx - sx * sx AS deti,
             CAST(n AS HUGEINT) * sxy - sx * sy AS num
      FROM g),
    e AS (
      SELECT user_id, event_type, n, deti, num,
             sy * deti - num * sx AS inum
      FROM d)
    SELECT user_id, event_type, CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN deti > 0 THEN
                  (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                  * ((2000000 * abs(num) + 100 * deti) // (200 * deti))
                END AS DOUBLE) / 1000000.0 AS slope_per_hour,
           CAST(CASE WHEN deti > 0 THEN
                  (CASE WHEN inum < 0 THEN -1 ELSE 1 END)
                  * ((20000 * abs(inum) + 100 * CAST(n AS HUGEINT) * deti)
                     // (200 * CAST(n AS HUGEINT) * deti))
                END AS DOUBLE) / 10000.0 AS intercept
    FROM e
    """,
)


_reg(
    "sink_partitioned",
    src.q_sink_partitioned,
    """
    WITH e AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS value_c,
             epoch_us(ts) // 86400000000 AS day_idx
      FROM events)
    SELECT CAST(day_idx AS BIGINT) AS day_idx, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN day_idx = 19735 THEN value_c * 2
                         ELSE value_c END) AS BIGINT) AS sum_c
    FROM e
    WHERE day_idx BETWEEN 19734 AND 19736
    GROUP BY 1, 2
    """,
)


def _benford_case() -> str:
    """DuckDB CASE over the SAME pinned IEEE literals as agg.BENFORD_P
    (each CAST to DOUBLE — bare decimal literals would stay DECIMAL)."""
    whens = " ".join(
        f"WHEN {d} THEN CAST({p!r} AS DOUBLE)" for d, p in agg.BENFORD_P.items()
    )
    return f"CASE digit {whens} END"


_reg(
    "agg_benford",
    lambda s, d: agg.agg_benford(events_us(s, d)),
    f"""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xc
      FROM events),
    per AS (
      SELECT event_type,
             CAST(substr(CAST(xc AS VARCHAR), 1, 1) AS INT) AS digit,
             count(*) AS n_d
      FROM c WHERE xc >= 1 GROUP BY 1, 2),
    t AS (
      SELECT event_type, digit, n_d,
             sum(n_d) OVER (PARTITION BY event_type) AS ntot
      FROM per),
    p AS (
      SELECT event_type, digit, n_d, ntot, {_benford_case()} AS pb
      FROM t)
    SELECT event_type, digit, CAST(n_d AS BIGINT) AS n_d,
           CAST(ntot AS BIGINT) AS n,
           CAST((2000000 * n_d + ntot) // (2 * ntot) AS DOUBLE)
             / 1000000.0 AS freq,
           round(pb, 6) AS p_benford,
           round((CAST(n_d AS DOUBLE) - CAST(ntot AS DOUBLE) * pb)
                 / sqrt(CAST(ntot AS DOUBLE) * pb * (1.0 - pb)), 4) AS z
    FROM p
    """,
)


_reg(
    "emb_quantize_sq8",
    lambda s, d: sim.emb_quantize_sq8(load(s, d, "embeddings")),
    """
    WITH base AS (
      SELECT vec_id, embedding,
             CAST(list_min(embedding) AS DOUBLE) AS lo,
             CAST(list_max(embedding) AS DOUBLE) AS hi
      FROM embeddings),
    b2 AS (SELECT vec_id, embedding, lo, hi, hi - lo AS rng FROM base),
    q AS (
      SELECT vec_id, lo, hi, rng,
             list_transform(embedding, x -> CASE WHEN rng > 0
               THEN CAST(floor((CAST(x AS DOUBLE) - lo) / rng * 255.0 + 0.5)
                         AS INT)
               ELSE 0 END) AS codes,
             list_transform(embedding, x -> CASE WHEN rng > 0
               THEN CAST(x AS DOUBLE)
                    - (lo + CAST(CAST(floor((CAST(x AS DOUBLE) - lo)
                                             / rng * 255.0 + 0.5) AS INT)
                                 AS DOUBLE) * rng / 255.0)
               ELSE CAST(x AS DOUBLE) - lo END) AS errs
      FROM b2)
    SELECT vec_id,
           floor(lo * 1e6 + 0.5) / 1e6 AS lo,
           floor(hi * 1e6 + 0.5) / 1e6 AS hi,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           floor(list_reduce(list_transform(errs, e -> e * e),
                             (a, b) -> a + b)
                 / CAST(len(errs) AS DOUBLE) * 1e10 + 0.5) / 1e10 AS mse
    FROM q
    """,
)


_reg(
    "agg_overlap_matrix",
    lambda s, d: agg.agg_overlap_matrix(events_us(s, d)),
    """
    WITH words AS (
      SELECT event_type, user_id // 62 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 62 AS INT)) AS word
      FROM events GROUP BY 1, 2),
    totals AS (
      SELECT event_type, CAST(sum(bit_count(word)) AS BIGINT) AS n_users
      FROM words GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(sum(bit_count(a.word & b.word)) AS BIGINT) AS n_common
      FROM words a JOIN words b ON a.w = b.w
      WHERE a.event_type < b.event_type
      GROUP BY 1, 2),
    frame AS (
      SELECT ta.event_type AS type_a, ta.n_users AS n_a,
             tb.event_type AS type_b, tb.n_users AS n_b
      FROM totals ta, totals tb
      WHERE ta.event_type < tb.event_type)
    SELECT f.type_a, f.type_b, f.n_a, f.n_b,
           coalesce(i.n_common, 0) AS n_common,
           CAST((2000000 * CAST(coalesce(i.n_common, 0) AS HUGEINT)
                 + (f.n_a + f.n_b - coalesce(i.n_common, 0)))
                // (2 * CAST(f.n_a + f.n_b - coalesce(i.n_common, 0)
                             AS HUGEINT)) AS DOUBLE)
             / 1000000.0 AS jaccard
    FROM frame f
    LEFT JOIN inter i ON f.type_a = i.type_a AND f.type_b = i.type_b
    """,
)


_reg(
    "emb_hamming_topk",
    lambda s, d: sim.emb_hamming_topk(load(s, d, "embeddings")),
    """
    WITH flat AS (
      SELECT vec_id, unnest(range(len(embedding))) AS pos,
             CAST(round(unnest(embedding) * 1e6) AS BIGINT) AS v6
      FROM embeddings),
    dims AS (
      SELECT pos, sum(v6) AS s1, count(*) AS n FROM flat GROUP BY 1),
    bits AS (
      SELECT f.vec_id, f.pos,
             CASE WHEN CAST(f.v6 AS HUGEINT) * d.n > d.s1 THEN 1
                  ELSE 0 END AS bit
      FROM flat f JOIN dims d ON f.pos = d.pos),
    sigs AS (
      SELECT vec_id,
             bit_or(CASE WHEN pos < 32
                    THEN CAST(bit AS BIGINT) << CAST(pos AS INT)
                    ELSE 0 END) AS sig_lo,
             bit_or(CASE WHEN pos >= 32
                    THEN CAST(bit AS BIGINT) << CAST(pos - 32 AS INT)
                    ELSE 0 END) AS sig_hi
      FROM bits GROUP BY 1),
    queries AS (
      SELECT vec_id AS q_id, sig_lo AS q_lo, sig_hi AS q_hi
      FROM sigs ORDER BY vec_id LIMIT 5),
    scored AS (
      SELECT q.q_id, s.vec_id,
             CAST(bit_count(xor(s.sig_lo, q.q_lo))
                  + bit_count(xor(s.sig_hi, q.q_hi)) AS INT) AS hamming
      FROM sigs s CROSS JOIN queries q
      WHERE s.vec_id != q.q_id)
    SELECT q_id, vec_id, hamming,
           CAST(row_number() OVER (PARTITION BY q_id
                                   ORDER BY hamming, vec_id) AS INT) AS rk
    FROM scored
    QUALIFY rk <= 5
    """,
)


_reg(
    "agg_ks_test",
    lambda s, d: agg.agg_ks_test(events_us(s, d)),
    """
    WITH counts AS (
      SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v,
             count(*) AS c
      FROM events GROUP BY 1, 2),
    totals AS (SELECT t, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1),
    pairs AS (
      SELECT a.t AS type_a, a.n AS n_a, b.t AS type_b, b.n AS n_b
      FROM totals a, totals b WHERE a.t < b.t),
    vals AS (SELECT DISTINCT v FROM counts),
    spine AS (SELECT p.*, vals.v FROM pairs p, vals),
    j AS (
      SELECT s.type_a, s.type_b, s.n_a, s.n_b, s.v,
             coalesce(ca.c, 0) AS c_a, coalesce(cb.c, 0) AS c_b
      FROM spine s
      LEFT JOIN counts ca ON ca.t = s.type_a AND ca.v = s.v
      LEFT JOIN counts cb ON cb.t = s.type_b AND cb.v = s.v),
    cum AS (
      SELECT type_a, type_b, n_a, n_b,
             CAST(sum(c_a) OVER w AS HUGEINT) * n_b
               - CAST(sum(c_b) OVER w AS HUGEINT) * n_a AS diff
      FROM j
      WINDOW w AS (PARTITION BY type_a, type_b ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    g AS (
      SELECT type_a, type_b, max(n_a) AS n_a, max(n_b) AS n_b,
             max(abs(diff)) AS d_num
      FROM cum GROUP BY 1, 2)
    SELECT type_a, type_b, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST((2000000 * CAST(d_num AS HUGEINT)
                 + CAST(n_a AS HUGEINT) * n_b)
                // (2 * CAST(n_a AS HUGEINT) * n_b) AS DOUBLE)
             / 1000000.0 AS d
    FROM g
    """,
)


# chi-square homogeneity between sources over the lang distribution: the
# categorical drift gate beside agg_ks_test. The oracle replays the SAME
# deterministic fold — cells from exact HUGEINT cross-products cast once to
# double, summed in lang order via list(ORDER BY)+list_reduce, mirroring
# Spark's array_sort+aggregate left fold (0.0+x == x bit-exactly, so the two
# folds are the identical IEEE addition chain) — and the same
# floor(x*1e6+0.5) output grid.
_reg(
    "agg_chi2_drift",
    lambda s, d: agg.agg_chi2_drift(load(s, d, "documents")),
    """
    WITH counts AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1),
    pairs AS (
      SELECT a.source AS source_a, a.n AS n_a, b.source AS source_b, b.n AS n_b
      FROM tot a, tot b WHERE a.source < b.source),
    pl AS (
      SELECT DISTINCT p.source_a, p.source_b, c.lang
      FROM pairs p JOIN counts c
        ON c.source = p.source_a OR c.source = p.source_b),
    cells AS (
      SELECT p.source_a, p.source_b, p.n_a, p.n_b, pl.lang,
             coalesce(ca.c, 0) AS c_a, coalesce(cb.c, 0) AS c_b,
             coalesce(ca.c, 0) + coalesce(cb.c, 0) AS col_l,
             p.n_a + p.n_b AS t
      FROM pairs p
      JOIN pl ON pl.source_a = p.source_a AND pl.source_b = p.source_b
      LEFT JOIN counts ca ON ca.source = p.source_a AND ca.lang = pl.lang
      LEFT JOIN counts cb ON cb.source = p.source_b AND cb.lang = pl.lang),
    -- d_a/d_b staged so the square is a SELF-MULTIPLY of the cast value,
    -- mirroring Spark's num*num bit-for-bit (libm pow is not guaranteed
    -- to equal a single IEEE multiply — r10 ADVICE)
    cd AS (
      SELECT source_a, source_b, n_a, n_b, lang,
             CAST(CAST(c_a AS HUGEINT) * t
                  - CAST(n_a AS HUGEINT) * col_l AS DOUBLE) AS d_a,
             CAST(CAST(c_b AS HUGEINT) * t
                  - CAST(n_b AS HUGEINT) * col_l AS DOUBLE) AS d_b,
             CAST(CAST(n_a AS HUGEINT) * col_l * t AS DOUBLE) AS e_a,
             CAST(CAST(n_b AS HUGEINT) * col_l * t AS DOUBLE) AS e_b
      FROM cells),
    cc AS (
      SELECT source_a, source_b, n_a, n_b, lang,
             d_a * d_a / e_a AS cell_a,
             d_b * d_b / e_b AS cell_b
      FROM cd),
    g AS (
      SELECT source_a, source_b, max(n_a) AS n_a, max(n_b) AS n_b,
             CAST(count(*) AS BIGINT) AS n_langs,
             list_reduce(flatten(list([cell_a, cell_b] ORDER BY lang)),
                         (x, y) -> x + y) AS chi2_raw
      FROM cc GROUP BY 1, 2)
    SELECT source_a, source_b, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(n_langs - 1 AS BIGINT) AS dof,
           CAST(CAST(floor(chi2_raw * 1e6 + 0.5) AS BIGINT) AS DOUBLE) / 1e6
             AS chi2
    FROM g
    """,
)


# per-doc duplicated-passage fraction over dedup_substring's span sample;
# exact integer ratio, integer-rounded — the curation-facing face of the
# span registry
_reg(
    "text_boilerplate_ratio",
    lambda s, d: tx.text_boilerplate_ratio(load(s, d, "documents")),
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    w AS (SELECT doc_id, array_to_string(toks[i:i+15], ' ') AS span
          FROM t CROSS JOIN unnest(range(1, len(toks) - 16 + 2)) s(i)
          WHERE len(toks) >= 16),
    k AS (SELECT doc_id, span_hash FROM (
            SELECT doc_id, ('0x' || substr(md5(span), 1, 15))::BIGINT AS span_hash
            FROM w) WHERE span_hash % 8 = 0),
    reg AS (SELECT span_hash FROM k GROUP BY 1
            HAVING count(DISTINCT doc_id) >= 2),
    j AS (SELECT k.doc_id,
                 CASE WHEN r.span_hash IS NOT NULL THEN 1 ELSE 0 END AS is_dup
          FROM k LEFT JOIN reg r USING (span_hash)),
    g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                 CAST(sum(is_dup) AS BIGINT) AS n_dup
          FROM j GROUP BY 1)
    SELECT doc_id, n_kept, n_dup,
           CAST((2000000 * n_dup + n_kept) // (2 * n_kept) AS DOUBLE) / 1e6
             AS boiler_ratio
    FROM g
    """,
)


# incremental (CDF) read over the versioned table: manifest-diff planning,
# scans only the v0->v1 increment (days 10..19); oracle = the same day
# filter over raw events
_reg(
    "scan_changes",
    src.q_scan_changes,
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE epoch_us(ts) // {DAY_US} - 19723 >= 10
      AND epoch_us(ts) // {DAY_US} - 19723 < 20
    GROUP BY event_type
    """,
)


# count-of-counts skew census of the user_id key: log2 buckets of rows-per-
# key via the same bit-math bucket as agg_hdr_histogram; pct integer-rounded
_reg(
    "table_key_skew",
    lambda s, d: agg.table_key_skew(events_us(s, d)),
    """
    WITH per AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    g AS (
      SELECT CAST(length(bin(n)) - 1 AS INT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(max(n) AS BIGINT) AS max_per_key
      FROM per GROUP BY 1),
    t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t FROM g)
    SELECT bucket, (CAST(1 AS BIGINT) << bucket) AS lo,
           n_keys, n_rows, max_per_key,
           CAST((2000000 * CAST(n_rows AS HUGEINT) + t)
                // (2 * CAST(t AS HUGEINT)) AS DOUBLE) / 1e6 AS pct_rows
    FROM g, t
    """,
)


# ---- round-10 TPC-H-shaped SQL texts (Q4/Q12/Q13/Q21 on the trimmed schema)

_reg(
    "sql_late_orders",
    lambda s, d: agg.sql_late_orders(load(s, d, "orders"), load(s, d, "lineitem")),
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)

_reg(
    "sql_cust_distribution",
    lambda s, d: agg.sql_cust_distribution(
        load(s, d, "customer"), load(s, d, "orders")
    ),
    """
    WITH co AS (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'F'
      GROUP BY c.c_custkey)
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)

_reg(
    "sql_priority_lines",
    lambda s, d: agg.sql_priority_lines(
        load(s, d, "orders"), load(s, d, "lineitem")
    ),
    """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)

_reg(
    "sql_waiting_supplier",
    lambda s, d: agg.sql_waiting_supplier(
        load(s, d, "supplier"), load(s, d, "lineitem")
    ),
    """
    WITH sm AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS m
      FROM lineitem GROUP BY l_orderkey, l_suppkey),
    multi AS (
      SELECT l_orderkey FROM sm GROUP BY l_orderkey HAVING count(*) >= 2),
    mx AS (
      SELECT sm.l_orderkey, max(sm.m) AS mx
      FROM sm JOIN multi USING (l_orderkey)
      GROUP BY sm.l_orderkey),
    at_mx AS (
      SELECT sm.l_orderkey, CAST(count(*) AS BIGINT) AS n_at
      FROM sm JOIN mx ON mx.l_orderkey = sm.l_orderkey AND sm.m = mx.mx
      GROUP BY sm.l_orderkey),
    blamed AS (
      SELECT sm.l_suppkey
      FROM sm
      JOIN mx ON mx.l_orderkey = sm.l_orderkey AND sm.m = mx.mx
      JOIN at_mx ON at_mx.l_orderkey = sm.l_orderkey AND at_mx.n_at = 1)
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)


# DAU / trailing-30d MAU stickiness: exact distinct actives via the
# contribute-forward explode (bounded 30-slot sequence, never a self-join);
# the oracle replays it with generate_series
_reg(
    "agg_dau_mau",
    lambda s, d: agg.agg_dau_mau(events_us(s, d)),
    f"""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day
      FROM events),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
    contrib AS (
      SELECT ud.user_id, ud.day + g.i AS day
      FROM ud CROSS JOIN (SELECT range AS i FROM range(0, 30)) g),
    mau AS (
      SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM contrib GROUP BY 1)
    SELECT d.day, d.dau, m.mau,
           CAST((2000000 * CAST(d.dau AS HUGEINT) + m.mau)
                // (2 * CAST(m.mau AS HUGEINT)) AS DOUBLE) / 1e6
             AS stickiness
    FROM dau d JOIN mau m USING (day)
    """,
)


# streaming DAU: exact distinct per watermarked daily window (dedup state =
# one row per distinct key per open window); oracle = the batch day rollup
_reg(
    "stream_windowed_distinct",
    sm.stream_windowed_distinct,
    f"""
    SELECT event_type,
           (epoch_us(ts) // {DAY_US}) * {DAY_US} AS day_us,
           CAST(count(DISTINCT user_id) AS BIGINT) AS dau
    FROM events
    GROUP BY 1, 2
    """,
)


# quality-aware dedup survivor selection: clusters (recursive reach over the
# exact-jaccard pair graph) + the shared quality score, argmax per component
# via window rank — mirrors dedup_keep_best's max_by(struct) exactly
_reg(
    "dedup_keep_best",
    lambda s, d: dd.dedup_keep_best(load(s, d, "documents")),
    f"""
    WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL.strip()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
    lbl AS (
      SELECT a AS doc_id, min(b) AS canonical_id FROM reach GROUP BY a),
    t AS (SELECT doc_id, text,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM documents),
    sc AS (SELECT doc_id,
                  len(toks) AS n_tokens,
                  (CASE WHEN len(toks) >= 10 THEN 1 ELSE 0 END
                 + CASE WHEN len([x FOR x IN toks IF list_contains(['the','a','of','and','to','in','is'], x)])
                          / greatest(len(toks), 1) >= 0.05 THEN 1 ELSE 0 END
                 + CASE WHEN len(regexp_extract_all(text, '[0-9]'))
                          / greatest(length(text), 1) <= 0.3 THEN 1 ELSE 0 END
                 + CASE WHEN list_sum([CAST(length(x) AS DOUBLE) FOR x IN toks])
                          / greatest(len(toks), 1) BETWEEN 3.0 AND 12.0
                        THEN 1 ELSE 0 END) AS score
           FROM t),
    j AS (SELECT l.canonical_id, sc.doc_id, sc.score, sc.n_tokens
          FROM lbl l JOIN sc ON sc.doc_id = l.doc_id),
    r AS (SELECT canonical_id, doc_id, score,
                 row_number() OVER (PARTITION BY canonical_id
                                    ORDER BY score DESC, n_tokens DESC, doc_id) AS rn,
                 count(*) OVER (PARTITION BY canonical_id) AS n_members
          FROM j)
    SELECT CAST(canonical_id AS BIGINT) AS canonical_id,
           CAST(doc_id AS BIGINT) AS kept_doc_id,
           CAST(score AS BIGINT) AS kept_score,
           CAST(n_members AS BIGINT) AS n_members
    FROM r WHERE rn = 1
    """,
)


# corpus top-N vocab, then per-doc coverage — exact integer ratio; the
# oracle's vocab pick uses the same (count desc, token asc) deterministic
# order
_reg(
    "text_vocab_coverage",
    lambda s, d: tx.text_vocab_coverage(load(s, d, "documents")),
    """
    WITH tk AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS cnt FROM tk GROUP BY 1
        ORDER BY cnt DESC, tok LIMIT 64)),
    g AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS covered
      FROM tk t LEFT JOIN vocab v USING (tok)
      GROUP BY t.doc_id)
    SELECT doc_id, n_tokens, covered,
           CAST((2000000 * covered + n_tokens) // (2 * CAST(n_tokens AS HUGEINT))
                AS DOUBLE) / 1e6 AS coverage
    FROM g
    """,
)


# streaming trailing-30d MAU: map-side sliding-window assignment + the
# dedup-then-count shape; oracle = the batch contribute-forward explode
# bounded to full-data window ends
_reg(
    "stream_mau_sliding",
    sm.stream_mau_sliding,
    f"""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day
      FROM events),
    b AS (
      SELECT (min(day) + 1) * {DAY_US} AS first_end,
             (max(day) + 1) * {DAY_US} AS last_end
      FROM (SELECT epoch_us(ts) // {DAY_US} AS day FROM events)),
    c AS (
      SELECT ud.user_id, (ud.day + g.i) * {DAY_US} AS win_end_us
      FROM ud CROSS JOIN (SELECT range AS i FROM range(1, 31)) g),
    m AS (
      SELECT win_end_us, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM c GROUP BY 1)
    SELECT m.win_end_us, m.mau
    FROM m, b
    WHERE m.win_end_us >= b.first_end AND m.win_end_us <= b.last_end
    """,
)


# rolling realized volatility: exact bigint window sums of squared tick
# deltas; sqrt is IEEE-correctly-rounded on both engines, output on the
# floor grid — engine-exact with no log/libm exposure
_reg(
    "win_realized_vol",
    lambda s, d: wn.win_realized_vol(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events),
    d AS (
      SELECT event_id, user_id, event_type, ts_us,
             xc - lag(xc) OVER w AS dc
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts_us, event_id)),
    g AS (
      SELECT event_id, user_id, event_type,
             sum(dc * dc) OVER f AS s, count(dc) OVER f AS n
      FROM d
      WINDOW f AS (PARTITION BY user_id, event_type
                   ORDER BY ts_us, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, event_type,
           CASE WHEN n > 0 THEN
             floor(sqrt(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1e4 + 0.5)
               / 1e6
           END AS rvol
    FROM g
    """,
)


# MRL truncation safety report: exact micro-unit energy folds, integer-
# rounded energy ratio, sqrt-on-the-floor-grid cosine — engine-exact,
# zero-shuffle
_reg(
    "emb_matryoshka_report",
    lambda s, d: sim.emb_matryoshka_report(load(s, d, "embeddings")),
    """
    WITH t AS (
      SELECT vec_id,
             CAST(len(embedding) AS BIGINT) AS dim_full,
             list_sum(list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
                    * CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))) AS sa,
             list_sum(list_transform(embedding[1:16],
               x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
                    * CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))) AS sk
      FROM embeddings)
    SELECT vec_id, dim_full, CAST(16 AS BIGINT) AS k,
           CASE WHEN sa > 0 THEN
             CAST((2000000 * CAST(sk AS HUGEINT) + sa)
                  // (2 * CAST(sa AS HUGEINT)) AS DOUBLE) / 1e6
           END AS energy_kept,
           CASE WHEN sa > 0 THEN
             floor(sqrt(CAST(sk AS DOUBLE) / CAST(sa AS DOUBLE)) * 1e6 + 0.5)
               / 1e6
           END AS cos_kept
    FROM t
    """,
)


# total-variation drift: Σ|c_a·n_b − c_b·n_a| / (2·n_a·n_b) — all-integer,
# order-independent (no fold contract needed), integer-rounded
_reg(
    "agg_tvd_drift",
    lambda s, d: agg.agg_tvd_drift(load(s, d, "documents")),
    """
    WITH counts AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1),
    pairs AS (
      SELECT a.source AS source_a, a.n AS n_a, b.source AS source_b, b.n AS n_b
      FROM tot a, tot b WHERE a.source < b.source),
    pl AS (
      SELECT DISTINCT p.source_a, p.source_b, c.lang
      FROM pairs p JOIN counts c
        ON c.source = p.source_a OR c.source = p.source_b),
    cells AS (
      SELECT p.source_a, p.source_b, p.n_a, p.n_b,
             abs(CAST(coalesce(ca.c, 0) AS HUGEINT) * p.n_b
                 - CAST(coalesce(cb.c, 0) AS HUGEINT) * p.n_a) AS num
      FROM pairs p
      JOIN pl ON pl.source_a = p.source_a AND pl.source_b = p.source_b
      LEFT JOIN counts ca ON ca.source = p.source_a AND ca.lang = pl.lang
      LEFT JOIN counts cb ON cb.source = p.source_b AND cb.lang = pl.lang),
    g AS (
      SELECT source_a, source_b, max(n_a) AS n_a, max(n_b) AS n_b,
             sum(num) AS s
      FROM cells GROUP BY 1, 2)
    SELECT source_a, source_b,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST((2000000 * s + 2 * CAST(n_a AS HUGEINT) * n_b)
                // (4 * CAST(n_a AS HUGEINT) * n_b) AS DOUBLE) / 1e6 AS tvd
    FROM g
    """,
)


# ---- round-11 additions: concentration / diversity / oscillator surface

# Herfindahl concentration per event_type over users — exact Σn_u²/N²
# integer-rounded (the DIV device); one fact pass, no window, no join
_reg(
    "agg_hhi",
    lambda s, d: agg.agg_hhi(events_us(s, d)),
    """
    WITH per AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_u
      FROM events GROUP BY 1, 2),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_u) AS BIGINT) AS n_events,
             sum(CAST(n_u AS HUGEINT) * n_u) AS s2
      FROM per GROUP BY 1)
    SELECT event_type, n_users, n_events,
           CAST(CAST((2000000 * s2 + CAST(n_events AS HUGEINT) * n_events)
                     // (2 * CAST(n_events AS HUGEINT) * n_events)
                     AS BIGINT) AS DOUBLE) / 1e6 AS hhi
    FROM g
    """,
)

# top-10-customer revenue share per nation — exact cents ratio on the
# 1e-6 grid; two-phase top-k on the Spark side, plain window in the oracle
_reg(
    "agg_top_share",
    lambda s, d: agg.agg_top_share(
        load(s, d, "orders"), load(s, d, "customer"), load(s, d, "nation")
    ),
    """
    WITH per AS (
      SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS rev_c
      FROM orders GROUP BY 1),
    cust AS (
      SELECT c.c_nationkey, p.o_custkey, p.rev_c
      FROM per p JOIN customer c ON c.c_custkey = p.o_custkey),
    ranked AS (
      SELECT c_nationkey, rev_c,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY rev_c DESC, o_custkey) AS rnk
      FROM cust),
    tot AS (
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(rev_c) AS BIGINT) AS total_c
      FROM cust GROUP BY 1),
    top AS (
      SELECT c_nationkey, CAST(sum(rev_c) AS BIGINT) AS top_c
      FROM ranked WHERE rnk <= 10 GROUP BY 1)
    SELECT n.n_name, t.n_cust, p.top_c, t.total_c,
           CAST(CASE WHEN t.total_c > 0 THEN
             CAST((2000000 * CAST(p.top_c AS HUGEINT) + t.total_c)
                  // (2 * CAST(t.total_c AS HUGEINT)) AS BIGINT)
           END AS DOUBLE) / 1e6 AS top_share
    FROM tot t JOIN top p USING (c_nationkey)
    JOIN nation n ON n.n_nationkey = t.c_nationkey
    """,
)

# stochastic oscillator per series — %K exact integer ratio on the 1e-6
# grid, %D re-rounded from %K's GRID INTEGERS (never a float fold)
_reg(
    "win_stochastic",
    lambda s, d: wn.win_stochastic(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             value, CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    ext AS (
      SELECT *,
             max(c) OVER w AS hi_c, min(c) OVER w AS lo_c
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts_us, event_id
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
    k AS (
      SELECT event_id, user_id, event_type, ts_us, value,
             CASE WHEN hi_c > lo_c THEN
               CAST((200000000 * CAST(c - lo_c AS HUGEINT) + (hi_c - lo_c))
                    // (2 * CAST(hi_c - lo_c AS HUGEINT)) AS BIGINT)
             END AS k6
      FROM ext),
    sm_ AS (
      SELECT event_id, user_id, event_type, value, k6,
             lag(k6, 1) OVER ws AS k6_1, lag(k6, 2) OVER ws AS k6_2
      FROM k
      WINDOW ws AS (PARTITION BY user_id, event_type ORDER BY ts_us, event_id))
    SELECT event_id, user_id, event_type, value,
           CAST(k6 AS DOUBLE) / 1e6 AS pct_k,
           CAST(CASE WHEN k6 IS NOT NULL AND k6_1 IS NOT NULL
                      AND k6_2 IS NOT NULL
                THEN (2 * (k6 + k6_1 + k6_2) + 3) // 6
                END AS DOUBLE) / 1e6 AS pct_d
    FROM sm_
    """,
)

# lexical diversity per doc: exact TTR + MSTTR over 50-token segments —
# ratios of exact integers on the 1e-6 grid, map-only
_reg(
    "text_msttr",
    lambda s, d: tx.text_msttr(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    c AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
             CAST(len(toks) // 50 AS BIGINT) AS n_segs,
             CAST(CASE WHEN len(toks) >= 50 THEN
               list_sum(list_transform(range(len(toks) // 50),
                 i -> len(list_distinct(toks[i * 50 + 1 : i * 50 + 50]))))
             ELSE 0 END AS BIGINT) AS seg_types
      FROM t)
    SELECT doc_id, n_tokens, n_types, n_segs,
           CAST(CASE WHEN n_tokens > 0 THEN
             CAST((2000000 * CAST(n_types AS HUGEINT) + n_tokens)
                  // (2 * CAST(n_tokens AS HUGEINT)) AS BIGINT)
           END AS DOUBLE) / 1e6 AS ttr,
           CAST(CASE WHEN n_segs > 0 THEN
             CAST((2000000 * CAST(seg_types AS HUGEINT)
                   + 50 * CAST(n_segs AS HUGEINT))
                  // (2 * 50 * CAST(n_segs AS HUGEINT)) AS BIGINT)
           END AS DOUBLE) / 1e6 AS msttr
    FROM c
    """,
)


# Lorenz concentration curve over log2 cents buckets — exact cumulative
# shares on the 1e-6 grid; one fact pass + a ≤64-row-per-type window
_reg(
    "agg_lorenz",
    lambda s, d: agg.agg_lorenz(events_us(s, d)),
    """
    WITH per AS (
      SELECT event_type,
             CASE WHEN CAST(round(value * 100) AS BIGINT) <= 0 THEN -1
                  ELSE CAST(length(bin(CAST(round(value * 100) AS BIGINT)))
                            - 1 AS INT)
             END AS bucket,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT event_type, bucket, n_rows, sum_c,
             CAST(sum(n_rows) OVER wc AS BIGINT) AS cn,
             CAST(sum(sum_c) OVER wc AS BIGINT) AS cv,
             CAST(sum(n_rows) OVER wa AS BIGINT) AS tn,
             CAST(sum(sum_c) OVER wa AS BIGINT) AS tv
      FROM per
      WINDOW wc AS (PARTITION BY event_type ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING),
             wa AS (PARTITION BY event_type
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING))
    SELECT event_type, bucket, n_rows, sum_c,
           CAST(CASE WHEN tn > 0 THEN
             (CASE WHEN cn < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * CAST(abs(cn) AS HUGEINT) + tn)
                    // (2 * CAST(tn AS HUGEINT)) AS BIGINT)
           END AS DOUBLE) / 1e6 AS cum_row_share,
           CAST(CASE WHEN tv > 0 THEN
             (CASE WHEN cv < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * CAST(abs(cv) AS HUGEINT) + tv)
                    // (2 * CAST(tv AS HUGEINT)) AS BIGINT)
           END AS DOUBLE) / 1e6 AS cum_value_share
    FROM t
    """,
)

# daily floor-trader pivot ladder from the PREVIOUS day's exact-cents
# H/L/C — every level a /3 rational on the 1e-6 grid; per-day lag only
_reg(
    "win_pivot_points",
    lambda s, d: wn.win_pivot_points(events_us(s, d)),
    f"""
    WITH ranked AS (
      SELECT user_id, event_type,
             epoch_us(ts) - epoch_us(ts) % {DAY_US} AS day_us,
             CAST(round(value * 100) AS BIGINT) AS c,
             row_number() OVER (
               PARTITION BY user_id, event_type,
                            epoch_us(ts) - epoch_us(ts) % {DAY_US}
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events),
    daily AS (
      SELECT user_id, event_type, day_us,
             CAST(max(c) AS BIGINT) AS h,
             CAST(min(c) AS BIGINT) AS l,
             CAST(max(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS cl,
             CAST(count(*) AS BIGINT) AS n
      FROM ranked GROUP BY 1, 2, 3),
    t AS (
      SELECT user_id, event_type, day_us, n,
             lag(h) OVER w AS ph, lag(l) OVER w AS pl, lag(cl) OVER w AS pc
      FROM daily
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY day_us))
    SELECT user_id, event_type, day_us, n,
           CAST((CASE WHEN (ph + pl + pc) < 0 THEN -1 ELSE 1 END)
                * CAST((2000000 * CAST(abs(ph + pl + pc) AS HUGEINT) + 300)
                       // (2 * CAST(300 AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS pivot,
           CAST((CASE WHEN (2 * (ph + pl + pc) - 3 * pl) < 0 THEN -1 ELSE 1 END)
                * CAST((2000000 * CAST(abs(2 * (ph + pl + pc) - 3 * pl)
                                       AS HUGEINT) + 300)
                       // (2 * CAST(300 AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS r1,
           CAST((CASE WHEN (2 * (ph + pl + pc) - 3 * ph) < 0 THEN -1 ELSE 1 END)
                * CAST((2000000 * CAST(abs(2 * (ph + pl + pc) - 3 * ph)
                                       AS HUGEINT) + 300)
                       // (2 * CAST(300 AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS s1,
           CAST((CASE WHEN ((ph + pl + pc) + 3 * (ph - pl)) < 0 THEN -1 ELSE 1 END)
                * CAST((2000000 * CAST(abs((ph + pl + pc) + 3 * (ph - pl))
                                       AS HUGEINT) + 300)
                       // (2 * CAST(300 AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS r2,
           CAST((CASE WHEN ((ph + pl + pc) - 3 * (ph - pl)) < 0 THEN -1 ELSE 1 END)
                * CAST((2000000 * CAST(abs((ph + pl + pc) - 3 * (ph - pl))
                                       AS HUGEINT) + 300)
                       // (2 * CAST(300 AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / 1e6 AS s2
    FROM t
    """,
)


# bitwise scalar surface — kdb's bit verbs; pure int64 expressions
_reg(
    "scalar_bitwise",
    lambda s, d: sc.scalar_bitwise(events_us(s, d)),
    """
    SELECT event_id, user_id,
           CAST(event_id & user_id AS BIGINT) AS b_and,
           CAST(event_id | user_id AS BIGINT) AS b_or,
           CAST(xor(event_id, user_id) AS BIGINT) AS b_xor,
           CAST(event_id << 3 AS BIGINT) AS shl3,
           CAST(event_id >> 2 AS BIGINT) AS shr2,
           CAST(~event_id AS BIGINT) AS b_not,
           CAST(bit_count(xor(event_id, user_id)) AS BIGINT) AS hamming
    FROM events WHERE event_id < 1000
    """,
)

# Q16-shaped supplier-variety census (lineitem as the supplier-part
# bridge on the trimmed schema); exact integer counts
_reg(
    "sql_part_supplier_variety",
    lambda s, d: agg.sql_part_supplier_variety(
        load(s, d, "part"), load(s, d, "lineitem")
    ),
    """
    SELECT p.p_brand,
           CASE WHEN instr(p.p_type, ' ') > 0
                THEN substring(p.p_type, 1, instr(p.p_type, ' ') - 1)
                ELSE '' END AS type_class,
           CAST(p.p_size // 10 AS BIGINT) AS size_band,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt,
           CAST(count(*) AS BIGINT) AS n_shipments
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type NOT LIKE 'MEDIUM%'
    GROUP BY 1, 2, 3
    """,
)


# ---------------------------------------------------------------- round 12
# Aroon trend-age indicator: struct-max argmax/argmin (latest tie wins on
# both engines), exact integer ratios through the 1e-4 device
_reg(
    "win_aroon",
    lambda s, d: wn.win_aroon(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tu,
             CAST(round(value * 100) AS BIGINT) AS c,
             CAST(row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY epoch_us(ts), event_id)
                  AS BIGINT) AS pos
      FROM events),
    m AS (
      SELECT event_id, user_id, event_type, value, pos,
             (max(struct_pack(v := c, p := pos)) OVER w).p AS hi_pos,
             (max(struct_pack(v := -c, p := pos)) OVER w).p AS lo_pos,
             CAST(count(*) OVER w - 1 AS BIGINT) AS m
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                   ROWS BETWEEN 24 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, event_type, value,
           CAST(pos - hi_pos AS BIGINT) AS since_hi,
           CAST(pos - lo_pos AS BIGINT) AS since_lo,
           CASE WHEN m > 0 THEN
             CAST((20000 * (100 * (CAST(m AS HUGEINT) - (pos - hi_pos))) + m)
                  // (2 * CAST(m AS HUGEINT)) AS DOUBLE) / 1e4
           END AS aroon_up,
           CASE WHEN m > 0 THEN
             CAST((20000 * (100 * (CAST(m AS HUGEINT) - (pos - lo_pos))) + m)
                  // (2 * CAST(m AS HUGEINT)) AS DOUBLE) / 1e4
           END AS aroon_down
    FROM m
    """,
)

# Ichimoku midpoint ladder: exact integer grids end to end (x/200 and
# x/400 dollars are exact at 6 dp), three frames over one sort
_reg(
    "win_ichimoku",
    lambda s, d: wn.win_ichimoku(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tu,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    m AS (
      SELECT event_id, user_id, event_type, value,
             max(c) OVER w8 + min(c) OVER w8 AS t2,
             max(c) OVER w25 + min(c) OVER w25 AS b2,
             max(c) OVER w51 + min(c) OVER w51 AS sb2
      FROM t
      WINDOW w8 AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                    ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
             w25 AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                     ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
             w51 AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                     ROWS BETWEEN 51 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, event_type, value,
           CAST(t2 * 5000 AS DOUBLE) / 1e6 AS tenkan,
           CAST(b2 * 5000 AS DOUBLE) / 1e6 AS kijun,
           CAST((t2 + b2) * 2500 AS DOUBLE) / 1e6 AS span_a,
           CAST(sb2 * 5000 AS DOUBLE) / 1e6 AS span_b
    FROM m
    """,
)

# Ulcer index: exact bigint drawdown moments; the one sqrt+round(4) is the
# documented irrational-statistic class (same-double both engines)
_reg(
    "win_ulcer_index",
    lambda s, d: wn.win_ulcer_index(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tu,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    d AS (
      SELECT event_id, user_id, event_type, value, tu,
             max(c) OVER w - c AS dd
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
    u AS (
      SELECT event_id, user_id, event_type, value,
             sum(dd * dd) OVER w AS sq,
             count(*) OVER w AS n,
             max(dd) OVER w AS mdd
      FROM d
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, event_type, value,
           round(sqrt(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0, 4)
             AS ulcer,
           CAST(mdd AS DOUBLE) / 100.0 AS max_dd
    FROM u
    """,
)

# Wald–Wolfowitz runs test: exact integer runs/sign counts, null-model
# moments as exact rationals through the 1e-6 device (no sqrt surfaced)
_reg(
    "agg_runs_test",
    lambda s, d: agg.agg_runs_test(events_us(s, d)),
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    d AS (
      SELECT user_id, event_type, tu, event_id,
             sign(c - lag(c) OVER (PARTITION BY user_id, event_type
                                   ORDER BY tu, event_id)) AS s
      FROM t),
    f AS (SELECT * FROM d WHERE s IS NOT NULL AND s <> 0),
    r AS (
      SELECT user_id, event_type, s,
             CASE WHEN lag(s) OVER (PARTITION BY user_id, event_type
                                    ORDER BY tu, event_id) IS NULL
                    OR lag(s) OVER (PARTITION BY user_id, event_type
                                    ORDER BY tu, event_id) <> s
                  THEN 1 ELSE 0 END AS boundary
      FROM f),
    g AS (
      SELECT user_id, event_type,
             CAST(sum(boundary) AS BIGINT) AS n_runs,
             CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      FROM r GROUP BY 1, 2)
    SELECT user_id, event_type, n_runs, n_pos, n_neg,
           CASE WHEN n_pos + n_neg > 0 THEN
             CAST((2000000 * ((CAST(n_pos AS HUGEINT) + n_neg)
                              + 2 * CAST(n_pos AS HUGEINT) * n_neg)
                   + (CAST(n_pos AS HUGEINT) + n_neg))
                  // (2 * (CAST(n_pos AS HUGEINT) + n_neg)) AS DOUBLE) / 1e6
           END AS mu_runs,
           CASE WHEN n_pos + n_neg > 1 THEN
             CAST((2000000 * (2 * CAST(n_pos AS HUGEINT) * n_neg
                              * (2 * CAST(n_pos AS HUGEINT) * n_neg
                                 - (CAST(n_pos AS HUGEINT) + n_neg)))
                   + ((CAST(n_pos AS HUGEINT) + n_neg)
                      * (CAST(n_pos AS HUGEINT) + n_neg)
                      * (CAST(n_pos AS HUGEINT) + n_neg - 1)))
                  // (2 * (CAST(n_pos AS HUGEINT) + n_neg)
                      * (CAST(n_pos AS HUGEINT) + n_neg)
                      * (CAST(n_pos AS HUGEINT) + n_neg - 1)) AS DOUBLE) / 1e6
           END AS var_runs
    FROM g
    """,
)

# Index of dispersion of hourly arrival counts: exact two-level integer
# aggregation, both statistics exact rationals through the 1e-6 device
_reg(
    "agg_poisson_dispersion",
    lambda s, d: agg.agg_poisson_dispersion(events_us(s, d)),
    """
    WITH hrs AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS h,
             CAST(sum(cnt) AS BIGINT) AS s,
             sum(CAST(cnt AS HUGEINT) * cnt) AS q
      FROM hrs GROUP BY 1)
    SELECT event_type, h AS n_hours, s AS n_events,
           CAST((2000000 * CAST(s AS HUGEINT) + h)
                // (2 * CAST(h AS HUGEINT)) AS DOUBLE) / 1e6 AS mean_per_hour,
           CASE WHEN h > 1 THEN
             CAST((2000000 * (CAST(h AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
                   + ((CAST(h AS HUGEINT) - 1) * s))
                  // (2 * (CAST(h AS HUGEINT) - 1) * s) AS DOUBLE) / 1e6
           END AS dispersion
    FROM g
    """,
)

# Hapax legomena profile: map-only sorted-neighbour scan (no explode
# shuffle), exact integer counts + device ratios
_reg(
    "text_hapax_ratio",
    lambda s, d: tx.text_hapax_ratio(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
             list_sort(regexp_extract_all(lower(text), '[a-z0-9]+')) AS srt
      FROM documents),
    c AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
             CAST(len(list_distinct(srt)) AS BIGINT)
             - CAST(len(list_distinct(list_filter(
                 list_transform(range(1, len(srt)),
                   i -> CASE WHEN srt[i] = srt[i+1] THEN srt[i] END),
                 x -> x IS NOT NULL))) AS BIGINT) AS n_hapax
      FROM t)
    SELECT doc_id, n_tokens, n_types, n_hapax,
           CASE WHEN n_types > 0 THEN
             CAST((2000000 * CAST(n_hapax AS HUGEINT) + n_types)
                  // (2 * CAST(n_types AS HUGEINT)) AS DOUBLE) / 1e6
           END AS hapax_type_ratio,
           CASE WHEN n_tokens > 0 THEN
             CAST((2000000 * CAST(n_hapax AS HUGEINT) + n_tokens)
                  // (2 * CAST(n_tokens AS HUGEINT)) AS DOUBLE) / 1e6
           END AS hapax_token_ratio
    FROM c
    """,
)


# ---------------------------------------------------------- round 12, batch 2
# Simpson concentration / Gini–Simpson diversity: map-only run-length fold
# on the sorted token array; the oracle derives the SAME pair count via
# unnest+group (results must match, plans need not)
_reg(
    "text_simpson_diversity",
    lambda s, d: tx.text_simpson_diversity(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    f AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    c AS (SELECT doc_id, tok, CAST(count(*) AS HUGEINT) AS cnt
          FROM f GROUP BY 1, 2),
    p AS (SELECT doc_id, sum(cnt * (cnt - 1)) AS twop FROM c GROUP BY 1),
    j AS (
      SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
             coalesce(p.twop, 0) AS twop
      FROM t LEFT JOIN p ON t.doc_id = p.doc_id)
    SELECT doc_id, n_tokens,
           CAST(twop // 2 AS BIGINT) AS n_equal_pairs,
           CASE WHEN n_tokens > 1 THEN
             CAST((2000000 * CAST(twop AS HUGEINT)
                   + CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
                  // (2 * CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
                  AS DOUBLE) / 1e6
           END AS simpson,
           CASE WHEN n_tokens > 1 THEN
             CAST((2000000 * (CAST(n_tokens AS HUGEINT) * (n_tokens - 1) - twop)
                   + CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
                  // (2 * CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
                  AS DOUBLE) / 1e6
           END AS gini_simpson
    FROM j
    """,
)

# Trailing VWAP per supplier shipment sequence: decimal-widened frame sums,
# exact cents·qty rationals on the 1e-6 grid
_reg(
    "win_trailing_vwap",
    lambda s, d: wn.win_trailing_vwap(load(s, d, "lineitem")),
    """
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_quantity) AS BIGINT) AS q
      FROM lineitem),
    m AS (
      SELECT l_orderkey, l_linenumber, l_suppkey,
             sum(CAST(pc AS HUGEINT) * q) OVER w AS nq,
             CAST(sum(q) OVER w AS BIGINT) AS dq,
             CAST(count(*) OVER w AS BIGINT) AS n_lines
      FROM t
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
    SELECT l_orderkey, l_linenumber, l_suppkey, n_lines,
           CASE WHEN dq > 0 THEN
             CAST((2000000 * nq + 100 * CAST(dq AS HUGEINT))
                  // (200 * CAST(dq AS HUGEINT)) AS DOUBLE) / 1e6
           END AS vwap
    FROM m
    """,
)

# Inter-arrival gap profile per series: exact µs gaps, device mean,
# integer-moment sd (the agg_stats rationale)
_reg(
    "agg_interarrival_stats",
    lambda s, d: agg.agg_interarrival_stats(events_us(s, d)),
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id FROM events),
    d AS (
      SELECT user_id, event_type,
             tu - lag(tu) OVER (PARTITION BY user_id, event_type
                                ORDER BY tu, event_id) AS g
      FROM t),
    f AS (SELECT * FROM d WHERE g IS NOT NULL),
    a AS (
      SELECT user_id, event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS BIGINT) AS s1,
             sum(CAST(g AS HUGEINT) * g) AS s2,
             CAST(min(g) AS BIGINT) AS mn,
             CAST(max(g) AS BIGINT) AS mx
      FROM f GROUP BY 1, 2)
    SELECT user_id, event_type, n AS n_gaps,
           CAST((2000000 * CAST(s1 AS HUGEINT)
                 + CAST(n AS HUGEINT) * 1000000)
                // (2 * CAST(n AS HUGEINT) * 1000000) AS DOUBLE) / 1e6
             AS mean_gap_s,
           CAST(mn AS DOUBLE) / 1e6 AS min_gap_s,
           CAST(mx AS DOUBLE) / 1e6 AS max_gap_s,
           CASE WHEN n > 1 THEN
             round(sqrt(CAST(CAST(n AS HUGEINT) * s2
                             - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                        / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))
                   / 1e6, 6)
           END AS sd_gap_s
    FROM a
    """,
)

# Log2-bucketed degree distribution of the trade graph, split by the
# parity vertex namespace — all exact integers
_reg(
    "graph_degree_distribution",
    lambda s, d: gr.degree_distribution(
        load(s, d, "orders"), load(s, d, "lineitem")
    ),
    """
    WITH pairs AS (
      SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT c AS src, s AS dst FROM pairs
          UNION ALL SELECT s AS src, c AS dst FROM pairs),
    d AS (
      SELECT src, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT DISTINCT src, dst FROM e) GROUP BY 1)
    SELECT CAST(src % 2 AS INT) AS side,
           CAST(length(bin(deg)) - 1 AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(min(deg) AS BIGINT) AS min_deg,
           CAST(max(deg) AS BIGINT) AS max_deg,
           CAST(sum(deg) AS BIGINT) AS sum_deg
    FROM d GROUP BY 1, 2
    """,
)


# ACF ladder: per-lag exact co-moments, the agg_autocorr derivation at
# every lag 1..5 in long format; one window + stack on the Spark side
_reg(
    "agg_acf_table",
    lambda s, d: agg.agg_acf_table(events_us(s, d)),
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events),
    p AS (
      SELECT user_id, event_type, 1 AS lag, x,
             lag(x, 1) OVER (PARTITION BY user_id, event_type
                               ORDER BY tu, event_id) AS y
      FROM t
      UNION ALL
      SELECT user_id, event_type, 2 AS lag, x,
             lag(x, 2) OVER (PARTITION BY user_id, event_type
                               ORDER BY tu, event_id) AS y
      FROM t
      UNION ALL
      SELECT user_id, event_type, 3 AS lag, x,
             lag(x, 3) OVER (PARTITION BY user_id, event_type
                               ORDER BY tu, event_id) AS y
      FROM t
      UNION ALL
      SELECT user_id, event_type, 4 AS lag, x,
             lag(x, 4) OVER (PARTITION BY user_id, event_type
                               ORDER BY tu, event_id) AS y
      FROM t
      UNION ALL
      SELECT user_id, event_type, 5 AS lag, x,
             lag(x, 5) OVER (PARTITION BY user_id, event_type
                               ORDER BY tu, event_id) AS y
      FROM t),
    f AS (SELECT * FROM p WHERE y IS NOT NULL),
    g AS (
      SELECT user_id, event_type, CAST(lag AS INT) AS lag,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(x AS HUGEINT) * y) AS sxy
      FROM f GROUP BY 1, 2, 3)
    SELECT user_id, event_type, lag, n AS n_pairs,
           CASE WHEN CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) > 0
                 AND CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) > 0
                THEN round(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                                  * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)), 4)
           END AS ac
    FROM g
    WHERE n >= 3
    """,
)


# On-balance volume over the supplier shipment sequence: pure-integer
# signed-quantity running sum (pairs with win_trailing_vwap)
_reg(
    "win_obv",
    lambda s, d: wn.win_obv(load(s, d, "lineitem")),
    """
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
             CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
      FROM lineitem),
    d AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate, q,
             pc - lag(pc) OVER (PARTITION BY l_suppkey
                                ORDER BY l_shipdate, l_orderkey, l_linenumber)
               AS dp
      FROM t),
    s AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
             CASE WHEN dp > 0 THEN q WHEN dp < 0 THEN -q ELSE 0 END AS sq
      FROM d)
    SELECT l_orderkey, l_linenumber, l_suppkey,
           CAST(sum(sq) OVER (PARTITION BY l_suppkey
                              ORDER BY l_shipdate, l_orderkey, l_linenumber
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS obv
    FROM s
    """,
)


# Streaming inter-arrival monitor: per-gap emission with running max and
# device-exact running mean; oracle = the cumulative batch window form
_reg(
    "stream_interarrival",
    sm.stream_interarrival,
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id FROM events),
    d AS (
      SELECT user_id, event_type, tu, event_id,
             tu - lag(tu) OVER (PARTITION BY user_id, event_type
                                ORDER BY tu, event_id) AS g
      FROM t),
    f AS (SELECT * FROM d WHERE g IS NOT NULL),
    r AS (
      SELECT user_id, event_type, tu AS ts_us, event_id, g,
             CAST(sum(g) OVER w2 AS BIGINT) AS s1,
             CAST(count(*) OVER w2 AS BIGINT) AS n,
             CAST(max(g) OVER w2 AS BIGINT) AS mx
      FROM f
      WINDOW w2 AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT user_id, event_type, ts_us, event_id,
           CAST(g AS DOUBLE) / 1e6 AS gap_s,
           CAST(mx AS DOUBLE) / 1e6 AS max_gap_s,
           CAST((2000000 * CAST(s1 AS HUGEINT) + CAST(n AS HUGEINT) * 1000000)
                // (2 * CAST(n AS HUGEINT) * 1000000) AS DOUBLE) / 1e6
             AS mean_gap_s
    FROM r
    """,
)


# RFM segmentation census: exact integer recency/frequency/monetary with
# bit-math bands; the BI cohort cut as a SQL text entry
_reg(
    "sql_rfm_segments",
    lambda s, d: agg.sql_rfm_segments(load(s, d, "orders")),
    """
    WITH per AS (
      SELECT o_custkey,
             CAST(datediff('day', CAST(max(o_orderdate) AS DATE),
                           DATE '2001-09-01') AS BIGINT) AS r_days,
             CAST(count(*) AS BIGINT) AS f_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS m_cents
      FROM orders GROUP BY 1),
    b AS (
      SELECT r_days, f_orders, m_cents,
             CAST(length(bin(r_days)) - 1 AS INT) AS r_band,
             CAST(length(bin(f_orders)) - 1 AS INT) AS f_band,
             CAST(length(bin(m_cents // 100000)) - 1 AS INT) AS m_band
      FROM per)
    SELECT r_band, f_band, m_band,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(m_cents) AS BIGINT) AS revenue_c,
           CAST(min(r_days) AS BIGINT) AS min_r_days,
           CAST(max(r_days) AS BIGINT) AS max_r_days
    FROM b GROUP BY 1, 2, 3
    """,
)


# Round-number price clustering: exact divisibility counts on cents with
# device shares — the microstructure forensics gate beside agg_benford
_reg(
    "agg_round_number_bias",
    lambda s, d: agg.agg_round_number_bias(events_us(s, d)),
    """
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN c % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_whole,
             CAST(sum(CASE WHEN c % 50 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_half,
             CAST(sum(CASE WHEN c % 25 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarter,
             CAST(sum(CASE WHEN c % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dime
      FROM c GROUP BY 1)
    SELECT event_type, n, n_whole, n_half, n_quarter, n_dime,
           CAST((2000000 * CAST(n_whole AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS whole_share,
           CAST((2000000 * CAST(n_half AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS half_share,
           CAST((2000000 * CAST(n_quarter AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS quarter_share,
           CAST((2000000 * CAST(n_dime AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS dime_share
    FROM g
    """,
)


# ---------------------------------------------------------- round 12, batch 5
# Williams %R: inverted range-position oscillator — exact cents extremes,
# unsigned device ratio, one negation on the exact grid integer
_reg(
    "win_williams_r",
    lambda s, d: wn.win_williams_r(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tu, value,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_id, user_id, event_type, value, c,
             max(c) OVER win AS hi_c, min(c) OVER win AS lo_c
      FROM t
      WINDOW win AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, event_type, value,
           CASE WHEN hi_c > lo_c THEN
             CAST(-((200000000 * CAST(hi_c - c AS HUGEINT) + (hi_c - lo_c))
                    // (2 * CAST(hi_c - lo_c AS HUGEINT))) AS DOUBLE) / 1e6
           END AS willr
    FROM w
    """,
)


# Money Flow Index over the supplier shipment sequence: volume-scaled RSI,
# decimal-widened price*quantity flows, unsigned device ratio
_reg(
    "win_mfi",
    lambda s, d: wn.win_mfi(load(s, d, "lineitem")),
    """
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_quantity) AS BIGINT) AS q
      FROM lineitem),
    d AS (
      SELECT *, pc - lag(pc) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber)
                AS dp
      FROM t),
    f AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
             CASE WHEN dp > 0 THEN CAST(pc AS HUGEINT) * q ELSE 0 END AS pf,
             CASE WHEN dp < 0 THEN CAST(pc AS HUGEINT) * q ELSE 0 END AS nf
      FROM d),
    s AS (
      SELECT l_orderkey, l_linenumber, l_suppkey,
             sum(pf) OVER win AS pmf, sum(nf) OVER win AS nmf
      FROM f
      WINDOW win AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT l_orderkey, l_linenumber, l_suppkey,
           CAST(pmf AS BIGINT) AS pmf_c, CAST(nmf AS BIGINT) AS nmf_c,
           CASE WHEN pmf + nmf > 0 THEN
             CAST((2000000 * (100 * pmf) + (pmf + nmf))
                  // (2 * (pmf + nmf)) AS DOUBLE) / 1e6
           END AS mfi
    FROM s
    """,
)


# Spearman rank correlation: Pearson on exact doubled average ranks —
# tie-corrected, integer co-moments, one IEEE divide/sqrt on the 1e-4 grid
_reg(
    "agg_spearman",
    lambda s, d: agg.agg_spearman(events_us(s, d)),
    """
    WITH b AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS x,
             epoch_us(ts) % 86400000000 AS y
      FROM events),
    r AS (
      SELECT event_type,
             2 * rank() OVER (PARTITION BY event_type ORDER BY x)
               + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
             2 * rank() OVER (PARTITION BY event_type ORDER BY y)
               + count(*) OVER (PARTITION BY event_type, y) - 1 AS ry
      FROM b),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(rx AS HUGEINT)) AS su, sum(CAST(ry AS HUGEINT)) AS sv,
             sum(CAST(rx AS HUGEINT) * rx) AS suu,
             sum(CAST(ry AS HUGEINT) * ry) AS svv,
             sum(CAST(rx AS HUGEINT) * ry) AS suv
      FROM r GROUP BY 1),
    t AS (
      SELECT event_type, n,
             CAST(n AS HUGEINT) * suv - su * sv AS cm,
             CAST(n AS HUGEINT) * suu - su * su AS a,
             CAST(n AS HUGEINT) * svv - sv * sv AS b
      FROM g)
    SELECT event_type, n,
           CASE WHEN a > 0 AND b > 0 THEN
             CAST(floor(CAST(cm AS DOUBLE)
                        / sqrt(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
                        * 1e4 + 0.5) AS DOUBLE) / 1e4
           END AS spearman_rho
    FROM t
    """,
)


# Yule's K vocabulary-repetitiveness constant per language: exact integer
# frequency spectrum moments, unsigned device at 6 dp
_reg(
    "text_yule_k",
    lambda s, d: tx.text_yule_k(load(s, d, "documents")),
    """
    WITH f AS (
      SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents),
    m AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS m FROM f GROUP BY 1, 2),
    g AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(m) AS BIGINT) AS n_tokens,
             sum(CAST(m AS HUGEINT) * m) AS s2
      FROM m GROUP BY 1)
    SELECT lang, n_types, n_tokens, CAST(s2 AS BIGINT) AS s2,
           CAST((2000000 * (10000 * (s2 - CAST(n_tokens AS HUGEINT)))
                 + CAST(n_tokens AS HUGEINT) * n_tokens)
                // (2 * CAST(n_tokens AS HUGEINT) * n_tokens) AS DOUBLE) / 1e6
             AS yule_k
    FROM g
    """,
)


# CCI: mean-absolute-deviation-from-frame-mean oscillator — the frame's
# cents array folded with a higher-order aggregate, all integers after
# denominator clearing; oracle derives the same integers via list lambdas
_reg(
    "win_cci",
    lambda s, d: wn.win_cci(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tu, value,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_id, user_id, event_type, value, c,
             list(c) OVER (PARTITION BY user_id, event_type
                           ORDER BY tu, event_id
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS cs
      FROM t),
    a AS (
      SELECT event_id, user_id, event_type, value, c, cs,
             CAST(len(cs) AS BIGINT) AS l,
             CAST(list_sum(cs) AS BIGINT) AS s
      FROM w),
    d AS (
      SELECT event_id, user_id, event_type, value, c, l, s,
             CAST(list_sum(list_transform(cs, x -> abs(x * l - s)))
                  AS BIGINT) AS dev
      FROM a)
    SELECT event_id, user_id, event_type, value,
           CASE WHEN dev > 0 THEN
             (CASE WHEN c * l - s < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * CAST(1000 AS HUGEINT) * l * abs(c * l - s)
                     + 15 * CAST(dev AS HUGEINT))
                    // (2 * 15 * CAST(dev AS HUGEINT)) AS DOUBLE) / 1e6
           END AS cci
    FROM d
    """,
)


# Mann–Whitney U: weekend-vs-weekday rank-sum per event_type — doubled
# average ranks, exact tie-corrected variance, one IEEE divide/sqrt
_reg(
    "agg_mann_whitney",
    lambda s, d: agg.agg_mann_whitney(events_us(s, d)),
    """
    WITH b AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS x,
             ((epoch_us(ts) // 86400000000) % 7) IN (2, 3) AS is_b
      FROM events),
    r AS (
      SELECT event_type, is_b,
             2 * rank() OVER (PARTITION BY event_type ORDER BY x)
               + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx
      FROM b),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             sum(CASE WHEN is_b THEN CAST(rx AS HUGEINT) ELSE 0 END) AS r2b
      FROM r GROUP BY 1),
    tc AS (
      SELECT event_type, sum(CAST(t AS HUGEINT) * t * t - t) AS tcorr
      FROM (SELECT event_type, x, CAST(count(*) AS BIGINT) AS t
            FROM b GROUP BY 1, 2) GROUP BY 1),
    j AS (
      SELECT g.event_type, n, n - n_b AS n_a, n_b,
             CAST(r2b - CAST(n_b AS HUGEINT) * (n_b + 1) AS BIGINT) AS u2_b,
             CAST(n - n_b AS HUGEINT) * n_b
               * (CAST(n AS HUGEINT) * n * n - n - tcorr) AS vnum
      FROM g JOIN tc ON tc.event_type = g.event_type)
    SELECT event_type, n_a, n_b, u2_b,
           CASE WHEN n_a > 0 AND n_b > 0 AND vnum > 0 THEN
             CAST(floor(
               CAST(CAST(u2_b AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b
                    AS DOUBLE)
               / (2 * sqrt(CAST(vnum AS DOUBLE)
                           / CAST(12 * CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)))
               * 1e4 + 0.5) AS DOUBLE) / 1e4
           END AS z
    FROM j
    """,
)


# Month-over-month revenue growth as SQL text: integer month key, exact
# cents, sign-aware device growth; the lag window sees only month rows
_reg(
    "sql_monthly_growth",
    lambda s, d: agg.sql_monthly_growth(load(s, d, "orders")),
    """
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS ym,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS revenue_c
      FROM orders GROUP BY 1),
    l AS (
      SELECT ym, n_orders, revenue_c,
             lag(revenue_c) OVER (ORDER BY ym) AS prev_c
      FROM m)
    SELECT ym, n_orders, revenue_c, prev_c,
           CASE WHEN prev_c > 0 THEN
             (CASE WHEN revenue_c - prev_c < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * CAST(abs(revenue_c - prev_c) AS HUGEINT)
                     + prev_c)
                    // (2 * CAST(prev_c AS HUGEINT)) AS DOUBLE) / 1e6
           END AS mom_growth
    FROM l
    """,
)


# Neighbor-set Jaccard over the co-purchase projection: exact common/degree
# integers off one deduped incidence, unsigned device ratio
_reg(
    "graph_jaccard_neighbors",
    lambda s, d: gr.co_purchase_jaccard(
        load(s, d, "orders"), load(s, d, "lineitem"), max_per_part=500
    ),
    # the oracle mirrors the engine's max_per_part=500 hub cap exactly
    # (same rank order, same tiebreak: row_number per part over unique c),
    # so parity holds by construction on ANY data, not just data where no
    # part exceeds the cap (r12 ADVICE)
    """
    WITH cp0 AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
                 FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    cp AS (SELECT c, p FROM (
             SELECT c, p, row_number() OVER (PARTITION BY p ORDER BY c) AS rn
             FROM cp0)
           WHERE rn <= 500),
    d AS (SELECT c, CAST(count(*) AS BIGINT) AS deg FROM cp GROUP BY 1),
    e AS (SELECT a.c AS a, b.c AS b, CAST(count(*) AS BIGINT) AS common
          FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
          GROUP BY 1, 2 HAVING count(*) >= 3)
    SELECT e.a, e.b, e.common,
           da.deg AS deg_a, db.deg AS deg_b,
           CAST((2000000 * CAST(common AS HUGEINT)
                 + (da.deg + db.deg - common))
                // (2 * CAST(da.deg + db.deg - common AS HUGEINT))
                AS DOUBLE) / 1e6 AS jaccard
    FROM e JOIN d da ON da.c = e.a JOIN d db ON db.c = e.b
    """,
)


# Time-since-last-purchase per user at every row: pure integer µs window
# arithmetic (the feature-store recency staple)
_reg(
    "win_since_event",
    lambda s, d: wn.win_since_event(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tu FROM events)
    SELECT event_id, user_id, event_type, tu AS ts_us,
           CAST(tu - max(CASE WHEN event_type = 'purchase' THEN tu END)
                     OVER w AS BIGINT) AS since_us,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    OVER w AS BIGINT) AS n_target_so_far
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)


# Cohen's d weekend-vs-weekday effect size: exact decimal conditional
# moments, denominator-cleared pooled variance, one IEEE chain to the grid
_reg(
    "agg_cohens_d",
    lambda s, d: agg.agg_cohens_d(events_us(s, d)),
    """
    WITH b AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS x,
             ((epoch_us(ts) // 86400000000) % 7) IN (2, 3) AS is_b
      FROM events),
    g AS (
      SELECT event_type,
             CAST(sum(CASE WHEN NOT is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             sum(CASE WHEN NOT is_b THEN CAST(x AS HUGEINT) ELSE 0 END) AS s_a,
             sum(CASE WHEN is_b THEN CAST(x AS HUGEINT) ELSE 0 END) AS s_b,
             sum(CASE WHEN NOT is_b THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS q_a,
             sum(CASE WHEN is_b THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS q_b
      FROM b GROUP BY 1),
    t AS (
      SELECT event_type, n_a, n_b,
             CAST(n_b AS HUGEINT) * (CAST(n_a AS HUGEINT) * q_a - s_a * s_a)
               + CAST(n_a AS HUGEINT) * (CAST(n_b AS HUGEINT) * q_b - s_b * s_b)
               AS vnum,
             s_b * CAST(n_a AS HUGEINT) - s_a * CAST(n_b AS HUGEINT) AS diff,
             s_a, s_b
      FROM g)
    SELECT event_type, n_a, n_b,
           CASE WHEN n_a > 0 THEN
             (CASE WHEN s_a < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * abs(s_a) + 100 * CAST(n_a AS HUGEINT))
                    // (2 * 100 * CAST(n_a AS HUGEINT)) AS DOUBLE) / 1e6
           END AS mean_weekday,
           CASE WHEN n_b > 0 THEN
             (CASE WHEN s_b < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * abs(s_b) + 100 * CAST(n_b AS HUGEINT))
                    // (2 * 100 * CAST(n_b AS HUGEINT)) AS DOUBLE) / 1e6
           END AS mean_weekend,
           CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 2 AND vnum > 0 THEN
             CAST(floor(
               CAST(diff AS DOUBLE)
               / (CAST(CAST(n_a AS HUGEINT) * n_b AS DOUBLE)
                  * sqrt(CAST(vnum AS DOUBLE)
                         / CAST(CAST(n_a AS HUGEINT) * n_b * (n_a + n_b - 2)
                                AS DOUBLE)))
               * 1e4 + 0.5) AS DOUBLE) / 1e4
           END AS cohens_d
    FROM t
    """,
)


# Cramér's V type×weekday association: structural-zero cells included,
# per-cell deterministic doubles folded in fixed order (chi2_drift device)
_reg(
    "agg_cramers_v",
    lambda s, d: agg.agg_cramers_v(events_us(s, d)),
    """
    WITH b AS (
      SELECT event_type,
             CAST((epoch_us(ts) // 86400000000) % 7 AS INT) AS dow
      FROM events),
    counts AS (
      SELECT event_type, dow, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY 1, 2),
    rt AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS r FROM counts GROUP BY 1),
    ct AS (SELECT dow, CAST(sum(c) AS BIGINT) AS k FROM counts GROUP BY 1),
    tt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM counts),
    cells AS (
      SELECT rt.event_type, ct.dow, rt.r, ct.k, tt.n, coalesce(co.c, 0) AS c
      FROM rt CROSS JOIN ct CROSS JOIN tt
      LEFT JOIN counts co ON co.event_type = rt.event_type AND co.dow = ct.dow),
    cd AS (
      SELECT event_type, dow, n,
             CAST(CAST(c AS HUGEINT) * n - CAST(r AS HUGEINT) * k AS DOUBLE)
               AS dnum,
             CAST(CAST(r AS HUGEINT) * k * n AS DOUBLE) AS e
      FROM cells),
    cc AS (SELECT event_type, dow, n, dnum * dnum / e AS term FROM cd),
    g AS (
      SELECT max(n) AS n,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT dow) AS BIGINT) AS n_cols,
             list_reduce(list(term ORDER BY event_type, dow),
                         (x, y) -> x + y) AS chi2_raw
      FROM cc)
    SELECT n, n_rows, n_cols,
           CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
           CAST(floor(chi2_raw * 1e6 + 0.5) AS DOUBLE) / 1e6 AS chi2,
           CASE WHEN least(n_rows - 1, n_cols - 1) >= 1 THEN
             CAST(floor(sqrt(chi2_raw
                             / CAST(CAST(n AS HUGEINT)
                                    * least(n_rows - 1, n_cols - 1) AS DOUBLE))
                        * 1e4 + 0.5) AS DOUBLE) / 1e4
           END AS cramers_v
    FROM g
    """,
)


# Gopher/C4 intra-doc quality battery: dup-line/dup-char/bullet/ellipsis
# ratios from a map-only sorted run-length fold; oracle via unnest+group
_reg(
    "text_gopher_quality",
    lambda s, d: tx.text_gopher_quality(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
    nn AS (
      SELECT doc_id,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(coalesce(list_sum(list_transform(ls, x -> length(x))), 0)
                  AS BIGINT) AS n_chars,
             CAST(len(list_filter(ls, x -> starts_with(ltrim(x), '-')
                                        OR starts_with(ltrim(x), '*')))
                  AS BIGINT) AS bullet_lines,
             CAST(len(list_filter(ls, x -> ends_with(rtrim(x), '...')))
                  AS BIGINT) AS ellipsis_lines
      FROM t),
    f AS (SELECT doc_id, unnest(ls) AS line FROM t),
    gg AS (SELECT doc_id, line, CAST(count(*) AS BIGINT) AS m
           FROM f GROUP BY 1, 2),
    dd AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN m > 1 THEN m ELSE 0 END) AS BIGINT) AS dup_lines,
             CAST(sum(CASE WHEN m > 1 THEN m * length(line) ELSE 0 END)
                  AS BIGINT) AS dup_chars
      FROM gg GROUP BY 1)
    SELECT nn.doc_id, n_lines, dup_lines, dup_chars, bullet_lines,
           ellipsis_lines,
           CAST((2000000 * CAST(dup_lines AS HUGEINT) + n_lines)
                // (2 * CAST(n_lines AS HUGEINT)) AS DOUBLE) / 1e6
             AS dup_line_ratio,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(dup_chars AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6
           END AS dup_char_ratio,
           CAST((2000000 * CAST(bullet_lines AS HUGEINT) + n_lines)
                // (2 * CAST(n_lines AS HUGEINT)) AS DOUBLE) / 1e6
             AS bullet_ratio,
           CAST((2000000 * CAST(ellipsis_lines AS HUGEINT) + n_lines)
                // (2 * CAST(n_lines AS HUGEINT)) AS DOUBLE) / 1e6
             AS ellipsis_ratio
    FROM nn JOIN dd ON dd.doc_id = nn.doc_id
    """,
)


# Live recency feature: stateful time-since-last-purchase per user;
# oracle = the batch unbounded-trailing-max window form
_reg(
    "stream_since_event",
    sm.stream_since_event,
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tu FROM events)
    SELECT event_id, user_id, event_type, tu AS ts_us,
           CAST(tu - max(CASE WHEN event_type = 'purchase' THEN tu END)
                     OVER w AS BIGINT) AS since_us,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    OVER w AS BIGINT) AS n_target_so_far
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)


# Slippage vs trailing VWAP: exact rational (pc*dq - nq)/nq on the device
_reg(
    "win_vwap_dev",
    lambda s, d: wn.win_vwap_dev(load(s, d, "lineitem")),
    """
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_quantity) AS BIGINT) AS q
      FROM lineitem),
    w AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, pc,
             sum(CAST(pc AS HUGEINT) * q) OVER win AS nq,
             CAST(sum(q) OVER win AS BIGINT) AS dq
      FROM t
      WINDOW win AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
    SELECT l_orderkey, l_linenumber, l_suppkey,
           CASE WHEN dq > 0 AND nq > 0 THEN
             (CASE WHEN CAST(pc AS HUGEINT) * dq - nq < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * abs(CAST(pc AS HUGEINT) * dq - nq) + nq)
                    // (2 * nq) AS DOUBLE) / 1e6
           END AS vwap_dev
    FROM w
    """,
)


# Rolling flow beta vs the market: exact decimal frame co-moments over
# trailing active hours, sign-aware device slope
_reg(
    "win_rolling_beta",
    lambda s, d: wn.win_rolling_beta(events_us(s, d)),
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) // 3600000000 AS h,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    uh AS (
      SELECT user_id, event_type, h, CAST(sum(c) AS BIGINT) AS y
      FROM e GROUP BY 1, 2, 3),
    mh AS (
      SELECT event_type, h, CAST(sum(c) AS BIGINT) AS x
      FROM e GROUP BY 1, 2),
    t AS (
      SELECT uh.user_id, uh.event_type, uh.h, uh.y, mh.x
      FROM uh JOIN mh ON mh.event_type = uh.event_type AND mh.h = uh.h),
    f AS (
      SELECT user_id, event_type, h,
             CAST(count(*) OVER win AS BIGINT) AS l,
             sum(CAST(x AS HUGEINT)) OVER win AS sx,
             sum(CAST(y AS HUGEINT)) OVER win AS sy,
             sum(CAST(x AS HUGEINT) * y) OVER win AS sxy,
             sum(CAST(x AS HUGEINT) * x) OVER win AS sxx
      FROM t
      WINDOW win AS (PARTITION BY user_id, event_type ORDER BY h
                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_type, h, l,
           CASE WHEN l > 1 AND CAST(l AS HUGEINT) * sxx - sx * sx > 0 THEN
             (CASE WHEN CAST(l AS HUGEINT) * sxy - sx * sy < 0
                   THEN -1 ELSE 1 END)
             * CAST((2000000 * abs(CAST(l AS HUGEINT) * sxy - sx * sy)
                     + (CAST(l AS HUGEINT) * sxx - sx * sx))
                    // (2 * (CAST(l AS HUGEINT) * sxx - sx * sx))
                    AS DOUBLE) / 1e6
           END AS beta
    FROM f
    """,
)


# Repeat-purchase census per market segment: the retention KPI SQL entry
_reg(
    "sql_repeat_rate",
    lambda s, d: agg.sql_repeat_rate(load(s, d, "orders"), load(s, d, "customer")),
    """
    WITH per AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1),
    seg AS (
      SELECT c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CASE WHEN p.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat,
             CAST(sum(p.n) AS BIGINT) AS n_orders
      FROM per p JOIN customer c ON c.c_custkey = p.o_custkey
      GROUP BY 1)
    SELECT segment, n_active, n_repeat, n_orders,
           CAST((2000000 * CAST(n_repeat AS HUGEINT) + n_active)
                // (2 * CAST(n_active AS HUGEINT)) AS DOUBLE) / 1e6
             AS repeat_share,
           CAST((2000000 * CAST(n_orders AS HUGEINT) + n_active)
                // (2 * CAST(n_active AS HUGEINT)) AS DOUBLE) / 1e6
             AS orders_per_active
    FROM seg
    """,
)


# ATR over hourly candles: exact integer true ranges off the OHLC rollup,
# device frame mean; the window never sees fact rows
_reg(
    "win_atr",
    lambda s, d: wn.win_atr(events_us(s, d)),
    """
    WITH c0 AS (
      SELECT event_type, epoch_us(ts) AS tu, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    candles AS (
      SELECT event_type, tu - tu % 3600000000 AS hour_us,
             max(c) AS h, min(c) AS l,
             last(c ORDER BY tu, event_id) AS cl
      FROM c0 GROUP BY 1, 2),
    tr AS (
      SELECT event_type, hour_us,
             CAST(CASE WHEN pc IS NOT NULL
                  THEN greatest(h - l, abs(h - pc), abs(l - pc))
                  ELSE h - l END AS BIGINT) AS tr_c
      FROM (SELECT *, lag(cl) OVER (PARTITION BY event_type
                                    ORDER BY hour_us) AS pc
            FROM candles)),
    s AS (
      SELECT event_type, hour_us, tr_c,
             sum(CAST(tr_c AS HUGEINT)) OVER win AS str_c,
             CAST(count(*) OVER win AS BIGINT) AS l
      FROM tr
      WINDOW win AS (PARTITION BY event_type ORDER BY hour_us
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT event_type, hour_us,
           CAST(tr_c AS DOUBLE) / 100.0 AS tr,
           CAST((2000000 * str_c + 100 * CAST(l AS HUGEINT))
                // (2 * 100 * CAST(l AS HUGEINT)) AS DOUBLE) / 1e6 AS atr
    FROM s
    """,
)


# Empirical VaR / Expected Shortfall: exact order-statistic pick + exact
# tail mean on the device (no interpolation anywhere)
_reg(
    "agg_var_es",
    lambda s, d: agg.agg_var_es(events_us(s, d)),
    """
    WITH r AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(round(value * 100) AS BIGINT),
                                         event_id) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM events),
    t AS (SELECT * FROM r WHERE rn >= (95 * n + 99) // 100),
    g AS (
      SELECT event_type, max(n) AS n,
             CAST(count(*) AS BIGINT) AS tail_n,
             CAST(min(x) AS BIGINT) AS var_c,
             sum(CAST(x AS HUGEINT)) AS tail_sum_c
      FROM t GROUP BY 1)
    SELECT event_type, n, tail_n,
           CAST(var_c AS DOUBLE) / 100.0 AS var_usd,
           (CASE WHEN tail_sum_c < 0 THEN -1 ELSE 1 END)
           * CAST((2000000 * abs(tail_sum_c) + 100 * CAST(tail_n AS HUGEINT))
                  // (2 * 100 * CAST(tail_n AS HUGEINT)) AS DOUBLE) / 1e6
             AS es_usd
    FROM g
    """,
)


# SCD type-2 dimension history sink: full-snapshot merge closes changed/
# absent keys and opens new versions; oracle derives the expected history
# census directly from the customer table
_reg(
    "sink_scd2",
    src.q_sink_scd2,
    """
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer),
    rows_all AS (
      SELECT c_mktsegment AS segment, 1 AS is_open, bal_c
      FROM c WHERE bal_c < 500000
      UNION ALL
      SELECT 'UPGRADED', 1, bal_c FROM c WHERE bal_c >= 500000
      UNION ALL
      SELECT c_mktsegment, 0, bal_c FROM c WHERE bal_c >= 500000)
    SELECT segment,
           CAST(sum(is_open) AS BIGINT) AS n_open,
           CAST(sum(1 - is_open) AS BIGINT) AS n_closed,
           CAST(sum(CASE WHEN is_open = 1 THEN bal_c ELSE 0 END) AS BIGINT)
             AS sum_open_c
    FROM rows_all GROUP BY 1
    """,
)


# Swing-point fractals: centered-frame extremes with full-frame gating —
# pure boolean/min/max, nothing to round
_reg(
    "win_swing_points",
    lambda s, d: wn.win_swing_points(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tu, value,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_id, user_id, event_type, value, c,
             max(c) OVER win AS hi, min(c) OVER win AS lo,
             count(*) OVER win AS cnt
      FROM t
      WINDOW win AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                     ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING))
    SELECT event_id, user_id, event_type, value,
           (cnt = 5 AND c = hi) AS swing_high,
           (cnt = 5 AND c = lo) AS swing_low
    FROM w
    """,
)


# Per-source dataset card: the corpus data-sheet summary every mixing
# decision reads — exact counts, device shares/means
_reg(
    "curation_dataset_card",
    lambda s, d: cu.curation_dataset_card(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT source, lang,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                  AS BIGINT) AS nt,
             CAST(length(text) AS BIGINT) AS nc
      FROM documents),
    g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             CAST(sum(nc) AS BIGINT) AS n_chars,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en,
             CAST(sum(CASE WHEN nt < 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_short,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      FROM t GROUP BY 1)
    SELECT source, n_docs, n_tokens, n_chars, n_langs,
           CAST((2000000 * CAST(n_en AS HUGEINT) + n_docs)
                // (2 * CAST(n_docs AS HUGEINT)) AS DOUBLE) / 1e6 AS en_share,
           CAST((2000000 * CAST(n_short AS HUGEINT) + n_docs)
                // (2 * CAST(n_docs AS HUGEINT)) AS DOUBLE) / 1e6
             AS short_share,
           CAST((2000000 * CAST(n_tokens AS HUGEINT) + n_docs)
                // (2 * CAST(n_docs AS HUGEINT)) AS DOUBLE) / 1e6
             AS mean_tokens
    FROM g
    """,
)


# ANN recall@k vs the exact brute-force baseline as a first-class query:
# both parents' oracles composed — hit counts exact, recall on the device
_BRUTE_TOPK_SQL = """
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
    s AS (SELECT q.query_id, n.vec_id AS match_id,
                 list_sum([qv[i] * v[i] FOR i IN range(1, len(v) + 1)]) / (qn * nrm) AS raw
          FROM n CROSS JOIN q WHERE n.vec_id != q.query_id)
    SELECT query_id, match_id
    FROM (SELECT query_id, match_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY raw DESC, match_id) AS rn
          FROM s) WHERE rn <= 5
"""

_reg(
    "emb_recall_eval",
    lambda s, d: sim.emb_recall_eval(load(s, d, "embeddings")),
    f"""
    WITH brute AS ({_BRUTE_TOPK_SQL}),
    ann AS ({_ann_oracle()}),
    j AS (
      SELECT b.query_id,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CASE WHEN a.match_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit
      FROM brute b
      LEFT JOIN ann a ON a.query_id = b.query_id AND a.match_id = b.match_id
      GROUP BY 1)
    SELECT query_id, k, n_hit,
           CAST((2000000 * CAST(n_hit AS HUGEINT) + k)
                // (2 * CAST(k AS HUGEINT)) AS DOUBLE) / 1e6 AS recall
    FROM j
    """,
)


# lang_id confusion census: integer-exact threshold replay, exact cells,
# device shares — classifier evaluation as a first-class query
_reg(
    "text_langid_eval",
    lambda s, d: tx.text_langid_eval(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT lang,
             CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                                  x -> x IN ('the','a','of','and','to','in','is')))
                  AS BIGINT) AS hits,
             CAST(greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1)
                  AS BIGINT) AS nt
      FROM documents),
    cells AS (
      SELECT lang,
             CASE WHEN 20 * hits >= nt THEN 'en' ELSE 'unk' END AS pred,
             CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY 1, 2),
    o AS (
      SELECT lang, pred, n,
             CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS label_total
      FROM cells)
    SELECT lang, pred, n, label_total,
           CAST((2000000 * CAST(n AS HUGEINT) + label_total)
                // (2 * CAST(label_total AS HUGEINT)) AS DOUBLE) / 1e6 AS share
    FROM o
    """,
)


# Mixed-modal storage census: exact byte/label/dim profile per (lang, source)
_reg(
    "mm_modality_census",
    lambda s, d: mm.mm_modality_census(
        load(s, d, "documents"), load(s, d, "embeddings")
    ),
    """
    WITH t AS (
      SELECT d.lang, d.source,
             CAST(octet_length(encode(d.text)) AS BIGINT) AS nbytes,
             CAST(len(e.embedding) AS BIGINT) AS dim,
             CAST(e.label AS BIGINT) AS label
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id)
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(nbytes) AS BIGINT) AS total_bytes,
           CAST(count(DISTINCT label) AS BIGINT) AS n_labels,
           CAST(min(dim) AS BIGINT) AS min_dim,
           CAST(max(dim) AS BIGINT) AS max_dim,
           CAST((2000000 * CAST(sum(nbytes) AS HUGEINT) + count(*))
                // (2 * CAST(count(*) AS HUGEINT)) AS DOUBLE) / 1e6
             AS mean_bytes
    FROM t GROUP BY 1, 2
    """,
)


# Portable hash scalar surface: md5/sha2 + the md5->int64 slot idiom the
# repo's exact-parity hashing is built on (engine-specific hashes excluded
# by design — they can't be oracle-checked)
_reg(
    "scalar_hash",
    lambda s, d: sc.scalar_hash(load(s, d, "documents")),
    """
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           CAST(('0x' || substring(md5(text), 1, 15))::BIGINT AS BIGINT)
             AS h_slot
    FROM documents WHERE doc_id < 200
    """,
)


# Fulfillment SLA table: order-to-ship lead time per priority — device
# mean, exact p95 order statistic, late-line share
_reg(
    "sql_lead_time",
    lambda s, d: agg.sql_lead_time(load(s, d, "orders"), load(s, d, "lineitem")),
    """
    WITH ld AS (
      SELECT o.o_orderpriority AS priority,
             CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    r AS (
      SELECT priority, d,
             row_number() OVER (PARTITION BY priority ORDER BY d) AS rn,
             count(*) OVER (PARTITION BY priority) AS n
      FROM ld),
    g AS (
      SELECT priority,
             CAST(max(n) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS sum_days,
             CAST(sum(CASE WHEN d > 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
             CAST(min(CASE WHEN rn >= (95 * n + 99) // 100 THEN d END)
                  AS BIGINT) AS p95_days
      FROM r GROUP BY 1)
    SELECT priority, n, p95_days,
           CAST((2000000 * CAST(sum_days AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS mean_days,
           CAST((2000000 * CAST(n_late AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS late_share
    FROM g
    """,
)


# Point-in-time SCD2 join: each order sees the customer-segment version
# valid at its instant — the feature-store correctness contract
def _q_join_pit(s: SparkSession, d: str) -> DataFrame:
    from kdb_spark.tables import cents

    cust = load(s, d, "customer").select(
        "c_custkey", "c_mktsegment", cents("c_acctbal").alias("bal_c")
    )
    up = F.col("bal_c") >= 500_000
    hist = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(0).cast("long").alias("valid_from"),
        F.when(up, F.lit(1)).cast("long").alias("valid_to"),
    ).unionByName(
        cust.filter(up).select(
            "c_custkey",
            F.lit("UPGRADED").alias("segment"),
            F.lit(1).cast("long").alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
        )
    )
    facts = load(s, d, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        cents("o_totalprice").alias("price_c"),
        F.when(F.year("o_orderdate") < 1996, F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("pit"),
    )
    j = jn.join_pit(facts, hist, "c_custkey", "pit")
    return j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("price_c").cast("long").alias("revenue_c"),
    )


_reg(
    "join_pit",
    _q_join_pit,
    """
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM customer),
    f AS (
      SELECT o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             CASE WHEN year(o_orderdate) < 1996 THEN 0 ELSE 1 END AS pit
      FROM orders),
    j AS (
      SELECT CASE WHEN f.pit = 1 AND c.bal_c >= 500000
                  THEN 'UPGRADED' ELSE c.c_mktsegment END AS segment,
             f.price_c
      FROM f JOIN c ON c.c_custkey = f.o_custkey)
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(price_c) AS BIGINT) AS revenue_c
    FROM j GROUP BY 1
    """,
)


# LTV decile table: explicit integer decile cut over the per-customer
# aggregate (the one deliberate dimension-sized global sort, disclosed)
_reg(
    "sql_ltv_deciles",
    lambda s, d: agg.sql_ltv_deciles(load(s, d, "orders")),
    """
    WITH per AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS ltv_c
      FROM orders GROUP BY 1),
    r AS (
      SELECT o_custkey, ltv_c,
             row_number() OVER (ORDER BY ltv_c DESC, o_custkey) AS rn,
             count(*) OVER () AS n,
             sum(ltv_c) OVER () AS tot
      FROM per),
    d AS (
      SELECT CAST(((rn - 1) * 10) // n AS INT) AS decile, ltv_c, tot
      FROM r),
    g AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(ltv_c) AS BIGINT) AS ltv_c,
             CAST(max(tot) AS BIGINT) AS total_c
      FROM d GROUP BY 1)
    SELECT decile, n_customers, ltv_c,
           CAST((2000000 * CAST(ltv_c AS HUGEINT) + total_c)
                // (2 * CAST(total_c AS HUGEINT)) AS DOUBLE) / 1e6
             AS ltv_share
    FROM g
    """,
)


# Live hourly candlesticks: min_by/max_by exact picks inside the
# streaming aggregate; oracle = the batch candle rollup
_reg(
    "stream_ohlc",
    sm.stream_ohlc,
    """
    WITH c0 AS (
      SELECT event_type, epoch_us(ts) AS tu, event_id, value FROM events)
    SELECT event_type,
           tu - tu % 3600000000 AS hour_us,
           first(value ORDER BY tu, event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY tu, event_id) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM c0 GROUP BY 1, 2
    """,
)


# Detrended price oscillator: displaced-frame SMA, sign-aware device
_reg(
    "win_dpo",
    lambda s, d: wn.win_dpo(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tu, value,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_id, user_id, event_type, value, c,
             sum(CAST(c AS HUGEINT)) OVER win AS s,
             CAST(count(*) OVER win AS BIGINT) AS l
      FROM t
      WINDOW win AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                     ROWS BETWEEN 30 PRECEDING AND 11 PRECEDING))
    SELECT event_id, user_id, event_type, value,
           CASE WHEN l > 0 THEN
             (CASE WHEN CAST(c AS HUGEINT) * l - s < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * abs(CAST(c AS HUGEINT) * l - s)
                     + 100 * CAST(l AS HUGEINT))
                    // (2 * 100 * CAST(l AS HUGEINT)) AS DOUBLE) / 1e6
           END AS dpo
    FROM w
    """,
)


# Relative volume vs the trailing prior-print mean: exact integer
# quantities, denominator-cleared device ratio
_reg(
    "win_relative_volume",
    lambda s, d: wn.win_relative_volume(load(s, d, "lineitem")),
    """
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
             CAST(round(l_quantity) AS BIGINT) AS q
      FROM lineitem),
    w AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, q,
             CAST(sum(q) OVER win AS BIGINT) AS sq,
             CAST(count(*) OVER win AS BIGINT) AS l
      FROM t
      WINDOW win AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING))
    SELECT l_orderkey, l_linenumber, l_suppkey, q,
           CASE WHEN sq > 0 THEN
             CAST((2000000 * CAST(q AS HUGEINT) * l + sq)
                  // (2 * CAST(sq AS HUGEINT)) AS DOUBLE) / 1e6
           END AS rvol
    FROM w
    """,
)


# kdb's `ratios` verb: price relatives + simple returns, sign-aware device
_reg(
    "win_ratios",
    lambda s, d: wn.win_ratios(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tu, value,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_id, user_id, event_type, value, c,
             lag(c) OVER (PARTITION BY user_id, event_type
                          ORDER BY tu, event_id) AS pc
      FROM t)
    SELECT event_id, user_id, event_type, value,
           CASE WHEN pc IS NOT NULL AND pc != 0 THEN
             (CASE WHEN (CASE WHEN pc < 0 THEN -c ELSE c END) < 0
                   THEN -1 ELSE 1 END)
             * CAST((2000000 * abs(CAST(c AS HUGEINT)) + abs(pc))
                    // (2 * abs(CAST(pc AS HUGEINT))) AS DOUBLE) / 1e6
           END AS ratio,
           CASE WHEN pc IS NOT NULL AND pc != 0 THEN
             (CASE WHEN (CASE WHEN pc < 0 THEN -(c - pc) ELSE c - pc END) < 0
                   THEN -1 ELSE 1 END)
             * CAST((2000000 * abs(CAST(c - pc AS HUGEINT)) + abs(pc))
                    // (2 * abs(CAST(pc AS HUGEINT))) AS DOUBLE) / 1e6
           END AS ret
    FROM w
    """,
)


# Robust location trio: raw / trimmed / winsorized means on exact order
# statistics and the sign-aware device
_reg(
    "agg_winsorized",
    lambda s, d: agg.agg_winsorized(events_us(s, d)),
    """
    WITH r AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(round(value * 100) AS BIGINT),
                                         event_id) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM events),
    b AS (
      SELECT *, (5 * n + 99) // 100 AS lo, n - (5 * n + 99) // 100 AS hi
      FROM r),
    g AS (
      SELECT event_type, max(n) AS n,
             CAST(max(lo) AS BIGINT) AS n_cut,
             sum(CAST(x AS HUGEINT)) AS s_all,
             sum(CASE WHEN rn > lo AND rn <= hi THEN CAST(x AS HUGEINT)
                      ELSE 0 END) AS s_mid,
             CAST(sum(CASE WHEN rn > lo AND rn <= hi THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_mid,
             max(CASE WHEN rn = lo + 1 THEN x END) AS q_lo,
             max(CASE WHEN rn = hi THEN x END) AS q_hi
      FROM b GROUP BY 1)
    SELECT event_type, n, n_cut,
           (CASE WHEN s_all < 0 THEN -1 ELSE 1 END)
           * CAST((2000000 * abs(s_all) + 100 * CAST(n AS HUGEINT))
                  // (2 * 100 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS mean,
           CASE WHEN n_mid > 0 THEN
             (CASE WHEN s_mid < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * abs(s_mid) + 100 * CAST(n_mid AS HUGEINT))
                    // (2 * 100 * CAST(n_mid AS HUGEINT)) AS DOUBLE) / 1e6
           END AS trimmed_mean,
           CASE WHEN n_mid > 0 THEN
             (CASE WHEN s_mid + CAST(n_cut AS HUGEINT) * q_lo
                        + CAST(n_cut AS HUGEINT) * q_hi < 0
                   THEN -1 ELSE 1 END)
             * CAST((2000000 * abs(s_mid + CAST(n_cut AS HUGEINT) * q_lo
                                   + CAST(n_cut AS HUGEINT) * q_hi)
                     + 100 * CAST(n AS HUGEINT))
                    // (2 * 100 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6
           END AS winsorized_mean
    FROM g
    """,
)


# Tukey fence outlier census: exact quartile picks, integer fences via
# doubling, device share
_reg(
    "agg_iqr_fence",
    lambda s, d: agg.agg_iqr_fence(events_us(s, d)),
    """
    WITH r AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(round(value * 100) AS BIGINT),
                                         event_id) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM events),
    q AS (
      SELECT event_type, max(n) AS n,
             CAST(max(CASE WHEN rn = (25 * n + 99) // 100 THEN x END)
                  AS BIGINT) AS q1_c,
             CAST(max(CASE WHEN rn = (75 * n + 99) // 100 THEN x END)
                  AS BIGINT) AS q3_c
      FROM r GROUP BY 1),
    o AS (
      SELECT r.event_type, max(q.n) AS n,
             max(q.q1_c) AS q1_c, max(q.q3_c) AS q3_c,
             CAST(sum(CASE WHEN 2 * r.x < 5 * q.q1_c - 3 * q.q3_c
                             OR 2 * r.x > 5 * q.q3_c - 3 * q.q1_c
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM r JOIN q ON q.event_type = r.event_type
      GROUP BY 1)
    SELECT event_type, n,
           CAST(q1_c AS DOUBLE) / 100.0 AS q1,
           CAST(q3_c AS DOUBLE) / 100.0 AS q3,
           CAST(5 * q1_c - 3 * q3_c AS DOUBLE) / 200.0 AS lo_fence,
           CAST(5 * q3_c - 3 * q1_c AS DOUBLE) / 200.0 AS hi_fence,
           n_outliers,
           CAST((2000000 * CAST(n_outliers AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS outlier_share
    FROM o
    """,
)


# Roll's implied spread: exact delta-pair co-moments, one IEEE
# divide/sqrt chain to the 1e-4 dollar grid; positive autocov → NULL
_reg(
    "agg_roll_spread",
    lambda s, d: agg.agg_roll_spread(events_us(s, d)),
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    d1 AS (
      SELECT user_id, event_type, tu, event_id,
             c - lag(c) OVER w AS a
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY tu, event_id)),
    d2 AS (
      SELECT user_id, event_type, a,
             lag(a) OVER (PARTITION BY user_id, event_type
                          ORDER BY tu, event_id) AS b
      FROM d1),
    p AS (SELECT event_type, a, b FROM d2
          WHERE a IS NOT NULL AND b IS NOT NULL),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(a AS HUGEINT)) AS sa, sum(CAST(b AS HUGEINT)) AS sb,
             sum(CAST(a AS HUGEINT) * b) AS sab
      FROM p GROUP BY 1),
    m AS (
      SELECT event_type, n, CAST(n AS HUGEINT) * sab - sa * sb AS cm
      FROM g)
    SELECT event_type, n,
           CASE WHEN n > 1 THEN
             (CASE WHEN cm < 0 THEN -1 ELSE 1 END)
             * CAST((20000 * abs(cm) + CAST(n AS HUGEINT) * (n - 1))
                    // (2 * CAST(n AS HUGEINT) * (n - 1)) AS DOUBLE) / 1e4
           END AS delta_autocov_c2,
           CASE WHEN n > 1 AND cm < 0 THEN
             CAST(floor(2 * sqrt(CAST(-cm AS DOUBLE)
                                 / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))
                        / 100 * 1e4 + 0.5) AS DOUBLE) / 1e4
           END AS roll_spread_usd
    FROM m
    """,
)


# Amihud illiquidity per million dollars: per-print exact grid integers,
# device mean of grids (the %D two-stage precedent)
_reg(
    "agg_amihud",
    lambda s, d: agg.agg_amihud(load(s, d, "lineitem")),
    """
    WITH t AS (
      SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_quantity) AS BIGINT) AS q
      FROM lineitem),
    w AS (
      SELECT l_suppkey, pc, q,
             lag(pc) OVER (PARTITION BY l_suppkey
                           ORDER BY l_shipdate, l_orderkey, l_linenumber)
               AS ppc
      FROM t),
    f AS (SELECT * FROM w WHERE ppc IS NOT NULL AND ppc > 0 AND q > 0),
    s AS (
      SELECT l_suppkey,
             (2000000 * CAST(100000000 AS HUGEINT) * abs(pc - ppc)
              + CAST(ppc AS HUGEINT) * pc * q)
             // (2 * CAST(ppc AS HUGEINT) * pc * q) AS g
      FROM f),
    a AS (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_prints,
             sum(g) AS sg
      FROM s GROUP BY 1)
    SELECT l_suppkey, n_prints,
           CAST((2 * sg + CAST(n_prints AS HUGEINT))
                // (2 * CAST(n_prints AS HUGEINT)) AS DOUBLE) / 1e6
             AS amihud_pm
    FROM a
    """,
)


# Burstiness coefficient: pooled gap moments, one IEEE (s−m)/(s+m) chain
_reg(
    "agg_burstiness",
    lambda s, d: agg.agg_burstiness(events_us(s, d)),
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id FROM events),
    d AS (
      SELECT event_type,
             tu - lag(tu) OVER (PARTITION BY user_id, event_type
                                ORDER BY tu, event_id) AS g
      FROM t),
    f AS (SELECT event_type, g FROM d WHERE g IS NOT NULL),
    a AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(g AS HUGEINT)) AS sg,
             sum(CAST(g AS HUGEINT) * g) AS sgg
      FROM f GROUP BY 1),
    m AS (
      SELECT event_type, n, sg,
             CAST(n AS HUGEINT) * sgg - sg * sg AS vnum
      FROM a)
    SELECT event_type, n,
           CASE WHEN n > 1 AND (vnum > 0 OR sg > 0) THEN
             CAST(floor(
               (sqrt(CAST(vnum AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))
                - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
               / (sqrt(CAST(vnum AS DOUBLE)
                       / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))
                  + CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
               * 1e4 + 0.5) AS DOUBLE) / 1e4
           END AS burstiness
    FROM m
    """,
)


# Flesch reading ease as an exact rational on the device — no float
# constants; vowel-group syllables, [.!?]+ sentences
_reg(
    "text_readability",
    lambda s, d: tx.text_readability(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
             CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                  x -> trim(x) != '')) AS BIGINT) AS raw_s
      FROM documents),
    b AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS w,
             greatest(raw_s, 1) AS s,
             CAST(coalesce(list_sum(list_transform(toks,
                    x -> greatest(len(regexp_extract_all(x, '[aeiou]+')),
                                  1))), 0) AS BIGINT) AS sy
      FROM t)
    SELECT doc_id, w AS n_words, s AS n_sentences, sy AS n_syllables,
           CASE WHEN w > 0 THEN
             (CASE WHEN 206835 * CAST(s AS HUGEINT) * w
                        - 1015 * CAST(w AS HUGEINT) * w
                        - 84600 * CAST(sy AS HUGEINT) * s < 0
                   THEN -1 ELSE 1 END)
             * CAST((20000 * abs(206835 * CAST(s AS HUGEINT) * w
                                 - 1015 * CAST(w AS HUGEINT) * w
                                 - 84600 * CAST(sy AS HUGEINT) * s)
                     + 1000 * CAST(s AS HUGEINT) * w)
                    // (2 * 1000 * CAST(s AS HUGEINT) * w) AS DOUBLE) / 1e4
           END AS flesch
    FROM b
    """,
)


# Interval-overlap join: user sessions × daily maintenance windows via
# day-bucket blocking; oracle does the tiny cartesian directly
def _q_join_interval_overlap(s: SparkSession, d: str) -> DataFrame:
    ev = events_us(s, d)
    sess = wn.sessionize(ev)
    a = sess.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("a_start"),
        (F.max("ts_us") + 1).alias("a_end"),
    ).select(
        # 1e6 packing stride: a user would need >999,999 sessions to
        # collide (the old *1000 stride collided past 999 sessions)
        (F.col("user_id") * 1_000_000 + F.col("session_id")).alias("a_id"),
        "a_start",
        "a_end",
    )
    day0 = 19723
    b = s.range(30).select(
        F.col("id").cast("long").alias("b_id"),
        ((F.lit(day0) + F.col("id")) * F.lit(DAY_US) + F.lit(2 * HOUR_US))
        .cast("long")
        .alias("b_start"),
        ((F.lit(day0) + F.col("id")) * F.lit(DAY_US) + F.lit(4 * HOUR_US))
        .cast("long")
        .alias("b_end"),
    )
    # canonical output order: the final stage upstream is a distinct
    # shuffle — the single most order-unstable output in the registry
    return jn.join_interval_overlap(a, b).orderBy("a_id", "b_id")


_reg(
    "join_interval_overlap",
    _q_join_interval_overlap,
    f"""
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS tu, event_id FROM events),
    m AS (
      SELECT user_id, tu, event_id,
             CASE WHEN lag(tu) OVER w IS NULL THEN 1
                  WHEN tu - lag(tu) OVER w >= 1800000000 THEN 1
                  ELSE 0 END AS ns
      FROM t
      WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
    sgrp AS (
      SELECT user_id, tu,
             sum(ns) OVER (PARTITION BY user_id ORDER BY tu, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM m),
    iv AS (
      SELECT user_id * 1000000 + session_id AS a_id,
             CAST(min(tu) AS BIGINT) AS a_start,
             CAST(max(tu) + 1 AS BIGINT) AS a_end
      FROM sgrp GROUP BY user_id, session_id),
    w AS (
      SELECT CAST(i AS BIGINT) AS b_id,
             CAST((19723 + i) * 86400000000 + 7200000000 AS BIGINT) AS b_start,
             CAST((19723 + i) * 86400000000 + 14400000000 AS BIGINT) AS b_end
      FROM range(0, 30) t(i))
    SELECT iv.a_id, w.b_id, iv.a_start, iv.a_end, w.b_start, w.b_end,
           CAST(least(iv.a_end, w.b_end) - greatest(iv.a_start, w.b_start)
                AS BIGINT) AS overlap_us
    FROM iv, w
    WHERE iv.a_start < w.b_end AND w.b_start < iv.a_end
    """,
)


# Cohort revenue-retention triangle: integer month math, exact cents,
# device shares vs the age-0 cell
_reg(
    "sql_cohort_retention",
    lambda s, d: agg.sql_cohort_retention(load(s, d, "orders")),
    """
    WITH m AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS ym,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders),
    first_m AS (SELECT o_custkey, min(ym) AS cohort FROM m GROUP BY 1),
    cells AS (
      SELECT f.cohort, m.ym - f.cohort AS age,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(m.c) AS BIGINT) AS revenue_c
      FROM m JOIN first_m f ON f.o_custkey = m.o_custkey
      GROUP BY 1, 2),
    b AS (
      SELECT cohort, age, n_orders, revenue_c,
             max(CASE WHEN age = 0 THEN revenue_c END)
               OVER (PARTITION BY cohort) AS base_c
      FROM cells)
    SELECT cohort, age, n_orders, revenue_c,
           CASE WHEN base_c > 0 THEN
             CAST((2000000 * CAST(revenue_c AS HUGEINT) + base_c)
                  // (2 * CAST(base_c AS HUGEINT)) AS DOUBLE) / 1e6
           END AS revenue_retention
    FROM b
    """,
)


# Downside semi-deviation + share: asymmetric risk per event_type
_reg(
    "agg_downside_risk",
    lambda s, d: agg.agg_downside_risk(events_us(s, d)),
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    d AS (
      SELECT event_type,
             c - lag(c) OVER (PARTITION BY user_id, event_type
                              ORDER BY tu, event_id) AS d
      FROM t),
    f AS (SELECT event_type, d FROM d WHERE d IS NOT NULL),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
             sum(CASE WHEN d < 0 THEN CAST(d AS HUGEINT) * d ELSE 0 END) AS sdd
      FROM f GROUP BY 1)
    SELECT event_type, n, n_down,
           CAST(floor(sqrt(CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE)) / 100
                      * 1e4 + 0.5) AS DOUBLE) / 1e4 AS semidev_usd,
           CAST((2000000 * CAST(n_down AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS down_share
    FROM g
    """,
)


# Underwater-spell census: sessionize cumsum trick on the below-high flag
_reg(
    "agg_underwater",
    lambda s, d: agg.agg_underwater(events_us(s, d)),
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    u AS (
      SELECT user_id, event_type, tu, event_id,
             c < max(c) OVER (PARTITION BY user_id, event_type
                              ORDER BY tu, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS uw
      FROM t),
    m AS (
      SELECT user_id, event_type, tu, event_id, uw,
             CASE WHEN uw AND NOT coalesce(lag(uw) OVER w, FALSE)
                  THEN 1 ELSE 0 END AS ns
      FROM u
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY tu, event_id)),
    sid AS (
      SELECT user_id, event_type, uw,
             sum(ns) OVER (PARTITION BY user_id, event_type
                           ORDER BY tu, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS spell_id
      FROM m),
    spells AS (
      SELECT user_id, event_type, spell_id, CAST(count(*) AS BIGINT) AS len
      FROM sid WHERE uw GROUP BY 1, 2, 3),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_spells,
             CAST(max(len) AS BIGINT) AS max_spell,
             sum(CAST(len AS HUGEINT)) AS sl
      FROM spells GROUP BY 1)
    SELECT event_type, n_spells, max_spell,
           CAST((2000000 * sl + n_spells)
                // (2 * CAST(n_spells AS HUGEINT)) AS DOUBLE) / 1e6
             AS mean_spell
    FROM g
    """,
)


# Code-likeness screen: deterministic line heuristics + symbol share
_reg(
    "text_code_ratio",
    lambda s, d: tx.text_code_ratio(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text, '[{};=<>\\[\\]()]'))
                  AS BIGINT) AS n_sym
      FROM documents),
    b AS (
      SELECT doc_id, n_chars, n_sym,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(list_filter(ls, x ->
               starts_with(x, '    ') OR starts_with(x, chr(9))
               OR ends_with(rtrim(x), '{') OR ends_with(rtrim(x), '}')
               OR ends_with(rtrim(x), ';')
               OR (contains(x, ' = ') AND NOT contains(x, '. '))))
                  AS BIGINT) AS code_lines
      FROM t)
    SELECT doc_id, n_lines, code_lines, n_sym,
           CAST((2000000 * CAST(code_lines AS HUGEINT) + n_lines)
                // (2 * CAST(n_lines AS HUGEINT)) AS DOUBLE) / 1e6
             AS code_line_ratio,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(n_sym AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6
           END AS symbol_ratio
    FROM b
    """,
)


# Live running drawdown: stateful peak + device fraction; oracle = the
# batch unbounded running-max window form
_reg(
    "stream_drawdown",
    sm.stream_drawdown,
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT user_id, event_type, tu AS ts_us, event_id, c,
             max(c) OVER (PARTITION BY user_id, event_type
                          ORDER BY tu, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak_c
      FROM t)
    SELECT user_id, event_type, ts_us, event_id,
           CAST(peak_c AS BIGINT) AS peak_c,
           CASE WHEN peak_c > 0 THEN
             CAST((2000000 * (peak_c - c) + peak_c)
                  // (2 * CAST(peak_c AS HUGEINT)) AS DOUBLE) / 1e6
           END AS dd_frac
    FROM w
    """,
)


# ABC inventory classification: integer cumulative-share predicate over
# the part-revenue rank (the disclosed dimension-sized sort), 3-row census
_reg(
    "sql_abc_parts",
    lambda s, d: agg.sql_abc_parts(load(s, d, "lineitem")),
    """
    WITH rev AS (
      SELECT l_partkey AS partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem GROUP BY 1),
    r AS (
      SELECT partkey, rev_c,
             sum(rev_c) OVER (ORDER BY rev_c DESC, partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_c,
             sum(rev_c) OVER () AS total_c
      FROM rev),
    cls AS (
      SELECT partkey, rev_c, total_c,
             CASE WHEN 100 * cum_c <= 80 * total_c THEN 'A'
                  WHEN 100 * cum_c <= 95 * total_c THEN 'B'
                  ELSE 'C' END AS abc
      FROM r),
    g AS (
      SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(rev_c) AS BIGINT) AS class_c,
             CAST(max(total_c) AS BIGINT) AS total_c
      FROM cls GROUP BY 1)
    SELECT abc, n_parts, class_c,
           CAST((2000000 * CAST(class_c AS HUGEINT) + total_c)
                // (2 * CAST(total_c AS HUGEINT)) AS DOUBLE) / 1e6
             AS revenue_share
    FROM g
    """,
)


# dow × hour activity heat map: one hash agg to ≤168 cells, device
# day-shares
_reg(
    "agg_activity_heatmap",
    lambda s, d: agg.agg_activity_heatmap(events_us(s, d)),
    """
    WITH t AS (
      SELECT CAST((epoch_us(ts) // 86400000000) % 7 AS INT) AS dow,
             CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS hod,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    g AS (
      SELECT dow, hod, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS sum_c
      FROM t GROUP BY 1, 2),
    w AS (
      SELECT dow, hod, n, sum_c,
             CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT) AS day_n
      FROM g)
    SELECT dow, hod, n, sum_c, day_n,
           CAST((2000000 * CAST(n AS HUGEINT) + day_n)
                // (2 * CAST(day_n AS HUGEINT)) AS DOUBLE) / 1e6 AS day_share
    FROM w
    """,
)


# Trailing time-weighted average price: exact µs in-force weights,
# decimal-widened folds, unsigned device
_reg(
    "win_trailing_twap",
    lambda s, d: wn.win_trailing_twap(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tu,
             CAST(round(value * 100) AS BIGINT) AS pc
      FROM events),
    d AS (
      SELECT event_id, user_id, event_type, tu, pc,
             CAST(coalesce(lead(tu) OVER w, tu) - tu AS BIGINT) AS gap
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY tu, event_id)),
    s AS (
      SELECT event_id, user_id, event_type,
             sum(CAST(pc AS HUGEINT) * gap) OVER win AS nw,
             CAST(sum(gap) OVER win AS BIGINT) AS dw
      FROM d
      WINDOW win AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, event_type,
           CASE WHEN dw > 0 THEN
             (CASE WHEN nw < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * abs(nw) + 100 * CAST(dw AS HUGEINT))
                    // (2 * 100 * CAST(dw AS HUGEINT)) AS DOUBLE) / 1e6
           END AS twap
    FROM s
    """,
)


# Log2-bucketed gap histogram: bit-math buckets, sentinel for sub-ms,
# device type-shares
_reg(
    "agg_gap_histogram",
    lambda s, d: agg.agg_gap_histogram(events_us(s, d)),
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id FROM events),
    d AS (
      SELECT event_type,
             tu - lag(tu) OVER (PARTITION BY user_id, event_type
                                ORDER BY tu, event_id) AS g
      FROM t),
    f AS (SELECT event_type, g FROM d WHERE g IS NOT NULL),
    b AS (
      SELECT event_type, g,
             CASE WHEN g < 1000 THEN -1
                  ELSE CAST(length(bin(g // 1000)) - 1 AS INT) END AS bucket
      FROM f),
    gg AS (
      SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(min(g) AS BIGINT) AS min_gap_us,
             CAST(max(g) AS BIGINT) AS max_gap_us
      FROM b GROUP BY 1, 2),
    w AS (
      SELECT event_type, bucket, n, min_gap_us, max_gap_us,
             CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS type_n
      FROM gg)
    SELECT event_type, bucket, n, min_gap_us, max_gap_us,
           CAST((2000000 * CAST(n AS HUGEINT) + type_n)
                // (2 * CAST(type_n AS HUGEINT)) AS DOUBLE) / 1e6 AS share
    FROM w
    """,
)


# Tape-health census: record-high and stale-tick shares per event_type
_reg(
    "agg_record_stats",
    lambda s, d: agg.agg_record_stats(events_us(s, d)),
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_type, c,
             max(c) OVER (PARTITION BY user_id, event_type
                          ORDER BY tu, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prior_max,
             lag(c) OVER (PARTITION BY user_id, event_type
                          ORDER BY tu, event_id) AS pc
      FROM t),
    f AS (SELECT * FROM w WHERE pc IS NOT NULL),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN c > prior_max THEN 1 ELSE 0 END) AS BIGINT)
               AS n_records,
             CAST(sum(CASE WHEN c = pc THEN 1 ELSE 0 END) AS BIGINT)
               AS n_stale
      FROM f GROUP BY 1)
    SELECT event_type, n, n_records, n_stale,
           CAST((2000000 * CAST(n_records AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS record_share,
           CAST((2000000 * CAST(n_stale AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS stale_share
    FROM g
    """,
)


# Month-of-year seasonal index: means-of-means cleared to exact rationals
_reg(
    "sql_seasonal_index",
    lambda s, d: agg.sql_seasonal_index(load(s, d, "orders")),
    """
    WITH ym AS (
      SELECT CAST(year(o_orderdate) AS INT) AS y,
             CAST(month(o_orderdate) AS INT) AS m,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1, 2),
    mo AS (
      SELECT m, CAST(count(*) AS BIGINT) AS n_m,
             CAST(sum(rev_c) AS BIGINT) AS rev_c
      FROM ym GROUP BY 1),
    t AS (
      SELECT m, n_m, rev_c,
             CAST(sum(n_m) OVER () AS BIGINT) AS n_all,
             CAST(sum(rev_c) OVER () AS BIGINT) AS total_c
      FROM mo)
    SELECT m, n_m, rev_c,
           CAST((2000000 * CAST(rev_c AS HUGEINT)
                 + 100 * CAST(n_m AS HUGEINT))
                // (2 * 100 * CAST(n_m AS HUGEINT)) AS DOUBLE) / 1e6
             AS mean_month_usd,
           CASE WHEN total_c > 0 THEN
             CAST((2000000 * CAST(rev_c AS HUGEINT) * n_all
                   + CAST(n_m AS HUGEINT) * total_c)
                  // (2 * CAST(n_m AS HUGEINT) * total_c) AS DOUBLE) / 1e6
           END AS seasonal_index
    FROM t
    """,
)


# Volatility-regime ratio: √(V_short/V_long) on denominator-cleared exact
# rationals, one IEEE divide/sqrt to the 1e-4 grid
_reg(
    "win_vol_regime",
    lambda s, d: wn.win_vol_regime(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tu,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    d AS (
      SELECT event_id, user_id, event_type, tu,
             c - lag(c) OVER (PARTITION BY user_id, event_type
                              ORDER BY tu, event_id) AS d
      FROM t),
    s AS (
      SELECT event_id, user_id, event_type,
             sum(CAST(d AS HUGEINT)) OVER ws AS ss,
             sum(CAST(d AS HUGEINT) * d) OVER ws AS qs,
             CAST(count(d) OVER ws AS BIGINT) AS ls,
             sum(CAST(d AS HUGEINT)) OVER wl AS sl,
             sum(CAST(d AS HUGEINT) * d) OVER wl AS ql,
             CAST(count(d) OVER wl AS BIGINT) AS ll
      FROM d
      WINDOW ws AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW),
             wl AS (PARTITION BY user_id, event_type ORDER BY tu, event_id
                    ROWS BETWEEN 31 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, event_type,
           CASE WHEN ls > 1 AND ll > 1 AND ql * ll - sl * sl > 0
                     AND qs * ls - ss * ss >= 0 THEN
             CAST(floor(
               sqrt((CAST(qs * ls - ss * ss AS DOUBLE)
                     * CAST(CAST(ll AS HUGEINT) * ll AS DOUBLE))
                    / (CAST(ql * ll - sl * sl AS DOUBLE)
                       * CAST(CAST(ls AS HUGEINT) * ls AS DOUBLE)))
               * 1e4 + 0.5) AS DOUBLE) / 1e4
           END AS vol_ratio
    FROM s
    """,
)


# Adjacent-day user churn flow census: distinct grain + one self-join
_reg(
    "agg_user_churn",
    lambda s, d: agg.agg_user_churn(events_us(s, d)),
    """
    WITH d AS (
      SELECT DISTINCT event_type,
             epoch_us(ts) // 86400000000 AS day, user_id
      FROM events),
    t AS (SELECT event_type, day, user_id FROM d),
    y AS (SELECT event_type, day + 1 AS day, user_id FROM d),
    j AS (
      SELECT coalesce(t.event_type, y.event_type) AS event_type,
             coalesce(t.day, y.day) AS day,
             t.user_id AS tu, y.user_id AS yu
      FROM t FULL OUTER JOIN y
        ON y.event_type = t.event_type AND y.day = t.day
           AND y.user_id = t.user_id),
    g AS (
      SELECT event_type, day,
             CAST(sum(CASE WHEN tu IS NOT NULL AND yu IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS retained,
             CAST(sum(CASE WHEN tu IS NOT NULL AND yu IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
             CAST(sum(CASE WHEN tu IS NULL AND yu IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS churned
      FROM j GROUP BY 1, 2),
    f AS (
      SELECT event_type, CAST(day AS BIGINT) AS day, retained, new_users,
             churned, retained + churned AS prev_active
      FROM g WHERE retained + churned > 0)
    SELECT event_type, day, retained, new_users, churned, prev_active,
           CAST((2000000 * CAST(retained AS HUGEINT) + prev_active)
                // (2 * CAST(prev_active AS HUGEINT)) AS DOUBLE) / 1e6
             AS retention_rate,
           CAST((2000000 * CAST(churned AS HUGEINT) + prev_active)
                // (2 * CAST(prev_active AS HUGEINT)) AS DOUBLE) / 1e6
             AS churn_rate
    FROM f
    """,
)


# Discount-band elasticity census: exact integer bands, device mean qty
_reg(
    "sql_discount_bands",
    lambda s, d: agg.sql_discount_bands(load(s, d, "lineitem")),
    """
    WITH b AS (
      SELECT CAST(round(l_discount * 100) AS INT) AS disc_pct,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_quantity) AS BIGINT) AS q
      FROM lineitem),
    g AS (
      SELECT disc_pct, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pc) AS BIGINT) AS revenue_c,
             CAST(sum(q) AS BIGINT) AS sum_qty
      FROM b GROUP BY 1)
    SELECT disc_pct, n, revenue_c, sum_qty,
           CAST((2000000 * CAST(sum_qty AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS mean_qty
    FROM g
    """,
)


# ---------------------------------------------------------------- round 13

# Anchored VWAP per supplier, reset each calendar month: expanding decimal
# folds, device division — the "since the open" execution benchmark
_reg(
    "win_anchored_vwap",
    lambda s, d: wn.win_anchored_vwap(load(s, d, "lineitem")),
    """
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_quantity) AS BIGINT) AS q,
             year(l_shipdate) * 12 + month(l_shipdate) - 1 AS anchor_m
      FROM lineitem),
    m AS (
      SELECT l_orderkey, l_linenumber, l_suppkey,
             CAST(anchor_m AS BIGINT) AS anchor_m,
             sum(CAST(pc AS HUGEINT) * q) OVER w AS nq,
             CAST(sum(q) OVER w AS BIGINT) AS dq,
             CAST(count(*) OVER w AS BIGINT) AS n_since_anchor
      FROM t
      WINDOW w AS (PARTITION BY l_suppkey, anchor_m
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT l_orderkey, l_linenumber, l_suppkey, anchor_m, n_since_anchor,
           CASE WHEN dq > 0 THEN
             CAST((2000000 * nq + 100 * CAST(dq AS HUGEINT))
                  // (200 * CAST(dq AS HUGEINT)) AS DOUBLE) / 1e6
           END AS avwap
    FROM m
    """,
)


# Overnight gap per (user, type) series: ordered-set open/close picks per
# day, lag across the day sequence — session-boundary discontinuities
_reg(
    "win_gap_open",
    lambda s, d: wn.win_gap_open(events_us(s, d)),
    f"""
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) // {DAY_US} AS day,
             CAST(round(value * 100) AS BIGINT) AS c,
             epoch_us(ts) AS tu, event_id
      FROM events),
    g AS (
      SELECT user_id, event_type, CAST(day AS BIGINT) AS day,
             CAST(first(c ORDER BY tu, event_id) AS BIGINT) AS open_c,
             CAST(last(c ORDER BY tu, event_id) AS BIGINT) AS close_c,
             CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY 1, 2, 3)
    SELECT user_id, event_type, day, open_c, close_c, n,
           CAST(open_c - lag(close_c) OVER (
             PARTITION BY user_id, event_type ORDER BY day) AS BIGINT) AS gap_c
    FROM g
    """,
)


# Equality run-length structure per series: change-flag cumsum run ids,
# within-run position, running longest run — the stuck-tape detector
_reg(
    "win_plateau",
    lambda s, d: wn.win_plateau(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tu,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    l AS (
      SELECT *, CASE WHEN lag(c) OVER w IS NULL OR lag(c) OVER w <> c
                     THEN 1 ELSE 0 END AS chg
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY tu, event_id)),
    r AS (
      SELECT *, CAST(sum(chg) OVER (
          PARTITION BY user_id, event_type ORDER BY tu, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
      FROM l),
    p AS (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY user_id, event_type, run_id ORDER BY tu, event_id
        ) AS BIGINT) AS run_pos
      FROM r)
    SELECT event_id, user_id, event_type, run_id, run_pos,
           CAST(max(run_pos) OVER (
             PARTITION BY user_id, event_type ORDER BY tu, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS max_run
    FROM p
    """,
)


# Bowley quartile skewness: robust location-free skew on exact quartile
# order statistics, signed device ratio
_reg(
    "agg_bowley_skew",
    lambda s, d: agg.agg_bowley_skew(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x, event_id
      FROM events),
    r AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY x, event_id) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM t),
    q AS (
      SELECT event_type, max(n) AS n,
             CAST(max(CASE WHEN rn = (25 * n + 99) // 100 THEN x END) AS BIGINT) AS q1_c,
             CAST(max(CASE WHEN rn = (50 * n + 99) // 100 THEN x END) AS BIGINT) AS q2_c,
             CAST(max(CASE WHEN rn = (75 * n + 99) // 100 THEN x END) AS BIGINT) AS q3_c
      FROM r GROUP BY 1)
    SELECT event_type, n, q1_c, q2_c, q3_c,
           CASE WHEN q3_c > q1_c THEN
             (CASE WHEN q3_c + q1_c - 2 * q2_c < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * abs(CAST(q3_c + q1_c - 2 * q2_c AS HUGEINT))
                     + (q3_c - q1_c))
                    // (2 * CAST(q3_c - q1_c AS HUGEINT)) AS DOUBLE) / 1e6
           END AS bowley_skew
    FROM q
    """,
)


_SPLIT_J16 = (19723 + 15) * DAY_US  # 2024-01-16T00:00Z — the tape midpoint

# Value-location drift per type: exact p50/p90 before vs after a fixed
# boundary, bigint cent differences
_reg(
    "agg_quantile_drift",
    lambda s, d: agg.agg_quantile_drift(events_us(s, d), _SPLIT_J16),
    f"""
    WITH t AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x, event_id,
             CAST(epoch_us(ts) >= {_SPLIT_J16} AS INT) AS h
      FROM events),
    r AS (
      SELECT event_type, h, x,
             row_number() OVER (PARTITION BY event_type, h ORDER BY x, event_id) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type, h) AS BIGINT) AS n
      FROM t),
    halves AS (
      SELECT event_type, h, max(n) AS n,
             max(CASE WHEN rn = (50 * n + 99) // 100 THEN x END) AS p50,
             max(CASE WHEN rn = (90 * n + 99) // 100 THEN x END) AS p90
      FROM r GROUP BY 1, 2),
    o AS (
      SELECT event_type,
             CAST(sum(CASE WHEN h = 0 THEN n END) AS BIGINT) AS n_before,
             CAST(sum(CASE WHEN h = 1 THEN n END) AS BIGINT) AS n_after,
             CAST(max(CASE WHEN h = 0 THEN p50 END) AS BIGINT) AS p50_before_c,
             CAST(max(CASE WHEN h = 1 THEN p50 END) AS BIGINT) AS p50_after_c,
             CAST(max(CASE WHEN h = 0 THEN p90 END) AS BIGINT) AS p90_before_c,
             CAST(max(CASE WHEN h = 1 THEN p90 END) AS BIGINT) AS p90_after_c
      FROM halves GROUP BY 1)
    SELECT event_type, n_before, n_after,
           p50_before_c, p50_after_c, p90_before_c, p90_after_c,
           CAST(p50_after_c - p50_before_c AS BIGINT) AS p50_drift_c,
           CAST(p90_after_c - p90_before_c AS BIGINT) AS p90_drift_c
    FROM o
    """,
)


# Hourly tick-flow imbalance: signed cent-delta census per (type, hour),
# signed device ratio
_reg(
    "agg_flow_imbalance",
    lambda s, d: agg.agg_flow_imbalance(events_us(s, d)),
    f"""
    WITH t AS (
      SELECT event_type, user_id, event_id, epoch_us(ts) AS tu,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    l AS (
      SELECT event_type, tu,
             lag(c) OVER (PARTITION BY user_id, event_type
                          ORDER BY tu, event_id) AS prev_c,
             c
      FROM t),
    s AS (
      SELECT event_type, tu // {HOUR_US} AS hour,
             CASE WHEN c > prev_c THEN 1 WHEN c < prev_c THEN -1 ELSE 0 END AS s
      FROM l WHERE prev_c IS NOT NULL),
    g AS (
      SELECT event_type, CAST(hour AS BIGINT) AS hour,
             CAST(count(*) AS BIGINT) AS n_ticks,
             CAST(sum(s) AS BIGINT) AS imbalance
      FROM s GROUP BY 1, 2)
    SELECT event_type, hour, n_ticks, imbalance,
           (CASE WHEN imbalance < 0 THEN -1 ELSE 1 END)
           * CAST((2000000 * abs(CAST(imbalance AS HUGEINT)) + n_ticks)
                  // (2 * CAST(n_ticks AS HUGEINT)) AS DOUBLE) / 1e6
             AS flow_ratio
    FROM g
    """,
)


# Character-class census per document: exact ASCII class counts via
# delete-and-measure regexes, unsigned device shares
_reg(
    "text_char_classes",
    lambda s, d: tx.text_char_classes(load(s, d, "documents")),
    r"""
    WITH t AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                  AS BIGINT) AS n_alpha,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS BIGINT) AS n_digit,
             CAST(length(text)
                  - length(regexp_replace(text, '[ ' || chr(9) || chr(10) || chr(13) || ']', '', 'g'))
                  AS BIGINT) AS n_space
      FROM documents),
    c AS (
      SELECT doc_id, n_chars, n_alpha, n_digit, n_space,
             CAST(n_chars - n_alpha - n_digit - n_space AS BIGINT) AS n_other
      FROM t)
    SELECT doc_id, n_chars, n_alpha, n_digit, n_space, n_other,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(n_alpha AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6 END AS alpha_share,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(n_digit AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6 END AS digit_share,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(n_space AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6 END AS space_share,
           CASE WHEN n_chars > 0 THEN
             CAST((2000000 * CAST(n_other AS HUGEINT) + n_chars)
                  // (2 * CAST(n_chars AS HUGEINT)) AS DOUBLE) / 1e6 END AS other_share
    FROM c
    """,
)


def _q_graph_bfs_levels(s: SparkSession, d: str) -> DataFrame:
    """Blast radius over the trade graph: min-hop level (≤ 3) from every
    50th supplier — frontier expansion with anti-join min-level keep."""
    seeds = (
        load(s, d, "supplier")
        .filter(F.col("s_suppkey") % 50 == 0)
        .select((F.col("s_suppkey") * 2 + 1).cast("long").alias("v"))
    )
    edges = gr.trade_graph(load(s, d, "orders"), load(s, d, "lineitem"))
    return gr.bfs_levels(edges, seeds, max_depth=3)


# Multi-source BFS with recursive-CTE oracle: integer set algebra only
_reg(
    "graph_bfs_levels",
    _q_graph_bfs_levels,
    """
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s AS src, c AS dst FROM pairs),
    seeds AS (SELECT DISTINCT s_suppkey * 2 + 1 AS v FROM supplier
              WHERE s_suppkey % 50 = 0),
    bfs(v, lvl) AS (
      SELECT v, 0 FROM seeds
      UNION
      SELECT e.dst, b.lvl + 1
      FROM bfs b JOIN edges e ON e.src = b.v
      WHERE b.lvl < 3)
    SELECT CAST(v AS BIGINT) AS v, CAST(min(lvl) AS BIGINT) AS lvl
    FROM bfs GROUP BY 1
    """,
)


# Per-label centroid drift between deterministic halves: micro-unit
# integer means, exact squared-gap fold, one IEEE sqrt
_reg(
    "emb_label_drift",
    lambda s, d: sim.emb_label_drift(load(s, d, "embeddings")),
    """
    WITH flat AS (
      SELECT label, CAST(vec_id % 2 = 0 AS INT) AS even,
             unnest(range(len(embedding))) AS pos,
             unnest(embedding) AS v
      FROM embeddings),
    g AS (
      SELECT label, even, pos, count(*) AS n,
             sum(CAST(round(v * 1e6) AS BIGINT)) AS s
      FROM flat GROUP BY 1, 2, 3),
    m AS (
      SELECT label, even, pos, n,
             (CASE WHEN s < 0 THEN -1 ELSE 1 END)
             * ((2 * abs(CAST(s AS HUGEINT)) + n) // (2 * CAST(n AS HUGEINT)))
               AS m6
      FROM g),
    sides AS (
      SELECT label, pos,
             sum(CASE WHEN even = 1 THEN n END) AS n_even,
             sum(CASE WHEN even = 0 THEN n END) AS n_odd,
             max(CASE WHEN even = 1 THEN m6 END) AS me,
             max(CASE WHEN even = 0 THEN m6 END) AS mo
      FROM m GROUP BY 1, 2),
    p AS (
      SELECT label, CAST(min(n_even) AS BIGINT) AS n_even,
             CAST(min(n_odd) AS BIGINT) AS n_odd,
             sum((me - mo) * (me - mo)) AS ss,
             CAST(count(*) AS BIGINT) AS d
      FROM sides GROUP BY 1)
    SELECT CAST(label AS BIGINT) AS label, n_even, n_odd, d,
           CASE WHEN n_even > 0 AND n_odd > 0
                THEN round(sqrt(CAST(ss AS DOUBLE)) / 1e6, 6) END
             AS centroid_l2_drift
    FROM p
    """,
)


# Seasonal-naïve forecast error: same-slot-yesterday lag with a
# consecutive-day guard; slot-day collapse by last tick
_reg(
    "win_seasonal_naive",
    lambda s, d: wn.win_seasonal_naive(events_us(s, d)),
    f"""
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) // {DAY_US} AS day,
             (epoch_us(ts) // {HOUR_US}) % 24 AS hod,
             CAST(round(value * 100) AS BIGINT) AS c,
             epoch_us(ts) AS tu, event_id
      FROM events),
    g AS (
      SELECT user_id, event_type, CAST(day AS BIGINT) AS day,
             CAST(hod AS BIGINT) AS hod,
             CAST(last(c ORDER BY tu, event_id) AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY 1, 2, 3, 4),
    l AS (
      SELECT *, lag(day) OVER w AS prev_day, lag(c) OVER w AS prev_c
      FROM g
      WINDOW w AS (PARTITION BY user_id, event_type, hod ORDER BY day))
    SELECT user_id, event_type, day, hod, c, n,
           CAST(CASE WHEN prev_day = day - 1 THEN prev_c END AS BIGINT)
             AS naive_c,
           CAST(CASE WHEN prev_day = day - 1 THEN c - prev_c END AS BIGINT)
             AS err_c
    FROM l
    """,
)


# Time since the running peak: one expanding struct max carries the peak
# value, its timestamp, and the latest-wins tie rule
_reg(
    "win_peak_age",
    lambda s, d: wn.win_peak_age(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    p AS (
      SELECT *, max(struct_pack(c := c, tu := ts_us, eid := event_id)) OVER (
          PARTITION BY user_id, event_type ORDER BY ts_us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk
      FROM t)
    SELECT event_id, user_id, event_type, ts_us,
           CAST(pk.c AS BIGINT) AS peak_c,
           CAST(pk.tu AS BIGINT) AS peak_ts_us,
           CAST(ts_us - pk.tu AS BIGINT) AS peak_age_us
    FROM p
    """,
)


# Last-touch attribution census: union-and-carry as-of + 7-day guard,
# per-day conversion coverage
_reg(
    "agg_attribution",
    lambda s, d: bh.agg_attribution(events_us(s, d)),
    f"""
    WITH u AS (
      SELECT user_id, epoch_us(ts) AS tu, epoch_us(ts) AS click_us,
             0 AS side, CAST(NULL AS BIGINT) AS event_id
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, epoch_us(ts), NULL, 1, event_id
      FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT *, last_value(click_us IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY tu, side
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
      FROM u),
    b AS (
      SELECT tu // {DAY_US} AS day,
             CASE WHEN last_click IS NOT NULL
                   AND tu - last_click <= {7 * DAY_US}
                  THEN 1 ELSE 0 END AS a
      FROM c WHERE side = 1),
    g AS (
      SELECT CAST(day AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(sum(a) AS BIGINT) AS n_attributed
      FROM b GROUP BY 1)
    SELECT day, n_purchases, n_attributed,
           CAST((2000000 * CAST(n_attributed AS HUGEINT) + n_purchases)
                // (2 * CAST(n_purchases AS HUGEINT)) AS DOUBLE) / 1e6
             AS attribution_rate
    FROM g
    """,
)


# Sequential quality-gate funnel: integer cross-multiplied predicates,
# cumulative-AND survivor counts per source
_reg(
    "curation_filter_funnel",
    lambda s, d: cu.curation_filter_funnel(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT source, lang, CAST(length(text) AS BIGINT) AS n,
             CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                  AS BIGINT) AS na,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS nw
      FROM documents),
    f AS (
      SELECT source,
             CASE WHEN n > 0 THEN 1 ELSE 0 END AS s1,
             CASE WHEN n > 0 AND n >= 100 AND n <= 400 THEN 1 ELSE 0 END AS s2,
             CASE WHEN n > 0 AND n >= 100 AND n <= 400
                   AND 100 * na >= 55 * n THEN 1 ELSE 0 END AS s3,
             CASE WHEN n > 0 AND n >= 100 AND n <= 400
                   AND 100 * na >= 55 * n
                   AND 3 * nw <= na AND na <= 9 * nw AND nw > 0
                  THEN 1 ELSE 0 END AS s4,
             CASE WHEN n > 0 AND n >= 100 AND n <= 400
                   AND 100 * na >= 55 * n
                   AND 3 * nw <= na AND na <= 9 * nw AND nw > 0
                   AND lang IN ('en', 'de', 'fr', 'es', 'zh')
                  THEN 1 ELSE 0 END AS s5
      FROM t),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(s1) AS BIGINT) AS n_nonempty,
             CAST(sum(s2) AS BIGINT) AS n_len_ok,
             CAST(sum(s3) AS BIGINT) AS n_alpha_ok,
             CAST(sum(s4) AS BIGINT) AS n_wordlen_ok,
             CAST(sum(s5) AS BIGINT) AS n_pass
      FROM f GROUP BY 1)
    SELECT source, n_docs, n_nonempty, n_len_ok, n_alpha_ok, n_wordlen_ok,
           n_pass,
           CAST((2000000 * CAST(n_pass AS HUGEINT) + n_docs)
                // (2 * CAST(n_docs AS HUGEINT)) AS DOUBLE) / 1e6 AS pass_rate
    FROM g
    """,
)


# Streaming day-close publisher: the win_gap_open day rows minus each
# series' still-open last day (the append-mode withholding contract)
_reg(
    "stream_day_roll",
    sm.stream_day_roll,
    f"""
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) // {DAY_US} AS day,
             CAST(round(value * 100) AS BIGINT) AS c,
             epoch_us(ts) AS tu, event_id
      FROM events),
    g AS (
      SELECT user_id, event_type, CAST(day AS BIGINT) AS day,
             CAST(first(c ORDER BY tu, event_id) AS BIGINT) AS open_c,
             CAST(last(c ORDER BY tu, event_id) AS BIGINT) AS close_c,
             CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY 1, 2, 3),
    w AS (
      SELECT *,
             max(day) OVER (PARTITION BY user_id, event_type) AS last_day,
             lag(close_c) OVER (PARTITION BY user_id, event_type
                                ORDER BY day) AS prev_close
      FROM g)
    SELECT user_id, event_type, day, open_c, close_c, n,
           CAST(open_c - prev_close AS BIGINT) AS gap_c
    FROM w WHERE day < last_day
    """,
)


# Pattern-function scalar suite over real text (RE2/Java-common subset)
_reg(
    "scalar_regex",
    lambda s, d: sc.scalar_regex(load(s, d, "documents")),
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, '[A-Za-z]{5,}')) AS BIGINT)
             AS n_long_words,
           CAST(length(regexp_replace(text, '[aeiou]', '*', 'g')) AS BIGINT)
             AS len_after_sub,
           regexp_matches(text, '[.!?]') AS has_sentence_end
    FROM documents
    """,
)


# Within-label scatter (covariance trace + RMS radius): integer-moment
# variance numerators summed exactly over dims, one device divide
_reg(
    "emb_label_spread",
    lambda s, d: sim.emb_label_spread(load(s, d, "embeddings")),
    """
    WITH flat AS (
      SELECT label, unnest(range(len(embedding))) AS pos,
             unnest(embedding) AS v
      FROM embeddings),
    c AS (
      SELECT label, pos, CAST(round(v * 1e6) AS BIGINT) AS v6 FROM flat),
    g AS (
      SELECT label, pos, count(*) AS n, sum(v6) AS s1,
             sum(CAST(v6 AS HUGEINT) * v6) AS s2
      FROM c GROUP BY 1, 2),
    p AS (
      SELECT label, CAST(min(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS d,
             sum(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1) AS num
      FROM g GROUP BY 1),
    t AS (
      SELECT label, n, d,
             (2 * num + CAST(n AS HUGEINT) * n)
               // (2 * CAST(n AS HUGEINT) * n) AS trace_e12
      FROM p)
    SELECT CAST(label AS BIGINT) AS label, n, d,
           CAST(trace_e12 AS DOUBLE) / 1e12 AS trace_var,
           round(sqrt(CAST(trace_e12 AS DOUBLE) / 1e12), 6) AS rms_spread
    FROM t
    """,
)


# Volume profile: top-5 most-traded cent levels per type, deterministic
# (count desc, level asc) rank, device shares of the full tape
_reg(
    "agg_volume_profile",
    lambda s, d: agg.agg_volume_profile(events_us(s, d)),
    """
    WITH lv AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS n_ticks
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, c, n_ticks,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY n_ticks DESC, c ASC) AS BIGINT)
               AS level_rank,
             CAST(sum(n_ticks) OVER (PARTITION BY event_type) AS BIGINT)
               AS type_total
      FROM lv)
    SELECT event_type, level_rank, c, n_ticks, type_total,
           CAST((2000000 * CAST(n_ticks AS HUGEINT) + type_total)
                // (2 * CAST(type_total AS HUGEINT)) AS DOUBLE) / 1e6 AS share
    FROM r WHERE level_rank <= 5
    """,
)


# Feed-health census vs the virtual clock: last-seen age + trailing
# window counts, one conditional aggregate
_reg(
    "table_freshness",
    lambda s, d: agg.table_freshness(events_us(s, d), NOW_JAN20),
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us,
           CAST({NOW_JAN20} - max(epoch_us(ts)) AS BIGINT) AS age_us,
           CAST(sum(CASE WHEN epoch_us(ts) > {NOW_JAN20} - {HOUR_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_1h,
           CAST(sum(CASE WHEN epoch_us(ts) > {NOW_JAN20} - {24 * HOUR_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_24h,
           CAST(sum(CASE WHEN epoch_us(ts) > {NOW_JAN20} - {7 * 24 * HOUR_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_7d
    FROM events GROUP BY 1
    """,
)


# VACUUM the versioned table: expire old manifests, delete unreferenced
# dirs, read-back byte-identical for surviving versions
_reg(
    "sink_vacuum",
    src.q_sink_vacuum,
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
           CAST(min(epoch_us(ts) // {DAY_US}) AS BIGINT) AS min_day
    FROM events
    WHERE epoch_us(ts) // {DAY_US} - 19723 < 30
    GROUP BY event_type
    """,
)


# Live time-since-high: O(1) state replay of win_peak_age (oracle = the
# batch expanding struct max — every row emits)
_reg(
    "stream_peak_age",
    sm.stream_peak_age,
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    p AS (
      SELECT *, max(struct_pack(c := c, tu := ts_us, eid := event_id)) OVER (
          PARTITION BY user_id, event_type ORDER BY ts_us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk
      FROM t)
    SELECT user_id, event_type, ts_us, event_id,
           CAST(pk.c AS BIGINT) AS peak_c,
           CAST(pk.tu AS BIGINT) AS peak_ts_us,
           CAST(ts_us - pk.tu AS BIGINT) AS peak_age_us
    FROM p
    """,
)


# Depth-1 binary-segmentation changepoint: exact integer split scores,
# one IEEE divide, total-ordered struct argmax
_reg(
    "agg_changepoint",
    lambda s, d: agg.agg_changepoint(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_type, epoch_us(ts) AS tu, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    w AS (
      SELECT event_type, tu, event_id,
             sum(c) OVER (PARTITION BY event_type ORDER BY tu, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sk,
             CAST(count(*) OVER (PARTITION BY event_type ORDER BY tu, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS k,
             sum(c) OVER (PARTITION BY event_type) AS s,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM t),
    f AS (
      SELECT *,
             abs(CAST(sk AS HUGEINT) * (n - k)
                 - (CAST(s AS HUGEINT) - sk) * k) AS num,
             CAST(k AS HUGEINT) * (n - k) AS den
      FROM w WHERE k < n),
    sc AS (
      SELECT event_type,
             max(struct_pack(
               score := CAST(num AS DOUBLE) / CAST(den AS DOUBLE),
               nts := -tu, neid := -event_id,
               split_ts_us := tu, n_left := k, n_right := n - k,
               sl := sk, sr := s - sk)) AS b
      FROM f GROUP BY 1)
    SELECT event_type,
           CAST(b.split_ts_us AS BIGINT) AS split_ts_us,
           CAST(b.n_left AS BIGINT) AS n_left,
           CAST(b.n_right AS BIGINT) AS n_right,
           (CASE WHEN b.sl < 0 THEN -1 ELSE 1 END)
           * CAST((20000 * abs(CAST(b.sl AS HUGEINT)) + 100 * CAST(b.n_left AS HUGEINT))
                  // (200 * CAST(b.n_left AS HUGEINT)) AS DOUBLE) / 1e4
             AS mean_left,
           (CASE WHEN b.sr < 0 THEN -1 ELSE 1 END)
           * CAST((20000 * abs(CAST(b.sr AS HUGEINT)) + 100 * CAST(b.n_right AS HUGEINT))
                  // (200 * CAST(b.n_right AS HUGEINT)) AS DOUBLE) / 1e4
             AS mean_right,
           round(b.score, 4) AS score
    FROM sc
    """,
)


# Engagement-depth census: active-day count histogram off a two-stage
# distinct-grain collapse
_reg(
    "agg_user_lifetime",
    lambda s, d: agg.agg_user_lifetime(events_us(s, d)),
    f"""
    WITH pd AS (
      SELECT user_id, epoch_us(ts) // {DAY_US} AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS active_days,
             CAST(sum(n) AS BIGINT) AS n_events
      FROM pd GROUP BY 1),
    g AS (
      SELECT active_days, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_events) AS BIGINT) AS sum_events
      FROM u GROUP BY 1)
    SELECT active_days, n_users, sum_events,
           CAST((2000000 * CAST(sum_events AS HUGEINT) + n_users)
                // (2 * CAST(n_users AS HUGEINT)) AS DOUBLE) / 1e6
             AS mean_events
    FROM g
    """,
)


# Rapid-reorder forensics: consecutive same-customer orders within 7 days
_reg(
    "sql_rapid_reorders",
    lambda s, d: agg.sql_rapid_reorders(load(s, d, "orders")),
    """
    WITH t AS (
      SELECT o_custkey, o_orderkey,
             epoch_us(o_orderdate) // 86400000000 AS day,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders),
    l AS (
      SELECT o_custkey, day, price_c,
             day - lag(day) OVER (PARTITION BY o_custkey
                                  ORDER BY day, o_orderkey) AS gap_d
      FROM t)
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN gap_d <= 7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rapid,
           CAST(min(gap_d) AS BIGINT) AS min_gap_d,
           CAST(sum(CASE WHEN gap_d <= 7 THEN price_c ELSE 0 END) AS BIGINT)
             AS rapid_c
    FROM l
    GROUP BY 1
    HAVING sum(CASE WHEN gap_d <= 7 THEN 1 ELSE 0 END) > 0
    """,
)


# Magic-byte container census: the oracle PREDICTS each class from the
# id rotation (+ the honest raw-body collision cases) without parsing —
# a classifier offset/literal bug breaks the round-trip
_reg(
    "mm_magic_census",
    lambda s, d: mm.mm_magic_census(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT lang,
             CASE
               WHEN doc_id % 4 = 1 THEN 'png'
               WHEN doc_id % 4 = 2 THEN 'wav'
               WHEN doc_id % 4 = 0 THEN 'bmp'
               WHEN text LIKE 'BM%' THEN 'bmp'
               WHEN substr(text, 1, 4) = 'RIFF' AND substr(text, 9, 4) = 'WAVE'
                 THEN 'wav'
               ELSE 'raw'
             END AS magic,
             octet_length(encode(text))
               + CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 8
                                 WHEN 2 THEN 12 ELSE 0 END AS nb
      FROM documents)
    SELECT magic, lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(nb) AS BIGINT) AS total_bytes
    FROM t GROUP BY 1, 2
    """,
)


# Per-source token-length order statistics (the packing-config numbers)
_reg(
    "token_length_profile",
    lambda s, d: tx.token_length_profile(load(s, d, "documents")),
    """
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
               AS nt
      FROM documents),
    r AS (
      SELECT source, nt,
             row_number() OVER (PARTITION BY source ORDER BY nt, doc_id) AS rn,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM t)
    SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           CAST(max(CASE WHEN rn = (50 * n + 99) // 100 THEN nt END) AS BIGINT)
             AS p50_tokens,
           CAST(max(CASE WHEN rn = (95 * n + 99) // 100 THEN nt END) AS BIGINT)
             AS p95_tokens,
           CAST(max(nt) AS BIGINT) AS max_tokens
    FROM r GROUP BY 1
    """,
)


# DESCRIBE HISTORY for the versioned table: the commit sequence fully
# determines the history rows, so the oracle is the expected literals
_reg(
    "scan_history",
    src.q_scan_history,
    """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), 'overwrite', CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
      (CAST(1 AS BIGINT), 'append',    CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
      (CAST(2 AS BIGINT), 'merge',     CAST(20 AS BIGINT), CAST(20 AS BIGINT))
    ) AS t(version, mode, n_dirs, n_mapped)
    """,
)


# Label-affinity cosine matrix over micro-unit integer centroids: the
# confusion-risk map (one sqrt of an exact product per pair)
_reg(
    "emb_label_affinity",
    lambda s, d: sim.emb_label_affinity(load(s, d, "embeddings")),
    """
    WITH flat AS (
      SELECT label, unnest(range(len(embedding))) AS pos,
             unnest(embedding) AS v
      FROM embeddings),
    g AS (
      SELECT label, pos, count(*) AS n,
             sum(CAST(round(v * 1e6) AS BIGINT)) AS s
      FROM flat GROUP BY 1, 2),
    m AS (
      SELECT label, pos,
             (CASE WHEN s < 0 THEN -1 ELSE 1 END)
             * ((2 * abs(CAST(s AS HUGEINT)) + n) // (2 * CAST(n AS HUGEINT)))
               AS m6
      FROM g),
    p AS (
      SELECT a.label AS la, b.label AS lb,
             sum(a.m6 * b.m6) AS dot,
             sum(a.m6 * a.m6) AS na2,
             sum(b.m6 * b.m6) AS nb2
      FROM m a JOIN m b ON a.pos = b.pos AND a.label < b.label
      GROUP BY 1, 2)
    SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b,
           CASE WHEN na2 > 0 AND nb2 > 0 THEN
             round(CAST(dot AS DOUBLE) / sqrt(CAST(na2 * nb2 AS DOUBLE)), 6)
           END AS cosine
    FROM p
    """,
)


# Source-vocabulary overlap matrix: exact shingle-set Jaccard per source
# pair (the corpus-design contamination map)
_reg(
    "text_source_overlap",
    lambda s, d: tx.text_source_overlap(load(s, d, "documents")),
    """
    WITH d AS (
      SELECT source,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            FOR i IN range(1, len(toks) - 1)]) AS sh
      FROM (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents)
      WHERE len(toks) >= 3),
    flat AS (SELECT DISTINCT source, unnest(sh) AS s FROM d),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sh
              FROM flat GROUP BY 1),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM flat a JOIN flat b ON a.s = b.s AND a.source < b.source
      GROUP BY 1, 2)
    SELECT source_a, source_b, n_inter,
           sa.n_sh AS na, sb.n_sh AS nb,
           CAST((2000000 * CAST(n_inter AS HUGEINT)
                 + (sa.n_sh + sb.n_sh - n_inter))
                // (2 * CAST(sa.n_sh + sb.n_sh - n_inter AS HUGEINT))
                AS DOUBLE) / 1e6 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
)


# Event-study impact curve: +1..+5-tick mean signed move after shocks
_reg(
    "agg_event_study",
    lambda s, d: agg.agg_event_study(events_us(s, d)),
    """
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    l AS (
      SELECT event_type,
             lead(c, 1) OVER w - c AS d1,
             lead(c, 2) OVER w - c AS d2,
             lead(c, 3) OVER w - c AS d3,
             lead(c, 4) OVER w - c AS d4,
             lead(c, 5) OVER w - c AS d5
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY tu, event_id)),
    f AS (
      SELECT 1 AS h, d1 AS d FROM l WHERE event_type = 'error' AND d1 IS NOT NULL
      UNION ALL
      SELECT 2, d2 FROM l WHERE event_type = 'error' AND d2 IS NOT NULL
      UNION ALL
      SELECT 3, d3 FROM l WHERE event_type = 'error' AND d3 IS NOT NULL
      UNION ALL
      SELECT 4, d4 FROM l WHERE event_type = 'error' AND d4 IS NOT NULL
      UNION ALL
      SELECT 5, d5 FROM l WHERE event_type = 'error' AND d5 IS NOT NULL),
    g AS (
      SELECT CAST(h AS BIGINT) AS horizon,
             CAST(count(*) AS BIGINT) AS n_obs,
             CAST(sum(d) AS BIGINT) AS sum_d_c
      FROM f GROUP BY 1)
    SELECT horizon, n_obs, sum_d_c,
           (CASE WHEN sum_d_c < 0 THEN -1 ELSE 1 END)
           * CAST((20000 * abs(CAST(sum_d_c AS HUGEINT))
                   + 100 * CAST(n_obs AS HUGEINT))
                  // (200 * CAST(n_obs AS HUGEINT)) AS DOUBLE) / 1e4
             AS mean_move
    FROM g
    """,
)


# Open-order aging bands vs an explicit as-of day
_reg(
    "sql_open_order_aging",
    lambda s, d: agg.sql_open_order_aging(load(s, d, "orders")),
    f"""
    WITH o AS (
      SELECT CAST(11536 - epoch_us(o_orderdate) // 86400000000
                  AS BIGINT) AS age_d,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders WHERE o_orderstatus = 'O'),
    b AS (
      SELECT CAST(LEAST(age_d // 90, 8) AS BIGINT) AS band, age_d, price_c
      FROM o)
    SELECT band, CAST(band * 90 AS BIGINT) AS min_age_d,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(price_c) AS BIGINT) AS total_c,
           CAST(max(age_d) AS BIGINT) AS oldest_d
    FROM b GROUP BY 1
    """,
)


# Hard-negative mining: brute cosine top-k constrained to label mismatch
_reg(
    "emb_hard_negatives",
    lambda s, d: sim.emb_hard_negatives(load(s, d, "embeddings")),
    """
    WITH e AS (SELECT vec_id, label,
                      [CAST(x AS DOUBLE) FOR x IN embedding] AS v
               FROM embeddings),
    n AS (SELECT vec_id, label, v,
                 sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    q AS (SELECT vec_id AS query_id, label AS q_label, v AS qv, nrm AS qn
          FROM n WHERE vec_id < 5),
    s AS (SELECT q.query_id, n.vec_id AS negative_id,
                 CAST(n.label AS BIGINT) AS negative_label,
                 list_sum([qv[i] * v[i] FOR i IN range(1, len(v) + 1)])
                   / (qn * nrm) AS raw
          FROM n CROSS JOIN q WHERE n.label != q.q_label)
    SELECT query_id, negative_id, negative_label, round(raw, 6) AS cos,
           CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY raw DESC, negative_id) AS rn
          FROM s) WHERE rn <= 3
    """,
)


# Dense-grid completeness: how much of the reference's slot grid is real
# data vs would-be zero-fill
_reg(
    "agg_grid_completeness",
    lambda s, d: agg.agg_grid_completeness(events_us(s, d)),
    f"""
    WITH ps AS (
      SELECT user_id, event_type, epoch_us(ts) // {HOUR_US} AS slot
      FROM events GROUP BY 1, 2, 3),
    srs AS (
      SELECT user_id, event_type,
             CAST(count(*) AS BIGINT) AS present,
             CAST(max(slot) - min(slot) + 1 AS BIGINT) AS expected
      FROM ps GROUP BY 1, 2),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_series,
             CAST(sum(present) AS BIGINT) AS present_slots,
             CAST(sum(expected) AS BIGINT) AS expected_slots
      FROM srs GROUP BY 1)
    SELECT event_type, n_series, present_slots, expected_slots,
           CAST((2000000 * CAST(present_slots AS HUGEINT) + expected_slots)
                // (2 * CAST(expected_slots AS HUGEINT)) AS DOUBLE) / 1e6
             AS completeness
    FROM g
    """,
)


# Live last-touch attribution: per-purchase credit, O(1) state per user
# (oracle = the batch union-and-carry at the purchase grain)
_reg(
    "stream_attribution",
    sm.stream_attribution,
    f"""
    WITH u AS (
      SELECT user_id, epoch_us(ts) AS tu, epoch_us(ts) AS click_us,
             0 AS side, event_id
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, epoch_us(ts), NULL, 1, event_id
      FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT *, last_value(click_us IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY tu, side, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
      FROM u)
    SELECT user_id, event_id, tu AS ts_us,
           CAST(last_click AS BIGINT) AS last_click_us,
           CAST(CASE WHEN last_click IS NOT NULL
                      AND tu - last_click <= {7 * DAY_US}
                     THEN 1 ELSE 0 END AS BIGINT) AS attributed
    FROM c WHERE side = 1
    """,
)


# Customer segment-migration matrix: spend quartiles H1 vs H2
_reg(
    "sql_segment_migration",
    lambda s, d: agg.sql_segment_migration(load(s, d, "orders")),
    """
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CASE WHEN epoch_us(o_orderdate) // 86400000000 < 10227
                           THEN round(o_totalprice * 100) ELSE 0 END)
                  AS BIGINT) AS h1_c,
             CAST(sum(CASE WHEN epoch_us(o_orderdate) // 86400000000 >= 10227
                           THEN round(o_totalprice * 100) ELSE 0 END)
                  AS BIGINT) AS h2_c
      FROM orders GROUP BY 1),
    both_halves AS (SELECT * FROM spend WHERE h1_c > 0 AND h2_c > 0),
    seg AS (
      SELECT o_custkey, h1_c, h2_c,
             ntile(4) OVER (ORDER BY h1_c, o_custkey) AS seg_h1,
             ntile(4) OVER (ORDER BY h2_c, o_custkey) AS seg_h2
      FROM both_halves)
    SELECT CAST(seg_h1 AS BIGINT) AS seg_h1,
           CAST(seg_h2 AS BIGINT) AS seg_h2,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(h1_c) AS BIGINT) AS h1_total_c,
           CAST(sum(h2_c) AS BIGINT) AS h2_total_c
    FROM seg GROUP BY 1, 2
    """,
)
