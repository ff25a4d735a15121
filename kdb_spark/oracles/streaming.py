"""Oracle registry — Structured Streaming ops in batch-equivalence mode.

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403
from kdb_spark.oracles.llm_dedup import _CROSS_CORPUS_SQL
from kdb_spark.oracles.windows import _EWMA_ORACLE
from kdb_spark.oracles.windows import ORACLES as _WIN_ORACLES
from kdb_spark.oracles.aggregations import ORACLES as _AGG_ORACLES

QUERIES, ORACLES, _reg = make_registry()


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
    _WIN_ORACLES["win_zscore"],
)


# the streaming state IS agg_quantile_sketch's mergeable histogram, so the
# drained final rows share the batch op's oracle verbatim
_reg(
    "stream_quantile",
    sm.stream_quantile,
    _AGG_ORACLES["agg_quantile_sketch"],
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


_reg(
    "stream_cross_dedup",
    lambda s, d: sm.stream_cross_dedup(s, d),
    _CROSS_CORPUS_SQL,
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


# Cumulative VWAP in its online form: O(1) state (two sums + tail), every
# row emitted, so the batch cumulative-window SQL is the oracle verbatim
_reg(
    "stream_vwap",
    sm.stream_vwap,
    """
    WITH t AS (
      SELECT event_type, epoch_us(ts) AS ts_us, event_id,
             CAST(round(value * 100) AS BIGINT) AS c,
             coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)
               AS vol
      FROM events),
    s AS (
      SELECT event_type, ts_us, event_id,
             sum(CAST(c AS HUGEINT) * vol) OVER w AS spv,
             sum(CAST(vol AS HUGEINT)) OVER w AS sv
      FROM t
      WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_type, ts_us, event_id, CAST(sv AS BIGINT) AS cum_vol,
           CASE WHEN sv > 0 THEN
             CAST((2000000 * spv + 100 * sv) // (2 * (100 * sv))
                  AS DOUBLE) / 1e6
           END AS vwap
    FROM s
    """,
)
