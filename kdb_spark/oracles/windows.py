"""Oracle registry — window functions and technical indicators.

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403

QUERIES, ORACLES, _reg = make_registry()


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


# Vortex Indicator: directional range movement off the same hourly candle
# spine as win_atr; first candle excluded (no prev), all-flat frame null
_reg(
    "win_vortex",
    lambda s, d: wn.win_vortex(events_us(s, d)),
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
    v AS (
      SELECT event_type, hour_us,
             CAST(abs(h - pl) AS BIGINT) AS vmp_c,
             CAST(abs(l - ph) AS BIGINT) AS vmm_c,
             CAST(CASE WHEN pc IS NOT NULL
                  THEN greatest(h - l, abs(h - pc), abs(l - pc)) END
                  AS BIGINT) AS tr_c
      FROM (SELECT *,
                   lag(h) OVER wo AS ph, lag(l) OVER wo AS pl,
                   lag(cl) OVER wo AS pc
            FROM candles
            WINDOW wo AS (PARTITION BY event_type ORDER BY hour_us))),
    s AS (
      SELECT event_type, hour_us,
             sum(CAST(vmp_c AS HUGEINT)) OVER win AS svmp,
             sum(CAST(vmm_c AS HUGEINT)) OVER win AS svmm,
             sum(CAST(tr_c AS HUGEINT)) OVER win AS strc
      FROM v
      WINDOW win AS (PARTITION BY event_type ORDER BY hour_us
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT event_type, hour_us,
           CASE WHEN strc > 0 THEN
             CAST((2000000 * svmp + strc) // (2 * strc) AS DOUBLE) / 1e6
           END AS vi_plus,
           CASE WHEN strc > 0 THEN
             CAST((2000000 * svmm + strc) // (2 * strc) AS DOUBLE) / 1e6
           END AS vi_minus
    FROM s
    """,
)


# True Strength Index: the win_macd nested quantized-EWMA composition —
# stage-1 integer folds of momentum and |momentum| quantized once to the
# 1e-4 grid, stage-2 folds of those exact grid integers, one device round
_TSI_N1, _TSI_D1 = _ewma_int_sql("mom", 0.15)
_TSI_A1, _ = _ewma_int_sql("am", 0.15)
_TSI_N2, _TSI_D2 = _ewma_int_sql("s1_e4", 0.4)
_TSI_A2, _ = _ewma_int_sql("a1_e4", 0.4)


_reg(
    "win_tsi",
    lambda s, d: wn.win_tsi(events_us(s, d)),
    f"""
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events),
    m AS (
      SELECT event_id, user_id, event_type, ts_us,
             xc - lag(xc) OVER w AS mom,
             abs(xc - lag(xc) OVER w) AS am
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts_us, event_id)),
    e1 AS (
      SELECT event_id, user_id, event_type, ts_us,
             ({_TSI_N1}) AS n1, ({_TSI_A1}) AS a1, ({_TSI_D1}) AS d1
      FROM m
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts_us, event_id)),
    q AS (
      SELECT event_id, user_id, event_type, ts_us,
             CASE WHEN d1 > 0 THEN
               (CASE WHEN n1 < 0 THEN -1 ELSE 1 END)
                 * ((20000 * abs(n1) + d1) // (2 * d1)) END AS s1_e4,
             CASE WHEN d1 > 0 THEN
               (20000 * a1 + d1) // (2 * d1) END AS a1_e4
      FROM e1),
    e2 AS (
      SELECT event_id, user_id, event_type,
             ({_TSI_N2}) AS n2, ({_TSI_A2}) AS a2
      FROM q
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts_us, event_id))
    SELECT event_id, user_id, event_type,
           CASE WHEN a2 > 0 THEN
             CAST((CASE WHEN 100 * n2 < 0 THEN -1 ELSE 1 END)
                  * ((20000 * abs(100 * n2) + a2) // (2 * a2))
                  AS DOUBLE) / 1e4
           END AS tsi
    FROM e2
    """,
)


# Directional movement index: +DI/−DI/DX frame-sum form off the candle
# spine (Wilder's recursive ADX smoothing deliberately omitted — stateless
# exact variant, like the finite-horizon EWMA family)
_reg(
    "win_adx",
    lambda s, d: wn.win_adx(events_us(s, d)),
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
    v AS (
      SELECT event_type, hour_us,
             CAST(CASE WHEN (h - ph) > (pl - l) AND (h - ph) > 0 THEN h - ph
                       WHEN ph IS NOT NULL THEN 0 END AS BIGINT) AS pdm_c,
             CAST(CASE WHEN (pl - l) > (h - ph) AND (pl - l) > 0 THEN pl - l
                       WHEN pl IS NOT NULL THEN 0 END AS BIGINT) AS mdm_c,
             CAST(CASE WHEN pc IS NOT NULL
                  THEN greatest(h - l, abs(h - pc), abs(l - pc)) END
                  AS BIGINT) AS tr_c
      FROM (SELECT *,
                   lag(h) OVER wo AS ph, lag(l) OVER wo AS pl,
                   lag(cl) OVER wo AS pc
            FROM candles
            WINDOW wo AS (PARTITION BY event_type ORDER BY hour_us))),
    s AS (
      SELECT event_type, hour_us,
             sum(CAST(pdm_c AS HUGEINT)) OVER win AS spdm,
             sum(CAST(mdm_c AS HUGEINT)) OVER win AS smdm,
             sum(CAST(tr_c AS HUGEINT)) OVER win AS strc
      FROM v
      WINDOW win AS (PARTITION BY event_type ORDER BY hour_us
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT event_type, hour_us,
           CASE WHEN strc > 0 THEN
             CAST((2000000 * spdm + strc) // (2 * strc) AS DOUBLE) / 1e6
           END AS plus_di,
           CASE WHEN strc > 0 THEN
             CAST((2000000 * smdm + strc) // (2 * strc) AS DOUBLE) / 1e6
           END AS minus_di,
           CASE WHEN spdm + smdm > 0 THEN
             CAST((2000000 * abs(spdm - smdm) + (spdm + smdm))
                  // (2 * (spdm + smdm)) AS DOUBLE) / 1e6
           END AS dx
    FROM s
    """,
)


# Percentage price oscillator: macd's stage-1 folds (same 0.4/0.15 integer
# weight literals), spread normalized by the slow line, signed device 4 dp
_reg(
    "win_ppo",
    lambda s, d: wn.win_ppo(events_us(s, d)),
    f"""
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events),
    e AS (
      SELECT event_id, user_id, event_type,
             ({_MACD_NF}) AS nf, ({_MACD_FD}) AS fd,
             ({_MACD_NS}) AS ns, ({_MACD_SD}) AS sd
      FROM t
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts_us, event_id))
    SELECT event_id, user_id, event_type,
           CASE WHEN ns > 0 THEN
             CAST((CASE WHEN 100 * (nf * sd - ns * fd) < 0 THEN -1 ELSE 1 END)
                  * ((20000 * abs(100 * (nf * sd - ns * fd)) + ns * fd)
                     // (2 * (ns * fd))) AS DOUBLE) / 1e4
           END AS ppo
    FROM e
    """,
)


# Rate of change: k-lag normalized momentum, signed device 4 dp
_reg(
    "win_roc",
    lambda s, d: wn.win_roc(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    l AS (
      SELECT event_id, user_id, event_type, c,
             lag(c, 10) OVER (PARTITION BY user_id, event_type
                              ORDER BY ts_us, event_id) AS pc
      FROM t)
    SELECT event_id, user_id, event_type,
           CASE WHEN pc > 0 THEN
             CAST((CASE WHEN 100 * (c - pc) < 0 THEN -1 ELSE 1 END)
                  * ((20000 * abs(100 * (c - pc)) + pc) // (2 * pc))
                  AS DOUBLE) / 1e4
           END AS roc
    FROM l
    """,
)


_reg(
    "win_candle_patterns",
    lambda s, d: wn.win_candle_patterns(events_us(s, d)),
    # pure integer predicates over OHLC cents; 10x scaling instead of
    # division so every flag is an exact inequality
    f"""
    WITH c AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS hour_us,
             -- DuckDB 1.0 arg_min/max reject struct keys: pack the
             -- (ts, event_id) tiebreak into one HUGEINT. Stride 10^19
             -- exceeds the whole non-negative BIGINT event_id domain
             -- (max 9.2e18), so the packing is collision-free by TYPE,
             -- not by fixture assumption (ADVICE r15); ts_us·10^19
             -- ~ 1.7e34 stays inside HUGEINT
             arg_min(CAST(round(value * 100) AS BIGINT),
                     CAST(epoch_us(ts) AS HUGEINT) * 10000000000000000000
                     + event_id) AS o,
             max(CAST(round(value * 100) AS BIGINT)) AS h,
             min(CAST(round(value * 100) AS BIGINT)) AS l,
             arg_max(CAST(round(value * 100) AS BIGINT),
                     CAST(epoch_us(ts) AS HUGEINT) * 10000000000000000000
                     + event_id) AS cl
      FROM events GROUP BY 1, 2),
    x AS (
      SELECT event_type, hour_us, o, h, l, cl,
             abs(cl - o) AS body, h - l AS rng,
             h - greatest(o, cl) AS upper_w,
             least(o, cl) - l AS lower_w,
             lag(o) OVER w AS po, lag(cl) OVER w AS pc
      FROM c WINDOW w AS (PARTITION BY event_type ORDER BY hour_us))
    SELECT event_type, CAST(hour_us AS BIGINT) AS hour_us,
           10 * body <= rng AS is_doji,
           (lower_w >= 2 * body AND upper_w <= body AND rng > 0)
             AS is_hammer,
           (po IS NOT NULL AND pc < po AND cl > o AND o <= pc AND cl >= po)
             AS engulf_bull,
           (po IS NOT NULL AND pc > po AND cl < o AND o >= pc AND cl <= po)
             AS engulf_bear
    FROM x
    """,
)


_reg(
    "win_tick_bars",
    lambda s, d: wn.win_tick_bars(events_us(s, d)),
    # same deterministic print order -> integer bar ids -> exact picks;
    # arg_min/max key on rn (plain BIGINT, no struct-key limitation)
    """
    WITH r AS (
      SELECT event_type, epoch_us(ts) AS ts_us, event_id,
             CAST(round(value * 100) AS BIGINT) AS x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events)
    SELECT event_type, CAST((rn - 1) // 100 AS BIGINT) AS bar_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(arg_min(x, rn) AS BIGINT) AS open_c,
           CAST(max(x) AS BIGINT) AS high_c,
           CAST(min(x) AS BIGINT) AS low_c,
           CAST(arg_max(x, rn) AS BIGINT) AS close_c,
           CAST(sum(CAST(x AS HUGEINT)) AS BIGINT) AS sum_c,
           CAST(min(ts_us) AS BIGINT) AS bar_start_us,
           CAST(max(ts_us) AS BIGINT) AS bar_end_us
    FROM r GROUP BY 1, 2
    """,
)


# Parkinson range volatility: hourly H/L cents bars, ln on exact integer
# inputs, hour-ordered list_reduce fold, the pinned 4·ln2 literal
_reg(
    "win_parkinson_vol",
    lambda s, d: wn.win_parkinson_vol(events_us(s, d)),
    """
    WITH bars AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             max(CAST(round(value * 100) AS BIGINT)) AS hi,
             min(CAST(round(value * 100) AS BIGINT)) AS lo
      FROM events GROUP BY 1, 2),
    terms AS (
      SELECT event_type, CAST(h // 24 AS BIGINT) AS day, h,
             CASE WHEN lo > 0 AND hi > lo THEN
               (ln(CAST(hi AS DOUBLE)) - ln(CAST(lo AS DOUBLE)))
               * (ln(CAST(hi AS DOUBLE)) - ln(CAST(lo AS DOUBLE)))
             END AS t
      FROM bars),
    g AS (
      SELECT event_type, day,
             CAST(count(t) AS BIGINT) AS n_bars,
             list_reduce(list_prepend(0.0,
               list(t ORDER BY h) FILTER (t IS NOT NULL)),
               (a, v) -> a + v) AS s
      FROM terms GROUP BY 1, 2)
    SELECT event_type, day, n_bars,
           CASE WHEN n_bars > 0 THEN
             floor(sqrt(s / (2.772588722239781 * CAST(n_bars AS DOUBLE)))
                   * 1e6 + 0.5) / 1e6
           END AS park_vol
    FROM g
    """,
)


# Garman–Klass OHLC volatility: exact O/C picks via the 10^19-stride
# packed tiebreak (candle device), ln on exact integer inputs, hour-
# ordered folds, both constants pinned as identical literals
_reg(
    "win_garman_klass",
    lambda s, d: wn.win_garman_klass(events_us(s, d)),
    """
    WITH bars AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             arg_min(CAST(round(value * 100) AS BIGINT),
                     CAST(epoch_us(ts) AS HUGEINT) * 10000000000000000000
                     + event_id) AS o,
             max(CAST(round(value * 100) AS BIGINT)) AS hi,
             min(CAST(round(value * 100) AS BIGINT)) AS lo,
             arg_max(CAST(round(value * 100) AS BIGINT),
                     CAST(epoch_us(ts) AS HUGEINT) * 10000000000000000000
                     + event_id) AS cl
      FROM events GROUP BY 1, 2),
    terms AS (
      SELECT event_type, CAST(h // 24 AS BIGINT) AS day, h,
             CASE WHEN lo > 0 AND o > 0 AND hi > lo THEN
               0.5 * (ln(CAST(hi AS DOUBLE)) - ln(CAST(lo AS DOUBLE)))
                   * (ln(CAST(hi AS DOUBLE)) - ln(CAST(lo AS DOUBLE)))
               - 0.386294361119890
                 * (ln(CAST(cl AS DOUBLE)) - ln(CAST(o AS DOUBLE)))
                 * (ln(CAST(cl AS DOUBLE)) - ln(CAST(o AS DOUBLE)))
             END AS t
      FROM bars),
    g AS (
      SELECT event_type, day,
             CAST(count(t) AS BIGINT) AS n_bars,
             list_reduce(list_prepend(0.0,
               list(t ORDER BY h) FILTER (t IS NOT NULL)),
               (a, v) -> a + v) AS s
      FROM terms GROUP BY 1, 2)
    SELECT event_type, day, n_bars,
           CASE WHEN n_bars > 0 THEN
             floor(s / CAST(n_bars AS DOUBLE) * 1e6 + 0.5) / 1e6
           END AS gk_var
    FROM g
    """,
)
