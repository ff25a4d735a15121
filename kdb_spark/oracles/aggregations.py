"""Oracle registry — batch aggregations + behavioral analytics.

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403

QUERIES, ORACLES, _reg = make_registry()


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


# Pairwise type×type hourly-revenue covariance: dimension-sized self-join
# on the hourly rollup, exact decimal co-moments, signed device at 4 dp
_reg(
    "agg_cov_matrix",
    lambda s, d: agg.agg_cov_matrix(events_us(s, d)),
    """
    WITH h AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS c
      FROM events GROUP BY 1, 2),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS HUGEINT) AS n_hours,
             sum(a.c * b.c) AS sxy, sum(a.c) AS sx, sum(b.c) AS sy
      FROM h a JOIN h b ON a.hour = b.hour AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, CAST(n_hours AS BIGINT) AS n_hours,
           CAST(sx AS BIGINT) AS sum_a_c, CAST(sy AS BIGINT) AS sum_b_c,
           CAST((CASE WHEN n_hours * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
                * ((20000 * abs(n_hours * sxy - sx * sy)
                    + n_hours * n_hours)
                   // (2 * n_hours * n_hours)) AS DOUBLE) / 1e4 AS cov_c2
    FROM p
    """,
)


# Robust median/MAD outlier census: order-statistic median in exact cents
# (the bowley rank device), all-integer flag rule, unsigned device rate
_reg(
    "agg_robust_zscore",
    lambda s, d: agg.agg_robust_zscore(events_us(s, d)),
    """
    WITH t AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x, event_id
      FROM events),
    r AS (
      SELECT event_type, x, event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY x, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM t),
    med AS (SELECT event_type, x AS med_c FROM r
            WHERE rn = (50 * n + 99) // 100),
    d AS (
      SELECT r.event_type, abs(r.x - m.med_c) AS dev, m.med_c, r.event_id
      FROM r JOIN med m USING (event_type)),
    dd AS (
      SELECT event_type, dev, med_c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY dev, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    mad AS (SELECT event_type, dev AS mad_c FROM dd
            WHERE rn = (50 * n + 99) // 100),
    g AS (
      SELECT dd.event_type,
             CAST(max(dd.n) AS BIGINT) AS n,
             CAST(max(dd.med_c) AS BIGINT) AS med_c,
             CAST(max(mad.mad_c) AS BIGINT) AS mad_c,
             CAST(sum(CASE WHEN 10 * dd.dev > 35 * mad.mad_c
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM dd JOIN mad USING (event_type)
      GROUP BY dd.event_type)
    SELECT event_type, n, med_c, mad_c, n_outliers,
           CAST((2000000 * CAST(n_outliers AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS outlier_rate
    FROM g
    """,
)


# Per-nation revenue concentration: argmax customer + share device
_reg(
    "sql_top_customer_share",
    lambda s, d: agg.sql_top_customer_share(
        load(s, d, "orders"), load(s, d, "customer"), load(s, d, "nation")
    ),
    """
    WITH pc AS (
      SELECT c.c_nationkey, o.o_custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT n.n_name AS nation, pc.o_custkey, pc.rev_c,
             sum(pc.rev_c) OVER (PARTITION BY n.n_name) AS nation_rev_c,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY pc.rev_c DESC, pc.o_custkey) AS rk
      FROM pc JOIN nation n ON pc.c_nationkey = n.n_nationkey)
    SELECT nation, CAST(nation_rev_c AS BIGINT) AS nation_rev_c,
           CAST(o_custkey AS BIGINT) AS top_custkey,
           CAST(rev_c AS BIGINT) AS top_rev_c,
           CAST((20000 * CAST(rev_c AS HUGEINT) + nation_rev_c)
                // (2 * CAST(nation_rev_c AS HUGEINT)) AS DOUBLE) / 1e4
             AS top_share
    FROM ranked WHERE rk = 1
    """,
)


# PSI drift terms per bin: laplace-smoothed device shares, per-bin emission
# (no cross-bin double sum — the reader folds ≤|types| rows)
_reg(
    "agg_psi",
    lambda s, d: agg.agg_psi(events_us(s, d), T_JAN10),
    f"""
    WITH g AS (
      SELECT event_type,
             CAST(sum(CASE WHEN epoch_us(ts) < {T_JAN10} THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_before,
             CAST(sum(CASE WHEN epoch_us(ts) >= {T_JAN10} THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_after
      FROM events GROUP BY event_type),
    t AS (
      SELECT event_type, c_before, c_after,
             CAST(sum(c_before + 1) OVER () AS HUGEINT) AS nb,
             CAST(sum(c_after + 1) OVER () AS HUGEINT) AS na
      FROM g),
    dev AS (
      SELECT event_type, c_before, c_after,
             CAST((2000000 * (1000000 * CAST(c_before + 1 AS HUGEINT))
                   + 1000000 * nb)
                  // (2 * 1000000 * nb) AS DOUBLE) / 1e6 AS p,
             CAST((2000000 * (1000000 * CAST(c_after + 1 AS HUGEINT))
                   + 1000000 * na)
                  // (2 * 1000000 * na) AS DOUBLE) / 1e6 AS q
      FROM t)
    SELECT event_type, c_before, c_after, p, q,
           round((p - q) * ln(p / q), 6) AS psi_term
    FROM dev
    """,
)


_reg(
    "agg_mann_kendall",
    lambda s, d: agg.agg_mann_kendall(events_us(s, d)),
    # S and var18 are pure bigint pair/tie arithmetic; z is one float
    # expression of exact ints (IEEE / and sqrt are correctly rounded →
    # bit-identical cross-engine). Pair generation blocks on the
    # (event_type, day) group key in BOTH engines.
    f"""
    WITH base AS (
      SELECT event_type, epoch_us(ts) // {DAY_US} AS day,
             epoch_us(ts) AS ts_us, event_id,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events),
    s AS (
      SELECT a.event_type, a.day,
             CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM base a JOIN base b
        ON a.event_type = b.event_type AND a.day = b.day
       AND (a.ts_us < b.ts_us
            OR (a.ts_us = b.ts_us AND a.event_id < b.event_id))
      GROUP BY 1, 2),
    n AS (
      SELECT event_type, day, CAST(count(*) AS BIGINT) AS n
      FROM base GROUP BY 1, 2),
    ties AS (
      SELECT event_type, day,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
      FROM (SELECT event_type, day, x, CAST(count(*) AS BIGINT) AS t
            FROM base GROUP BY 1, 2, 3)
      GROUP BY 1, 2),
    g AS (
      SELECT n.event_type, n.day, n.n,
             CAST(coalesce(s.s_stat, 0) AS BIGINT) AS s_stat,
             CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie18 AS BIGINT)
               AS var18
      FROM n
      JOIN ties ON n.event_type = ties.event_type AND n.day = ties.day
      LEFT JOIN s ON n.event_type = s.event_type AND n.day = s.day)
    SELECT event_type, day, n, s_stat, var18,
           CASE WHEN var18 <= 0 THEN NULL
                WHEN s_stat > 0
                  THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var18 / 18.0)
                WHEN s_stat < 0
                  THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var18 / 18.0)
                ELSE 0.0 END AS z
    FROM g
    """,
)


_reg(
    "agg_bootstrap_ci",
    lambda s, d: agg.agg_bootstrap_ci(events_us(s, d)),
    # Poisson-bootstrap: replicate weights invert the Poisson(1) CDF at
    # the md5_slot of "event_id:b" — the same _POISSON1_CUM_1E6 grid
    # constants the engine's CASE chain is generated from; replicate
    # means ride the signed device at 6 dp and the CI picks are exact
    # (mean, b) order statistics
    """
    WITH base AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS x, t.b
      FROM events, range(0, 32) t(b)),
    wts AS (
      SELECT event_type, b, x,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                                 || CAST(b AS VARCHAR)), 1, 6))::BIGINT
               % 1000000 AS slot
      FROM base),
    ww AS (
      SELECT event_type, b, x,
             CASE WHEN slot < 367879 THEN 0 WHEN slot < 735758 THEN 1
                  WHEN slot < 919698 THEN 2 WHEN slot < 981011 THEN 3
                  WHEN slot < 996340 THEN 4 WHEN slot < 999405 THEN 5
                  WHEN slot < 999916 THEN 6 WHEN slot < 999989 THEN 7
                  WHEN slot < 999998 THEN 8 WHEN slot < 999999 THEN 9
                  ELSE 10 END AS w
      FROM wts),
    rep AS (
      SELECT event_type, b,
             sum(CAST(w AS HUGEINT) * x) AS swx,
             CAST(sum(w) AS BIGINT) AS sw
      FROM ww GROUP BY 1, 2),
    rm AS (
      SELECT event_type, b,
             CASE WHEN sw > 0 THEN
               (CASE WHEN swx < 0 THEN -1 ELSE 1 END)
               * CAST((2000000 * abs(swx) + 100 * CAST(sw AS HUGEINT))
                      // (2 * 100 * CAST(sw AS HUGEINT)) AS DOUBLE) / 1e6
             END AS mean_b
      FROM rep WHERE sw > 0),
    rk AS (
      SELECT event_type, mean_b,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY mean_b, b) AS rn
      FROM rm),
    picks AS (
      SELECT event_type,
             min(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo,
             min(CASE WHEN rn = 31 THEN mean_b END) AS ci_hi
      FROM rk GROUP BY 1),
    overall AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS sx
      FROM events GROUP BY 1)
    SELECT o.event_type, o.n,
           (CASE WHEN o.sx < 0 THEN -1 ELSE 1 END)
           * CAST((2000000 * abs(o.sx) + 100 * CAST(o.n AS HUGEINT))
                  // (2 * 100 * CAST(o.n AS HUGEINT)) AS DOUBLE) / 1e6
             AS mean_usd,
           p.ci_lo, p.ci_hi
    FROM overall o JOIN picks p ON o.event_type = p.event_type
    """,
)


_reg(
    "agg_permutation_test",
    lambda s, d: agg.agg_permutation_test(events_us(s, d)),
    # same md5 relabel device, same cross-multiplied integer comparison —
    # |d'| >= |d_obs| as pnum*obs_den >= obs_num*pden on HUGEINT, no
    # float means anywhere
    """
    WITH two AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events WHERE event_type IN ('click', 'purchase')),
    obs AS (
      SELECT
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        sum(CASE WHEN event_type = 'click' THEN CAST(x AS HUGEINT) ELSE 0 END) AS sxa,
        sum(CASE WHEN event_type = 'purchase' THEN CAST(x AS HUGEINT) ELSE 0 END) AS sxb
      FROM two),
    obs2 AS (
      SELECT na, nb, sxa,
             sxa * nb - sxb * na AS obs_num_signed,
             CAST(na AS HUGEINT) * nb AS obs_den
      FROM obs),
    rep AS (
      SELECT q.b,
             sum(CASE WHEN grp_a THEN CAST(x AS HUGEINT) ELSE 0 END) AS psxa,
             CAST(sum(CASE WHEN grp_a THEN 1 ELSE 0 END) AS BIGINT) AS pna,
             sum(CASE WHEN NOT grp_a THEN CAST(x AS HUGEINT) ELSE 0 END) AS psxb,
             CAST(sum(CASE WHEN NOT grp_a THEN 1 ELSE 0 END) AS BIGINT) AS pnb
      FROM (
        SELECT two.x, t.b,
               ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                                   || CAST(t.b AS VARCHAR)), 1, 6))::BIGINT
                 % 1000000 < 500000 AS grp_a
        FROM two, range(0, 32) t(b)) q
      GROUP BY 1
      HAVING sum(CASE WHEN grp_a THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN NOT grp_a THEN 1 ELSE 0 END) > 0),
    cmp AS (
      SELECT o.na, o.nb, o.obs_num_signed, o.obs_den, o.sxa,
             CASE WHEN abs(r.psxa * r.pnb - r.psxb * r.pna) * o.obs_den
                       >= abs(o.obs_num_signed)
                          * (CAST(r.pna AS HUGEINT) * r.pnb)
                  THEN 1 ELSE 0 END AS exceeds
      FROM rep r, obs2 o),
    g AS (
      SELECT na, nb, obs_num_signed, obs_den,
             CAST(sum(exceeds) AS BIGINT) AS n_exceed,
             CAST(count(*) AS BIGINT) AS n_reps
      FROM cmp GROUP BY 1, 2, 3, 4)
    SELECT na AS n_a, nb AS n_b,
           (CASE WHEN obs_num_signed < 0 THEN -1 ELSE 1 END)
           * CAST((2000000 * abs(obs_num_signed) + 100 * obs_den)
                  // (2 * 100 * obs_den) AS DOUBLE) / 1e6 AS mean_diff_usd,
           n_exceed,
           CAST((2000000 * CAST(1 + n_exceed AS HUGEINT) + (1 + n_reps))
                // (2 * CAST(1 + n_reps AS HUGEINT)) AS DOUBLE) / 1e6
             AS p_value
    FROM g
    """,
)


_reg(
    "agg_busy_spans",
    lambda s, d: agg.agg_busy_spans(events_us(s, d)),
    # same two-phase sweep: per-(type, user) sessionize, then the classic
    # merge-intervals cumulative-max window per type — pure integer µs.
    # Both window passes share ONE total order (start, end, user, sid) so
    # tied spans group identically in both engines.
    """
    WITH t AS (
      SELECT event_type, user_id, epoch_us(ts) AS tu, event_id FROM events),
    m AS (
      SELECT event_type, user_id, tu, event_id,
             CASE WHEN lag(tu) OVER w IS NULL THEN 1
                  WHEN tu - lag(tu) OVER w >= 1800000000 THEN 1
                  ELSE 0 END AS ns
      FROM t
      WINDOW w AS (PARTITION BY event_type, user_id ORDER BY tu, event_id)),
    sgrp AS (
      SELECT event_type, user_id, tu,
             sum(ns) OVER (PARTITION BY event_type, user_id
                           ORDER BY tu, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM m),
    sess AS (
      SELECT event_type, user_id, sid,
             CAST(min(tu) AS BIGINT) AS s_start,
             CAST(max(tu) + 1 AS BIGINT) AS s_end
      FROM sgrp GROUP BY 1, 2, 3),
    sweep AS (
      SELECT event_type, user_id, sid, s_start, s_end,
             CASE WHEN max(s_end) OVER wp IS NULL THEN 1
                  WHEN s_start > max(s_end) OVER wp THEN 1
                  ELSE 0 END AS opens
      FROM sess
      WINDOW wp AS (PARTITION BY event_type
                    ORDER BY s_start, s_end, user_id, sid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    spans AS (
      SELECT event_type, s_start, s_end,
             CAST(sum(opens) OVER (PARTITION BY event_type
               ORDER BY s_start, s_end, user_id, sid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS span_id
      FROM sweep)
    SELECT event_type, span_id,
           CAST(min(s_start) AS BIGINT) AS span_start,
           CAST(max(s_end) AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_sessions
    FROM spans GROUP BY 1, 2
    """,
)


_reg(
    "agg_survival_table",
    lambda s, d: agg.agg_survival_table(events_us(s, d)),
    # same reduction: sessionize -> integer minute durations -> duration
    # census -> suffix counts by one descending cumulative window; the
    # float survival product is deliberately excluded (cross-engine trap)
    """
    WITH t AS (
      SELECT event_type, user_id, epoch_us(ts) AS tu, event_id FROM events),
    m AS (
      SELECT event_type, user_id, tu, event_id,
             CASE WHEN lag(tu) OVER w IS NULL THEN 1
                  WHEN tu - lag(tu) OVER w >= 1800000000 THEN 1
                  ELSE 0 END AS ns
      FROM t
      WINDOW w AS (PARTITION BY event_type, user_id ORDER BY tu, event_id)),
    sgrp AS (
      SELECT event_type, user_id, tu,
             sum(ns) OVER (PARTITION BY event_type, user_id
                           ORDER BY tu, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM m),
    sess AS (
      SELECT event_type, user_id, sid,
             CAST((max(tu) - min(tu)) // 60000000 AS BIGINT) AS dur_min
      FROM sgrp GROUP BY 1, 2, 3),
    census AS (
      SELECT event_type, dur_min, CAST(count(*) AS BIGINT) AS n_event
      FROM sess GROUP BY 1, 2),
    risk AS (
      SELECT event_type, dur_min, n_event,
             CAST(sum(n_event) OVER (PARTITION BY event_type
               ORDER BY dur_min DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_risk
      FROM census)
    SELECT event_type, dur_min, n_event, n_risk,
           CAST((2000000 * CAST(n_event AS HUGEINT) + n_risk)
                // (2 * CAST(n_risk AS HUGEINT)) AS DOUBLE) / 1e6 AS hazard
    FROM risk
    """,
)


_reg(
    "agg_uptime",
    lambda s, d: agg.agg_uptime(events_us(s, d)),
    # the busy-span sweep (agg_busy_spans oracle) rolled up per type;
    # share = busy/(last-first) on the device
    """
    WITH t AS (
      SELECT event_type, user_id, epoch_us(ts) AS tu, event_id FROM events),
    m AS (
      SELECT event_type, user_id, tu, event_id,
             CASE WHEN lag(tu) OVER w IS NULL THEN 1
                  WHEN tu - lag(tu) OVER w >= 1800000000 THEN 1
                  ELSE 0 END AS ns
      FROM t
      WINDOW w AS (PARTITION BY event_type, user_id ORDER BY tu, event_id)),
    sgrp AS (
      SELECT event_type, user_id, tu,
             sum(ns) OVER (PARTITION BY event_type, user_id
                           ORDER BY tu, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM m),
    sess AS (
      SELECT event_type, user_id, sid,
             CAST(min(tu) AS BIGINT) AS s_start,
             CAST(max(tu) + 1 AS BIGINT) AS s_end
      FROM sgrp GROUP BY 1, 2, 3),
    sweep AS (
      SELECT event_type, user_id, sid, s_start, s_end,
             CASE WHEN max(s_end) OVER wp IS NULL THEN 1
                  WHEN s_start > max(s_end) OVER wp THEN 1
                  ELSE 0 END AS opens
      FROM sess
      WINDOW wp AS (PARTITION BY event_type
                    ORDER BY s_start, s_end, user_id, sid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    spans AS (
      SELECT event_type, s_start, s_end,
             CAST(sum(opens) OVER (PARTITION BY event_type
               ORDER BY s_start, s_end, user_id, sid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS span_id
      FROM sweep),
    sp AS (
      SELECT event_type, span_id,
             min(s_start) AS span_start, max(s_end) AS span_end
      FROM spans GROUP BY 1, 2),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(span_end - span_start) AS BIGINT) AS busy_us,
             CAST(max(span_end - span_start) AS BIGINT) AS max_span_us,
             CAST(min(span_start) AS BIGINT) AS t0,
             CAST(max(span_end) AS BIGINT) AS t1
      FROM sp GROUP BY 1)
    SELECT event_type, n_spans, busy_us, max_span_us,
           CAST((2000000 * CAST(busy_us AS HUGEINT) + (t1 - t0))
                // (2 * CAST(t1 - t0 AS HUGEINT)) AS DOUBLE) / 1e6
             AS busy_share
    FROM g
    """,
)


_reg(
    "agg_seasonal_mk",
    lambda s, d: agg.agg_seasonal_mk(events_us(s, d)),
    # stratified pair arithmetic, summed across hour-of-day strata; same
    # exact-int S/var18 and one-float-expression z as agg_mann_kendall
    f"""
    WITH base AS (
      SELECT event_type,
             ((epoch_us(ts) // {HOUR_US}) % 24 + 24) % 24 AS hod,
             epoch_us(ts) AS ts_us, event_id,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events),
    s AS (
      SELECT a.event_type,
             CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM base a JOIN base b
        ON a.event_type = b.event_type AND a.hod = b.hod
       AND (a.ts_us < b.ts_us
            OR (a.ts_us = b.ts_us AND a.event_id < b.event_id))
      GROUP BY 1),
    n AS (
      SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n
      FROM base GROUP BY 1, 2),
    ties AS (
      SELECT event_type, hod,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
      FROM (SELECT event_type, hod, x, CAST(count(*) AS BIGINT) AS t
            FROM base GROUP BY 1, 2, 3)
      GROUP BY 1, 2),
    var AS (
      SELECT n.event_type,
             CAST(sum(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie18)
                  AS BIGINT) AS var18,
             CAST(sum(n.n) AS BIGINT) AS n
      FROM n JOIN ties ON n.event_type = ties.event_type
                      AND n.hod = ties.hod
      GROUP BY 1),
    g AS (
      SELECT var.event_type, var.n,
             CAST(coalesce(s.s_stat, 0) AS BIGINT) AS s_stat, var.var18
      FROM var LEFT JOIN s ON var.event_type = s.event_type)
    SELECT event_type, n, s_stat, var18,
           CASE WHEN var18 <= 0 THEN NULL
                WHEN s_stat > 0
                  THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var18 / 18.0)
                WHEN s_stat < 0
                  THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var18 / 18.0)
                ELSE 0.0 END AS z
    FROM g
    """,
)


_reg(
    "agg_eta_squared",
    lambda s, d: agg.agg_eta_squared(events_us(s, d)),
    # identical arithmetic shape: exact-int sufficient stats, per-stratum
    # doubles folded in hod order (list(ORDER BY) + list_reduce = the same
    # IEEE chain as array_sort + aggregate), floor device at 6 dp
    f"""
    WITH base AS (
      SELECT event_type,
             ((epoch_us(ts) // {HOUR_US}) % 24 + 24) % 24 AS hod,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events),
    cells AS (
      SELECT event_type, hod,
             sum(CAST(x AS HUGEINT)) AS s_g,
             CAST(count(*) AS BIGINT) AS n_g
      FROM base GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS s,
             sum(CAST(x AS HUGEINT) * x) AS t
      FROM base GROUP BY 1),
    folded AS (
      SELECT event_type,
             list_reduce(
               list_prepend(0.0,
                 list(CAST(s_g * s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
                      ORDER BY hod)),
               (acc, v) -> acc + v) AS a
      FROM cells GROUP BY 1)
    SELECT tot.event_type, tot.n,
           CAST(tot.s AS BIGINT) AS sum_c,
           CAST(tot.t AS BIGINT) AS sumsq_c,
           CASE WHEN CAST(tot.n AS DOUBLE) * CAST(tot.t AS DOUBLE)
                     - CAST(tot.s * tot.s AS DOUBLE) > 0
                THEN floor((CAST(tot.n AS DOUBLE) * folded.a
                            - CAST(tot.s * tot.s AS DOUBLE))
                           / (CAST(tot.n AS DOUBLE) * CAST(tot.t AS DOUBLE)
                              - CAST(tot.s * tot.s AS DOUBLE))
                           * 1e6 + 0.5) / 1e6
           END AS eta_sq
    FROM tot JOIN folded ON tot.event_type = folded.event_type
    """,
)


_reg(
    "agg_kruskal_wallis",
    lambda s, d: agg.agg_kruskal_wallis(events_us(s, d)),
    # same devices: half-unit exact rank sums off the value-count spine,
    # per-type doubles folded in type order, floor device for H and the
    # 4dp mean ranks
    """
    WITH vc AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS x, event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    pv AS (
      SELECT x, CAST(sum(c) AS BIGINT) AS t FROM vc GROUP BY 1),
    rk AS (
      SELECT x, t,
             CAST(coalesce(sum(t) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum0
      FROM pv),
    per_g AS (
      SELECT vc.event_type,
             CAST(count(*) AS BIGINT) AS n_values,
             CAST(sum(vc.c) AS BIGINT) AS n_g,
             sum(CAST(vc.c AS HUGEINT) * (2 * rk.cum0 + rk.t + 1)) AS r2_g
      FROM vc JOIN rk ON vc.x = rk.x
      GROUP BY 1),
    ties AS (
      SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tie3,
             CAST(sum(t) AS BIGINT) AS n
      FROM pv),
    folded AS (
      SELECT
        list_reduce(
          list_prepend(0.0,
            list(CAST(r2_g * r2_g AS DOUBLE) / CAST(n_g AS DOUBLE)
                 ORDER BY event_type)),
          (acc, v) -> acc + v) AS s4,
        CAST(count(*) AS BIGINT) AS k
      FROM per_g)
    SELECT p.event_type, p.n_g,
           floor(CAST(p.r2_g AS DOUBLE) / (2.0 * CAST(p.n_g AS DOUBLE))
                 * 1e4 + 0.5) / 1e4 AS mean_rank,
           t.n, f.k, CAST(t.tie3 AS BIGINT) AS tie3,
           CASE WHEN 1.0 - CAST(t.tie3 AS DOUBLE)
                      / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n) > 0
                THEN floor(
                  (12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1)) * (f.s4 / 4.0)
                   - 3.0 * (t.n + 1))
                  / (1.0 - CAST(t.tie3 AS DOUBLE)
                     / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n))
                  * 1e6 + 0.5) / 1e6
           END AS h_stat
    FROM per_g p, folded f, ties t
    """,
)


_reg(
    "agg_welch_t",
    lambda s, d: agg.agg_welch_t(events_us(s, d)),
    # identical arithmetic: exact cents sufficient stats, the SAME fixed
    # IEEE double chain for mean/var/t/df, floor device at 6 dp, signed
    # device for the exact-rational mean diff
    """
    WITH g AS (
      SELECT
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        sum(CASE WHEN event_type = 'click'
                 THEN CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) END) AS s_a,
        sum(CASE WHEN event_type = 'click'
                 THEN CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                      * CAST(round(value * 100) AS BIGINT) END) AS t_a,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) END) AS s_b,
        sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                      * CAST(round(value * 100) AS BIGINT) END) AS t_b
      FROM events WHERE event_type IN ('click', 'purchase')),
    v AS (
      SELECT n_a, n_b, s_a, s_b,
             CAST(n_a * t_a - s_a * s_a AS DOUBLE)
               / CAST(CAST(n_a AS HUGEINT) * n_a * (n_a - 1) AS DOUBLE) AS va_n,
             CAST(n_b * t_b - s_b * s_b AS DOUBLE)
               / CAST(CAST(n_b AS HUGEINT) * n_b * (n_b - 1) AS DOUBLE) AS vb_n
      FROM g)
    SELECT n_a, n_b,
           (CASE WHEN s_a * n_b - s_b * n_a < 0 THEN -1 ELSE 1 END)
           * CAST((2000000 * abs(s_a * n_b - s_b * n_a)
                   + 100 * CAST(n_a AS HUGEINT) * n_b)
                  // (2 * 100 * CAST(n_a AS HUGEINT) * n_b) AS DOUBLE) / 1e6
             AS mean_diff_usd,
           CASE WHEN n_a > 1 AND n_b > 1 AND va_n + vb_n > 0 THEN
             floor((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                    - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                   / sqrt(va_n + vb_n) * 1e6 + 0.5) / 1e6
           END AS t_stat,
           CASE WHEN n_a > 1 AND n_b > 1 AND va_n + vb_n > 0 THEN
             floor((va_n + vb_n) * (va_n + vb_n)
                   / (va_n * va_n / CAST(n_a - 1 AS DOUBLE)
                      + vb_n * vb_n / CAST(n_b - 1 AS DOUBLE)) * 1e6 + 0.5)
               / 1e6
           END AS df
    FROM v
    """,
)


def _ljung_box_oracle(max_lag: int = 5) -> str:
    lag_cols = ",\n             ".join(
        f"lag(x, {k}) OVER (PARTITION BY event_type "
        f"ORDER BY ts_us, event_id) AS l{k}"
        for k in range(1, max_lag + 1)
    )
    pair_aggs = ",\n             ".join(
        f"sum(CAST(x AS HUGEINT) * l{k}) AS sxy{k},\n"
        f"             sum(CASE WHEN l{k} IS NOT NULL "
        f"THEN CAST(x AS HUGEINT) END) AS sx{k},\n"
        f"             sum(CAST(l{k} AS HUGEINT)) AS sy{k},\n"
        f"             CAST(count(l{k}) AS BIGINT) AS c{k}"
        for k in range(1, max_lag + 1)
    )
    rho_cols = ",\n             ".join(
        f"CAST(CAST(n AS HUGEINT) * n * sxy{k}"
        f" - CAST(n AS HUGEINT) * s * (sx{k} + sy{k})"
        f" + CAST(c{k} AS HUGEINT) * s * s AS DOUBLE)"
        f" / CAST(CAST(n AS HUGEINT) * den AS DOUBLE) AS rho{k}_raw"
        for k in range(1, max_lag + 1)
    )
    q_sum = " + ".join(
        f"rho{k}_raw * rho{k}_raw / (CAST(n AS DOUBLE) - {k}.0)"
        for k in range(1, max_lag + 1)
    )
    rho_out = ",\n           ".join(
        f"CASE WHEN n > {max_lag} AND den > 0 THEN "
        f"floor(rho{k}_raw * 1e6 + 0.5) / 1e6 END AS rho{k}"
        for k in range(1, max_lag + 1)
    )
    return f"""
    WITH r AS (
      SELECT event_type, epoch_us(ts) AS ts_us, event_id,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events),
    lagged AS (
      SELECT event_type, x,
             {lag_cols}
      FROM r),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS s,
             sum(CAST(x AS HUGEINT) * x) AS t,
             {pair_aggs}
      FROM lagged GROUP BY 1),
    d AS (
      SELECT *, CAST(n AS HUGEINT) * t - s * s AS den FROM g),
    rho AS (
      SELECT event_type, n, den,
             {rho_cols}
      FROM d)
    SELECT event_type, n,
           {rho_out},
           CASE WHEN n > {max_lag} AND den > 0 THEN
             floor(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
                   * ({q_sum}) * 1e6 + 0.5) / 1e6
           END AS q_stat
    FROM rho
    """


_reg(
    "agg_ljung_box",
    lambda s, d: agg.agg_ljung_box(events_us(s, d)),
    # the n²-scaled centering device: every rho_k is one double from
    # exact HUGEINT sums, Q folds rho²/(n−k) in WRITTEN order
    _ljung_box_oracle(),
)
