"""Behavioral event analytics (SURVEY.md §2.B extensions): funnel
conversion, cohort retention, activity streaks — the product-analytics
rollups an events table exists to answer.

All three follow the engine's window discipline: one shuffle on the
series key (user_id), chained window passes REUSE that sort (Catalyst
plans consecutive same-partitioning windows over a single Exchange), and
the final rollup aggregates bounded group keys. Derived values are exact
integer µs arithmetic, so every op is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kdb_spark.analytics.exact import floor_div_sql
from kdb_spark.tables import DAY_US


def agg_funnel(events: DataFrame) -> DataFrame:
    """Ordered funnel per user: first 'view', then the first 'click' AFTER
    it, then the first 'purchase' after that. One row per user with the
    three stage timestamps (null = never reached) and the depth reached.

    Three chained window selects over the SAME user partition — one
    Exchange total; each stage's min is conditional on the previous
    stage's timestamp, which a flat conditional aggregate can't express.
    """
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w)
    stage1 = events.select("user_id", "event_type", "ts_us", t1.alias("t1_us"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_us") > F.col("t1_us")),
            F.col("ts_us"),
        )
    ).over(w)
    stage2 = stage1.select("*", t2.alias("t2_us"))
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("t2_us")),
            F.col("ts_us"),
        )
    ).over(w)
    stage3 = stage2.select("*", t3.alias("t3_us"))
    reached = (
        F.when(F.col("t3_us").isNotNull(), 3)
        .when(F.col("t2_us").isNotNull(), 2)
        .when(F.col("t1_us").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        stage3.groupBy("user_id")
        .agg(
            F.min("t1_us").alias("t1_us"),
            F.min("t2_us").alias("t2_us"),
            F.min("t3_us").alias("t3_us"),
        )
        .select(
            "user_id",
            "t1_us",
            "t2_us",
            "t3_us",
            reached.cast("long").alias("reached"),
        )
    )


def retention_cohort(events: DataFrame) -> DataFrame:
    """Cohort retention matrix: users grouped by their first active day,
    counted per day-offset of later activity — the table behind every
    retention curve.

    Two shuffles at any scale: the user window (first day) and the
    (cohort, offset) rollup; day arithmetic is exact integer µs.
    """
    day = (F.col("ts_us") - F.col("ts_us") % F.lit(DAY_US)).alias("day_us")
    w = Window.partitionBy("user_id")
    acts = events.select("user_id", day).distinct()
    with_cohort = acts.select(
        "user_id",
        "day_us",
        F.min("day_us").over(w).alias("cohort_us"),
    )
    return (
        with_cohort.groupBy(
            "cohort_us",
            ((F.col("day_us") - F.col("cohort_us")) / F.lit(DAY_US))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select("cohort_us", "day_offset", F.col("n_users").cast("long").alias("n_users"))
    )


def win_streaks(events: DataFrame) -> DataFrame:
    """Longest consecutive-day activity streak per user — gaps-and-islands:
    within a user's distinct active days, day − rank·1d is constant inside
    a consecutive run, so a single grouping on that anchor sizes every
    island. One user shuffle (window) + one bounded rollup.
    """
    day = (F.col("ts_us") - F.col("ts_us") % F.lit(DAY_US)).alias("day_us")
    acts = events.select("user_id", day).distinct()
    w = Window.partitionBy("user_id").orderBy("day_us")
    anchored = acts.select(
        "user_id",
        "day_us",
        (F.col("day_us") - F.row_number().over(w) * F.lit(DAY_US)).alias("anchor"),
    )
    islands = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len_days")
    )
    return islands.groupBy("user_id").agg(
        F.max("len_days").cast("long").alias("max_streak_days"),
        F.sum("len_days").cast("long").alias("n_active_days"),
    )


def agg_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over event types: for each
    (prev → next) pair, how often it occurs and its conditional probability
    — the session-flow / next-action model product analytics builds on.

    One user-partition window (lag) reusing the engine's standard series
    sort, then a bounded |types|² rollup; the row-count total per prev
    arrives from a second tiny window over the already-aggregated matrix,
    not a re-scan. prob is a single int/int division — engine-exact.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    matrix = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = Window.partitionBy("prev_type")
    t = matrix.select(
        "prev_type",
        "next_type",
        "n",
        F.sum("n").over(total).alias("row_total"),
    )
    # prob = n/row_total: exact integer ratio rounded half-up to 6 dp in
    # integer space (r11 hardening — never round(double, 6))
    p6 = F.expr(
        floor_div_sql(
            "2000000 * CAST(n AS DECIMAL(38,0)) + row_total",
            "2 * CAST(row_total AS DECIMAL(38,0))",
        )
    )
    return t.select(
        "prev_type",
        "next_type",
        "n",
        (p6.cast("double") / F.lit(1e6)).alias("prob"),
    )


def agg_cohort_ltv(events: DataFrame) -> DataFrame:
    """Cohort value curves: cumulative value per first-active-day cohort by
    day offset — the LTV table behind "how much has the Jan-3 cohort
    generated by day N" (retention_cohort counts heads; this sums value).

    Same two-shuffle shape as retention_cohort (user window for the
    cohort day, then the bounded (cohort, offset) rollup) plus one tiny
    window over the already-aggregated matrix for the running total —
    exact bigint cents end to end, so the cumulative column is
    order-independent.
    """
    from kdb_spark.tables import cents

    day = (F.col("ts_us") - F.col("ts_us") % F.lit(DAY_US)).alias("day_us")
    w = Window.partitionBy("user_id")
    staged = events.select(
        "user_id", day, cents("value").alias("c")
    ).select(
        "user_id", "day_us", "c", F.min("day_us").over(w).alias("cohort_us")
    )
    per_offset = staged.groupBy(
        "cohort_us",
        ((F.col("day_us") - F.col("cohort_us")) / F.lit(DAY_US))
        .cast("long")
        .alias("day_offset"),
    ).agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("value_c"),
    )
    wc = (
        Window.partitionBy("cohort_us")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_offset.select(
        "cohort_us", "day_offset", "n_users", "value_c",
        F.sum("value_c").over(wc).cast("long").alias("cum_value_c"),
    )


def agg_assoc_rules(
    orders: DataFrame,
    lineitem: DataFrame,
    min_pair: int = 3,
    k: int = 50,
    max_basket: int | None = None,
) -> DataFrame:
    """Market-basket association rules over order baskets: for every part
    pair co-bought in >= ``min_pair`` distinct orders, emit support,
    directional confidence and lift — the co-occurrence mining rollup
    (recommendations, curriculum pairing) a basket table exists for.

    Shape: the (order, part) incidence is deduped map-side, the pair table
    comes from ONE self-equi-join on the order key (fan-out bounded by
    basket size squared), and the two per-item count joins broadcast the
    item-count table (|parts| rows, small relative to pairs). All metrics
    derive from exact bigint counts with one shared double expression per
    column; the final top-k orders by the integer pair count with the
    (a, b) key as the total tie-break, so the cut is engine-independent.

    ``max_basket`` is the 100 TB skew guard: when set, each basket keeps
    only its ``max_basket`` lowest part keys (one row_number window on the
    incidence — deterministic, so reruns drop the same rows) before the
    PAIR self-join, bounding any pathological mega-basket's fan-out at
    max_basket² instead of |basket|². The per-item counts (confidence/
    lift denominators) always come from the UNcapped incidence — a
    linear-cost aggregate. The capped output is therefore a LOWER BOUND
    approximation: any pair touching a capped basket loses that basket's
    contribution to n_both (even if the pair also occurs in untouched
    baskets), so its support/confidence/lift deflate and it can drop
    below the min_pair or top-k cuts; pairs formed ONLY in untouched
    baskets keep exact n_both but uncapped denominators. None (the
    oracle-checked default at test scale, where TPC-H baskets are ≤7
    lines) computes exactly.
    """
    op = (
        orders.select("o_orderkey")
        .join(
            lineitem.select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(F.col("o_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    n_orders = orders.select(F.count(F.lit(1)).alias("n_total"))
    # item marginals from the FULL incidence (linear; the quadratic risk
    # the cap guards is only the pair self-join below)
    item = op.groupBy("p").agg(F.count(F.lit(1)).alias("n_item"))
    pair_src = op
    if max_basket is not None:
        from kdb_spark.analytics import cap_per_group

        pair_src = cap_per_group(op, "o", "p", max_basket)
    pairs = (
        pair_src.select(F.col("o"), F.col("p").alias("a"))
        .join(pair_src.select("o", F.col("p").alias("b")), "o")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_pair)
    )
    # support/conf/lift are ratios of exact integer counts, rounded
    # half-up to 6 dp in integer space (r11 hardening — never
    # round(double, 6)); lift's cross-products widen to decimal(38,0)
    def _r6(num_sql: str, den_sql: str) -> F.Column:
        return F.expr(
            floor_div_sql(
                f"2000000 * CAST({num_sql} AS DECIMAL(38,0)) + ({den_sql})",
                f"2 * CAST({den_sql} AS DECIMAL(38,0))",
            )
        ).cast("double") / F.lit(1e6)

    return (
        pairs.join(
            F.broadcast(item.select(F.col("p").alias("a"), F.col("n_item").alias("n_a"))),
            "a",
        )
        .join(
            F.broadcast(item.select(F.col("p").alias("b"), F.col("n_item").alias("n_b"))),
            "b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "a",
            "b",
            F.col("n_both").cast("long").alias("n_both"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            _r6("n_both", "n_total").alias("support"),
            _r6("n_both", "n_a").alias("conf_a_b"),
            _r6("n_both", "n_b").alias("conf_b_a"),
            _r6(
                "CAST(n_both AS DECIMAL(38,0)) * n_total",
                "CAST(n_a AS DECIMAL(38,0)) * n_b",
            ).alias("lift"),
        )
        .orderBy(F.desc("n_both"), "a", "b")
        .limit(k)
    )


def agg_attribution(events: DataFrame, window_us: int = 7 * DAY_US) -> DataFrame:
    """Last-touch attribution census: every 'purchase' is attributed to
    the user's most recent 'click' within the lookback window; reported
    per purchase-day as n_purchases / n_attributed / attribution rate —
    the conversion-credit rollup marketing pipelines run nightly
    (agg_funnel counts ordered step reach; this binds each conversion to
    its one credited touch and censuses the coverage).

    Spark shape: union-and-carry as-of (the join_asof discipline — no
    per-purchase probe join): tag both event kinds, ONE (user) series
    sort, carry the last click µs forward with last(ignorenulls), then
    the window guard and a day census. Exact integer µs throughout; the
    rate rides the unsigned device at 6 dp.

    Scale shape: one Exchange on user_id for the carry, one hash agg to
    ≤|days| rows — same two-stage posture as agg_user_churn.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.col("ts_us").alias("click_us"),
        F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id"),
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", F.lit(None).cast("long").alias("click_us"),
        F.lit(1).alias("side"), "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        clicks.unionByName(buys)
        .withColumn("last_click_us", F.last("click_us", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
    )
    attributed = F.when(
        F.col("last_click_us").isNotNull()
        & (F.col("ts_us") - F.col("last_click_us") <= F.lit(window_us)),
        1,
    ).otherwise(0)
    g = (
        carried.select(
            F.expr(f"ts_us div {DAY_US}").alias("day"), attributed.alias("a")
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("a").cast("long").alias("n_attributed"),
        )
    )
    r6 = F.expr(
        floor_div_sql(
            "2000000 * CAST(n_attributed AS DECIMAL(38,0)) + n_purchases",
            "2 * CAST(n_purchases AS DECIMAL(38,0))",
        )
    )
    return g.select(
        F.col("day").cast("long").alias("day"),
        "n_purchases",
        "n_attributed",
        (r6.cast("double") / F.lit(1e6)).alias("attribution_rate"),
    )
