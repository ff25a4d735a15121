"""Joins (SURVEY.md §2.B) — the reference has no cross-series joins; the only
join-like behavior is the spine join inside Get/Find (`dbase/dbase.go:209-227`).

Strategy notes (100 TB posture):
- dimension joins broadcast explicitly (`F.broadcast`) — no shuffle of the fact;
- fact-fact equi joins shuffle on the key and rely on AQE for skew;
- as-of is a union + running last() — ONE shuffle on the series key, never a
  per-row subquery;
- interval joins are bucketized into equi joins (explode the probe into the
  O(interval/bucket) covering buckets) — never a broadcast-nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kdb_spark.tables import MIN_US, cents


def join_enrich_broadcast(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Fact ⋈ broadcast dims: orders enriched with customer→nation→region.

    The dims (1.5k / 25 / 5 rows; a few MB even at 100 TB fact scale) are
    broadcast — the fact table is never shuffled.
    """
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("sum_price_c"),
        )
    )


def join_equi_shuffle(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Fact ⋈ fact on l_orderkey — shuffle (sort-merge / shuffled-hash by
    AQE's choice), revenue per order priority."""
    revenue = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(revenue).alias("revenue_c"),
        )
    )


def join_skew_salted(
    lineitem: DataFrame,
    orders: DataFrame,
    salts: int = 8,
    hot_threshold: int = 2_000_000,
) -> DataFrame:
    """Skew-hardened fact ⋈ fact, two-path: same result as
    `join_equi_shuffle`, but keys whose probe-side row count would
    overwhelm one reducer take a salted join (probe picks a deterministic
    `pmod(xxhash64(row-cols), salts)`, build replicates across all salts
    via `explode(sequence)`), while everything else takes the plain equi
    join.

    A blanket salt pays build-side ×salts shuffle volume on EVERY key —
    measured super-linear under the scale probe once the inflated sort
    spills — so salting is priced only where it buys anything (the
    production pattern). Hot detection is an exact per-key count: one
    map-side-combined shuffle of |keys| rows, deterministic at any
    parallelism (sampling is not — its output depends on partition
    layout). The hot set is broadcast: keys over the threshold are at most
    n/threshold, tiny by construction. AQE's skew-join split is the
    runtime complement; this is the plan-time form that also covers
    shuffled-hash and bucketed joins.
    """
    hot_keys = (
        lineitem.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= hot_threshold)
        .select("l_orderkey", F.lit(True).alias("_hot"))
    )
    li = lineitem.join(F.broadcast(hot_keys), "l_orderkey", "left")
    od = orders.join(
        F.broadcast(hot_keys.withColumnRenamed("l_orderkey", "o_orderkey")),
        "o_orderkey",
        "left",
    )
    revenue = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))

    def slim(joined: DataFrame) -> DataFrame:
        return joined.select(
            F.col("o_orderpriority"), revenue.alias("_rev_c")
        )

    cold = slim(
        li.filter(F.col("_hot").isNull()).join(
            od.filter(F.col("_hot").isNull()),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    hot_li = li.filter(F.col("_hot")).withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(salts))
    )
    hot_od = od.filter(F.col("_hot")).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    hot = slim(
        hot_li.join(
            hot_od,
            (hot_li.l_orderkey == hot_od.o_orderkey)
            & (hot_li.salt == hot_od.salt),
        )
    )
    return (
        cold.unionByName(hot)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("_rev_c").alias("revenue_c"),
        )
    )


def join_asof(events: DataFrame) -> DataFrame:
    """As-of join: for each 'click', the latest 'error' value of the same
    user at-or-before the click (`SURVEY.md §2.B Joins`).

    Union-and-carry: tag both sides, sort within user by (ts, side), carry
    the last error value forward with last(ignorenulls). One shuffle on
    user_id; no per-probe scan — this is how an as-of stays O(n log n) at
    100 TB. Errors are pre-deduped per (user, µs) by last event_id so ties
    are deterministic.
    """
    errors = (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts_us")
        .agg(F.max_by("value", "event_id").alias("err_value"))
        .select("user_id", "ts_us", "err_value", F.lit(0).alias("side"),
                F.lit(None).cast("long").alias("event_id"))
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us",
        F.lit(None).cast("double").alias("err_value"),
        F.lit(1).alias("side"), "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        errors.unionByName(clicks)
        .withColumn("asof_value", F.last("err_value", ignorenulls=True).over(w))
        .filter((F.col("side") == 1) & F.col("asof_value").isNotNull())
        .select("event_id", "user_id", "asof_value")
    )


def join_interval(events: DataFrame, width_us: int = 10 * MIN_US) -> DataFrame:
    """Interval join: clicks within [error_ts, error_ts + width) of the same
    user, counted per error event.

    Bucketized: probe intervals explode into their ≤2 covering buckets and
    the join is a plain equi join on (user, bucket) + residual range filter —
    the scalable alternative to a nested-loop range join (bucket width =
    interval width bounds the blow-up to 2×).
    """
    bkt = lambda c: (c - c % F.lit(width_us)).cast("long")  # noqa: E731
    errors = (
        events.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", F.col("ts_us").alias("err_us"))
        .withColumn(
            "bucket",
            F.explode(
                F.array(bkt(F.col("err_us")), bkt(F.col("err_us")) + F.lit(width_us))
            ),
        )
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("click_us")
    ).withColumn("bucket", bkt(F.col("click_us")))
    return (
        errors.join(clicks, ["user_id", "bucket"])
        .filter(
            (F.col("click_us") >= F.col("err_us"))
            & (F.col("click_us") < F.col("err_us") + F.lit(width_us))
        )
        .groupBy("event_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )


def join_multiway(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5-shaped 6-table join: local-supplier revenue per nation in one
    region (customer and supplier in the same nation).

    Plan shape for 100 TB: the two facts (lineitem, orders) meet in ONE
    shuffle join on orderkey; every dimension path (supplier→nation→region,
    customer) is broadcast, so neither fact is shuffled more than once and
    the region filter prunes before anything widens.
    """
    revenue = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    nr = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    sup = supplier.join(
        F.broadcast(nr), supplier.s_nationkey == nr.n_nationkey
    ).select("s_suppkey", "n_name", "s_nationkey")
    co = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"),
    ).select("o_orderkey", "c_nationkey")
    return (
        lineitem.join(F.broadcast(sup), lineitem.l_suppkey == sup.s_suppkey)
        .join(co, F.col("l_orderkey") == co.o_orderkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("revenue_c"))
    )


def join_semi(customer: DataFrame, orders: DataFrame, min_price: float) -> DataFrame:
    """Left-semi: customers having ≥1 order above min_price. Semi joins
    short-circuit (no fanout, no dedup pass)."""
    big = orders.filter(F.col("o_totalprice") > min_price)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


def join_anti(customer: DataFrame, orders: DataFrame, min_price: float) -> DataFrame:
    """Left-anti: customers with NO order above min_price."""
    big = orders.filter(F.col("o_totalprice") > min_price)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


def join_asof_tolerance(events: DataFrame, tol_us: int = 30 * MIN_US) -> DataFrame:
    """As-of join with max staleness: latest same-user 'error' at-or-before
    each 'click', but only if it is at most ``tol_us`` old — the kdb-style
    `aj` with a tolerance window.

    Same union-and-carry shape as `join_asof` (one shuffle on user_id, no
    per-probe scan); the carried value is a (ts, value) struct so the
    staleness test is a plain filter afterwards.
    """
    errors = (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts_us")
        .agg(F.max_by("value", "event_id").alias("err_value"))
        .select(
            "user_id", "ts_us",
            F.struct(F.col("ts_us").alias("ets"), F.col("err_value").alias("ev")).alias("err"),
            F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id"),
        )
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us",
        F.lit(None).cast("struct<ets:long,ev:double>").alias("err"),
        F.lit(1).alias("side"), "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        errors.unionByName(clicks)
        .withColumn("carried", F.last("err", ignorenulls=True).over(w))
        .filter(
            (F.col("side") == 1)
            & F.col("carried").isNotNull()
            & (F.col("ts_us") - F.col("carried.ets") <= tol_us)
        )
        .select(
            "event_id", "user_id",
            F.col("carried.ev").alias("asof_value"),
            (F.col("ts_us") - F.col("carried.ets")).alias("staleness_us"),
        )
    )


def join_asof_forward(events: DataFrame) -> DataFrame:
    """Forward as-of join: for each 'click', the EARLIEST 'error' value of
    the same user at-or-after the click — the time-reversed twin of
    :func:`join_asof` (reaction lookup instead of cause lookup).

    Union-and-carry shape, mirrored — in ONE scan (r10; the former
    two-branch union read events twice and pre-shuffled the error side
    through a (user, ts) agg, 2× a sub-second baseline): both types come
    out of a single `isin` filter, sides are tagged map-side, and errors
    dedupe per (user, µs) to the max event_id purely by WINDOW ORDER —
    at equal ts, errors sort after clicks (at-or-after includes same-µs
    errors) and descending event_id among themselves, so the
    ``first(ignorenulls)`` carry over [current, unbounded following)
    picks exactly the last-written error value. One scan, one shuffle on
    user_id; O(n log n) at any scale, no per-probe scan.
    """
    t = events.filter(F.col("event_type").isin("click", "error")).select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(F.col("event_type") == "error", F.col("value")).alias(
            "err_value"
        ),
        F.when(F.col("event_type") == "error", F.lit(2))
        .otherwise(F.lit(1))
        .alias("side"),
        # max-event_id error wins ties at equal (user, ts): errors order
        # by -event_id so the carry's first() sees the last write first
        F.when(F.col("event_type") == "error", -F.col("event_id"))
        .otherwise(F.lit(0))
        .alias("tie"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side", "tie")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        t.withColumn("next_value", F.first("err_value", ignorenulls=True).over(w))
        .filter((F.col("side") == 1) & F.col("next_value").isNotNull())
        .select("event_id", "user_id", "next_value")
    )


def join_window(events: DataFrame, width_us: int = 10 * MIN_US) -> DataFrame:
    """Window join — kdb's ``wj``: for each 'error' probe, aggregate the
    'click' values of the same user inside [probe-w, probe+w). Every probe
    appears in the output (zero matches → count 0, null avg), matching wj's
    row-per-probe contract.

    Same bucketization as :func:`join_interval`: probes explode into the ≤3
    w-width buckets covering their 2w window, clicks land in their single
    bucket, and the join is a plain equi join on (user, bucket) with a
    residual range filter — never a nested-loop range join. A click matches
    a probe at most once (the click's one bucket meets at most one of the
    probe's bucket rows), so the count needs no dedup. One shuffle for the
    join, one for the per-probe aggregate.
    """
    w = F.lit(width_us)
    bkt = lambda c: (c - c % w).cast("long")  # noqa: E731
    probes = (
        events.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", F.col("ts_us").alias("err_us"))
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    bkt(F.col("err_us") - w), bkt(F.col("err_us") + w), w
                )
            ),
        )
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts_us").alias("click_us"),
            F.col("value").alias("click_v"),
        )
        .withColumn("bucket", bkt(F.col("click_us")))
    )
    in_win = (
        (F.col("click_us") >= F.col("err_us") - w)
        & (F.col("click_us") < F.col("err_us") + w)
    )
    # n_in_win counts rows gated ONLY by the window predicate (click_us is
    # never null for a matched click), so an in-window click whose value is
    # NULL still counts; avg_in_win averages the values that exist.
    return (
        probes.join(clicks, ["user_id", "bucket"], "left")
        .withColumn("hit", F.when(in_win, F.col("click_us")))
        .withColumn("hit_v", F.when(in_win, F.col("click_v")))
        .groupBy("event_id", "user_id")
        .agg(
            F.count("hit").alias("n_in_win"),
            F.round(F.avg("hit_v"), 4).alias("avg_in_win"),
        )
    )


def join_nearest(events: DataFrame) -> DataFrame:
    """Nearest-neighbor time join: for each 'click', the 'error' of the same
    user with the smallest |Δts| in either direction (ties → the earlier,
    i.e. at-or-before, error). The bidirectional completion of
    :func:`join_asof` / :func:`join_asof_forward`.

    One union-and-carry pass: errors (side 0) and clicks (side 1) sort
    together per user; the SAME user-partition feeds a backward
    ``last(ignorenulls)`` carry (ascending sort) and a forward carry
    (descending sort) of the (ts, value) struct, then a map-only
    min-distance pick. ONE shuffle on user_id total — the per-(user, µs)
    error dedup (oracle rule: max event_id wins) is folded into the carry
    sort orders instead of costing its own groupBy Exchange: ascending
    event_id last, so the backward carry lands on the max-event_id error of
    a tied slot; the descending window keeps event_id ASCENDING as its
    final key so the forward carry does too. Same-µs errors sort before the
    click ascending (after it descending), so they arrive via the backward
    carry at distance 0 and never as "future". O(n log n) per series at any
    scale — never the per-probe scan the naive LATERAL form implies.
    """
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts_us",
        F.struct(F.col("ts_us").alias("ets"), F.col("value").alias("v")).alias("err"),
        F.lit(0).alias("side"),
        "event_id",
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us",
        F.lit(None).cast("struct<ets:bigint,v:double>").alias("err"),
        F.lit(1).alias("side"), "event_id",
    )
    asc_w = Window.partitionBy("user_id").orderBy("ts_us", "side", "event_id")
    desc_w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("side").desc(), F.col("event_id").asc()
    )
    back = F.last("err", ignorenulls=True).over(
        asc_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.last("err", ignorenulls=True).over(
        desc_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d_back = F.col("ts_us") - F.col("b.ets")
    d_fwd = F.col("f.ets") - F.col("ts_us")
    use_back = F.col("f").isNull() | (F.col("b").isNotNull() & (d_back <= d_fwd))
    return (
        errors.unionByName(clicks)
        .select("*", back.alias("b"), fwd.alias("f"))
        .filter((F.col("side") == 1) & (F.col("b").isNotNull() | F.col("f").isNotNull()))
        .select(
            "event_id",
            "user_id",
            F.when(use_back, F.col("b.v")).otherwise(F.col("f.v")).alias("nearest_value"),
            F.when(use_back, d_back).otherwise(d_fwd).cast("long").alias("dist_us"),
        )
    )


def join_pit(
    facts: DataFrame,
    dim_hist: DataFrame,
    key: str,
    ts_col: str,
) -> DataFrame:
    """Point-in-time (PIT) join: each fact row joins the dimension VERSION
    that was valid at its timestamp — the feature-store / SCD2
    correctness contract (training-serving skew is exactly what happens
    when this join is done wrong: a fact must never see an attribute
    version from its future). ``dim_hist`` carries [valid_from,
    valid_to) ranges with NULL valid_to for open rows, as `sink_scd2`
    writes them.

    Join shape: equi-key + half-open validity range. Catalyst plans the
    equi part as the join key (SortMergeJoin / broadcast when the
    history is small) and the range as a post-join filter — correct
    because SCD2 guarantees at most one valid version per (key, instant),
    so no dedup pass is needed afterwards. Inner semantics: facts with
    no valid version at their instant (before the key first appeared, or
    in a closed gap) drop — the honest PIT contract; left-pad with a
    default version upstream if business logic wants them.

    At 100 TB: history is dimension-sized → broadcast; the fact side
    never shuffles. A fact-sized history (event-sourced dims) would want
    the as-of family (`join_asof`) instead.
    """
    h = dim_hist.alias("h")
    f = facts.alias("f")
    cond = (
        (F.col(f"f.{key}") == F.col(f"h.{key}"))
        & (F.col("h.valid_from") <= F.col(f"f.{ts_col}"))
        & (
            F.col("h.valid_to").isNull()
            | (F.col(f"f.{ts_col}") < F.col("h.valid_to"))
        )
    )
    return f.join(h, cond, "inner").drop(F.col(f"h.{key}"))


def join_interval_overlap(
    a: DataFrame,
    b: DataFrame,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Interval×interval OVERLAP join: every (a, b) pair whose half-open
    µs ranges intersect, with the exact overlap length — the
    sessions-vs-windows workhorse (which user sessions crossed a
    maintenance window; which positions were open during a halt).
    `join_interval` is point-in-interval; this is its range-range
    sibling, and naively it is a cartesian product.

    Scale strategy: DAY-BUCKET BLOCKING — each interval explodes to the
    buckets it covers (executor-side `sequence`, bounded by interval
    length / bucket), candidates equi-join on the bucket, the exact
    predicate (a.start < b.end AND b.start < a.end) filters, and a
    distinct on the final projection removes multi-bucket double-hits.
    The join is bounded by co-bucket density instead of |A|·|B|; pick
    ``bucket_us`` ≈ typical interval length (too small → more replicas,
    too large → denser buckets — the standard blocking trade-off,
    documented not hidden).

    Inputs: ``a`` = (a_id, a_start, a_end), ``b`` = (b_id, b_start,
    b_end), half-open ends. Output adds exact ``overlap_us``.

    Degenerate intervals (end <= start) are EMPTY SETS under half-open
    semantics and are filtered up front (r12 ADVICE): without the guard a
    reversed interval would feed `sequence` a descending bucket range
    (spurious candidates) and a zero-length interval strictly inside a
    partner would pass the strict-inequality predicate and emit an
    overlap_us = 0 pair, contradicting ∅ ∩ X = ∅.
    """
    a = a.filter(F.col("a_end") > F.col("a_start"))
    b = b.filter(F.col("b_end") > F.col("b_start"))
    ea = a.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"a_start div {bucket_us}"),
                F.expr(f"(a_end - 1) div {bucket_us}"),
            )
        ),
    )
    eb = b.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"b_start div {bucket_us}"),
                F.expr(f"(b_end - 1) div {bucket_us}"),
            )
        ),
    )
    j = ea.join(eb, "bucket").filter(
        (F.col("a_start") < F.col("b_end")) & (F.col("b_start") < F.col("a_end"))
    )
    # Dedup the multi-bucket double-hits on the FINAL projection, not on
    # (a_id, b_id): a projection-level distinct is deterministic under any
    # plan / partitioning / survivor choice, and if an id pair ever recurs
    # with different intervals (non-injective a_id) both rows survive —
    # matching the oracle's cartesian instead of keeping an arbitrary one.
    return j.select(
        "a_id",
        "b_id",
        "a_start",
        "a_end",
        "b_start",
        "b_end",
        (
            F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
        ).cast("long").alias("overlap_us"),
    ).distinct()


def join_band(a: DataFrame, b: DataFrame, tol_c: int = 50) -> DataFrame:
    """Value-band join: every (a, b) pair whose integer values sit within
    ``tol_c`` of each other — `join_nearest`'s value-space sibling (that
    op matches in TIME; this matches in PRICE/measure: which purchases
    are priced within 50¢ of a click's value), and naively a cartesian.

    Scale strategy: TOL-BUCKET BLOCKING, the join_interval_overlap
    device turned on values — a pair within tol spans at most adjacent
    width-tol buckets, so exploding ONE side to {k−1, k, k+1} and
    equi-joining on the bucket covers every qualifying pair EXACTLY ONCE
    (the unexploded side sits in one bucket — no dedup pass needed), and
    the join is bounded by per-bucket density instead of |A|·|B|.

    Contract: ``a_c``/``b_c`` are NON-NEGATIVE integer grids (cents
    here). Negative domains would need floor-consistent bucketing on
    both engines (Spark `div` truncates toward zero, DuckDB `//`
    floors) — documented rather than silently wrong.
    """
    ka = F.expr(f"a_c div {tol_c}")
    ea = a.withColumn(
        "bucket", F.explode(F.array(ka - 1, ka, ka + 1))
    )
    eb = b.withColumn("bucket", F.expr(f"b_c div {tol_c}"))
    return (
        ea.join(eb, "bucket")
        .filter(F.abs(F.col("a_c") - F.col("b_c")) <= tol_c)
        .drop("bucket")
    )


def join_band_topk(
    a: DataFrame, b: DataFrame, tol_c: int = 50, k: int = 3
) -> DataFrame:
    """k-closest value matches: per ``a`` row, the ``k`` nearest ``b``
    rows within ``tol_c`` of its integer value, ranked by |diff| — the
    candidate SHORTLIST form of `join_band` (which keeps one winner).
    Entity resolution and retrieval re-ranking both want the ranked
    candidate set, not just the argmin: the downstream matcher scores
    the shortlist with features the blocking key can't see.

    Scale strategy: identical TOL-BUCKET BLOCKING to `join_band` (one
    side explodes to {k−1, k, k+1} width-tol buckets; every qualifying
    pair lands exactly once), then a per-a_id rank window over the
    CANDIDATE set only — |candidates| ≤ per-bucket density × 3, so the
    sort is bounded by local value density, never |A|·|B|. Deterministic
    tie-break (|diff|, b_id) keeps the shortlist bit-stable cross-engine.

    Same non-negative-grid contract as `join_band` (documented there).
    """
    pairs = join_band(a, b, tol_c=tol_c)
    # HASH-AGG top-k, not a rank window: collect each a_id's candidates,
    # array_sort, slice k — same rows as row_number()<=k bit-for-bit
    # (verified), but the shuffle is a hash aggregate instead of a full
    # per-partition SORT of the candidate table (struct device measured
    # 1.45× faster at sf0.1's 4M candidates; at 100 TB the sort's spill
    # behavior is the difference that matters). Per-key state is bounded by
    # that key's candidate count — the same band-density bound the join
    # itself carries.
    # r16: candidates are PACKED LONGS (diff<<57 | b_id), not structs —
    # numeric order on the pack IS the (|diff|, b_id) lexicographic order
    # (diff ≤ tol < 64 in the top 6 bits), and a primitive-long
    # collect_list/array_sort skips per-element struct boxing (the same
    # device dedup_ngram_jaccard measured ~4× on). The range guard raises
    # (never wraps) on a b_id outside the 57-bit pack domain.
    if not 0 < tol_c < 64:
        raise ValueError(
            f"join_band_topk: tol_c={tol_c} outside the 6-bit pack domain"
        )
    b_ok = F.when(
        F.col("b_id").between(0, (1 << 57) - 1), F.col("b_id")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("join_band_topk: b_id outside 57-bit pack range: "),
                F.col("b_id").cast("string"),
            )
        )
    )
    packed = (
        F.shiftleft(F.abs(F.col("a_c") - F.col("b_c")).cast("long"), 57) + b_ok
    )
    top = (
        pairs.select("a_id", packed.alias("p"))
        .groupBy("a_id")
        .agg(F.slice(F.array_sort(F.collect_list("p")), 1, k).alias("top"))
    )
    return top.select(
        "a_id", F.posexplode("top").alias("pos", "p")
    ).select(
        "a_id",
        (F.col("pos") + 1).cast("long").alias("rank"),
        F.col("p").bitwiseAND(F.lit((1 << 57) - 1)).alias("b_id"),
        F.shiftrightunsigned("p", 57).cast("long").alias("diff_c"),
    )


def join_grid_neighbors(points: DataFrame, radius: int = 150) -> DataFrame:
    """2D proximity join: every pair of points within Euclidean distance
    ``radius`` — the spatial analog of `join_band` (1D value blocking)
    and `join_interval_overlap` (1D time blocking), and naively an n²
    cross product.

    Scale strategy: GRID-CELL BLOCKING, the standard spatial-join device
    (geohash/S2's flat-grid core): cells are radius-sized squares, a
    qualifying pair is never more than one cell apart in either axis, so
    ONE side explodes to its 3×3 neighborhood, the other stays in its
    home cell, the equi-join on the cell key generates each ordered pair
    EXACTLY ONCE (the unexploded point lives in one cell), and the exact
    integer predicate dx² + dy² ≤ r² filters. Join cost is bounded by
    per-cell density, never |P|² — the 2D instance of the repo's one
    blocking discipline.

    Input: (pid, px, py) integer coordinates. Output: unordered pairs
    once (pid_a < pid_b) with the exact squared distance.
    """
    r = radius
    ea = points.select(
        F.col("pid").alias("pid_a"),
        F.col("px").alias("xa"),
        F.col("py").alias("ya"),
    ).withColumn(
        "gx", F.explode(F.array(*[F.expr(f"xa div {r}") + d for d in (-1, 0, 1)]))
    ).withColumn(
        "gy", F.explode(F.array(*[F.expr(f"ya div {r}") + d for d in (-1, 0, 1)]))
    )
    eb = points.select(
        F.col("pid").alias("pid_b"),
        F.col("px").alias("xb"),
        F.col("py").alias("yb"),
        F.expr(f"px div {r}").alias("gx"),
        F.expr(f"py div {r}").alias("gy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        ea.join(eb, ["gx", "gy"])
        .filter((F.col("pid_a") < F.col("pid_b")) & (d2 <= r * r))
        .select(
            "pid_a",
            "pid_b",
            d2.cast("long").alias("dist2"),
        )
    )


def join_window_anti(events: DataFrame, width_us: int = 10 * MIN_US) -> DataFrame:
    """Negative-evidence window join: the 'error' probes with NO 'click'
    by the same user inside [probe−w, probe+w) — `join_window`'s anti
    form, and the shape alerting/causality checks actually need ("errors
    with no user interaction nearby" is a different incident class than
    errors amid activity). A naive NOT EXISTS over a range predicate is
    a per-probe scan; this stays a blocked equi join.

    Same bucketization as `join_window` (probe explodes into the ≤3
    w-width buckets covering its 2w window, clicks sit in one bucket),
    then the matched probe ids — distinct'd, they are a SUBSET of probes
    — LEFT ANTI against the full probe set. Two shuffles, both bounded
    by match density, probe set never scanned per row.
    """
    bkt = lambda c: (c - c % F.lit(width_us)).cast("long")  # noqa: E731
    probes = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts_us").alias("err_us")
    )
    ep = probes.withColumn(
        "bucket",
        F.explode(
            F.array(
                bkt(F.col("err_us")) - F.lit(width_us),
                bkt(F.col("err_us")),
                bkt(F.col("err_us")) + F.lit(width_us),
            )
        ),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("c_us")
    ).withColumn("bucket", bkt(F.col("c_us")))
    hit_ids = (
        ep.join(clicks, ["user_id", "bucket"])
        .filter(
            (F.col("c_us") >= F.col("err_us") - F.lit(width_us))
            & (F.col("c_us") < F.col("err_us") + F.lit(width_us))
        )
        .select("event_id")
        .distinct()
    )
    return probes.join(hit_ids, "event_id", "left_anti").select(
        "event_id", "user_id", "err_us"
    )


def join_grid_knn(
    points: DataFrame, radius: int = 150, k: int = 3
) -> DataFrame:
    """Spatial k-NN shortlist: for every point, its ``k`` nearest other
    points within Euclidean ``radius``, ranked — the 2D counterpart of
    `join_band_topk` (which ranks 1D value neighbors) and the ranked
    form of `join_grid_neighbors` (which emits the full within-radius
    pair set). This is the entity-resolution / geo-recommendation
    contract: a bounded candidate SHORTLIST per query, not the whole
    neighborhood.

    The radius bound is what keeps the contract grid-complete: every
    true neighbor within ``radius`` lives in the 3×3 cell block, so the
    per-query top-k over grid candidates IS the exact top-k within the
    radius (an unbounded k-NN could hide its nearest neighbor arbitrarily
    many empty cells away — that shape needs the IVF path instead).

    Determinism: ranked by (dist2, pid_b) — exact integer distance, id
    tiebreak. Points with no in-radius neighbor emit no rows (their
    shortlist is empty, matching join_band_topk).

    Scale shape: one 9× map-side explode on the query side, ONE cell
    equi-join bounded by per-cell density, then a per-query rank window
    partitioned on pid_a — never |P|².
    """
    r = radius
    ea = points.select(
        F.col("pid").alias("pid_a"),
        F.col("px").alias("xa"),
        F.col("py").alias("ya"),
    ).withColumn(
        "gx", F.explode(F.array(*[F.expr(f"xa div {r}") + d for d in (-1, 0, 1)]))
    ).withColumn(
        "gy", F.explode(F.array(*[F.expr(f"ya div {r}") + d for d in (-1, 0, 1)]))
    )
    eb = points.select(
        F.col("pid").alias("pid_b"),
        F.col("px").alias("xb"),
        F.col("py").alias("yb"),
        F.expr(f"px div {r}").alias("gx"),
        F.expr(f"py div {r}").alias("gy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    cand = (
        ea.join(eb, ["gx", "gy"])
        .filter((F.col("pid_a") != F.col("pid_b")) & (d2 <= r * r))
        .select("pid_a", "pid_b", d2.cast("long").alias("dist2"))
    )
    w = Window.partitionBy("pid_a").orderBy("dist2", "pid_b")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("pid_a", F.col("rank").cast("long").alias("rank"), "pid_b", "dist2")
    )
