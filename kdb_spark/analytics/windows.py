"""Window functions (SURVEY.md §2.B) — the canonical TSDB derivations the
reference's dense grid feeds (counter deltas, moving averages, ranks).

Every window partitions by a series key — at 100 TB the single shuffle is on
(series), never a global single-partition window. Order keys always include
a unique tiebreaker (event_id / o_orderkey) so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kdb_spark.analytics.exact import floor_div_sql, iround_col
from kdb_spark.tables import DAY_US, HOUR_US, cents, pick_key


def win_moving_avg(events: DataFrame, k: int = 5) -> DataFrame:
    """Trailing k+1-row moving average per user series.

    Exact-parity contract (r11, the VERDICT r10 double-round hardening):
    the frame average is the exact rational Σcents/(100·rows) — an integer
    window sum over exact cents, never a float fold — rounded half-away-
    from-zero to 4 dp IN INTEGER SPACE (sign-aware DIV on decimal(38,0),
    the _iround6 device at the 10^4 grid), then ONE exact cast to double.
    `round(avg(double), 4)` was the r9 win_macd hazard class: identical
    today on this data, but engine round() disagrees at half boundaries
    and the float window-sum is addition-order-contracted."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-k, 0)
    )
    c = cents("value")
    t = events.select(
        "event_id",
        "user_id",
        F.sum(c).over(w).alias("sc"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    m4 = F.expr(
        "(CASE WHEN sc < 0 THEN -1 ELSE 1 END) * "
        + floor_div_sql(
            "20000 * CAST(abs(sc) AS DECIMAL(38,0))"
            " + 100 * CAST(cnt AS DECIMAL(38,0))",
            "200 * CAST(cnt AS DECIMAL(38,0))",
        )
    )
    return t.select(
        "event_id",
        "user_id",
        (m4.cast("double") / F.lit(1e4)).alias("mavg"),
    )


def win_rank(orders: DataFrame) -> DataFrame:
    """rank / dense_rank / row_number per customer by price desc."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(w).cast("long").alias("rn"),
    )


def win_lag_delta(events: DataFrame) -> DataFrame:
    """Counter delta — lag(value) per (user, type) series ordered by time.

    The canonical TSDB derivative (SURVEY.md §2.B "Window functions").
    Exact doubles: delta subtracts two stored values, no accumulation.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


def win_counter_rate(events: DataFrame) -> DataFrame:
    """Reset-aware per-second counter rate — the Prometheus ``rate()`` /
    ``increase()`` contract over a monotone counter that can RESET to zero
    on restart: increase = v - lag(v) when the counter moved forward, else
    v itself (the pre-reset increase is unobservable, the post-reset value
    is a lower bound — the standard TSDB convention). Rate divides by the
    µs gap; a zero gap (same-slot duplicate) yields NULL, not a division
    blow-up, and the series head (no predecessor) is dropped.

    One window pass on the series key (same Exchange as `win_lag_delta`).

    Exact-parity contract (r11, the VERDICT r10 double-round hardening):
    the increase is an exact CENTS difference (lag on bigint cents, never
    a float subtraction), so `increase` = inc_c·10^4 / 10^6 exactly on the
    1e-6 grid, and the per-second rate is the exact integer ratio
    inc_c·10^4/dt_us rounded half-away-from-zero in integer space (the
    sign-aware _iround6 device; inc_c can be negative when a reset lands
    on a negative-valued sample).
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    c = cents("value")
    t = events.select(
        "event_id", "user_id", "event_type", "ts_us", c.alias("c")
    )
    prev_c = F.lag("c").over(w)
    prev_ts = F.lag("ts_us").over(w)
    inc_c = F.when(F.col("c") >= prev_c, F.col("c") - prev_c).otherwise(
        F.col("c")
    )
    dt_us = F.col("ts_us") - prev_ts
    rate6 = F.expr(
        "(CASE WHEN inc_c < 0 THEN -1 ELSE 1 END) * "
        + floor_div_sql(
            "20000000000 * CAST(abs(inc_c) AS DECIMAL(38,0)) + dt_us",
            "2 * CAST(dt_us AS DECIMAL(38,0))",
        )
    )
    return (
        t.select(
            "event_id",
            "user_id",
            "event_type",
            "ts_us",
            prev_c.alias("pc"),
            inc_c.alias("inc_c"),
            dt_us.alias("dt_us"),
        )
        .filter(F.col("pc").isNotNull())
        .select(
            "event_id",
            "user_id",
            "event_type",
            # increase = inc_c/100 rounded to 6 dp ≡ inc_c·10^4 on the grid
            ((F.col("inc_c") * F.lit(10_000)).cast("double") / F.lit(1e6)).alias(
                "increase"
            ),
            F.when(F.col("dt_us") > 0, rate6.cast("double") / F.lit(1e6)).alias(
                "rate_per_sec"
            ),
        )
    )


def win_first_last(events: DataFrame) -> DataFrame:
    """first_value / last_value / nth_value over the full series frame —
    session-open vs session-close style derivations."""
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        F.first("value").over(w).alias("first_value"),
        F.last("value").over(w).alias("last_value"),
        F.nth_value("value", 2).over(w).alias("second_value"),
    )


def win_ntile(orders: DataFrame, n: int = 4) -> DataFrame:
    """ntile / percent_rank / cume_dist — distribution ranks per customer
    spend; one shuffle on the partition key like every window here.

    Exact-parity contract (r11): percent_rank = (rank−1)/(rows−1) and
    cume_dist = row/rows are ratios of exact integers, rounded half-up to
    6 dp IN INTEGER SPACE (the DIV device — round(double, 6) on these
    was the half-boundary class). The order key ends in the unique
    o_orderkey, so rank ≡ row_number and cume_dist's peer group is the
    single row — the integer forms below are the built-ins' exact values.
    """
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wp = Window.partitionBy("o_orderpriority")
    t = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(n).over(w).cast("long").alias("quartile"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wp).cast("long").alias("np"),
    )
    prk6 = F.when(F.col("np") > 1, F.expr(
        floor_div_sql(
            "2000000 * CAST(rn - 1 AS DECIMAL(38,0)) + (np - 1)",
            "2 * CAST(np - 1 AS DECIMAL(38,0))",
        )
    )).otherwise(F.lit(0).cast("decimal(38,0)"))
    cd6 = F.expr(
        floor_div_sql(
            "2000000 * CAST(rn AS DECIMAL(38,0)) + np",
            "2 * CAST(np AS DECIMAL(38,0))",
        )
    )
    return t.select(
        "o_orderkey",
        "o_orderpriority",
        "quartile",
        (prk6.cast("double") / F.lit(1e6)).alias("prk"),
        (cd6.cast("double") / F.lit(1e6)).alias("cd"),
    )


def sessionize(events: DataFrame, gap_us: int = 30 * 60 * 1_000_000) -> DataFrame:
    """Batch sessionization: assign a session id per user from inactivity
    gaps (lag + running sum — one shuffle on user_id). The batch twin of
    streaming `session_window`; session ids are 1-based per user in time
    order, deterministic via the event_id tiebreaker."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_session = F.when(
        F.col("ts_us") - F.lag("ts_us").over(w) >= gap_us, 1
    ).otherwise(0)
    # first row of each user: lag is null -> when() falls to otherwise(0);
    # make it open session 1 explicitly
    new_session = F.when(F.lag("ts_us").over(w).isNull(), 1).otherwise(new_session)
    return events.select(
        "event_id",
        "user_id",
        "ts_us",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("session_id"),
    )


def win_range_frame(events: DataFrame, width_us: int = HOUR_US) -> DataFrame:
    """Sliding time-range frame: sum over the trailing hour per user.

    rangeBetween on the µs epoch long — a true value-range frame, not a row
    count. Cents keep the running sum order-independent.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-width_us, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(cents("value")).over(w).alias("trail_sum_c"),
    )


def win_cumsum(events: DataFrame) -> DataFrame:
    """Running total per user series — the cumulative counter view.

    Cents keep the running sum exact and order-independent within the
    deterministic (ts, event_id) ordering; one shuffle on user_id.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(cents("value")).over(w).alias("cum_c"),
    )


def win_interpolate(
    events: DataFrame, start_us: int, end_us: int, res: int = HOUR_US
) -> DataFrame:
    """Linear interpolation of gaps on the per-user hourly grid — the
    gap-fill a dense TSDB grid feeds (the reference zero-fills,
    `dbase/dbase.go:75-81`; interpolation is the analytics-grade upgrade).
    Values are cent-scaled slot averages (`value_c`).

    Plan shape: one hash agg onto the slot grid, spine left-join
    (`densify`-style, spine generated distributed), then two windows on the
    SAME (user) partitioning — Catalyst reuses one Exchange for both frame
    directions. Edge slots with no point on one side stay NULL (strict
    interpolation, no extrapolation).

    Exact-parity contract (r11, the VERDICT r10 double-round hardening):
    each slot value is the exact rational Σcents/n, so the interpolated
    point is itself a ratio of exact integers —
      [pvn·nvd·(nt−pt) + (nvn·pvd − pvn·nvd)·(slot−pt)] / [pvd·nvd·(nt−pt)]
    — and BOTH branches round half-away-from-zero to 4 dp in integer space
    (sign-aware DIV on decimal(38,0); products stay ≲10^29 ≪ 10^38 even at
    tick-scale cents with year-long gaps). The float interpolate +
    round(double, 4) it replaces was the r9 win_macd half-boundary class.
    """
    from kdb_spark.densify import dense_grid

    slots = (
        events.filter(
            (F.col("ts_us") >= start_us) & (F.col("ts_us") < end_us)
        )
        .groupBy(
            "user_id",
            (F.col("ts_us") - F.col("ts_us") % F.lit(res)).alias("slot_us"),
        )
        # exact rational slot value: bigint cents sum + row count
        .agg(
            F.sum(cents("value")).cast("long").alias("vn"),
            F.count(F.lit(1)).cast("long").alias("vd"),
        )
    )
    series = slots.select("user_id").distinct()
    grid = dense_grid(series, start_us, end_us, res, ts_col="slot_us")
    sparse = grid.join(slots, ["user_id", "slot_us"], "left")

    back = (
        Window.partitionBy("user_id")
        .orderBy("slot_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("slot_us")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_ts = F.when(F.col("vn").isNotNull(), F.col("slot_us"))
    d = (
        sparse.withColumn("pvn", F.last("vn", ignorenulls=True).over(back))
        .withColumn("pvd", F.last("vd", ignorenulls=True).over(back))
        .withColumn("pt", F.last(known_ts, ignorenulls=True).over(back))
        .withColumn("nvn", F.first("vn", ignorenulls=True).over(fwd))
        .withColumn("nvd", F.first("vd", ignorenulls=True).over(fwd))
        .withColumn("nt", F.first(known_ts, ignorenulls=True).over(fwd))
    )

    def _r4(num_sql: str, den_sql: str) -> F.Column:
        # round(num/den, 4) half-away-from-zero in exact decimal space
        # (the shared device, kdb_spark/analytics/exact.py); den > 0
        return iround_col(num_sql, den_sql, 4)

    interp = _r4(
        "CAST(pvn AS DECIMAL(38,0)) * nvd * (nt - pt)"
        " + (CAST(nvn AS DECIMAL(38,0)) * pvd"
        "    - CAST(pvn AS DECIMAL(38,0)) * nvd) * (slot_us - pt)",
        "CAST(pvd AS DECIMAL(38,0)) * nvd * (nt - pt)",
    )
    return d.select(
        "user_id",
        "slot_us",
        F.when(
            F.col("vn").isNotNull(),
            _r4("CAST(vn AS DECIMAL(38,0))", "CAST(vd AS DECIMAL(38,0))"),
        )
        .when(F.col("pvn").isNotNull() & F.col("nvn").isNotNull(), interp)
        .alias("value_c"),
    )


def win_ffill(
    events: DataFrame, start_us: int, end_us: int, res: int = HOUR_US
) -> DataFrame:
    """Forward fill on the per-user hourly grid — kdb's `fills`, the other
    canonical dense-grid repair next to `win_interpolate` (tick data: carry
    the last observation until the next one). Leading slots before the
    first observation stay NULL.

    Same plan shape as interpolation minus the forward window: one hash agg
    onto the slot grid, spine left-join, ONE backward window per user.

    Exact-parity contract (r11): the carried slot value is the exact
    rational Σcents/n, rounded half-away-from-zero to 4 dp in integer
    space (the win_interpolate device) — never round(double, 4). The
    round happens AT THE SLOT (|slots| DIVs, before the grid join) and
    the window carries the one finished double — round-then-carry ≡
    carry-then-round, and the fill window stays as cheap as the float
    version it hardened (the two-column carry measured 2.4× the 0.28 s
    baseline; this shape re-measures at it).
    """
    from kdb_spark.densify import dense_grid

    v4 = F.expr(
        "(CASE WHEN vn < 0 THEN -1 ELSE 1 END) * "
        + floor_div_sql(
            "20000 * CAST(abs(vn) AS DECIMAL(38,0)) + vd",
            "2 * CAST(vd AS DECIMAL(38,0))",
        )
    )
    slots = (
        events.filter(
            (F.col("ts_us") >= start_us) & (F.col("ts_us") < end_us)
        )
        .groupBy(
            "user_id",
            (F.col("ts_us") - F.col("ts_us") % F.lit(res)).alias("slot_us"),
        )
        .agg(
            F.sum(cents("value")).cast("long").alias("vn"),
            F.count(F.lit(1)).cast("long").alias("vd"),
        )
        .select(
            "user_id",
            "slot_us",
            (v4.cast("double") / F.lit(1e4)).alias("v"),
        )
    )
    series = slots.select("user_id").distinct()
    grid = dense_grid(series, start_us, end_us, res, ts_col="slot_us")
    back = (
        Window.partitionBy("user_id")
        .orderBy("slot_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(slots, ["user_id", "slot_us"], "left")
        .select(
            "user_id",
            "slot_us",
            F.last("v", ignorenulls=True).over(back).alias("value_c"),
        )
    )


def win_moving_median(events: DataFrame, k: int = 9) -> DataFrame:
    """Trailing (k+1)-row moving median per user series — the
    outlier-robust counterpart of :func:`win_moving_avg` (a spike pulls the
    mean for k rows but leaves the median untouched).

    ``percentile`` is an ordinary aggregate, so it evaluates directly over
    the row frame; exact interpolated median, same linear-interpolation
    formula DuckDB's ``median()`` uses. One shuffle on user_id (the window
    partition) — same scale shape as every other windowed op here.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-k, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 4).alias("mmed"),
    )


# EWMA horizon and smoothing factor. A FINITE horizon (vs the textbook
# infinite recursion) is the deliberate scale choice: each output row
# depends on a bounded 16-row frame, so the op stays a map-only pass after
# one (user, type) shuffle and ports to a bounded-state streaming operator —
# an infinite EWMA would need an unbounded sequential scan per series.
# With alpha=0.3 the dropped tail mass is (1-alpha)^16 ≈ 0.33%.
EWMA_ALPHA = 0.3
EWMA_H = 16


def ewma_weights(alpha: float = EWMA_ALPHA, h: int = EWMA_H) -> list[float]:
    """Geometric lag weights w_k = alpha*(1-alpha)^k, k = 0..h-1, as floats.

    Kept for reference-value computation in tests; the ENGINE contract is
    `ewma_weights_int` — a chained float fold plus a double round(6) is the
    cross-engine half-boundary trap the r9 driver surfaced on win_macd.
    """
    return [alpha * (1.0 - alpha) ** k for k in range(h)]


# Weight quantization grid. The EWMA family's operator DEFINITION is the
# integer weights W_k = round(w_k·10^6): every fold is then exact integer
# arithmetic (order-independent, engine-exact), and output rounding is a
# sign-aware integer DIV — no double ever rounds at a decimal boundary.
# 10^6 (not 10^12) keeps the streaming port's numpy fold inside int64:
# 2e6·Σ(W_k·cents) ≤ 2e6·10^6·max_cents ≈ 1e17 < 2^63.
EWMA_GRID = 10**6


def ewma_weights_int(alpha: float = EWMA_ALPHA, h: int = EWMA_H) -> list[int]:
    """Integer lag weights W_k = round(alpha·(1-alpha)^k · EWMA_GRID).

    Exposed so the oracle SQL is generated from the SAME integer literals;
    integer sums/products are exact on both engines, so the EWMA ratio is
    a single exact rational — bit-deterministic everywhere.
    """
    return [round(alpha * (1.0 - alpha) ** k * EWMA_GRID) for k in range(h)]


def _ewma_terms(col, alpha: float, w) -> tuple[F.Column, F.Column]:
    """Exact EWMA numerator/denominator of integer column ``col`` over
    window spec ``w``: num = Σ W_k·x_{t-k}, den = Σ W_k over the lags
    that exist (series heads renormalize, as before). All lags share ONE
    window spec → a single Window physical node.

    The fold runs in BIGINT, not decimal — a 3-chain decimal fold
    measured 2.5× the float version's wall (the r10 win_macd bench
    breach); long arithmetic restores it. Exactness is unchanged; the
    domain bound is |x| ≤ 9.2e18/EWMA_GRID ≈ 9.2e12 per sample (≈ $92B
    in cents — far beyond any tick domain). Callers that multiply two
    folds together (win_macd's cross-multiplication) cast to
    decimal(38,0) THERE, where long genuinely could overflow.
    """
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for k, wk in enumerate(ewma_weights_int(alpha)):
        lk = F.lag(col, k).over(w)
        num = num + F.coalesce(lk, F.lit(0)) * F.lit(wk)
        den = den + F.when(lk.isNotNull(), F.lit(wk)).otherwise(F.lit(0))
    return num, den


def _iround6(num_sql: str, den_sql: str) -> F.Column:
    """round(num/den, 6) computed ENTIRELY in exact decimal space —
    sign-aware half-away-from-zero via the shared decimal floor-division
    device (kdb_spark/analytics/exact.py), then one exact cast to double.
    ``num_sql``/``den_sql`` are SQL fragments; den must be > 0. The
    numerator is widened to decimal inside the device.

    r12: the old DIV form returned BIGINT and silently wrapped past a
    grid value of 2^63 (|num/den| ≈ 9.22e12 at k=6); the decimal
    floor-division carries the quotient in decimal(38,6), lifting the
    domain to |num/den| < 10^26 with LOUD overflow past it."""
    return iround_col(num_sql, den_sql, 6)


def _ewma_terms_array(col, alpha: float, w) -> tuple[F.Column, F.Column]:
    """`_ewma_terms` re-expressed as ONE window expression: collect the
    trailing h-row frame into an array and fold it with zip_with/aggregate
    instead of emitting h separate `lag()` window functions.

    Same exact integer semantics, including nulls: elements are wrapped
    in a struct (collect_list drops bare nulls, which would SHIFT lag
    positions — the struct keeps every slot) so a null sample contributes
    0 to the numerator and is excluded from the weight denominator,
    exactly like the lag chain's coalesce/isNotNull pair.

    Why it exists (r14): the 16-lag chain compiles to a large codegen
    unit — the r13 driver bench showed win_ewma's first execution paying
    ~2s of Janino compile on top of ~1s of work. One collect_list + two
    higher-order folds is a far smaller expression tree (measured ~20%
    faster cold, ~15% warm at sf0.1) with an identical plan shape: one
    (user,type) Exchange, one Window node, map-only fold.
    """
    W = ewma_weights_int(alpha)
    wf = w.rowsBetween(-(len(W) - 1), 0)
    # newest-first so index k == lag k; slot struct defeats null-dropping
    xs = F.reverse(
        F.collect_list(F.struct(F.coalesce(col, F.lit(0)).alias("v"),
                                col.isNull().alias("nul"))).over(wf)
    )
    wlit = F.array(*[F.lit(x).cast("long") for x in W])
    zero = F.lit(0).cast("long")
    num = F.aggregate(
        F.zip_with(xs, wlit,
                   lambda e, wk: F.when(e.isNull() | e["nul"], zero)
                                  .otherwise(e["v"] * wk)),
        zero, lambda acc, e: acc + e)
    den = F.aggregate(
        F.zip_with(xs, wlit,
                   lambda e, wk: F.when(e.isNull() | e["nul"], zero)
                                  .otherwise(wk)),
        zero, lambda acc, e: acc + e)
    return num, den


def win_ewma(events: DataFrame) -> DataFrame:
    """Exponentially weighted moving average per (user, event_type) series.

    Finite-horizon normalized EWMA: sum_k W_k·x_{t-k} / sum_k W_k over the
    lags that exist (series heads renormalize instead of biasing toward 0).
    Built as ONE trailing-frame collect_list + integer zip_with/aggregate
    fold (`_ewma_terms_array`, r14) — a single window physical node and a
    compact codegen unit; the 16-lag chain it replaces compiled to the
    same plan but paid ~2s of Janino compile on first execution.

    Parity-hardened (r10): the fold runs over exact bigint cents with the
    integer weights of `ewma_weights_int`, and round(6) is a sign-aware
    integer DIV — the value is one exact rational on both engines, so the
    driver's DuckDB can never disagree on a half boundary (the win_macd
    r9 failure mode).
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    num, den = _ewma_terms_array(cents("value"), EWMA_ALPHA, w)
    t = events.select(
        "event_id", "user_id", "event_type", num.alias("n1"), den.alias("d1")
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        _iround6("n1", "100 * CAST(d1 AS DECIMAL(38,0))").alias("ewma"),
    )


def win_zscore(events: DataFrame, k: int = 31, thresh: float = 3.0) -> DataFrame:
    """Rolling z-score outlier flag over a trailing (k+1)-row frame.

    Parity-hardened: mean/variance derive from exact bigint cent sums
    (sum, sum of squares, count) rather than engine-native avg/stddev —
    integer window sums are order-independent, so the derived doubles are
    bit-identical cross-engine and the |z| >= thresh flag can never flip on
    a rounding boundary. Same single (user, type) shuffle as every window op.

    Residual round(z, 4) rationale (r11 audit): z passes through sqrt —
    IEEE-correctly-rounded, identical expression trees both engines — so
    the input double is bit-identical, and an irrational z cannot land
    exactly on a 5e-5 half boundary; the round only trims repr noise.
    """
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-k, 0)
    )
    xc = cents("value")
    n = F.count(F.lit(1)).over(w).cast("double")
    s1 = F.sum(xc).over(w).cast("double")
    s2 = F.sum(xc * xc).over(w).cast("double")
    mean = s1 / n
    # population variance of the frame, in cents^2
    var = s2 / n - mean * mean
    z = F.when(var > 0, (xc.cast("double") - mean) / F.sqrt(var))
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(z, 4).alias("z"),
        (z.isNotNull() & (F.abs(z) >= F.lit(thresh))).alias("is_outlier"),
    )


def win_cusum(
    events: DataFrame, target_c: int = 30_000, h_c: int = 100_000
) -> DataFrame:
    """One-sided CUSUM change detection per (user, event_type) series: the
    classic SPC statistic S_t = max(0, S_{t-1} + (x_t − target)), alarming
    when the cumulative upward drift clears ``h_c``.

    The recursion LOOKS sequential, but has the closed form
    S_t = c_t − min(0, min_{j≤t} c_j) with c the running sum of
    (x − target) — so it is two chained window passes over ONE series
    Exchange, entirely JVM-side (the first cut ran the literal fold in
    grouped Python at ~4× the wall). All arithmetic is bigint cents; the
    oracle replays the LITERAL fold as a packed list_reduce, so the two
    independent formulations check each other. Emits the final statistic,
    its running max, and the alarm flag per series.
    """
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    xc = cents("value")
    stage1 = events.select(
        "user_id",
        "event_type",
        "ts_us",
        "event_id",
        F.sum(xc - F.lit(target_c)).over(w).alias("c"),
    )
    w2 = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stage2 = stage1.select(
        "user_id",
        "event_type",
        "ts_us",
        "event_id",
        (F.col("c") - F.least(F.lit(0), F.min("c").over(w2))).alias("s"),
    )
    return (
        stage2.groupBy("user_id", "event_type")
        .agg(
            F.max_by("s", F.struct("ts_us", "event_id")).alias("cusum_final"),
            F.max("s").alias("cusum_max"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "user_id",
            "event_type",
            F.col("cusum_final").cast("long").alias("cusum_final"),
            F.col("cusum_max").cast("long").alias("cusum_max"),
            (F.col("cusum_max") >= F.lit(h_c)).alias("alarmed"),
            F.col("n").cast("long").alias("n"),
        )
    )


def win_fby(events: DataFrame) -> DataFrame:
    """kdb's ``fby`` (filter-by): keep the rows whose value equals a
    group-level aggregate, without collapsing the group — the verb behind
    ``select from t where price = (max; price) fby sym``.

    One unbounded window max over the series key, then a row-level compare:
    the fact table shuffles once and never joins. The compare is on the
    STORED double (both engines see identical bits), so ties surface every
    qualifying row deterministically. At 100 TB the window's partial max is
    map-side combined by AQE; contrast the naive groupBy+self-join, which
    shuffles the fact table twice.
    """
    w = Window.partitionBy("user_id", "event_type")
    return (
        events.select(
            "event_id", "user_id", "event_type", "value",
            F.max("value").over(w).alias("grp_max"),
            F.count(F.lit(1)).over(w).cast("long").alias("grp_n"),
        )
        .filter(F.col("value") == F.col("grp_max"))
    )


def win_bollinger(events: DataFrame, k: int = 19, width: float = 2.0) -> DataFrame:
    """Bollinger bands per series: trailing k+1-row mean ± width·stddev and
    a breach flag — the mean-reversion signal every tick-analytics stack
    ships (kdb's msum/mdev composition).

    Same single series-key window shuffle as the other win_* ops; the frame
    computes EXACT integer moments (Σcents, Σcents², n — bigint window
    sums, shared buffer) and mean/deviation derive from them through an
    identical double expression in both engines — a naive windowed
    avg/stddev_samp accumulates in engine-specific order and flips round(4)
    boundaries (observed on the oracle gate). The head of each series
    (n < 2) has no defined deviation → null bands, never a breach. Band
    compares run in the exact cents domain so the flag and the displayed
    bands can't disagree.
    """
    from kdb_spark.tables import cents

    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-k, 0)
    )
    c = cents("value")
    s1 = F.sum(c).over(w).cast("double")
    s2 = F.sum(c * c).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    mu_c = s1 / n
    var_c = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    sd_c = F.when(n > 1.0, F.sqrt(var_c))
    upper_c, lower_c = mu_c + width * sd_c, mu_c - width * sd_c
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        # round 6, NOT 4: mid = Σc/(100n) lands exactly on .00005
        # boundaries (engine-divergent rounding) whenever n is 2^a·5^b,
        # but every terminating case divides 10^6, so round(6) is exact
        F.round(mu_c / 100.0, 6).alias("mid"),
        F.round(upper_c / 100.0, 6).alias("upper"),
        F.round(lower_c / 100.0, 6).alias("lower"),
        F.when(sd_c.isNull(), F.lit(None).cast("string"))
        .when(c.cast("double") > upper_c, F.lit("above"))
        .when(c.cast("double") < lower_c, F.lit("below"))
        .otherwise(F.lit("in"))
        .alias("band"),
    )


def win_drawdown(events: DataFrame) -> DataFrame:
    """Running peak and drawdown-from-peak per series — the risk metric
    every portfolio/SLA dashboard tracks (kdb: maxs + ratio).

    One unbounded-preceding running max over the standard series sort —
    same single Exchange as the other win_* ops.

    Exact-parity contract (r11): dd_frac = (peak−c)/peak is a ratio of
    exact cents integers, rounded half-up to 6 dp IN INTEGER SPACE (the
    DIV device — the replaced round(double, 6) was the r9 win_macd
    half-boundary class; numerator ≥ 0 since peak is the running max and
    the peak > 0 guard keeps the denominator positive).
    """
    from kdb_spark.tables import cents

    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = cents("value")
    peak = F.max(c).over(w)
    t = events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        c.alias("c"),
        peak.alias("peak_c"),
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (F.col("peak_c").cast("double") / 100.0).alias("peak"),
        ((F.col("peak_c") - F.col("c")).cast("double") / 100.0).alias("drawdown"),
        F.when(
            F.col("peak_c") > 0,
            F.expr(
                floor_div_sql(
                    "2000000 * CAST(peak_c - c AS DECIMAL(38,0)) + peak_c",
                    "2 * CAST(peak_c AS DECIMAL(38,0))",
                )
            ).cast("double")
            / F.lit(1e6),
        ).alias("dd_frac"),
    )


def win_rsi(events: DataFrame, k: int = 14) -> DataFrame:
    """Relative Strength Index per series (Cutler's simple-average form:
    rs = Σgain/Σloss over the trailing k deltas; the classic momentum
    oscillator, 0..100). Wilder's exponentially-smoothed variant is the
    win_ewma pattern; the simple form keeps every term an exact integer.

    Two chained windows over ONE series Exchange (lag → frame sums —
    Catalyst reuses the sort). Gains/losses are exact cents integers, so
    rs and rsi derive from identical doubles in both engines — no
    tolerance. All-loss frames pin rsi to 0, all-gain to 100 via the same
    division (no special case); frames with no movement at all (Σg=Σl=0)
    are undefined → null. Rows before the first delta emit null.
    """
    from kdb_spark.tables import cents

    ws = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    wf = ws.rowsBetween(-(k - 1), 0)
    c = cents("value")
    delta = c - F.lag(c).over(ws)
    staged = events.select(
        "event_id", "user_id", "event_type", "ts_us", delta.alias("d")
    )
    gain = F.sum(F.greatest(F.col("d"), F.lit(0))).over(wf)
    loss = F.sum(F.greatest(-F.col("d"), F.lit(0))).over(wf)
    n_d = F.count("d").over(wf)
    # 100·G/(G+L) ≡ 100 − 100/(1+G/L): a ratio of exact cents integers,
    # rounded half-up to 4 dp IN INTEGER SPACE (r11 hardening — the
    # replaced round(double, 4) was the half-boundary class). Empty or
    # all-null frames make the sums null and the guard propagates it.
    t = staged.select(
        "event_id",
        "user_id",
        "event_type",
        n_d.cast("long").alias("n_deltas"),
        gain.alias("g"),
        loss.alias("l"),
    )
    rsi4 = F.when(
        F.col("g") + F.col("l") > 0,
        F.expr(
            floor_div_sql(
                "2000000 * CAST(g AS DECIMAL(38,0)) + (g + l)",
                "2 * CAST(g + l AS DECIMAL(38,0))",
            )
        ),
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        "n_deltas",
        (rsi4.cast("double") / F.lit(1e4)).alias("rsi"),
    )


def win_hampel(events: DataFrame, k: int = 9, n_sigmas: float = 3.0) -> DataFrame:
    """Hampel despike filter per series: flag points whose deviation from
    the trailing-frame MEDIAN exceeds ``n_sigmas`` × the frame's MAD — the
    robust outlier gate (win_zscore's mean/σ version is itself dragged by
    the spike it hunts; median/MAD is not).

    The frame's MAD must be computed against the CURRENT row's frame
    median, which no plain window aggregate can express (the aggregate
    argument would vary per output row) — so ONE window pass collects the
    frame as an array and median/MAD derive from exact-cents array
    expressions (array_sort + middle element(s) — JVM lambdas, no UDF,
    engine-exact integers until the final /2 interpolations). A zero-MAD
    (majority-constant) frame flags any nonzero deviation. Same single
    series-key Exchange as every win_* op; frame arrays are k+1 longs.
    """
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-k, 0)
    )
    arr = F.array_sort(F.collect_list(cents("value")).over(w))

    def arr_median(a: F.Column) -> F.Column:
        # exact middle element (odd n) or mean of the two middles (even n);
        # double cast is exact for cents ints, no-op for the deviation pass
        n = F.size(a)
        odd = F.element_at(a, ((n + 1) / 2).cast("int")).cast("double")
        lo = F.element_at(a, (n / 2).cast("int")).cast("double")
        hi = F.element_at(a, (n / 2).cast("int") + 1).cast("double")
        return F.when(n % 2 == 1, odd).otherwise((lo + hi) / F.lit(2.0))

    staged = events.select(
        "event_id", "user_id", "event_type", cents("value").alias("c"),
        arr.alias("frame"),
    )
    med = arr_median(F.col("frame"))
    devs = F.array_sort(
        F.transform(F.col("frame"), lambda x: F.abs(x.cast("double") - med))
    )
    mad = arr_median(devs)
    dev = F.abs(F.col("c").cast("double") - med)
    return staged.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(med / 100.0, 6).alias("med"),
        F.round(mad / 100.0, 6).alias("mad"),
        F.when(mad > 0, dev > n_sigmas * mad).otherwise(dev > 0).alias("is_spike"),
    )


def win_donchian(events: DataFrame, k: int = 19) -> DataFrame:
    """Donchian channel per series: trailing k+1-row high/low band and the
    close's position inside it — kdb's mmax/mmin composition, the breakout
    signal pair to win_bollinger's mean-reversion bands.

    Same single series-key window shuffle as every win_* op; ONE frame
    buffer serves both extremes. The channel bounds are exact cents
    integers (min/max of stored values, no accumulation at all), so
    hi/lo are engine-exact; the position is the exact integer ratio
    (c−lo)/(hi−lo) rounded to 6 dp IN INTEGER SPACE (half-up DIV on
    decimal — a double round() on an exact ratio is the cross-engine
    half-boundary trap; numerator is never negative since lo is the
    frame min). Null when the channel is flat (hi = lo) — a 0/0 there
    would be an ANSI runtime error, and flat channels are common at
    series heads.
    """
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-k, 0)
    )
    c = cents("value")
    hi = F.max(c).over(w)
    lo = F.min(c).over(w)
    t = events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        c.alias("c"),
        hi.alias("hi_c"),
        lo.alias("lo_c"),
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (F.col("hi_c").cast("double") / 100.0).alias("hi"),
        (F.col("lo_c").cast("double") / 100.0).alias("lo"),
        F.when(
            F.col("hi_c") > F.col("lo_c"),
            F.expr(
                floor_div_sql(
                    "2000000 * CAST(c - lo_c AS DECIMAL(38,0))"
                    " + (hi_c - lo_c)",
                    "2 * CAST(hi_c - lo_c AS DECIMAL(38,0))",
                )
            ).cast("double")
            / F.lit(1e6),
        ).alias("chan_pos"),
    )


def win_macd(
    events: DataFrame,
    fast: float = 0.4,
    slow: float = 0.15,
    sig: float = 0.4,
) -> DataFrame:
    """MACD per series (kdb's ema composition; the trend-following
    complement to win_rsi's oscillator): macd = EWMA_fast − EWMA_slow of
    the value, signal = EWMA of the macd line, histogram = macd − signal.

    Same finite-horizon EWMA rationale as win_ewma (bounded 16-row frames,
    no unbounded recursion — ports to bounded streaming state). Two chained
    window passes over the SAME partitioning+ordering: Catalyst plans ONE
    Exchange with two Window nodes — the macd line must materialize before
    its own EWMA can lag over it (a window over a window is inexpressible
    in one frame).

    Parity contract (r10, closing the r9 driver hash-FAIL): the macd line
    is the exact rational (nf·ds − ns·df)/(100·df·ds) over integer-weight
    cent folds, quantized ONCE to the output's 10^-6 grid by sign-aware
    integer DIV in decimal(38,0); the signal EWMA then folds those exact
    bigints (long-safe for |macd| up to ~$9.2M — the quantized line times
    the 10^6 weight grid). Every number either engine rounds is an
    integer ratio — no chained-double half-boundary can flip a round(6)
    between Spark and DuckDB. The cent folds themselves run in bigint
    (see _ewma_terms — the all-decimal fold was the r10 bench breach);
    only the fold cross-products are decimal.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    xc = cents("value")
    nf, fden = _ewma_terms(xc, fast, w)
    ns, sden = _ewma_terms(xc, slow, w)
    m = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        (
            nf.cast("decimal(38,0)") * sden - ns.cast("decimal(38,0)") * fden
        ).alias("mn"),
        (
            F.lit(100).cast("decimal(38,0)") * fden * sden
        ).alias("md"),
    ).withColumn(
        "macd_e6",
        # cast back to long AFTER the exact device: the signal fold below
        # is deliberately bigint (_ewma_terms — the all-decimal fold was
        # the r10 bench breach), and |macd_e6| ≤ 9.2e12 is this op's own
        # documented long-safe domain.
        F.expr(
            "(CASE WHEN mn < 0 THEN -1 ELSE 1 END) * "
            + floor_div_sql("2000000 * abs(mn) + md", "2 * md")
        ).cast("long"),
    )
    n2, d2 = _ewma_terms(F.col("macd_e6"), sig, w)
    t = m.select(
        "event_id", "user_id", "event_type", "macd_e6",
        n2.alias("n2"), d2.alias("d2"),
    )
    sig_den = "1000000 * CAST(d2 AS DECIMAL(38,0))"
    hist_num = "(CAST(macd_e6 AS DECIMAL(38,0)) * d2 - n2)"
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        (F.col("macd_e6").cast("double") / F.lit(1e6)).alias("macd"),
        _iround6("n2", sig_den).alias("signal"),
        _iround6(hist_num, sig_den).alias("hist"),
    )


def win_keltner(
    events: DataFrame, alpha: float = 0.25, mult: float = 2.0
) -> DataFrame:
    """Keltner channels per event_type over hourly bars: middle line =
    EWMA of the bar's typical price (h+l+c)/3, bands at ±mult × EWMA of
    the bar range (h−l; the trimmed-schema ATR — no prior close).

    Two-stage composition, both scale-clean: (1) the OHLC rollup is one
    partial+final hash agg on (type, hour) — the only fact-sized pass;
    (2) the channel EWMAs run over the |types × hours| bar table with the
    same finite-horizon lag-chain device as win_ewma/win_macd (both
    smoothings share ONE window spec → one window node, no second
    shuffle). typical/range are integer cent sums of exact min/max/max_by
    picks (typical = (h+l+c)/3 carried as the 3×-scaled bigint h+l+c), so
    the integer-weight EWMA folds and the sign-aware DIV round(6) are
    engine-exact — the same r10 parity contract as win_ewma/win_macd.
    ``mult`` participates as the integer round(mult·1000).
    """
    key = pick_key(3_600_000_000)
    bars = events.groupBy(
        "event_type",
        (F.col("ts_us") - F.col("ts_us") % F.lit(3_600_000_000)).alias("hour_us"),
    ).agg(
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
    )
    bars = bars.select(
        "event_type",
        "hour_us",
        (cents("high") + cents("low") + cents("close")).alias("t3"),
        (cents("high") - cents("low")).alias("rngc"),
    )
    w = Window.partitionBy("event_type").orderBy("hour_us")
    nt, dt = _ewma_terms(F.col("t3"), alpha, w)
    nr, _ = _ewma_terms(F.col("rngc"), alpha, w)
    m3 = 3 * round(mult * 1000)
    t = bars.select(
        "event_type", "hour_us",
        nt.alias("nt"), nr.alias("nr"), dt.alias("dt"),
    )
    # middle = nt/(300·dt) dollars; upper/lower = (1000·nt ± 3M·nr)/(300000·dt)
    return t.select(
        "event_type",
        "hour_us",
        _iround6("nt", "300 * CAST(dt AS DECIMAL(38,0))").alias("middle"),
        _iround6(
            f"(1000 * CAST(nt AS DECIMAL(38,0)) + {m3} * nr)",
            "300000 * CAST(dt AS DECIMAL(38,0))",
        ).alias("upper"),
        _iround6(
            f"(1000 * CAST(nt AS DECIMAL(38,0)) - {m3} * nr)",
            "300000 * CAST(dt AS DECIMAL(38,0))",
        ).alias("lower"),
    )


def win_realized_vol(events: DataFrame, k: int = 19) -> DataFrame:
    """Rolling realized volatility per series: sqrt of the mean SQUARED
    TICK CHANGE over the trailing k+1-row frame, in value units — the
    risk number every tick stack rolls next to its moving averages
    (stated over simple differences, not log returns: log is a libm
    function whose ulps differ across engines, while Δcents² is an exact
    bigint and sqrt is IEEE-correctly-rounded everywhere).

    Two window passes over ONE partitioning (lag must materialize before
    the frame can sum it — the win_macd shape): Δc = c − lag(c) in exact
    cents, then an exact integer window sum of Δc² and a count. The only
    float ops are one division, one sqrt, and the floor-grid output —
    all deterministic given identical integer inputs, so the value is
    engine-exact. Series heads (no delta yet) emit null. Domain bound:
    |Δc| ≤ 3e9 cents keeps Δc²·(k+1) inside bigint.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    xc = cents("value")
    d = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        (xc - F.lag(xc).over(w)).alias("dc"),
    )
    f = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-k, 0)
    )
    s = F.sum(F.col("dc") * F.col("dc")).over(f)
    n = F.count("dc").over(f)
    t = d.select(
        "event_id", "user_id", "event_type", s.alias("s"), n.alias("n")
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        F.when(
            F.col("n") > 0,
            F.floor(
                F.sqrt(F.col("s").cast("double") / F.col("n").cast("double"))
                * F.lit(1e4)
                + F.lit(0.5)
            ).cast("double")
            / F.lit(1e6),
        ).alias("rvol"),
    )


def win_stochastic(events: DataFrame, period: int = 14, smooth: int = 3) -> DataFrame:
    """Stochastic oscillator per series: %K = 100·(close − low_n)/(high_n
    − low_n) over the trailing ``period`` rows, %D = ``smooth``-row simple
    moving average of %K — the momentum oscillator kdb builds from
    mmax/mmin/mavg (the overbought/oversold companion to win_rsi, which
    measures gain/loss balance instead of range position).

    EXACT cross-engine: the channel extremes are exact cents (min/max,
    no accumulation), so %K is the exact integer ratio 100·(c−lo)/(hi−lo)
    rounded half-up to 6 dp IN INTEGER SPACE (the donchian DIV device) —
    and %D is derived from %K's 1e-6 GRID INTEGERS, not its doubles:
    avg of ``smooth`` grid values k6_i is the exact rational Σk6/smooth,
    integer-rounded again — so no engine ever folds a float. %K is null
    on a flat channel (hi = lo, the 0/0 row); %D is null until ``smooth``
    consecutive non-null %K rows exist (nulls at series heads propagate —
    the standard indicator warm-up contract).

    Same single series-key window shuffle as every win_* op; the %D pass
    reuses the ordering (lag over the same window key — Catalyst plans
    one Exchange, consecutive Window nodes).
    """
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(period - 1), 0)
    )
    c = cents("value")
    t = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        "value",
        c.alias("c"),
        F.max(c).over(w).alias("hi_c"),
        F.min(c).over(w).alias("lo_c"),
    )
    # %K on the 1e-6 integer grid: round(100·(c−lo)/(hi−lo), 6) ⇒
    # (2·10^8·(c−lo) + (hi−lo)) DIV (2·(hi−lo)); numerator ≥ 0 (lo is the
    # frame min), so no sign handling needed
    k6 = F.when(
        F.col("hi_c") > F.col("lo_c"),
        F.expr(
            floor_div_sql(
                "200000000 * CAST(c - lo_c AS DECIMAL(38,0))"
                " + (hi_c - lo_c)",
                "2 * CAST(hi_c - lo_c AS DECIMAL(38,0))",
            )
        ),
    )
    ws = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    t = t.withColumn("k6", k6)
    lags = [F.lag("k6", i).over(ws) for i in range(1, smooth)]
    all_present = F.lit(True)
    for lg in lags:
        all_present = all_present & lg.isNotNull()
    s6 = F.col("k6")
    for lg in lags:
        s6 = s6 + lg
    # %D = round(Σk6/smooth) on the same grid: (2·Σk6 + smooth) DIV (2·smooth)
    d6 = F.when(
        F.col("k6").isNotNull() & all_present,
        F.expr(floor_div_sql(f"2 * s6 + {smooth}", f"2 * {smooth}")),
    )
    return (
        t.withColumn("s6", s6)
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            (F.col("k6").cast("double") / F.lit(1e6)).alias("pct_k"),
            (d6.cast("double") / F.lit(1e6)).alias("pct_d"),
        )
    )


def win_pivot_points(events: DataFrame) -> DataFrame:
    """Classic floor-trader pivot levels per series per day, derived from
    the PREVIOUS day's high/low/close — the support/resistance ladder
    (P = (H+L+C)/3, R1 = 2P−L, S1 = 2P−H, R2 = P+(H−L), S2 = P−(H−L))
    every intraday dashboard draws next to win_donchian's channel. kdb
    parity: a by-day select composed with prior-row arithmetic.

    EXACT cross-engine: H/L/C are exact cents (max/min/last-by of stored
    values), so every level is a rational with denominator 3 (or exact),
    rounded half-away-from-zero to 6 dp IN INTEGER SPACE (the DIV device;
    cents can be negative, so the rounding is sign-aware). The first day
    of each series has no prior day → null levels (standard warm-up).

    Scale shape: ONE fact-sized hash-agg to (series, day) dimension rows
    (map-side combine), then a lag window over the per-day table — the
    window never sees fact rows. Close ties break on (ts_us, event_id)
    via max_by struct, deterministic.
    """
    day = (F.col("ts_us") - F.col("ts_us") % F.lit(DAY_US)).alias("day_us")
    c = cents("value")
    daily = events.groupBy("user_id", "event_type", day).agg(
        F.max(c).alias("h"),
        F.min(c).alias("l"),
        F.max_by(c, pick_key(DAY_US)).alias("cl"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("day_us")
    t = daily.select(
        "user_id",
        "event_type",
        "day_us",
        "n",
        F.lag("h").over(w).alias("ph"),
        F.lag("l").over(w).alias("pl"),
        F.lag("cl").over(w).alias("pc"),
    )

    def lvl(num_sql: str, den: int) -> F.Column:
        # round(num/(100·den), 6) sign-aware in exact decimal space: num
        # is in cents, den the rational denominator (3 for P, 1 for the
        # ladder) — the shared device (kdb_spark/analytics/exact.py)
        return iround_col(num_sql, f"CAST({100 * den} AS DECIMAL(38,0))", 6)

    # P = (H+L+C)/3; R1 = 2P−L ⇒ (2(H+L+C) − 3L)/3 ; S1 ⇒ (2(H+L+C) − 3H)/3
    # R2 = P + (H−L) ⇒ (H+L+C+3(H−L))/3 ; S2 ⇒ (H+L+C−3(H−L))/3 — all /3
    hlc = "(ph + pl + pc)"
    return t.select(
        "user_id",
        "event_type",
        "day_us",
        "n",
        lvl(hlc, 3).alias("pivot"),
        lvl(f"(2 * {hlc} - 3 * pl)", 3).alias("r1"),
        lvl(f"(2 * {hlc} - 3 * ph)", 3).alias("s1"),
        lvl(f"({hlc} + 3 * (ph - pl))", 3).alias("r2"),
        lvl(f"({hlc} - 3 * (ph - pl))", 3).alias("s2"),
    )


def win_aroon(events: DataFrame, k: int = 24) -> DataFrame:
    """Aroon indicator per series: bars since the trailing k+1-row high /
    low and the normalized Aroon-up/down lines — the trend-age companion
    to win_donchian's breakout bands (kdb: mmax/mmin + imax/imin
    composition; the reference's dense grid feeds the same derivation).

    EXACT cross-engine: the frame argmax/argmin are lexicographic
    struct-max picks over (cents, row_pos) — MOST RECENT occurrence wins
    ties on both engines (Spark struct ordering ≡ DuckDB ROW ordering),
    no floats anywhere — and the Aroon lines are exact integer ratios
    100·(m − since)/m over the AVAILABLE frame span m = rows−1 (series
    heads renormalize like win_ewma; m = 0 ⇒ null), rounded half-up to
    4 dp in integer space (the shared decimal device, never
    round(double, 4)).

    Scale shape: ONE series-key Exchange; row_number and the two frame
    struct-maxes share the sort (two Window nodes, zero extra shuffles).
    The struct-max frame buffer is O(k) per partition — no self-join, no
    UDF, whole-stage codegen end to end.
    """
    wo = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    wf = wo.rowsBetween(-k, 0)
    c = cents("value")
    t = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        "value",
        c.alias("c"),
        F.row_number().over(wo).cast("long").alias("pos"),
    )
    hi_pos = F.max(
        F.struct(F.col("c").alias("v"), F.col("pos").alias("p"))
    ).over(wf)["p"]
    lo_pos = F.max(
        F.struct((-F.col("c")).alias("v"), F.col("pos").alias("p"))
    ).over(wf)["p"]
    m = (F.count(F.lit(1)).over(wf) - F.lit(1)).cast("long")
    t2 = t.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (F.col("pos") - hi_pos).alias("since_hi"),
        (F.col("pos") - lo_pos).alias("since_lo"),
        m.alias("m"),
    )
    return t2.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.col("since_hi").alias("since_hi"),
        F.col("since_lo").alias("since_lo"),
        F.when(
            F.col("m") > 0, iround_col("100 * (m - since_hi)", "m", 4, signed=False)
        ).alias("aroon_up"),
        F.when(
            F.col("m") > 0, iround_col("100 * (m - since_lo)", "m", 4, signed=False)
        ).alias("aroon_down"),
    )


def win_ichimoku(
    events: DataFrame, t: int = 8, b: int = 25, sb: int = 51
) -> DataFrame:
    """Ichimoku baseline set per series: Tenkan (conversion, trailing
    t+1-row (hi+lo)/2), Kijun (base, b+1), Senkou A ((Tenkan+Kijun)/2)
    and Senkou B (sb+1-row (hi+lo)/2) — the classic multi-horizon
    midpoint ladder (spans surfaced UNdisplaced; the chart-time +26-bar
    shift is presentation, not computation).

    EXACT cross-engine with NO rounding device at all: every line is a
    midpoint of exact cent integers, and each output grid value is the
    integer (hi+lo)·5000 (x/200 dollars — 10⁶/200 = 5000) or
    (sum₂)·2500 (x/400 — 10⁶/400 = 2500), so the 6 dp value is an exact
    integer-valued double on both engines (domain: |hi+lo|·5000 < 2⁵³ ⇔
    |value| ≲ $9×10⁹, far past the tick domain; document rather than
    branch).

    Scale shape: ONE series-key Exchange; the three frames (t, b, sb)
    are three Window nodes over the SAME sort — Spark shares the
    exchange/sort and each keeps an O(frame) buffer. No joins, no UDF.
    """
    base = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    c = cents("value")

    def mid2(kk: int) -> F.Column:
        w = base.rowsBetween(-kk, 0)
        return (F.max(c).over(w) + F.min(c).over(w)).cast("long")

    sel = events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        mid2(t).alias("t2"),
        mid2(b).alias("b2"),
        mid2(sb).alias("sb2"),
    )
    return sel.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (F.expr("CAST(t2 * 5000 AS DOUBLE)") / F.lit(1e6)).alias("tenkan"),
        (F.expr("CAST(b2 * 5000 AS DOUBLE)") / F.lit(1e6)).alias("kijun"),
        (F.expr("CAST((t2 + b2) * 2500 AS DOUBLE)") / F.lit(1e6)).alias("span_a"),
        (F.expr("CAST(sb2 * 5000 AS DOUBLE)") / F.lit(1e6)).alias("span_b"),
    )


def win_ulcer_index(events: DataFrame, k: int = 13) -> DataFrame:
    """Ulcer index per series: RMS of the trailing-frame drawdown from the
    frame peak — the downside-only volatility number that pairs with
    win_drawdown's running peak and win_realized_vol's two-sided RMS
    (stated over ABSOLUTE cent drawdowns, not percentages: the classic
    %-of-peak form sums rationals with per-row denominators, which no
    exact integer accumulation can carry; the absolute form is an exact
    bigint end to end, same reasoning as win_realized_vol's simple
    differences).

    Two window passes over ONE partitioning (the win_macd shape: dd must
    materialize before the frame can sum its square): peak = frame max in
    exact cents, dd = peak − c ≥ 0, then Σdd² (exact bigint) and n. The
    only float ops are one divide, one sqrt, one divide by 100 — same
    IEEE expression both engines — and the round(·, 4) is the documented
    irrational-statistic class (a rational sqrt requires n·Σdd² to be a
    perfect square, which lands on p/(100n) with n ≤ k+1 — terminating
    far from any 5e-5 half boundary; cf. the agg_stats sd rationale).
    max_dd is the exact frame-max drawdown in dollars. Domain bound:
    |dd| ≤ 3e9 cents keeps dd²·(k+1) inside bigint (the realized_vol
    bound).
    """
    wo = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    wf = wo.rowsBetween(-k, 0)
    c = cents("value")
    t = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        "value",
        c.alias("c"),
        (F.max(c).over(wf) - c).alias("dd"),
    )
    t2 = t.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.sum(F.col("dd") * F.col("dd")).over(wf).alias("sq"),
        F.count(F.lit(1)).over(wf).alias("n"),
        F.max("dd").over(wf).alias("mdd"),
    )
    return t2.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.round(
            F.sqrt(F.expr("CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)")) / F.lit(100.0),
            4,
        ).alias("ulcer"),
        (F.col("mdd").cast("double") / F.lit(100.0)).alias("max_dd"),
    )


def win_trailing_vwap(lineitem: DataFrame, k: int = 9) -> DataFrame:
    """Trailing volume-weighted average price per supplier over the last
    k+1 shipped lines — the rolling execution-quality benchmark every
    trading stack tracks next to its moving averages (agg_vwap is the
    per-bucket batch form; this is its window form over the supplier's
    shipment sequence).

    EXACT cross-engine: price cents and integer quantities are exact
    per-row picks, both frame sums fold in decimal(38,0) (price·qty
    widened INSIDE the sum — the agg_stats r12 rule; a long fold wraps
    past Σ ≈ 9.2e18 cent-units), and vwap = Σ(pc·q)/(100·Σq) rides the
    decimal device to the 1e-6 grid. Zero/negative total quantity →
    null (TPC-H quantities are positive; the guard pins the contract).

    Scale shape: ONE supplier-key Exchange; the deterministic order key
    (shipdate, orderkey, linenumber) is unique, so the frame is stable at
    any parallelism. Both sums share one window buffer.
    """
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-k, 0)
    )
    pc = cents("l_extendedprice")
    q = F.round(F.col("l_quantity")).cast("long")
    t = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.sum(pc.cast("decimal(38,0)") * q).over(w).alias("nq"),
        F.sum(q).over(w).cast("long").alias("dq"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_lines"),
    )
    return t.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "n_lines",
        F.when(
            F.col("dq") > 0,
            iround_col("nq", "100 * CAST(dq AS DECIMAL(38,0))", 6, signed=False),
        ).alias("vwap"),
    )


def win_obv(lineitem: DataFrame) -> DataFrame:
    """On-balance volume per supplier shipment sequence: the running sum
    of quantity signed by the price direction (up-move adds the line's
    quantity, down-move subtracts, flat adds nothing) — the classic
    volume-confirms-price accumulation signal, completing the
    win_trailing_vwap pair on the lineitem sequence.

    EXACT cross-engine, all integers: the price delta sign compares exact
    cents (one lag), quantities are exact integer picks, and OBV is an
    unbounded-preceding bigint window sum — order-independent per prefix
    given the unique (shipdate, orderkey, linenumber) sort key. The
    sequence head (no prior price) contributes 0, per the indicator's
    convention. obv is surfaced as the exact integer quantity sum.

    Scale shape: ONE supplier-key Exchange; the lag and the running sum
    share the sort (two Window nodes, no second shuffle). Domain: Σ|q|
    per supplier < 2⁶³ (bigint) — beyond any order book.
    """
    wo = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    wrun = wo.rowsBetween(Window.unboundedPreceding, 0)
    pc = cents("l_extendedprice")
    q = F.round(F.col("l_quantity")).cast("long")
    t = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_shipdate",
        q.alias("q"),
        (pc - F.lag(pc).over(wo)).alias("dp"),
    )
    signed = (
        F.when(F.col("dp") > 0, F.col("q"))
        .when(F.col("dp") < 0, -F.col("q"))
        .otherwise(F.lit(0))
    )
    t2 = t.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_shipdate",
        signed.alias("sq"),
    )
    return t2.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.sum("sq").over(wrun).cast("long").alias("obv"),
    )


def win_williams_r(events: DataFrame, period: int = 14) -> DataFrame:
    """Williams %R per series: −100·(high_n − close)/(high_n − low_n) over
    the trailing ``period`` rows — the inverted range-position oscillator
    (kdb builds it from mmax/mmin exactly like the stochastic %K; %R is
    %K − 100, surfaced in the conventional [−100, 0] band).

    EXACT cross-engine: channel extremes are exact cents (min/max, no
    accumulation); hi−c and hi−lo are non-negative integers, so the ratio
    rides the unsigned decimal floor-division device at 6 dp and the one
    negation afterwards is exact (round half-away-from-zero is symmetric:
    −round(x) = round(−x)). Flat channels (hi = lo) emit NULL — the 0/0
    row, same contract as win_stochastic.

    Scale shape: ONE series-key Exchange shared by both frame extremes
    (two aggregates over the same Window spec plan into a single Window
    node); no join, no UDF, whole-stage codegen end to end.
    """
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(period - 1), 0)
    )
    c = cents("value")
    t = events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        c.alias("c"),
        F.max(c).over(w).alias("hi_c"),
        F.min(c).over(w).alias("lo_c"),
    )
    # −100·(hi−c)/(hi−lo) on the 1e-6 grid: numerator ≥ 0 (hi is the frame
    # max) so the device runs unsigned; negate the exact grid integer
    r6 = F.when(
        F.col("hi_c") > F.col("lo_c"),
        -F.expr(
            floor_div_sql(
                "200000000 * CAST(hi_c - c AS DECIMAL(38,0))"
                " + (hi_c - lo_c)",
                "2 * CAST(hi_c - lo_c AS DECIMAL(38,0))",
            )
        ),
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (r6.cast("double") / F.lit(1e6)).alias("willr"),
    )


def win_mfi(lineitem: DataFrame, period: int = 14) -> DataFrame:
    """Money Flow Index over the supplier shipment sequence: volume-scaled
    RSI. Raw money flow = price·quantity; flows split positive/negative by
    the price delta sign (flat deltas and the sequence head join neither
    side, the classic convention); MFI = 100·PMF/(PMF+NMF) over the
    trailing ``period`` rows. Completes the volume-indicator pair begun by
    win_obv (direction-signed volume) with magnitude-weighted flow.

    EXACT cross-engine: flows stay in BIGINT end to end — the frame sum
    is bounded by ``period`` rows (never corpus-sized), so pc·q only has
    to fit int64/(100·period) per row (the device's 100·pmf numerator is
    the tightest long), and the inputs are range-guarded with a labeled
    raise (pc < 2^33 ≈ $86M/line, q < 2^16 units) BEFORE the multiply
    so an out-of-domain feed fails loudly instead of wrapping (r16: the
    former decimal(38,0) flow demoted both frame sums to per-row
    BigDecimal accumulation — the window stage ran ~4× slower for a
    width no bounded frame can need). Long sums of exact integers are
    order-independent; the index is the exact rational 100·pmf/(pmf+nmf)
    through the unsigned decimal device at 6 dp (the device widens its
    numerator itself). All-flat frames (pmf+nmf = 0) emit NULL. pmf/nmf
    surface as BIGINT cent·unit flows.

    Scale shape: ONE supplier-key Exchange; the lag and the two frame
    sums share the sort (consecutive Window nodes, no second shuffle).
    """
    wo = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    wf = wo.rowsBetween(-(period - 1), 0)
    pc = cents("l_extendedprice")
    q = F.round(F.col("l_quantity")).cast("long")
    t = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_shipdate",
        pc.alias("pc"),
        q.alias("q"),
        (pc - F.lag(pc).over(wo)).alias("dp"),
    )
    zero = F.lit(0).cast("long")
    # per-row flow < 2^49, so 100 × a `period`-row frame sum (the widest
    # long the device computes) stays under 2^60; the guard raises before
    # the long multiply could ever wrap
    flow = F.expr(
        "CASE WHEN pc < 8589934592 AND q < 65536 THEN pc * q "
        "ELSE raise_error(concat('win_mfi: flow operands outside the "
        "int64 pack domain: pc=', CAST(pc AS STRING), ' q=', "
        "CAST(q AS STRING))) END"
    )
    t2 = t.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_shipdate",
        F.when(F.col("dp") > 0, flow).otherwise(zero).alias("pf"),
        F.when(F.col("dp") < 0, flow).otherwise(zero).alias("nf"),
    )
    s = t2.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.sum("pf").over(wf).alias("pmf"),
        F.sum("nf").over(wf).alias("nmf"),
    )
    mfi = F.when(
        (F.col("pmf") + F.col("nmf")) > 0,
        iround_col("100 * pmf", "pmf + nmf", 6, signed=False),
    )
    return s.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.col("pmf").cast("long").alias("pmf_c"),
        F.col("nmf").cast("long").alias("nmf_c"),
        mfi.alias("mfi"),
    )


def win_cci(events: DataFrame, period: int = 20) -> DataFrame:
    """Commodity Channel Index per series over the trailing ``period``
    rows: CCI = (p − SMA)/(0.015·MD) where MD is the mean absolute
    deviation FROM THE CURRENT FRAME'S SMA — the indicator whose inner
    statistic (every frame row re-compared against the frame mean) plain
    window aggregates cannot express. tp = the tick price itself (the
    single-price series form; the H/L/C typical-price variant is the same
    arithmetic on agg_ohlc's outputs).

    EXACT cross-engine: with L = frame length, S = Σc, CCI is the exact
    rational 1000·L·(c·L − S) / (15·Σ|cⱼ·L − S|) — clearing denominators
    makes every intermediate an integer, so the frame's cents array is
    folded with a higher-order ``aggregate`` (order-independent: a sum of
    absolute values), and the ratio rides the sign-aware decimal device
    at 6 dp. Zero deviation (flat frame) emits NULL. The DuckDB oracle
    computes the same integers via list(c) OVER + list_transform/
    list_sum — different surface syntax, identical arithmetic.

    Scale shape: ONE series-key Exchange; the frame materializes ≤
    ``period`` bigints per row (collect_list over a bounded rows-frame —
    NOT a per-group collect), folded in whole-stage codegen. Bytes/row ~
    8·period; at period=20 that is the cost of two decimals.
    """
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(period - 1), 0)
    )
    c = cents("value")
    t = events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        c.alias("c"),
        F.collect_list(c).over(w).alias("cs"),
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "c",
        "cs",
        F.expr("CAST(size(cs) AS BIGINT)").alias("l"),
        F.expr(
            "aggregate(cs, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("s"),
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "c",
        "l",
        "s",
        # |x·L − S| folded against the ALREADY-computed frame sum — one
        # linear pass; the lambda captures the row's l/s columns
        F.expr(
            "aggregate(cs, CAST(0 AS BIGINT), (acc, x) -> acc + abs(x * l - s))"
        ).alias("dev"),
    )
    cci6 = F.when(
        F.col("dev") > 0,
        F.expr(
            "(CASE WHEN c * l - s < 0 THEN -1 ELSE 1 END) * "
            + floor_div_sql(
                "2000000 * CAST(1000 AS DECIMAL(38,0)) * l * abs(c * l - s)"
                " + 15 * CAST(dev AS DECIMAL(38,0))",
                "2 * 15 * CAST(dev AS DECIMAL(38,0))",
            )
        ),
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (cci6.cast("double") / F.lit(1e6)).alias("cci"),
    )


def win_since_event(events: DataFrame, target: str = "purchase") -> DataFrame:
    """Time since the last ``target`` event per user, at every row — the
    feature-store staple ("seconds since last purchase") and the recency
    feature behind churn/propensity models; kdb's fills-on-a-condition
    idiom. Also surfaces the running count of target events seen.

    EXACT cross-engine: pure integer µs arithmetic — the last target
    timestamp is max(CASE WHEN target THEN ts END) over the unbounded
    trailing frame (max ≡ latest because the frame is ordered by ts), the
    gap is one subtraction, and rows before a user's first target event
    emit NULL. A target row itself reports 0 (the frame is inclusive).
    No rounding device — nothing here is a ratio.

    Scale shape: ONE user-key Exchange; both running aggregates share the
    frame buffer. The state is two longs per row in flight — this is the
    batch twin of a trivially stateful streaming op.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_t = F.col("event_type") == target
    last_t = F.max(F.when(is_t, F.col("ts_us"))).over(w)
    n_t = F.sum(F.when(is_t, 1).otherwise(0)).over(w).cast("long")
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        (F.col("ts_us") - last_t).cast("long").alias("since_us"),
        n_t.alias("n_target_so_far"),
    )


def win_vwap_dev(lineitem: DataFrame, k: int = 9) -> DataFrame:
    """Price deviation from the trailing VWAP per supplier — the
    execution-quality/slippage metric every trading stack reads next to
    win_trailing_vwap itself: dev = (p − vwap)/vwap over the same k+1-line
    frame. Positive = this line printed rich to the supplier's recent
    volume-weighted average.

    EXACT cross-engine: with nq = Σ(pc·q) and dq = Σq over the frame
    (both exact decimal/integer sums), the deviation is the exact
    rational (pc·dq − nq)/nq — denominator-cleared so no float folds —
    on the sign-aware decimal device at 6 dp. TPC-H prices are positive
    so nq > 0 whenever dq > 0; both guarded anyway (NULL on an empty
    flow frame).

    Scale shape: identical to win_trailing_vwap — ONE supplier-key
    Exchange, both frame sums share the buffer, unique sort key.
    """
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-k, 0)
    )
    pc = cents("l_extendedprice")
    q = F.round(F.col("l_quantity")).cast("long")
    t = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        pc.alias("pc"),
        F.sum(pc.cast("decimal(38,0)") * q).over(w).alias("nq"),
        F.sum(q).over(w).cast("long").alias("dq"),
    )
    dev6 = F.when(
        (F.col("dq") > 0) & (F.col("nq") > 0),
        iround_col(
            "CAST(pc AS DECIMAL(38,0)) * dq - nq",
            "nq",
            6,
            signed=True,
        ),
    )
    return t.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        dev6.alias("vwap_dev"),
    )


def win_rolling_beta(events: DataFrame, hours: int = 24) -> DataFrame:
    """Rolling flow beta per (user, event_type): the OLS slope of the
    user's hourly value flow against the market's (all users, same type)
    over the user's trailing ``hours`` ACTIVE hours — "how levered is
    this account to the market tide", the canonical exposure feature.
    Flow beta (sums, not means) keeps every input an exact integer;
    trailing-active-hours (rows frame, not a spine fill) is the
    documented frame semantics — silent hours don't dilute the window.

    EXACT cross-engine: hourly user flows y and market flows x are exact
    cent sums; the frame co-moments Σx, Σy, Σxy, Σxx fold in
    decimal(38,0) (products widened inside the sum), and beta =
    (L·Σxy − Σx·Σy)/(L·Σxx − (Σx)²) is an exact rational on the
    sign-aware device at 6 dp. Degenerate frames (L < 2 or constant
    market flow) emit NULL. Domain: L·Σxx ~ hours²·x² ≤ 10³⁸ holds to
    x ≈ 10¹⁷ cents/hour market flow — beyond any book.

    Scale shape: one fact-sized (user, type, hour) hash agg, one
    dimension-sized (type, hour) market agg broadcast back onto it, then
    ONE (user, type)-key window Exchange. The market join is
    hours·types-small by construction.
    """
    hour = F.expr(f"ts_us div {HOUR_US}").cast("long").alias("h")
    c = cents("value")
    user_h = (
        events.select("user_id", "event_type", hour, c.alias("c"))
        .groupBy("user_id", "event_type", "h")
        .agg(F.sum("c").cast("long").alias("y"))
    )
    mkt_h = (
        events.select("event_type", hour, c.alias("c"))
        .groupBy("event_type", "h")
        .agg(F.sum("c").cast("long").alias("x"))
    )
    t = user_h.join(F.broadcast(mkt_h), ["event_type", "h"])
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("h")
        .rowsBetween(-(hours - 1), 0)
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    f = t.select(
        "user_id",
        "event_type",
        "h",
        F.count(F.lit(1)).over(w).cast("long").alias("l"),
        F.sum(xd).over(w).alias("sx"),
        F.sum(yd).over(w).alias("sy"),
        F.sum(xd * F.col("y")).over(w).alias("sxy"),
        F.sum(xd * F.col("x")).over(w).alias("sxx"),
    )
    beta6 = F.when(
        (F.col("l") > 1)
        & (F.expr("CAST(l AS DECIMAL(38,0)) * sxx - sx * sx") > 0),
        F.expr(
            "(CASE WHEN CAST(l AS DECIMAL(38,0)) * sxy - sx * sy < 0"
            " THEN -1 ELSE 1 END) * "
            + floor_div_sql(
                "2000000 * abs(CAST(l AS DECIMAL(38,0)) * sxy - sx * sy)"
                " + (CAST(l AS DECIMAL(38,0)) * sxx - sx * sx)",
                "2 * (CAST(l AS DECIMAL(38,0)) * sxx - sx * sx)",
            )
        ).cast("double")
        / F.lit(1e6),
    )
    return f.select(
        "user_id",
        "event_type",
        "h",
        "l",
        beta6.alias("beta"),
    )


def win_atr(events: DataFrame, period: int = 14) -> DataFrame:
    """Average True Range over the hourly candle series per event_type —
    the volatility unit every stop-loss/position-sizing rule is quoted
    in. Candles come from the agg_ohlc rollup (exact min/max/min_by/
    max_by picks); TR = max(h−l, |h−prev_close|, |l−prev_close|) is pure
    integer cents arithmetic; ATR = the exact rational ΣTR/L over the
    trailing ``period`` candles on the unsigned device at 6 dp (dollars).
    The first candle (no prev close) uses TR = h−l, the standard Wilder
    seed; no warm-up gating — the frame average is over observed candles
    (L = frame length), documented like win_cci.

    Scale shape: one fact-sized (type, hour) hash agg collapses the tick
    stream to candles, then ONE type-key window Exchange over the
    dimension-sized candle table — the lag and the frame sum share the
    sort. The window NEVER sees fact rows (the win_pivot_points posture).
    """
    candles = (
        events.groupBy(
            "event_type",
            (F.col("ts_us") - F.col("ts_us") % F.lit(HOUR_US)).alias("hour_us"),
        )
        .agg(
            F.max(cents("value")).alias("h"),
            F.min(cents("value")).alias("l"),
            F.max_by(cents("value"), pick_key(HOUR_US)).alias("c"),
        )
    )
    wo = Window.partitionBy("event_type").orderBy("hour_us")
    wf = wo.rowsBetween(-(period - 1), 0)
    t = candles.select(
        "event_type",
        "hour_us",
        "h",
        "l",
        "c",
        F.lag("c").over(wo).alias("pc"),
    ).select(
        "event_type",
        "hour_us",
        F.when(
            F.col("pc").isNotNull(),
            F.greatest(
                F.col("h") - F.col("l"),
                F.abs(F.col("h") - F.col("pc")),
                F.abs(F.col("l") - F.col("pc")),
            ),
        )
        .otherwise(F.col("h") - F.col("l"))
        .cast("long")
        .alias("tr_c"),
    )
    s = t.select(
        "event_type",
        "hour_us",
        "tr_c",
        F.sum(F.col("tr_c").cast("decimal(38,0)")).over(wf).alias("str_c"),
        F.count(F.lit(1)).over(wf).cast("long").alias("l"),
    )
    atr6 = iround_col("str_c", "100 * CAST(l AS DECIMAL(38,0))", 6, signed=False)
    return s.select(
        "event_type",
        "hour_us",
        (F.col("tr_c").cast("double") / F.lit(100.0)).alias("tr"),
        atr6.alias("atr"),
    )


def win_vortex(events: DataFrame, period: int = 14) -> DataFrame:
    """Vortex Indicator (VI+/VI−) over the hourly candle series per
    event_type — the trend-reversal oscillator built from directional
    range movement (uptrend pressure |h−prev_l| vs downtrend pressure
    |l−prev_h|, each normalized by true range). Complements win_atr
    (same candle spine, same TR) and win_aroon (argmax-based trend).

    Exact cross-engine: candles are exact cent picks (agg_ohlc rollup),
    VM+/VM−/TR are integer cents arithmetic, the trailing ``period``
    sums fold in decimal(38,0), and VI = ΣVM/ΣTR is ONE unsigned integer
    device round at 6 dp. First candle of a series has no prev and is
    EXCLUDED from all three sums (the standard vortex seed — unlike
    ATR's Wilder h−l seed); an all-flat frame (ΣTR = 0) yields null.

    Scale shape: identical to win_atr — one fact-sized (type, hour) hash
    agg to candles, then ONE type-key window Exchange over the
    dimension-sized candle table; lag and both frame sums share the sort.
    """
    candles = (
        events.groupBy(
            "event_type",
            (F.col("ts_us") - F.col("ts_us") % F.lit(HOUR_US)).alias("hour_us"),
        )
        .agg(
            F.max(cents("value")).alias("h"),
            F.min(cents("value")).alias("l"),
            F.max_by(cents("value"), pick_key(HOUR_US)).alias("c"),
        )
    )
    wo = Window.partitionBy("event_type").orderBy("hour_us")
    wf = wo.rowsBetween(-(period - 1), 0)
    t = candles.select(
        "event_type",
        "hour_us",
        "h",
        "l",
        F.lag("h").over(wo).alias("ph"),
        F.lag("l").over(wo).alias("pl"),
        F.lag("c").over(wo).alias("pc"),
    ).select(
        "event_type",
        "hour_us",
        F.abs(F.col("h") - F.col("pl")).cast("long").alias("vmp_c"),
        F.abs(F.col("l") - F.col("ph")).cast("long").alias("vmm_c"),
        F.when(
            F.col("pc").isNotNull(),
            F.greatest(
                F.col("h") - F.col("l"),
                F.abs(F.col("h") - F.col("pc")),
                F.abs(F.col("l") - F.col("pc")),
            ),
        ).cast("long").alias("tr_c"),
    )
    s = t.select(
        "event_type",
        "hour_us",
        F.sum(F.col("vmp_c").cast("decimal(38,0)")).over(wf).alias("svmp"),
        F.sum(F.col("vmm_c").cast("decimal(38,0)")).over(wf).alias("svmm"),
        F.sum(F.col("tr_c").cast("decimal(38,0)")).over(wf).alias("strc"),
    )
    vip = iround_col("svmp", "strc", 6, signed=False)
    vim = iround_col("svmm", "strc", 6, signed=False)
    return s.select(
        "event_type",
        "hour_us",
        F.when(F.col("strc") > 0, vip).alias("vi_plus"),
        F.when(F.col("strc") > 0, vim).alias("vi_minus"),
    )


def win_tsi(
    events: DataFrame, slow: float = 0.15, fast: float = 0.4
) -> DataFrame:
    """True Strength Index per (user, event_type) series: 100 × double-
    smoothed momentum / double-smoothed |momentum| — the zero-centered
    momentum oscillator (win_rsi ratios gains vs losses; TSI double-
    smooths the raw delta, so it leads RSI at turns).

    Same finite-horizon quantized-EWMA composition as win_macd: stage-1
    folds momentum and |momentum| in exact bigint cents with the integer
    weights of ewma_weights_int(slow); the two rationals are quantized
    ONCE to the 10^-4 grid by sign-aware integer floor-division (e4, not
    macd's e6 — the second fold multiplies by the 10^6 weight grid, and
    e4 keeps |fold| ≤ ~1e17, inside int64 for |momentum| up to ~$10M);
    stage-2 folds those exact grid integers with ewma_weights_int(fast).
    tsi = 100·n2/a2 is one signed integer device round at 4 dp. The
    series head (no lag → null momentum) is excluded from both folds by
    the lag chain's null contract; an all-flat horizon (a2 = 0) is null.

    Scale shape: two Window nodes over ONE (user, type) Exchange —
    stage-1 must materialize before stage-2 can lag over it, exactly the
    win_macd signal-line plan.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    xc = cents("value")
    mom = (xc - F.lag(xc).over(w)).cast("long")
    m = events.select(
        "event_id", "user_id", "event_type", "ts_us", mom.alias("mom_c")
    )
    # array folds (win_ewma's r14 device): 4 collect_list window
    # expressions instead of 4 × 16 lag() calls — same exact semantics,
    # a fraction of the codegen
    n1, d1 = _ewma_terms_array(F.col("mom_c"), slow, w)
    a1, _ = _ewma_terms_array(F.abs("mom_c"), slow, w)
    g = m.select(
        "event_id", "user_id", "event_type", "ts_us",
        n1.alias("n1"), a1.alias("a1"), d1.alias("d1"),
    ).select(
        "event_id", "user_id", "event_type", "ts_us",
        F.when(
            F.col("d1") > 0,
            F.expr(
                "(CASE WHEN n1 < 0 THEN -1 ELSE 1 END) * "
                + floor_div_sql(
                    "20000 * CAST(abs(n1) AS DECIMAL(38,0)) + d1", "2 * d1"
                )
            ),
        ).cast("long").alias("s1_e4"),
        F.when(
            F.col("d1") > 0,
            F.expr(
                floor_div_sql("20000 * CAST(a1 AS DECIMAL(38,0)) + d1", "2 * d1")
            ),
        ).cast("long").alias("a1_e4"),
    )
    n2, d2 = _ewma_terms_array(F.col("s1_e4"), fast, w)
    a2, _ = _ewma_terms_array(F.col("a1_e4"), fast, w)
    t = g.select(
        "event_id", "user_id", "event_type",
        n2.alias("n2"), a2.alias("a2"),
    )
    tsi4 = iround_col("100 * CAST(n2 AS DECIMAL(38,0))", "CAST(a2 AS DECIMAL(38,0))", 4)
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        F.when(F.col("a2") > 0, tsi4).alias("tsi"),
    )


def win_adx(events: DataFrame, period: int = 14) -> DataFrame:
    """Directional movement index (+DI / −DI / DX) over the hourly candle
    series per event_type — the trend-STRENGTH gauge (win_vortex measures
    reversal pressure off the same spine; classic ADX further smooths DX
    with Wilder recursion, which is deliberately omitted: the frame-sum
    form is the exact, stateless variant, documented like the finite-
    horizon EWMA family).

    +DM = h−prev_h when that up-move exceeds the down-move pl−l (else 0),
    −DM symmetrically; both integer cents. Over the trailing ``period``
    frame: +DI = Σ+DM/ΣTR, −DI = Σ−DM/ΣTR, and DX = |Σ+DM − Σ−DM| /
    (Σ+DM + Σ−DM) — the common ΣTR denominator cancels, so DX is one
    exact integer ratio. Three unsigned device rounds at 6 dp. First
    candle (no prev) is excluded from every sum; ΣTR = 0 (flat frame) or
    Σ+DM + Σ−DM = 0 (no directional movement) yield null.

    Scale shape: the win_atr/win_vortex posture — one fact-sized
    (type, hour) hash agg to candles, one type-key window Exchange over
    the dimension-sized candle table.
    """
    candles = (
        events.groupBy(
            "event_type",
            (F.col("ts_us") - F.col("ts_us") % F.lit(HOUR_US)).alias("hour_us"),
        )
        .agg(
            F.max(cents("value")).alias("h"),
            F.min(cents("value")).alias("l"),
            F.max_by(cents("value"), pick_key(HOUR_US)).alias("c"),
        )
    )
    wo = Window.partitionBy("event_type").orderBy("hour_us")
    wf = wo.rowsBetween(-(period - 1), 0)
    up = F.col("h") - F.col("ph")
    dn = F.col("pl") - F.col("l")
    t = candles.select(
        "event_type",
        "hour_us",
        "h",
        "l",
        F.lag("h").over(wo).alias("ph"),
        F.lag("l").over(wo).alias("pl"),
        F.lag("c").over(wo).alias("pc"),
    ).select(
        "event_type",
        "hour_us",
        F.when((up > dn) & (up > 0), up).otherwise(
            F.when(F.col("ph").isNotNull(), F.lit(0))
        ).cast("long").alias("pdm_c"),
        F.when((dn > up) & (dn > 0), dn).otherwise(
            F.when(F.col("pl").isNotNull(), F.lit(0))
        ).cast("long").alias("mdm_c"),
        F.when(
            F.col("pc").isNotNull(),
            F.greatest(
                F.col("h") - F.col("l"),
                F.abs(F.col("h") - F.col("pc")),
                F.abs(F.col("l") - F.col("pc")),
            ),
        ).cast("long").alias("tr_c"),
    )
    s = t.select(
        "event_type",
        "hour_us",
        F.sum(F.col("pdm_c").cast("decimal(38,0)")).over(wf).alias("spdm"),
        F.sum(F.col("mdm_c").cast("decimal(38,0)")).over(wf).alias("smdm"),
        F.sum(F.col("tr_c").cast("decimal(38,0)")).over(wf).alias("strc"),
    )
    pdi = iround_col("spdm", "strc", 6, signed=False)
    mdi = iround_col("smdm", "strc", 6, signed=False)
    dx = iround_col("abs(spdm - smdm)", "spdm + smdm", 6, signed=False)
    return s.select(
        "event_type",
        "hour_us",
        F.when(F.col("strc") > 0, pdi).alias("plus_di"),
        F.when(F.col("strc") > 0, mdi).alias("minus_di"),
        F.when(F.col("spdm") + F.col("smdm") > 0, dx).alias("dx"),
    )


def win_ppo(
    events: DataFrame, fast: float = 0.4, slow: float = 0.15
) -> DataFrame:
    """Percentage Price Oscillator per series: 100·(EWMA_fast −
    EWMA_slow)/EWMA_slow — win_macd's spread NORMALIZED by the slow
    line, so the oscillator is comparable across series of different
    price levels (a $5 and a $500 series read on one scale; MACD's
    absolute spread does not).

    Exactness: the two finite-horizon integer-weight folds (the win_ewma
    array device) make ppo = 100·(nf·sd − ns·fd)/(ns·fd) one exact
    rational of decimal(38,0) products, rounded once by the signed
    device at 4 dp. Guard: the slow line must be POSITIVE (ns > 0) — on
    this schema values are non-negative so ns = 0 means an all-zero
    horizon (ppo undefined, null); a hypothetical negative-price series
    would need a magnitude-normalized variant, disclosed not guessed.

    Scale shape: one (user, type) Exchange, ONE Window node (both folds
    share the spec), map-only arithmetic after.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    xc = cents("value")
    nf, fd = _ewma_terms_array(xc, fast, w)
    ns, sd = _ewma_terms_array(xc, slow, w)
    t = events.select(
        "event_id", "user_id", "event_type",
        nf.alias("nf"), fd.alias("fd"), ns.alias("ns"), sd.alias("sd"),
    )
    ppo4 = iround_col(
        "100 * (CAST(nf AS DECIMAL(38,0)) * sd - CAST(ns AS DECIMAL(38,0)) * fd)",
        "CAST(ns AS DECIMAL(38,0)) * fd",
        4,
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        F.when(F.col("ns") > 0, ppo4).alias("ppo"),
    )


def win_roc(events: DataFrame, k: int = 10) -> DataFrame:
    """Rate of change per series: 100·(x_t − x_{t−k})/x_{t−k} — the
    normalized momentum line (win_lag_delta reports the raw difference;
    ROC is comparable across price levels, the same normalization win_ppo
    applies to macd). One lag over the series window, the ratio of exact
    integer cents on the signed device at 4 dp; series heads (no k-lag)
    and zero/negative base values surface null (the base must be > 0 for
    the percentage to mean anything — disclosed, not guessed).
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    xc = cents("value")
    t = events.select(
        "event_id", "user_id", "event_type",
        xc.alias("c"),
        F.lag(xc, k).over(w).alias("pc"),
    )
    roc4 = iround_col(
        "100 * CAST(c - pc AS DECIMAL(38,0))", "CAST(pc AS DECIMAL(38,0))", 4
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        F.when(F.col("pc") > 0, roc4).alias("roc"),
    )


def win_swing_points(events: DataFrame, k: int = 2) -> DataFrame:
    """Swing-point (Williams fractal) detection per series: a row is a
    swing HIGH when its price equals the maximum of the CENTERED
    ±``k``-row frame, a swing LOW symmetrically — the support/resistance
    primitive chart patterns are built from, and the repo's first
    centered-frame window (every other win_* frame trails).

    Tie semantics: equal extremes within one frame all flag (c = frame
    max — the inclusive fractal convention; a strict variant would drop
    plateaus entirely, which loses double-tops). Boundary rows whose
    frame is short (fewer than 2k+1 rows — series head/tail) never flag:
    a swing needs ``k`` confirmations on BOTH sides, so flags near the
    live edge must wait — the standard repaint-avoidance contract.

    EXACT cross-engine: min/max/count over exact cents, boolean
    predicates — no arithmetic to round at all.

    Scale shape: ONE series-key Exchange; all three frame aggregates
    share the centered window buffer.
    """
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-k, k)
    )
    c = cents("value")
    full = F.count(F.lit(1)).over(w) == (2 * k + 1)
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (full & (c == F.max(c).over(w))).alias("swing_high"),
        (full & (c == F.min(c).over(w))).alias("swing_low"),
    )


def win_dpo(events: DataFrame, period: int = 20) -> DataFrame:
    """Detrended Price Oscillator per series: price minus the ``period``-
    row SMA displaced period/2+1 rows back — the cycle-isolation
    transform (removing the trend leaves the oscillation; kdb: price -
    mavg shifted). Standard displacement keeps the SMA centered on the
    cycle being measured rather than lagging it.

    EXACT cross-engine: the displaced frame [−(period + period/2),
    −(period/2 + 1)] sums exact cents; DPO = (c·L − S)/(100·L) rides the
    sign-aware device at 6 dp (dollars). Rows whose displaced frame is
    empty (series head) emit NULL; a short head frame averages what
    exists — the win_cci observed-rows contract.

    Scale shape: ONE series-key window Exchange, one frame buffer.
    """
    half = period // 2 + 1
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(period + period // 2), -half)
    )
    c = cents("value")
    t = events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        c.alias("c"),
        F.sum(c.cast("decimal(38,0)")).over(w).alias("s"),
        F.count(F.lit(1)).over(w).cast("long").alias("l"),
    )
    dpo6 = F.when(
        F.col("l") > 0,
        F.expr(
            "(CASE WHEN CAST(c AS DECIMAL(38,0)) * l - s < 0"
            " THEN -1 ELSE 1 END) * "
            + floor_div_sql(
                "2000000 * abs(CAST(c AS DECIMAL(38,0)) * l - s)"
                " + 100 * CAST(l AS DECIMAL(38,0))",
                "2 * 100 * CAST(l AS DECIMAL(38,0))",
            )
        ).cast("double")
        / F.lit(1e6),
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        dpo6.alias("dpo"),
    )


def win_relative_volume(lineitem: DataFrame, k: int = 4) -> DataFrame:
    """Relative volume per supplier line: this line's quantity against
    the mean of the supplier's trailing ``k`` PRIOR quantities — the
    "is this print unusually large" feature (relative volume is how
    surveillance and execution algos normalize raw size; win_vwap_dev
    normalizes price the same way).

    EXACT cross-engine: quantities are exact integers, the prior-frame
    mean clears denominators — rvol = q·L/Σq on the sign-free device at
    6 dp (quantities ≥ 0; zero prior volume → NULL). Sequence heads
    (no prior rows) are NULL.

    Scale shape: identical to the other supplier-sequence windows — ONE
    supplier-key Exchange, prior-rows frame [−k, −1].
    """
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-k, -1)
    )
    q = F.round(F.col("l_quantity")).cast("long")
    t = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        q.alias("q"),
        F.sum(q).over(w).cast("long").alias("sq"),
        F.count(F.lit(1)).over(w).cast("long").alias("l"),
    )
    rvol6 = F.when(
        F.col("sq") > 0,
        iround_col(
            "CAST(q AS DECIMAL(38,0)) * l",
            "CAST(sq AS DECIMAL(38,0))",
            6,
            signed=False,
        ),
    )
    return t.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "q",
        rvol6.alias("rvol"),
    )


def win_ratios(events: DataFrame) -> DataFrame:
    """kdb's ``ratios`` verb per series: x / prev(x) — the price-relative
    series every compounding/return calculation starts from (`deltas` is
    win_lag_delta; this is its multiplicative twin, completing the kdb
    adverb-pair). Also surfaces the simple return (ratio − 1).

    EXACT cross-engine: the ratio of two exact cents values is an exact
    rational on the sign-aware decimal device at 6 dp (prices can be
    negative in the general events schema, so sign-aware; prev = 0 rows
    and series heads emit NULL — kdb's head convention is the identity,
    but NULL is the honest SQL surface and is pinned here).

    Scale shape: ONE series-key Exchange, one lag.
    """
    wo = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    c = cents("value")
    t = events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        c.alias("c"),
        F.lag(c).over(wo).alias("pc"),
    )
    ratio6 = F.when(
        F.col("pc").isNotNull() & (F.col("pc") != 0),
        F.expr(
            "(CASE WHEN (CASE WHEN pc < 0 THEN -c ELSE c END) < 0"
            " THEN -1 ELSE 1 END) * "
            + floor_div_sql(
                "2000000 * abs(CAST(c AS DECIMAL(38,0))) + abs(pc)",
                "2 * abs(CAST(pc AS DECIMAL(38,0)))",
            )
        ).cast("double")
        / F.lit(1e6),
    )
    # simple return on the SAME grid: (c−pc)/pc device — NOT ratio−1 on
    # doubles (the grid of c/pc and of (c−pc)/pc differ at half points;
    # each is device-exact in its own right, so surface both explicitly)
    ret6 = F.when(
        F.col("pc").isNotNull() & (F.col("pc") != 0),
        F.expr(
            "(CASE WHEN (CASE WHEN pc < 0 THEN -(c - pc) ELSE c - pc END) < 0"
            " THEN -1 ELSE 1 END) * "
            + floor_div_sql(
                "2000000 * abs(CAST(c - pc AS DECIMAL(38,0))) + abs(pc)",
                "2 * abs(CAST(pc AS DECIMAL(38,0)))",
            )
        ).cast("double")
        / F.lit(1e6),
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        ratio6.alias("ratio"),
        ret6.alias("ret"),
    )


def win_trailing_twap(events: DataFrame, k: int = 9) -> DataFrame:
    """Trailing TIME-weighted average price per series over the last k+1
    ticks: each price weighted by how long it was in force (the gap to
    the next tick; the newest tick carries zero elapsed time and so zero
    weight) — the execution benchmark for irregular tapes, where
    win_moving_avg's tick weighting over-counts bursts (agg_twap is the
    bucketed batch form; this is its rolling window).

    EXACT cross-engine: weights are exact µs gaps (lead ts − ts), the
    weighted sum folds pc·gap in decimal(38,0) INSIDE the frame sum, and
    twap = Σ(pc·gap)/(100·Σgap) rides the unsigned decimal device at
    6 dp (dollars). Frames whose total in-force time is zero (single
    tick, or the series tail where only the zero-weight newest tick is
    in frame... impossible past length 1 — gaps are ≥ 0 with ties
    allowed) emit NULL.

    Scale shape: ONE series-key Exchange; the lead and both frame sums
    share the sort.
    """
    wo = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    wf = wo.rowsBetween(-k, 0)
    c = cents("value")
    t = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        c.alias("pc"),
        (F.coalesce(F.lead("ts_us").over(wo), F.col("ts_us")) - F.col("ts_us"))
        .cast("long")
        .alias("gap"),
    )
    s = t.select(
        "event_id",
        "user_id",
        "event_type",
        F.sum(F.expr("CAST(pc AS DECIMAL(38,0)) * gap")).over(wf).alias("nw"),
        F.sum("gap").over(wf).cast("long").alias("dw"),
    )
    # sign-aware: the events schema admits negative prices, and the
    # unsigned device would FLOOR a negative weighted sum instead of
    # rounding half-away (caught by the brute-force property test)
    twap6 = F.when(
        F.col("dw") > 0,
        iround_col("nw", "100 * CAST(dw AS DECIMAL(38,0))", 6, signed=True),
    )
    return s.select(
        "event_id",
        "user_id",
        "event_type",
        twap6.alias("twap"),
    )


def win_vol_regime(events: DataFrame, short: int = 8, long: int = 32) -> DataFrame:
    """Volatility-regime ratio per series: √(V_short/V_long) over trailing
    delta windows — the expansion/compression detector (ratio > 1 =
    vol breakout; win_realized_vol reads one horizon, this compares
    two). Population variance of deltas per frame, denominator-cleared:
    V_s/V_l = (Q_s·L_s − S_s²)·L_l² / ((Q_l·L_l − S_l²)·L_s²) — an exact
    rational of decimal integers; the single √ lands on the 1e-4 grid
    via one IEEE divide/sqrt from exact decimals (the agg_corr
    discipline). Frames need ≥ 2 deltas on both horizons and positive
    long variance; otherwise NULL.

    Scale shape: ONE series-key Exchange — the lag and all four frame
    sums share the sort (consecutive Window nodes).
    """
    wo = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    ws = wo.rowsBetween(-(short - 1), 0)
    wl = wo.rowsBetween(-(long - 1), 0)
    c = cents("value")
    t = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        (c - F.lag(c).over(wo)).alias("d"),
    )
    dd = F.col("d").cast("decimal(38,0)")
    s = t.select(
        "event_id",
        "user_id",
        "event_type",
        F.sum(dd).over(ws).alias("ss"),
        F.sum(dd * F.col("d")).over(ws).alias("qs"),
        F.count("d").over(ws).cast("long").alias("ls"),
        F.sum(dd).over(wl).alias("sl"),
        F.sum(dd * F.col("d")).over(wl).alias("ql"),
        F.count("d").over(wl).cast("long").alias("ll"),
    )
    vnum_s = F.expr("qs * ls - ss * ss")
    vnum_l = F.expr("ql * ll - sl * sl")
    ratio4 = F.when(
        (F.col("ls") > 1) & (F.col("ll") > 1) & (vnum_l > 0) & (vnum_s >= 0),
        F.floor(
            F.expr(
                "sqrt((CAST(qs * ls - ss * ss AS DOUBLE)"
                "      * CAST(CAST(ll AS DECIMAL(38,0)) * ll AS DOUBLE))"
                "     / (CAST(ql * ll - sl * sl AS DOUBLE)"
                "        * CAST(CAST(ls AS DECIMAL(38,0)) * ls AS DOUBLE)))"
            )
            * F.lit(1e4)
            + F.lit(0.5)
        ).cast("double")
        / F.lit(1e4),
    )
    return s.select(
        "event_id",
        "user_id",
        "event_type",
        ratio4.alias("vol_ratio"),
    )


def win_anchored_vwap(lineitem: DataFrame) -> DataFrame:
    """Anchored VWAP per supplier, reset at each calendar month: the
    expanding Σ(price·qty)/Σqty from the month's first shipment to the
    current line — the execution benchmark traders anchor at a session
    open (win_trailing_vwap is the rolling form; anchoring changes the
    frame from trailing-k to UNBOUNDED PRECEDING within the anchor
    group, which is what makes it a fair "since the open" reference).

    EXACT cross-engine: price cents and integer quantities are exact
    picks, both expanding sums fold in decimal(38,0) (widened INSIDE the
    sum — the agg_stats r12 rule), and vwap = Σ(pc·q)/(100·Σq) rides the
    decimal device to the 1e-6 grid; Σq > 0 guarded (TPC-H quantities
    are positive — the guard pins the contract).

    Scale shape: ONE Exchange on (supplier, month) — the anchor is part
    of the partition key, so month boundaries are partition boundaries
    and no cross-month state exists; the unique (shipdate, orderkey,
    linenumber) order key makes the expanding frame deterministic at any
    parallelism. Both sums share one window buffer.
    """
    w = (
        Window.partitionBy("l_suppkey", "anchor_m")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pc = cents("l_extendedprice")
    q = F.round(F.col("l_quantity")).cast("long")
    t = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_shipdate",
        F.expr("year(l_shipdate) * 12 + month(l_shipdate) - 1").alias("anchor_m"),
        pc.alias("pc"),
        q.alias("q"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "anchor_m",
        F.sum(F.col("pc").cast("decimal(38,0)") * F.col("q")).over(w).alias("nq"),
        F.sum("q").over(w).cast("long").alias("dq"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_since_anchor"),
    )
    return t.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.col("anchor_m").cast("long").alias("anchor_m"),
        "n_since_anchor",
        F.when(
            F.col("dq") > 0,
            iround_col("nq", "100 * CAST(dq AS DECIMAL(38,0))", 6, signed=False),
        ).alias("avwap"),
    )


def win_gap_open(events: DataFrame) -> DataFrame:
    """Overnight gap per (user, type) series: each day's opening value
    minus the previous traded day's close, in exact cents — the
    session-boundary discontinuity feature (gap-up/gap-down) that rolling
    windows smear because they ignore the calendar.

    EXACT cross-engine: open/close are min_by/max_by picks on the
    (ts_us, event_id) struct (the agg_ohlc tie device), the day is
    integer µs arithmetic (`div`, never double /), and the gap is a
    bigint difference; the series' first day has no prior close → null
    gap (surfaced, not dropped — day counts must reconcile).

    Scale shape: ONE explicit repartition on (user, type) serves both
    stages — the per-day collapse groups on a SUPERSET of the partition
    key (hashpartitioning(user, type) satisfies the (user, type, day)
    clustering) and the day-sequence lag window partitions on exactly
    (user, type) — so the fact is shuffled once; the window then runs
    over day-count-sized rows, not tick-sized.
    """
    key = pick_key(DAY_US)
    t = (
        events.repartition("user_id", "event_type")
        .select(
            "user_id",
            "event_type",
            F.expr(f"ts_us div {DAY_US}").alias("day"),
            cents("value").alias("c"),
            "ts_us",
            "event_id",
        )
        .groupBy("user_id", "event_type", "day")
        .agg(
            F.min_by("c", key).alias("open_c"),
            F.max_by("c", key).alias("close_c"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    wd = Window.partitionBy("user_id", "event_type").orderBy("day")
    return t.select(
        "user_id",
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.col("open_c").cast("long").alias("open_c"),
        F.col("close_c").cast("long").alias("close_c"),
        "n",
        (F.col("open_c") - F.lag("close_c").over(wd)).cast("long").alias("gap_c"),
    )


def win_plateau(events: DataFrame) -> DataFrame:
    """Run-length structure of each (user, type) series: consecutive
    equal cent-values collapse into runs; every row reports its run's
    ordinal (run_id), its position inside the run (run_pos) and the
    running longest-run-so-far (max_run) — the flat-tape / stuck-sensor
    detector (win_streaks tracks signed up/down runs; this tracks
    EQUALITY runs, the degenerate case streaks ignore).

    EXACT cross-engine, all integers: the change flag compares exact
    cents against the lag, run_id is the running sum of change flags,
    run_pos is a row_number within (series, run_id), and max_run is the
    running max of run_pos over the ordered series — every derivation an
    integer window op on the same deterministic (ts_us, event_id) order.

    Scale shape: ONE Exchange on (user, type); the lag, the running sum,
    the per-run row_number, and the running max are four Window nodes
    over the same sort — Catalyst collapses them onto one shuffle (the
    run_id window adds a second sort WITHIN partitions, no exchange).
    """
    wo = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    wrun = wo.rowsBetween(Window.unboundedPreceding, 0)
    c = cents("value")
    t = events.select(
        "event_id", "user_id", "event_type", "ts_us", c.alias("c")
    ).withColumn(
        "chg",
        F.when(
            F.lag("c").over(wo).isNull() | (F.lag("c").over(wo) != F.col("c")), 1
        ).otherwise(0),
    )
    t = t.withColumn("run_id", F.sum("chg").over(wrun).cast("long"))
    wp = Window.partitionBy("user_id", "event_type", "run_id").orderBy(
        "ts_us", "event_id"
    )
    t = t.withColumn("run_pos", F.row_number().over(wp).cast("long"))
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        "run_id",
        "run_pos",
        F.max("run_pos").over(wrun).cast("long").alias("max_run"),
    )


def win_seasonal_naive(events: DataFrame) -> DataFrame:
    """Seasonal-naïve forecast error per series row: each event's value
    vs the SAME user/type/hour-of-day slot one day earlier (the
    strongest trivial baseline for daily-seasonal tapes; a model that
    can't beat it has learned nothing) — per-row signed error in exact
    cents plus the day-lag reference itself.

    Lag-by-season without a self-join: partitioning by (user, type,
    hour-of-day) makes "same slot yesterday" an ORDINARY lag along the
    day axis — but only across CONSECUTIVE days, so the lag value is
    kept only when the previous row in the slot is exactly day − 1
    (calendar holes surface null error, never a stale comparison).
    Multiple events in one slot-day compare positionally is ambiguous —
    so the slot-day collapses to its LAST tick first (max_by on the
    (ts_us, event_id) tie key, the agg_ohlc device).

    EXACT cross-engine, all integers: day and hour are integer µs
    `div`s, the collapse is an exact pick, the lag/guard/error are
    bigint arithmetic.

    Scale shape: ONE repartition on (user, type) serves the slot-day
    collapse (superset clustering) AND the per-slot day lag — the same
    one-Exchange discipline as win_gap_open.
    """
    key = pick_key(HOUR_US)
    t = (
        events.repartition("user_id", "event_type")
        .select(
            "user_id",
            "event_type",
            F.expr(f"ts_us div {DAY_US}").alias("day"),
            F.expr(f"(ts_us div {HOUR_US}) % 24").alias("hod"),
            cents("value").alias("c"),
            "ts_us",
            "event_id",
        )
        .groupBy("user_id", "event_type", "day", "hod")
        .agg(
            F.max_by("c", key).alias("c"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    ws = Window.partitionBy("user_id", "event_type", "hod").orderBy("day")
    t = t.withColumn("prev_day", F.lag("day").over(ws)).withColumn(
        "prev_c", F.lag("c").over(ws)
    )
    ref = F.when(F.col("prev_day") == F.col("day") - 1, F.col("prev_c"))
    return t.select(
        "user_id",
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.col("hod").cast("long").alias("hod"),
        F.col("c").cast("long").alias("c"),
        "n",
        ref.cast("long").alias("naive_c"),
        (F.col("c") - ref).cast("long").alias("err_c"),
    )


def win_peak_age(events: DataFrame) -> DataFrame:
    """Time since the running peak, per (user, type) series row: the
    expanding maximum of the cent value and the µs AGE of that peak —
    the drawdown-DURATION complement to agg_underwater / stream_drawdown
    (those measure how far below the peak; this measures how LONG since
    it, the "days since high-watermark" risk line).

    EXACT cross-engine: the running peak and its timestamp come from ONE
    expanding max over the (c, ts_us, event_id) struct — struct max
    orders lexicographically, so among equal peak values the LATEST
    (ts, id) wins, the exact tie the "age" semantics want (a re-touch of
    the high resets the clock); age is bigint µs arithmetic.

    Scale shape: ONE Exchange on (user, type), one expanding window —
    the struct trick folds peak value, peak time, and the tie rule into
    a single window buffer instead of two passes.
    """
    wrun = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = cents("value")
    t = events.select(
        "event_id", "user_id", "event_type", "ts_us", c.alias("c")
    ).withColumn(
        "pk",
        F.max(F.struct(F.col("c"), F.col("ts_us"), F.col("event_id"))).over(wrun),
    )
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.col("pk.c").cast("long").alias("peak_c"),
        F.col("pk.ts_us").cast("long").alias("peak_ts_us"),
        (F.col("ts_us") - F.col("pk.ts_us")).cast("long").alias("peak_age_us"),
    )


def win_candle_patterns(events: DataFrame) -> DataFrame:
    """Candlestick pattern flags on the hourly candles: doji (body ≤ 10%
    of range), hammer (lower wick ≥ 2× body, upper wick ≤ body), and
    bullish/bearish engulfing vs the PREVIOUS candle — the chart-pattern
    screens beside the indicator family (`win_atr`, `win_swing_points`);
    a pattern is a pure integer predicate over OHLC cents, so unlike the
    indicators there is no arithmetic to drift: every flag is exact by
    construction.

    All comparisons in cents with 10× scaling instead of division
    (10·body ≤ range, wick ≥ 2·body — integer inequalities, no
    rationals); engulfing reads the lagged candle over the one
    (event_type)-keyed window the candle table already implies. Output
    is candle-table-sized: one hash agg (the OHLC rollup) + one
    dimension-sized window.
    """
    c = (
        events.groupBy(
            "event_type",
            (F.col("ts_us") - F.col("ts_us") % F.lit(HOUR_US)).alias("hour_us"),
        )
        .agg(
            F.min_by(cents("value"), pick_key(HOUR_US)).alias("o"),
            F.max(cents("value")).alias("h"),
            F.min(cents("value")).alias("l"),
            F.max_by(cents("value"), pick_key(HOUR_US)).alias("cl"),
        )
    )
    body = F.abs(F.col("cl") - F.col("o"))
    rng = F.col("h") - F.col("l")
    upper = F.col("h") - F.greatest("o", "cl")
    lower = F.least("o", "cl") - F.col("l")
    w = Window.partitionBy("event_type").orderBy("hour_us")
    po, pc = F.lag("o").over(w), F.lag("cl").over(w)
    return c.select(
        "event_type",
        "hour_us",
        (10 * body <= rng).alias("is_doji"),
        ((lower >= 2 * body) & (upper <= body) & (rng > 0)).alias("is_hammer"),
        (
            po.isNotNull()
            & (pc < po)                       # previous bearish
            & (F.col("cl") > F.col("o"))      # current bullish
            & (F.col("o") <= pc) & (F.col("cl") >= po)
        ).alias("engulf_bull"),
        (
            po.isNotNull()
            & (pc > po)
            & (F.col("cl") < F.col("o"))
            & (F.col("o") >= pc) & (F.col("cl") <= po)
        ).alias("engulf_bear"),
    )


def win_tick_bars(events: DataFrame, ticks: int = 100) -> DataFrame:
    """Event-count bars ("volume clock"): per event_type, consecutive
    runs of ``ticks`` prints form one bar with OHLC + value sum — the
    activity-clock sampling quant desks use instead of wall-clock
    candles (`agg_ohlc`): in a volume clock every bar carries the same
    information content, so quiet hours don't emit empty bars and busy
    minutes don't hide inside one.

    EXACT: bar assignment is integer arithmetic on the deterministic
    (ts_us, event_id) row_number ((rn−1) div ticks); O/C are min_by/
    max_by picks on rn (exact stored cents, no accumulation), H/L
    min/max, the value sum exact bigint. The final (possibly partial)
    bar is emitted with its true n — the caller can drop it if they
    want only full bars.

    Scale shape: ONE event_type Exchange shared by the row_number
    window and the bar hash agg. The per-type global sort is the
    gini/lorenz disclosed posture — the op is DEFINED by a total print
    order per type.
    """
    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    c = cents("value")
    r = events.select(
        "event_type", "ts_us", "event_id", c.alias("x")
    ).withColumn("rn", F.row_number().over(w))
    # integer div, not float-divide-then-cast — the repo's div discipline
    bar = F.expr(f"(rn - 1) div {ticks}").cast("long")
    return (
        r.withColumn("bar_id", bar)
        .groupBy("event_type", "bar_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min_by("x", "rn").cast("long").alias("open_c"),
            F.max("x").cast("long").alias("high_c"),
            F.min("x").cast("long").alias("low_c"),
            F.max_by("x", "rn").cast("long").alias("close_c"),
            # BIGINT final: a 100-tick bar sum is ≤ 100·max cents —
            # decimal(38,0) outputs break the driver hash (r15 FAIL)
            F.sum(F.col("x").cast("decimal(38,0)")).cast("long").alias("sum_c"),
            F.min("ts_us").cast("long").alias("bar_start_us"),
            F.max("ts_us").cast("long").alias("bar_end_us"),
        )
    )


def win_parkinson_vol(events: DataFrame) -> DataFrame:
    """Parkinson range-based volatility per (event_type, day): σ_P =
    sqrt( Σ ln(H_i/L_i)² / (4·n·ln2) ) over the day's hourly high/low
    bars — the range estimator that extracts ~5× the information of
    close-to-close vol from the same bars (Parkinson 1980), the daily
    companion of `win_realized_vol` (which sums squared log returns) for
    feeds where intrabar extremes are cheap and tick history isn't.

    Determinism: H/L are exact cents integers off one (type, hour) hash
    agg; each bar's term is ln(H)−ln(L) squared — libm ln on exact
    integer inputs (the entropy/zipf precedent) — and the day's sum
    folds in HOUR order (array_sort + aggregate, the fixed IEEE chain).
    Bars with L ≤ 0 or H = L contribute nothing estimable and are
    excluded from n (disclosed: Parkinson assumes positive prices);
    days with no usable bar emit NULL. Surfaced via floor device, 6 dp.

    Scale shape: one (type, hour) partial hash agg, one (type, day)
    rollup over ≤24-element arrays. Fact rows are touched once.
    """
    x = cents("value")
    # integer div, never double-divide-then-cast: a µs-off-boundary ts
    # could round across the hour under IEEE division
    hour = F.expr(f"ts_us div {HOUR_US}").cast("long")
    bars = (
        events.select("event_type", hour.alias("h"), x.alias("x"))
        .groupBy("event_type", "h")
        .agg(F.max("x").alias("hi"), F.min("x").alias("lo"))
    )
    usable = (F.col("lo") > 0) & (F.col("hi") > F.col("lo"))
    term = F.when(
        usable,
        (F.log(F.col("hi").cast("double")) - F.log(F.col("lo").cast("double")))
        * (F.log(F.col("hi").cast("double")) - F.log(F.col("lo").cast("double"))),
    )
    day = F.expr(f"h div {DAY_US // HOUR_US}").cast("long")
    g = (
        bars.select("event_type", day.alias("day"), "h", term.alias("t"))
        .groupBy("event_type", "day")
        .agg(
            F.count("t").cast("long").alias("n_bars"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("t").isNotNull(), F.struct("h", "t"))
                    )
                ),
                F.lit(0.0),
                lambda acc, r: acc + r["t"],
            ).alias("s"),
        )
    )
    f6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    # 4·ln2 pinned as the SAME decimal literal in the oracle SQL — no
    # cross-engine ln(2) evaluation to trust
    vol = F.sqrt(
        F.col("s") / (F.lit(2.772588722239781) * F.col("n_bars").cast("double"))
    )
    return g.select(
        "event_type",
        "day",
        "n_bars",
        F.when(F.col("n_bars") > 0, f6(vol)).alias("park_vol"),
    )


def win_garman_klass(events: DataFrame) -> DataFrame:
    """Garman–Klass OHLC volatility per (event_type, day): σ²_GK =
    (1/n)·Σ [ ½·ln(H/L)² − (2ln2−1)·ln(C/O)² ] over the day's hourly
    bars — the minimum-variance unbiased range estimator (Garman–Klass
    1980), ~7.4× close-to-close efficiency vs Parkinson's ~5×: it adds
    the open/close drift term Parkinson ignores, so trending bars stop
    inflating the range estimate. Completes the estimator ladder
    `win_realized_vol` (returns) → `win_parkinson_vol` (range) → GK
    (range + drift).

    Determinism: O/C are exact min_by/max_by cent picks on (ts_us,
    event_id) (the tick_bars discipline), H/L exact min/max; every ln
    input is an exact integer (the zipf/parkinson precedent), per-bar
    terms are one fixed double chain each, the day folds in HOUR order,
    and both constants (0.386294361119890 = 2ln2−1 and the ½) are
    pinned literals in BOTH engines. Bars need O,L > 0 and H > L;
    excluded bars don't count toward n. Floor device, 6 dp.

    Scale shape: one (type, hour) partial hash agg, one (type, day)
    rollup over ≤24-element arrays. Fact rows are touched once.
    """
    x = cents("value")
    hour = F.expr(f"ts_us div {HOUR_US}").cast("long")
    bars = (
        events.select(
            "event_type", hour.alias("h"), "ts_us", "event_id", x.alias("x")
        )
        .withColumn("rk", pick_key(HOUR_US))
        .groupBy("event_type", "h")
        .agg(
            F.min_by("x", "rk").alias("o"),
            F.max("x").alias("hi"),
            F.min("x").alias("lo"),
            F.max_by("x", "rk").alias("cl"),
        )
    )
    usable = (F.col("lo") > 0) & (F.col("o") > 0) & (F.col("hi") > F.col("lo"))
    lnr = F.log(F.col("hi").cast("double")) - F.log(F.col("lo").cast("double"))
    lnc = F.log(F.col("cl").cast("double")) - F.log(F.col("o").cast("double"))
    term = F.when(
        usable,
        F.lit(0.5) * lnr * lnr - F.lit(0.386294361119890) * lnc * lnc,
    )
    day = F.expr(f"h div {DAY_US // HOUR_US}").cast("long")
    g = (
        bars.select("event_type", day.alias("day"), "h", term.alias("t"))
        .groupBy("event_type", "day")
        .agg(
            F.count("t").cast("long").alias("n_bars"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("t").isNotNull(), F.struct("h", "t"))
                    )
                ),
                F.lit(0.0),
                lambda acc, r: acc + r["t"],
            ).alias("s"),
        )
    )
    f6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    # GK variance can go (slightly) negative on drift-dominated bars —
    # surface the variance itself, signed, not a sqrt of a negative
    var = F.col("s") / F.col("n_bars").cast("double")
    return g.select(
        "event_type",
        "day",
        "n_bars",
        F.when(F.col("n_bars") > 0, f6(var)).alias("gk_var"),
    )
