"""Tolerance gate for the two sketch-based aggregates.

These are the only `queries()` keys without an exact DuckDB oracle (HLL
estimates are engine-specific), so the driver's check is rows-only. This
test is the missing value check: the estimate must sit within the sketch's
configured error envelope of the EXACT distinct count computed on the same
data — a wrong groupBy key, a dropped filter, or sketching the wrong column
all blow the tolerance, while legitimate HLL noise does not.
"""

from kdb_spark.analytics import aggregations as agg
from kdb_spark.tables import events_us

from tests.conftest import SF_DIR

TOL = 0.05  # approx_count_distinct rsd=0.02; hll_sketch_agg default lgK=12


def _exact(spark):
    ev = events_us(spark, SF_DIR)
    return {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(agg.F.countDistinct("user_id").alias("exact"))
        .collect()
    }


def test_approx_distinct_within_tolerance(spark):
    exact = _exact(spark)
    got = agg.agg_approx_distinct(events_us(spark, SF_DIR)).collect()
    assert {r["event_type"] for r in got} == set(exact)
    for r in got:
        e = exact[r["event_type"]]
        assert abs(r["approx_users"] - e) <= max(1, TOL * e), (
            r["event_type"],
            r["approx_users"],
            e,
        )


def test_hll_merge_matches_unmerged_estimate_and_exact(spark):
    """The per-day-sketch → union path must estimate like (and as well as)
    a direct sketch: merging shards is lossless for HLL."""
    exact = _exact(spark)
    got = agg.agg_hll_merge(events_us(spark, SF_DIR)).collect()
    assert {r["event_type"] for r in got} == set(exact)
    for r in got:
        e = exact[r["event_type"]]
        assert abs(r["approx_users"] - e) <= max(1, TOL * e), (
            r["event_type"],
            r["approx_users"],
            e,
        )
        assert r["n_day_sketches"] >= 1


def test_quantile_sketch_within_bin_width_of_exact(spark):
    """The histogram quantile can be off by at most one bin width (16.0)
    from the exact percentile — and merging per-day histograms must give
    the identical estimate (the mergeability contract)."""
    ev = events_us(spark, SF_DIR)
    est = {r.event_type: r for r in agg.agg_quantile_sketch(ev).collect()}
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            agg.F.percentile("value", agg.F.lit(0.5)).alias("p50"),
            agg.F.percentile("value", agg.F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    w = (agg.QSK_HI - agg.QSK_LO) / agg.QSK_BINS
    for t, e in est.items():
        assert abs(e.est_p50 - exact[t].p50) <= w
        assert abs(e.est_p95 - exact[t].p95) <= w


def test_quantile_sketch_merges_across_shards(spark):
    """Splitting events into day shards, histogramming each, and summing
    cells must reproduce the single-pass estimate exactly."""
    from pyspark.sql import Window, functions as F

    ev = events_us(spark, SF_DIR)
    w = (agg.QSK_HI - agg.QSK_LO) / agg.QSK_BINS
    b = F.floor((F.col("value") - agg.QSK_LO) / F.lit(w)).cast("long")
    bin_id = F.least(F.lit(agg.QSK_BINS - 1), F.greatest(F.lit(0), b))
    day = (F.col("ts_us") - F.col("ts_us") % F.lit(86_400_000_000)).alias("day")
    # shard → per-shard cells → merged cells
    merged = (
        ev.groupBy("event_type", day, bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("event_type", "bin")
        .agg(F.sum("c").alias("c"))
    )
    direct = {
        (r.event_type, r.bin): r.c
        for r in ev.groupBy("event_type", bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    got = {(r.event_type, r.bin): r.c for r in merged.collect()}
    assert got == direct
