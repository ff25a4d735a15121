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
