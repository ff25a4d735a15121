"""Kernel verbs re-expressed over the driver's ``events`` table.

These are the reference's observable query semantics (`kdb.go:6-15`) mapped
onto a real dataset so the driver's DuckDB oracle can adjudicate them:

- tags       → (user_id, event_type)   (depth-2 analog of the tag tuple)
- payload    → value (double; 0.0 is the zero-payload gap sentinel)
- resolution → 1 minute; bucket = 1 day
- ingest_seq → event_id (the monotonic write order, `dblock/dblock.go:198-205`)

The byte-exact kernel (BinaryType payloads, virtual now, hot/cold guards)
lives in kdb_spark/store.py and is golden-tested in tests/test_store.py;
this module proves the same *query* semantics — dense end-exclusive ranges,
zero fill, wildcard presence, last-write-wins — under the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kdb_spark.densify import dense_grid, time_spine
from kdb_spark.tables import DAY_US, MIN_US, ts_raw_range


def _slot(col: str = "ts_us", res: int = MIN_US) -> F.Column:
    # `dbase/dbase.go:127`: ts floored to resolution
    return (F.col(col) - F.col(col) % F.lit(res)).alias("slot_us")


def _ts_range(events: DataFrame, start_us: int, end_us: int) -> F.Column:
    """Time-range predicate stated on BOTH the derived µs column and the raw
    ``ts`` column: a filter on the derived ``ts_us`` cannot reach the parquet
    scan, but the equivalent range on raw ``ts`` — stated in the column's own
    physical type (tables.ts_raw_range) — does, so row-group stats skip cold
    time ranges: the Catalyst analog of the reference's bucket loop."""
    return (
        (F.col("ts_us") >= start_us)
        & (F.col("ts_us") < end_us)
        & ts_raw_range(events, start_us, end_us)
    )


def lww(df: DataFrame, keys: list[str], res: int = MIN_US) -> DataFrame:
    """Last-write-wins visibility per (series, slot) (`dblock/dblock.go:198-205`).

    ``max_by(value, event_id)`` — one hash aggregate, map-side partial combine.
    """
    return (
        df.withColumn("slot_us", _slot(res=res))
        .groupBy(*keys, "slot_us")
        .agg(F.max_by("value", "event_id").alias("value"))
    )


def get_dense(
    events: DataFrame,
    spark: SparkSession,
    user_id: int,
    event_type: str,
    start_us: int,
    end_us: int,
    res: int = MIN_US,
) -> DataFrame:
    """O2 `Get` (`dbase/dbase.go:161-231`): exact-series dense range read.

    Exactly ``(end-start)/res`` rows, end-exclusive, zero-filled (0.0), last
    write per slot wins. Absent series → all zeros, never an error
    (`dbase/dbase.go:216-225`).

    Plan: pushed tag-equality + range filters → UNION with the distributed
    ``spark.range`` spine (one zero-payload sentinel row per slot, ingest
    seq -1 < every real event_id) → ONE ``max_by`` hash aggregate. The
    aggregate does LWW and zero-fill in the same stage, so there is no join
    at all: one Exchange total, keyed on slot. The spine never touches the
    driver, and the only extra shuffled volume vs a bare LWW agg is the
    spine itself — the result size the semantics already require. (The
    multi-series ``find_dense`` keeps the grid-join shape instead: its
    |series|×|slots| grid must stay map-side, never shuffled.)
    """
    data = events.filter(
        (F.col("user_id") == user_id)
        & (F.col("event_type") == event_type)
        & _ts_range(events, start_us, end_us)
    ).select(_slot(res=res), "value", "event_id")
    spine = time_spine(spark, start_us, end_us, res, ts_col="slot_us").select(
        "slot_us",
        F.lit(0.0).alias("value"),
        F.lit(-1).cast("long").alias("event_id"),
    )
    return (
        data.unionByName(spine)
        .groupBy("slot_us")
        .agg(F.coalesce(F.max_by("value", "event_id"), F.lit(0.0)).alias("value"))
    )


def find_dense(
    events: DataFrame,
    spark: SparkSession,
    user_id: int | None,
    event_type: str | None,
    start_us: int,
    end_us: int,
    res: int = MIN_US,
) -> DataFrame:
    """O3 `Find` (`dbase/dbase.go:233-321`): wildcard multi-series dense read.

    ``None`` = wildcard (the reference's ``""``, `mindex/mindex.go:133-142`).
    Only series with ≥1 point in range appear (`dbase/dbase.go:256-262`),
    each densified over the whole [start,end) grid, zero-filled.

    Plan: one shuffle (LWW agg by series+slot); the |series| × |slots| grid
    — the exact output size the semantics require — is generated map-side
    via chunked explode(sequence) per series (densify.dense_grid), never a
    cross join, so the range width is not bounded by a broadcast.
    """
    cond = _ts_range(events, start_us, end_us)
    if user_id is not None:
        cond = cond & (F.col("user_id") == user_id)
    if event_type is not None:
        cond = cond & (F.col("event_type") == event_type)
    data = events.filter(cond)
    keys = ["user_id", "event_type"]
    series = data.select(*keys).distinct()
    series_lww = lww(data, keys, res)
    grid = dense_grid(series, start_us, end_us, res, ts_col="slot_us")
    return grid.join(series_lww, [*keys, "slot_us"], "left").select(
        *keys, "slot_us", F.coalesce("value", F.lit(0.0)).alias("value")
    )


def ingest_validate(events: DataFrame, now_us: int) -> DataFrame:
    """O1 `Put` validation as one distributed pass (`dbase/dbase.go:125-159`).

    Classifies every row (future-ts vs valid; `dbase/dbase.go:129-132`) and
    floors ts to resolution/bucket, returning per-bucket admission counts —
    the observable effect of the reference's ingest loop without its
    per-call errors (batch posture: count violations, don't abort the job).
    """
    return (
        events.withColumn("slot_us", _slot())
        .withColumn("bucket_us", F.col("ts_us") - F.col("ts_us") % F.lit(DAY_US))
        .withColumn(
            "status",
            F.when(F.col("ts_us") > F.lit(now_us), F.lit("future")).otherwise(
                F.lit("ok")
            ),
        )
        .groupBy("bucket_us", "status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def retention_filter(events: DataFrame, cutoff_us: int) -> DataFrame:
    """O4 `RemoveBefore` (`dbase/dbase.go:323-364`) as its observable result:
    rows of whole buckets with base >= cutoff. On Delta this is
    ``DELETE WHERE bucket_us < cutoff`` — a metadata-only partition drop."""
    bucket = F.col("ts_us") - F.col("ts_us") % F.lit(DAY_US)
    return (
        events.withColumn("bucket_us", bucket)
        .filter(F.col("bucket_us") >= F.lit(cutoff_us))
        .groupBy("bucket_us")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def series_filter(
    events: DataFrame, user_id: int, event_type: str, start_us: int, end_us: int
) -> DataFrame:
    """Tag-equality + time-range scan (`mindex/mindex.go:112-123` + slot
    clamp). All predicates push to the parquet scan — the Catalyst analog of
    the prefix-tree descent (SURVEY.md §4)."""
    return events.filter(
        (F.col("user_id") == user_id)
        & (F.col("event_type") == event_type)
        & _ts_range(events, start_us, end_us)
    ).select("event_id", "ts_us", "value")


def payload_project(events: DataFrame) -> DataFrame:
    """Payload decode (`kdb.go:27-29`: payloads are opaque to the store,
    interpreted downstream). Here the opaque payload is the JSON ``props``
    string → typed columns via JVM-side json path extraction (no UDF)."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.col("value"),
    )
