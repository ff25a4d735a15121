"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

The driver's ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS),
which Spark's vectorized reader rejects. ``spark.sql.legacy.parquet
.nanosAsLong`` reads it as LongType nanoseconds — which is exactly the
engine's core convention anyway (SURVEY.md §1.4: kdb timestamps are int64 ns,
`clock/clock.go:20-22`; we carry ns longs and expose timestamp views).

Cross-engine note (oracle parity): DuckDB truncates TIMESTAMP(NANOS) to
microseconds on read, so every time comparison in the oracle-checked queries
is defined at microsecond (or coarser) granularity: ``ts_us = ts div 1000``
here == ``epoch_us(ts)`` in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# time constants, microseconds
SEC_US = 1_000_000
MIN_US = 60 * SEC_US
HOUR_US = 3_600 * SEC_US
DAY_US = 86_400 * SEC_US


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; ns timestamps surface as LongType ns."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_us`` (µs epoch long) — the oracle-comparable clock.

    ``div`` truncates toward zero (ts is positive), matching DuckDB's
    ns→µs truncation.
    """
    return load(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts div 1000")
    )


def cents(col: str | F.Column) -> F.Column:
    """Exact money arithmetic for oracle-checked sums.

    Per-row double→bigint-cents is bit-deterministic in both engines
    (same IEEE multiply + half-up round on identical inputs), and bigint
    sums are order-independent — unlike double sums, whose accumulation
    order differs run-to-run and engine-to-engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")
