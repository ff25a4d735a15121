"""Source / sink adapters (SURVEY.md §2.B "Scans / sources / sinks").

The reference reads exactly one format — its own mmap'd segment files
(`dblock/dblock.go:343-382`, `rblock/rblock.go:138-157`). The engine's
native format is parquet (vectorized scan, predicate pushdown, row-group
stats); CSV and JSON-lines adapters exist for interchange. All readers take
an explicit schema when given (never sample-infer in production paths —
inference is a full extra pass at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def scan_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    r = spark.read.option("header", header)
    r = r.schema(schema) if schema is not None else r.option("inferSchema", True)
    return r.csv(path)


def scan_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan. With an explicit schema this is one pass; without,
    Spark samples to infer (fine for exploration, not for the 100 TB path)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def sink_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def sink_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def sink_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def scan_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — vectorized + predicate pushdown, same contract as parquet."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def sink_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def scan_binary(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-asset scan via the `binaryFile` source — the ingest edge of the
    multimodal pipeline (images/audio/video land as files; this yields
    (path, modificationTime, length, content BINARY) rows that
    `multimodal_table` / `mm_features` consume as opaque payloads).

    Spark parallelizes the listing and reads each file as one row — fine
    for the typical many-small-assets layout; giant single files should be
    chunked upstream. `pathGlobFilter` prunes by extension at listing time
    (no data read for skipped files).
    """
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def sink_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32
) -> None:
    """Persist as a bucketed+sorted managed table — the storage-layout half
    of a shuffle-free equi join. Two fact tables bucketed on the same key
    with the same bucket count co-locate matching keys in matching files,
    so a later join needs NO Exchange on either side (plan-asserted in
    tests): at 100 TB that converts every recurring fact-fact join from a
    full-corpus shuffle into a per-bucket merge. The write itself shuffles
    once (hash into buckets) — you pay it one time, not per query.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
