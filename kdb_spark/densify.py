"""Spine-join densification — the one genuinely custom composition.

The reference returns *dense* range-scan results by construction: records are
preallocated zero-filled slot arrays, so a range read is a contiguous slice
with gaps physically present as zero bytes (`dblock/dblock.go:220-231`,
`dbase/dbase.go:75-81`). Spark stores sparse rows, so density is
reconstructed at query time:

    spine(start, end, res)  LEFT JOIN  data ON slot  →  coalesce(val, zero)

Scale notes (100 TB posture, SURVEY.md §7):
- The spine is generated *distributed* with ``spark.range`` (a parallel
  range source, no driver-side materialization) — never a collected Python
  list, never one giant in-row array.
- For per-series grids the spine is cross-joined against the (small) distinct
  series set; Catalyst/AQE broadcasts the smaller side.
- The join key is the already-quantized slot value, so the join is a plain
  equi-join that AQE can turn into a broadcast join when the filtered data
  side is small (the common case: one series × bounded range).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def time_spine(
    spark: SparkSession,
    start: int,
    end: int,
    resolution: int,
    ts_col: str = "ts",
) -> DataFrame:
    """One row per slot in ``[start, end)`` (end-exclusive), step ``resolution``.

    Mirrors the result-length contract ``(end-start)/Resolution``
    (`dbase/dbase.go:183-184`). ``spark.range`` is distributed and splits the
    id space across executors, so a 10^9-slot spine is fine.
    """
    n = max(0, (end - start) // resolution)
    return spark.range(n).select(
        (F.lit(start) + F.col("id") * F.lit(resolution)).cast("long").alias(ts_col)
    )


def densify(
    spine: DataFrame,
    data: DataFrame,
    on: list[str],
    value_col: str,
    fill: Column,
    series: DataFrame | None = None,
) -> DataFrame:
    """LEFT-JOIN ``data`` onto the spine (× ``series`` if given), filling gaps.

    ``fill`` is the zero payload (`dbase/dbase.go:75-81`) — the reference's
    "missing data is zero bytes, not null" contract.
    """
    left = spine if series is None else series.crossJoin(spine)
    out = left.join(data, on=on, how="left")
    return out.withColumn(value_col, F.coalesce(F.col(value_col), fill))
