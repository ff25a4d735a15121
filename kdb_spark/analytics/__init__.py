"""Analytics layer — SURVEY.md §2.B.

The reference has no analytics (payloads are opaque bytes, aggregation lives
in downstream consumers, `kdb.go:27-29`); its dense slot grid exists to feed
exactly these rollups (SURVEY.md §2.B "Aggregations"). Everything here is
declarative DataFrame ops — Catalyst owns pushdown, pruning, join selection,
and whole-stage codegen; there are no Python UDFs in any of these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_per_group(
    df: DataFrame, part_col: str, order_col: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per ``part_col`` group — the shared skew
    guard for pair-generating self-joins (co-purchase projection, basket
    rules). One row_number window ordered by ``order_col``; the order key
    must be unique within the group so reruns and repartitions drop the
    SAME rows (determinism is the contract both callers' docstrings lean
    on — any change here must preserve it)."""
    w = Window.partitionBy(part_col).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
