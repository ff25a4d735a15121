"""Sorts / top-k (SURVEY.md §2.B). The reference's results are positionally
ordered by construction (`dblock/dblock.go:220-231`); here ordering is
explicit and rank columns make it hash-observable.

Per-group top-k is a window row_number ≤ k (one shuffle on the group key);
global top-k is orderBy+limit, which Spark executes as TakeOrdered (per-
partition heaps + driver merge of k rows — no global sort at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sort_series(events: DataFrame, user_id: int) -> DataFrame:
    """One series ordered by time with an explicit position column."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return events.filter(F.col("user_id") == user_id).select(
        F.row_number().over(w).cast("long").alias("pos"),
        "event_id",
        "ts_us",
        "value",
    )


def topk_per_group(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-k orders per customer by price (unique tiebreak on key)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def topk_global(orders: DataFrame, k: int = 100) -> DataFrame:
    """Global top-k — TakeOrdered, not a full sort."""
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(k)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
