"""Set operations (SURVEY.md §2.B). The reference analog is Find's
cross-bucket union-by-key merge (`dbase/dbase.go:291-310`); here they are
first-class relational ops with ANSI distinct semantics (UNION / INTERSECT /
EXCEPT), each one shuffle on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nations_of_segment(customer: DataFrame, segment: str) -> DataFrame:
    return customer.filter(F.col("c_mktsegment") == segment).select("c_nationkey")


def set_union(customer: DataFrame, seg_a: str, seg_b: str) -> DataFrame:
    """UNION (distinct) of the nation sets of two market segments."""
    return (
        _nations_of_segment(customer, seg_a)
        .union(_nations_of_segment(customer, seg_b))
        .distinct()
    )


def set_intersect(part: DataFrame) -> DataFrame:
    """INTERSECT of brand sets from two predicates."""
    a = part.filter(F.col("p_size") > 40).select("p_brand")
    b = part.filter(F.col("p_type") == "ECONOMY").select("p_brand")
    return a.intersect(b)


def set_except(customer: DataFrame, orders: DataFrame, min_price: float) -> DataFrame:
    """EXCEPT (distinct): custkeys of one segment minus big spenders."""
    seg = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        orders.filter(F.col("o_totalprice") > min_price)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return seg.subtract(big)
