"""Iterative graph analytics over edge tables (SURVEY.md §2.K extension).

PageRank joins `connected_components` (kdb_spark/llm/dedup.py:304) as the
second iterative-fixpoint operator: both follow the same Spark discipline —
the edge table is the unit of scale, each iteration is ONE join + ONE
aggregate shuffle sized to |E|, the loop is unrolled driver-side with the
iteration count fixed (so the whole computation is a single Catalyst plan,
resumable and AQE-optimizable), and nothing but scalars ever reaches the
driver. At cluster scale you'd persist `edges`+`deg` once (done here) and
checkpoint ranks every ~10 rounds to truncate lineage — the 3-round
analytics default needs no checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (`src`, `dst`).

    rank_0(v) = 1/N; rank_i(v) = (1-d)/N + d * Σ_{u→v} rank_{i-1}(u)/deg(u).
    Callers must pass a graph where every vertex has out-degree ≥ 1 (e.g.
    symmetrized edges, as q_graph_pagerank builds) — dangling-mass
    redistribution is deliberately out of scope, keeping each iteration a
    pure join+agg with no global rescale pass.

    Ranks are rounded to 9 at the end only: values sit near 1/N, and the
    double-summation noise (~1e-15 relative) is far below the 1e-9 cut.
    """
    from kdb_spark.llm.dedup import _reused

    # the edge table feeds FOUR consumers (deg, verts, the per-round join,
    # the final out_deg join) — persist it once or the upstream build
    # (e.g. trade_graph's orders⋈lineitem+distinct) re-executes per consumer
    edges = _reused("pagerank_edges", edges.select("src", "dst").distinct())
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    verts = edges.select(F.col("src").alias("v")).distinct()
    n = verts.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # per-round join shape: edges stream from cache, the (v, deg·rank)
    # message table is |V|-sized and explicitly broadcast — each iteration
    # is a map-side join + ONE |E| aggregate shuffle. (At a vertex scale
    # where |V| no longer broadcasts, swap the hint for edges pre-hashed
    # on src — the cached table's partitioning then absorbs the join.)
    ranks = verts.crossJoin(F.broadcast(n)).select(
        "v", "n", (F.lit(1.0) / F.col("n")).alias("r")
    )
    contrib_edges = _reused("pagerank_contrib", edges.join(F.broadcast(deg), "src"))
    for _ in range(iters):
        ranks = (
            contrib_edges
            .join(
                F.broadcast(ranks.select(F.col("v").alias("src"), "n", "r")),
                "src",
            )
            .groupBy(F.col("dst").alias("v"))
            .agg(
                F.first("n").alias("n"),
                (
                    F.lit(1.0 - damping) / F.first("n")
                    + damping * F.sum(F.col("r") / F.col("deg"))
                ).alias("r"),
            )
        )
    return ranks.select("v", F.round("r", 9).alias("rank")).join(
        deg.select(F.col("src").alias("v"), F.col("deg").cast("long").alias("out_deg")),
        "v",
    )


def trade_graph(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Symmetrized customer↔supplier edge list: one edge pair per distinct
    (customer, supplier) trading relationship in the order book. Vertex ids
    are parity-namespaced LONGS (customer k → 2k, supplier k → 2k+1) so the
    two key spaces share one rank table without string ids — an 8-byte
    fixed-width key shuffles, sorts, and hash-aggregates far cheaper than a
    'c123' string at every one of PageRank's per-round exchanges. The
    orders⋈lineitem equi-join projects down to the two key columns before
    anything shuffles; dedup is left to pagerank()'s own edge distinct.
    """
    pairs = (
        orders.select("o_orderkey", "o_custkey")
        .join(lineitem.select("l_orderkey", "l_suppkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        # no distinct here: pagerank() dedups its edge input anyway, and a
        # pre-union distinct would just add a second full shuffle
    )
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
