"""Similarity search over embedding columns (SURVEY.md §2.K).

Dot products are `zip_with` + `aggregate` (a sequential double fold —
deterministic and Catalyst-visible; SURVEY.md:489-490 commits to built-ins
over Python UDFs here). Elements are cast float→double (exact) before any
arithmetic so oracle comparison is bit-stable.

Scale paths:
- brute-force top-k: broadcast the (small) query side, per-query window
  top-k — the exact baseline;
- sign-LSH (random hyperplanes): bucket corpus + queries, search only same
  bucket — the ANN path when the corpus side no longer fits a crossJoin.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _vec_d(col: str) -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norm(embeddings: DataFrame, out: str = "nrm") -> DataFrame:
    return embeddings.withColumn(out, _norm(_vec_d("embedding")))


def sim_search_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """Brute-force cosine top-k: queries × corpus, rank per query.

    The query side is broadcast (n_queries rows); the corpus is scanned once
    — at 100 TB this is the exact-baseline plan: one pass, no corpus
    shuffle, per-query heap via window row_number. Ties broken by vec_id.
    """
    q = with_norm(embeddings.filter(F.col("vec_id") < n_queries)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = with_norm(embeddings).select("vec_id", "embedding", "nrm")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos", _dot(_vec_d("q_emb"), _vec_d("embedding")) / (F.col("q_nrm") * F.col("nrm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", F.col("vec_id").alias("match_id"),
                F.round("cos", 6).alias("cos"), "rn")
    )


def emb_near_dup(embeddings: DataFrame, tau: float = 0.4, n_blocks: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= tau, a < b) — exact,
    via distributed block-GEMM.

    All-pairs cosine is inherently O(n²) *flops*, but it does not have to be
    O(n²) *rows*: vectors are split into ``n_blocks`` row-blocks; each vector
    is replicated to the ``n_blocks`` block-pairs it participates in
    (shuffle volume n × n_blocks rows, never n² pairs), and each block-pair
    group computes one vectorized numpy matmul in ``applyInPandas``
    (Arrow-batched), emitting only qualifying pairs. Scale by setting
    ``n_blocks ≈ sqrt(cluster parallelism)``; for approximate-but-linear,
    use ann_buckets() as the candidate generator instead.
    """
    import numpy as np
    import pandas as pd

    n = with_norm(embeddings).select(
        "vec_id", _vec_d("embedding").alias("v"), "nrm"
    )
    # replicate each row to every block-pair (min(blk,j), max(blk,j))
    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks))
    pairs = F.array_distinct(
        F.array(
            *[
                F.struct(
                    F.least(blk, F.lit(j)).alias("ba"),
                    F.greatest(blk, F.lit(j)).alias("bb"),
                )
                for j in range(n_blocks)
            ]
        )
    )
    rep = (
        n.withColumn("blk", blk)
        .withColumn("bp", F.explode(pairs))
        .select(
            "vec_id", "v", "nrm", "blk",
            F.col("bp.ba").alias("ba"), F.col("bp.bb").alias("bb"),
        )
    )

    def gemm(key: tuple, pdf) -> "pd.DataFrame":
        ba, bb = key
        left = pdf[pdf["blk"] == ba]
        right = pdf[pdf["blk"] == bb] if bb != ba else left
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos": "float64"}
            )
        A = np.stack(left["v"].to_numpy()) / left["nrm"].to_numpy()[:, None]
        B = np.stack(right["v"].to_numpy()) / right["nrm"].to_numpy()[:, None]
        S = A @ B.T
        ia, ib = np.nonzero(S >= tau)
        va = left["vec_id"].to_numpy()[ia]
        vb = right["vec_id"].to_numpy()[ib]
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        if ba == bb:
            keep = va < vb  # diagonal block: each pair appears twice + self
        else:
            keep = lo < hi  # cross block: once; just orient (a < b)
        return pd.DataFrame(
            {"vec_a": lo[keep], "vec_b": hi[keep], "cos": S[ia, ib][keep]}
        )

    out = rep.groupBy("ba", "bb").applyInPandas(
        gemm, "vec_a long, vec_b long, cos double"
    )
    return out.select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (plan-time constants)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def ann_buckets(embeddings: DataFrame, dim: int = 64, n_planes: int = 8) -> DataFrame:
    """Sign-LSH bucket id per vector: bit i = sign(v · plane_i).

    Vectors in the same bucket are cosine-close with high probability; ANN
    search joins on the bucket id (2^n_planes buckets) instead of scanning
    the corpus. Plane components are literal arrays — the dot products stay
    whole-stage-codegen expressions.
    """
    planes = hyperplanes(dim, n_planes)
    v = _vec_d("embedding")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = _dot(v, F.array(*[F.lit(x) for x in p]))
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(0)
    return embeddings.withColumn("bucket", bucket)


def ann_search_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 5, n_planes: int = 6
) -> DataFrame:
    """ANN cosine top-k: candidates restricted to the query's sign bucket.

    Approximate (a true neighbor can land across a hyperplane); recall rises
    with fewer planes / multi-probe. Deterministic given the fixed seed.
    """
    b = ann_buckets(with_norm(embeddings), n_planes=n_planes)
    q = b.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "bucket",
    )
    scored = (
        b.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos", _dot(_vec_d("q_emb"), _vec_d("embedding")) / (F.col("q_nrm") * F.col("nrm"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", F.col("vec_id").alias("match_id"),
                F.round("cos", 6).alias("cos"), "rn")
    )
