"""Oracle registry — LLM pipeline: embeddings, ANN ladder (LSH/IVF/PQ), clustering.

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403

QUERIES, ORACLES, _reg = make_registry()


_reg(
    "sim_search_topk",
    lambda s, d: sim.sim_search_topk(load(s, d, "embeddings")),
    """
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
    s AS (SELECT q.query_id, n.vec_id AS match_id,
                 list_sum([qv[i] * v[i] FOR i IN range(1, len(v) + 1)]) / (qn * nrm) AS raw
          FROM n CROSS JOIN q WHERE n.vec_id != q.query_id)
    SELECT query_id, match_id, round(raw, 6) AS cos,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, match_id) AS BIGINT) AS rn
    FROM s QUALIFY rn <= 5
    """,
)


_reg(
    "emb_near_dup",
    lambda s, d: sim.emb_near_dup(load(s, d, "embeddings")),
    """
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_sum([a.v[i] * b.v[i] FOR i IN range(1, len(a.v) + 1)])
                 / (a.nrm * b.nrm), 6) AS cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_sum([a.v[i] * b.v[i] FOR i IN range(1, len(a.v) + 1)]) / (a.nrm * b.nrm) >= 0.4
    """,
)


_reg(
    "emb_cluster",
    lambda s, d: sim.emb_cluster(load(s, d, "embeddings")),
    """
    WITH RECURSIVE e AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_sum([a.v[i] * b.v[i] FOR i IN range(1, len(a.v) + 1)])
            / (a.nrm * b.nrm) >= 0.45),
    edges AS (
      SELECT vec_a AS src, vec_b AS dst FROM pairs
      UNION ALL
      SELECT vec_b AS src, vec_a AS dst FROM pairs),
    reach(a, b) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.a, e2.dst FROM reach r JOIN edges e2 ON r.b = e2.src)
    SELECT a AS vec_id, CAST(min(b) AS BIGINT) AS canonical_id
    FROM reach GROUP BY a
    """,
)


_reg(
    "emb_normalize",
    lambda s, d: sim.emb_normalize(load(s, d, "embeddings")),
    """
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm,
                 list_max([abs(x) FOR x IN v]) AS amax FROM e)
    SELECT vec_id,
           round(nrm, 4) AS l2_norm,
           round(CASE WHEN nrm > 0 THEN v[1] / nrm ELSE 0.0 END, 4) AS u0,
           array_to_string(
             [CAST(CASE WHEN amax > 0 THEN CAST(round(127.0 * x / amax) AS INT)
                        ELSE 0 END AS VARCHAR) FOR x IN v], ',') AS q8_csv
    FROM n
    """,
)


def _ann_oracle(n_queries: int = 5, k: int = 5, n_tables: int = 4, n_bits: int = 4) -> str:
    """DuckDB mirror of multi-table sign-LSH ANN. Approximate vs brute
    force, but DETERMINISTIC given the hyperplanes — which are plan-time
    literals from a seeded PRNG, so the oracle inlines the exact same
    floats (repr round-trips to the identical double) and reproduces
    buckets, candidates, and scores value-for-value."""
    from kdb_spark.llm.similarity import hyperplanes

    selects = []
    for t in range(n_tables):
        planes = hyperplanes(64, n_bits, seed=42 + 1000 * t)
        bits = " + ".join(
            "(CASE WHEN list_sum([v[i] * ("
            + "[" + ", ".join(repr(x) for x in p) + "]"
            + f")[i] FOR i IN range(1, 65)]) > 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        selects.append(f"SELECT vec_id, v, nrm, {t} AS tbl, {bits} AS bkt FROM n")
    union = "\n      UNION ALL ".join(selects)
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    b AS ({union}),
    q AS (SELECT vec_id AS query_id, tbl, bkt FROM b WHERE vec_id < {n_queries}),
    cand AS (
      SELECT DISTINCT q.query_id, b.vec_id AS match_id
      FROM b JOIN q USING (tbl, bkt) WHERE b.vec_id <> q.query_id),
    scored AS (
      SELECT c.query_id, c.match_id,
             list_sum([a.v[i] * m.v[i] FOR i IN range(1, 65)]) / (a.nrm * m.nrm) AS raw
      FROM cand c
      JOIN n a ON a.vec_id = c.query_id
      JOIN n m ON m.vec_id = c.match_id)
    SELECT query_id, match_id, round(raw, 6) AS cos,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, match_id) AS BIGINT) AS rn
    FROM scored QUALIFY rn <= {k}
    """


_reg(
    "ann_search_topk",
    lambda s, d: sim.ann_search_topk(load(s, d, "embeddings")),
    _ann_oracle(),
)


# IVF probes a subset of lists (approximate vs brute force) but every step —
# deterministic init, one Lloyd refinement, stable nearest-centroid ties —
# is reproducible, so the unrolled CTE chain value-checks it exactly.
_IVF_DOT = "list_sum([{a}[i] * {b}[i] FOR i IN range(1, 65)])"


def _ivf_oracle(n_queries: int = 5, k: int = 5, n_clusters: int = 16, nprobe: int = 2) -> str:
    dot_nc = _IVF_DOT.format(a="n.v", b="c.cv")
    dot_qm = _IVF_DOT.format(a="q.v", b="m.v")
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    c0 AS (SELECT vec_id AS cid, v AS cv,
                  sqrt(list_sum([x * x FOR x IN v])) AS cnrm
           FROM e WHERE vec_id < {n_clusters}),
    a0 AS (
      SELECT n.vec_id, c.cid,
             row_number() OVER (PARTITION BY n.vec_id
               ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
      FROM n CROSS JOIN c0 c),
    asg0 AS (SELECT vec_id, cid FROM a0 WHERE rk = 1),
    mdim AS (
      SELECT a.cid, t.i AS pos, avg(e.v[t.i]) AS x
      FROM asg0 a JOIN e ON e.vec_id = a.vec_id
      CROSS JOIN range(1, 65) t(i)
      GROUP BY a.cid, t.i),
    c1l AS (SELECT cid, list(x ORDER BY pos) AS cv FROM mdim GROUP BY cid),
    c1 AS (SELECT cid, cv, sqrt(list_sum([y * y FOR y IN cv])) AS cnrm FROM c1l),
    corpus AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c1 c) WHERE rk = 1),
    qprobe AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c1 c WHERE n.vec_id < {n_queries}) WHERE rk <= {nprobe}),
    scored AS (
      SELECT p.query_id, x.vec_id AS match_id,
             {dot_qm} / (q.nrm * m.nrm) AS raw
      FROM qprobe p
      JOIN corpus x ON x.cid = p.cid AND x.vec_id <> p.query_id
      JOIN n q ON q.vec_id = p.query_id
      JOIN n m ON m.vec_id = x.vec_id)
    SELECT query_id, match_id, round(raw, 6) AS cos,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, match_id) AS BIGINT) AS rn
    FROM scored QUALIFY rn <= {k}
    """


_reg(
    "ivf_search_topk",
    lambda s, d: sim.ivf_search_topk(load(s, d, "embeddings")),
    _ivf_oracle(),
)


def _pq_oracle(n_queries: int = 5, k: int = 5, m: int = 16, ksub: int = 32) -> str:
    """SQL mirror of pq_search_topk's deterministic construction: normalize,
    split into m 4-dim subspaces, seeded init + one Lloyd step per
    subspace (empty codewords drop out of the GROUP BY), encode by argmin
    L2 (ties → lowest codeword), ADC-score, top-k."""
    sd = 64 // m
    l2 = (
        "list_sum([(v.sv[i] - c.cv[i]) * (v.sv[i] - c.cv[i]) "
        f"FOR i IN range(1, {sd + 1})])"
    )
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id,
                 [x / greatest(sqrt(list_sum([y * y FOR y IN v])), 1e-30) FOR x IN v] AS nv
          FROM e),
    subv AS (SELECT vec_id, t.s AS sub, nv[t.s * {sd} + 1 : t.s * {sd} + {sd}] AS sv
             FROM n CROSS JOIN range(0, {m}) t(s)),
    c0 AS (SELECT sub, vec_id AS cid, sv AS cv FROM subv WHERE vec_id < {ksub}),
    a0 AS (SELECT v.vec_id, v.sub, c.cid,
                  row_number() OVER (PARTITION BY v.vec_id, v.sub
                    ORDER BY {l2} ASC, c.cid) AS rk
           FROM subv v JOIN c0 c ON c.sub = v.sub),
    asg0 AS (SELECT vec_id, sub, cid FROM a0 WHERE rk = 1),
    mdim AS (SELECT a.sub, a.cid, t.i AS pos, avg(v.sv[t.i]) AS x
             FROM asg0 a JOIN subv v ON v.vec_id = a.vec_id AND v.sub = a.sub
             CROSS JOIN range(1, {sd + 1}) t(i)
             GROUP BY a.sub, a.cid, t.i),
    c1 AS (SELECT sub, cid, list(x ORDER BY pos) AS cv FROM mdim GROUP BY sub, cid),
    codes AS (SELECT vec_id, sub, cid FROM (
        SELECT v.vec_id, v.sub, c.cid,
               row_number() OVER (PARTITION BY v.vec_id, v.sub
                 ORDER BY {l2} ASC, c.cid) AS rk
        FROM subv v JOIN c1 c ON c.sub = v.sub) WHERE rk = 1),
    adc AS (SELECT v.vec_id AS query_id, c.sub, c.cid,
                   list_sum([v.sv[i] * c.cv[i] FOR i IN range(1, {sd + 1})]) AS qd
            FROM subv v JOIN c1 c ON c.sub = v.sub WHERE v.vec_id < {n_queries}),
    scored AS (SELECT a.query_id, x.vec_id AS match_id, sum(a.qd) AS score_pq
               FROM codes x JOIN adc a ON a.sub = x.sub AND a.cid = x.cid
               WHERE x.vec_id <> a.query_id
               GROUP BY 1, 2)
    SELECT query_id, match_id, round(score_pq, 6) AS score_pq,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_pq DESC, match_id) AS BIGINT) AS rn
    FROM scored QUALIFY rn <= {k}
    """


_reg(
    "pq_search_topk",
    lambda s, d: sim.pq_search_topk(load(s, d, "embeddings")),
    _pq_oracle(),
)


def _pca_oracle(n_components: int = 2, iters: int = 8, d: int = 64) -> str:
    """Symbolic mirror of emb_pca: covariance from raw moments, fixed-e₁
    power iteration (unrolled), deflation, map-side projection. The
    matrix lives as a (i, j, c) table; each iteration is one matvec join
    + one normalization subquery."""
    ctes = [
        f"e AS MATERIALIZED (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings)",
        f"dims AS MATERIALIZED (SELECT i FROM range(1, {d + 1}) t(i))",
        "mu AS MATERIALIZED (SELECT i, avg(v[i]) AS m FROM e CROSS JOIN dims GROUP BY i)",
        """c0 AS MATERIALIZED (SELECT di.i AS i, dj.i AS j, avg(e.v[di.i] * e.v[dj.i]) AS raw
       FROM e CROSS JOIN dims di CROSS JOIN dims dj GROUP BY 1, 2)""",
        """cov1 AS MATERIALIZED (SELECT c0.i, c0.j, c0.raw - a.m * b.m AS c
       FROM c0 JOIN mu a ON a.i = c0.i JOIN mu b ON b.i = c0.j)""",
    ]
    projs = []
    for comp in range(1, n_components + 1):
        cv = f"cov{comp}"
        ctes.append(
            f"v{comp}_0 AS MATERIALIZED (SELECT i, CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END AS x FROM dims)"
        )
        for it in range(1, iters + 1):
            prev = f"v{comp}_{it - 1}"
            raw = f"v{comp}_{it}r"
            ctes.append(
                f"{raw} AS MATERIALIZED (SELECT {cv}.i, sum({cv}.c * v.x) AS x "
                f"FROM {cv} JOIN {prev} v ON v.i = {cv}.j GROUP BY 1)"
            )
            ctes.append(
                f"v{comp}_{it} AS MATERIALIZED (SELECT i, x / (SELECT sqrt(sum(x * x)) FROM {raw}) AS x FROM {raw})"
            )
        vfin = f"v{comp}_{iters}"
        ctes.append(
            f"lam{comp} AS MATERIALIZED (SELECT sum({cv}.c * a.x * b.x) AS l "
            f"FROM {cv} JOIN {vfin} a ON a.i = {cv}.i JOIN {vfin} b ON b.i = {cv}.j)"
        )
        if comp < n_components:
            ctes.append(
                f"cov{comp + 1} AS MATERIALIZED (SELECT {cv}.i, {cv}.j, "
                f"{cv}.c - (SELECT l FROM lam{comp}) * a.x * b.x AS c "
                f"FROM {cv} JOIN {vfin} a ON a.i = {cv}.i JOIN {vfin} b ON b.i = {cv}.j)"
            )
        ctes.append(
            f"p{comp} AS MATERIALIZED (SELECT e.vec_id, sum(e.v[w.i] * w.x) AS dotv "
            f"FROM e CROSS JOIN {vfin} w GROUP BY 1)"
        )
        ctes.append(
            f"s{comp} AS MATERIALIZED (SELECT sum(mu.m * w.x) AS sh FROM mu JOIN {vfin} w USING (i))"
        )
        projs.append(
            f"round(p{comp}.dotv - (SELECT sh FROM s{comp}), 4) AS pc{comp}"
        )
    joins = " ".join(
        f"JOIN p{c} ON p{c}.vec_id = p1.vec_id" for c in range(2, n_components + 1)
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT p1.vec_id, {', '.join(projs)} FROM p1 {joins}"
    )


_reg(
    "emb_pca",
    lambda s, d: sim.emb_pca(load(s, d, "embeddings")),
    _pca_oracle(),
)


def _kmeans_oracle(n_clusters: int = 8, iters: int = 3) -> str:
    """DuckDB mirror of emb_kmeans: the fixed ``iters`` Lloyd rounds unroll
    into a generated CTE chain (assign → per-dim means → coalesce empty
    clusters with their previous centroid), so even the "iterative" op gets
    an exact value check. Same assignment convention as ivf: cosine,
    ties → lowest cluster id."""
    dot = "list_sum([n.v[i] * c.cv[i] FOR i IN range(1, 65)])"
    parts = [
        "e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings)",
        "n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e)",
        f"c0l AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {n_clusters})",
        "c0 AS (SELECT cid, cv, sqrt(list_sum([y * y FOR y IN cv])) AS cnrm FROM c0l)",
    ]
    for j in range(iters):
        parts += [
            f"""a{j} AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c{j} c) WHERE rk = 1)""",
            f"""md{j} AS (
      SELECT a.cid, t.i AS pos, avg(e.v[t.i]) AS x
      FROM a{j} a JOIN e ON e.vec_id = a.vec_id
      CROSS JOIN range(1, 65) t(i)
      GROUP BY a.cid, t.i)""",
            f"cl{j} AS (SELECT cid, list(x ORDER BY pos) AS cv FROM md{j} GROUP BY cid)",
            f"""c{j + 1} AS (
      SELECT p.cid, COALESCE(f.cv, p.cv) AS cv,
             sqrt(list_sum([y * y FOR y IN COALESCE(f.cv, p.cv)])) AS cnrm
      FROM c{j} p LEFT JOIN cl{j} f ON f.cid = p.cid)""",
        ]
    parts.append(
        f"""final AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c{iters} c) WHERE rk = 1)"""
    )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
           CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_members
    FROM final
    """


_reg(
    "emb_kmeans",
    lambda s, d: sim.emb_kmeans(load(s, d, "embeddings")),
    _kmeans_oracle(),
)


def _qmean_sql(x: str, grid: str = "16777216.0") -> str:
    """DuckDB mirror of similarity._qmean: exact HUGEINT sum on the grid,
    then the identical double divide-out expression."""
    return (
        f"CAST(sum(CAST(round({x} * {grid}) AS HUGEINT)) AS DOUBLE)"
        f" / (CAST(count(*) AS DOUBLE) * {grid})"
    )


def _emb_outliers_oracle(dim: int = 64) -> str:
    cents = ", ".join(
        f"{_qmean_sql(f'v[{i + 1}]')} AS c{i + 1}" for i in range(dim)
    )
    # left-assoc + chain mirrors Spark's sequential fold order exactly
    sq = " + ".join(f"(v[{i + 1}] - c{i + 1}) * (v[{i + 1}] - c{i + 1})" for i in range(dim))
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
               FROM embeddings),
    c AS (SELECT {cents} FROM e),
    scored AS (SELECT vec_id, sqrt(0.0 + {sq}) AS dist FROM e CROSS JOIN c),
    st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(sum(CAST(round(dist * 1000000.0) AS HUGEINT)) AS DOUBLE) AS s1,
                  CAST(sum(CAST(round(dist * 1000000.0) * round(dist * 1000000.0)
                                AS HUGEINT)) AS DOUBLE) AS s2
           FROM scored),
    zs AS (SELECT vec_id, dist, round(dist * 1000000.0) AS dq, s1 / n AS mu_q,
                  CASE WHEN n > 1.0 AND (s2 - s1 * s1 / n) / (n - 1.0) > 0.0
                       THEN sqrt((s2 - s1 * s1 / n) / (n - 1.0)) END AS sd_q
           FROM scored CROSS JOIN st)
    SELECT vec_id, round(dist, 4) AS dist,
           round((dq - mu_q) / sd_q, 4) AS z,
           (dq - mu_q) / sd_q > 2.0 AS is_outlier
    FROM zs
    """


_reg(
    "emb_outliers",
    lambda s, d: sim.emb_outliers(load(s, d, "embeddings")),
    _emb_outliers_oracle(),
)


def _q_ivf_index_search(s: SparkSession, d: str) -> DataFrame:
    # sources._tmp: memory-backed ephemeral sink scratch (the IVF layout
    # lives exactly one query; see the _tmp docstring for the contract)
    from kdb_spark.sources import _tmp

    return sim.ivf_index_search(load(s, d, "embeddings"), _tmp("ivfidx"))


_reg("ivf_index_search", _q_ivf_index_search, _ivf_oracle())


def _mmr_oracle(n_queries: int = 5, m: int = 10) -> str:
    dot_qc = _IVF_DOT.format(a="q.v", b="c.v")
    dot_ab = _IVF_DOT.format(a="na.v", b="nb.v")
    # λ literal mirrors Python: 0.7 and (1.0 - 0.7) — the latter is NOT 0.3
    # in IEEE, and both engines must compute the same subtraction
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
               FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    scored0 AS (
      SELECT q.vec_id AS query_id, c.vec_id AS match_id,
             {dot_qc} / (q.nrm * c.nrm) AS rel
      FROM n q JOIN n c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {n_queries}),
    cand AS (
      SELECT query_id, match_id, rel FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY rel DESC, match_id) AS rn
        FROM scored0) WHERE rn <= {m}),
    pair AS (
      SELECT a.query_id, a.match_id AS pa, b.match_id AS pb,
             {dot_ab} / (na.nrm * nb.nrm) AS sim
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id AND a.match_id <> b.match_id
      JOIN n na ON na.vec_id = a.match_id
      JOIN n nb ON nb.vec_id = b.match_id),
    s1 AS (
      SELECT query_id, match_id, rel,
             0.7 * rel - (1.0 - 0.7) * 0.0 AS score FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY 0.7 * rel - (1.0 - 0.7) * 0.0 DESC, match_id) AS rk
        FROM cand) WHERE rk = 1),
    m2 AS (
      SELECT c.query_id, c.match_id, c.rel,
             0.7 * c.rel - (1.0 - 0.7) * p.sim AS score
      FROM cand c
      JOIN s1 ON s1.query_id = c.query_id AND c.match_id <> s1.match_id
      JOIN pair p ON p.query_id = c.query_id AND p.pa = c.match_id
                 AND p.pb = s1.match_id),
    s2 AS (
      SELECT query_id, match_id, rel, score FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, match_id) AS rk
        FROM m2) WHERE rk = 1),
    m3 AS (
      SELECT c.query_id, c.match_id, c.rel,
             0.7 * c.rel - (1.0 - 0.7) * greatest(p1.sim, p2.sim) AS score
      FROM cand c
      JOIN s1 ON s1.query_id = c.query_id
      JOIN s2 ON s2.query_id = c.query_id
      JOIN pair p1 ON p1.query_id = c.query_id AND p1.pa = c.match_id
                  AND p1.pb = s1.match_id
      JOIN pair p2 ON p2.query_id = c.query_id AND p2.pa = c.match_id
                  AND p2.pb = s2.match_id
      WHERE c.match_id <> s1.match_id AND c.match_id <> s2.match_id),
    s3 AS (
      SELECT query_id, match_id, rel, score FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, match_id) AS rk
        FROM m3) WHERE rk = 1)
    SELECT query_id, match_id, CAST(1 AS BIGINT) AS round,
           round(rel, 6) AS rel, round(score, 6) AS mmr FROM s1
    UNION ALL
    SELECT query_id, match_id, CAST(2 AS BIGINT), round(rel, 6), round(score, 6) FROM s2
    UNION ALL
    SELECT query_id, match_id, CAST(3 AS BIGINT), round(rel, 6), round(score, 6) FROM s3
    """


_reg(
    "emb_mmr_rerank",
    lambda s, d: sim.emb_mmr_rerank(load(s, d, "embeddings")),
    _mmr_oracle(),
)


def _centroid_classify_oracle(dim: int = 64) -> str:
    avgs = ", ".join(
        f"{_qmean_sql(f'v[{i + 1}]')} AS c{i + 1}" for i in range(dim)
    )
    cv = "[" + ", ".join(f"c{i + 1}" for i in range(dim)) + "]"
    dot_vc = _IVF_DOT.format(a="n.v", b="c.cv")
    return f"""
    WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                      [CAST(x AS DOUBLE) FOR x IN embedding] AS v
               FROM embeddings),
    n AS (SELECT vec_id, label, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm
          FROM e),
    craw AS (SELECT label AS clabel, {avgs} FROM e GROUP BY label),
    c AS (SELECT clabel, {cv} AS cv,
                 sqrt(list_sum([y * y FOR y IN {cv}])) AS cnrm
          FROM craw),
    scored AS (
      SELECT n.vec_id, n.label, c.clabel,
             {dot_vc} / (n.nrm * c.cnrm) AS cos
      FROM n CROSS JOIN c),
    pred AS (
      SELECT vec_id, label, clabel FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, clabel) AS rn
        FROM scored) WHERE rn = 1)
    SELECT label AS true_label, clabel AS pred_label,
           CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
    """


_reg(
    "emb_centroid_classify",
    lambda s, d: sim.emb_centroid_classify(load(s, d, "embeddings")),
    _centroid_classify_oracle(),
)


def _ivfpq_oracle(
    n_queries: int = 5,
    k: int = 5,
    m: int = 16,
    ksub: int = 32,
    n_clusters: int = 16,
    nprobe: int = 2,
) -> str:
    """SQL mirror of ivfpq_search_topk: the _ivf_oracle coarse CTEs pick
    each query's probed lists and every vector's home list; the _pq_oracle
    CTEs build codebooks/codes/ADC tables; the score join keeps only
    (query, vector) pairs whose home list is probed by that query."""
    sd = 64 // m
    dot_nc = _IVF_DOT.format(a="n.v", b="c.cv")
    l2 = (
        "list_sum([(v.sv[i] - c.cv[i]) * (v.sv[i] - c.cv[i]) "
        f"FOR i IN range(1, {sd + 1})])"
    )
    return f"""
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    c0c AS (SELECT vec_id AS cid, v AS cv,
                   sqrt(list_sum([x * x FOR x IN v])) AS cnrm
            FROM e WHERE vec_id < {n_clusters}),
    a0c AS (
      SELECT n.vec_id, c.cid,
             row_number() OVER (PARTITION BY n.vec_id
               ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
      FROM n CROSS JOIN c0c c),
    asg0c AS (SELECT vec_id, cid FROM a0c WHERE rk = 1),
    mdimc AS (
      SELECT a.cid, t.i AS pos, avg(e.v[t.i]) AS x
      FROM asg0c a JOIN e ON e.vec_id = a.vec_id
      CROSS JOIN range(1, 65) t(i)
      GROUP BY a.cid, t.i),
    c1cl AS (SELECT cid, list(x ORDER BY pos) AS cv FROM mdimc GROUP BY cid),
    c1c AS (SELECT cid, cv, sqrt(list_sum([y * y FOR y IN cv])) AS cnrm FROM c1cl),
    corpus AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c1c c) WHERE rk = 1),
    qprobe AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT n.vec_id, c.cid,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY {dot_nc} / (n.nrm * c.cnrm) DESC, c.cid) AS rk
        FROM n CROSS JOIN c1c c WHERE n.vec_id < {n_queries}) WHERE rk <= {nprobe}),
    nn AS (SELECT vec_id,
                  [x / greatest(sqrt(list_sum([y * y FOR y IN v])), 1e-30) FOR x IN v] AS nv
           FROM e),
    subv AS (SELECT vec_id, t.s AS sub, nv[t.s * {sd} + 1 : t.s * {sd} + {sd}] AS sv
             FROM nn CROSS JOIN range(0, {m}) t(s)),
    b0 AS (SELECT sub, vec_id AS cid, sv AS cv FROM subv WHERE vec_id < {ksub}),
    ab0 AS (SELECT v.vec_id, v.sub, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id, v.sub
                     ORDER BY {l2} ASC, c.cid) AS rk
            FROM subv v JOIN b0 c ON c.sub = v.sub),
    basg0 AS (SELECT vec_id, sub, cid FROM ab0 WHERE rk = 1),
    bmdim AS (SELECT a.sub, a.cid, t.i AS pos, avg(v.sv[t.i]) AS x
              FROM basg0 a JOIN subv v ON v.vec_id = a.vec_id AND v.sub = a.sub
              CROSS JOIN range(1, {sd + 1}) t(i)
              GROUP BY a.sub, a.cid, t.i),
    b1 AS (SELECT sub, cid, list(x ORDER BY pos) AS cv FROM bmdim GROUP BY sub, cid),
    codes AS (SELECT vec_id, sub, cid FROM (
        SELECT v.vec_id, v.sub, c.cid,
               row_number() OVER (PARTITION BY v.vec_id, v.sub
                 ORDER BY {l2} ASC, c.cid) AS rk
        FROM subv v JOIN b1 c ON c.sub = v.sub) WHERE rk = 1),
    adc AS (SELECT v.vec_id AS query_id, c.sub, c.cid,
                   list_sum([v.sv[i] * c.cv[i] FOR i IN range(1, {sd + 1})]) AS qd
            FROM subv v JOIN b1 c ON c.sub = v.sub WHERE v.vec_id < {n_queries}),
    scored AS (SELECT a.query_id, x.vec_id AS match_id, sum(a.qd) AS score_pq
               FROM codes x
               JOIN corpus cx ON cx.vec_id = x.vec_id
               JOIN adc a ON a.sub = x.sub AND a.cid = x.cid
               JOIN qprobe p ON p.query_id = a.query_id AND p.cid = cx.cid
               WHERE x.vec_id <> a.query_id
               GROUP BY 1, 2)
    SELECT query_id, match_id, round(score_pq, 6) AS score_pq,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_pq DESC, match_id) AS BIGINT) AS rn
    FROM scored QUALIFY rn <= {k}
    """


_reg(
    "ivfpq_search_topk",
    lambda s, d: sim.ivfpq_search_topk(load(s, d, "embeddings")),
    _ivfpq_oracle(),
)


_reg(
    "emb_dim_stats",
    lambda s, d: sim.emb_dim_stats(load(s, d, "embeddings")),
    """
    WITH flat AS (
      SELECT unnest(range(len(embedding))) AS pos,
             unnest(embedding) AS v
      FROM embeddings),
    c AS (
      SELECT pos, v, CAST(round(v * 1e6) AS BIGINT) AS v6 FROM flat),
    g AS (
      SELECT pos, count(*) AS n, sum(v6) AS s1,
             sum(CAST(v6 AS HUGEINT) * v6) AS s2,
             min(v) AS lo, max(v) AS hi
      FROM c GROUP BY 1)
    SELECT CAST(pos AS BIGINT) AS pos, CAST(n AS BIGINT) AS n,
           CAST((CASE WHEN s1 < 0 THEN -1 ELSE 1 END)
                * ((2 * abs(CAST(s1 AS HUGEINT)) + n)
                   // (2 * CAST(n AS HUGEINT))) AS DOUBLE)
             / 1000000.0 AS mean,
           round(sqrt(greatest(
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)),
             0.0)) / 1e6, 6) AS std,
           lo, hi
    FROM g
    """,
)


_reg(
    "emb_quantize_sq8",
    lambda s, d: sim.emb_quantize_sq8(load(s, d, "embeddings")),
    """
    WITH base AS (
      SELECT vec_id, embedding,
             CAST(list_min(embedding) AS DOUBLE) AS lo,
             CAST(list_max(embedding) AS DOUBLE) AS hi
      FROM embeddings),
    b2 AS (SELECT vec_id, embedding, lo, hi, hi - lo AS rng FROM base),
    q AS (
      SELECT vec_id, lo, hi, rng,
             list_transform(embedding, x -> CASE WHEN rng > 0
               THEN CAST(floor((CAST(x AS DOUBLE) - lo) / rng * 255.0 + 0.5)
                         AS INT)
               ELSE 0 END) AS codes,
             list_transform(embedding, x -> CASE WHEN rng > 0
               THEN CAST(x AS DOUBLE)
                    - (lo + CAST(CAST(floor((CAST(x AS DOUBLE) - lo)
                                             / rng * 255.0 + 0.5) AS INT)
                                 AS DOUBLE) * rng / 255.0)
               ELSE CAST(x AS DOUBLE) - lo END) AS errs
      FROM b2)
    SELECT vec_id,
           floor(lo * 1e6 + 0.5) / 1e6 AS lo,
           floor(hi * 1e6 + 0.5) / 1e6 AS hi,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           floor(list_reduce(list_transform(errs, e -> e * e),
                             (a, b) -> a + b)
                 / CAST(len(errs) AS DOUBLE) * 1e10 + 0.5) / 1e10 AS mse
    FROM q
    """,
)


_reg(
    "emb_hamming_topk",
    lambda s, d: sim.emb_hamming_topk(load(s, d, "embeddings")),
    """
    WITH flat AS (
      SELECT vec_id, unnest(range(len(embedding))) AS pos,
             CAST(round(unnest(embedding) * 1e6) AS BIGINT) AS v6
      FROM embeddings),
    dims AS (
      SELECT pos, sum(v6) AS s1, count(*) AS n FROM flat GROUP BY 1),
    bits AS (
      SELECT f.vec_id, f.pos,
             CASE WHEN CAST(f.v6 AS HUGEINT) * d.n > d.s1 THEN 1
                  ELSE 0 END AS bit
      FROM flat f JOIN dims d ON f.pos = d.pos),
    sigs AS (
      SELECT vec_id,
             bit_or(CASE WHEN pos < 32
                    THEN CAST(bit AS BIGINT) << CAST(pos AS INT)
                    ELSE 0 END) AS sig_lo,
             bit_or(CASE WHEN pos >= 32
                    THEN CAST(bit AS BIGINT) << CAST(pos - 32 AS INT)
                    ELSE 0 END) AS sig_hi
      FROM bits GROUP BY 1),
    queries AS (
      SELECT vec_id AS q_id, sig_lo AS q_lo, sig_hi AS q_hi
      FROM sigs ORDER BY vec_id LIMIT 5),
    scored AS (
      SELECT q.q_id, s.vec_id,
             CAST(bit_count(xor(s.sig_lo, q.q_lo))
                  + bit_count(xor(s.sig_hi, q.q_hi)) AS INT) AS hamming
      FROM sigs s CROSS JOIN queries q
      WHERE s.vec_id != q.q_id)
    SELECT q_id, vec_id, hamming,
           CAST(row_number() OVER (PARTITION BY q_id
                                   ORDER BY hamming, vec_id) AS INT) AS rk
    FROM scored
    QUALIFY rk <= 5
    """,
)


# MRL truncation safety report: exact micro-unit energy folds, integer-
# rounded energy ratio, sqrt-on-the-floor-grid cosine — engine-exact,
# zero-shuffle
_reg(
    "emb_matryoshka_report",
    lambda s, d: sim.emb_matryoshka_report(load(s, d, "embeddings")),
    """
    WITH t AS (
      SELECT vec_id,
             CAST(len(embedding) AS BIGINT) AS dim_full,
             list_sum(list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
                    * CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))) AS sa,
             list_sum(list_transform(embedding[1:16],
               x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
                    * CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))) AS sk
      FROM embeddings)
    SELECT vec_id, dim_full, CAST(16 AS BIGINT) AS k,
           CASE WHEN sa > 0 THEN
             CAST((2000000 * CAST(sk AS HUGEINT) + sa)
                  // (2 * CAST(sa AS HUGEINT)) AS DOUBLE) / 1e6
           END AS energy_kept,
           CASE WHEN sa > 0 THEN
             floor(sqrt(CAST(sk AS DOUBLE) / CAST(sa AS DOUBLE)) * 1e6 + 0.5)
               / 1e6
           END AS cos_kept
    FROM t
    """,
)


# ANN recall@k vs the exact brute-force baseline as a first-class query:
# both parents' oracles composed — hit counts exact, recall on the device
_BRUTE_TOPK_SQL = """
    WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
    s AS (SELECT q.query_id, n.vec_id AS match_id,
                 list_sum([qv[i] * v[i] FOR i IN range(1, len(v) + 1)]) / (qn * nrm) AS raw
          FROM n CROSS JOIN q WHERE n.vec_id != q.query_id)
    SELECT query_id, match_id
    FROM (SELECT query_id, match_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY raw DESC, match_id) AS rn
          FROM s) WHERE rn <= 5
"""


_reg(
    "emb_recall_eval",
    lambda s, d: sim.emb_recall_eval(load(s, d, "embeddings")),
    f"""
    WITH brute AS ({_BRUTE_TOPK_SQL}),
    ann AS ({_ann_oracle()}),
    j AS (
      SELECT b.query_id,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CASE WHEN a.match_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit
      FROM brute b
      LEFT JOIN ann a ON a.query_id = b.query_id AND a.match_id = b.match_id
      GROUP BY 1)
    SELECT query_id, k, n_hit,
           CAST((2000000 * CAST(n_hit AS HUGEINT) + k)
                // (2 * CAST(k AS HUGEINT)) AS DOUBLE) / 1e6 AS recall
    FROM j
    """,
)


# Per-label centroid drift between deterministic halves: micro-unit
# integer means, exact squared-gap fold, one IEEE sqrt
_reg(
    "emb_label_drift",
    lambda s, d: sim.emb_label_drift(load(s, d, "embeddings")),
    """
    WITH flat AS (
      SELECT label, CAST(vec_id % 2 = 0 AS INT) AS even,
             unnest(range(len(embedding))) AS pos,
             unnest(embedding) AS v
      FROM embeddings),
    g AS (
      SELECT label, even, pos, count(*) AS n,
             sum(CAST(round(v * 1e6) AS BIGINT)) AS s
      FROM flat GROUP BY 1, 2, 3),
    m AS (
      SELECT label, even, pos, n,
             (CASE WHEN s < 0 THEN -1 ELSE 1 END)
             * ((2 * abs(CAST(s AS HUGEINT)) + n) // (2 * CAST(n AS HUGEINT)))
               AS m6
      FROM g),
    sides AS (
      SELECT label, pos,
             sum(CASE WHEN even = 1 THEN n END) AS n_even,
             sum(CASE WHEN even = 0 THEN n END) AS n_odd,
             max(CASE WHEN even = 1 THEN m6 END) AS me,
             max(CASE WHEN even = 0 THEN m6 END) AS mo
      FROM m GROUP BY 1, 2),
    p AS (
      SELECT label, CAST(min(n_even) AS BIGINT) AS n_even,
             CAST(min(n_odd) AS BIGINT) AS n_odd,
             sum((me - mo) * (me - mo)) AS ss,
             CAST(count(*) AS BIGINT) AS d
      FROM sides GROUP BY 1)
    SELECT CAST(label AS BIGINT) AS label, n_even, n_odd, d,
           CASE WHEN n_even > 0 AND n_odd > 0
                THEN round(sqrt(CAST(ss AS DOUBLE)) / 1e6, 6) END
             AS centroid_l2_drift
    FROM p
    """,
)


# Within-label scatter (covariance trace + RMS radius): integer-moment
# variance numerators summed exactly over dims, one device divide
_reg(
    "emb_label_spread",
    lambda s, d: sim.emb_label_spread(load(s, d, "embeddings")),
    """
    WITH flat AS (
      SELECT label, unnest(range(len(embedding))) AS pos,
             unnest(embedding) AS v
      FROM embeddings),
    c AS (
      SELECT label, pos, CAST(round(v * 1e6) AS BIGINT) AS v6 FROM flat),
    g AS (
      SELECT label, pos, count(*) AS n, sum(v6) AS s1,
             sum(CAST(v6 AS HUGEINT) * v6) AS s2
      FROM c GROUP BY 1, 2),
    p AS (
      SELECT label, CAST(min(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS d,
             sum(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1) AS num
      FROM g GROUP BY 1),
    t AS (
      SELECT label, n, d,
             (2 * num + CAST(n AS HUGEINT) * n)
               // (2 * CAST(n AS HUGEINT) * n) AS trace_e12
      FROM p)
    SELECT CAST(label AS BIGINT) AS label, n, d,
           CAST(trace_e12 AS DOUBLE) / 1e12 AS trace_var,
           round(sqrt(CAST(trace_e12 AS DOUBLE) / 1e12), 6) AS rms_spread
    FROM t
    """,
)


# Label-affinity cosine matrix over micro-unit integer centroids: the
# confusion-risk map (one sqrt of an exact product per pair)
_reg(
    "emb_label_affinity",
    lambda s, d: sim.emb_label_affinity(load(s, d, "embeddings")),
    """
    WITH flat AS (
      SELECT label, unnest(range(len(embedding))) AS pos,
             unnest(embedding) AS v
      FROM embeddings),
    g AS (
      SELECT label, pos, count(*) AS n,
             sum(CAST(round(v * 1e6) AS BIGINT)) AS s
      FROM flat GROUP BY 1, 2),
    m AS (
      SELECT label, pos,
             (CASE WHEN s < 0 THEN -1 ELSE 1 END)
             * ((2 * abs(CAST(s AS HUGEINT)) + n) // (2 * CAST(n AS HUGEINT)))
               AS m6
      FROM g),
    p AS (
      SELECT a.label AS la, b.label AS lb,
             sum(a.m6 * b.m6) AS dot,
             sum(a.m6 * a.m6) AS na2,
             sum(b.m6 * b.m6) AS nb2
      FROM m a JOIN m b ON a.pos = b.pos AND a.label < b.label
      GROUP BY 1, 2)
    SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b,
           CASE WHEN na2 > 0 AND nb2 > 0 THEN
             round(CAST(dot AS DOUBLE) / sqrt(CAST(na2 * nb2 AS DOUBLE)), 6)
           END AS cosine
    FROM p
    """,
)


# Hard-negative mining: brute cosine top-k constrained to label mismatch
_reg(
    "emb_hard_negatives",
    lambda s, d: sim.emb_hard_negatives(load(s, d, "embeddings")),
    """
    WITH e AS (SELECT vec_id, label,
                      [CAST(x AS DOUBLE) FOR x IN embedding] AS v
               FROM embeddings),
    n AS (SELECT vec_id, label, v,
                 sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
    q AS (SELECT vec_id AS query_id, label AS q_label, v AS qv, nrm AS qn
          FROM n WHERE vec_id < 5),
    s AS (SELECT q.query_id, n.vec_id AS negative_id,
                 CAST(n.label AS BIGINT) AS negative_label,
                 list_sum([qv[i] * v[i] FOR i IN range(1, len(v) + 1)])
                   / (qn * nrm) AS raw
          FROM n CROSS JOIN q WHERE n.label != q.q_label)
    SELECT query_id, negative_id, negative_label, round(raw, 6) AS cos,
           CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY raw DESC, negative_id) AS rn
          FROM s) WHERE rn <= 3
    """,
)


def _label_exemplars_oracle(k: int = 3, dim: int = 64) -> str:
    """SQL mirror of emb_label_exemplars: the classify oracle's exact
    centroid CTEs, scored only against the OWN label's centroid."""
    avgs = ", ".join(
        f"{_qmean_sql(f'v[{i + 1}]')} AS c{i + 1}" for i in range(dim)
    )
    cv = "[" + ", ".join(f"c{i + 1}" for i in range(dim)) + "]"
    dot_vc = _IVF_DOT.format(a="n.v", b="c.cv")
    return f"""
    WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                      [CAST(x AS DOUBLE) FOR x IN embedding] AS v
               FROM embeddings),
    n AS (SELECT vec_id, label, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm
          FROM e),
    craw AS (SELECT label AS clabel, {avgs} FROM e GROUP BY label),
    c AS (SELECT clabel, {cv} AS cv,
                 sqrt(list_sum([y * y FOR y IN {cv}])) AS cnrm
          FROM craw),
    scored AS (
      SELECT n.label, n.vec_id,
             {dot_vc} / (n.nrm * c.cnrm) AS cos
      FROM n JOIN c ON n.label = c.clabel)
    SELECT label, CAST(rank AS BIGINT) AS rank, vec_id, round(cos, 6) AS cos
    FROM (SELECT *, row_number() OVER (PARTITION BY label
                     ORDER BY cos DESC, vec_id) AS rank
          FROM scored)
    WHERE rank <= {k}
    """


_reg(
    "emb_label_exemplars",
    lambda s, d: sim.emb_label_exemplars(load(s, d, "embeddings")),
    _label_exemplars_oracle(),
)


# Cross-modal agreement: exact-Jaccard near-dup text pairs (the ngram
# oracle verbatim as a CTE) joined to both embeddings, sequential-fold cos
from kdb_spark.oracles.llm_dedup import _NGRAM_JACCARD_SQL as _NJ_SQL  # noqa: E402

_reg(
    "emb_text_agreement",
    lambda s, d: sim.emb_text_agreement(
        load(s, d, "documents"), load(s, d, "embeddings")
    ),
    f"""
    WITH pairs AS ({_NJ_SQL}),
    e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
          FROM embeddings),
    nv AS (SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm
           FROM e)
    SELECT p.doc_a, p.doc_b, round(p.jaccard, 6) AS jaccard,
           round({_IVF_DOT.format(a="a.v", b="b.v")} / (a.nrm * b.nrm), 6)
             AS cos
    FROM pairs p
    JOIN nv a ON a.vec_id = p.doc_a
    JOIN nv b ON b.vec_id = p.doc_b
    """,
)


_reg(
    "emb_random_projection",
    lambda s, d: sim.emb_random_projection(load(s, d, "embeddings")),
    # the sign matrix is the SAME md5 pure function in both engines
    # (first hex char of md5("i:j") <= '7', i 0-based); grid components
    # and all sums are exact bigints, so the sketch is bit-identical
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
               AS q
      FROM embeddings),
    pj AS (
      SELECT vec_id, t.j,
             CAST(list_sum(list_transform(q.q, (x, i) ->
               x * CASE WHEN substr(md5(CAST(i - 1 AS VARCHAR) || ':'
                                        || CAST(t.j AS VARCHAR)), 1, 1)
                             <= '7'
                        THEN 1 ELSE -1 END)) AS BIGINT) AS p
      FROM q, range(0, 8) t(j)),
    agg AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN j = 0 THEN p END) AS BIGINT) AS p0,
             CAST(sum(CASE WHEN j = 1 THEN p END) AS BIGINT) AS p1,
             CAST(sum(CASE WHEN j = 2 THEN p END) AS BIGINT) AS p2,
             CAST(sum(CASE WHEN j = 3 THEN p END) AS BIGINT) AS p3,
             CAST(sum(CASE WHEN j = 4 THEN p END) AS BIGINT) AS p4,
             CAST(sum(CASE WHEN j = 5 THEN p END) AS BIGINT) AS p5,
             CAST(sum(CASE WHEN j = 6 THEN p END) AS BIGINT) AS p6,
             CAST(sum(CASE WHEN j = 7 THEN p END) AS BIGINT) AS p7,
             CAST(sum(p * p) AS BIGINT) AS pnorm2
      FROM pj GROUP BY 1)
    SELECT a.vec_id, a.p0, a.p1, a.p2, a.p3, a.p4, a.p5, a.p6, a.p7,
           CAST(list_sum(list_transform(q.q, x -> x * x)) AS BIGINT)
             AS qnorm2,
           a.pnorm2
    FROM agg a JOIN q ON a.vec_id = q.vec_id
    """,
)


_reg(
    "emb_dispersion",
    lambda s, d: sim.emb_dispersion(load(s, d, "embeddings")),
    # the same no-pairwise-join identity: Σ_{i≠j} qi·qj = ||Σq||² − Σ||q||²
    # on the integer grid; per-dim sums via the fixture's range(1,65)
    """
    WITH base AS (
      SELECT label,
             list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
               AS q
      FROM embeddings),
    norm AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n,
             sum(list_sum(list_transform(q, x -> CAST(x AS HUGEINT) * x)))
               AS sum_norm2
      FROM base GROUP BY 1),
    dims AS (
      SELECT label, t.i, sum(CAST(q[t.i] AS HUGEINT)) AS s
      FROM base CROSS JOIN range(1, 65) t(i)
      GROUP BY 1, 2),
    svec AS (
      SELECT label, sum(s * s) AS sumvec_norm2 FROM dims GROUP BY 1),
    g AS (
      SELECT n.label, n.n, n.sum_norm2, v.sumvec_norm2
      FROM norm n JOIN svec v ON n.label = v.label
      WHERE n.n > 1)
    SELECT CAST(label AS BIGINT) AS label, n,
           (CASE WHEN sumvec_norm2 - sum_norm2 < 0 THEN -1 ELSE 1 END)
           * CAST((2000000 * abs(sumvec_norm2 - sum_norm2)
                   + CAST(n AS HUGEINT) * (n - 1) * 1048576 * 1048576)
                  // (2 * CAST(n AS HUGEINT) * (n - 1) * 1048576 * 1048576)
                  AS DOUBLE) / 1e6 AS mean_pair_dot
    FROM g
    """,
)


# Triplet-margin eval: same deterministic pos/neg picks (cyclic label
# successor; as-of-forward next-ring id with wrap), same zip_with dot
# chain; violation is a per-row comparison, counts exact
_reg(
    "emb_triplet_eval",
    lambda s, d: sim.emb_triplet_eval(load(s, d, "embeddings")),
    f"""
    WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                      [CAST(x AS DOUBLE) FOR x IN embedding] AS v
               FROM embeddings),
    labs AS (SELECT DISTINCT label FROM e),
    ring AS (SELECT label,
                    coalesce(lead(label) OVER (ORDER BY label),
                             min(label) OVER ()) AS target
             FROM labs),
    anch AS (
      SELECT a.vec_id, a.label, r.target,
             coalesce(lead(a.vec_id) OVER (PARTITION BY a.label
                                           ORDER BY a.vec_id),
                      min(a.vec_id) OVER (PARTITION BY a.label)) AS pos_id
      FROM e a JOIN ring r ON a.label = r.label
      QUALIFY pos_id <> a.vec_id),
    neg AS (
      SELECT a.vec_id,
             min(CASE WHEN c.vec_id > a.vec_id THEN c.vec_id END) AS nxt,
             min(c.vec_id) AS mn
      FROM anch a JOIN e c ON c.label = a.target
      GROUP BY 1),
    trip AS (
      SELECT a.label, a.vec_id, a.pos_id,
             coalesce(n.nxt, n.mn) AS neg_id
      FROM anch a JOIN neg n ON a.vec_id = n.vec_id
      WHERE coalesce(n.nxt, n.mn) <> a.vec_id),
    scored AS (
      SELECT t.label,
             CASE WHEN
               {_IVF_DOT.format(a='pa.v', b='pp.v')}
                 / (sqrt(list_sum([x * x FOR x IN pa.v]))
                    * sqrt(list_sum([x * x FOR x IN pp.v])))
               - {_IVF_DOT.format(a='pa.v', b='pn.v')}
                 / (sqrt(list_sum([x * x FOR x IN pa.v]))
                    * sqrt(list_sum([x * x FOR x IN pn.v])))
               < 0.1 THEN 1 ELSE 0 END AS viol
      FROM trip t
      JOIN e pa ON pa.vec_id = t.vec_id
      JOIN e pp ON pp.vec_id = t.pos_id
      JOIN e pn ON pn.vec_id = t.neg_id)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_triplets,
           CAST(sum(viol) AS BIGINT) AS n_violations,
           CAST((2000000 * CAST(sum(viol) AS HUGEINT) + count(*))
                // (2 * CAST(count(*) AS HUGEINT)) AS DOUBLE) / 1e6
             AS viol_rate
    FROM scored GROUP BY 1
    """,
)
