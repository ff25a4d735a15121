"""Oracle registry — graph analytics: pagerank, components, triangles, BFS.

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403

from kdb_spark.analytics import graph as gr

QUERIES, ORACLES, _reg = make_registry()


_reg(
    "graph_pagerank",
    lambda s, d: gr.pagerank(gr.trade_graph(load(s, d, "orders"), load(s, d, "lineitem"))),
    """
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s AS src, c AS dst FROM pairs),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    verts AS (SELECT DISTINCT src AS v FROM edges),
    nn AS (SELECT count(*) AS n FROM verts),
    base AS (SELECT v, n FROM verts CROSS JOIN nn),
    r0 AS (SELECT v, 1.0 / n AS r FROM base),
    m1 AS (SELECT e.dst AS v, sum(r.r / d.deg) AS m
           FROM edges e JOIN deg d ON d.src = e.src JOIN r0 r ON r.v = e.src
           GROUP BY e.dst),
    r1 AS (SELECT b.v, (1.0 - 0.85) / b.n + 0.85 * coalesce(m1.m, 0.0) AS r
           FROM base b LEFT JOIN m1 ON m1.v = b.v),
    m2 AS (SELECT e.dst AS v, sum(r.r / d.deg) AS m
           FROM edges e JOIN deg d ON d.src = e.src JOIN r1 r ON r.v = e.src
           GROUP BY e.dst),
    r2 AS (SELECT b.v, (1.0 - 0.85) / b.n + 0.85 * coalesce(m2.m, 0.0) AS r
           FROM base b LEFT JOIN m2 ON m2.v = b.v),
    m3 AS (SELECT e.dst AS v, sum(r.r / d.deg) AS m
           FROM edges e JOIN deg d ON d.src = e.src JOIN r2 r ON r.v = e.src
           GROUP BY e.dst),
    r3 AS (SELECT b.v, (1.0 - 0.85) / b.n + 0.85 * coalesce(m3.m, 0.0) AS r
           FROM base b LEFT JOIN m3 ON m3.v = b.v)
    SELECT r3.v, round(r3.r, 9) AS rank, CAST(deg AS BIGINT) AS out_deg
    FROM r3 JOIN deg ON deg.src = r3.v
    """,
)


# CC over the repeat-trade bipartite graph: the engine side reuses the
# converging min-label Pregel core (dedup.connected_components — pointer
# jumping, edge-vertex-only label table); the oracle is the textbook
# recursive reachability closure + min, tractable because the ≥3-orders
# threshold keeps components small at oracle scale.
_reg(
    "graph_connected_components",
    lambda s, d: _q_graph_cc(s, d),
    """
    WITH RECURSIVE pr AS (
      SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders
      JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) li
        ON o_orderkey = l_orderkey
      GROUP BY 1, 2 HAVING count(*) >= 3),
    edges AS (SELECT a AS src, b AS dst FROM pr
              UNION ALL SELECT b, a FROM pr),
    verts AS (SELECT c_custkey * 2 AS v FROM customer
              UNION SELECT s_suppkey * 2 + 1 FROM supplier),
    reach(a, b) AS (
      SELECT v, v FROM verts
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
    SELECT CAST(a AS BIGINT) AS v, CAST(min(b) AS BIGINT) AS canonical_id
    FROM reach GROUP BY a
    """,
)


# Degree-ordered triangle counting over the customer co-purchase projection
# (≥3 shared parts). The oracle enumerates each triangle once via the
# id-ordered 3-join (a<b<c); the engine's degree orientation finds the
# identical triangle set (both count each exactly once), so the per-vertex
# rollup hash-matches while the engine's plan is the skew-safe one.
_reg(
    "graph_triangle_count",
    lambda s, d: gr.triangle_count(
        # max_per_part is the hub guard (SCALE.md r9): never binds at
        # harness scales (≤53 customers/part at sf0.1) so the oracle
        # compare stays exact, but keeps the salted K=32 probe linear
        gr.co_purchase_edges(
            load(s, d, "orders"), load(s, d, "lineitem"), max_per_part=500
        )
    ),
    """
    WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT a.c AS a, b.c AS b FROM cp a JOIN cp b
          ON a.p = b.p AND a.c < b.c
          GROUP BY 1, 2 HAVING count(*) >= 3),
    d AS (SELECT v, count(*) AS deg FROM
            (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
    tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
            FROM e e1 JOIN e e2 ON e2.a = e1.b
                      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    x AS (SELECT u AS v FROM tri UNION ALL SELECT v FROM tri
          UNION ALL SELECT w FROM tri),
    t AS (SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM x GROUP BY 1)
    SELECT CAST(d.v AS BIGINT) AS v, CAST(d.deg AS BIGINT) AS deg,
           coalesce(t.n_tri, 0) AS n_tri
    FROM d LEFT JOIN t USING (v)
    """,
)


def _q_graph_cc(s: SparkSession, d: str) -> DataFrame:
    from kdb_spark.llm.dedup import connected_components

    edges = gr.repeat_trade_edges(load(s, d, "orders"), load(s, d, "lineitem"))
    universe = (
        load(s, d, "customer")
        .select((F.col("c_custkey") * 2).alias("v"))
        .unionAll(
            load(s, d, "supplier").select((F.col("s_suppkey") * 2 + 1).alias("v"))
        )
    )
    return connected_components(edges, universe).select(
        F.col("doc_id").alias("v"), "canonical_id"
    )


# Log2-bucketed degree distribution of the trade graph, split by the
# parity vertex namespace — all exact integers
_reg(
    "graph_degree_distribution",
    lambda s, d: gr.degree_distribution(
        load(s, d, "orders"), load(s, d, "lineitem")
    ),
    """
    WITH pairs AS (
      SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT c AS src, s AS dst FROM pairs
          UNION ALL SELECT s AS src, c AS dst FROM pairs),
    d AS (
      SELECT src, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT DISTINCT src, dst FROM e) GROUP BY 1)
    SELECT CAST(src % 2 AS INT) AS side,
           CAST(length(bin(deg)) - 1 AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(min(deg) AS BIGINT) AS min_deg,
           CAST(max(deg) AS BIGINT) AS max_deg,
           CAST(sum(deg) AS BIGINT) AS sum_deg
    FROM d GROUP BY 1, 2
    """,
)


# Neighbor-set Jaccard over the co-purchase projection: exact common/degree
# integers off one deduped incidence, unsigned device ratio
_reg(
    "graph_jaccard_neighbors",
    lambda s, d: gr.co_purchase_jaccard(
        load(s, d, "orders"), load(s, d, "lineitem"), max_per_part=500
    ),
    # the oracle mirrors the engine's max_per_part=500 hub cap exactly
    # (same rank order, same tiebreak: row_number per part over unique c),
    # so parity holds by construction on ANY data, not just data where no
    # part exceeds the cap (r12 ADVICE)
    """
    WITH cp0 AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
                 FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    cp AS (SELECT c, p FROM (
             SELECT c, p, row_number() OVER (PARTITION BY p ORDER BY c) AS rn
             FROM cp0)
           WHERE rn <= 500),
    d AS (SELECT c, CAST(count(*) AS BIGINT) AS deg FROM cp GROUP BY 1),
    e AS (SELECT a.c AS a, b.c AS b, CAST(count(*) AS BIGINT) AS common
          FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
          GROUP BY 1, 2 HAVING count(*) >= 3)
    SELECT e.a, e.b, e.common,
           da.deg AS deg_a, db.deg AS deg_b,
           CAST((2000000 * CAST(common AS HUGEINT)
                 + (da.deg + db.deg - common))
                // (2 * CAST(da.deg + db.deg - common AS HUGEINT))
                AS DOUBLE) / 1e6 AS jaccard
    FROM e JOIN d da ON da.c = e.a JOIN d db ON db.c = e.b
    """,
)


def _q_graph_bfs_levels(s: SparkSession, d: str) -> DataFrame:
    """Blast radius over the trade graph: min-hop level (≤ 3) from every
    50th supplier — frontier expansion with anti-join min-level keep."""
    seeds = (
        load(s, d, "supplier")
        .filter(F.col("s_suppkey") % 50 == 0)
        .select((F.col("s_suppkey") * 2 + 1).cast("long").alias("v"))
    )
    edges = gr.trade_graph(load(s, d, "orders"), load(s, d, "lineitem"))
    return gr.bfs_levels(edges, seeds, max_depth=3)


# Multi-source BFS with recursive-CTE oracle: integer set algebra only
_reg(
    "graph_bfs_levels",
    _q_graph_bfs_levels,
    """
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s AS src, c AS dst FROM pairs),
    seeds AS (SELECT DISTINCT s_suppkey * 2 + 1 AS v FROM supplier
              WHERE s_suppkey % 50 = 0),
    bfs(v, lvl) AS (
      SELECT v, 0 FROM seeds
      UNION
      SELECT e.dst, b.lvl + 1
      FROM bfs b JOIN edges e ON e.src = b.v
      WHERE b.lvl < 3)
    SELECT CAST(v AS BIGINT) AS v, CAST(min(lvl) AS BIGINT) AS lvl
    FROM bfs GROUP BY 1
    """,
)


def _k_core_oracle(k: int = 2, rounds: int = 12) -> str:
    """Unrolled fixed-round peeling (the operator definition both engines
    share — see graph.k_core): eN keeps only edges whose BOTH endpoints
    had degree ≥ k in e(N−1)."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # round references the previous one three times — 3^rounds inlined
    # scans without it (the probe died on file handles at 12 rounds)
    ctes = ["""e0 AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM pr UNION ALL SELECT b, a FROM pr)"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""k{i} AS MATERIALIZED (
      SELECT src FROM (SELECT src, count(*) AS c FROM e{i - 1} GROUP BY src)
      WHERE c >= {k})""")
        ctes.append(f"""e{i} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{i - 1} e
      JOIN k{i} x ON e.src = x.src
      JOIN k{i} y ON e.dst = y.src)""")
    body = ",\n    ".join(ctes)
    return f"""
    WITH pr AS (
      SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders
      JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) li
        ON o_orderkey = l_orderkey
      GROUP BY 1, 2 HAVING count(*) >= 3),
    {body}
    SELECT CAST(src AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY src
    """


# k-core backbone of the repeat-trade bipartite graph: fixed-round peeling
# on both engines (equal by construction, converged or not)
_reg(
    "graph_k_core",
    lambda s, d: gr.k_core(
        gr.repeat_trade_edges(load(s, d, "orders"), load(s, d, "lineitem"))
    ),
    _k_core_oracle(),
)


def _lpa_oracle(rounds: int = 4) -> str:
    """Unrolled fixed-round synchronous min-tiebreak label propagation
    (the operator definition both engines share — graph.label_propagation):
    lN(v) = the most frequent label among v's neighbors under l(N−1),
    ties to the smallest label."""
    ctes = [
        """e0 AS MATERIALIZED (
      SELECT DISTINCT a AS src, b AS dst FROM
        (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr))""",
        """l0 AS MATERIALIZED (
      SELECT DISTINCT src AS v, CAST(src AS BIGINT) AS label FROM e0)""",
    ]
    for i in range(1, rounds + 1):
        ctes.append(f"""l{i} AS MATERIALIZED (
      SELECT v, label FROM (
        SELECT e.src AS v, l.label, count(*) AS c,
               row_number() OVER (PARTITION BY e.src
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM e0 e JOIN l{i - 1} l ON l.v = e.dst
        GROUP BY e.src, l.label)
      WHERE rn = 1)""")
    body = ",\n    ".join(ctes)
    return f"""
    WITH pr AS (
      SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders
      JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) li
        ON o_orderkey = l_orderkey
      GROUP BY 1, 2 HAVING count(*) >= 3),
    {body},
    census AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_members
      FROM l{rounds} GROUP BY 1)
    SELECT CAST(l.v AS BIGINT) AS v, CAST(l.label AS BIGINT) AS label,
           c.n_members
    FROM l{rounds} l JOIN census c ON l.label = c.label
    """


# communities of the repeat-trade graph: fixed-round deterministic LPA
# (min tie-break), equal by construction on both engines
_reg(
    "graph_label_propagation",
    lambda s, d: gr.label_propagation(
        gr.repeat_trade_edges(load(s, d, "orders"), load(s, d, "lineitem"))
    ),
    _lpa_oracle(),
)


def _modularity_oracle(rounds: int = 4) -> str:
    """LPA labels (the `_lpa_oracle` unrolled rounds) decorated with the
    exact modularity census: e_c, d_c, m integer counts, q_term on the
    signed device."""
    ctes = [
        """e0 AS MATERIALIZED (
      SELECT DISTINCT a AS src, b AS dst FROM
        (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr))""",
        """l0 AS MATERIALIZED (
      SELECT DISTINCT src AS v, CAST(src AS BIGINT) AS label FROM e0)""",
    ]
    for i in range(1, rounds + 1):
        ctes.append(f"""l{i} AS MATERIALIZED (
      SELECT v, label FROM (
        SELECT e.src AS v, l.label, count(*) AS c,
               row_number() OVER (PARTITION BY e.src
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM e0 e JOIN l{i - 1} l ON l.v = e.dst
        GROUP BY e.src, l.label)
      WHERE rn = 1)""")
    body = ",\n    ".join(ctes)
    return f"""
    WITH pr AS (
      SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders
      JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) li
        ON o_orderkey = l_orderkey
      GROUP BY 1, 2 HAVING count(*) >= 3),
    {body},
    m AS (SELECT CAST(count(*) / 2 AS BIGINT) AS m FROM e0),
    tagged AS (
      SELECT la.label AS la, lb.label AS lb
      FROM e0 e
      JOIN l{rounds} la ON la.v = e.src
      JOIN l{rounds} lb ON lb.v = e.dst),
    census AS (
      SELECT la AS label,
             CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) / 2 AS BIGINT)
               AS e_in,
             CAST(count(*) AS BIGINT) AS d_tot
      FROM tagged GROUP BY 1),
    sizes AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_members
      FROM l{rounds} GROUP BY 1)
    SELECT CAST(c.label AS BIGINT) AS label, s.n_members, c.e_in, c.d_tot,
           (CASE WHEN 4 * CAST(m.m AS HUGEINT) * c.e_in
                      - CAST(c.d_tot AS HUGEINT) * c.d_tot < 0
                 THEN -1 ELSE 1 END)
           * CAST((2000000 * abs(4 * CAST(m.m AS HUGEINT) * c.e_in
                                 - CAST(c.d_tot AS HUGEINT) * c.d_tot)
                   + 4 * CAST(m.m AS HUGEINT) * m.m)
                  // (2 * 4 * CAST(m.m AS HUGEINT) * m.m) AS DOUBLE) / 1e6
             AS q_term
    FROM census c JOIN sizes s ON c.label = s.label, m
    """


_reg(
    "graph_modularity",
    lambda s, d: gr.graph_modularity(
        gr.repeat_trade_edges(load(s, d, "orders"), load(s, d, "lineitem"))
    ),
    _modularity_oracle(),
)


# Local clustering coefficient: the triangle oracle's per-vertex census
# plus the exact-rational 2·tri/(deg·(deg−1)) via the unsigned device
_reg(
    "graph_clustering_coeff",
    lambda s, d: gr.clustering_coeff(
        gr.co_purchase_edges(
            load(s, d, "orders"), load(s, d, "lineitem"), max_per_part=500
        )
    ),
    """
    WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT a.c AS a, b.c AS b FROM cp a JOIN cp b
          ON a.p = b.p AND a.c < b.c
          GROUP BY 1, 2 HAVING count(*) >= 3),
    d AS (SELECT v, count(*) AS deg FROM
            (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
    tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
            FROM e e1 JOIN e e2 ON e2.a = e1.b
                      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    x AS (SELECT u AS v FROM tri UNION ALL SELECT v FROM tri
          UNION ALL SELECT w FROM tri),
    t AS (SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM x GROUP BY 1),
    m AS (SELECT CAST(d.v AS BIGINT) AS v, CAST(d.deg AS BIGINT) AS deg,
                 coalesce(t.n_tri, 0) AS n_tri
          FROM d LEFT JOIN t USING (v))
    SELECT v, deg, n_tri,
           CASE WHEN deg >= 2 THEN
             CAST((2000000 * CAST(2 * n_tri AS HUGEINT)
                   + CAST(deg AS HUGEINT) * (deg - 1))
                  // (2 * CAST(deg AS HUGEINT) * (deg - 1)) AS DOUBLE) / 1e6
           END AS coeff
    FROM m
    """,
)
