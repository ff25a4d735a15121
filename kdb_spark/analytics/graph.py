"""Iterative graph analytics over edge tables (SURVEY.md §2.K extension).

PageRank joins `connected_components` (kdb_spark/llm/dedup.py:304) as the
second iterative-fixpoint operator: both follow the same Spark discipline —
the edge table is the unit of scale, each iteration is ONE join + ONE
aggregate shuffle sized to |E|, the loop is unrolled driver-side with the
iteration count fixed (so the whole computation is a single Catalyst plan,
resumable and AQE-optimizable), and nothing but scalars ever reaches the
driver. At cluster scale you'd persist `edges`+`deg` once (done here) and
checkpoint ranks every ~10 rounds to truncate lineage — pagerank's
`checkpoint_every` parameter is that knob; the 3-round analytics default
needs no checkpoint (connected_components checkpoints every round by
construction — its per-round Observation forces materialization anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int | None = None,
    broadcast_ranks: bool = True,
    tol: float | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (`src`, `dst`).

    rank_0(v) = 1/N; rank_i(v) = (1-d)/N + d * Σ_{u→v} rank_{i-1}(u)/deg(u).
    Callers must pass a graph where every vertex has out-degree ≥ 1 (e.g.
    symmetrized edges, as q_graph_pagerank builds) — dangling-mass
    redistribution is deliberately out of scope, keeping each iteration a
    pure join+agg with no global rescale pass. Under that contract rank
    mass is conserved exactly: Σ rank_i = (1-d) + d·Σ rank_{i-1} = 1 every
    round (property-tested in tests/test_property.py).

    Each round rebuilds ranks over the FULL vertex table: a vertex with
    out-edges but no in-edges still holds its (1-d)/N floor and keeps
    feeding its successors — aggregating over edge messages alone would
    silently drop it after round 1 and leak its mass. The fill is done by
    unioning one zero message per vertex into the SAME per-round aggregate
    (x + 0.0 is an exact no-op, so values are bit-identical to a left-join
    + coalesce fill) — that keeps each round at ONE broadcast + ONE |E|+|V|
    aggregate shuffle, where a separate fill join would add a second
    broadcast barrier per round (measured ~1.8× cold).

    Ranks are rounded to 9 at the end only: values sit near 1/N, and the
    double-summation noise (~1e-15 relative) is far below the 1e-9 cut.

    ``checkpoint_every``: localCheckpoint the rank table every K rounds,
    truncating the unrolled lineage — at the 3-round analytics default the
    single Catalyst plan is the feature (AQE sees the whole loop), but a
    50-round convergence run would otherwise compound the plan depth (and
    recovery cost) linearly. localCheckpoint (not checkpoint) because the
    rank table is |V|-small and reliable-storage persistence buys nothing
    a re-run wouldn't; on a real cluster with preemptible executors,
    swap in `spark.sparkContext.setCheckpointDir` + `.checkpoint()`.

    ``broadcast_ranks``: the per-round message join's physical strategy.
    True (default) ships the |V|-sized rank table to every executor as a
    broadcast hash join — right whenever |V| fits the broadcast budget.
    False is the 100× posture: the contribution edges are persisted
    ALREADY HASH-PARTITIONED on ``src`` (the sort-merge deg join leaves
    them so), and each round's join is a shuffle-hash join that reuses
    that cached partitioning — only the small ranks side exchanges per
    round, the |E|-sized side never moves again. Values are bit-identical
    on both paths at the rounded output (property-tested): the join
    strategy changes row routing, not the per-vertex message sets, and
    the ≤1e-15-relative partial-sum reorder noise sits far below the
    final round(9) — the same argument the parallelism-invariance suite
    already pins for the broadcast path across partition counts.

    ``tol`` (r15, the run-to-fixpoint ask): when set, ``iters`` becomes a
    SAFETY CAP and the loop exits early once the L∞ rank delta of a round
    drops below ``tol`` — the converged answer a production user wants,
    with the same per-round body (the registered fixed-round key is the
    oracle contract and is untouched at the default tol=None). Convergence
    mode localCheckpoints every round: the delta check is an action, so
    an unbounded unrolled lineage would re-execute all prior rounds per
    check. One |V|-sized join + scalar agg per round is the whole cost.
    """
    from kdb_spark.llm.dedup import _reused

    # the edge table feeds FOUR consumers (deg, verts, the per-round join,
    # the final out_deg join) — persist it once or the upstream build
    # (e.g. trade_graph's orders⋈lineitem+distinct) re-executes per consumer
    edges = _reused("pagerank_edges", edges.select("src", "dst").distinct())
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # vertex base table — persisted once: zero_msgs (and the initial rank
    # table) re-reads it every unrolled round, and without the persist the
    # plan would re-run the vertex distinct per round.
    base = _reused("pagerank_base", edges.select(F.col("src").alias("v")).distinct())
    # N is ONE bounded scalar (the vertex count) and every unrolled round
    # needs it — collect it once and fold it into each round as a LITERAL.
    # The r15 shape instead cross-joined a broadcast 1-row table per round,
    # which cost one broadcast build + one job per round and deepened the
    # unrolled plan (slower codegen on the cold run) for the same double
    # arithmetic: lit(1.0)/lit(n) and 1.0/col(n) are the identical IEEE op
    # on the identical long, so ranks are bit-for-bit unchanged (pinned by
    # test_pagerank_paths_agree_exactly / the property suite).
    n = float(base.agg(F.count(F.lit(1)).cast("long").alias("n")).collect()[0]["n"])
    # per-round shape: edges stream from cache, the |V|-sized rank table is
    # explicitly broadcast — each iteration is one map-side join, then the
    # zero-message union feeds ONE |E|+|V| aggregate shuffle (no fill join
    # exists; the union IS the fill). At a vertex scale where |V| no longer
    # broadcasts, swap the hint for edges pre-hashed on src — the cached
    # table's partitioning then absorbs the message join.
    ranks = base.select("v", (F.lit(1.0) / F.lit(n)).alias("r"))
    zero_msgs = base.select(F.col("v").alias("dst"), F.lit(0.0).alias("msg"))
    if broadcast_ranks:
        contrib_edges = _reused(
            "pagerank_contrib", edges.join(F.broadcast(deg), "src")
        )
    else:
        # scale path: the deg join is itself shuffle-hash (deg is
        # |V|-sized too — if ranks can't broadcast, neither can it), and
        # a shuffle-hash join's output is hash-partitioned on src, which
        # the persist pins — so every round's shuffle-hash join below
        # reuses this cached partitioning and exchanges ONLY the ranks
        # side, never the |E|-sized contributions again
        contrib_edges = _reused(
            "pagerank_contrib_hashed", edges.join(deg.hint("shuffle_hash"), "src")
        )
    for i in range(iters):
        rsel = ranks.select(F.col("v").alias("src"), "r")
        if broadcast_ranks:
            joined = contrib_edges.join(F.broadcast(rsel), "src")
        else:
            # shuffle_hash on the ranks side: ranks is the (small) build
            # side, contrib_edges streams from cache with no re-exchange;
            # the hint also stops the planner promoting this back to a
            # broadcast join, which is the whole point of the path
            joined = contrib_edges.join(rsel.hint("shuffle_hash"), "src")
        msgs = joined.select("dst", (F.col("r") / F.col("deg")).alias("msg"))
        ranks = (
            msgs.unionByName(zero_msgs)
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum("msg").alias("m"))
            .select(
                "v",
                (F.lit(1.0 - damping) / F.lit(n) + damping * F.col("m")).alias("r"),
            )
        )
        if tol is not None:
            prev = rsel  # previous round's ranks, as (src, r)
            ranks = ranks.localCheckpoint(eager=True)
            delta = (
                ranks.join(
                    prev.select(F.col("src").alias("v"), F.col("r").alias("r0")),
                    "v",
                )
                .agg(F.max(F.abs(F.col("r") - F.col("r0"))).alias("d"))
                .collect()[0]["d"]
            )
            if delta is not None and delta < tol:
                break
        elif (
            checkpoint_every
            and (i + 1) % checkpoint_every == 0
            and (i + 1) < iters
        ):
            ranks = ranks.localCheckpoint(eager=True)
    out_deg = deg.select(
        F.col("src").alias("v"), F.col("deg").cast("long").alias("out_deg")
    )
    if not broadcast_ranks:
        # |V|-sized dimension: keep the no-broadcast discipline through
        # the final decoration join too
        out_deg = out_deg.hint("shuffle_hash")
    return ranks.select("v", F.round("r", 9).alias("rank")).join(out_deg, "v")


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


def repeat_trade_edges(
    orders: DataFrame, lineitem: DataFrame, min_orders: int = 3
) -> DataFrame:
    """Bipartite repeat-trading edge list (`doc_a` customer 2k, `doc_b`
    supplier 2k+1 — the same parity namespacing as `trade_graph`): an edge
    iff the pair co-occurs in ≥ ``min_orders`` distinct orders.

    Shape: pre-distinct the (order, supplier) incidence map-side, ONE
    equi-join shuffle on the order key, ONE aggregate shuffle on the
    (customer, supplier) pair — the count(*) over the pre-distincted join
    output IS the distinct-order count, so no countDistinct expand is paid.
    The threshold prunes the edge table before anything iterates over it.
    """
    li = lineitem.select("l_orderkey", "l_suppkey").distinct()
    return (
        orders.select("o_orderkey", "o_custkey")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= min_orders)
        .select(
            (F.col("o_custkey") * 2).alias("doc_a"),
            (F.col("l_suppkey") * 2 + 1).alias("doc_b"),
        )
    )


def co_purchase_edges(
    orders: DataFrame,
    lineitem: DataFrame,
    min_shared: int = 3,
    max_per_part: int | None = None,
) -> DataFrame:
    """Undirected customer co-purchase edges (`a` < `b`): two customers are
    linked iff they bought ≥ ``min_shared`` distinct parts in common.

    The (customer, part) incidence is deduped BEFORE the part-keyed
    self-join, so the join fan-out per part is (customers-per-part)² — the
    classic bipartite-projection hot spot. ``max_per_part`` is the hub
    guard: when set, each part keeps only its ``max_per_part`` lowest
    customer keys (one deterministic row_number window on the incidence),
    bounding any hub part's fan-out at max_per_part². EXACT wherever no
    part exceeds the cap and a documented approximation above it, so the
    default is None (exact): callers opt in at scale, as
    `q_graph_triangle_count` does with 500 — far above the ≤53
    customers/part observed at sf0.1, so every oracle/bench compare stays
    exact while the K=32 probe (where the uncapped projection measured
    7.8× for 4× data, SCALE.md r9) stays linear. The HAVING-style
    threshold collapses the pair table in the same aggregate that counts
    it.
    """
    from kdb_spark.llm.dedup import _reused

    # ONE repartition on p serves the whole incidence pipeline: the
    # (c,p) dedup clusters on a SUPERSET of p (hashpartitioning(p)
    # satisfies ClusteredDistribution([c,p])), the hub-cap window
    # partitions by p, and the self-join keys on p — so dedup, cap and
    # both join sides all reuse this single exchange instead of the
    # three the r9 plan paid (distinct on (c,p) + window + join).
    incidence = (
        orders.select("o_orderkey", "o_custkey")
        .join(
            lineitem.select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .repartition("p")
        .dropDuplicates(["c", "p"])
    )
    if max_per_part is not None:
        from kdb_spark.analytics import cap_per_group

        incidence = cap_per_group(incidence, "p", "c", max_per_part)
    cp = _reused("co_purchase_incidence", incidence)
    # r17: pair generation via the dedup_ngram_jaccard packed-census device
    # instead of the part-keyed self-join — the groupBy(p) reads the cached
    # hashpartitioning(p) with ZERO extra exchange (the self-join read the
    # cache twice and built a join per partition), and the (a < b) combos
    # are emitted map-side with array lambdas straight into the census
    # aggregate. Group sizes are bounded by the max_per_part hub guard.
    return (
        _part_pair_census(cp, F.col("c"))
        .filter(F.col("n") >= min_shared)
        .select("a", "b")
    )


def _part_pair_census(cp: DataFrame, member: F.Column) -> DataFrame:
    """Shared (a < b) co-membership census over the part-partitioned
    incidence: per part, collect the SORTED member list, emit each (a, b)
    combination map-side, and count pairs in one two-phase hash aggregate —
    (a, b, n) where n = number of shared parts. ``member`` is a packed
    BIGINT whose numeric order must equal the member order (plain c, or
    c⧺payload with c in the high bits); the census groups on the two packed
    longs so the only Exchange carries 16 B/row."""
    grouped = (
        cp.groupBy("p")
        .agg(F.sort_array(F.collect_list(member)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(combos).alias("pr"))
        .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle counts over an undirected edge list (`a` < `b`,
    distinct) — the degree-ordered node-iterator (cf. Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11).

    Each undirected edge is ORIENTED from its lower (degree, id) endpoint
    to its higher one; wedges are enumerated only at each triangle's
    minimum-rank vertex, so a hub of degree D contributes O(D) oriented
    out-edges instead of O(D²) wedges — the skew guard that makes the plan
    survive power-law graphs at 100 TB. Exactly one wedge per triangle
    survives the rank filter, and the closing edge (if present) is
    guaranteed to be oriented low→high rank, so one equi-join on (v, w)
    finds it: two |E|-keyed shuffle joins total, degree table broadcast.

    Returns (`v`, `deg`, `n_tri`) for every vertex with at least one edge.
    """
    from kdb_spark.llm.dedup import _reused

    edges = _reused("tri_edges", edges)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dg = _reused("tri_deg", deg)
    # BOTH degree lookups go through ONE broadcast exchange: the two join
    # sides are the same canonical plan (dg.alias, no per-side projection),
    # so Spark's ReuseExchange collapses them — the r9 version projected
    # different column renames per side and built/shipped the broadcast
    # twice (VERDICT r9 #6)
    d1, d2 = dg.alias("d1"), dg.alias("d2")
    with_deg = (
        edges.join(F.broadcast(d1), F.col("a") == F.col("d1.v"))
        .join(F.broadcast(d2), F.col("b") == F.col("d2.v"))
        .select(
            "a",
            "b",
            F.col("d1.deg").alias("da"),
            F.col("d2.deg").alias("db"),
        )
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # persist oriented PRE-PARTITIONED on src: the wedge self-join keys on
    # u(=src), so both its sides read the cached partitioning and the join
    # plans zero exchanges; the closing side's hashpartitioning(src→v)
    # also satisfies the (v,w) join's clustering by the subset rule
    oriented = _reused(
        "tri_oriented",
        with_deg.select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("ddst"),
        ).repartition("src"),
    )
    e1 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("ddst").alias("dv")
    )
    e2 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("w"), F.col("ddst").alias("dw")
    )
    wedges = e1.join(e2, "u").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    per_v = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return dg.join(per_v, "v", "left").select(
        "v",
        F.col("deg").cast("long").alias("deg"),
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
    )


def degree_distribution(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Log2-bucketed degree distribution of the customer<->supplier trade
    graph, split by vertex side (the parity namespace trade_graph assigns:
    even = customer, odd = supplier) -- the first chart anyone draws over
    a new graph, and the skew report that says whether pagerank/triangle
    hub guards will fire.

    EXACT cross-engine, all integers: degree = distinct-trading-partner
    count per vertex, bucket = length(bin(deg))-1 (the agg_lorenz bit-math
    device -- no float log2), then per (side, bucket) exact count / min /
    max / sum(deg).

    Scale shape: the orders><lineitem equi-join runs ONCE and one distinct
    shuffle dedups the (customer, supplier) pair table; BOTH sides'
    degrees then come from that single table (group by c, group by s) --
    a naive "symmetrize then count per src" would execute the fact join
    twice, once per union branch (measured: 2 BroadcastHashJoin / 3 scans
    in the unionAll form vs 1 join here). The per-vertex degree tables are
    dimension-sized; the final (side, bucket) reduce is <=128 rows.
    """
    pairs = (
        orders.select("o_orderkey", "o_custkey")
        .join(lineitem.select("l_orderkey", "l_suppkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    deg = (
        pairs.groupBy(F.col("c").alias("src"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .unionAll(
            pairs.groupBy(F.col("s").alias("src"))
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
    )
    b = deg.select(
        F.pmod(F.col("src"), F.lit(2)).cast("int").alias("side"),
        F.expr("CAST(length(bin(deg)) - 1 AS INT)").alias("bucket"),
        "deg",
    )
    return b.groupBy("side", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.min("deg").cast("long").alias("min_deg"),
        F.max("deg").cast("long").alias("max_deg"),
        F.sum("deg").cast("long").alias("sum_deg"),
    )


def co_purchase_jaccard(
    orders: DataFrame,
    lineitem: DataFrame,
    min_shared: int = 3,
    max_per_part: int | None = None,
) -> DataFrame:
    """Neighbor-set Jaccard similarity over the customer co-purchase
    bipartite projection: for every customer pair sharing ≥ ``min_shared``
    distinct parts, J = |P(a)∩P(b)| / |P(a)∪P(b)| with the union expanded
    as deg_a + deg_b − common — the link-prediction / account-merge
    screen (graph-side analog of dedup_ngram_jaccard's set similarity).

    EXACT cross-engine: common-part counts and part-degrees are exact
    integers off the SAME deduped incidence, and J rides the unsigned
    decimal device at 6 dp (den = deg_a + deg_b − common ≥ common ≥
    min_shared > 0, no guard needed).

    Scale shape: the part-keyed self-join is the co_purchase_edges
    pipeline — ONE repartition on p serves dedup, hub cap, and both join
    sides (the incidence is shared via the same persisted intermediate,
    so running this beside triangle_count pays the projection once);
    ``max_per_part`` is the documented hub guard (exact when no part
    exceeds it — the caller's contract, cf. co_purchase_edges). Degrees
    come from a |customers|-sized agg joined onto the pair table on each
    endpoint — two dimension-sized shuffle joins, AQE broadcasts them
    when small.
    """
    from kdb_spark.llm.dedup import _reused

    incidence = (
        orders.select("o_orderkey", "o_custkey")
        .join(
            lineitem.select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .repartition("p")
        .dropDuplicates(["c", "p"])
    )
    if max_per_part is not None:
        from kdb_spark.analytics import cap_per_group

        incidence = cap_per_group(incidence, "p", "c", max_per_part)
    cp = _reused("co_purchase_incidence", incidence)
    deg = cp.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # r17: the packed census (see _part_pair_census) replaces the part-keyed
    # self-join AND both post-census degree joins — each member carries its
    # degree in the packed long's low 32 bits (the dedup_ngram_jaccard
    # device: c in the high bits so the pack's numeric order IS the member
    # order), attached to the |incidence|-sized table by ONE broadcast join
    # instead of two joins against the much larger pair table. Pack inputs
    # are range-guarded: an out-of-domain key raises a labeled error before
    # the shift could alias two members.
    c_ok = F.when(
        F.col("c").between(0, (1 << 31) - 1), F.col("c")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("co_purchase_jaccard: customer key outside 31-bit pack range: "),
                F.col("c").cast("string"),
            )
        )
    )
    d_ok = F.when(
        F.col("deg").between(0, (1 << 32) - 1), F.col("deg")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("co_purchase_jaccard: degree outside 32-bit pack range: "),
                F.col("deg").cast("string"),
            )
        )
    )
    packed = (c_ok.cast("long") * F.lit(1 << 32)) + d_ok
    pairs = _part_pair_census(
        cp.join(F.broadcast(deg), "c"), packed
    ).filter(F.col("n") >= min_shared)
    from kdb_spark.analytics.exact import floor_div_sql

    j = pairs.select(
        F.shiftrightunsigned("a", 32).alias("a"),
        F.shiftrightunsigned("b", 32).alias("b"),
        F.col("n").alias("common"),
        F.col("a").bitwiseAND(F.lit(0xFFFFFFFF)).alias("deg_a"),
        F.col("b").bitwiseAND(F.lit(0xFFFFFFFF)).alias("deg_b"),
    )
    jac6 = F.expr(
        floor_div_sql(
            "2000000 * CAST(common AS DECIMAL(38,0)) + (deg_a + deg_b - common)",
            "2 * CAST(deg_a + deg_b - common AS DECIMAL(38,0))",
        )
    )
    return j.select(
        "a",
        "b",
        "common",
        "deg_a",
        "deg_b",
        (jac6.cast("double") / F.lit(1e6)).alias("jaccard"),
    )


def bfs_levels(
    edges: DataFrame, seeds: DataFrame, max_depth: int = 3
) -> DataFrame:
    """Multi-source breadth-first search: the minimum hop count from any
    seed vertex, capped at ``max_depth`` — the blast-radius primitive
    (which accounts sit within k hops of a flagged set; which suppliers
    a recall reaches through the trade graph). `connected_components`
    answers reachability-ever; BFS answers reachability-in-k with the
    distance attached.

    Spark shape: classic frontier expansion, unrolled ``max_depth``
    times — per round ONE equi-join of the frontier against the
    (persisted, deduped) edge table, a distinct on the successor set,
    and a LEFT ANTI join against the visited table so every vertex keeps
    the FIRST (minimal) level it was reached at. Per-round shuffle is
    |frontier|·avg_degree, never |V|·|E|; the visited/frontier tables
    are localCheckpointed each round so the unrolled lineage stays flat
    (the connected_components discipline). All-integer set algebra — no
    floats anywhere, so cross-engine parity is structural.

    ``seeds``: one column ``v``. Returns (v, lvl), lvl ∈ [0, max_depth],
    each vertex at its minimal distance; seeds themselves at 0 whether
    or not they touch an edge.
    """
    from kdb_spark.llm.dedup import _reused

    edges = _reused("bfs_edges", edges.select("src", "dst").distinct())
    levels = seeds.select(F.col("v").cast("long").alias("v")).distinct().select(
        "v", F.lit(0).cast("long").alias("lvl")
    )
    levels = levels.localCheckpoint(eager=True)
    frontier = levels.select("v")
    for depth in range(1, max_depth + 1):
        nxt = _bfs_round(frontier, levels, edges, depth)
        levels = levels.unionByName(nxt)
        frontier = nxt.select("v")
    return levels


def _bfs_round(
    frontier: DataFrame, levels: DataFrame, edges: DataFrame, depth: int
) -> DataFrame:
    """One BFS frontier expansion (the shared per-round body of
    `bfs_levels` and `bfs_levels_fixpoint`): join the frontier against the
    edge table, dedup successors, anti-join the visited set, stamp the
    level, cut lineage."""
    return (
        frontier.join(edges, frontier.v == edges.src)
        .select(F.col("dst").alias("v"))
        .distinct()
        .join(levels.select("v"), "v", "left_anti")
        .select("v", F.lit(depth).cast("long").alias("lvl"))
        .localCheckpoint(eager=True)
    )


def bfs_levels_fixpoint(
    edges: DataFrame, seeds: DataFrame, max_depth: int = 10_000
) -> DataFrame:
    """`bfs_levels` run to its NATURAL fixpoint: expand until a round's
    frontier is empty — every reachable vertex at its exact minimal
    distance, however deep the graph (the r14 VERDICT run-to-fixpoint
    ask). Same per-round body (`_bfs_round`); ``max_depth`` is only a
    runaway-safety cap, set far above any real graph diameter. The
    per-round emptiness probe is a count() on the (localCheckpointed,
    frontier-sized) new-vertex table — a scalar to the driver per round,
    nothing else. The registered fixed-depth key stays the oracle
    contract; on any graph whose eccentricity from the seeds is ≤ the
    fixed cap the two forms are equal by construction (pytest-pinned)."""
    from kdb_spark.llm.dedup import _reused

    edges = _reused("bfs_fix_edges", edges.select("src", "dst").distinct())
    levels = seeds.select(F.col("v").cast("long").alias("v")).distinct().select(
        "v", F.lit(0).cast("long").alias("lvl")
    )
    levels = levels.localCheckpoint(eager=True)
    frontier = levels.select("v")
    for depth in range(1, max_depth + 1):
        nxt = _bfs_round(frontier, levels, edges, depth)
        if nxt.limit(1).count() == 0:
            break
        levels = levels.unionByName(nxt)
        frontier = nxt.select("v")
    return levels


def k_core(edges: DataFrame, k: int = 2, rounds: int = 12) -> DataFrame:
    """k-core decomposition by FIXED-ROUND peeling: repeatedly drop
    vertices of degree < ``k`` (and their edges); what survives is the
    densely-connected backbone — the noise-vs-structure cut community
    detection and fraud-ring screens start from (connected_components
    groups everything reachable; k_core keeps only the parts that hold
    together after the tendrils peel away).

    The OPERATOR DEFINITION is ``rounds`` peeling passes, not
    run-to-fixpoint: both engines execute exactly the same bounded
    iteration, so the outputs are equal by construction whether or not
    the peeling has converged (extra rounds past the fixpoint are exact
    no-ops). At harness scale the trade graph converges in < 5 rounds;
    a production run sizes ``rounds`` to the observed peel depth or
    loops until a round removes nothing.

    Scale shape: each round is one degree aggregate (map-side combine)
    plus two |E|-sized semi-joins against the |V|-sized survivor set,
    with the lineage CUT per round (localCheckpoint, the pagerank
    long-loop device) — plan depth stays constant across rounds instead
    of compounding.

    Input: undirected edge list (doc_a, doc_b); output: surviving
    vertices with their in-core degree.
    """
    cur = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        cur = _kcore_round(cur, k)
    return (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .select(F.col("src").cast("long").alias("v"), "degree")
    )


def _kcore_round(cur: DataFrame, k: int) -> DataFrame:
    """One k-core peeling pass (the shared per-round body of `k_core` and
    `k_core_fixpoint`): degree aggregate, keep deg ≥ k, semi-join both
    endpoints against the survivor set, cut lineage."""
    keep = (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= k)
        .select("src")
    )
    return (
        cur.join(keep, "src", "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
        .localCheckpoint(eager=True)
    )


def k_core_fixpoint(
    edges: DataFrame, k: int = 2, max_rounds: int = 10_000
) -> DataFrame:
    """`k_core` run to its NATURAL fixpoint: peel until a round removes
    nothing — the true k-core whatever the peel depth (the r14 VERDICT
    run-to-fixpoint ask; the registered fixed-round key stays the oracle
    contract). Same per-round body (`_kcore_round`); ``max_rounds`` is a
    runaway-safety cap only — peeling strictly shrinks the edge set, so
    it always terminates in ≤ |V| rounds. The convergence probe is one
    count() on the (localCheckpointed, already-materialized) survivor
    edge table per round — a scalar to the driver, no extra shuffle.
    Equal to the fixed-round form whenever the graph converges within the
    fixed cap (extra rounds past the fixpoint are exact no-ops;
    pytest-pinned on the harness graph)."""
    cur = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    n_edges = cur.count()
    for _ in range(max_rounds):
        cur = _kcore_round(cur, k)
        n_next = cur.count()
        if n_next == n_edges:
            break
        n_edges = n_next
    return (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .select(F.col("src").cast("long").alias("v"), "degree")
    )


def label_propagation(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Community detection by FIXED-ROUND synchronous label propagation
    with a deterministic tie-break: every vertex starts as its own label;
    each round it adopts the label most frequent among its neighbors,
    ties broken by SMALLEST label. The min-tiebreak makes synchronous
    LPA a pure function of the graph (classic LPA randomizes update
    order and tie choices — useless under a bit-exact oracle), and the
    fixed round count is the oracle contract, exactly the `k_core`
    discipline (`graph.py k_core`): both engines run the same bounded
    iteration, equal by construction, converged or not.

    vs `connected_components`: components merge everything REACHABLE;
    LPA splits a component along density — frequent-neighbor majorities
    stop labels at sparse cuts, which is the community (fraud-ring /
    topic-cluster) question components can't answer.

    Scale shape: per round ONE message join (labels onto the dst side of
    the symmetrized, persisted edge table — |E| messages), one
    (vertex, label) count agg sharing the same Exchange as the argmin
    window over it (vertex-sized), lineage cut per round
    (localCheckpoint, the pagerank long-loop device). Label tables are
    |V|-sized; at broadcast-budget vertex counts the message join is
    map-side.

    Input: undirected (doc_a, doc_b); output (v, label, n_members) where
    n_members is the final community census decorated onto each vertex.
    """
    sym = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").cast("long").alias("label")
    )
    w = Window.partitionBy("v").orderBy(F.col("c").desc(), F.col("label"))
    for _ in range(rounds):
        msgs = sym.join(
            labels.withColumnRenamed("v", "dst"), "dst"
        ).select(F.col("src").alias("v"), "label")
        labels = (
            msgs.groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", "label")
            .localCheckpoint(eager=True)
        )
    census = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        labels.join(census, "label")
        .select(
            F.col("v").cast("long").alias("v"),
            F.col("label").cast("long").alias("label"),
            "n_members",
        )
    )


def graph_modularity(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Newman modularity of the `label_propagation` communities, exact:
    per community c, Q_c = e_c/m − (d_c/2m)² where e_c = intra-community
    edges, d_c = total degree, m = |edges| — the quality score that
    adjudicates a community cut (Q ≈ 0: no better than random; the LPA
    eval key, as `emb_recall_eval` adjudicates ANN and
    `dedup_minhash_calibration` adjudicates LSH).

    EXACT: e_c, d_c, m are integer censuses over the symmetrized
    distinct edge table; Q_c = (4m·e_c − d_c²)/(4m²) is one rational on
    the signed device at 6 dp (a community smaller than random's
    expectation contributes negative). Σ Q_c = Q.

    Scale shape: LPA's own cost dominates; after it, one broadcast of
    the |V|-sized label table onto the edge list (both-endpoint join),
    one |labels|-sized census agg, and the scalar m crossed in. No new
    fact-sized shuffles.
    """
    from pyspark.sql import functions as F

    from kdb_spark.analytics.exact import iround_col

    labels = label_propagation(edges, rounds=rounds).select("v", "label")
    sym = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # m = undirected edge count; sym holds each edge twice
    m = sym.agg((F.count(F.lit(1)) / 2).cast("long").alias("m"))
    lab = labels.withColumnRenamed("v", "src").withColumnRenamed("label", "la")
    lab2 = labels.withColumnRenamed("v", "dst").withColumnRenamed("label", "lb")
    tagged = sym.join(F.broadcast(lab), "src").join(F.broadcast(lab2), "dst")
    census = tagged.groupBy("la").agg(
        # intra edges counted twice in sym -> /2 exact (both directions present)
        (F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0)) / 2)
        .cast("long")
        .alias("e_in"),
        F.count(F.lit(1)).cast("long").alias("d_tot"),  # degree sum of c
    )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    g = (
        census.withColumnRenamed("la", "label")
        .join(sizes, "label")
        .crossJoin(F.broadcast(m))
    )
    q6 = iround_col(
        "(4 * CAST(m AS DECIMAL(38,0)) * e_in - CAST(d_tot AS DECIMAL(38,0)) * d_tot)",
        "4 * CAST(m AS DECIMAL(38,0)) * m",
        6,
        signed=True,
    )
    return g.select(
        F.col("label").cast("long").alias("label"),
        "n_members",
        "e_in",
        "d_tot",
        q6.alias("q_term"),
    )


def clustering_coeff(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex: C(v) = 2·tri(v) /
    (deg(v)·(deg(v)−1)) — how close each vertex's neighborhood is to a
    clique, THE standard local-density companion of `triangle_count`
    (Watts–Strogatz small-world statistic; the reference-free way to
    find tightly-knit co-purchase pockets vs hub-and-spoke customers).

    EXACT: triangles and degrees are exact integers from the skew-safe
    degree-ordered enumeration (reused verbatim — ONE extra projection,
    zero extra joins/shuffles on top of `triangle_count`); the
    coefficient is the exact rational 2·tri/(deg·(deg−1)) through the
    unsigned device at 6 dp. deg < 2 → NULL (undefined, not 0 — a
    leaf's neighborhood has no possible edge to close).

    Scale shape: inherits triangle_count's plan (two |E| joins +
    broadcast degrees, hub-linear wedge enumeration); the division is a
    map-side expression on the |V|-sized rollup.
    """
    from kdb_spark.analytics.exact import iround_col

    t = triangle_count(edges)
    coeff = iround_col(
        "2 * n_tri", "CAST(deg AS DECIMAL(38,0)) * (deg - 1)", 6, signed=False
    )
    return t.select(
        "v",
        "deg",
        "n_tri",
        F.when(F.col("deg") >= 2, coeff).alias("coeff"),
    )
