"""Graph query: PageRank over the part co-order graph.

Demonstrates the iterative-algorithm pattern (driver loop over
shuffle-join + shuffle-agg rounds, operators/graph.py) on data derived
from the relational tables: parts are linked when they appear in the
same order. The DuckDB oracle is the SAME fixed power iteration,
generated as an unrolled chain of CTEs (recursive CTEs with aggregation
in the recursive term are not portable; unrolling is — and it keeps the
oracle bit-deterministic). Floating-point sums may differ in the last
ulp between engines, so both sides rank and emit the ROUNDED score.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.operators.ordered import with_global_order
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table

ITERS = 5
DAMPING = 0.85
TOP_N = 20



def _pair_occurrences(li: DataFrame) -> DataFrame:
    """Oriented (src < dst) co-order part pairs, ONE ROW PER CO-ORDER, from
    (l_orderkey, l_partkey) incidence rows via groupBy + in-array pair
    expansion.

    One shuffle (the order-keyed groupBy) instead of the two a self-join
    needs (both join inputs shuffle on l_orderkey); the quadratic pair
    expansion runs as JVM array HOFs inside the task that owns the order,
    bounded by lines-per-order. Measured at sf0.1: 2.15 s -> 1.44 s for
    the full 1.2M-edge build; at cluster scale it removes one complete
    fact-table shuffle from every graph query. array_sort + collect_set
    make a<b orientation and within-order dedup by-construction.
    """
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (a, i) ->"
                    " transform(slice(ps, i + 2, size(ps)), b -> struct(a AS src, b AS dst))))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
    )


def _pair_expand(li: DataFrame) -> DataFrame:
    """Distinct oriented co-order part pairs (see _pair_occurrences)."""
    return _pair_occurrences(li).distinct()


def pagerank_part_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-order-central parts by 5-round PageRank.

    The edge build is a self-join of lineitem on l_orderkey (bounded by
    lines-per-order, not table size); the graph is symmetrized so it has
    no dangling nodes, which also makes the fixed-point independent of
    the dangling-mass redistribution order."""
    from analytics_data_platform_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = _pair_expand(li)
    edges = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pr = pagerank(edges, iters=ITERS, damping=DAMPING)
    scored = pr.select(F.col("node").alias("part_key"), F.round("rank", 8).alias("pr_rank"))
    w = Window.orderBy(F.desc("pr_rank"), "part_key")
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= TOP_N)
        .select("pos", "part_key", "pr_rank")
    )


def _pagerank_sql(iters: int = ITERS, damping: float = DAMPING, top_n: int = TOP_N) -> str:
    base_lit = repr(1.0 - damping)  # full-precision double literal
    d_lit = repr(damping)
    parts = [
        """WITH p AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT src, dst FROM p UNION ALL SELECT dst AS src, src AS dst FROM p),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
pr0 AS (SELECT node, deg, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM deg)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
pr{i} AS (
  SELECT d.node, d.deg,
         CAST({base_lit} AS DOUBLE) / (SELECT n FROM nn)
         + CAST({d_lit} AS DOUBLE) * COALESCE(s.contrib, CAST(0.0 AS DOUBLE)) AS rank
  FROM deg d LEFT JOIN (
    SELECT e.dst AS node, SUM(pp.rank / pp.deg) AS contrib
    FROM pr{i - 1} pp JOIN edges e ON pp.node = e.src
    GROUP BY e.dst
  ) s ON d.node = s.node
)"""
        )
    parts.append(
        f""",
scored AS (SELECT node AS part_key, ROUND(rank, 8) AS pr_rank FROM pr{iters}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY pr_rank DESC, part_key) AS pos FROM scored
)
SELECT pos, part_key, pr_rank FROM ranked WHERE pos <= {top_n}"""
    )
    return "".join(parts)


register(
    QuerySpec(
        "pagerank_part_coorder",
        pagerank_part_coorder,
        _pagerank_sql(),
        doc="iterative PageRank (5 power-iteration rounds) on the part co-order graph",
        cites="iterative-algorithm family (brief); operators/graph.py",
        tags=("graph", "iterative"),
    )
)


def _oriented_triangles(li: DataFrame, pair_df: DataFrame | None = None) -> DataFrame:
    """Every co-order triangle exactly once, as rows (n1, n2, n3) — the
    degree-oriented edge-iterator shared by the triangle-count and
    clustering-coefficient queries (see triangle_count_coorder docstring
    for the plan rationale). Pass ``pair_df`` (src, dst) to reuse an
    already-materialized co-order pair list."""
    base = pair_df if pair_df is not None else _pair_expand(li)
    pairs = base.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    sym = pairs.unionByName(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("deg"))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    # re-orient: src = endpoint with the smaller (deg, id), dst = larger
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    edges = (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        # referenced by both sides of the adjacency join; materialize the
        # (much smaller) oriented edge list once instead of re-running the
        # lineitem self-join + degree join per reference
        .localCheckpoint(eager=False)
    )
    adj = edges.groupBy("src").agg(F.collect_set("dst").alias("nbrs"))
    asrc = adj.select(F.col("src").alias("e_src"), F.col("nbrs").alias("n_src"))
    adst = adj.select(F.col("src").alias("e_dst"), F.col("nbrs").alias("n_dst"))
    return (
        edges.join(asrc, edges.src == asrc.e_src)
        .join(adst, edges.dst == adst.e_dst)
        .select(
            edges.src.alias("n1"),
            edges.dst.alias("n2"),
            F.explode(F.array_intersect("n_src", "n_dst")).alias("n3"),
        )
    )


def triangle_count_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-order graph: total triangles plus
    the 10 parts participating in the most.

    Edge-iterator plan: orient edges from the LOWER-degree endpoint to
    the higher ((deg, id) total order), build each node's out-neighbor
    set once, then enumerate per edge (u,v) the intersection
    N+(u) ∩ N+(v) — every triangle surfaces at exactly one edge. The
    degree orientation bounds out-degrees (and so array sizes AND skew)
    to O(√m); the intersection runs as JVM array_intersect inside
    codegen. Measured at sf0.1 this replaced a 49M-row wedge-join
    shuffle with two 1.2M-row adjacency joins: triangle enumeration
    15-30 s → ~4 s. The triangle SET is orientation-invariant, so the
    id-orienting oracle is unchanged. Per-node counts come from exploding
    each triangle's three corners — one extra groupBy, no second pass
    over edges."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    tris = _oriented_triangles(li)
    per_node = (
        tris.select(F.explode(F.array("n1", "n2", "n3")).alias("part_key"))
        .groupBy("part_key")
        .agg(F.count("*").alias("n_triangles"))
    )
    w = Window.orderBy(F.desc("n_triangles"), "part_key")
    total = tris.agg(F.count("*").alias("t")).select(
        F.lit(0).alias("rank"),
        F.lit(-1).cast("long").alias("part_key"),
        F.col("t").alias("n_triangles"),
    )
    top = (
        per_node.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("rank", "part_key", "n_triangles")
    )
    return total.unionByName(top)


TRIANGLE_SQL = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tris AS (
  SELECT e1.src AS n1, e1.dst AS n2, e2.dst AS n3
  FROM pairs e1
  JOIN pairs e2 ON e1.dst = e2.src
  JOIN pairs e3 ON e1.src = e3.src AND e2.dst = e3.dst
),
per_node AS (
  SELECT part_key, COUNT(*) AS n_triangles
  FROM (
    SELECT unnest([n1, n2, n3]) AS part_key FROM tris
  )
  GROUP BY part_key
),
total AS (
  SELECT 0 AS rank, CAST(-1 AS BIGINT) AS part_key, COUNT(*) AS n_triangles FROM tris
),
top AS (
  SELECT rank, part_key, n_triangles FROM (
    SELECT part_key, n_triangles,
           ROW_NUMBER() OVER (ORDER BY n_triangles DESC, part_key) AS rank
    FROM per_node
  ) WHERE rank <= 10
)
SELECT rank, part_key, n_triangles FROM total
UNION ALL
SELECT rank, part_key, n_triangles FROM top
"""

register(
    QuerySpec(
        "triangle_count_coorder",
        triangle_count_coorder,
        TRIANGLE_SQL,
        doc="triangle count on the co-order graph (oriented cyclic join)",
        cites="graph analytics: clustering-coefficient primitive",
        tags=("graph",),
    )
)


# A sparse multi-component slice of the co-order graph: small parts
# (p_size <= 5) co-ordered during 1995-H1. At sf0.001/0.01/0.1 this yields
# 3/24/237 components — real cluster structure, unlike the full co-order
# graph which is one giant component.
_SPARSE_EDGE_SQL = """
  sel AS (SELECT p_partkey FROM part WHERE p_size <= 5),
  ord AS (
    SELECT o_orderkey FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-07-01'
  ),
  li AS (
    SELECT l_orderkey, l_partkey FROM lineitem
    JOIN sel ON l_partkey = p_partkey
    JOIN ord ON l_orderkey = o_orderkey
  ),
  pairs AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  ),
  edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs)
"""


def _sparse_coorder_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oriented (src < dst) co-order edges of the sparse slice above."""
    sel = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 5).select("p_partkey")
    ords = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1995-07-01").cast("date"))
        )
        .select("o_orderkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(F.broadcast(sel), F.col("l_partkey") == F.col("p_partkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_partkey")
    )
    return _pair_expand(li)


def connected_components_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the sparse co-order slice: every part with
    its component id (minimum member part key) and the component size.

    Runs the O(log n)-round large-star/small-star operator
    (operators/dedup.cluster_duplicates_star) — the billion-edge-safe CC —
    so this registry row is the hard oracle check for that operator: the
    DuckDB side recomputes components from first principles as a recursive
    transitive closure + MIN over each reachable set. The closure oracle is
    O(Σ component²) and only viable because the slice is sparse; the Spark
    side stays O(|E| log n) at any scale."""
    from analytics_data_platform_spark.operators.dedup import cluster_duplicates_star

    pairs = _sparse_coorder_pairs(spark, sf_dir)
    cc = cluster_duplicates_star(pairs, a_col="src", b_col="dst")
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("component_size"))
    return (
        cc.join(sizes, "cluster_id")
        .select(F.col("doc_id").alias("part_key"), "cluster_id", "component_size")
    )


CC_SQL = f"""
WITH RECURSIVE {_SPARSE_EDGE_SQL},
reach(a, b) AS (
  SELECT src AS a, src AS b FROM edges
  UNION
  SELECT r.a, e.dst AS b FROM reach r JOIN edges e ON r.b = e.src
),
cc AS (SELECT a AS node, MIN(b) AS cluster_id FROM reach GROUP BY a),
sizes AS (SELECT cluster_id, COUNT(*) AS component_size FROM cc GROUP BY cluster_id)
SELECT cc.node AS part_key, cc.cluster_id, sizes.component_size
FROM cc JOIN sizes ON cc.cluster_id = sizes.cluster_id
"""

register(
    QuerySpec(
        "connected_components_coorder",
        connected_components_coorder,
        CC_SQL,
        doc="large-star/small-star connected components vs a recursive-closure oracle",
        cites="operators/dedup.py cluster_duplicates_star (Kiveris et al.)",
        tags=("graph", "iterative"),
    )
)


BFS_MAX_HOPS = 4


def bfs_hops_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop distance (<= 4) from the graph's highest-degree node
    (ties broken by smallest part key) over the sparse co-order slice —
    the frontier-expansion BFS pattern, seeded in the dense region so the
    wavefront actually grows.

    The seed is picked as a 1-row aggregate DataFrame (no collect); each
    BFS round joins only the new frontier against the edge list."""
    from analytics_data_platform_spark.operators.graph import bfs_hops

    pairs = _sparse_coorder_pairs(spark, sf_dir)
    # one materialization serves the seed-degree aggregate AND every BFS
    # round (bfs_hops checkpoints its own input, which here just copies
    # these blocks instead of re-running the co-order self-join)
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    seeds = (
        edges.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .agg(
            F.min_by(
                "src", F.struct((-F.col("deg")).alias("nd"), F.col("src").alias("s"))
            ).alias("node")
        )
    )
    return bfs_hops(edges, seeds, max_hops=BFS_MAX_HOPS).select(
        F.col("node").alias("part_key"), "hops"
    )


BFS_SQL = f"""
WITH RECURSIVE {_SPARSE_EDGE_SQL},
seed AS (
  SELECT src AS node FROM (
    SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
  ) ORDER BY deg DESC, src LIMIT 1
),
walk(node, hops) AS (
  SELECT node, 0 FROM seed
  UNION
  SELECT e.dst AS node, w.hops + 1 FROM walk w JOIN edges e ON w.node = e.src
  WHERE w.hops < {BFS_MAX_HOPS}
)
SELECT node AS part_key, CAST(MIN(hops) AS INT) AS hops FROM walk GROUP BY node
"""

register(
    QuerySpec(
        "bfs_hops_coorder",
        bfs_hops_coorder,
        BFS_SQL,
        doc="frontier-expansion BFS hop distance vs a recursive-CTE oracle",
        cites="operators/graph.py bfs_hops (Pregel BFS pattern)",
        tags=("graph", "iterative"),
    )
)


SSSP_MAX_HOPS = 4


def sssp_cost_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded Bellman-Ford shortest-path cost (<= 4 edges) from the
    graph's highest-degree node over the WEIGHTED sparse co-order slice:
    edge weight = max(1, 6 - #shared orders), so frequently co-ordered
    parts are "closer". Integer costs end to end — the multi-hop
    affinity-distance query a recommender derives from basket data."""
    from analytics_data_platform_spark.operators.graph import sssp_hops

    sel = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 5).select("p_partkey")
    ords = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1995-07-01").cast("date"))
        )
        .select("o_orderkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(F.broadcast(sel), F.col("l_partkey") == F.col("p_partkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_partkey")
    )
    wpairs = (
        _pair_occurrences(li)
        .groupBy("src", "dst")
        .agg(F.greatest(F.lit(1), F.lit(6) - F.count("*")).cast("long").alias("w"))
    )
    # one materialization serves the seed aggregate and every relaxation
    # round (sssp_hops re-checkpoints = a block copy, not a re-join)
    edges = wpairs.unionByName(
        wpairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).localCheckpoint(eager=False)
    seeds = (
        edges.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .agg(
            F.min_by(
                "src", F.struct((-F.col("deg")).alias("nd"), F.col("src").alias("s"))
            ).alias("node")
        )
    )
    return sssp_hops(edges, seeds, max_hops=SSSP_MAX_HOPS).select(
        F.col("node").alias("part_key"), "cost"
    )


SSSP_SQL = f"""
WITH RECURSIVE sel AS (SELECT p_partkey FROM part WHERE p_size <= 5),
ord AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-07-01'
),
li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  JOIN sel ON l_partkey = p_partkey
  JOIN ord ON l_orderkey = o_orderkey
),
opairs AS (
  SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
wpairs AS (
  SELECT src, dst, CAST(GREATEST(1, 6 - COUNT(*)) AS BIGINT) AS w
  FROM opairs GROUP BY src, dst
),
edges AS (SELECT src, dst, w FROM wpairs UNION ALL SELECT dst AS src, src AS dst, w FROM wpairs),
seed AS (
  SELECT src AS node FROM (
    SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
  ) ORDER BY deg DESC, src LIMIT 1
),
walk(node, cost, hops) AS (
  SELECT node, CAST(0 AS BIGINT), 0 FROM seed
  UNION
  SELECT e.dst AS node, w.cost + e.w AS cost, w.hops + 1 FROM walk w JOIN edges e ON w.node = e.src
  WHERE w.hops < {SSSP_MAX_HOPS}
)
SELECT node AS part_key, MIN(cost) AS cost FROM walk GROUP BY node
"""

register(
    QuerySpec(
        "sssp_cost_coorder",
        sssp_cost_coorder,
        SSSP_SQL,
        doc="bounded Bellman-Ford shortest-path cost on the weighted co-order graph",
        cites="operators/graph.py sssp_hops (Pregel relaxation)",
        tags=("graph", "iterative"),
    )
)


# --------------------------------------------------------------------------
# k-core peeling (fixed rounds) on the part co-order graph
# --------------------------------------------------------------------------

KCORE_ROUNDS = 3


def kcore_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes surviving 3 rounds of k-core peeling on the part co-order
    graph, with their residual degrees. k adapts to the graph: it is the
    10th-percentile initial degree, selected by row position with the
    integer identity ceil(0.1·n) = (n+9) div 10 — no float quantile, so
    both engines pick the identical k at any scale (a fixed absolute k
    peels everything at small SF and nothing at large SF; on this
    near-regular graph k above the mean cascades to an empty core, so the
    decile keeps the peel informative at every scale).

    Each round recomputes degrees on the alive-induced subgraph (one
    semi-join per endpoint + one count aggregate — frontier-proportional,
    no driver data access) and drops nodes below k. Rounds are FIXED so
    the DuckDB oracle can unroll them as CTEs; the peel is monotone, so a
    fixed prefix is well-defined regardless of whether the fixpoint has
    been reached (the operator variant that iterates to convergence lives
    with the other iterative ops and shares this round body). The edge
    list is materialized once (localCheckpoint) — the same
    evaluate-once guard the PageRank/CC loops use.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = _pair_expand(li)
    edges = (
        pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=False)
    )
    deg0 = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = deg0.agg(F.count(F.lit(1)).alias("cnt"))
    kth = (
        # decile selection by distributed global rank (operators/
        # ordered.py — |nodes| grows with data, no global sort window)
        with_global_order(deg0, "deg", tiebreaks=["src"], rank_col="rn")
        .crossJoin(F.broadcast(n_nodes))
        .where(F.col("rn") == F.expr("(cnt + 9) div 10"))
        .select(F.col("deg").alias("k"))
    )
    # round 1's alive set is ALL nodes, so its induced-subgraph joins are
    # no-ops: seed the peel from deg0 directly and join only from round 2
    deg = deg0.crossJoin(F.broadcast(kth))
    alive = deg.where(F.col("deg") >= F.col("k")).select(F.col("src").alias("node"))
    for _ in range(KCORE_ROUNDS - 1):
        # alive feeds BOTH endpoint semi-joins: without the per-round
        # lineage truncation each reference re-evaluates every earlier
        # round (2^rounds growth — the graph.py Pregel loops make the
        # same call); the checkpointed set is small (node ids)
        alive = alive.localCheckpoint(eager=True)
        sub = (
            edges.join(alive.select(F.col("node").alias("src")), "src")
            .join(alive.select(F.col("node").alias("dst")), "dst")
        )
        deg = sub.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).crossJoin(
            F.broadcast(kth)
        )
        alive = deg.where(F.col("deg") >= F.col("k")).select(F.col("src").alias("node"))
    survivors = deg.where(F.col("deg") >= F.col("k"))
    return survivors.select(
        F.col("src").alias("part_key"), F.col("deg").alias("residual_deg"), "k"
    )


def _kcore_sql() -> str:
    parts = [
        """WITH p AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT src, dst FROM p UNION ALL SELECT dst AS src, src AS dst FROM p),
deg0 AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS cnt FROM deg0),
kth AS (
  SELECT CAST(deg AS BIGINT) AS k FROM (
    SELECT deg, ROW_NUMBER() OVER (ORDER BY deg, src) AS rn FROM deg0
  ), nn WHERE rn = (cnt + 9) // 10
)"""
    ]
    parts.append(
        """,
deg1 AS (SELECT src, deg FROM deg0),
alive1 AS (SELECT src AS node FROM deg1, kth WHERE deg >= k)"""
    )
    for i in range(2, KCORE_ROUNDS + 1):
        parts.append(
            f""",
deg{i} AS (
  SELECT e.src, COUNT(*) AS deg
  FROM edges e
  JOIN alive{i - 1} s ON e.src = s.node
  JOIN alive{i - 1} d ON e.dst = d.node
  GROUP BY e.src
),
alive{i} AS (SELECT src AS node FROM deg{i}, kth WHERE deg >= k)"""
        )
    parts.append(
        f"""
SELECT src AS part_key, CAST(deg AS BIGINT) AS residual_deg, k
FROM deg{KCORE_ROUNDS}, kth WHERE deg >= k"""
    )
    return "".join(parts)


register(
    QuerySpec(
        "kcore_coorder",
        kcore_coorder,
        _kcore_sql(),
        doc="k-core peeling (3 fixed rounds, k=40) with residual degrees",
        cites="iterative graph family; shares the CC/PageRank round pattern",
        tags=("graph", "iterative"),
    )
)


# ---- bipartite HITS (2 exact rounds) ---------------------------------------

HITS_TOP_N = 20


def hits_bipartite_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round HITS on the customer→part purchase bipartite graph:
    authorities are parts, hubs are customers.

        a₁(p) = |buyers(p)|            (init h = 1)
        h₁(c) = Σ_{p bought by c} a₁(p)
        a₂(p) = Σ_{c buying p} h₁(c)

    a₂ rewards parts bought by customers who buy many POPULAR parts — the
    mutual-reinforcement signal degree alone misses. Unrolled to a fixed
    two rounds with no normalization, every score is an exact BIGINT sum
    of BIGINT counts, so the ranking is engine-stable (normalizing turns
    HITS into float power iteration — same reason k-means/PageRank here
    quantize). Edge build: one orders⋈lineitem join keyed on l_orderkey,
    then distinct (cust, part) — two hash shuffles total; the two HITS
    rounds are groupBy re-aggregations of the SAME edge list.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
        .localCheckpoint(eager=False)  # reused by both rounds
    )
    a1 = edges.groupBy("part").agg(F.count(F.lit(1)).alias("a1"))
    h1 = (
        edges.join(a1, "part")
        .groupBy("cust")
        .agg(F.sum("a1").alias("h1"))
    )
    a2 = (
        edges.join(h1, "cust")
        .groupBy("part")
        .agg(F.sum("h1").alias("authority"), F.count(F.lit(1)).alias("n_buyers"))
    )
    w = Window.orderBy(F.desc("authority"), "part")
    return (
        a2.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= HITS_TOP_N)
        .select("pos", F.col("part").alias("part_key"), "authority", "n_buyers")
    )


HITS_SQL = f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
a1 AS (SELECT part, COUNT(*) AS a1 FROM edges GROUP BY 1),
h1 AS (
  SELECT e.cust, CAST(SUM(a1.a1) AS BIGINT) AS h1
  FROM edges e JOIN a1 ON e.part = a1.part GROUP BY 1
),
a2 AS (
  SELECT e.part, CAST(SUM(h1.h1) AS BIGINT) AS authority, COUNT(*) AS n_buyers
  FROM edges e JOIN h1 ON e.cust = h1.cust GROUP BY 1
),
ranked AS (
  SELECT part, authority, n_buyers,
         ROW_NUMBER() OVER (ORDER BY authority DESC, part) AS pos
  FROM a2
)
SELECT pos, part AS part_key, authority, n_buyers
FROM ranked WHERE pos <= {HITS_TOP_N}
"""


register(
    QuerySpec(
        "hits_bipartite_parts",
        hits_bipartite_parts,
        HITS_SQL,
        doc="2-round HITS authorities on the customer-part purchase graph (exact integer scores)",
        cites="graph family; unnormalized-fixed-rounds idiom shared with pagerank_part_coorder",
        tags=("graph", "join"),
    )
)


# ---- degree distribution tail index ----------------------------------------

_HILL_K = 50


def degree_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-free diagnostic for the co-order part graph: the Hill
    estimator of the degree distribution's tail exponent over the top-50
    degrees — α̂ = k / Σ ln(dᵢ/d₍ₖ₎). Heavy-tailed (α ≲ 3) means hub
    parts dominate co-occurrence and skew-aware joins matter; the
    logs are micro-nat quantized integers, so Σ is exact and the final
    α̂ is one division."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = _pair_expand(li)
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    w = Window.orderBy(F.desc("d"), "src")
    top = deg.select(
        "src", "d", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= _HILL_K)
    dk = top.where(F.col("rn") == _HILL_K).select(F.col("d").alias("dk"))
    lnq = top.crossJoin(F.broadcast(dk)).select(
        F.expr(
            "CAST(round(ln(CAST(d AS DOUBLE) / dk) * 1000000) AS BIGINT)"
        ).alias("lq")
    )
    return lnq.agg(
        F.count(F.lit(1)).alias("k_top"),
        F.sum("lq").alias("sum_ln_micronats"),
    ).selectExpr(
        "k_top",
        "sum_ln_micronats",
        "CASE WHEN sum_ln_micronats > 0 THEN"
        " round(CAST(k_top AS DOUBLE) * 1000000 / sum_ln_micronats, 4) END AS hill_alpha",
    )


HILL_SQL = f"""
WITH p AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
top AS (
  SELECT src, d, ROW_NUMBER() OVER (ORDER BY d DESC, src) AS rn FROM deg
  QUALIFY rn <= {_HILL_K}
),
dk AS (SELECT d AS dk FROM top WHERE rn = {_HILL_K}),
lnq AS (
  SELECT CAST(ROUND(ln(CAST(t.d AS DOUBLE) / k.dk) * 1000000) AS BIGINT) AS lq
  FROM top t, dk k
)
SELECT COUNT(*) AS k_top,
       CAST(SUM(lq) AS BIGINT) AS sum_ln_micronats,
       CASE WHEN CAST(SUM(lq) AS BIGINT) > 0 THEN
         ROUND(CAST(COUNT(*) AS DOUBLE) * 1000000 / CAST(SUM(lq) AS BIGINT), 4) END
         AS hill_alpha
FROM lnq
"""


register(
    QuerySpec(
        "degree_tail_index",
        degree_tail_index,
        HILL_SQL,
        doc="Hill tail-exponent of the co-order degree distribution (micro-nat exact sums)",
        cites="graph-stats: the skew diagnostic behind salting decisions; quantized-log idiom",
        tags=("graph", "stats"),
    )
)


# --- local clustering coefficient ------------------------------------------

LCC_TOP = 20
LCC_MIN_DEG = 5


def clustering_coefficient_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient: per part, triangles_at(v) divided by
    deg(v)·(deg(v)−1)/2 — how clique-like each part's co-order
    neighborhood is. Reuses the degree-oriented triangle enumeration
    (each triangle credits its three corners — one explode + groupBy, no
    second pass over edges); the denominator is the exact integer degree
    from the distinct-pair graph. Top 20 by coefficient among parts with
    degree ≥ 5, integer ratio rounded at the end."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # one materialized pair list serves the degree aggregate AND the
    # triangle enumeration — the co-order self-join runs once, not twice
    pairs = _pair_expand(li).localCheckpoint(eager=False)
    sym = pairs.unionByName(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("part_key")).agg(F.count(F.lit(1)).alias("deg"))
    per_node = (
        _oriented_triangles(li, pair_df=pairs)
        .select(F.explode(F.array("n1", "n2", "n3")).alias("part_key"))
        .groupBy("part_key")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    scored = (
        deg.where(F.col("deg") >= LCC_MIN_DEG)
        .join(per_node, "part_key", "left")
        .select(
            "part_key", "deg",
            F.coalesce("tri", F.lit(0)).alias("tri"),
            F.round(
                F.coalesce("tri", F.lit(0)) * 2 / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
                6,
            ).alias("lcc"),
        )
    )
    w = Window.orderBy(F.desc("lcc"), "part_key")
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= LCC_TOP)
        .select("pos", "part_key", "deg", "tri", "lcc")
    )


LCC_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
deg AS (SELECT src AS part_key, COUNT(*) AS deg FROM sym GROUP BY src),
tris AS (
  SELECT e1.src AS n1, e1.dst AS n2, e2.dst AS n3
  FROM pairs e1
  JOIN pairs e2 ON e1.dst = e2.src
  JOIN pairs e3 ON e1.src = e3.src AND e2.dst = e3.dst
),
per_node AS (
  SELECT part_key, COUNT(*) AS tri
  FROM (SELECT unnest([n1, n2, n3]) AS part_key FROM tris)
  GROUP BY part_key
)
SELECT pos, part_key, deg, tri, lcc FROM (
  SELECT d.part_key, d.deg, COALESCE(p.tri, 0) AS tri,
         ROUND(COALESCE(p.tri, 0) * 2 / CAST(d.deg * (d.deg - 1) AS DOUBLE), 6) AS lcc,
         ROW_NUMBER() OVER (
           ORDER BY ROUND(COALESCE(p.tri, 0) * 2 / CAST(d.deg * (d.deg - 1) AS DOUBLE), 6) DESC,
                    d.part_key) AS pos
  FROM deg d LEFT JOIN per_node p ON d.part_key = p.part_key
  WHERE d.deg >= {LCC_MIN_DEG}
) WHERE pos <= {LCC_TOP}
"""

register(
    QuerySpec(
        "clustering_coefficient_coorder",
        clustering_coefficient_coorder,
        LCC_SQL,
        doc="local clustering coefficient per part (triangles / deg-choose-2), top 20",
        cites="graph analytics; shares _oriented_triangles with triangle_count_coorder",
        tags=("graph",),
    )
)


# --------------------------------------------------------------------------
# label propagation communities (2 synchronous rounds) on the weighted
# co-order graph
# --------------------------------------------------------------------------

LPA_ROUNDS = 2
LPA_TOP = 15
LPA_MIN_W = 2  # keep only pairs co-ordered at least twice (community signal)


def _lpa_edges_and_labels(spark: SparkSession, sf_dir: str):
    """Shared LPA core: the weight-floored symmetric edge list and the
    labeling after LPA_ROUNDS synchronous rounds (see
    label_propagation_communities for the semantics)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    wpairs = (
        _pair_occurrences(li)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= LPA_MIN_W)
    )
    edges = (
        wpairs.select("src", "dst")
        .union(wpairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct().withColumn("lbl", F.col("node"))
    )
    for _ in range(LPA_ROUNDS):
        labels = labels.localCheckpoint(eager=True)
        votes = (
            edges.join(labels.select(F.col("node").alias("dst"), "lbl"), "dst")
            .groupBy(F.col("src").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = votes.groupBy("node").agg(
            F.min_by(
                "lbl", F.struct((-F.col("c")).alias("nc"), F.col("lbl").alias("l"))
            ).alias("lbl")
        )
    return edges, labels


def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top communities after 2 synchronous label-propagation rounds on the
    repeat-co-order part graph (edges = part pairs co-ordered ≥2 times —
    the weight floor sparsifies the near-regular co-order graph so the
    propagation has structure to find).

    Each round is one edge⋈label shuffle join plus two aggregates: count
    neighbor-label votes per (node, label), then pick the mode with a
    deterministic tie-break (count DESC, label ASC) via min_by over a
    struct — fully synchronous, so the DuckDB oracle unrolls the rounds
    as CTE pairs and both engines reach the identical labeling.
    Asynchronous/randomized LPA converges faster but is
    partitioning-dependent; the synchronous variant is the one with a
    deterministic distributed semantics (same call the PageRank/CC/k-core
    loops make). Per-round lineage is truncated (localCheckpoint) so
    round r does not re-evaluate rounds 1..r-1 per reference.
    Output: top communities by size with their final label.
    """
    edges, labels = _lpa_edges_and_labels(spark, sf_dir)
    comm = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("community_size"))
    w = Window.orderBy(F.desc("community_size"), "lbl")
    # rank + filter: Catalyst's LimitPushDownThroughWindow plans this as
    # TakeOrderedAndProject(limit=15) + a ≤15-row window (plan-audited)
    return (
        comm.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= LPA_TOP)
        .select("pos", F.col("lbl").alias("community"), "community_size")
    )


def _lpa_sql_prefix() -> str:
    """Shared oracle CTE chain: edges + unrolled LPA rounds → l{LPA_ROUNDS}."""
    parts = [
        f"""WITH co AS (
  SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
wp AS (
  SELECT src, dst FROM co GROUP BY src, dst HAVING COUNT(*) >= {LPA_MIN_W}
),
edges AS (SELECT src, dst FROM wp UNION ALL SELECT dst AS src, src AS dst FROM wp),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges)"""
    ]
    for i in range(1, LPA_ROUNDS + 1):
        parts.append(
            f""",
v{i} AS (
  SELECT e.src AS node, l.lbl, COUNT(*) AS c
  FROM edges e JOIN l{i - 1} l ON e.dst = l.node
  GROUP BY e.src, l.lbl
),
l{i} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
    FROM v{i}
  ) WHERE rn = 1
)"""
        )
    return "".join(parts)


def _lpa_sql() -> str:
    return (
        _lpa_sql_prefix()
        + f""",
comm AS (
  SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS community_size
  FROM l{LPA_ROUNDS} GROUP BY lbl
)
SELECT pos, community, community_size FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY community_size DESC, community) AS pos
  FROM comm
) WHERE pos <= {LPA_TOP}"""
    )


register(
    QuerySpec(
        "label_propagation_communities",
        label_propagation_communities,
        _lpa_sql(),
        doc="2-round synchronous label propagation on the repeat-co-order graph",
        cites="iterative graph family; shares the CC/PageRank/k-core round pattern",
        tags=("graph", "iterative"),
    )
)


# ---- modularity of the LPA labeling ---------------------------------------

MOD_TOP = 10


def lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation communities, per
    community and in total — the standard quality score for a graph
    partitioning (Q = Σ_c [A_c/2m − (d_c/2m)²]).

    Cross-engine determinism: summing per-community DOUBLE contributions
    is summation-order-dependent (the r02 hash-flake class), so both
    engines compute the EXACT INTEGER numerator Σ_c (A_c·2m − d_c²)
    first — integer addition is order-free — and divide by (2m)² once,
    in double, at the end. A_c (intra-community directed edges) and d_c
    (community degree sum) come from one edges⋈labels⋈labels join and a
    single aggregate; 2m is the scalar edge count. Numerator magnitude
    is bounded by (2m)², so the int64 path holds to ~3e9 directed edges;
    above that, swap the two products to DECIMAL(38,0) — same plan.
    Output: top communities by size with contribution, plus total Q.
    """
    edges, labels = _lpa_edges_and_labels(spark, sf_dir)
    labels = labels.localCheckpoint(eager=True)  # referenced 3×: endpoints + sizes
    inter = edges.join(
        labels.select(F.col("node").alias("src"), F.col("lbl").alias("src_lbl")), "src"
    ).join(
        labels.select(F.col("node").alias("dst"), F.col("lbl").alias("dst_lbl")), "dst"
    )
    per = inter.groupBy(F.col("src_lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("degree_sum"),
        F.sum(
            F.when(F.col("dst_lbl") == F.col("src_lbl"), 1).otherwise(0)
        ).alias("intra_edges"),
    )
    sizes = labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("community_size")
    )
    m2 = edges.agg(F.count(F.lit(1)).alias("m2"))
    pj = (
        per.join(sizes, "community")
        .crossJoin(F.broadcast(m2))
        .withColumn(
            "num",
            F.col("intra_edges") * F.col("m2")
            - F.col("degree_sum") * F.col("degree_sum"),
        )
    )
    total = pj.agg(F.sum("num").alias("tnum"))
    denom = F.col("m2").cast("double") * F.col("m2")
    w = Window.orderBy(F.desc("community_size"), "community")
    return (
        pj.crossJoin(F.broadcast(total))
        .select(
            "community",
            "community_size",
            "intra_edges",
            "degree_sum",
            F.round(F.col("num") / denom, 6).alias("contribution"),
            F.round(F.col("tnum") / denom, 6).alias("modularity"),
        )
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= MOD_TOP)
        .select(
            "pos",
            "community",
            "community_size",
            "intra_edges",
            "degree_sum",
            "contribution",
            "modularity",
        )
    )


def _lpa_modularity_sql() -> str:
    return (
        _lpa_sql_prefix()
        + f""",
lab AS (SELECT node, lbl FROM l{LPA_ROUNDS}),
inter AS (
  SELECT a.lbl AS src_lbl, b.lbl AS dst_lbl
  FROM edges e JOIN lab a ON e.src = a.node JOIN lab b ON e.dst = b.node
),
m2 AS (SELECT COUNT(*) AS m2 FROM edges),
per AS (
  SELECT src_lbl AS community,
         COUNT(*) AS degree_sum,
         CAST(SUM(CASE WHEN dst_lbl = src_lbl THEN 1 ELSE 0 END) AS BIGINT) AS intra_edges
  FROM inter GROUP BY src_lbl
),
sizes AS (SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS community_size FROM lab GROUP BY lbl),
pj AS (
  SELECT p.community, community_size, intra_edges, degree_sum,
         (intra_edges * m2 - degree_sum * degree_sum) AS num, m2
  FROM per p JOIN sizes s ON p.community = s.community, m2
),
tot AS (SELECT CAST(SUM(num) AS BIGINT) AS tnum FROM pj)
SELECT pos, community, community_size, intra_edges, degree_sum, contribution, modularity
FROM (
  SELECT community, community_size, intra_edges, degree_sum,
         ROUND(num / (CAST(m2 AS DOUBLE) * m2), 6) AS contribution,
         ROUND(tnum / (CAST(m2 AS DOUBLE) * m2), 6) AS modularity,
         ROW_NUMBER() OVER (ORDER BY community_size DESC, community) AS pos
  FROM pj, tot
) WHERE pos <= {MOD_TOP}"""
    )


register(
    QuerySpec(
        "lpa_modularity",
        lpa_modularity,
        _lpa_modularity_sql(),
        doc="Newman modularity of the LPA labeling (exact-integer numerator)",
        cites="graph evaluation family; composes label_propagation_communities",
        tags=("graph", "eval"),
    )
)
