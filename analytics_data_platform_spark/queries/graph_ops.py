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

from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table

ITERS = 5
DAMPING = 0.85
TOP_N = 20


def pagerank_part_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-order-central parts by 5-round PageRank.

    The edge build is a self-join of lineitem on l_orderkey (bounded by
    lines-per-order, not table size); the graph is symmetrized so it has
    no dangling nodes, which also makes the fixed-point independent of
    the dangling-mass redistribution order."""
    from analytics_data_platform_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
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


def triangle_count_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-order graph: total triangles plus
    the 10 parts participating in the most.

    The cyclic-join shape no other registry query exercises: oriented
    edges (src < dst) joined E(a,b) ⋈ E(b,c) ⋈ E(a,c) so each triangle
    materializes exactly once. Orientation is the scale lever — ordering
    edges (here by id; by degree in adversarial graphs) bounds the
    wedge-join fan-out to the ordered adjacency lists, the standard
    MapReduce triangle-count plan. Per-node counts come from exploding
    each triangle's three corners — one extra groupBy, no second pass
    over edges."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e1.src") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
        )
        .select(
            F.col("e1.src").alias("n1"),
            F.col("e1.dst").alias("n2"),
            F.col("e2.dst").alias("n3"),
        )
    )
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
