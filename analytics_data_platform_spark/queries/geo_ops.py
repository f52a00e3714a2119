"""Geospatial queries: grid-binned within-radius join + grid density.

There is no geo data in the TPC-H-ish tables, so coordinates are derived
deterministically from the customer key with the same engine-portable
md5 idiom the sampling/A-B operators use — both engines synthesize the
IDENTICAL point set, and every statistic is integer micro-degrees, so
results are bit-stable.

The interesting part is the join strategy: `geo_neighbor_pairs` runs the
9-cell grid equi-join of `operators/geo.py`, while its DuckDB oracle is
the naive ALL-PAIRS distance filter — a green hash match is a proof that
grid pruning drops no pair (the same oracle-as-adversary pattern as the
prefix-filtered set-similarity join). At sf0.01 the oracle compares
~1.1M candidate pairs; the Spark side never materializes more than the
cell-collision candidates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.operators.geo import pairs_within_radius, with_cell
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table

# point synthesis: lat ∈ [-60°, 60°), lon ∈ [-180°, 180°) in micro-degrees
_LAT_SPAN, _LON_SPAN = 120_000_000, 360_000_000
RADIUS_MICRO = 2_000_000  # 2° Chebyshev radius for the pair join
DENSITY_CELL = 10_000_000  # 10° cells for the density rollup


def _customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    h1 = F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    h2 = F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 9, 8), 16, 10).cast(
        "bigint"
    )
    return c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("acctbal_cents"),
        (h1 % _LAT_SPAN - _LAT_SPAN // 2).alias("lat_micro"),
        (h2 % _LON_SPAN - _LON_SPAN // 2).alias("lon_micro"),
    )


_POINTS_SQL = f"""
  SELECT c_custkey AS id,
         CAST(c_nationkey AS BIGINT) AS nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % {_LAT_SPAN}
           - {_LAT_SPAN // 2} AS lat_micro,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8))::BIGINT % {_LON_SPAN}
           - {_LON_SPAN // 2} AS lon_micro
  FROM customer
"""


def geo_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 2° Chebyshev distance, via the 3×3 grid
    equi-join (no cross product — plan-guarded in tests/test_plans.py).
    The oracle computes the same pairs ALL-PAIRS: a hash match proves the
    grid candidate set is lossless."""
    pts = _customer_points(spark, sf_dir)
    pairs = pairs_within_radius(pts, RADIUS_MICRO, id_col="id")
    return pairs.select(
        "id_a",
        "id_b",
        F.greatest(
            F.abs(F.col("lat_a") - F.col("lat_b")),
            F.abs(F.col("lon_a") - F.col("lon_b")),
        ).alias("dist_micro"),
    )


GEO_PAIRS_SQL = f"""
WITH pts AS ({_POINTS_SQL})
SELECT a.id AS id_a, b.id AS id_b,
       GREATEST(ABS(a.lat_micro - b.lat_micro), ABS(a.lon_micro - b.lon_micro)) AS dist_micro
FROM pts a JOIN pts b ON a.id < b.id
WHERE GREATEST(ABS(a.lat_micro - b.lat_micro), ABS(a.lon_micro - b.lon_micro))
      <= {RADIUS_MICRO}
"""


def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer density + balance per 10° grid cell — the binning rollup
    behind heatmaps and spatial partitioning decisions. One groupBy on the
    integer cell id; at 100 TB this is an ordinary partial-agg shuffle."""
    pts = with_cell(_customer_points(spark, sf_dir), DENSITY_CELL)
    return (
        pts.groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("acctbal_cents").alias("balance_cents"),
            F.countDistinct("nationkey").alias("n_nations"),
        )
        .where(F.col("n_customers") >= 2)
    )


GEO_DENSITY_SQL = f"""
WITH pts AS ({_POINTS_SQL})
SELECT CAST(floor(lat_micro / {DENSITY_CELL}.0) AS BIGINT) AS cell_lat,
       CAST(floor(lon_micro / {DENSITY_CELL}.0) AS BIGINT) AS cell_lon,
       COUNT(*) AS n_customers,
       CAST(SUM(acctbal_cents) AS BIGINT) AS balance_cents,
       COUNT(DISTINCT nationkey) AS n_nations
FROM pts
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


def geo_nearest_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest neighbor per customer (within the 2° radius): symmetrize
    the grid-join pairs, then one min_by-style struct-min per point —
    ties broken by neighbor id, so the winner is unique and engine-stable.
    Points with no neighbor inside the radius are excluded (bounded-search
    semantics; an unbounded nearest-neighbor needs an expanding-ring scan,
    which trades determinism for coverage)."""
    pts = _customer_points(spark, sf_dir)
    pairs = pairs_within_radius(pts, RADIUS_MICRO, id_col="id").select(
        "id_a",
        "id_b",
        F.greatest(
            F.abs(F.col("lat_a") - F.col("lat_b")),
            F.abs(F.col("lon_a") - F.col("lon_b")),
        ).alias("dist"),
    )
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nb"), "dist"
    ).unionAll(pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nb"), "dist"))
    best = sym.groupBy("id").agg(F.min(F.struct("dist", "nb")).alias("m"))
    return best.select(
        "id", F.col("m.nb").alias("neighbor_id"), F.col("m.dist").alias("dist_micro")
    )


GEO_NEAREST_SQL = f"""
WITH pts AS ({_POINTS_SQL}),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         GREATEST(ABS(a.lat_micro - b.lat_micro), ABS(a.lon_micro - b.lon_micro)) AS dist
  FROM pts a JOIN pts b ON a.id < b.id
  WHERE GREATEST(ABS(a.lat_micro - b.lat_micro), ABS(a.lon_micro - b.lon_micro))
        <= {RADIUS_MICRO}
),
sym AS (
  SELECT id_a AS id, id_b AS nb, dist FROM pairs
  UNION ALL
  SELECT id_b AS id, id_a AS nb, dist FROM pairs
),
ranked AS (
  SELECT id, nb, dist, ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, nb) AS rn
  FROM sym
)
SELECT id, nb AS neighbor_id, dist AS dist_micro FROM ranked WHERE rn = 1
"""


register(
    QuerySpec(
        "geo_nearest_within_radius",
        geo_nearest_within_radius,
        GEO_NEAREST_SQL,
        doc="bounded nearest-neighbor per point from symmetrized grid-join pairs (struct-min argmin)",
        cites="operators/geo.py pairs_within_radius",
        tags=("geo", "join"),
    )
)


register(
    QuerySpec(
        "geo_neighbor_pairs",
        geo_neighbor_pairs,
        GEO_PAIRS_SQL,
        doc="within-radius spatial self-join via 3x3 grid cells; all-pairs oracle proves losslessness",
        cites="operators/geo.py pairs_within_radius; same bucket-join family as operators/dedup.py LSH",
        tags=("geo", "join", "scale"),
    )
)

register(
    QuerySpec(
        "geo_grid_density",
        geo_grid_density,
        GEO_DENSITY_SQL,
        doc="10-degree grid density rollup (count, balance, nation mix) over synthesized points",
        cites="operators/geo.py with_cell",
        tags=("geo", "agg"),
    )
)


# --- grid-DBSCAN: density clusters from the same bucketed machinery --------

DBSCAN_RADIUS_MICRO = 4_000_000  # 4° Chebyshev ε
DBSCAN_MIN_NEIGHBORS = 2  # core = at least this many neighbors within ε
DBSCAN_TOP = 10


def dbscan_grid_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over customer points, composed from scale-safe pieces:
    ε-neighbor pairs from the 3×3 grid equi-join (never a cross product),
    core points by neighbor degree, clusters as connected components of
    the core-core graph via the O(log n)-round large-star/small-star
    operator, and border points attached to their MIN core-neighbor
    cluster (deterministic where textbook DBSCAN says 'arbitrary').

    The oracle rebuilds everything from first principles — all-pairs
    neighbors + recursive transitive closure — so the hash match proves
    both the grid pruning AND the star CC agree with exact DBSCAN."""
    from analytics_data_platform_spark.operators.dedup import cluster_duplicates_star

    pts = _customer_points(spark, sf_dir)
    pairs = (
        pairs_within_radius(pts, DBSCAN_RADIUS_MICRO, id_col="id")
        .select("id_a", "id_b")
        # grid join re-runs per reference otherwise (edges, degrees, border)
        .localCheckpoint(eager=False)
    )
    sym = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    deg = sym.groupBy("id_a").agg(F.count(F.lit(1)).alias("deg"))
    cores = deg.where(F.col("deg") >= DBSCAN_MIN_NEIGHBORS).select(F.col("id_a").alias("id"))
    core_edges = (
        pairs.join(cores.select(F.col("id").alias("id_a")), "id_a")
        .join(cores.select(F.col("id").alias("id_b")), "id_b")
        .select("id_a", "id_b")
    )
    # isolated cores (no core neighbor) still form singleton clusters
    cc = cluster_duplicates_star(core_edges, a_col="id_a", b_col="id_b").select(
        F.col("doc_id").alias("id"), "cluster_id"
    )
    core_cc = cores.join(cc, "id", "left").select(
        "id", F.coalesce("cluster_id", "id").alias("cluster_id")
    )
    border = (
        sym.join(core_cc.withColumnRenamed("id", "id_b"), "id_b")
        .join(cores.withColumnRenamed("id", "id_a"), "id_a", "left_anti")
        .groupBy(F.col("id_a").alias("id"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    sizes = (
        core_cc.select("cluster_id", F.lit(1).alias("is_core"))
        .unionByName(border.select("cluster_id", F.lit(0).alias("is_core")))
        .groupBy("cluster_id")
        .agg(
            F.sum("is_core").alias("n_core"),
            F.sum(1 - F.col("is_core")).alias("n_border"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )
    w = Window.orderBy(F.desc("n_total"), "cluster_id")
    return (
        sizes.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= DBSCAN_TOP)
        .select("pos", "cluster_id", "n_core", "n_border", "n_total")
    )


DBSCAN_SQL = f"""
WITH RECURSIVE pts AS ({_POINTS_SQL}),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM pts a JOIN pts b ON a.id < b.id
  WHERE GREATEST(ABS(a.lat_micro - b.lat_micro), ABS(a.lon_micro - b.lon_micro))
        <= {DBSCAN_RADIUS_MICRO}
),
sym AS (
  SELECT id_a, id_b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs
),
cores AS (
  SELECT id_a AS id FROM sym GROUP BY id_a HAVING COUNT(*) >= {DBSCAN_MIN_NEIGHBORS}
),
core_edges AS (
  SELECT s.id_a, s.id_b FROM sym s
  JOIN cores c1 ON s.id_a = c1.id JOIN cores c2 ON s.id_b = c2.id
),
reach(a, b) AS (
  SELECT id AS a, id AS b FROM cores
  UNION
  SELECT r.a, e.id_b AS b FROM reach r JOIN core_edges e ON r.b = e.id_a
),
core_cc AS (SELECT a AS id, MIN(b) AS cluster_id FROM reach GROUP BY a),
border AS (
  SELECT s.id_a AS id, MIN(cc.cluster_id) AS cluster_id
  FROM sym s JOIN core_cc cc ON s.id_b = cc.id
  WHERE s.id_a NOT IN (SELECT id FROM cores)
  GROUP BY s.id_a
),
members AS (
  SELECT cluster_id, 1 AS is_core FROM core_cc
  UNION ALL SELECT cluster_id, 0 AS is_core FROM border
),
sizes AS (
  SELECT cluster_id,
         CAST(SUM(is_core) AS BIGINT) AS n_core,
         CAST(SUM(1 - is_core) AS BIGINT) AS n_border,
         COUNT(*) AS n_total
  FROM members GROUP BY cluster_id
)
SELECT pos, cluster_id, n_core, n_border, n_total FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_total DESC, cluster_id) AS pos FROM sizes
) WHERE pos <= {DBSCAN_TOP}
"""

register(
    QuerySpec(
        "dbscan_grid_clusters",
        dbscan_grid_clusters,
        DBSCAN_SQL,
        doc="DBSCAN via grid ε-pairs + star connected components + border attach",
        cites="spatial family; composes operators/geo.py with operators/dedup.py CC",
        tags=("geo", "graph", "dedup"),
    )
)
