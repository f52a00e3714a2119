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
from pyspark.sql import DataFrame, SparkSession

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
