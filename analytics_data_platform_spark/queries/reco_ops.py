"""Recommendation queries: co-purchase collaborative filtering.

Complements the association-rules query (analytics_ops) with the
vector-space formulation: each item is the set of its buyers, item-item
similarity is the cosine of those (binary) vectors, computed purely from
integer set sizes — |A∩B| / sqrt(|A|·|B|) — so the only float op is one
sqrt+divide on exact integers, rounded for the oracle hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table

CF_TOP_ITEMS = 100  # model the most-purchased items
CF_TOP_PAIRS = 50


def item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over co-purchases: cosine
    similarity of buyer sets for the 100 most-purchased parts.

    Plan shape for scale: the item universe is first restricted to the
    top-N by distinct buyers (two-phase top-k is unnecessary — the
    aggregate is |parts|-sized); the (customer, item) incidence list is
    then semi-joined to that dimension and self-joined **on customer**,
    so pair-generation work is Σ_c k_c² with k_c ≤ N — bounded per
    customer by the model size, never |parts|². The top-N dimension
    broadcasts; the one real shuffle is the customer-keyed self-join.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    bought = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    buyers = bought.groupBy("p").agg(F.count(F.lit(1)).alias("n_buyers"))
    w_top = Window.orderBy(F.desc("n_buyers"), "p")
    top = (
        buyers.withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") <= CF_TOP_ITEMS)
        .select("p", "n_buyers")
    )
    incid = bought.join(F.broadcast(top.select("p")), "p")
    a, b = incid.alias("a"), incid.alias("b")
    co = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("co_buyers"))
    )
    n1 = top.select(F.col("p").alias("p1"), F.col("n_buyers").alias("n1"))
    n2 = top.select(F.col("p").alias("p2"), F.col("n_buyers").alias("n2"))
    scored = (
        co.join(F.broadcast(n1), "p1")
        .join(F.broadcast(n2), "p2")
        .select(
            "p1",
            "p2",
            "co_buyers",
            F.round(
                F.col("co_buyers") / F.sqrt(F.col("n1") * F.col("n2")), 6
            ).alias("cosine"),
        )
    )
    w = Window.orderBy(F.desc("cosine"), "p1", "p2")
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= CF_TOP_PAIRS)
        .select("pos", "p1", "p2", "co_buyers", "cosine")
    )


ITEM_COSINE_SQL = f"""
WITH bought AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
buyers AS (SELECT p, COUNT(*) AS n_buyers FROM bought GROUP BY p),
top AS (
  SELECT p, n_buyers FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY n_buyers DESC, p) AS rn FROM buyers
  ) WHERE rn <= {CF_TOP_ITEMS}
),
incid AS (SELECT b.c, b.p FROM bought b JOIN top t ON b.p = t.p),
co AS (
  SELECT a.p AS p1, b.p AS p2, COUNT(*) AS co_buyers
  FROM incid a JOIN incid b ON a.c = b.c AND a.p < b.p
  GROUP BY a.p, b.p
),
scored AS (
  SELECT co.p1, co.p2, CAST(co.co_buyers AS BIGINT) AS co_buyers,
         ROUND(co.co_buyers / SQRT(CAST(t1.n_buyers * t2.n_buyers AS DOUBLE)), 6) AS cosine
  FROM co JOIN top t1 ON co.p1 = t1.p JOIN top t2 ON co.p2 = t2.p
)
SELECT pos, p1, p2, co_buyers, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, p1, p2) AS pos FROM scored
) WHERE pos <= {CF_TOP_PAIRS}
"""

register(
    QuerySpec(
        "item_item_cosine",
        item_item_cosine,
        ITEM_COSINE_SQL,
        doc="item-item collaborative filtering (buyer-set cosine, top co-purchase pairs)",
        cites="recommendation family; complements association_rules_parts",
        tags=("reco", "join"),
    )
)
