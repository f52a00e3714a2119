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


# --- sequential covisitation: bought X, next order contains Y -------------

NEXT_TOP = 25


def covisitation_next_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential co-purchase: for consecutive order pairs of one customer,
    count X→Y transitions (part X in order r, part Y in order r+1) and the
    confidence support/|baskets containing X that have a successor|.

    Plan shape for scale: orders are rank-numbered per customer (one
    customer-keyed window), and the transition join is an EQUI-join on
    (custkey, rank)=(custkey, rank+1) — adjacent baskets only, so pair
    volume is Σ |basket_r|·|basket_r+1|, never |orders|². The final top-k
    is a bounded sort of the (x, y) aggregate."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.withColumn("r", F.row_number().over(w))
    basket = (
        li.join(ranked, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), "r", F.col("l_partkey").alias("p"))
        .distinct()
        # referenced three times (transitions, successors, denominators) —
        # materialize once instead of re-running the join+distinct per use
        .localCheckpoint(eager=False)
    )
    nxt = basket.select(F.col("c"), (F.col("r") - 1).alias("r"), F.col("p").alias("p_next"))
    trans = basket.join(nxt, ["c", "r"]).where(F.col("p") != F.col("p_next"))
    support = trans.groupBy(F.col("p").alias("x"), F.col("p_next").alias("y")).agg(
        F.count(F.lit(1)).alias("support")
    )
    # baskets containing x that have at least one successor basket
    has_next = basket.join(nxt.select("c", "r").distinct(), ["c", "r"]).groupBy(
        F.col("p").alias("x")
    ).agg(F.count(F.lit(1)).alias("n_x"))
    scored = support.join(has_next, "x").select(
        "x", "y", "support", F.round(F.col("support") / F.col("n_x"), 6).alias("confidence")
    )
    w_top = Window.orderBy(F.desc("support"), "x", "y")
    return (
        scored.withColumn("pos", F.row_number().over(w_top))
        .where(F.col("pos") <= NEXT_TOP)
        .select("pos", "x", "y", "support", "confidence")
    )


COVISIT_SQL = f"""
WITH ranked AS (
  SELECT o_orderkey, o_custkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS r
  FROM orders
),
basket AS (
  SELECT DISTINCT o_custkey AS c, r, l_partkey AS p
  FROM lineitem JOIN ranked ON l_orderkey = o_orderkey
),
nxt AS (SELECT c, r - 1 AS r, p AS p_next FROM basket),
trans AS (
  SELECT b.p, n.p_next FROM basket b JOIN nxt n ON b.c = n.c AND b.r = n.r
  WHERE b.p <> n.p_next
),
support AS (SELECT p AS x, p_next AS y, COUNT(*) AS support FROM trans GROUP BY 1, 2),
has_next AS (
  SELECT b.p AS x, COUNT(*) AS n_x
  FROM basket b JOIN (SELECT DISTINCT c, r FROM nxt) s ON b.c = s.c AND b.r = s.r
  GROUP BY b.p
)
SELECT pos, x, y, support, confidence FROM (
  SELECT s.x, s.y, s.support,
         ROUND(s.support / CAST(h.n_x AS DOUBLE), 6) AS confidence,
         ROW_NUMBER() OVER (ORDER BY s.support DESC, s.x, s.y) AS pos
  FROM support s JOIN has_next h ON s.x = h.x
) WHERE pos <= {NEXT_TOP}
"""

register(
    QuerySpec(
        "covisitation_next_part",
        covisitation_next_part,
        COVISIT_SQL,
        doc="sequential co-purchase (X then Y in the next order) with confidence",
        cites="recommendation family; adjacent-basket equi-join, no cross-order blowup",
        tags=("reco", "window", "join"),
    )
)


# --- user-user collaborative filtering over rare-item profiles ------------

RARE_MAX_BUYERS = 20  # blocking keys must be selective, IDF-style
UU_TOP_PAIRS = 30


def user_user_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-user similarity: Jaccard over each customer's RARE-part
    profile (parts with ≤ {RARE_MAX_BUYERS} buyers). Restricting to rare
    items is the IDF insight — popular items carry no signal — AND the
    scale guarantee: the pair-generating self-join is keyed on part with
    a hard per-key fan-out bound, so candidate volume is
    Σ_p |buyers_p|² ≤ {RARE_MAX_BUYERS}·|incidence|, never |customers|².
    Jaccard is exact integer |∩| / (|A|+|B|-|∩|)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    bought = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    rare = (
        bought.groupBy("p").agg(F.count(F.lit(1)).alias("n_buyers"))
        .where(F.col("n_buyers") <= RARE_MAX_BUYERS)
        .select("p")
    )
    prof = bought.join(F.broadcast(rare), "p").localCheckpoint(eager=False)
    sizes = prof.groupBy("c").agg(F.count(F.lit(1)).alias("n"))
    a, b = prof.alias("a"), prof.alias("b")
    inter = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.c") < F.col("b.c")))
        .groupBy(F.col("a.c").alias("c1"), F.col("b.c").alias("c2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    n1 = sizes.select(F.col("c").alias("c1"), F.col("n").alias("n1"))
    n2 = sizes.select(F.col("c").alias("c2"), F.col("n").alias("n2"))
    scored = (
        inter.join(n1, "c1").join(n2, "c2")
        .select(
            "c1", "c2", "inter",
            F.round(F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")), 6).alias("jaccard"),
        )
    )
    w_top = Window.orderBy(F.desc("jaccard"), F.desc("inter"), "c1", "c2")
    return (
        scored.withColumn("pos", F.row_number().over(w_top))
        .where(F.col("pos") <= UU_TOP_PAIRS)
        .select("pos", "c1", "c2", "inter", "jaccard")
    )


UU_SQL = f"""
WITH bought AS (
  SELECT DISTINCT o_custkey AS c, l_partkey AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
rare AS (
  SELECT p FROM bought GROUP BY p HAVING COUNT(*) <= {RARE_MAX_BUYERS}
),
prof AS (SELECT b.c, b.p FROM bought b JOIN rare r ON b.p = r.p),
sizes AS (SELECT c, COUNT(*) AS n FROM prof GROUP BY c),
inter AS (
  SELECT a.c AS c1, b.c AS c2, COUNT(*) AS inter
  FROM prof a JOIN prof b ON a.p = b.p AND a.c < b.c
  GROUP BY 1, 2
)
SELECT pos, c1, c2, inter, jaccard FROM (
  SELECT i.c1, i.c2, i.inter,
         ROUND(i.inter / CAST(s1.n + s2.n - i.inter AS DOUBLE), 6) AS jaccard,
         ROW_NUMBER() OVER (ORDER BY ROUND(i.inter / CAST(s1.n + s2.n - i.inter AS DOUBLE), 6) DESC,
                            i.inter DESC, i.c1, i.c2) AS pos
  FROM inter i JOIN sizes s1 ON i.c1 = s1.c JOIN sizes s2 ON i.c2 = s2.c
) WHERE pos <= {UU_TOP_PAIRS}
"""

register(
    QuerySpec(
        "user_user_jaccard",
        user_user_jaccard,
        UU_SQL,
        doc="user-user CF: exact Jaccard over rare-item profiles (bounded blocking join)",
        cites="recommendation family; rare-key blocking bounds Σ buyers² fan-out",
        tags=("reco", "join", "dedup"),
    )
)


# --- frequent 3-itemsets (a-priori ladder over baskets) --------------------

TRIPLE_TOP = 15


def frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets: parts bought together in one order, the
    a-priori step above association_rules_parts' pairs. Triple
    generation is a double self-join keyed on the ORDER with ordered
    part keys (p1<p2<p3) — work is Σ C(basket,3), bounded by
    lines-per-order (≤7 ⇒ ≤35 per order), never |parts|³. Support
    counts are exact integers; top-15 with full-key tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b, c = li.alias("a"), li.alias("b"), li.alias("c")
    triples = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .join(c, (F.col("a.o") == F.col("c.o")) & (F.col("b.p") < F.col("c.p")))
        .groupBy(
            F.col("a.p").alias("p1"), F.col("b.p").alias("p2"), F.col("c.p").alias("p3")
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    w = Window.orderBy(F.desc("support"), "p1", "p2", "p3")
    return (
        triples.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= TRIPLE_TOP)
        .select("pos", "p1", "p2", "p3", "support")
    )


TRIPLES_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
triples AS (
  SELECT a.p AS p1, b.p AS p2, c.p AS p3, COUNT(*) AS support
  FROM li a
  JOIN li b ON a.o = b.o AND a.p < b.p
  JOIN li c ON a.o = c.o AND b.p < c.p
  GROUP BY 1, 2, 3
)
SELECT pos, p1, p2, p3, support FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY support DESC, p1, p2, p3) AS pos FROM triples
) WHERE pos <= {TRIPLE_TOP}
"""

register(
    QuerySpec(
        "frequent_triples",
        frequent_triples,
        TRIPLES_SQL,
        doc="frequent 3-itemsets from order baskets (a-priori ladder above pairs)",
        cites="market-basket family; order-keyed joins bound work to C(basket,3)",
        tags=("reco", "join", "agg"),
    )
)
