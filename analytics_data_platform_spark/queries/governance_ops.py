"""Data-governance queries: k-anonymity audit, Laplace-noised release.

Privacy review is part of operating an analytics platform over user
data. Two standard mechanisms, formulated engine-exactly:

- the **k-anonymity audit** histograms quasi-identifier group sizes —
  pure integer counts, one aggregation pass over the QI grouping;
- the **noisy-counts release** applies the Laplace mechanism with noise
  derived from an md5-seeded uniform (inverse-CDF transform). A
  deterministic seed is NOT differential privacy — real releases need a
  fresh RNG — but it exercises the exact production plan shape while
  keeping the output hash-verifiable, the same trade every sampling
  operator in this repo makes (`rand()` would also break retry/replay
  determinism on a real cluster).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table

K_THRESHOLD = 5


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-size histogram over the customer quasi-identifier
    (market segment, nation, balance bracket): how many QI groups — and
    how many ROWS — sit below re-identification thresholds. Bracket
    edges are integer floor-division so the QI is engine-exact.
    """
    c = load_table(spark, sf_dir, "customer")
    qi = c.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_bracket"),
    ).agg(F.count(F.lit(1)).alias("gsize"))
    bucket = (
        F.when(F.col("gsize") == 1, "1 (unique)")
        .when(F.col("gsize") < K_THRESHOLD, "2-4 (small)")
        .when(F.col("gsize") < 10, "5-9")
        .otherwise("10+")
    )
    return qi.groupBy(bucket.alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("gsize").alias("n_rows"),
    )


K_ANON_SQL = f"""
WITH qi AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bracket,
         COUNT(*) AS gsize
  FROM customer GROUP BY 1, 2, 3
)
SELECT CASE WHEN gsize = 1 THEN '1 (unique)'
            WHEN gsize < {K_THRESHOLD} THEN '2-4 (small)'
            WHEN gsize < 10 THEN '5-9'
            ELSE '10+' END AS k_bucket,
       COUNT(*) AS n_groups,
       CAST(SUM(gsize) AS BIGINT) AS n_rows
FROM qi GROUP BY 1
"""

register(
    QuerySpec(
        "k_anonymity_audit",
        k_anonymity_audit,
        K_ANON_SQL,
        doc="quasi-identifier group-size histogram (re-identification risk audit)",
        cites="data-governance family",
        tags=("governance", "agg"),
    )
)


DP_EPSILON = 0.1  # scale b = 1/eps = 10


def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism release of per-segment customer counts
    (sensitivity 1, ε=0.1): noise = -b·sign(u-½)·ln(1-2|u-½|) with u an
    md5-derived uniform on the group key. The inverse-CDF transform and
    the uniform's exact rational construction ((h+0.5)/2^32) are
    identical in both engines; see the module docstring for the
    deterministic-seed caveat.
    """
    c = load_table(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("true_count"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("dp-seed-1:"), F.col("c_mktsegment"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-10.0)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return counts.select(
        "c_mktsegment",
        "true_count",
        F.round(noise, 4).alias("laplace_noise"),
        F.round(F.col("true_count") + noise, 2).alias("released_count"),
    )


DP_SQL = """
WITH counts AS (
  SELECT c_mktsegment, COUNT(*) AS true_count FROM customer GROUP BY c_mktsegment
),
seeded AS (
  SELECT c_mktsegment, true_count,
         (('0x' || substr(md5('dp-seed-1:' || c_mktsegment), 1, 8))::BIGINT + 0.5)
           / 4294967296.0 AS u
  FROM counts
)
SELECT c_mktsegment, true_count,
       ROUND(-10.0 * SIGN(u - 0.5) * LN(1.0 - 2.0 * ABS(u - 0.5)), 4) AS laplace_noise,
       ROUND(true_count + (-10.0 * SIGN(u - 0.5) * LN(1.0 - 2.0 * ABS(u - 0.5))), 2)
         AS released_count
FROM seeded
"""

register(
    QuerySpec(
        "dp_noisy_counts",
        dp_noisy_counts,
        DP_SQL,
        doc="Laplace-mechanism noisy counts (md5-seeded inverse-CDF, hash-verifiable)",
        cites="data-governance family; deterministic-seed caveat documented",
        tags=("governance", "agg"),
    )
)


L_THRESHOLD = 3


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit, the k-anonymity companion: within each
    quasi-identifier group (nation × balance bracket) count the DISTINCT
    values of the sensitive attribute (market segment). A group can be
    large (k-anonymous) yet still leak — if everyone in it shares one
    segment, membership reveals the segment. Reports the l histogram and
    how many individuals sit in under-diverse (l < 3) groups."""
    c = load_table(spark, sf_dir, "customer")
    qi = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_bracket"),
    ).agg(
        F.count(F.lit(1)).alias("gsize"),
        F.count_distinct("c_mktsegment").alias("l_val"),
    )
    bucket = (
        F.when(F.col("l_val") == 1, "1 (homogeneous)")
        .when(F.col("l_val") < L_THRESHOLD, "2 (weak)")
        .otherwise("3+ (diverse)")
    )
    return qi.groupBy(bucket.alias("l_bucket")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("gsize").alias("n_rows"),
        F.min("l_val").alias("min_l"),
        F.max("l_val").alias("max_l"),
    )


L_DIV_SQL = f"""
WITH qi AS (
  SELECT c_nationkey,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bracket,
         COUNT(*) AS gsize,
         COUNT(DISTINCT c_mktsegment) AS l_val
  FROM customer GROUP BY 1, 2
)
SELECT CASE WHEN l_val = 1 THEN '1 (homogeneous)'
            WHEN l_val < {L_THRESHOLD} THEN '2 (weak)'
            ELSE '3+ (diverse)' END AS l_bucket,
       COUNT(*) AS n_groups,
       CAST(SUM(gsize) AS BIGINT) AS n_rows,
       CAST(MIN(l_val) AS BIGINT) AS min_l,
       CAST(MAX(l_val) AS BIGINT) AS max_l
FROM qi GROUP BY 1
"""

register(
    QuerySpec(
        "l_diversity_audit",
        l_diversity_audit,
        L_DIV_SQL,
        doc="l-diversity of the sensitive attribute within quasi-identifier groups",
        cites="data-governance family; companion to k_anonymity_audit",
        tags=("governance", "agg"),
    )
)
