"""Approximate large-scale operators exposed to the driver (rows-only
checks — MinHash/SimHash/LSH/IVF are not ANSI-SQL-expressible, so no
DuckDB oracle; their exactness-adjacent behavior is pinned by
tests/test_operators.py recall and golden assertions instead)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.operators import dedup, similarity
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table


def near_dup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard ≥ 0.5."""
    d = load_table(spark, sf_dir, "documents")
    cands = dedup.minhash_lsh_candidates(d, num_hashes=32, bands=16)
    return (
        dedup.exact_jaccard_pairs(d, cands)
        .where(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


register(
    QuerySpec(
        "near_dup_minhash",
        near_dup_minhash,
        None,
        doc="MinHash-LSH near-dup candidates + exact-Jaccard verification",
        cites="training-data ops: MinHash+LSH dedup (shingle→minhash→band→bucket-join)",
        tags=("dedup", "approx"),
    )
)


def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = dedup.simhash_signatures(d)
    return dedup.simhash_near_pairs(sigs, max_hamming=3)


register(
    QuerySpec(
        "simhash_near_dups",
        simhash_near_dups,
        None,
        doc="SimHash 64-bit near-dup pairs via 16-bit banding",
        cites="training-data ops: SimHash dedup",
        tags=("dedup", "approx"),
    )
)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (the scale path of ann_cosine_topk)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = similarity.lsh_topk(e, q, k=10, n_bits=8, dim=64)
    return out.select("q_id", "vec_id", F.round("cos_sim", 4).alias("cos_sim"), "rank")


register(
    QuerySpec(
        "ann_lsh_topk",
        ann_lsh_topk,
        None,
        doc="random-hyperplane LSH approximate top-k",
        cites="training-data ops: similarity search scale path",
        tags=("vector", "approx"),
    )
)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (coarse-quantized) approximate top-k with nprobe=4."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cents = similarity.train_ivf_centroids(e, n_centroids=8, max_iter=5)
    out = similarity.ivf_topk(e, q, cents, k=10, nprobe=4)
    return out.select("q_id", "vec_id", F.round("cos_sim", 4).alias("cos_sim"), "rank")


register(
    QuerySpec(
        "ann_ivf_topk",
        ann_ivf_topk,
        None,
        doc="IVF coarse-quantized approximate top-k",
        cites="training-data ops: similarity search (IVF partition-pruned path)",
        tags=("vector", "approx"),
    )
)
