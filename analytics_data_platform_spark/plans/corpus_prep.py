"""Corpus-preparation model DAG: raw documents → training sequences.

The training-data twin of plans/facility_ops.py — the same dbt-style
model chain (staging → clean → marts, data tests attached), but running
the repo's scale operators end-to-end the way a pre-training data
pipeline would:

    stg_documents       quality features per doc (tokens, score, lang)
    clean_documents     quality floor + exact dedup (md5 fingerprint)
    dedup_documents     MinHash-LSH near-dup removal (Jaccard ≥ 0.8)
    packed_sequences    greedy first-fit packing into 256-token packs
    mart_corpus_stats   per-source audit: survival, tokens, pack fill

Every stage is one of the tested operators (functions/text,
operators/dedup, operators/packing); this module just wires them with
dependencies and data tests, proving they compose as a pipeline, not
only as isolated registry queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.functions import text as T
from analytics_data_platform_spark.operators.dedup import dedup_exact, dedup_minhash
from analytics_data_platform_spark.operators.packing import pack_greedy
from analytics_data_platform_spark.plans.dag import (
    Model,
    Refs,
    TransformDag,
    not_null,
    unique,
)

PACK_BUDGET = 256
MIN_QUALITY = 0.2

dag = TransformDag()


@dag.model(
    "stg_documents",
    sources=(("landing", "documents"),),
    tests=[not_null("doc_id"), unique("doc_id"), not_null("source")],
)
def stg_documents(spark: SparkSession, r: Refs) -> DataFrame:
    d = r.source("landing", "documents").where(F.length(F.trim("text")) > 0)
    return d.select(
        "doc_id",
        "source",
        "text",
        T.token_count("text").alias("n_tokens"),
        F.round(T.quality_score("text"), 4).alias("quality"),
        T.lang_guess("text").alias("lang_guess"),
    )


@dag.model(
    "clean_documents",
    deps=("stg_documents",),
    tests=[not_null("doc_id"), unique("doc_id")],
)
def clean_documents(spark: SparkSession, r: Refs) -> DataFrame:
    """Quality floor, then exact dedup (keep min doc_id per fingerprint)."""
    d = r.ref("stg_documents").where(F.col("quality") >= MIN_QUALITY)
    return dedup_exact(d)


@dag.model(
    "dedup_documents",
    deps=("clean_documents",),
    materialization="table",
    tests=[not_null("doc_id"), unique("doc_id")],
)
def dedup_documents(spark: SparkSession, r: Refs) -> DataFrame:
    """Near-dup removal: MinHash-LSH candidates, exact Jaccard ≥ 0.8."""
    return dedup_minhash(r.ref("clean_documents"), threshold=0.8)


@dag.model(
    "packed_sequences",
    deps=("dedup_documents",),
    materialization="table",
    partition={"source": "identity"},
    tests=[not_null("doc_id"), not_null("pack_id")],
)
def packed_sequences(spark: SparkSession, r: Refs) -> DataFrame:
    slim = r.ref("dedup_documents").select("source", "doc_id", "n_tokens")
    return pack_greedy(
        slim,
        group_cols=["source"],
        order_col="doc_id",
        token_col="n_tokens",
        budget=PACK_BUDGET,
    )


@dag.model(
    "mart_corpus_stats",
    deps=("stg_documents", "dedup_documents", "packed_sequences"),
    materialization="table",
    tests=[not_null("source"), unique("source")],
)
def mart_corpus_stats(spark: SparkSession, r: Refs) -> DataFrame:
    """Per-source pipeline audit: survival counts, token totals, packing
    efficiency (mean pack fill vs the 256-token budget)."""
    raw = r.ref("stg_documents").groupBy("source").agg(
        F.count("*").alias("raw_docs"), F.sum("n_tokens").alias("raw_tokens")
    )
    kept = r.ref("dedup_documents").groupBy("source").agg(
        F.count("*").alias("kept_docs"), F.sum("n_tokens").alias("kept_tokens")
    )
    packs = (
        r.ref("packed_sequences")
        .groupBy("source", "pack_id")
        .agg(F.sum("n_tokens").alias("pack_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_packs"),
            F.round(F.avg("pack_tokens") / PACK_BUDGET, 4).alias("avg_fill"),
        )
    )
    return (
        raw.join(kept, "source", "left")
        .join(packs, "source", "left")
        .select(
            "source",
            "raw_docs",
            "raw_tokens",
            F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
            F.coalesce("n_packs", F.lit(0)).alias("n_packs"),
            "avg_fill",
        )
    )
