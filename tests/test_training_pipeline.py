"""End-to-end training-corpus pipeline: stage conservation contract
(pipelines/training_corpus.py — the composition of oracle-verified stages
into the artifact a user actually ships)."""

from __future__ import annotations

import pyspark.sql.functions as F

from analytics_data_platform_spark.pipelines.training_corpus import (
    PACK_BUDGET,
    build_training_corpus,
)


def test_pipeline_stage_conservation(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    manifest = {m.stage: m.n_docs for m in build_training_corpus(spark, sf_dir, out)}

    # monotone filtering: clean <= raw, exact-dedup <= clean
    assert manifest["clean"] <= manifest["raw"]
    assert 0 < manifest["exact_dedup"] <= manifest["clean"]
    # the three splits partition the deduped corpus exactly
    split_total = sum(v for k, v in manifest.items() if k.startswith("split:"))
    assert split_total == manifest["exact_dedup"]
    assert manifest.get("split:train", 0) > manifest.get("split:test", 0)

    shards = spark.read.parquet(f"{out}/shards")
    # every doc appears exactly once
    assert shards.count() == shards.select("doc_id").distinct().count()
    # pack token conservation: no (split, source, pack) exceeds the budget
    # unless it is a single oversized doc (greedy first-fit invariant)
    per_pack = (
        shards.select(
            "split",
            "source",
            "pack_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        )
        .groupBy("split", "source", "pack_id")
        .agg(F.sum("n_tokens").alias("tok"), F.count(F.lit(1)).alias("n_docs"))
    )
    bad = per_pack.where(
        (F.col("tok") > PACK_BUDGET) & (F.col("n_docs") > 1)
    ).count()
    assert bad == 0
    # the manifest parquet round-trips
    mdf = {r.stage: r.n_docs for r in spark.read.parquet(f"{out}/manifest").collect()}
    assert mdf == manifest


def test_pipeline_split_has_no_near_dup_leaks(spark, sf_dir, tmp_path):
    """The pipeline's split must uphold the leakage_safe_split guarantee on
    its own output: no verified near-dup pair straddles splits."""
    from analytics_data_platform_spark.operators import dedup

    out = str(tmp_path / "corpus2")
    build_training_corpus(spark, sf_dir, out)
    shards = spark.read.parquet(f"{out}/shards").select("doc_id", "split", "text")
    cands = dedup.minhash_lsh_candidates_portable(shards)
    pairs = dedup.exact_jaccard_pairs(shards, cands).where(F.col("jaccard") >= 0.5)
    sa = shards.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    sb = shards.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    leaks = (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .where(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert leaks == 0
