"""End-to-end training-corpus build: the pipeline a user of this engine
actually runs, composed from the registry's own stages —

    raw documents
      → C4/Gopher structural cleaning      (queries/corpus_ops rules)
      → exact dedup                        (operators/dedup, min-id keeper)
      → near-dup clustering + LEAKAGE-SAFE
        train/val/test assignment          (LSH → CC → component-hash split)
      → greedy sequence packing per split  (operators/packing)
      → parquet shards + a stage manifest

Every stage is the already-oracle-verified formulation; this module is the
composition plus the conservation contract between stages (each stage's
output counts reconcile with the previous stage's — asserted in
tests/test_training_pipeline.py). At 100 TB each arrow is the same plan
shape the per-query SCALE.md entries argue for; nothing here collects data
to the driver except the ≤ |stages| manifest rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.operators import dedup
from analytics_data_platform_spark.operators.packing import pack_greedy
from analytics_data_platform_spark.queries.corpus_ops import c4_core_pass
from analytics_data_platform_spark.queries.scale_ops import leak_split_of
from analytics_data_platform_spark.queries.training_ops import PACK_BUDGET
from analytics_data_platform_spark.sources.testdata import load_table


@dataclass
class StageCount:
    stage: str
    n_docs: int


def _c4_core_clean(d: DataFrame) -> DataFrame:
    """pass_core of c4_gopher_rule_stats — the SHARED predicate, so a rule
    change in the audited query changes the pipeline with it."""
    return d.where(c4_core_pass("text"))


def _leakage_safe_assign(docs: DataFrame) -> DataFrame:
    """(doc_id, split): near-dup components hash to one split (the
    leakage_safe_split rule; singletons hash on their own id)."""
    cands = dedup.minhash_lsh_candidates_portable(docs)
    pairs = dedup.exact_jaccard_pairs(docs, cands).where(F.col("jaccard") >= 0.5)
    cc = dedup.cluster_duplicates_star(
        pairs.select("id_a", "id_b"), a_col="id_a", b_col="id_b"
    )
    rep = docs.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("rep")
    )
    return rep.select("doc_id", leak_split_of(F.col("rep")).alias("split"))


def build_training_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> list[StageCount]:
    """Run the full pipeline; write per-split packed shards under
    ``out_dir`` and return the stage manifest (also written as parquet)."""
    raw = load_table(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    # ONE pass for the raw + clean counts (the predicate rides the same
    # scan), instead of two full corpus jobs
    counts = raw.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(c4_core_pass("text").cast("long")).alias("n_clean"),
    ).collect()[0]
    manifest: list[StageCount] = [
        StageCount("raw", counts.n_raw),
        StageCount("clean", counts.n_clean),
    ]

    clean = _c4_core_clean(raw)
    # persisted: reused by the count, the split-assignment LSH pass, and
    # the final write — without this the dedup shuffle re-executes 3×
    exact = dedup.dedup_exact(clean).persist()
    manifest.append(StageCount("exact_dedup", exact.count()))

    # the (doc_id, split) assignment has TWO consumers (the pack input and
    # the shard join) — persist the NARROW frame so the LSH→CC assignment
    # pipeline computes once per build instead of once per consumer
    assign = _leakage_safe_assign(exact).persist()
    try:
        assigned = exact.join(assign, "doc_id")
        packed = pack_greedy(
            assigned.select(
                "split",
                "source",
                "doc_id",
                F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
            ),
            group_cols=["split", "source"],
            order_col="doc_id",
            token_col="n_tokens",
            budget=PACK_BUDGET,
        )
        shards = assigned.join(
            packed.select("doc_id", "pack_id"), "doc_id"
        ).select("split", "source", "pack_id", "doc_id", "text", "lang", "n_chars")
        shards.write.mode("overwrite").partitionBy("split").parquet(
            f"{out_dir}/shards"
        )
        # per-split counts from the cached key-sized assignment, not a
        # re-read of the full written text shards (a 100 TB output scan
        # whose only purpose was three counts — guide §1.2). Identical by
        # construction: assign has one row per exact-dedup doc and the
        # pack join is 1:1 (greedy packing covers every input row) — the
        # very equalities test_pipeline_stage_conservation pins against
        # the written output.
        for row in (
            assign.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
        ):
            manifest.append(StageCount(f"split:{row.split}", row.n))

        mdf = spark.createDataFrame(
            [(m.stage, m.n_docs) for m in manifest], "stage string, n_docs long"
        )
        mdf.write.mode("overwrite").parquet(f"{out_dir}/manifest")
    finally:
        assign.unpersist()
        exact.unpersist()
    return manifest
