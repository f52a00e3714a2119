"""End-to-end corpus-prep DAG: raw documents through quality filter,
exact + near dedup, and sequence packing, with data tests and TableIO
materialization — the operators composing as a pipeline."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
import pytest

from analytics_data_platform_spark.operators.dedup import fingerprint_col
from analytics_data_platform_spark.plans.corpus_prep import PACK_BUDGET, dag
from analytics_data_platform_spark.tables.io import TableIO

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ns = f"corpus_{uuid.uuid4().hex[:6]}"
    io = TableIO(spark)
    try:
        yield dag.run(
            spark,
            sources={("landing", "documents"): docs},
            target_namespace=ns,
            io=io,
        )
    finally:
        io.drop_namespace(ns)


def test_pipeline_monotone_survival(built):
    stg = built["stg_documents"].count()
    clean = built["clean_documents"].count()
    kept = built["dedup_documents"].count()
    assert stg >= clean >= kept > 0
    assert kept < stg  # the corpus HAS planted duplicates; some must go


def test_no_exact_duplicates_survive(built):
    kept = built["dedup_documents"]
    n = kept.count()
    n_fp = kept.select(fingerprint_col("text").alias("fp")).distinct().count()
    assert n == n_fp


def test_packs_respect_budget_except_oversized_docs(built):
    packs = (
        built["packed_sequences"]
        .groupBy("source", "pack_id")
        .agg(F.sum("n_tokens").alias("tok"), F.count("*").alias("n_docs"))
    )
    over = packs.where((F.col("tok") > PACK_BUDGET) & (F.col("n_docs") > 1)).count()
    assert over == 0  # only single oversized docs may exceed the budget
    assert packs.count() > 0


def test_stats_mart_reconciles(built):
    stats = {r.source: r for r in built["mart_corpus_stats"].collect()}
    kept_total = built["dedup_documents"].count()
    assert sum(r.kept_docs for r in stats.values()) == kept_total
    for r in stats.values():
        assert r.raw_docs >= r.kept_docs
        if r.n_packs:
            assert 0 < r.avg_fill <= 1.5  # oversized singleton packs can exceed 1


class TestWinnowingGuarantee:
    """The MOSS coverage proof behind queries/corpus_ops.py::
    winnowing_fingerprints: any shared token run of length ≥ W+K-1 MUST
    produce at least one shared fingerprint — sampling without recall
    loss above the threshold."""

    def _fingerprints(self, spark, texts):
        from analytics_data_platform_spark.queries.corpus_ops import (
            WIN_K,
            WIN_W,
        )
        from analytics_data_platform_spark.functions.expr import bind
        from analytics_data_platform_spark.operators.sketches import h32

        d = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        fps_arr = bind(
            F.split("text", " "),
            lambda t: F.when(
                F.size(t) >= WIN_K + WIN_W - 1,
                bind(
                    F.transform(
                        F.sequence(F.lit(1), F.size(t) - (WIN_K - 1)),
                        lambda i: h32(F.concat_ws(" ", F.slice(t, i, WIN_K))),
                    ),
                    lambda h: F.array_distinct(
                        F.transform(
                            F.sequence(F.lit(1), F.size(h) - (WIN_W - 1)),
                            lambda j: F.array_min(F.slice(h, j, WIN_W)),
                        )
                    ),
                ),
            ),
        )
        rows = d.select("doc_id", F.explode(fps_arr).alias("fp")).collect()
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(r["doc_id"], set()).add(r["fp"])
        return out

    def test_shared_run_yields_shared_fingerprint(self, spark):
        # 8 shared tokens (= W+K-1) embedded in otherwise-disjoint docs
        shared = "q w e r t y u i"
        a = "a1 a2 a3 " + shared + " a4 a5 a6"
        b = "b1 b2 b3 b4 " + shared + " b5"
        fps = self._fingerprints(spark, [a, b])
        assert fps[0] & fps[1], "coverage guarantee violated"

    def test_disjoint_docs_share_nothing(self, spark):
        fps = self._fingerprints(
            spark,
            ["a1 a2 a3 a4 a5 a6 a7 a8 a9 a10", "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"],
        )
        assert not (fps[0] & fps[1])

    def test_sampling_actually_prunes(self, spark):
        # a long doc keeps far fewer fingerprints than k-grams: expected
        # density ~2/(W+1) = 1/3, allow slack but require real pruning
        text = " ".join(f"t{i % 97}" for i in range(400))
        fps = self._fingerprints(spark, [text])
        n_grams = 400 - 3
        assert len(fps[0]) < 0.6 * n_grams
