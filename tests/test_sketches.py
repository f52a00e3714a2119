"""Approximate aggregation sketches (HLL count-distinct, quantile
sketch): error-bounded against exact answers. These are the built-in
Spark sketches a 100 TB pipeline reaches for when exact distinct/rank
shuffles are too expensive — no DuckDB oracle (the sketch algorithms
differ across engines by design), so the bound IS the contract."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from analytics_data_platform_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_hll_count_distinct_within_rsd(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    approx = o.select(F.approx_count_distinct("o_custkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06  # 3x the configured rsd


def test_approx_percentile_within_rank_error(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = o.count()
    exact_median = o.select(F.expr("percentile(o_totalprice, 0.5)")).collect()[0][0]
    approx_median = o.select(
        F.percentile_approx("o_totalprice", 0.5, 1000)
    ).collect()[0][0]
    # rank error <= n/accuracy; translate to a generous value tolerance
    window = (
        o.where(F.col("o_totalprice").between(exact_median * 0.95, exact_median * 1.05)).count()
    )
    assert window > 0
    assert abs(approx_median - exact_median) / exact_median < 0.05


# --- portable md5 sketches (operators.sketches) ----------------------------

from analytics_data_platform_spark.operators import sketches as S
from analytics_data_platform_spark.queries.sketch_ops import (
    _doc_bigrams,
    bloom_contamination,
    cms_term_counts,
    hll_distinct_bigrams,
)

SMOKE = "/root/testdata/sf0.001"


def test_portable_hll_error_bound(spark):
    """m=128 HLL has theoretical rsd ≈ 1.04/√m ≈ 9.2%; allow 3σ."""
    rows = hll_distinct_bigrams(spark, SMOKE).collect()
    assert rows
    for r in rows:
        assert r.rel_err <= 0.30, (r.source, r.rel_err)


def test_cms_never_undercounts(spark):
    rows = cms_term_counts(spark, SMOKE).collect()
    by_term = {r.term: r for r in rows}
    for r in rows:
        assert r.est_count >= r.true_count, r
    assert by_term["zz-absent"].true_count == 0  # absent probe present in output


def test_bloom_has_no_false_negatives(spark):
    """Probing the eval set against its own filter must flag everything."""
    bg = _doc_bigrams(spark, SMOKE)
    eval_bg = bg.where(F.col("source") == "src0").select("bg").distinct()
    bloom = S.bloom_build(eval_bg, F.col("bg"))
    verdicts = S.bloom_maybe_contains(eval_bg, "bg", bloom).collect()
    assert verdicts and all(v.maybe_member for v in verdicts)


def test_bloom_contamination_rates_bounded(spark):
    rows = bloom_contamination(spark, SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.contamination <= 1.0
        assert r.n_flagged <= r.n_bigrams


def test_hll_register_merge_equals_direct_union(spark):
    """Merged per-source registers == registers built over the union
    (max is associative) — the rollup-without-raw-data property."""
    from analytics_data_platform_spark.queries.sketch_ops import _doc_bigrams

    bg = _doc_bigrams(spark, SMOKE).where(F.col("source").isin("src0", "src1", "src2"))
    per_source = S.hll_registers(bg, F.col("bg"), "source")
    merged = {
        (r.idx): r.mj
        for r in per_source.groupBy("idx").agg(F.max("mj").alias("mj")).collect()
    }
    direct = {
        (r.idx): r.mj
        for r in S.hll_registers(
            bg.select(F.lit("all").alias("g"), "bg"), F.col("bg"), "g"
        ).collect()
    }
    assert merged == direct and merged


def test_ddsketch_within_relative_accuracy(spark):
    """Midpoint estimate of a γ-binned sketch is within (γ-1)/(γ+1) ≈ 1%
    of the true value by construction; assert with slack."""
    from analytics_data_platform_spark.queries.sketch_ops import (
        ddsketch_price_quantiles,
    )

    rows = ddsketch_price_quantiles(spark, SMOKE).collect()
    assert len(rows) == 15  # 5 priorities x 3 quantiles
    for r in rows:
        assert r.rel_err <= 0.02, (r.o_orderpriority, r.quantile, r.rel_err)


class TestMisraGriesCandidates:
    """mg_candidates (operators/sketches.py): the superset guarantee that
    makes the two-phase heavy-hitter query deterministic must hold under
    ADVERSARIAL partitioning — any layout, same final answer."""

    def _true_heavy_hitters(self, spark, docs, k):
        toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).where(
            F.col("tok") != ""
        )
        n = toks.count()
        rows = toks.groupBy("tok").count().collect()
        return {r["tok"] for r in rows if r["count"] * k > n}

    @pytest.mark.parametrize("nparts", [1, 3, 17])
    def test_candidate_superset_under_any_partitioning(self, spark, sf_dir, nparts):
        from analytics_data_platform_spark.operators.sketches import mg_candidates

        docs = load_table(spark, sf_dir, "documents")
        truth = self._true_heavy_hitters(spark, docs, k=30)
        assert truth  # the corpus has heavy hitters at every SF
        arrays = docs.select(F.split("text", " ").alias("t")).repartition(nparts)
        cand = {r["token"] for r in mg_candidates(arrays).collect()}
        assert truth <= cand
        # the sketch PRUNES: candidates stay sketch-sized, not vocab-sized
        assert len(cand) <= 64 * nparts

    def test_skewed_single_doc_partitioning(self, spark, sf_dir):
        """Range-partitioning by doc_id concentrates near-duplicate docs —
        the layout most likely to starve a counter — and the guarantee
        must still hold."""
        from analytics_data_platform_spark.operators.sketches import mg_candidates

        docs = load_table(spark, sf_dir, "documents")
        truth = self._true_heavy_hitters(spark, docs, k=30)
        arrays = docs.repartitionByRange(5, "doc_id").select(
            F.split("text", " ").alias("t")
        )
        cand = {r["token"] for r in mg_candidates(arrays).collect()}
        assert truth <= cand
