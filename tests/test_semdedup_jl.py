"""Invariant tests for the round-4 training-data additions (exactness is
covered by the registry-wide oracle sweep; these pin the semantic
contracts and layout-independence)."""

from __future__ import annotations

import pyspark.sql.functions as F

from analytics_data_platform_spark.queries import all_queries
from analytics_data_platform_spark.sources.testdata import load_table


def _run(spark, sf_dir, name):
    return all_queries()[name].fn(spark, sf_dir)


def test_semantic_dedup_keeps_a_representative(spark, sf_dir):
    rows = _run(spark, sf_dir, "semantic_dedup_clusters").collect()
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    assert sum(r.n_vecs for r in rows) == n  # assignment is a partition
    for r in rows:
        # the min-id neighbor rule can never drop a whole cluster: the
        # smallest id in any near-dup chain survives
        assert 0 <= r.n_dropped < r.n_vecs
        if r.n_dropped == 0:
            assert r.dropped_id_sum == 0


def test_semantic_dedup_layout_independent(spark, sf_dir):
    """Same result under a hostile input layout (prime partition count):
    the argmin tie-breaks and integer similarity tests must not depend on
    row order anywhere."""
    base = {r.cid: r for r in _run(spark, sf_dir, "semantic_dedup_clusters").collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = {
            r.cid: r for r in _run(spark, sf_dir, "semantic_dedup_clusters").collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again


def test_jl_energy_concentrates(spark, sf_dir):
    rows = _run(spark, sf_dir, "jl_projection_distortion").collect()
    assert rows
    for r in rows:
        # E[energy_ratio] = 1; per-label averages concentrate well inside
        # [0.5, 1.5] at d'=8 over >= a handful of vectors
        assert 0.3 < r.energy_ratio < 1.7, r
        assert r.min_ratio <= r.energy_ratio <= r.max_ratio


def test_boilerplate_mask_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "boilerplate_gram_mask").collect()
    d = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == d.count()
    for r in rows:
        assert 0 <= r.docs_masked <= r.n_docs
        assert 0 <= r.masked_tokens <= r.total_tokens
        assert 0.0 <= r.mask_rate <= 1.0


def test_spend_bands_partition_customers(spark, sf_dir):
    rows = _run(spark, sf_dir, "spend_percentile_bands").collect()
    o = load_table(spark, sf_dir, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust
    assert {r.band for r in rows} <= set(range(20))
    by_band = sorted(rows, key=lambda r: r.band)
    # bands are ordered by spend: each band's hi must not exceed the next
    # band's lo (percent_rank bands are contiguous in score order)
    for a, b in zip(by_band, by_band[1:]):
        assert a.hi_spend <= b.lo_spend


def test_pq_adc_topk_invariants(spark, sf_dir):
    from analytics_data_platform_spark.queries.vector_ops import PQ_NQ, PQ_TOPK

    rows = _run(spark, sf_dir, "pq_adc_topk").collect()
    # exactly top-k per query vector
    assert len(rows) == PQ_NQ * PQ_TOPK
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == set(range(PQ_NQ))
    for q_rows in by_q.values():
        q_rows.sort(key=lambda r: r.pos)
        assert [r.pos for r in q_rows] == list(range(1, PQ_TOPK + 1))
        # ADC distance is monotone non-decreasing in rank position
        for a, b in zip(q_rows, q_rows[1:]):
            assert a.adc <= b.adc
        # a query vector is in the corpus: its own code-distance should
        # rank it first with the minimal ADC score for its own codes
        assert all(r.adc >= 0 for r in q_rows)


def test_spend_bands_single_customer_is_band_zero(spark, sf_dir):
    """n == 1 edge: percent_rank is 0/0 — the guard must pin band 0, not
    engine-dependent NaN coercion (ADVICE r4)."""
    from analytics_data_platform_spark.queries.extended import spend_percentile_bands
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") == 1)
        assert o.count() > 0
        o.write.parquet(os.path.join(tmp, "orders.parquet"))
        rows = spend_percentile_bands(spark, tmp).collect()
    assert len(rows) == 1
    assert rows[0].band == 0
    assert rows[0].n_customers == 1
