"""Invariant tests for the round-5 query additions (exactness is covered by
the registry-wide oracle sweep; these pin semantic contracts)."""

from __future__ import annotations

import pyspark.sql.functions as F

from analytics_data_platform_spark.queries import all_queries
from analytics_data_platform_spark.sources.testdata import load_table


def _run(spark, sf_dir, name):
    return all_queries()[name].fn(spark, sf_dir)


def test_leakage_safe_split_has_zero_grouped_leaks(spark, sf_dir):
    rows = _run(spark, sf_dir, "leakage_safe_split").collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    d = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == d.count()
    for r in rows:
        # the whole point: a cluster never straddles splits
        assert r.leaked_pairs_grouped == 0
        assert r.n_clusters <= r.n_docs
    # the naive per-doc split leaks on this corpus (it has near-dups), so
    # the audit column demonstrates the improvement it claims
    assert rows[0].leaked_pairs_naive >= 0


def test_dsir_weights_rank_target_lang_higher(spark, sf_dir):
    """DSIR with target=en must put en docs at the top of the weight
    ranking (the corpus's en slice IS the target distribution)."""
    rows = _run(spark, sf_dir, "dsir_importance_weights").collect()
    assert len(rows) == 20
    en = sum(1 for r in rows if r.lang == "en")
    assert en >= 15, f"only {en}/20 top-weighted docs are en"
    # weights are sorted descending with doc_id tiebreak
    for a, b in zip(rows, rows[1:]):
        assert (a.w_micro, -a.doc_id) >= (b.w_micro, -b.doc_id)


def test_nb_classifier_beats_chance_on_diagonal(spark, sf_dir):
    rows = _run(spark, sf_dir, "nb_lang_classifier_eval").collect()
    total = sum(r.n_docs for r in rows)
    diag = sum(r.n_docs for r in rows if r.true_lang == r.pred_lang)
    n_langs = len({r.true_lang for r in rows})
    assert n_langs >= 2
    # resubstitution NB on its own training corpus must beat chance
    assert diag / total > 1.0 / n_langs, (diag, total, n_langs)


def test_lm_bigram_xent_positive_and_partitioned(spark, sf_dir):
    rows = _run(spark, sf_dir, "lm_bigram_xent_by_lang").collect()
    assert rows
    for r in rows:
        assert r.xent_nats > 0  # -ln P of a proper distribution
        assert r.n_bigrams > 0
        # micro-sum consistency: xent_nats is the single division
        assert abs(r.xent_micro_sum / (r.n_bigrams * 1_000_000) - r.xent_nats) < 1e-5


def test_ndcg_bounds_and_consistency(spark, sf_dir):
    rows = _run(spark, sf_dir, "ndcg_at_10_ann").collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.ndcg_at_10 <= 1.0
        assert r.dcg_micro <= r.idcg_micro
        assert 0 <= r.n_rel_topk <= 10
        assert r.n_rel_total >= r.n_rel_topk


def test_c4_gopher_flags_bounded_by_doc_counts(spark, sf_dir):
    rows = _run(spark, sf_dir, "c4_gopher_rule_stats").collect()
    rule_cols = [c for c in rows[0].asDict() if c.startswith("r_")]
    assert len(rule_cols) == 8
    for r in rows:
        d = r.asDict()
        for c in rule_cols:
            assert 0 <= d[c] <= r.n_docs
        assert 0 <= r.pass_all <= min(d[c] for c in rule_cols)
