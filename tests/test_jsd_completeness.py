"""source_token_js_divergence absent-token completeness (round-9 fix).

The round-8 advisor finding: the per-(source, tok) stats rows cover only
tokens a source CONTAINS, so the q-side KL(Q||M) sum missed the q·ln 2
terms of rest-of-corpus tokens absent from the source — two
disjoint-vocabulary sources reported ~ln2/2 instead of the true
JSD = ln 2. Both engines now add the closed-form correction
(B − Σ_observed b)·ln 2; these tests pin the analytic anchors on a tiny
synthetic corpus in BOTH engines (the oracle harness separately pins
engine-vs-engine equality on the real tables)."""

from __future__ import annotations

import math

import pytest

import duckdb

from analytics_data_platform_spark.queries import all_queries

LN2_MICRO = 693147  # the metric's upper bound in micro-nats


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, text, "en", src, len(text)) for i, (src, text) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _jsd_by_source(spark, sf_dir):
    fn = all_queries()["source_token_js_divergence"].fn
    return {r["source"]: r["jsd_micro"] for r in fn(spark, sf_dir).collect()}


def test_disjoint_vocabularies_report_full_ln2(spark, tmp_path):
    sf_dir = _write_documents(
        spark,
        tmp_path,
        [("s1", "aa bb cc aa"), ("s2", "xx yy zz zz")],
    )
    got = _jsd_by_source(spark, sf_dir)
    for src in ("s1", "s2"):
        assert got[src] == pytest.approx(LN2_MICRO, abs=2), (
            f"{src}: disjoint vocab must reach the JSD bound ln 2, got {got[src]}"
        )


def test_identical_distributions_report_zero(spark, tmp_path):
    sf_dir = _write_documents(
        spark, tmp_path, [("s1", "aa bb aa bb"), ("s2", "aa bb aa bb")]
    )
    got = _jsd_by_source(spark, sf_dir)
    for src in ("s1", "s2"):
        assert got[src] == pytest.approx(0.0, abs=2)


def test_partial_overlap_matches_direct_formula(spark, tmp_path):
    # s1 = {a: 2, b: 2}; s2 = {b: 2, c: 2} — hand-computable JSD
    rows = [("s1", "a b a b"), ("s2", "b c b c")]
    sf_dir = _write_documents(spark, tmp_path, rows)

    def kl(p, q):
        m = {t: (p.get(t, 0.0) + q.get(t, 0.0)) / 2 for t in set(p) | set(q)}
        return sum(pi * math.log(pi / m[t]) for t, pi in p.items() if pi > 0)

    p = {"a": 0.5, "b": 0.5}
    q = {"b": 0.5, "c": 0.5}
    expected = 1e6 * (kl(p, q) + kl(q, p)) / 2
    got = _jsd_by_source(spark, sf_dir)
    for src in ("s1", "s2"):  # symmetric corpus → same value both ways
        assert got[src] == pytest.approx(expected, abs=3)


def test_oracle_sql_applies_the_same_correction(spark, tmp_path):
    """The DuckDB mirror must carry the identical closed-form term — a
    one-engine fix would keep parity green while both stay wrong (the
    exact failure mode the advisor flagged)."""
    sf_dir = _write_documents(
        spark, tmp_path, [("s1", "aa bb cc aa"), ("s2", "xx yy zz zz")]
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    sql = all_queries()["source_token_js_divergence"].oracle
    got = {r[0]: r[3] for r in con.sql(sql).fetchall()}
    for src in ("s1", "s2"):
        assert got[src] == pytest.approx(LN2_MICRO, abs=2)
