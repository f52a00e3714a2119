"""Focused guard for the r10 dl-carry optimization (OPTIMIZATION_r10.md
change 10): `_term_stats` / `_scored_posting_rows` attach the BM25 doc
length dl as a per-row `size(split(text, ' '))` carried through the tf
aggregation, replacing the old per-doc second shuffle + tf⋈dl join.

The equivalence claim is that dl == sum(tf) per doc for EVERY text shape
(explode emits exactly `size` rows, including empty-string tokens from
repeated/leading separators) and that the folded corpus stats equal the
old per-doc formulation bit-for-bit. This test pins both against the
reference two-shuffle formulation on a corpus of adversarial shapes:
null text (absent from both), empty text (one '' token), repeated /
leading / trailing spaces, and a single-token doc."""

from __future__ import annotations

import pyspark.sql.functions as F


DOCS = [
    (1, "table hash merge"),
    (2, ""),                      # one empty token: dl = 1
    (3, "a  b"),                  # double space: dl = 3 ('a', '', 'b')
    (4, " lead"),                 # leading space: dl = 2 ('', 'lead')
    (5, "trail "),                # trailing space: dl = 2
    (6, None),                    # null text: absent from postings AND stats
    (7, "solo"),
    (8, "table table table a"),   # tf > 1
]


def _reference_two_shuffle(d):
    """The pre-r10 formulation: tf groupBy, then dl = per-doc sum(tf),
    joined back; stats = (count, avg) over the per-doc frame."""
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    joined = tf.join(dl, "doc_id")
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    return joined, stats


def test_scored_posting_rows_match_two_shuffle_reference(spark):
    from analytics_data_platform_spark.queries.search_ops import (
        _scored_posting_rows,
    )

    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, stats = _scored_posting_rows(d)
    ref_rows, ref_stats = _reference_two_shuffle(d)

    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"], r["bucket"])
        for r in postings.collect()
    }
    want = {(r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in ref_rows.collect()}
    assert set(got) == set(want), "posting row set diverged from the reference"
    for k, (tf, dl, _bucket) in got.items():
        assert (tf, dl) == want[k], f"tf/dl diverged for {k}"
    # null-text doc contributes nothing
    assert not any(doc_id == 6 for doc_id, _ in got)

    s_got, s_want = stats.collect()[0], ref_stats.collect()[0]
    assert s_got["n_docs"] == s_want["n_docs"]
    # bit-exact, not approx: the serve-side score hash depends on it
    assert float(s_got["avgdl"]).hex() == float(s_want["avgdl"]).hex()


def test_term_stats_match_two_shuffle_reference(spark):
    from analytics_data_platform_spark.queries.search_ops import _term_stats

    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    tf, dfreq, stats = _term_stats(d)
    ref_rows, ref_stats = _reference_two_shuffle(d)

    got = {(r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in tf.collect()}
    want = {(r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in ref_rows.collect()}
    assert got == want

    # dfreq unchanged by the carry: one row per term, count of docs
    df_got = {r["term"]: r["df"] for r in dfreq.collect()}
    for (_, term), _v in want.items():
        assert term in df_got
    s_got, s_want = stats.collect()[0], ref_stats.collect()[0]
    assert s_got["n_docs"] == s_want["n_docs"]
    assert float(s_got["avgdl"]).hex() == float(s_want["avgdl"]).hex()
