"""SemDeDup operator form: bounded sub-split under adversarial skew
(r4 verdict item #6 — one hot cluster must not re-introduce the n² term)."""

from __future__ import annotations

import pyspark.sql.functions as F

from analytics_data_platform_spark.operators.semdedup import (
    quantize_vectors,
    semdedup,
)
from analytics_data_platform_spark.sources.testdata import load_table


def _skewed_vectors(spark, n=400):
    """50% of vectors pile into one tight cone (the hot cluster); the rest
    spread across distinct directions. 4-dim is enough to exercise the
    integer-cosine machinery."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            # hot cone: tiny deterministic jitter around (1, 0, 0, 0)
            rows.append((i, [1.0, 0.001 * (i % 7), 0.0, 0.0]))
        else:
            g = i % 5
            base = [0.0, 0.0, 0.0, 0.0]
            base[g % 4] = -1.0 if g % 2 else 1.0
            base[(g + 1) % 4] = 0.3 + 0.01 * (i % 11)
            rows.append((i, base))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_subsplit_bounds_cluster_sizes(spark):
    vecs = quantize_vectors(_skewed_vectors(spark))
    out = semdedup(vecs, k=4, max_cluster_size=25).cache()
    sizes = out.groupBy("cluster").count().collect()
    assert max(r["count"] for r in sizes) <= 25, sorted(
        (r["count"] for r in sizes), reverse=True
    )[:5]
    # every vector is accounted for exactly once
    assert out.count() == 400
    assert out.select("vec_id").distinct().count() == 400
    # the hot cone members are mutual near-dups: within each bounded
    # sub-cluster everything but the min-id representative drops
    hot = out.where(F.col("vec_id") % 2 == 0)
    dropped = hot.where("is_dropped").count()
    kept = hot.where("NOT is_dropped").count()
    n_hot_clusters = hot.select("cluster").distinct().count()
    assert kept == n_hot_clusters  # exactly one keeper per sub-cluster
    assert dropped == 200 - n_hot_clusters
    out.unpersist()


def test_subsplit_pair_work_is_bounded(spark):
    """Σ min(c, max)² stays ~linear: with max=25 over 400 rows the pair
    join can touch at most ceil(400/25) * 25² = 10k pairs vs 200² = 40k
    for the unsplit hot cluster alone."""
    vecs = quantize_vectors(_skewed_vectors(spark))
    out = semdedup(vecs, k=4, max_cluster_size=25)
    sizes = [r["count"] for r in out.groupBy("cluster").count().collect()]
    pair_work = sum(c * c for c in sizes)
    assert pair_work <= sum(sizes) * 25  # Σc² ≤ n·max when all c ≤ max


def test_unsplit_matches_query_form_semantics(spark, sf_dir):
    """max_cluster_size=None reproduces the flat query-form clustering on
    the real embeddings table: same per-cluster drop counts as
    semantic_dedup_clusters (cluster ids differ: path string vs centroid
    id — compare the multiset of (size, dropped) pairs)."""
    from analytics_data_platform_spark.queries import all_queries

    e = load_table(spark, sf_dir, "embeddings")
    ours = (
        semdedup(quantize_vectors(e), k=8)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("is_dropped").cast("long")).alias("n_dropped"),
        )
    )
    ours_sizes = sorted(
        (r.n_vecs, r.n_dropped) for r in ours.collect()
    )
    ref = all_queries()["semantic_dedup_clusters"].fn(spark, sf_dir)
    ref_sizes = sorted((r.n_vecs, r.n_dropped) for r in ref.collect())
    assert ours_sizes == ref_sizes


def test_degenerate_identical_vectors_salted(spark):
    """Thousands of bit-identical vectors: re-clustering cannot separate
    them, so the last-resort salt must still bound the cluster and the
    min-id keeper survives per salt bucket."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(100)]
    vecs = quantize_vectors(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    )
    out = semdedup(vecs, k=4, max_cluster_size=10, max_split_rounds=2).cache()
    sizes = [r["count"] for r in out.groupBy("cluster").count().collect()]
    assert max(sizes) <= 10
    # per bucket exactly one keeper
    keepers = out.where("NOT is_dropped").count()
    assert keepers == len(sizes)
    out.unpersist()
