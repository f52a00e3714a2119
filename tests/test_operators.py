"""Tests for the large-scale operators: dedup families, similarity search,
multimodal plumbing."""

from __future__ import annotations

import math

import numpy as np
import pytest
import pyspark.sql.functions as F

from analytics_data_platform_spark.operators import dedup, multimodal, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "The quick brown fox jumps over the lazy dog near the river bank today!"),  # exact after norm
        (3, "The quick brown fox jumps over the lazy dog near the river bend today"),  # near-dup
        (4, "Completely different content about spark shuffle partitions and joins here"),
        (5, "Another unrelated document mentioning embeddings vectors and cosine scores"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_keeps_min_id(spark, docs):
    out = dedup.dedup_exact(docs)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 3, 4, 5}  # 2 is an exact normalized dup of 1


def test_minhash_lsh_finds_near_dups(spark, docs):
    cands = dedup.minhash_lsh_candidates(docs, num_hashes=32, bands=16)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup surfaces
    assert (4, 5) not in pairs

    verified = dedup.exact_jaccard_pairs(docs, cands)
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert j[(1, 2)] == 1.0  # identical after normalization


def test_dedup_minhash_drops_duplicates(spark, docs):
    out = dedup.dedup_minhash(docs, threshold=0.5, num_hashes=32, bands=16)
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 in ids and 4 in ids and 5 in ids
    assert 2 not in ids  # dup of 1
    assert 3 not in ids  # near-dup of 1 at jaccard>0.5


def test_simhash_hamming(spark, docs):
    sigs = dedup.simhash_signatures(docs)
    pairs = dedup.simhash_near_pairs(sigs, max_hamming=0)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got.get((1, 2)) == 0  # identical normalized text → same signature
    assert (4, 5) not in got


def test_simhash_near_pairs_on_long_docs(spark):
    """With realistic doc lengths, a small edit keeps hamming tiny and the
    16-bit banding surfaces the pair without an all-pairs scan."""
    base = (
        "spark shuffles data between stages using hash partitioning and the "
        "adaptive query engine coalesces small partitions after each exchange "
        "broadcast joins avoid the shuffle when one side fits in memory "
    ) * 6
    edited = base.replace("coalesces", "merges", 1)
    other = (
        "completely unrelated text about neutron beamline monitors and gaussian "
        "peak fitting over time of flight histograms with proton charge filters "
    ) * 6
    docs = spark.createDataFrame(
        [(1, base), (2, edited), (3, other)], "doc_id long, text string"
    )
    sigs = dedup.simhash_signatures(docs)
    pairs = dedup.simhash_near_pairs(sigs, max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert (1, 3) not in got and (2, 3) not in got


def test_cluster_duplicates_transitive(spark):
    """A~B, B~C, D~E chains cluster under the min id; isolated pairs too."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.cluster_duplicates(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_dedup_minhash_clustered_transitive_chain(spark):
    """B is a near-dup of A, C of B (A↔C may never pair) — only A survives
    the chain, plus the unrelated doc."""
    base = (
        "spark executes declarative plans with adaptive query execution and "
        "whole stage codegen for columnar batches over parquet data files "
    ) * 4
    b = base.replace("adaptive", "dynamic", 1)
    c = b.replace("columnar", "vector", 1)
    docs = spark.createDataFrame(
        [(1, base), (2, b), (3, c), (9, "totally unrelated text about neutron beamlines and monitors")],
        "doc_id long, text string",
    )
    out = dedup.dedup_minhash_clustered(docs, threshold=0.7, num_hashes=32, bands=16)
    assert {r["doc_id"] for r in out.collect()} == {1, 9}


def test_fnv_hash64_deterministic():
    assert dedup.hash64("spark") == dedup.hash64("spark")
    assert dedup.hash64("spark") != dedup.hash64("sparks")
    assert -(2**63) <= dedup.hash64("x") < 2**63


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    rng = np.random.RandomState(7)
    centers = rng.randn(4, 16) * 3
    rows = []
    for i in range(200):
        c = i % 4
        v = centers[c] + rng.randn(16) * 0.3
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _queries_from(corpus):
    return (
        corpus.where(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )


def test_brute_force_topk_self_cluster(spark, clustered_vectors):
    q = _queries_from(clustered_vectors)
    out = similarity.brute_force_topk(clustered_vectors, q, k=10)
    rows = out.collect()
    assert len(rows) == 40
    # neighbors of query i should be from the same cluster (id % 4 == i)
    for r in rows:
        assert r["vec_id"] % 4 == r["q_id"] % 4


def test_lsh_topk_recall(spark, clustered_vectors):
    q = _queries_from(clustered_vectors)
    exact = similarity.brute_force_topk(clustered_vectors, q, k=10)
    approx = similarity.lsh_topk(clustered_vectors, q, k=10, n_bits=6, dim=16)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_topk_recall(spark, clustered_vectors):
    q = _queries_from(clustered_vectors)
    cents = similarity.train_ivf_centroids(clustered_vectors, n_centroids=4, max_iter=8)
    assert len(cents) == 4 and len(cents[0]) == 16
    exact = similarity.brute_force_topk(clustered_vectors, q, k=10)
    approx = similarity.ivf_topk(clustered_vectors, q, cents, k=10, nprobe=2)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"IVF recall too low: {recall}"  # well-separated clusters


def _scored(corpus, q):
    from analytics_data_platform_spark.functions.vectors import cosine

    return corpus.join(F.broadcast(q), F.col("vec_id") != F.col("q_id")).select(
        "q_id", "vec_id", cosine("q_emb", "embedding").alias("cos_sim")
    )


def test_two_phase_topk_matches_naive_window(spark, clustered_vectors):
    from pyspark.sql import Window

    corpus = clustered_vectors.repartition(8)
    q = _queries_from(corpus)
    scored = _scored(corpus, q)
    two = similarity.topk_per_query(scored, 7).select("q_id", "vec_id", "cos_sim", "rank")
    w = Window.partitionBy("q_id").orderBy(F.desc_nulls_last("cos_sim"), F.asc("vec_id"))
    naive = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 7)
        .select("q_id", "vec_id", "cos_sim", "rank")
    )
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, naive.collect()))


def test_local_topk_bounds_global_window_input(spark, clustered_vectors):
    """The scale guarantee: phase 2's window input is ≤ k × numPartitions
    rows per query — never the full scored candidate set."""
    nparts, k, nq = 8, 5, 4
    corpus = clustered_vectors.repartition(nparts)
    q = _queries_from(corpus)
    scored = _scored(corpus, q)
    pruned = similarity.local_topk(scored, k)
    n_pruned = pruned.count()
    assert n_pruned <= k * nparts * nq
    assert n_pruned < scored.count()  # actually pruned, not a pass-through
    # phase-1 pruning must preserve the true global top-k
    e = {(r["q_id"], r["vec_id"]) for r in similarity.brute_force_topk(corpus, q, k=k).collect()}
    p = {(r["q_id"], r["vec_id"]) for r in pruned.collect()}
    assert e <= p


def test_assign_centroid_udf_matches_literal_path(spark, clustered_vectors):
    cents = similarity.train_ivf_centroids(clustered_vectors, n_centroids=8, max_iter=8)
    lit = clustered_vectors.select(
        "vec_id", similarity.assign_centroid_col("embedding", cents).alias("cell")
    )
    udf = clustered_vectors.select(
        "vec_id", similarity.assign_centroid_udf(cents)(F.col("embedding")).alias("cell")
    )
    lm = {r["vec_id"]: r["cell"] for r in lit.collect()}
    um = {r["vec_id"]: r["cell"] for r in udf.collect()}
    assert lm == um


@pytest.fixture(scope="module")
def big_vectors(spark):
    rng = np.random.RandomState(13)
    centers = rng.randn(8, 16) * 4
    rows = []
    for i in range(2000):
        c = i % 8
        v = centers[c] + rng.randn(16) * 0.3
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_large_nlist_udf_path_recall_and_plan_size(spark, big_vectors):
    """nlist=256 must take the pandas_udf assignment path: plan stays O(1)
    in n_centroids (no literal-array blowup) and recall holds."""
    q = (
        big_vectors.where(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    cents = similarity.train_ivf_centroids(big_vectors, n_centroids=256, max_iter=5)
    assert len(cents) == 256
    approx = similarity.ivf_topk(big_vectors, q, cents, k=10, nprobe=64)
    exact = similarity.brute_force_topk(big_vectors, q, k=10)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"IVF(nlist=256) recall too low: {recall}"
    # plan-size sanity: the 256×16 centroid matrix must NOT be inlined as
    # literal expression nodes (that plan is O(nlist·dim) and blows up the
    # analyzer at Faiss-scale nlist)
    plan = approx._jdf.queryExecution().simpleString()
    assert len(plan) < 100_000, f"plan unexpectedly large: {len(plan)} chars"
    assert "ArrowEvalPython" in approx._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytes([0x89, 0x50, 0x4E, 0x47] + [7] * 100), "image/png", None, None, 3500),
        (2, bytes(range(256)), "audio/wav", None, None, 2000),
        (3, b"", "image/png", None, None, 0),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_attach_media_metadata(spark, media):
    out = {r["media_id"]: r for r in multimodal.attach_media_metadata(media).collect()}
    assert out[1]["n_bytes"] == 104
    assert out[1]["header_hex"].startswith("89504E47")
    assert out[3]["n_bytes"] == 0


def test_byte_features(spark, media):
    out = {r["media_id"]: r for r in multimodal.extract_byte_features(media).collect()}
    # media 2 is uniform over 256 byte values → entropy exactly 8 bits
    assert math.isclose(out[2]["entropy"], 8.0, abs_tol=1e-9)
    assert math.isclose(out[2]["byte_mean"], 127.5, abs_tol=1e-9)
    assert out[1]["entropy"] < 1.0  # almost-constant payload
    assert out[3]["n_bytes"] == 0 and out[3]["entropy"] == 0.0


def test_decode_media_default_raises(spark, media):
    with pytest.raises(Exception, match="no media codec available"):
        multimodal.decode_media(media).collect()


def test_decode_media_with_injected_codec(spark, media):
    def fake_codec(payload: bytes, media_type: str) -> dict:
        return {"width": len(payload), "height": 2, "duration_ms": None}

    out = {r["media_id"]: r for r in multimodal.decode_media(media, decoder=fake_codec).collect()}
    assert out[1]["width"] == 104 and out[1]["height"] == 2
    assert out[2]["width"] == 256


def test_sample_frames(spark, media):
    out = multimodal.sample_frames(media, every_ms=1000).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert sorted(by_id[1]) == [0, 1000, 2000]  # 3500ms → 3 frames
    assert sorted(by_id[2]) == [0, 1000]
    assert 3 not in by_id  # zero duration → no frames


def test_cluster_star_matches_propagation(spark):
    """large-star/small-star CC must produce the identical contract as
    min-label propagation (min member id = cluster id)."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    prop = {r["doc_id"]: r["cluster_id"] for r in dedup.cluster_duplicates(pairs).collect()}
    star = {r["doc_id"]: r["cluster_id"] for r in dedup.cluster_duplicates_star(pairs).collect()}
    assert star == prop == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_cluster_star_deep_path_logarithmic(spark):
    """A 64-node path has diameter 63: min-label propagation needs ~63
    rounds, large/small-star must finish in ≤ 8 (O(log n)) without a
    non-convergence warning."""
    import warnings as w

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    with w.catch_warnings():
        w.simplefilter("error", RuntimeWarning)
        got = {r["doc_id"]: r["cluster_id"] for r in
               dedup.cluster_duplicates_star(pairs, max_iter=8).collect()}
    assert got == {i: 0 for i in range(64)}


def test_cluster_duplicates_warns_on_nonconvergence(spark):
    """Silent exit after max_iter used to split deep chains with no
    signal; now it must warn."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = dedup.cluster_duplicates(pairs, max_iter=2).collect()
    assert len(out) == 12  # every node still labeled, just possibly split


def test_lsh_multiprobe_recall_dominates_single_probe(spark, clustered_vectors):
    """Probing the least-confident-bit neighbor buckets must never lose
    candidates vs single-probe and should raise recall on this fixture."""
    q = _queries_from(clustered_vectors)
    exact = similarity.brute_force_topk(clustered_vectors, q, k=10)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    single = similarity.lsh_topk(clustered_vectors, q, k=10, n_bits=6, dim=16)
    multi = similarity.lsh_topk_multiprobe(
        clustered_vectors, q, k=10, n_bits=6, n_probes=2, dim=16
    )
    rs = len(e & {(r["q_id"], r["vec_id"]) for r in single.collect()}) / len(e)
    rm = len(e & {(r["q_id"], r["vec_id"]) for r in multi.collect()}) / len(e)
    assert rm >= rs, f"multi-probe recall {rm} < single-probe {rs}"
    assert rm >= 0.6, f"multi-probe recall too low: {rm}"


def test_arrow_mapside_prune_matches_jvm_prune(spark, clustered_vectors):
    """local_topk_mapside (bounded-state Arrow pruner, k rows per
    partition per query pre-shuffle) must produce the identical final
    top-k as the JVM packed-array pruner."""
    corpus = clustered_vectors.repartition(8)
    q = _queries_from(corpus)
    scored = _scored(corpus, q)
    jvm = similarity.topk_per_query(scored, 7, prune="jvm")
    arrow = similarity.topk_per_query(scored, 7, prune="arrow")
    assert sorted(map(tuple, jvm.collect())) == sorted(map(tuple, arrow.collect()))
    # the map-side pruner's output itself is bounded by k per (partition, q)
    pruned = similarity.local_topk_mapside(scored, 7)
    assert pruned.count() <= 7 * 8 * 4
    with pytest.raises(ValueError, match="prune"):
        similarity.topk_per_query(scored, 7, prune="bogus")


def test_pq_adc_topk_recall_and_compression(spark, clustered_vectors):
    """PQ/ADC: codes are m small ints (the compression contract) and
    ADC top-k recalls most of the exact neighbors on clustered data."""
    books = similarity.train_pq_codebooks(
        clustered_vectors, m=4, k=8, dim=16, max_iter=8
    )
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 4

    coded = clustered_vectors.select(
        "vec_id", similarity.pq_encode_col("embedding", books).alias("codes")
    ).collect()
    for r in coded:
        assert len(r.codes) == 4
        assert all(0 <= c < 8 for c in r.codes)

    q = _queries_from(clustered_vectors)
    queries = [(r.q_id, list(r.q_emb)) for r in q.collect()]
    approx = similarity.pq_topk(clustered_vectors, queries, books, k=10)
    exact = similarity.brute_force_topk(clustered_vectors, q, k=10)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"PQ/ADC recall too low: {recall}"  # measured 0.825 (L2-refine vs cosine-exact)
    # cluster sanity: ADC neighbors come from the query's own cluster
    same = sum(1 for (qid, vid) in a if vid % 4 == qid % 4)
    assert same / len(a) >= 0.9


def test_ivfpq_topk_composition_recall(spark, clustered_vectors):
    """IVF-PQ (cell prune -> ADC -> exact refine) keeps high recall when
    the probes cover the query's cluster."""
    cents = similarity.train_ivf_centroids(clustered_vectors, n_centroids=4, max_iter=8)
    books = similarity.train_pq_codebooks(clustered_vectors, m=4, k=8, dim=16, max_iter=8)
    q = _queries_from(clustered_vectors)
    queries = [(r.q_id, list(r.q_emb)) for r in q.collect()]
    approx = similarity.ivfpq_topk(
        clustered_vectors, queries, cents, books, k=10, nprobe=2
    )
    exact = similarity.brute_force_topk(clustered_vectors, q, k=10)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"IVF-PQ recall too low: {recall}"


def test_incremental_minhash_equals_batch_restriction(spark):
    """Incremental (index ⨝ new batch) candidates == full-batch candidates
    restricted to pairs touching a new doc — same pair set AND same
    shared-band counts."""
    from analytics_data_platform_spark.operators import dedup
    from analytics_data_platform_spark.sources.testdata import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    is_new = (F.col("doc_id") % 5) == 4
    kw = dict(num_hashes=32, bands=16, seed=42)
    index_rows = dedup.minhash_band_rows(d.where(~is_new), **kw)
    new_rows = dedup.minhash_band_rows(d.where(is_new), **kw)
    inc = {
        (r.id_a, r.id_b): r.n_shared_bands
        for r in dedup.incremental_minhash_candidates(index_rows, new_rows).collect()
    }
    full = {
        (r.id_a, r.id_b): r.n_shared_bands
        for r in dedup.minhash_lsh_candidates_portable(d, **kw).collect()
        if r.id_a % 5 == 4 or r.id_b % 5 == 4
    }
    assert inc == full and inc


def test_brute_force_numpy_matches_rounded_jvm_pipeline(spark):
    """The fused Arrow scorer agrees row-for-row with the oracle-pinned
    JVM pipeline (ann_cosine_topk), which shares its round-before-rank
    contract. The raw brute_force_topk operator ranks on unrounded
    scores, so it is NOT the comparison target — ties at 4dp may legally
    order differently there."""
    from analytics_data_platform_spark.queries.vector_ops import ann_cosine_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    jvm = {
        (r.q_id, r.rank): (r.vec_id, round(r.cos_sim, 4))
        for r in ann_cosine_topk(spark, "/root/testdata/sf0.001").collect()
    }
    np_ = {
        (r.q_id, r.rank): (r.vec_id, round(r.cos_sim, 4))
        for r in similarity.brute_force_topk_numpy(e, q, k=10).collect()
    }
    assert jvm == np_ and len(jvm) == 50


def test_resize_media_default_raises(spark):
    rows = [(1, bytearray(b"\x89PNG" + b"x" * 64), "image/png", 8, 8, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    import pytest as _pytest

    with _pytest.raises(Exception):
        multimodal.resize_media(media, 4, 4).collect()


def test_resize_media_with_injected_codec(spark):
    """Deterministic fake resizer: output keeps the binary-column shape and
    the requested dimensions, ready to write back to a media table."""
    rows = [
        (1, bytearray(b"\x89PNG" + b"x" * 64), "image/png", 8, 8, None),
        (2, bytearray(b"RIFF" + b"y" * 32), "audio/wav", None, None, 1000),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    def fake_resizer(payload: bytes, media_type: str, w: int, h: int) -> bytes:
        return payload[: w * h]  # deterministic truncation stands in for scaling

    out = {
        r["media_id"]: r
        for r in multimodal.resize_media(media, 4, 4, resizer=fake_resizer).collect()
    }
    assert len(out) == 2
    assert out[1]["width"] == 4 and out[1]["height"] == 4
    assert bytes(out[1]["payload"]) == bytes(b"\x89PNG" + b"x" * 64)[:16]
    assert out[2]["media_type"] == "audio/wav"


# --- setsim_join_prefix ----------------------------------------------------


def test_setsim_prefix_matches_brute_force(spark):
    """Prefix filtering must return EXACTLY the all-pairs answer."""
    import pyspark.sql.functions as F

    from analytics_data_platform_spark.operators.dedup import setsim_join_prefix

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the sleepy dog"),  # near-dup of 1
        (3, "entirely different words about spark and parquet tables"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "spark and parquet tables hold entirely different words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in setsim_join_prefix(df, threshold=0.5).collect()
    }
    # brute force over unigram sets
    import itertools
    import re

    sets = {i: set(re.sub(r"[^a-z0-9\s]", "", t.lower()).split()) for i, t in rows}
    expect = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        jac = inter / (len(sets[a]) + len(sets[b]) - inter)
        if round(jac, 6) >= 0.5:
            expect[(a, b)] = round(jac, 6)
    assert got == expect
    assert (1, 4) in got and got[(1, 4)] == 1.0


def test_setsim_prefix_prunes_candidates(spark):
    """Documents sharing NO rare prefix token never become candidates:
    total prefix rows are strictly fewer than total tokens."""
    import pyspark.sql.functions as F

    from analytics_data_platform_spark.operators.dedup import setsim_join_prefix

    rows = [(i, f"common shared words plus unique{i} token{i} extra{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # high threshold -> prefix length ~ (1-t)|x|+1 << |x|
    out = setsim_join_prefix(df, threshold=0.9)
    # no pair reaches 0.9 (each doc has 3 unique tokens of 6)
    assert out.count() == 0


# --- IVF as table layout ---------------------------------------------------


def test_ivf_table_topk_equals_raw_and_prunes_partitions(spark, clustered_vectors, tmp_path):
    import uuid

    from analytics_data_platform_spark.plans.audit import audit
    from analytics_data_platform_spark.tables.io import TableIO

    io = TableIO(spark)
    ns = f"ivf_{uuid.uuid4().hex[:8]}"
    io.ensure_namespace(ns)
    table = f"{ns}.vectors_ivf"
    try:
        cents = similarity.train_ivf_centroids(clustered_vectors, n_centroids=4, max_iter=8)
        similarity.write_ivf_table(io, clustered_vectors, table, cents)

        q = _queries_from(clustered_vectors)
        from_table = similarity.ivf_table_topk(io, table, q, cents, k=10, nprobe=2)
        from_raw = similarity.ivf_topk(clustered_vectors, q, cents, k=10, nprobe=2)
        t = {(r["q_id"], r["vec_id"]) for r in from_table.collect()}
        r = {(r["q_id"], r["vec_id"]) for r in from_raw.collect()}
        assert t == r

        # the executed scan must be prunable on the cell partition column:
        # either static partition filters or a DPP subquery on _cell
        rep = audit(from_table)
        pruned = any(s.partition_filters for s in rep.scans) or (
            "dynamicpruning" in rep.formatted.lower()
        )
        assert pruned, rep.formatted[:2000]
    finally:
        io.drop_namespace(ns)
