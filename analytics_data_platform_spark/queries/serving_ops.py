"""Serving-tier composites over the persistent index structures.

Round-9 capstones: the index family (queries/search_ops.py, the
SearchIndex/VectorIndex operators) gave each retrieval primitive a
pruned, no-corpus-scan serving path; this module exercises the
OPERATIONS a deployed serving tier performs on those indexes —

- ``inverted_index_segment_merge`` — fold an independently built index
  segment into the serving index by pure file adoption (the Lucene
  segment-merge analog; zero compute, zero shuffle), with the incoming
  segment's pending merge-on-read takedowns surviving the merge;
- ``inverted_index_filtered_bm25`` — metadata-filtered ranked retrieval
  (Lucene filter-bitset semantics: the candidate set narrows, idf/avgdl
  stay index-global) served from the doc-metadata sidecar with
  predicate pushdown, never a corpus read;
- ``index_hybrid_rrf_topk`` — reciprocal-rank fusion where BOTH legs are
  index-served: BM25 from term-bucket-pruned scored posting lists and
  cosine from a cell-partitioned IVF probe with dynamic partition
  pruning. The full-scan ``hybrid_rrf_search`` formulation is the
  semantics anchor; this is the shape that survives 100 TB, where
  neither leg can afford a corpus scan per query batch;
- ``vector_index_segment_merge`` — the ANN-side segment merge: cell-wise
  file adoption is sound ONLY under a shared pinned quantizer (cell =
  pure function of vector × centroids), enforced by exact comparison;
  pending erasures migrate;
- ``vector_index_filtered_topk`` — metadata-filtered ANN with
  pre-filtering semantics: the predicate narrows candidates BEFORE the
  rank cut and pushes into the probed cells' parquet scan;
- ``serving_index_corpus_sync`` — the loop closed: the index maintained
  from the governed corpus state's per-tick changelog (ingest → dedup →
  GDPR takedown → serve), ranked serving equal to one-shot BM25 over
  the final live corpus;
- ``ann_sq8_topk`` / ``ann_truncated_rerank_topk`` — the compression and
  two-stage serving tiers below the index: symmetric-int8 quantized
  scoring (integer dot/norms — 4× smaller hot column) and
  Matryoshka-style truncate-then-rerank (16-dim first stage, exact
  re-rank of a 50-candidate pool).

Every query follows the registry's temp-dir index pattern (build a real
on-disk index, serve pruned, return the bounded cut as a literal frame)
and is externally oracle-gated; the per-stage plans are exposed via
``internal_plan`` for the shuffle-ledger audit, and the file-level
pruning of both index layouts is plan-guarded in
tests/test_plans_new_ops.py.

Reference parity note: the reference exposes retrieval only as full-scan
SQL over its dbt marts — these operators are the deployment-shaped
additions SURVEY.md §2's "training-data pipeline" extension calls for.
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.functions.concurrency import await_all
from analytics_data_platform_spark.operators import similarity
from analytics_data_platform_spark.operators.search_index import SearchIndex
from analytics_data_platform_spark.operators.similarity import topk_per_query
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.queries.scale_ops import (
    _IVF_NLIST,
    _IVF_NPROBE,
    _cos_sql,
    _DirIvfIndex,
    _ivf_sql,
)
from analytics_data_platform_spark.queries.search_ops import (
    BM25_SQL,
    INDEX_BUCKETS,
    LIST_K,
    N_QUERY_DOCS,
    QUERY_TERMS,
    RRF_K,
    TOPK,
    _bm25_index_serve,
    _bm25_scored_sql,
    _Q_VALUES,
    _scored_posting_rows,
)
from analytics_data_platform_spark.sources.testdata import load_table


def _query_frame(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(qid, t) for qid, ts in QUERY_TERMS.items() for t in ts],
        "q_id int, term string",
    )


# ---------------------------------------------------------------------------
# inverted_index_segment_merge — Lucene segment-merge by file adoption
# ---------------------------------------------------------------------------

def _merge_seg_pred():
    """The incoming segment's pending takedowns: odd doc_ids ≡ 0 (mod 21).
    A function, not a module constant — Column construction needs an
    active SparkContext, which import time doesn't have."""
    return (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 21 == 0)


def inverted_index_segment_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEGMENT MERGE on the serving index: two scored indexes are built
    INDEPENDENTLY over disjoint corpus halves (even/odd doc_ids — e.g.
    two crawls indexed by separate jobs), the incoming segment takes a
    merge-on-read takedown (pending, unmaterialized), and
    ``SearchIndex.merge_from`` folds it into the resident index by pure
    partition-wise file adoption — zero compute, zero shuffle, O(files)
    renames plus an O(1) associative stats sum. Ranked serving from the
    merged index must equal a one-shot build over the union MINUS the
    taken-down docs — including global statistics (the migrated delete
    sidecar's exact (n_docs, Σdl) decrement) — and must be unchanged
    after ``apply_deletes`` materializes the takedown.

    The oracle is the full-scan BM25 SQL over the surviving union in a
    different engine: a posting file dropped or duplicated in adoption,
    a stats sidecar summed wrong, a delete sidecar lost in the merge, or
    a torn apply-swap all hash-diverge on the ranked cut.
    """
    d = load_table(spark, sf_dir, "documents")
    root_a = tempfile.mkdtemp(prefix="adps-segmerge-a-")
    root_b = tempfile.mkdtemp(prefix="adps-segmerge-b-")
    try:
        a = SearchIndex(spark, root_a, mode="scored").build(
            d.where(F.col("doc_id") % 2 == 0)
        )
        b = SearchIndex(spark, root_b, mode="scored").build(
            d.where(F.col("doc_id") % 2 == 1)
        )
        b.delete_docs(d.where(_merge_seg_pred()).select("doc_id"))
        a.merge_from(b)
        served = a.bm25(QUERY_TERMS)
        schema = served.schema
        rows = sorted(tuple(r) for r in served.collect())
        a.apply_deletes()
        after = sorted(tuple(r) for r in a.bm25(QUERY_TERMS).collect())
        assert after == rows, "apply_deletes changed the merged ranking"
    finally:
        shutil.rmtree(root_a, ignore_errors=True)
        shutil.rmtree(root_b, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _segment_merge_internal_plans(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    postings, stats = _scored_posting_rows(d.where(~_merge_seg_pred()))
    return [("serve", _bm25_index_serve(postings, stats, _query_frame(spark)))]


assert BM25_SQL.count("FROM documents") == 1, "BM25 oracle shape changed"
SEGMENT_MERGE_SQL = BM25_SQL.replace(
    "FROM documents",
    "FROM documents WHERE NOT (doc_id % 2 = 1 AND doc_id % 21 = 0)",
)

register(
    QuerySpec(
        "inverted_index_segment_merge",
        inverted_index_segment_merge,
        SEGMENT_MERGE_SQL,
        doc="fold an independently built index segment into the serving index by partition-wise file adoption (zero compute); pending takedowns migrate; serving equals a one-shot build over the surviving union",
        cites="operators/search_index.py::merge_from; Lucene segment-merge analog; oracle shared with bm25_search",
        tags=("search", "scale", "topk", "multi_tick"),
        internal_plan=_segment_merge_internal_plans,
    )
)


# ---------------------------------------------------------------------------
# inverted_index_filtered_bm25 — metadata-filtered ranked retrieval
# ---------------------------------------------------------------------------

_FILTER_LANG = "en"


def inverted_index_filtered_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ranked retrieval from the serving index: BM25 top-k with
    the candidate set restricted to ``lang = 'en'`` documents — Lucene
    filter-bitset semantics, so the corpus statistics (idf from posting-
    list df, avgdl from the sidecar) stay INDEX-GLOBAL and only the
    ranked docs narrow. The filter resolves against the index's
    doc-metadata sidecar with predicate pushdown (plan-guarded:
    PushedFilters on lang) and semi-joins the already-pruned posting
    rows — the corpus text is never read, and the filter scan is
    O(docmeta), not O(postings).

    The oracle computes the same semantics full-scan: global BM25 scores
    joined to the documents table's lang column BEFORE the rank cut. A
    filter applied to the statistics (idf drift), a candidate leak, or a
    post-cut filter (top-k then filter — the classic filtered-search
    bug, which under-fills the page) all hash-diverge.
    """
    d = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="adps-fltidx-")
    try:
        idx = SearchIndex(spark, root, mode="scored").build(d)
        served = idx.bm25(QUERY_TERMS, where=f"lang = '{_FILTER_LANG}'")
        schema = served.schema
        rows = sorted(tuple(r) for r in served.collect())
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _filtered_internal_plans(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    postings, stats = _scored_posting_rows(d)
    cand = d.where(F.col("lang") == _FILTER_LANG).select("doc_id")
    return [
        (
            "serve",
            _bm25_index_serve(
                postings, stats, _query_frame(spark), candidates=cand
            ),
        )
    ]


FILTERED_BM25_SQL = (
    _bm25_scored_sql(f"q(q_id, term) AS (VALUES {_Q_VALUES})")
    + f"""
SELECT q_id, doc_id, score, rank FROM (
  SELECT s.q_id, s.doc_id, s.score,
         ROW_NUMBER() OVER (PARTITION BY s.q_id ORDER BY s.score DESC, s.doc_id) AS rank
  FROM scored s JOIN documents m ON s.doc_id = m.doc_id
  WHERE m.lang = '{_FILTER_LANG}'
) WHERE rank <= {TOPK}
"""
)

register(
    QuerySpec(
        "inverted_index_filtered_bm25",
        inverted_index_filtered_bm25,
        FILTERED_BM25_SQL,
        doc="metadata-filtered BM25 top-k from the serving index: candidates narrow via the docmeta sidecar (predicate pushdown), idf/avgdl stay index-global",
        cites="operators/search_index.py::bm25(where=); Lucene filtered-search (filter bitset) semantics",
        tags=("search", "scale", "topk", "multi_tick"),
        internal_plan=_filtered_internal_plans,
    )
)


# ---------------------------------------------------------------------------
# index_hybrid_rrf_topk — RRF fusion, both legs index-served
# ---------------------------------------------------------------------------


# Lucene MoreLikeThis term selection: the lexical leg queries with each
# query doc's MLT_TERMS most DISTINCTIVE terms (tf·idf-ranked), not its
# whole vocabulary — that is both what MoreLikeThis actually does and
# what keeps the bucket-pruned serve real (a document's full token set
# saturates every occupied bucket; its top-6 distinctive terms touch a
# strict subset, plan-guarded in tests/test_serving_ops.py).
MLT_TERMS = 6


def _mlt_query_terms(d: DataFrame) -> DataFrame:
    """(q_id, term): top-MLT_TERMS terms per query doc by tf·ln(N/df),
    rounded before ranking with a term tie-break (oracle-stable)."""
    from pyspark.sql import Window

    from analytics_data_platform_spark.queries.search_ops import _term_stats

    tf, dfreq, stats = _term_stats(d)
    scored = (
        tf.where(F.col("doc_id") < N_QUERY_DOCS)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("doc_id").cast("int").alias("q_id"),
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("mlt"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("mlt"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= MLT_TERMS)
        .select("q_id", "term")
    )


def _hybrid_legs(
    spark: SparkSession,
    d: DataFrame,
    e: DataFrame,
    postings: DataFrame,
    stats: DataFrame,
    ivf_io,
    cents: list[list[float]],
    q_terms: DataFrame,
    lex_candidates: DataFrame | None = None,
) -> DataFrame:
    """The fused plan, parameterized by where each leg's index rows come
    from (on-disk pruned reads in the registry query; in-memory frames in
    the internal-plan audit). Mirrors hybrid_rrf_search's semantics with
    the lexical terms narrowed to the MoreLikeThis selection and the
    semantic leg swapped to the IVF probe (nprobe cells, pinned
    natural-init centroids — the ann_ivf_topk contract, so the oracle
    reproduces assignment exactly). ``lex_candidates`` pre-filters the
    lexical leg (Lucene filtered semantics: candidates narrow BEFORE the
    rank cut, idf/avgdl stay index-global); the semantic leg filters
    inside ``ivf_io.read`` the same way."""
    bm_top = _bm25_index_serve(
        postings, stats, q_terms, k=LIST_K, exclude_q_doc=True,
        candidates=lex_candidates,
    ).select("q_id", "doc_id", F.col("rank").alias("b_rank"))

    qv = e.where(F.col("vec_id") < N_QUERY_DOCS).select(
        F.col("vec_id").cast("int").alias("q_id"),
        F.col("embedding").alias("q_emb"),
    )
    if ivf_io is not None:
        sem = similarity.ivf_table_topk(
            ivf_io, "ivf", qv, cents, k=LIST_K, nprobe=_IVF_NPROBE, score_round=4
        )
    else:
        sem = similarity.ivf_topk(
            e, qv, cents, k=LIST_K, nprobe=_IVF_NPROBE, score_round=4
        )
    sem_top = sem.select(
        "q_id", F.col("vec_id").alias("doc_id"), F.col("rank").alias("c_rank")
    )

    fused = bm_top.join(sem_top, ["q_id", "doc_id"], "full_outer").select(
        "q_id",
        "doc_id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("b_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("c_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return topk_per_query(fused, TOPK, "q_id", "doc_id", "rrf").select(
        "q_id", "doc_id", "rrf", "rank"
    )


def index_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid more-like-this retrieval with BOTH legs served from
    persistent index structures — no corpus scan on either side:

    - lexical: BM25 over the SCORED inverted index (tf/dl posting lists
      partitioned by term bucket + the one-row stats sidecar), reading
      only the query docs' terms' buckets;
    - semantic: cosine over the cell-partitioned IVF index (pinned
      natural-init centroids, the ann_ivf_topk contract), probing
      nprobe cells per query with dynamic partition pruning;
    - fusion: reciprocal-rank RRF = Σ 1/(60 + rank) over the two top-50
      lists, exactly hybrid_rrf_search's rule.

    This is the serving shape of the full-scan ``hybrid_rrf_search`` at
    100 TB: each query batch costs O(query-term posting lists) +
    O(nprobe/nlist of the vectors) instead of two corpus passes. The
    lexical terms are the MoreLikeThis selection — each query doc's
    MLT_TERMS most distinctive terms by tf·idf (collected to compute
    bucket ids: ≤ 3×MLT_TERMS rows, the same bounded collect every
    index-serving query documents).

    The oracle recomputes both legs in DuckDB — the identical tf·idf
    term selection, global BM25 over those terms, IVF assignment/probe
    replayed exactly (deterministic centroids) — and fuses with the same
    rounded RRF; a bucket-pruned-away posting, a drifted term selection,
    a stale cell assignment, or fusion on unrounded ranks all
    hash-diverge on the fused cut.
    """
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    idx_dir = tempfile.mkdtemp(prefix="adps-hybidx-lex-")
    stats_dir = tempfile.mkdtemp(prefix="adps-hybidx-stats-")
    ivf_dir = tempfile.mkdtemp(prefix="adps-hybidx-ivf-")
    try:
        # the three build groups — lexical index write, MoreLikeThis term
        # selection, IVF cell write — are mutually independent: overlap
        # their jobs from a driver pool so each one's stage tail
        # back-fills the executors (guide §2.6). Pure job scheduling; no
        # served plan changes.
        from concurrent.futures import ThreadPoolExecutor

        postings, stats = _scored_posting_rows(d)

        def _write_lex() -> None:
            postings.write.mode("overwrite").partitionBy("bucket").parquet(idx_dir)
            stats.coalesce(1).write.mode("overwrite").parquet(stats_dir)

        def _build_ivf() -> list[list[float]]:
            rows_c = (
                e.where(F.col("vec_id") < _IVF_NLIST)
                .orderBy("vec_id")
                .select("embedding")
                .collect()
            )
            cents = [[float(x) for x in r["embedding"]] for r in rows_c]
            cell = similarity.assign_centroid_col("embedding", cents).cast("int")
            e.withColumn("_cell", cell).write.partitionBy("_cell").mode(
                "overwrite"
            ).parquet(ivf_dir)
            return cents

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_lex = pool.submit(_write_lex)
            f_terms = pool.submit(lambda: _mlt_query_terms(d).localCheckpoint())
            f_ivf = pool.submit(_build_ivf)
            q_terms, cents, _ = await_all(f_terms, f_ivf, f_lex)

        terms = [r["term"] for r in q_terms.select("term").distinct().collect()]
        want = sorted(
            {
                r["b"]
                for r in spark.createDataFrame(
                    [(t,) for t in sorted(set(terms))], "term string"
                )
                .select(F.pmod(F.hash("term"), F.lit(INDEX_BUCKETS)).alias("b"))
                .collect()
            }
        )
        lex_index = spark.read.parquet(idx_dir).where(F.col("bucket").isin(*want))

        out = _hybrid_legs(
            spark,
            d,
            e,
            lex_index,
            spark.read.parquet(stats_dir),
            _DirIvfIndex(spark, ivf_dir),
            cents,
            q_terms,
        )
        schema = out.schema
        rows = [tuple(r) for r in out.collect()]  # bounded: 3 queries × 10
    finally:
        for p in (idx_dir, stats_dir, ivf_dir):
            shutil.rmtree(p, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _hybrid_internal_plans(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    postings, stats = _scored_posting_rows(d)
    rows_c = (
        e.where(F.col("vec_id") < _IVF_NLIST)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in rows_c]
    return [
        (
            "fuse",
            _hybrid_legs(
                spark, d, e, postings, stats, None, cents, _mlt_query_terms(d)
            ),
        )
    ]


def _hybrid_index_sql() -> str:
    """Both oracle legs composed: the MoreLikeThis tf·idf term selection
    + BM25 CTE chain (LIST_K cut, self excluded) and the deterministic
    IVF assignment/probe replay (ann_ivf_topk's contract, LIST_K cut),
    fused with rounded RRF."""
    dist = (
        "list_sum(list_transform(list_zip(e.embedding, c.cemb), "
        "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))"
        " * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))"
    )
    return (
        _bm25_scored_sql(
            f"""q AS (
  SELECT q_id, term FROM (
    SELECT CAST(tf.doc_id AS INTEGER) AS q_id, tf.term,
           ROW_NUMBER() OVER (
             PARTITION BY tf.doc_id
             ORDER BY ROUND(tf.tf * LN(CAST(stats.n_docs AS DOUBLE) / dfreq.df), 4) DESC,
                      tf.term
           ) AS rn
    FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats
    WHERE tf.doc_id < {N_QUERY_DOCS}
  ) WHERE rn <= {MLT_TERMS}
)"""
        )
        + f"""
, bm25_top AS (
  SELECT q_id, doc_id, rank AS b_rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
    FROM scored WHERE doc_id <> q_id
  ) WHERE rank <= {LIST_K}
),
c AS (SELECT vec_id AS cell, embedding AS cemb FROM embeddings WHERE vec_id < {_IVF_NLIST}),
dmat AS (
  SELECT e.vec_id, e.embedding, c.cell, {dist} AS dist
  FROM embeddings e CROSS JOIN c
),
assign AS (
  SELECT vec_id, embedding, cell
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM dmat)
  WHERE rn = 1
),
qc AS (
  SELECT CAST(vec_id AS INTEGER) AS q_id, embedding AS q_emb, cell AS qcell
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn
        FROM dmat WHERE vec_id < {N_QUERY_DOCS})
  WHERE rn <= {_IVF_NPROBE}
),
sem AS (
  SELECT qc.q_id, a.vec_id AS doc_id, ROUND({_cos_sql('qc.q_emb', 'a.embedding')}, 4) AS cos_sim
  FROM assign a JOIN qc ON a.cell = qc.qcell AND a.vec_id <> qc.q_id
),
sem_top AS (
  SELECT q_id, doc_id, rank AS c_rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, doc_id) AS rank
    FROM sem
  ) WHERE rank <= {LIST_K}
),
fused AS (
  SELECT COALESCE(b.q_id, s.q_id) AS q_id,
         COALESCE(b.doc_id, s.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / ({RRF_K} + b_rank), 0.0)
               + COALESCE(1.0 / ({RRF_K} + c_rank), 0.0), 6) AS rrf
  FROM bm25_top b FULL OUTER JOIN sem_top s
    ON b.q_id = s.q_id AND b.doc_id = s.doc_id
)
SELECT q_id, doc_id, rrf, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= {TOPK}
"""
    )


register(
    QuerySpec(
        "index_hybrid_rrf_topk",
        index_hybrid_rrf_topk,
        _hybrid_index_sql(),
        doc="RRF hybrid retrieval with BOTH legs index-served: bucket-pruned BM25 postings + cell-pruned IVF probe; the 100 TB serving shape of hybrid_rrf_search",
        cites="composes inverted_index_bm25_topk + ivf_index_incremental_topk serving paths; RRF rule shared with hybrid_rrf_search",
        tags=("search", "vector", "scale", "topk", "multi_tick"),
        internal_plan=_hybrid_internal_plans,
    )
)


# ---------------------------------------------------------------------------
# index_hybrid_filtered_topk — filtered retrieval at the hybrid capstone
# ---------------------------------------------------------------------------

_HYBRID_FILTER_LANG = "en"


def index_hybrid_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED hybrid retrieval — the production query shape «like
    these docs, in language X»: the RRF fusion of ``index_hybrid_rrf_topk``
    with pre-filtering composed into BOTH index-served legs:

    - lexical: BM25 candidates narrow to ``lang = 'en'`` via a
      doc-metadata sidecar scan (predicate pushdown — never a corpus
      read); idf/avgdl stay index-global (Lucene filtered semantics);
    - semantic: the predicate rides INSIDE the probed cells' parquet
      scan of the persistent ``VectorIndex`` (the index stores the
      filterable metadata column), composing PushedFilters with dynamic
      partition pruning — candidates narrow BEFORE each leg's rank cut,
      never after fusion (a post-cut filter under-fills both lists and
      re-weights RRF).

    The oracle replays both filtered legs: the same tf·idf term
    selection and global-stats BM25 restricted to the language, the same
    deterministic IVF assignment/probe with the language joined in.
    A leg filtering after its cut, a filter that shifted the corpus
    statistics, or a probe that lost either pruning hash-diverges on the
    fused cut (all three prunings asserted on one executed plan in
    tests/test_serving_ops.py).
    """
    from analytics_data_platform_spark.operators.vector_index import VectorIndex

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    lex_dir = tempfile.mkdtemp(prefix="adps-hybflt-lex-")
    stats_dir = tempfile.mkdtemp(prefix="adps-hybflt-stats-")
    meta_dir = tempfile.mkdtemp(prefix="adps-hybflt-meta-")
    ivf_root = tempfile.mkdtemp(prefix="adps-hybflt-ivf-")
    try:
        # four independent build groups (lexical index, docmeta sidecar,
        # MoreLikeThis terms, filtered vector index) — overlap their jobs
        # from a driver pool (guide §2.6); pure job scheduling, no served
        # plan changes
        from concurrent.futures import ThreadPoolExecutor

        postings, stats = _scored_posting_rows(d)

        def _write_lex() -> None:
            postings.write.mode("overwrite").partitionBy("bucket").parquet(lex_dir)
            stats.coalesce(1).write.mode("overwrite").parquet(stats_dir)

        def _build_vx():
            cents = _pinned_centroids(e)
            # the ANN index stores the filterable metadata column — the
            # production layout for filtered vector search
            ew = e.join(d.select(F.col("doc_id").alias("vec_id"), "lang"), "vec_id")
            vx = VectorIndex(
                spark, ivf_root, nlist=_IVF_NLIST, nprobe=_IVF_NPROBE
            ).build(ew, centroids=cents)
            return cents, vx

        with ThreadPoolExecutor(max_workers=4) as pool:
            f_lex = pool.submit(_write_lex)
            f_meta = pool.submit(
                lambda: d.drop("text").write.mode("overwrite").parquet(meta_dir)
            )
            f_terms = pool.submit(lambda: _mlt_query_terms(d).localCheckpoint())
            f_vx = pool.submit(_build_vx)
            q_terms, (cents, vx), _, _ = await_all(f_terms, f_vx, f_lex, f_meta)

        terms = [r["term"] for r in q_terms.select("term").distinct().collect()]
        want = sorted(
            {
                r["b"]
                for r in spark.createDataFrame(
                    [(t,) for t in sorted(set(terms))], "term string"
                )
                .select(F.pmod(F.hash("term"), F.lit(INDEX_BUCKETS)).alias("b"))
                .collect()
            }
        )
        lex_index = spark.read.parquet(lex_dir).where(F.col("bucket").isin(*want))
        candidates = (
            spark.read.parquet(meta_dir)
            .where(f"lang = '{_HYBRID_FILTER_LANG}'")
            .select("doc_id")
        )
        out = _hybrid_legs(
            spark,
            d,
            e,
            lex_index,
            spark.read.parquet(stats_dir),
            VectorIndex._Io(vx, f"lang = '{_HYBRID_FILTER_LANG}'"),
            cents,
            q_terms,
            lex_candidates=candidates,
        )
        schema = out.schema
        rows = [tuple(r) for r in out.collect()]  # bounded: 3 queries × 10
    finally:
        for p in (lex_dir, stats_dir, meta_dir, ivf_root):
            shutil.rmtree(p, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _hybrid_filtered_internal_plans(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    postings, stats = _scored_posting_rows(d)
    cents = _pinned_centroids(e)
    # per-row pure assignment: filtering the corpus first leaves every
    # survivor's cell unchanged — the in-memory form of the filtered probe
    e_f = e.join(
        d.where(F.col("lang") == _HYBRID_FILTER_LANG)
        .select(F.col("doc_id").alias("vec_id")),
        "vec_id",
        "left_semi",
    )
    cands = d.where(F.col("lang") == _HYBRID_FILTER_LANG).select("doc_id")

    class _MemIvf:
        def read(self, table):  # noqa: ARG002 — io protocol
            cell = similarity.assign_centroid_col("embedding", cents).cast("int")
            return e_f.withColumn("_cell", cell)

    return [
        (
            "fuse",
            _hybrid_legs(
                spark, d, e, postings, stats, _MemIvf(), cents,
                _mlt_query_terms(d), lex_candidates=cands,
            ),
        )
    ]


def _hybrid_filtered_sql() -> str:
    s = _hybrid_index_sql()
    old_b = "FROM scored WHERE doc_id <> q_id"
    assert s.count(old_b) == 1, "hybrid oracle shape changed (bm25 leg)"
    s = s.replace(
        old_b,
        old_b
        + f" AND doc_id IN (SELECT doc_id FROM documents WHERE lang = '{_HYBRID_FILTER_LANG}')",
    )
    old_s = "FROM assign a JOIN qc ON a.cell = qc.qcell AND a.vec_id <> qc.q_id"
    assert s.count(old_s) == 1, "hybrid oracle shape changed (sem leg)"
    return s.replace(
        old_s,
        old_s
        + f"\n  JOIN documents dl ON dl.doc_id = a.vec_id AND dl.lang = '{_HYBRID_FILTER_LANG}'",
    )


register(
    QuerySpec(
        "index_hybrid_filtered_topk",
        index_hybrid_filtered_topk,
        _hybrid_filtered_sql(),
        doc="filtered hybrid RRF («like these docs, in language X»): both index-served legs pre-filter before their rank cuts — docmeta pushdown on the BM25 leg, in-cell PushedFilters + DPP on the IVF leg; stats stay index-global",
        cites="composes index_hybrid_rrf_topk with inverted_index_filtered_bm25 + vector_index_filtered_topk semantics",
        tags=("search", "vector", "scale", "topk", "multi_tick"),
        internal_plan=_hybrid_filtered_internal_plans,
    )
)


# ---------------------------------------------------------------------------
# vector_index_segment_merge — ANN segment merge under a pinned quantizer
# ---------------------------------------------------------------------------


def _pinned_centroids(e: DataFrame) -> list[list[float]]:
    rows = (
        e.where(F.col("vec_id") < _IVF_NLIST)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def _ann_queries(e: DataFrame) -> DataFrame:
    return e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def vector_index_segment_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEGMENT MERGE on the ANN serving index: two cell-partitioned IVF
    indexes are built INDEPENDENTLY over disjoint halves (even/odd
    vec_ids) under the SAME pinned quantizer (the deterministic
    first-NLIST centroids the ann_ivf_topk contract fixes), the incoming
    segment takes a merge-on-read erasure (pending, unmaterialized), and
    ``VectorIndex.merge_from`` folds it in by pure partition-wise file
    adoption — cell assignment is a per-row pure function of (vector,
    centroids), so identical centroids mean the adopted files land in
    exactly the cells the probe will visit. nprobe-pruned serving must
    equal the in-memory IVF over the surviving union, before and after
    ``apply_deletes``.

    The oracle is the ann_ivf_topk SQL with the assignment restricted to
    survivors (queries and the quantizer still come from the full
    table): a cell file dropped or duplicated in adoption, an erasure
    sidecar lost in the merge, or a probe that misses adopted files all
    hash-diverge on the ranked cut.
    """
    from analytics_data_platform_spark.operators.vector_index import VectorIndex

    e = load_table(spark, sf_dir, "embeddings")
    cents = _pinned_centroids(e)
    q = _ann_queries(e)
    root_a = tempfile.mkdtemp(prefix="adps-vecmerge-a-")
    root_b = tempfile.mkdtemp(prefix="adps-vecmerge-b-")
    try:
        a = VectorIndex(spark, root_a, nlist=_IVF_NLIST, nprobe=_IVF_NPROBE).build(
            e.where(F.col("vec_id") % 2 == 0), centroids=cents
        )
        b = VectorIndex(spark, root_b, nlist=_IVF_NLIST, nprobe=_IVF_NPROBE).build(
            e.where(F.col("vec_id") % 2 == 1), centroids=cents
        )
        b.delete_vecs(
            e.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") % 5 == 3)).select(
                "vec_id"
            )
        )
        a.merge_from(b)
        served = a.topk(q, k=10).select("q_id", "vec_id", "cos_sim", "rank")
        schema = served.schema
        rows = sorted(tuple(r) for r in served.collect())
        a.apply_deletes()
        after = sorted(
            tuple(r)
            for r in a.topk(q, k=10)
            .select("q_id", "vec_id", "cos_sim", "rank")
            .collect()
        )
        assert after == rows, "apply_deletes changed the merged ranking"
    finally:
        shutil.rmtree(root_a, ignore_errors=True)
        shutil.rmtree(root_b, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _vector_merge_internal_plans(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents = _pinned_centroids(e)
    survivors = e.where(~((F.col("vec_id") % 2 == 1) & (F.col("vec_id") % 5 == 3)))
    return [
        (
            "serve",
            similarity.ivf_topk(
                survivors, _ann_queries(e), cents, k=10, nprobe=_IVF_NPROBE,
                score_round=4,
            ).select("q_id", "vec_id", "cos_sim", "rank"),
        )
    ]


def _vector_merge_sql() -> str:
    sql = _ivf_sql()
    assert sql.count("WHERE rn = 1") == 1, "ann_ivf_topk oracle shape changed"
    return sql.replace(
        "WHERE rn = 1", "WHERE rn = 1 AND NOT (vec_id % 2 = 1 AND vec_id % 5 = 3)"
    )


register(
    QuerySpec(
        "vector_index_segment_merge",
        vector_index_segment_merge,
        _vector_merge_sql(),
        doc="fold an independently built IVF segment into the ANN serving index by cell-wise file adoption under a pinned shared quantizer; pending erasures migrate",
        cites="operators/vector_index.py::merge_from; Faiss merge_into / Lucene segment-merge analog; oracle = ann_ivf_topk SQL over survivors",
        tags=("vector", "approx", "scale", "topk", "multi_tick"),
        internal_plan=_vector_merge_internal_plans,
    )
)


# ---------------------------------------------------------------------------
# vector_index_filtered_topk — metadata-filtered ANN (filtered vector search)
# ---------------------------------------------------------------------------

_ANN_FILTER_LABELS = (1, 4, 7)


def vector_index_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search from the serving index: nprobe-pruned
    cosine top-k with candidates restricted to ``label IN (1, 4, 7)`` —
    the metadata-filtered ANN every vector store serves (pre-filtering:
    the predicate narrows candidates BEFORE ranking, so the page fills
    with k true matches; a post-cut filter would under-fill). The
    quantizer and probe order stay pinned — a filter must not move
    anyone's cell — and the pushable IN predicate reaches the parquet
    scan of the PROBED cells only (PushedFilters + dynamic partition
    pruning together, plan-guarded in tests/test_vector_index.py).

    The oracle replays the deterministic IVF assignment with the label
    carried through and the same candidate restriction: a filter applied
    after the cut, a dropped true match in a probed cell, or an
    assignment drifted by the filter all hash-diverge.
    """
    from analytics_data_platform_spark.operators.vector_index import VectorIndex

    e = load_table(spark, sf_dir, "embeddings")
    cents = _pinned_centroids(e)
    q = _ann_queries(e)
    root = tempfile.mkdtemp(prefix="adps-vecflt-")
    try:
        vx = VectorIndex(spark, root, nlist=_IVF_NLIST, nprobe=_IVF_NPROBE).build(
            e, centroids=cents
        )
        served = vx.topk(
            q, k=10, where=f"label IN {_ANN_FILTER_LABELS}"
        ).select("q_id", "vec_id", "cos_sim", "rank")
        schema = served.schema
        rows = sorted(tuple(r) for r in served.collect())
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _vector_filtered_internal_plans(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents = _pinned_centroids(e)
    # cell assignment is a per-row pure function, so filtering the corpus
    # first leaves every survivor's cell unchanged — the in-memory
    # formulation of the same semantics
    cand = e.where(F.col("label").isin(*_ANN_FILTER_LABELS))
    return [
        (
            "serve",
            similarity.ivf_topk(
                cand, _ann_queries(e), cents, k=10, nprobe=_IVF_NPROBE, score_round=4
            ).select("q_id", "vec_id", "cos_sim", "rank"),
        )
    ]


def _vector_filtered_sql() -> str:
    dist = (
        "list_sum(list_transform(list_zip(e.embedding, c.cemb), "
        "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))"
        " * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))"
    )
    labels = ", ".join(str(x) for x in _ANN_FILTER_LABELS)
    return f"""
WITH c AS (SELECT vec_id AS cell, embedding AS cemb FROM embeddings WHERE vec_id < {_IVF_NLIST}),
dmat AS (
  SELECT e.vec_id, e.embedding, e.label, c.cell, {dist} AS dist
  FROM embeddings e CROSS JOIN c
),
assign AS (
  SELECT vec_id, embedding, label, cell
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM dmat)
  WHERE rn = 1
),
qc AS (
  SELECT vec_id AS q_id, embedding AS q_emb, cell AS qcell
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn
        FROM dmat WHERE vec_id < 5)
  WHERE rn <= {_IVF_NPROBE}
),
scored AS (
  SELECT qc.q_id, a.vec_id, ROUND({_cos_sql('qc.q_emb', 'a.embedding')}, 4) AS cos_sim
  FROM assign a JOIN qc ON a.cell = qc.qcell AND a.vec_id <> qc.q_id
  WHERE a.label IN ({labels})
)
SELECT q_id, vec_id, cos_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored)
WHERE rank <= 10
"""


register(
    QuerySpec(
        "vector_index_filtered_topk",
        vector_index_filtered_topk,
        _vector_filtered_sql(),
        doc="metadata-filtered ANN from the IVF serving index: pre-filter candidates (pushed into the probed cells' scan), quantizer and probe order pinned",
        cites="operators/vector_index.py::topk(where=); filtered vector search (pre-filtering) semantics; oracle replays the deterministic assignment with label carried",
        tags=("vector", "approx", "scale", "topk", "multi_tick"),
        internal_plan=_vector_filtered_internal_plans,
    )
)


# ---------------------------------------------------------------------------
# serving_index_corpus_sync — the serving index maintained FROM the governed
# corpus state's changelog (ingest → dedup → evict → serve, end to end)
# ---------------------------------------------------------------------------


def serving_index_corpus_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS→INDEX SYNC: the search index is maintained from the
    snapshot-backed corpus state's per-tick CHANGELOG — never rebuilt,
    never diffed against the corpus. Three ticks drive the governed
    state (``pipelines/incremental.py``): two ingest batches (clean →
    exact-dedup keeper merge) and a content-keyed GDPR takedown (docs
    whose normalized fingerprint matches the request set — guaranteed to
    EVICT live keepers, so the erase leg is never vacuous). After each
    tick the MANIFEST-DERIVED changelog (appeared rows = the tick's
    appended data files, evicted doc_ids = its merge-on-read delete-key
    files — ``pipelines/incremental.py::state_changelog``, Iceberg's
    CDC read) is applied to the index: appeared docs append O(batch);
    evicted keepers become merge-on-read deletes with the exact stats
    decrement. Ranked serving must then equal a one-shot BM25 over the
    FINAL live corpus — including idf/avgdl, so an index that missed an
    eviction (stale idf), double-indexed a retained doc, or filtered
    results without shifting the statistics hash-diverges.

    This closes the loop the serving and pipeline families built
    separately: ingest → dedup/govern → erase → SERVE, with every stage
    already oracle-gated on its own and the composition gated here.
    At scale each tick's index maintenance is O(changelog), and the
    changelog itself is an O(delta) manifest read — the appeared/evicted
    sets come from the tick's own commit files, never from diffing two
    corpus-sized live versions (no state-side shuffle; plan-pinned in
    tests/test_serving_ops.py).
    """
    from analytics_data_platform_spark.pipelines.incremental import (
        read_state_part,
        refresh_corpus_state,
        state_changelog,
        takedown_corpus_state,
    )

    from concurrent.futures import ThreadPoolExecutor

    docs = load_table(spark, sf_dir, "documents")
    state = tempfile.mkdtemp(prefix="adps-sync-state-")
    root = tempfile.mkdtemp(prefix="adps-sync-idx-")

    def _apply_changelog(idx, tick: int) -> int:
        appeared, evicted = state_changelog(
            spark, state, "live", tick - 1, tick, key_cols=["doc_id"]
        )
        if not appeared.isEmpty():  # takedown ticks append nothing
            idx.append(appeared)
        return idx.delete_docs(evicted)

    try:
        # cross-tick overlap (guide §2.6): snapshot versions are immutable
        # (copy-on-write), so the tick-0 index build reads live@v0 while
        # the tick-1 refresh commits v1 — and tick-1's index maintenance
        # (append + delete, same-index-sequential) touches only the index
        # root while the tick-2 takedown commits v2. Same operations, same
        # dependency order as the sequential loop: each changelog read
        # waits for its tick's commit AND the index existing.
        refresh_corpus_state(spark, state, docs.where(F.col("doc_id") % 2 == 0), 0)
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_build = pool.submit(
                lambda: SearchIndex(spark, root, mode="scored").build(
                    read_state_part(spark, state, "live", 0)
                )
            )
            f_t1 = pool.submit(
                refresh_corpus_state,
                spark,
                state,
                docs.where(F.col("doc_id") % 2 == 1),
                1,
            )
            idx, _ = await_all(f_build, f_t1)
            f_t2 = pool.submit(
                takedown_corpus_state,
                spark,
                state,
                docs.where(F.col("doc_id") % 97 == 0),
                2,
            )
            f_m1 = pool.submit(_apply_changelog, idx, 1)
            n_evicted, _ = await_all(f_m1, f_t2)
        n_evicted += _apply_changelog(idx, 2)
        assert n_evicted > 0, "takedown tick must evict live keepers"

        served = idx.bm25(QUERY_TERMS)
        schema = served.schema
        rows = sorted(tuple(r) for r in served.collect())
        idx.apply_deletes()
        after = sorted(tuple(r) for r in idx.bm25(QUERY_TERMS).collect())
        assert after == rows, "apply_deletes changed the synced ranking"
    finally:
        shutil.rmtree(state, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _sync_internal_plans(spark, sf_dir):
    """The serve plan over the one-shot live set; the state machinery's
    own tick plans are audited under the refresh/changelog entries."""
    from analytics_data_platform_spark.operators import dedup
    from analytics_data_platform_spark.queries.corpus_ops import c4_core_pass
    from analytics_data_platform_spark.queries.search_ops import _bm25_scores

    d = load_table(spark, sf_dir, "documents")
    cleaned = d.where(F.length(F.trim("text")) > 0).where(c4_core_pass("text"))
    tdfp = (
        d.where(F.col("doc_id") % 97 == 0)
        .select(dedup.fingerprint_col("text").alias("_fp"))
        .distinct()
    )
    fp = cleaned.select("doc_id", dedup.fingerprint_col("text").alias("_fp"))
    keep = (
        fp.join(F.broadcast(tdfp), "_fp", "left_anti")
        .groupBy("_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    live = cleaned.join(keep, "doc_id", "left_semi")
    scored = _bm25_scores(spark, live, _query_frame(spark))
    return [("serve", topk_per_query(scored, TOPK, "q_id", "doc_id", "score"))]


def _dd_chain_sql() -> str:
    """The sync ticks' FINAL LIVE SET as a CTE chain ending in ``dd`` —
    clean → exact-dedup keepers → content-keyed takedown, replicating
    refresh/takedown_corpus_state's semantics in DuckDB (shared by every
    corpus→index sync oracle)."""
    from analytics_data_platform_spark.queries.pipeline_ops import (
        _CLEAN_WHERE,
        _FP_SQL,
    )

    return f"""basex AS (
  SELECT doc_id, text, string_split(trim(text), ' ') AS t
  FROM documents WHERE length(trim(text)) > 0
),
cleanx AS (
  SELECT doc_id, text, {_FP_SQL} AS fp FROM basex WHERE {_CLEAN_WHERE}
),
tdfpx AS (
  SELECT DISTINCT {_FP_SQL} AS tfp FROM documents WHERE doc_id % 97 = 0
),
keepx AS (
  SELECT MIN(doc_id) AS doc_id FROM cleanx
  WHERE fp NOT IN (SELECT tfp FROM tdfpx WHERE tfp IS NOT NULL)
  GROUP BY fp
),
dd AS (SELECT c.doc_id, c.text FROM cleanx c JOIN keepx k ON c.doc_id = k.doc_id)"""


def _sync_sql() -> str:
    s = BM25_SQL
    assert s.count("FROM documents") == 1, "BM25 oracle shape changed"
    s = s.replace("FROM documents", "FROM dd")
    assert s.count("WITH toks AS (") == 1, "BM25 oracle shape changed"
    return s.replace("WITH toks AS (", f"WITH {_dd_chain_sql()},\ntoks AS (", 1)


register(
    QuerySpec(
        "serving_index_corpus_sync",
        serving_index_corpus_sync,
        _sync_sql(),
        doc="search index maintained from the corpus state's per-tick changelog (append appeared, erase evicted); ranked serving equals one-shot BM25 over the final live corpus",
        cites="composes pipelines/incremental.py state versions with operators/search_index.py; the ingest→govern→serve loop end to end",
        tags=("search", "pipeline", "scale", "topk", "multi_tick"),
        internal_plan=_sync_internal_plans,
    )
)


def streaming_index_corpus_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus→index sync driven by a REAL Structured Streaming
    execution — the deployment shape: documents arrive as files in a
    staged source, each ``foreachBatch`` tick folds the micro-batch into
    the governed corpus state (``refresh_corpus_state``) AND applies the
    tick's MANIFEST changelog (appended data files + merge-on-read
    delete-key files, ``state_changelog``) to the serving index in the
    same body; two ``availableNow`` drains share one checkpoint, then an
    out-of-band GDPR takedown tick (governance requests don't ride the
    document stream) syncs the same way. Ranked serving must equal a
    one-shot BM25 over the final live corpus — the identical oracle the
    batch variant (``serving_index_corpus_sync``) is gated on, now with
    the streaming machinery (checkpointed batch ids, session-cloned
    micro-batch frames, replay-safe state commits) in the loop.
    """
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from analytics_data_platform_spark.pipelines.incremental import (
        read_state_part,
        refresh_corpus_state,
        state_changelog,
        takedown_corpus_state,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    work = tempfile.mkdtemp(prefix="adps-streamsync-")
    staging = os.path.join(work, "staging")
    ckpt = os.path.join(work, "ckpt")
    state = os.path.join(work, "state")
    os.makedirs(staging)
    idx = SearchIndex(spark, os.path.join(work, "idx"), mode="scored")

    def apply_tick(bid: int) -> int:
        appeared, evicted = state_changelog(
            spark, state, "live", bid - 1, bid, key_cols=["doc_id"]
        )
        if not appeared.isEmpty():
            idx.append(appeared)
        return idx.delete_docs(evicted)

    def tick(bdf: DataFrame, bid: int) -> None:
        refresh_corpus_state(spark, state, bdf, bid)
        if bid == 0:
            idx.build(read_state_part(spark, state, "live", 0))
        else:
            apply_tick(bid)

    def drain() -> None:
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(
            staging
        )
        q = (
            stream.writeStream.foreachBatch(tick)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        t = pq.read_table(src)
        even = pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 0)
        pq.write_table(t.filter(even), os.path.join(staging, "part-000.parquet"))
        drain()
        pq.write_table(
            t.filter(pc.invert(even)), os.path.join(staging, "part-001.parquet")
        )
        drain()
        docs = load_table(spark, sf_dir, "documents")
        takedown_corpus_state(spark, state, docs.where(F.col("doc_id") % 97 == 0), 2)
        n_evicted = apply_tick(2)
        assert n_evicted > 0, "takedown tick must evict live keepers"

        served = idx.bm25(QUERY_TERMS)
        schema = served.schema
        rows = sorted(tuple(r) for r in served.collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


register(
    QuerySpec(
        "streaming_index_corpus_sync",
        streaming_index_corpus_sync,
        _sync_sql(),
        doc="corpus→index sync under a REAL streaming execution: foreachBatch ticks fold micro-batches into governed state and apply the manifest changelog to the index; ranked serving equals one-shot BM25 over the final live corpus",
        cites="streaming form of serving_index_corpus_sync (same oracle); pipelines/incremental.py::state_changelog; Structured Streaming foreachBatch + availableNow",
        tags=("search", "pipeline", "streaming", "scale", "topk", "multi_tick"),
        internal_plan=_sync_internal_plans,
    )
)


# ---------------------------------------------------------------------------
# ann_sq8_topk — int8 scalar-quantized ANN (the storage-compression tier)
# ---------------------------------------------------------------------------


# the quantization rule lives with the serving primitives so the
# persistent VectorIndex(storage="sq8") shares it verbatim
_sq8_codes = similarity.sq8_codes


def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) approximate top-k — the storage-compression
    serving tier every vector store offers below full-precision: each
    vector is symmetric-int8 quantized (per-vector max-abs scale, 4×
    smaller than float32, 8× smaller at rest than the double math), and
    retrieval ranks by the cosine of the CODES. Scoring is integer dot
    products and integer squared norms — exact in both engines — so the
    only float ops are two sqrts and one division over exact integers,
    and the rounded ranking cannot drift across engines.

    At 100 TB the quantized column is what lives hot (a 4× scan-bytes
    reduction on every query); recall loss vs full precision is the
    measured trade (``ann_recall_at_10``'s harness applies). The oracle
    replays the identical quantization rule and integer scoring in
    DuckDB — a drifted scale, a wrong rounding mode, or scoring in
    floats all hash-diverge on the ranked cut.
    """
    e = load_table(spark, sf_dir, "embeddings")
    coded = e.select("vec_id", _sq8_codes("embedding").alias("codes"))
    q = coded.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("codes").alias("q_codes")
    )
    idot = F.aggregate(
        F.zip_with("q_codes", "codes", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sq = lambda col: F.aggregate(  # noqa: E731 — integer squared norm
        F.transform(col, lambda x: (x * x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    coded_n = coded.withColumn("c_sq", sq("codes"))
    q_n = q.withColumn("q_sq", sq("q_codes"))
    cos = F.when(
        (F.col("q_sq") > 0) & (F.col("c_sq") > 0),
        idot
        / (F.sqrt(F.col("q_sq").cast("double")) * F.sqrt(F.col("c_sq").cast("double"))),
    )
    scored = coded_n.join(
        F.broadcast(q_n), F.col("vec_id") != F.col("q_id")
    ).select("q_id", "vec_id", F.round(cos, 4).alias("cos_sim"))
    return topk_per_query(scored, TOPK, "q_id", "vec_id", "cos_sim").select(
        "q_id", "vec_id", "cos_sim", "rank"
    )


_SQ8_CODES_SQL = """
SELECT vec_id,
       CASE WHEN s > 0
            THEN list_transform(embedding,
                                x -> CAST(ROUND(CAST(x AS DOUBLE) * 127.0 / s) AS INTEGER))
            ELSE list_transform(embedding, x -> 0) END AS codes
FROM (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE)))) AS s
  FROM embeddings
)
"""

ANN_SQ8_SQL = f"""
WITH coded AS ({_SQ8_CODES_SQL}),
stats AS (
  SELECT vec_id, codes,
         CAST(list_sum(list_transform(codes, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS c_sq
  FROM coded
),
q AS (SELECT vec_id AS q_id, codes AS q_codes, c_sq AS q_sq FROM stats WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, c.vec_id,
         ROUND(
           CASE WHEN q.q_sq > 0 AND c.c_sq > 0 THEN
             CAST(list_sum(list_transform(list_zip(q.q_codes, c.codes),
                                          x -> CAST(x[1] AS BIGINT) * x[2])) AS BIGINT)
             / (sqrt(CAST(q.q_sq AS DOUBLE)) * sqrt(CAST(c.c_sq AS DOUBLE)))
           END, 4) AS cos_sim
  FROM stats c JOIN q ON c.vec_id <> q.q_id
)
SELECT q_id, vec_id, cos_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC NULLS LAST, vec_id ASC) AS rank
      FROM scored)
WHERE rank <= {TOPK}
"""

register(
    QuerySpec(
        "ann_sq8_topk",
        ann_sq8_topk,
        ANN_SQ8_SQL,
        doc="symmetric-int8 scalar-quantized ANN top-k: integer dot/norm scoring over 4x-compressed codes; per-vector max-abs scale",
        cites="Faiss ScalarQuantizer QT_8bit analog; training-data ops: embedding storage compression",
        tags=("vector", "approx", "scale", "topk"),
    )
)


# ---------------------------------------------------------------------------
# ann_truncated_rerank_topk — Matryoshka-style truncate-then-rerank
# ---------------------------------------------------------------------------

TRUNC_DIMS = 16
RERANK_POOL = 50


def ann_truncated_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-STAGE retrieval with dimension truncation (the Matryoshka /
    adaptive-retrieval pattern): stage 1 ranks by cosine over only the
    FIRST 16 of 64 dimensions — a 4× cheaper scan that at 100 TB is the
    difference between reading 25 TB and 100 TB per query batch — and
    keeps a 50-candidate pool per query; stage 2 re-ranks ONLY that pool
    with full-precision cosine and cuts to top-10. Both stages rank on
    ROUNDed scores with id tie-breaks, so the candidate pool (not just
    the final cut) is deterministic across engines.

    The oracle replays both stages in DuckDB (list slicing + the same
    rounded ranking). A stage-1 cut on unrounded scores, a pool size
    drift, or a re-rank that rescores the whole corpus hash-diverges.
    """
    from analytics_data_platform_spark.functions import vectors as V

    e = load_table(spark, sf_dir, "embeddings")
    t = e.select("vec_id", F.slice("embedding", 1, TRUNC_DIMS).alias("t_emb"))
    tq = t.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("t_emb").alias("q_t"),
        V.norm("t_emb").alias("q_tn"),
    )
    tc = t.select("vec_id", "t_emb", V.norm("t_emb").alias("c_tn"))
    t_cos = F.when(
        (F.col("q_tn") > 0) & (F.col("c_tn") > 0),
        V.dot("q_t", "t_emb") / (F.col("q_tn") * F.col("c_tn")),
    )
    t_scored = tc.join(F.broadcast(tq), F.col("vec_id") != F.col("q_id")).select(
        "q_id", "vec_id", F.round(t_cos, 4).alias("t_sim")
    )
    pool = topk_per_query(
        t_scored, RERANK_POOL, "q_id", "vec_id", "t_sim"
    ).select("q_id", "vec_id")

    fq = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        V.norm("embedding").alias("q_n"),
    )
    fc = e.select("vec_id", "embedding", V.norm("embedding").alias("c_n"))
    f_cos = F.when(
        (F.col("q_n") > 0) & (F.col("c_n") > 0),
        V.dot("q_emb", "embedding") / (F.col("q_n") * F.col("c_n")),
    )
    reranked = (
        pool.join(fc, "vec_id")
        .join(F.broadcast(fq), "q_id")
        .select("q_id", "vec_id", F.round(f_cos, 4).alias("cos_sim"))
    )
    return topk_per_query(reranked, TOPK, "q_id", "vec_id", "cos_sim").select(
        "q_id", "vec_id", "cos_sim", "rank"
    )


ANN_TRUNC_RERANK_SQL = f"""
WITH t AS (
  SELECT vec_id, embedding[1:{TRUNC_DIMS}] AS t_emb, embedding FROM embeddings
),
tq AS (SELECT vec_id AS q_id, t_emb AS q_t, embedding AS q_emb FROM t WHERE vec_id < 5),
t_scored AS (
  SELECT tq.q_id, c.vec_id,
         ROUND({_cos_sql('tq.q_t', 'c.t_emb')}, 4) AS t_sim
  FROM t c JOIN tq ON c.vec_id <> tq.q_id
),
pool AS (
  SELECT q_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY t_sim DESC NULLS LAST, vec_id ASC) AS rnk
    FROM t_scored
  ) WHERE rnk <= {RERANK_POOL}
),
reranked AS (
  SELECT p.q_id, p.vec_id,
         ROUND({_cos_sql('tq.q_emb', 'c.embedding')}, 4) AS cos_sim
  FROM pool p
  JOIN t c ON c.vec_id = p.vec_id
  JOIN tq ON tq.q_id = p.q_id
)
SELECT q_id, vec_id, cos_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC NULLS LAST, vec_id ASC) AS rank
      FROM reranked)
WHERE rank <= {TOPK}
"""

register(
    QuerySpec(
        "ann_truncated_rerank_topk",
        ann_truncated_rerank_topk,
        ANN_TRUNC_RERANK_SQL,
        doc="Matryoshka-style two-stage retrieval: 16-dim truncated cosine pools 50 candidates (4x cheaper scan), full-precision re-rank cuts to top-10",
        cites="adaptive retrieval / MRL serving pattern; training-data ops: cheap first-stage ANN",
        tags=("vector", "approx", "scale", "topk"),
    )
)


# ---------------------------------------------------------------------------
# ivf_sq8_topk — coarse-pruned + int8-compressed serving (Faiss IVF,SQ8)
# ---------------------------------------------------------------------------


def ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8: the production combination of the two cost levers — the
    coarse quantizer prunes the scan to nprobe/nlist cell directories
    (dynamic partition pruning, the ann_ivf_topk contract with the same
    deterministic pinned centroids) AND the cells store symmetric-int8
    CODES instead of float vectors (4× smaller resident bytes, integer
    scoring). Assignment runs on the full-precision vectors (the
    standard layout: coarse quantize originals, compress residents);
    queries are quantized with the same rule, so scoring is a pure
    function of exact ints in both engines.

    At 100 TB this tier reads nprobe/nlist × 1/4 of the raw bytes per
    query batch. The oracle replays the deterministic assignment AND the
    quantization rule in DuckDB, scoring the same probed pairs with the
    same integer math — a cell file holding floats, a drifted scale, or
    a probe that reads an unprobed cell all hash-diverge.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cents = _pinned_centroids(e)
    idx_dir = tempfile.mkdtemp(prefix="adps-ivfsq8-")
    try:
        sq = lambda col: F.aggregate(  # noqa: E731 — integer squared norm
            F.transform(col, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        cell = similarity.assign_centroid_col("embedding", cents).cast("int")
        coded = e.select(
            "vec_id",
            cell.alias("_cell"),
            _sq8_codes("embedding").alias("codes"),
        ).withColumn("c_sq", sq("codes"))
        coded.write.partitionBy("_cell").mode("overwrite").parquet(idx_dir)

        q = e.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
        probes = similarity._probe_queries(q, cents, _IVF_NPROBE, "q_id", "q_emb")
        probes = probes.select(
            "q_id", "_qcell", _sq8_codes("q_emb").alias("q_codes")
        ).withColumn("q_sq", sq("q_codes"))

        table = spark.read.parquet(idx_dir)
        idot = F.aggregate(
            F.zip_with("q_codes", "codes", lambda a, b: (a * b).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        cos = F.when(
            (F.col("q_sq") > 0) & (F.col("c_sq") > 0),
            idot
            / (
                F.sqrt(F.col("q_sq").cast("double"))
                * F.sqrt(F.col("c_sq").cast("double"))
            ),
        )
        scored = table.join(
            F.broadcast(probes),
            (F.col("_cell") == F.col("_qcell")) & (F.col("vec_id") != F.col("q_id")),
        ).select("q_id", "vec_id", F.round(cos, 4).alias("cos_sim"))
        out = topk_per_query(scored, TOPK, "q_id", "vec_id", "cos_sim").select(
            "q_id", "vec_id", "cos_sim", "rank"
        )
        schema = out.schema
        rows = [tuple(r) for r in out.collect()]  # bounded: 5 queries × 10
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _ivf_sq8_internal_plans(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents = _pinned_centroids(e)
    sq = lambda col: F.aggregate(  # noqa: E731
        F.transform(col, lambda x: (x * x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cell = similarity.assign_centroid_col("embedding", cents).cast("int")
    coded = e.select(
        "vec_id", cell.alias("_cell"), _sq8_codes("embedding").alias("codes")
    ).withColumn("c_sq", sq("codes"))
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    probes = similarity._probe_queries(q, cents, _IVF_NPROBE, "q_id", "q_emb")
    probes = probes.select(
        "q_id", "_qcell", _sq8_codes("q_emb").alias("q_codes")
    ).withColumn("q_sq", sq("q_codes"))
    idot = F.aggregate(
        F.zip_with("q_codes", "codes", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos = F.when(
        (F.col("q_sq") > 0) & (F.col("c_sq") > 0),
        idot
        / (F.sqrt(F.col("q_sq").cast("double")) * F.sqrt(F.col("c_sq").cast("double"))),
    )
    scored = coded.join(
        F.broadcast(probes),
        (F.col("_cell") == F.col("_qcell")) & (F.col("vec_id") != F.col("q_id")),
    ).select("q_id", "vec_id", F.round(cos, 4).alias("cos_sim"))
    return [("serve", topk_per_query(scored, TOPK, "q_id", "vec_id", "cos_sim"))]


def _ivf_sq8_sql() -> str:
    dist = (
        "list_sum(list_transform(list_zip(e.embedding, c.cemb), "
        "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))"
        " * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))"
    )
    return f"""
WITH c AS (SELECT vec_id AS cell, embedding AS cemb FROM embeddings WHERE vec_id < {_IVF_NLIST}),
dmat AS (
  SELECT e.vec_id, e.embedding, c.cell, {dist} AS dist
  FROM embeddings e CROSS JOIN c
),
assign AS (
  SELECT vec_id, cell
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn FROM dmat)
  WHERE rn = 1
),
qc AS (
  SELECT vec_id AS q_id, cell AS qcell
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn
        FROM dmat WHERE vec_id < 5)
  WHERE rn <= {_IVF_NPROBE}
),
coded AS ({_SQ8_CODES_SQL}),
stats AS (
  SELECT vec_id, codes,
         CAST(list_sum(list_transform(codes, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS c_sq
  FROM coded
),
scored AS (
  SELECT qc.q_id, a.vec_id,
         ROUND(
           CASE WHEN qs.c_sq > 0 AND cs.c_sq > 0 THEN
             CAST(list_sum(list_transform(list_zip(qs.codes, cs.codes),
                                          x -> CAST(x[1] AS BIGINT) * x[2])) AS BIGINT)
             / (sqrt(CAST(qs.c_sq AS DOUBLE)) * sqrt(CAST(cs.c_sq AS DOUBLE)))
           END, 4) AS cos_sim
  FROM assign a
  JOIN qc ON a.cell = qc.qcell AND a.vec_id <> qc.q_id
  JOIN stats cs ON cs.vec_id = a.vec_id
  JOIN stats qs ON qs.vec_id = qc.q_id
)
SELECT q_id, vec_id, cos_sim, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC NULLS LAST, vec_id ASC) AS rank
      FROM scored)
WHERE rank <= {TOPK}
"""


register(
    QuerySpec(
        "ivf_sq8_topk",
        ivf_sq8_topk,
        _ivf_sq8_sql(),
        doc="IVF-SQ8 serving: coarse-pruned probe (pinned centroids, DPP) over symmetric-int8 coded cells; integer scoring of only the probed pairs",
        cites="Faiss IndexIVFScalarQuantizer (IVF,SQ8) analog; composes ann_ivf_topk assignment with ann_sq8_topk quantization",
        tags=("vector", "approx", "scale", "topk", "multi_tick"),
        internal_plan=_ivf_sq8_internal_plans,
    )
)


# ---------------------------------------------------------------------------
# vector_index_sq8_topk — the IVF,SQ8 tier served FROM the persistent class
# ---------------------------------------------------------------------------


def vector_index_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8 served from the PERSISTENT ``VectorIndex(storage="sq8")``
    — the quantized tier productized into the serving class rather than a
    throwaway layout built inside a query: cells store int8 codes + exact
    integer norms (4× fewer resident bytes), the quantizer is pinned in
    the sidecar, and the lifecycle is exercised (build on half the
    corpus, O(batch) append of the other half — assignment AND
    quantization are per-row pure functions, so the appended index
    provably equals a one-shot build). Serving probes nprobe cells under
    dynamic partition pruning and ranks by integer dot products.

    The oracle is the ivf_sq8_topk SQL verbatim: the class must reproduce
    the in-memory IVF,SQ8 rule exactly — a drifted scale, float cells, a
    lost append, or a probe that misses appended files all hash-diverge.
    """
    from analytics_data_platform_spark.operators.vector_index import VectorIndex

    e = load_table(spark, sf_dir, "embeddings")
    cents = _pinned_centroids(e)
    q = _ann_queries(e)
    root = tempfile.mkdtemp(prefix="adps-vecsq8-")
    try:
        vx = VectorIndex(
            spark, root, nlist=_IVF_NLIST, nprobe=_IVF_NPROBE, storage="sq8"
        ).build(e.where(F.col("vec_id") % 2 == 0), centroids=cents)
        vx.append(e.where(F.col("vec_id") % 2 == 1))
        served = vx.topk(q, k=TOPK).select("q_id", "vec_id", "cos_sim", "rank")
        schema = served.schema
        rows = sorted(tuple(r) for r in served.collect())
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


register(
    QuerySpec(
        "vector_index_sq8_topk",
        vector_index_sq8_topk,
        _ivf_sq8_sql(),
        doc="IVF-SQ8 from the persistent VectorIndex(storage='sq8'): int8-coded cells with pinned quantizer sidecar, O(batch) append, DPP-pruned integer-scored serving equal to the in-memory rule",
        cites="operators/vector_index.py storage='sq8'; Faiss IndexIVFScalarQuantizer persisted; oracle = ivf_sq8_topk SQL verbatim",
        tags=("vector", "approx", "scale", "topk", "multi_tick"),
        internal_plan=_ivf_sq8_internal_plans,
    )
)


# ---------------------------------------------------------------------------
# ann_sq8_recall_at_10 — the SQ8 quality gate
# ---------------------------------------------------------------------------


def ann_sq8_recall_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 recall@10 vs exact brute force — the measured quality trade
    the int8 tier buys its 4× byte reduction with (the companion of
    ``ann_ivf_recall_at_10``: recall here moves with quantization
    granularity rather than probe width, attributing quality loss to the
    right knob). Both sides rebuild independently and the recall numbers
    themselves hash-verify against the composed oracle."""
    from analytics_data_platform_spark.queries.vector_ops import ann_cosine_topk

    brute = ann_cosine_topk(spark, sf_dir).select("q_id", "vec_id")
    sq8 = ann_sq8_topk(spark, sf_dir).select(
        "q_id", "vec_id", F.lit(1).alias("hit")
    )
    return (
        brute.join(sq8, ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("k_brute"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
        .selectExpr(
            "q_id",
            "k_brute",
            "n_hit",
            "round(CAST(n_hit AS DOUBLE) / k_brute, 4) AS recall_at_10",
        )
        .orderBy("q_id")
    )


def _ann_sq8_recall_sql() -> str:
    # direct import, not a REGISTRY lookup — this module imports before
    # vector_ops in all_queries(), so the registry is not yet populated
    from analytics_data_platform_spark.queries.vector_ops import ANN_TOPK_SQL

    brute = ANN_TOPK_SQL
    return f"""
WITH brute AS (SELECT q_id, vec_id FROM ({brute}) b),
sq8 AS (SELECT q_id, vec_id FROM ({ANN_SQ8_SQL}) s)
SELECT b.q_id,
       COUNT(*) AS k_brute,
       CAST(SUM(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       ROUND(CAST(SUM(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS recall_at_10
FROM brute b LEFT JOIN sq8 s ON b.q_id = s.q_id AND b.vec_id = s.vec_id
GROUP BY 1 ORDER BY 1
"""


register(
    QuerySpec(
        "ann_sq8_recall_at_10",
        ann_sq8_recall_at_10,
        _ann_sq8_recall_sql(),
        doc="recall@10 of int8 scalar-quantized scoring vs exact brute force — the quantization-granularity quality gate",
        cites="companion of ann_ivf_recall_at_10; composes ann_sq8_topk + ann_cosine_topk",
        tags=("similarity", "eval", "ann", "vector"),
    )
)


# ---------------------------------------------------------------------------
# inverted_index_reshard — grow the term-bucket count in place
# ---------------------------------------------------------------------------

_RESHARD_FROM, _RESHARD_TO = 8, 48


def inverted_index_reshard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESHARD the serving index: an index built at a small bucket count
    (8 — the layout a young corpus starts with), grown by append, takes a
    pending merge-on-read takedown, then ``SearchIndex.reshard`` grows it
    to 48 buckets IN PLACE — one full-index shuffle re-keying every
    posting row by the new ``hash(term) % buckets``, staged and swapped
    atomically (marker-first, resume-forward). This is the capacity lever
    the 100 TB story needs: bucket count fixes posting-directory fan-out
    at build time, and a corpus grown 100× must re-shard WITHOUT a
    rebuild from source text (Elasticsearch split / Lucene reindex-into-
    more-shards analog). The delete sidecar is doc-scoped, so the pending
    takedown survives the re-bucketing untouched.

    Ranked serving from the resharded index — through a FRESH handle
    opened at the new layout, and again after ``apply_deletes``
    materializes the takedown — must equal a one-shot BM25 over the
    surviving corpus: a posting row dropped or double-written by the
    shuffle, a bucket routed with the old modulus, a stats sidecar
    perturbed by the swap, or a lost delete sidecar all hash-diverge.
    """
    d = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="adps-reshard-")
    try:
        idx = SearchIndex(spark, root, mode="scored", buckets=_RESHARD_FROM).build(
            d.where(F.col("doc_id") % 2 == 0)
        )
        idx.append(d.where(F.col("doc_id") % 2 == 1))
        idx.delete_docs(d.where(F.col("doc_id") % 23 == 5).select("doc_id"))
        idx.reshard(_RESHARD_TO)
        assert idx.buckets == _RESHARD_TO, "handle did not adopt the new layout"
        served = idx.bm25(QUERY_TERMS)
        schema = served.schema
        rows = sorted(tuple(r) for r in served.collect())
        fresh = SearchIndex(spark, root, mode="scored", buckets=_RESHARD_TO)
        again = sorted(tuple(r) for r in fresh.bm25(QUERY_TERMS).collect())
        assert again == rows, "fresh handle serves differently after reshard"
        fresh.apply_deletes()
        after = sorted(tuple(r) for r in fresh.bm25(QUERY_TERMS).collect())
        assert after == rows, "apply_deletes changed the resharded ranking"
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _reshard_internal_plans(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    postings, stats = _scored_posting_rows(d.where(~(F.col("doc_id") % 23 == 5)))
    return [("serve", _bm25_index_serve(postings, stats, _query_frame(spark)))]


assert BM25_SQL.count("FROM documents") == 1, "BM25 oracle shape changed"
RESHARD_SQL = BM25_SQL.replace(
    "FROM documents", "FROM documents WHERE NOT (doc_id % 23 = 5)"
)

register(
    QuerySpec(
        "inverted_index_reshard",
        inverted_index_reshard,
        RESHARD_SQL,
        doc="grow the serving index's term-bucket count in place (8 -> 48): one re-keying shuffle, marker-first atomic swap, pending takedowns survive; serving equals a one-shot build over the survivors",
        cites="operators/search_index.py::reshard; Elasticsearch split / Lucene reindex-shards analog; oracle shared with bm25_search over survivors",
        tags=("search", "scale", "topk", "multi_tick"),
        internal_plan=_reshard_internal_plans,
    )
)


# ---------------------------------------------------------------------------
# vector_index_retrain — swap the pinned coarse quantizer in place
# ---------------------------------------------------------------------------

_RETRAIN_BASE = 50
_RETRAIN_NLIST = 2 * _IVF_NLIST


def _retrain_centroids(e: DataFrame) -> list[list[float]]:
    """The retrained quantizer: a DIFFERENT deterministic pick (vec_ids
    50..65) at double the cell count — the SQL-replayable stand-in for an
    offline k-means retrain (the trained path is pinned by pytest; the
    oracle needs exact replayability)."""
    rows = (
        e.where(
            (F.col("vec_id") >= _RETRAIN_BASE)
            & (F.col("vec_id") < _RETRAIN_BASE + _RETRAIN_NLIST)
        )
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def vector_index_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRAIN the ANN serving index's coarse quantizer in place: an IVF
    index built at nlist=8 (pinned deterministic centroids), grown by
    O(batch) append, then ``VectorIndex.retrain`` swaps in a NEW 16-cell
    quantizer — every resident vector re-assigned (one full-index
    shuffle, per-row pure function of vector × new centroids), staged and
    swapped atomically (marker-first, resume-forward). This is the Faiss
    production pattern (retrain offline, serve the swap) and the capacity
    lever when the corpus outgrows its pinned nlist — without it an index
    can only be rebuilt from the source corpus.

    nprobe-pruned serving under the NEW quantizer — through a fresh
    handle too — must equal the in-memory IVF of the same rows under the
    same centroids: a vector parked in a stale cell, a probe order from
    the old quantizer, a dropped row in the re-assignment shuffle, or a
    torn swap all hash-diverge on the ranked cut.
    """
    from analytics_data_platform_spark.operators.vector_index import VectorIndex

    e = load_table(spark, sf_dir, "embeddings")
    cents_old = _pinned_centroids(e)
    cents_new = _retrain_centroids(e)
    q = _ann_queries(e)
    root = tempfile.mkdtemp(prefix="adps-retrain-")
    try:
        vx = VectorIndex(spark, root, nlist=_IVF_NLIST, nprobe=_IVF_NPROBE).build(
            e.where(F.col("vec_id") % 2 == 0), centroids=cents_old
        )
        vx.append(e.where(F.col("vec_id") % 2 == 1))
        vx.retrain(centroids=cents_new)
        assert vx.nlist == _RETRAIN_NLIST, "handle did not adopt the new quantizer"
        served = vx.topk(q, k=10).select("q_id", "vec_id", "cos_sim", "rank")
        schema = served.schema
        rows = sorted(tuple(r) for r in served.collect())
        fresh = VectorIndex(spark, root, nprobe=_IVF_NPROBE)
        again = sorted(
            tuple(r)
            for r in fresh.topk(q, k=10)
            .select("q_id", "vec_id", "cos_sim", "rank")
            .collect()
        )
        assert again == rows, "fresh handle serves differently after retrain"
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _retrain_internal_plans(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents_new = _retrain_centroids(e)
    return [
        (
            "serve",
            similarity.ivf_topk(
                e, _ann_queries(e), cents_new, k=10, nprobe=_IVF_NPROBE,
                score_round=4,
            ).select("q_id", "vec_id", "cos_sim", "rank"),
        )
    ]


def _retrain_sql() -> str:
    sql = _ivf_sql()
    old = f"FROM embeddings WHERE vec_id < {_IVF_NLIST})"
    assert sql.count(old) == 1, "ann_ivf_topk oracle shape changed (c CTE)"
    return sql.replace(
        old,
        f"FROM embeddings WHERE vec_id >= {_RETRAIN_BASE} "
        f"AND vec_id < {_RETRAIN_BASE + _RETRAIN_NLIST})",
    )


register(
    QuerySpec(
        "vector_index_retrain",
        vector_index_retrain,
        _retrain_sql(),
        doc="swap the IVF serving index's pinned coarse quantizer in place (8 -> 16 cells): one re-assignment shuffle, marker-first atomic swap; serving equals the in-memory IVF under the new quantizer",
        cites="operators/vector_index.py::retrain; Faiss offline-retrain pattern; oracle = ann_ivf_topk SQL with the retrained quantizer CTE",
        tags=("vector", "approx", "scale", "topk", "multi_tick"),
        internal_plan=_retrain_internal_plans,
    )
)


# ---------------------------------------------------------------------------
# serving_hybrid_corpus_sync — the WHOLE hybrid serving stack maintained
# from the governed corpus state's manifest changelog
# ---------------------------------------------------------------------------


def serving_hybrid_corpus_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid capstone closed over the pipeline: BOTH serving tiers —
    the scored inverted index AND the IVF vector index — are maintained
    from the snapshot-backed corpus state's per-tick MANIFEST changelog
    (never rebuilt, never diffed against the corpus), then serve the
    MoreLikeThis hybrid RRF fusion together. Three ticks drive the
    governed state (two ingest batches through clean → exact-dedup
    keeper merge, then a content-keyed GDPR takedown); after each tick
    the changelog's appeared docs append O(batch) to BOTH indexes (the
    vector rows resolved by an id semi-join against the embeddings
    table) and its evicted keepers become merge-on-read deletes on BOTH
    (the lexical side with its exact idf/avgdl decrement).

    Serving then fuses the two synced tiers exactly like
    ``index_hybrid_rrf_topk`` — MoreLikeThis term selection over the
    LIVE corpus, bucket-pruned BM25 with the sidecar's (delete-adjusted)
    global stats, nprobe IVF probe over the live cells — and must equal
    the one-shot hybrid over the final live corpus. The takedown
    deliberately evicts query doc 0 (0 % 97 = 0): an ERASED exemplar
    contributes no lexical terms (its text is gone — MoreLikeThis has
    nothing to select from), so that query degrades to semantic-only
    fusion — and the oracle, whose term-selection chain roots at the
    same live set, degrades identically. A stale stats decrement on
    either index, a changelog row missed by either tier, a vector parked
    under the wrong cell after append, or a lexical leg still serving
    the erased exemplar's terms all hash-diverge on the fused cut.
    """
    from analytics_data_platform_spark.operators.vector_index import VectorIndex
    from analytics_data_platform_spark.pipelines.incremental import (
        read_state_part,
        refresh_corpus_state,
        state_changelog,
        takedown_corpus_state,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    cents = _pinned_centroids(e)
    state = tempfile.mkdtemp(prefix="adps-hybsync-state-")
    lex_root = tempfile.mkdtemp(prefix="adps-hybsync-lex-")
    ivf_root = tempfile.mkdtemp(prefix="adps-hybsync-ivf-")

    def vec_rows(docs: DataFrame, delta: bool = False) -> DataFrame:
        """Embedding rows for a doc set. ``delta=True`` pins a broadcast
        for the O(tick-changelog) id sets so the embeddings side streams
        map-side; the build-time live set is state-sized and left to the
        planner."""
        ids = docs.select(F.col("doc_id").alias("vec_id"))
        if delta:
            ids = F.broadcast(ids)
        return e.join(ids, "vec_id", "left_semi")

    try:
        # the two serving tiers are independent indexes under separate
        # roots: their builds, per-tick appends and per-tick erasures
        # overlap from a driver pool so each tier's job tail back-fills
        # the executors (guide §2.6) — pure job scheduling, identical
        # index contents and metadata
        from concurrent.futures import ThreadPoolExecutor

        def _apply_changelog(tick: int) -> int:
            appeared, evicted = state_changelog(
                spark, state, "live", tick - 1, tick, key_cols=["doc_id"]
            )
            with ThreadPoolExecutor(max_workers=2) as pool:
                if not appeared.isEmpty():
                    fa = pool.submit(idx.append, appeared)
                    fb = pool.submit(vx.append, vec_rows(appeared, delta=True))
                    await_all(fa, fb)
                fd = pool.submit(idx.delete_docs, evicted)
                fe = pool.submit(
                    vx.delete_vecs, evicted.select(F.col("doc_id").alias("vec_id"))
                )
                return await_all(fd, fe)[0]

        # cross-tick overlap on top (guide §2.6): snapshot versions are
        # immutable, so both tier builds read live@v0 while the tick-1
        # refresh commits v1, and tick-1's index maintenance (index roots
        # only) runs while the tick-2 takedown commits v2 — same
        # operations, same dependency order as the sequential loop
        refresh_corpus_state(spark, state, d.where(F.col("doc_id") % 2 == 0), 0)
        live0 = read_state_part(spark, state, "live", 0)
        with ThreadPoolExecutor(max_workers=3) as pool:
            f_lex = pool.submit(
                lambda: SearchIndex(spark, lex_root, mode="scored").build(live0)
            )
            f_vec = pool.submit(
                lambda: VectorIndex(
                    spark, ivf_root, nlist=_IVF_NLIST, nprobe=_IVF_NPROBE
                ).build(vec_rows(live0), centroids=cents)
            )
            f_t1 = pool.submit(
                refresh_corpus_state, spark, state, d.where(F.col("doc_id") % 2 == 1), 1
            )
            idx, vx, _ = await_all(f_lex, f_vec, f_t1)
            f_t2 = pool.submit(
                takedown_corpus_state, spark, state, d.where(F.col("doc_id") % 97 == 0), 2
            )
            f_m1 = pool.submit(_apply_changelog, 1)
            n_evicted, _ = await_all(f_m1, f_t2)
        n_evicted += _apply_changelog(2)
        assert n_evicted > 0, "takedown tick must evict live keepers"

        # serve: MoreLikeThis terms over the LIVE corpus (an erased
        # exemplar has no text to select from), then both synced tiers
        live = read_state_part(spark, state, "live", 2)
        q_terms = _mlt_query_terms(live).localCheckpoint()
        terms = [r["term"] for r in q_terms.select("term").distinct().collect()]
        meta = idx.stats()
        stats = spark.createDataFrame(
            [(int(meta["n_docs"]), meta["total_dl"] / meta["n_docs"])],
            "n_docs long, avgdl double",
        )
        out = _hybrid_legs(
            spark,
            d,
            e,
            idx._served(idx._pruned(terms)),
            stats,
            VectorIndex._Io(vx),
            cents,
            q_terms,
        )
        schema = out.schema
        rows = sorted(tuple(r) for r in out.collect())  # bounded: ≤3 q × 10
    finally:
        shutil.rmtree(state, ignore_errors=True)
        shutil.rmtree(lex_root, ignore_errors=True)
        shutil.rmtree(ivf_root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _hybrid_sync_internal_plans(spark, sf_dir):
    """The fused serve plan over the one-shot live set (the state
    machinery's own tick plans are audited under the refresh/changelog
    entries; the serve shape is what this query adds)."""
    from analytics_data_platform_spark.operators import dedup
    from analytics_data_platform_spark.queries.corpus_ops import c4_core_pass

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    cleaned = d.where(F.length(F.trim("text")) > 0).where(c4_core_pass("text"))
    tdfp = (
        d.where(F.col("doc_id") % 97 == 0)
        .select(dedup.fingerprint_col("text").alias("_fp"))
        .distinct()
    )
    fp = cleaned.select("doc_id", dedup.fingerprint_col("text").alias("_fp"))
    keep = (
        fp.join(F.broadcast(tdfp), "_fp", "left_anti")
        .groupBy("_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    live = cleaned.join(keep, "doc_id", "left_semi")
    postings, stats = _scored_posting_rows(live)
    cents = _pinned_centroids(e)
    e_live = e.join(
        live.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )

    class _MemIvf:
        def read(self, table):  # noqa: ARG002 — io protocol
            cell = similarity.assign_centroid_col("embedding", cents).cast("int")
            return e_live.withColumn("_cell", cell)

    return [
        (
            "fuse",
            _hybrid_legs(
                spark, d, e, postings, stats, _MemIvf(), cents,
                _mlt_query_terms(live),
            ),
        )
    ]


def _hybrid_sync_sql() -> str:
    """The hybrid oracle re-rooted at the sync ticks' final live set:
    the BM25/term-selection chain reads ``dd`` (so an erased exemplar
    selects no terms, mirroring the index), and the IVF assignment is
    restricted to live vectors; queries (probe embeddings) still come
    from the base table — they are external requests."""
    s = _hybrid_index_sql()
    assert s.count("FROM documents") == 1, "hybrid oracle shape changed (toks)"
    s = s.replace("FROM documents", "FROM dd")
    old_s = "FROM assign a JOIN qc ON a.cell = qc.qcell AND a.vec_id <> qc.q_id"
    assert s.count(old_s) == 1, "hybrid oracle shape changed (sem leg)"
    s = s.replace(old_s, old_s + "\n  JOIN dd ddv ON ddv.doc_id = a.vec_id")
    assert s.count("WITH toks AS (") == 1, "hybrid oracle shape changed (WITH)"
    return s.replace("WITH toks AS (", f"WITH {_dd_chain_sql()},\ntoks AS (", 1)


register(
    QuerySpec(
        "serving_hybrid_corpus_sync",
        serving_hybrid_corpus_sync,
        _hybrid_sync_sql(),
        doc="BOTH serving tiers (scored inverted index + IVF) maintained from the corpus state's manifest changelog, then fused with MoreLikeThis hybrid RRF; an erased exemplar degrades to semantic-only on both engines",
        cites="composes serving_index_corpus_sync with index_hybrid_rrf_topk; the ingest→govern→serve loop closed over the full hybrid stack",
        tags=("search", "vector", "pipeline", "scale", "topk", "multi_tick"),
        internal_plan=_hybrid_sync_internal_plans,
    )
)
