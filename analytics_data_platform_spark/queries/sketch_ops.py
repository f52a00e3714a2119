"""Sketch-based corpus queries with HARD oracles (operators.sketches).

HLL cardinality, count-min frequency, and Bloom-filter decontamination
over the ``documents`` table. Because every hash is md5-derived and
engine-portable, the DuckDB oracle rebuilds the identical sketch state —
approximate answers, exact reproducibility (same pattern that upgraded
the MinHash/LSH family from rows-only to hash-verified in scale_ops).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.operators import sketches as S
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table

# shared bigram builders (same idiom as repetition_quality); built lazily —
# F.expr at import time requires an active SparkContext
def _bigrams_col():
    return F.zip_with(
        "t",
        F.expr("slice(t, 2, greatest(size(t) - 1, 0))"),
        lambda a, b: F.concat_ws(" ", a, b),
    )

_BIGRAM_SQL = (
    "unnest(list_transform(list_zip(t, list_slice(t, 2, len(t))),"
    " x -> x[1] || ' ' || x[2]))"
)


def _doc_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("t"))
        .select("doc_id", "source", F.explode(_bigrams_col()).alias("bg"))
        .where(F.col("bg").contains(" "))
    )


# --- HLL distinct bigrams per source --------------------------------------


def hll_distinct_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog estimate of distinct bigrams per source vs exact truth.

    One hash pass + a 128-register fold per group (the 100 TB cardinality
    plan: shuffle output is O(m) per source, never the corpus). The exact
    count rides along so the row itself documents the estimator's error;
    rel_err is computed from the ROUNDed estimate for reproducibility.
    """
    bg = _doc_bigrams(spark, sf_dir)
    regs = S.hll_registers(bg, F.col("bg"), "source")
    est = S.hll_estimate(regs, "source")
    truth = bg.groupBy("source").agg(
        F.count_distinct("bg").alias("true_distinct")
    )
    return est.join(truth, "source").select(
        "source",
        "v_empty",
        "est_distinct",
        "true_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("true_distinct"))
            / F.col("true_distinct"),
            4,
        ).alias("rel_err"),
    )


HLL_SQL = (
    "WITH base AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),\n"
    "bg AS (\n"
    f"  SELECT source, {_BIGRAM_SQL} AS bg FROM base\n"
    "),\n"
    "items AS (SELECT source, bg FROM bg WHERE bg IS NOT NULL),\n"
    + S.hll_sql("bg", "source", "items").strip().lstrip(",")
    + """,
truth AS (SELECT source, COUNT(DISTINCT bg) AS true_distinct FROM items GROUP BY source)
SELECT h.source, v_empty, est_distinct, true_distinct,
       ROUND(ABS(est_distinct - true_distinct) / CAST(true_distinct AS DOUBLE), 4) AS rel_err
FROM hll h JOIN truth USING (source)
"""
)

register(
    QuerySpec(
        "hll_distinct_bigrams",
        hll_distinct_bigrams,
        HLL_SQL,
        doc="HyperLogLog distinct-bigram estimate per source (portable md5 registers)",
        cites="training-data ops: cardinality sketching for corpus stats",
        tags=("sketch", "text"),
    )
)


# --- count-min term frequencies -------------------------------------------

CMS_PROBES = ["table", "spark", "merge", "scan", "zz-absent"]


def cms_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimated vs true corpus frequency for probe terms.

    The sketch is built from the per-term aggregate (vocab-sized), so the
    4-row expansion never touches corpus-sized data; probing broadcasts
    the ≤ d·w-row sketch. est_count ≥ true_count by construction — the
    absent probe row surfaces the collision overcount explicitly.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    sketch = S.cms_build(toks, "term", "cnt")
    probes = spark.createDataFrame([(t,) for t in CMS_PROBES], "term string")
    est = S.cms_query(sketch, probes, "term")
    return (
        est.join(toks, "term", "left")
        .select(
            "term",
            "est_count",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("true_count"),
        )
    )


_CMS_PROBE_VALUES = ", ".join(f"('{t}')" for t in CMS_PROBES)

CMS_SQL = f"""
WITH toks AS (
  SELECT term, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY term
),
expanded AS (
  SELECT r.rw, ({S.h32_sql("'cms' || CAST(r.rw AS VARCHAR) || ':' || term")}
                 % {S.CMS_WIDTH}) AS bucket, cnt
  FROM toks CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS rw) r
),
sketch AS (SELECT rw, bucket, SUM(cnt) AS bsum FROM expanded GROUP BY rw, bucket),
probes(term) AS (VALUES {_CMS_PROBE_VALUES}),
probed AS (
  SELECT p.term, r.rw,
         ({S.h32_sql("'cms' || CAST(r.rw AS VARCHAR) || ':' || p.term")}
          % {S.CMS_WIDTH}) AS bucket
  FROM probes p CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS rw) r
),
est AS (
  SELECT term, CAST(MIN(COALESCE(bsum, 0)) AS BIGINT) AS est_count
  FROM probed LEFT JOIN sketch USING (rw, bucket)
  GROUP BY term
)
SELECT est.term, est_count,
       CAST(COALESCE(cnt, 0) AS BIGINT) AS true_count
FROM est LEFT JOIN toks ON est.term = toks.term
"""

register(
    QuerySpec(
        "cms_term_counts",
        cms_term_counts,
        CMS_SQL,
        doc="count-min sketch frequency estimates vs truth for probe terms",
        cites="training-data ops: frequency sketching (heavy-hitter counting)",
        tags=("sketch", "text"),
    )
)


# --- Bloom-filter decontamination -----------------------------------------

EVAL_SOURCE = "src0"


def bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-train-doc contamination rate against a Bloom filter of the
    eval set's (source ``src0``) distinct bigrams.

    The filter is the distinct set-bit table (≤ k·|eval bigrams| of 4096
    positions) and broadcasts; train bigrams probe it with 3 equi-joins'
    worth of positions folded into one explode + count==k. At 100 TB the
    eval side stays sketch-sized no matter how big the train side grows —
    the standard streaming-decontamination shape. Integer-only, so false
    positives reproduce exactly in the oracle.
    """
    bg = _doc_bigrams(spark, sf_dir)
    eval_bg = bg.where(F.col("source") == EVAL_SOURCE).select("bg").distinct()
    bloom = S.bloom_build(eval_bg, F.col("bg"))
    train_bg = (
        bg.where(F.col("source") != EVAL_SOURCE).select("doc_id", "bg").distinct()
    )
    flagged = S.bloom_maybe_contains(train_bg, "bg", bloom)
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.col("maybe_member").cast("bigint")).alias("n_flagged"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_flagged",
            F.round(F.col("n_flagged") / F.col("n_bigrams"), 4).alias("contamination"),
        )
    )


_BLOOM_POS = S.bloom_positions_sql("bg")

BLOOM_SQL = f"""
WITH base AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
allbg AS (
  SELECT doc_id, source, bg FROM (
    SELECT doc_id, source, {_BIGRAM_SQL} AS bg FROM base
  ) WHERE bg IS NOT NULL
),
bloom AS (
  SELECT DISTINCT pos FROM (
    SELECT unnest({_BLOOM_POS}) AS pos
    FROM (SELECT DISTINCT bg FROM allbg WHERE source = '{EVAL_SOURCE}')
  )
),
train AS (
  SELECT DISTINCT doc_id, bg FROM allbg WHERE source <> '{EVAL_SOURCE}'
),
probes AS (
  SELECT doc_id, bg, unnest({_BLOOM_POS}) AS pos FROM train
),
hits AS (
  SELECT doc_id, bg, COUNT(*) AS n_hit
  FROM probes JOIN bloom USING (pos)
  GROUP BY doc_id, bg
),
verdicts AS (
  SELECT t.doc_id, t.bg,
         (COALESCE(n_hit, 0) = {S.BLOOM_K}) AS maybe_member
  FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id AND t.bg = h.bg
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(CASE WHEN maybe_member THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       ROUND(SUM(CASE WHEN maybe_member THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 4)
         AS contamination
FROM verdicts GROUP BY doc_id
"""

register(
    QuerySpec(
        "bloom_contamination",
        bloom_contamination,
        BLOOM_SQL,
        doc="Bloom-filter train/eval bigram decontamination scan",
        cites="training-data ops: eval-set decontamination (sketch membership)",
        tags=("sketch", "text", "dedup"),
    )
)
