"""Sketch-based corpus queries with HARD oracles (operators.sketches).

HLL cardinality, count-min frequency, and Bloom-filter decontamination
over the ``documents`` table. Because every hash is md5-derived and
engine-portable, the DuckDB oracle rebuilds the identical sketch state —
approximate answers, exact reproducibility (same pattern that upgraded
the MinHash/LSH family from rows-only to hash-verified in scale_ops).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

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


# --- HLL register MERGE (union cardinality from per-source state) ---------

_UNION_SOURCES = ("src0", "src1", "src2")


def hll_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union cardinality from MERGED per-source HLL registers.

    The property that makes HLL the lakehouse cardinality primitive:
    registers are mergeable state (elementwise max), so per-partition /
    per-day sketches roll up without re-reading raw data. Here the
    per-source registers (the same state `hll_distinct_bigrams` builds)
    merge into a union estimate for src0∪src1∪src2, compared against the
    exact union count. Merge-associativity (merged registers ==
    registers of the union) is pinned by tests/test_sketches.py.
    """
    bg = _doc_bigrams(spark, sf_dir).where(F.col("source").isin(*_UNION_SOURCES))
    per_source = S.hll_registers(bg, F.col("bg"), "source")
    merged = (
        per_source.groupBy("idx")
        .agg(F.max("mj").alias("mj"))
        .select(F.lit("|".join(_UNION_SOURCES)).alias("source_set"), "idx", "mj")
    )
    est = S.hll_estimate(merged, "source_set")
    truth = bg.select(F.lit("|".join(_UNION_SOURCES)).alias("source_set"), "bg")
    truth = truth.groupBy("source_set").agg(
        F.count_distinct("bg").alias("true_distinct")
    )
    return est.join(truth, "source_set").select(
        "source_set",
        "v_empty",
        "est_distinct",
        "true_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("true_distinct"))
            / F.col("true_distinct"),
            4,
        ).alias("rel_err"),
    )


_SRC_LIST = ", ".join(f"'{s}'" for s in _UNION_SOURCES)
_SRC_SET = "|".join(_UNION_SOURCES)

HLL_UNION_SQL = (
    "WITH base AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),\n"
    "bg0 AS (\n"
    f"  SELECT source, {_BIGRAM_SQL} AS bg FROM base\n"
    "),\n"
    f"items0 AS (SELECT source, bg FROM bg0 WHERE bg IS NOT NULL AND source IN ({_SRC_LIST})),\n"
    # per-source registers, then the elementwise-max MERGE
    + S.hll_sql("bg", "source", "items0")
    .strip()
    .lstrip(",")
    .replace("hll AS (", "hll_unused AS (")
    + f""",
merged AS (
  SELECT '{_SRC_SET}' AS source_set, idx, MAX(mj) AS mj FROM regs GROUP BY idx
),
mfolded AS (
  SELECT source_set, COUNT(*) AS used, SUM(power(2.0, -mj)) AS s_present
  FROM merged GROUP BY source_set
),
mhll AS (
  SELECT source_set,
         ({S.HLL_M} - used) AS v_empty,
         ROUND(
           CASE WHEN CAST({S.HLL_ALPHA!r} AS DOUBLE) * {S.HLL_M} * {S.HLL_M}
                     / (s_present + CAST({S.HLL_M} - used AS DOUBLE)) <= CAST({2.5 * S.HLL_M!r} AS DOUBLE)
                 AND ({S.HLL_M} - used) > 0
                THEN CAST({S.HLL_M} AS DOUBLE) * LN(CAST({S.HLL_M} AS DOUBLE) / ({S.HLL_M} - used))
                ELSE CAST({S.HLL_ALPHA!r} AS DOUBLE) * {S.HLL_M} * {S.HLL_M}
                     / (s_present + CAST({S.HLL_M} - used AS DOUBLE))
           END, 4) AS est_distinct
  FROM mfolded
),
truth AS (
  SELECT '{_SRC_SET}' AS source_set, COUNT(DISTINCT bg) AS true_distinct FROM items0
)
SELECT m.source_set, v_empty, est_distinct, true_distinct,
       ROUND(ABS(est_distinct - true_distinct) / CAST(true_distinct AS DOUBLE), 4) AS rel_err
FROM mhll m JOIN truth USING (source_set)
"""
)

register(
    QuerySpec(
        "hll_union_sources",
        hll_union_sources,
        HLL_UNION_SQL,
        doc="union cardinality from merged per-source HLL registers",
        cites="training-data ops: mergeable sketch state (rollup-without-raw-data)",
        tags=("sketch", "text"),
    )
)


# --- DDSketch quantiles (mergeable log-binned quantile sketch) ------------

DD_GAMMA = 1.02  # relative-accuracy parameter: est within ±2% of true value
DD_QS = (0.5, 0.9, 0.99)


def ddsketch_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch-style quantile estimates of order value per priority.

    The mergeable quantile sketch: each positive value maps to bin
    ceil(ln(x)/ln(γ)) — bin counts are additive across partitions/days,
    so like the HLL registers this state rolls up without raw data, and
    any quantile is answered by a cumulative walk of ≤ a few hundred
    bins. Estimate = 2γ^bin/(γ+1) (bucket midpoint) — within γ-1 = 2%
    relative error by construction, which the exact rank-picked value in
    the same row verifies. One groupBy(priority, bin) shuffle of O(bins)
    rows per group; the quantile walk is a window over those bins.
    """
    o = load_table(spark, sf_dir, "orders")
    lg = F.lit(float(__import__("math").log(DD_GAMMA)))
    binned = (
        o.select(
            "o_orderpriority",
            F.ceil(F.log(F.col("o_totalprice")) / lg).cast("long").alias("bin"),
        )
        .groupBy("o_orderpriority", "bin")
        .agg(F.count("*").alias("c"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = binned.select(
        "o_orderpriority",
        "bin",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(
            Window.partitionBy("o_orderpriority").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    # exact rank-picked values (verification column): rn == ceil(q*n)
    rw = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(rw).alias("rn"),
        F.count("*").over(
            Window.partitionBy("o_orderpriority").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    parts = []
    for q in DD_QS:
        rank = F.ceil(F.lit(q) * F.col("n")).cast("long")
        est_bin = cum.where(F.col("cum") >= rank).groupBy("o_orderpriority").agg(
            F.min("bin").alias("qbin")
        )
        est = est_bin.select(
            "o_orderpriority",
            F.lit(q).alias("quantile"),
            F.round(
                F.lit(2.0)
                * F.pow(F.lit(DD_GAMMA), F.col("qbin"))
                / F.lit(DD_GAMMA + 1.0),
                4,
            ).alias("est_value"),
        )
        exact = ranked.where(F.col("rn") == rank).select(
            "o_orderpriority",
            F.lit(q).alias("quantile"),
            F.round("o_totalprice", 4).alias("exact_value"),
        )
        parts.append(est.join(exact, ["o_orderpriority", "quantile"]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "o_orderpriority",
        "quantile",
        "est_value",
        "exact_value",
        F.round(
            F.abs(F.col("est_value") - F.col("exact_value")) / F.col("exact_value"), 4
        ).alias("rel_err"),
    )


import math as _math

_DD_LG = repr(float(_math.log(DD_GAMMA)))

_DD_PER_Q = "\nUNION ALL\n".join(
    f"""
SELECT c.o_orderpriority, CAST({q!r} AS DOUBLE) AS quantile,
       ROUND(2.0 * power({DD_GAMMA!r}, qbin) / ({DD_GAMMA!r} + 1.0), 4) AS est_value,
       exact_value
FROM (
  SELECT o_orderpriority, MIN(bin) AS qbin
  FROM cum WHERE cum >= CAST(ceil({q!r} * n) AS BIGINT)
  GROUP BY o_orderpriority
) c
JOIN (
  SELECT o_orderpriority, ROUND(o_totalprice, 4) AS exact_value
  FROM ranked WHERE rn = CAST(ceil({q!r} * n) AS BIGINT)
) e USING (o_orderpriority)
"""
    for q in DD_QS
)

DDSKETCH_SQL = f"""
WITH binned AS (
  SELECT o_orderpriority,
         CAST(ceil(ln(o_totalprice) / CAST({_DD_LG} AS DOUBLE)) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM orders GROUP BY 1, 2
),
cum AS (
  SELECT o_orderpriority, bin,
         SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY o_orderpriority) AS n
  FROM binned
),
ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
per_q AS ({_DD_PER_Q})
SELECT o_orderpriority, quantile, est_value, exact_value,
       ROUND(ABS(est_value - exact_value) / exact_value, 4) AS rel_err
FROM per_q
"""

register(
    QuerySpec(
        "ddsketch_price_quantiles",
        ddsketch_price_quantiles,
        DDSKETCH_SQL,
        doc="DDSketch log-binned quantile estimates vs exact rank picks",
        cites="training-data ops: mergeable quantile sketch (distribution monitoring)",
        tags=("sketch", "agg", "percentile"),
    )
)


def bloom_fpr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured vs theoretical Bloom false-positive rate: probe the eval
    filter ONLY with bigrams provably absent from the eval set (exact
    anti-join), so every positive is a false positive. The measured rate
    should track (1 − (1 − 1/m)^{kn})^k — a materially higher value means
    the k hash slices are correlated, the failure mode that silently
    inflates decontamination losses. Membership bits are integers, the
    theoretical curve is one fixed double expression of the exact set
    size: both hash-verify."""
    bg = _doc_bigrams(spark, sf_dir)
    eval_bg = bg.where(F.col("source") == EVAL_SOURCE).select("bg").distinct()
    bloom = S.bloom_build(eval_bg, F.col("bg"))
    absent = (
        bg.where(F.col("source") != EVAL_SOURCE)
        .select("bg")
        .distinct()
        .join(eval_bg, "bg", "left_anti")
    )
    flagged = S.bloom_maybe_contains(absent, "bg", bloom)
    occupancy = bloom.agg(F.count(F.lit(1)).alias("bits_set"))
    res = flagged.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.col("maybe_member").cast("bigint")).alias("n_false_pos"),
    )
    r = f"(CAST(bits_set AS DOUBLE) / {S.BLOOM_BITS})"
    return res.crossJoin(F.broadcast(occupancy)).selectExpr(
        "n_probes",
        "n_false_pos",
        "bits_set",
        "round(CAST(n_false_pos AS DOUBLE) / n_probes, 4) AS measured_fpr",
        f"round({r} * {r} * {r}, 4) AS theoretical_fpr",
    )


def _bloom_fpr_sql() -> str:
    from analytics_data_platform_spark.queries import REGISTRY

    base = REGISTRY["bloom_contamination"].oracle
    # reuse the base oracle's CTE chain (ends with `verdicts AS (...)`),
    # continuing the WITH list with the absent-probe calibration CTEs
    head = base[: base.index("SELECT doc_id, COUNT(*)")].rstrip()
    assert head.endswith(")")
    return f"""{head},
absent AS (
  SELECT DISTINCT t.bg FROM train t
  LEFT JOIN (SELECT DISTINCT bg FROM allbg WHERE source = 'src0') ev ON t.bg = ev.bg
  WHERE ev.bg IS NULL
),
aprobes AS (
  SELECT bg, unnest([(('0x' || substr(md5('bloom0:' || bg), 1, 8))::BIGINT % 4096),
                     (('0x' || substr(md5('bloom1:' || bg), 1, 8))::BIGINT % 4096),
                     (('0x' || substr(md5('bloom2:' || bg), 1, 8))::BIGINT % 4096)]) AS pos
  FROM absent
),
ahits AS (
  SELECT bg, COUNT(*) AS n_hit FROM aprobes JOIN bloom USING (pos) GROUP BY bg
),
averdicts AS (
  SELECT a.bg, (COALESCE(h.n_hit, 0) = 3) AS fp
  FROM absent a LEFT JOIN ahits h ON a.bg = h.bg
),
occ AS (SELECT COUNT(*) AS bits_set FROM bloom)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN fp THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       CAST(bits_set AS BIGINT) AS bits_set,
       ROUND(SUM(CASE WHEN fp THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 4) AS measured_fpr,
       ROUND((CAST(bits_set AS DOUBLE) / 4096) * (CAST(bits_set AS DOUBLE) / 4096)
             * (CAST(bits_set AS DOUBLE) / 4096), 4) AS theoretical_fpr
FROM averdicts, occ
GROUP BY bits_set
"""


register(
    QuerySpec(
        "bloom_fpr_calibration",
        bloom_fpr_calibration,
        _bloom_fpr_sql(),
        doc="measured vs theoretical Bloom FPR on provably-absent probes",
        cites="self-evaluation family; composes bloom_contamination's filter",
        tags=("sketch", "eval", "approx"),
    )
)


# --- Misra-Gries heavy hitters (sketch-prune + exact verify) ---------------

HH_K = 30  # heavy hitter = token with count > n / HH_K


def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (count > n/30) found the scalable way:
    Misra-Gries candidate pruning, then an exact count of candidates only.

    Phase 1 (operators/sketches.py::mg_candidates) summarizes each
    partition with 64 counters and unions the survivors — fixed memory,
    ≤64 rows shuffled per partition, provably a superset of every true
    heavy hitter under any partitioning. Phase 2 semi-joins the exploded
    token stream against the broadcast candidate set and exact-counts
    just those tokens, so the groupBy shuffles O(|candidates|) keys
    instead of the full vocabulary (at 100 TB the long tail IS the
    shuffle). The output is exact counts — the sketch only prunes, never
    approximates, which is why a strict SQL oracle exists at all (the
    DuckDB side counts everything and applies the same threshold).
    """
    from analytics_data_platform_spark.operators.sketches import mg_candidates

    d = load_table(spark, sf_dir, "documents")
    cand = mg_candidates(d.select(F.split("text", " ").alias("t")))
    toks = d.select(F.explode(F.split("text", " ")).alias("token")).where(
        F.col("token") != ""
    )
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    counts = (
        toks.join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n_occurrences") * HH_K > F.col("n"))
        .select(
            "token",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("n"), 6).alias("share"),
        )
    )


HH_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
t2 AS (SELECT token FROM toks WHERE token <> ''),
tot AS (SELECT COUNT(*) AS n FROM t2),
c AS (SELECT token, COUNT(*) AS n_occurrences FROM t2 GROUP BY token)
SELECT token,
       CAST(n_occurrences AS BIGINT) AS n_occurrences,
       ROUND(n_occurrences / CAST(n AS DOUBLE), 6) AS share
FROM c, tot
WHERE n_occurrences * {HH_K} > n
"""

register(
    QuerySpec(
        "heavy_hitters_tokens",
        heavy_hitters_tokens,
        HH_SQL,
        doc="exact heavy hitters via Misra-Gries candidate pruning + exact verify",
        cites="training-data ops: frequent-token/boilerplate detection at corpus scale",
        tags=("sketch", "text"),
    )
)


# --- streaming HLL register-state merge ------------------------------------


def streaming_sketch_merge_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SKETCH-STATE ingestion: documents arrive in two
    foreachBatch ticks (doc_id parity, shared checkpoint), each tick
    computes the BATCH's per-source HLL bigram registers and merges them
    into persisted register state with ``max(mj)`` per (source, idx).

    This is the monitoring pattern that makes sketches the lakehouse
    cardinality primitive at 100 TB: per-tick state is O(sources × m)
    regardless of batch size, the merge is one bounded-key shuffle, and —
    because register max is associative and commutative — the merged
    state provably equals the one-shot registers over the full corpus.
    The oracle is therefore the one-shot register/estimate SQL (the same
    chain ``hll_distinct_bigrams`` is gated on, minus the exact-truth
    join, which is not incrementally maintainable and not part of the
    state). A dropped tick, a stale register, or a merge that kept the
    smaller rank hash-diverges.

    Predecessor state is selected by batch id (never "latest dir"), so a
    foreachBatch retry is idempotent — same contract as
    pipelines/incremental.py.
    """
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from analytics_data_platform_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    src = f"{sf_dir}/documents.parquet"
    staging = _tempfile.mkdtemp(prefix="adps-sketch-stage-")
    ckpt = _tempfile.mkdtemp(prefix="adps-sketch-ckpt-")
    state = _tempfile.mkdtemp(prefix="adps-sketch-state-")

    def versions(below: int | None = None) -> list[str]:
        out = sorted(
            f"{state}/{d}" for d in _os.listdir(state) if d.startswith("state_v")
        )
        if below is not None:
            out = [v for v in out if int(v.rsplit("state_v", 1)[1]) < below]
        return out

    def merge_batch(bdf: DataFrame, batch_id: int) -> None:
        bg = (
            bdf.select("source", F.split("text", " ").alias("t"))
            .select("source", F.explode(_bigrams_col()).alias("bg"))
            .where(F.col("bg").contains(" "))
        )
        regs = S.hll_registers(bg, F.col("bg"), "source")
        prior = versions(below=int(batch_id))
        if prior:
            regs = (
                spark.read.parquet(prior[-1])
                .unionByName(regs)
                .groupBy("source", "idx")
                .agg(F.max("mj").alias("mj"))
            )
        regs.write.mode("overwrite").parquet(f"{state}/state_v{batch_id:05d}")

    try:
        t = pq.read_table(src)
        even = pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 0)
        schema = spark.read.parquet(src).schema
        for tick, mask in enumerate((even, pc.invert(even))):
            pq.write_table(t.filter(mask), f"{staging}/part-{tick:03d}.parquet")
            q = (
                spark.readStream.schema(schema)
                .parquet(staging)
                .writeStream.foreachBatch(merge_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        merged = spark.read.parquet(versions()[-1])
        out = S.hll_estimate(merged, "source").select(
            "source", "v_empty", "est_distinct"
        )
        rows = out.collect()  # bounded: |sources| rows
        out_schema = out.schema
    finally:
        for d in (staging, ckpt, state):
            _shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, out_schema)


STREAM_SKETCH_SQL = (
    "WITH base AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),\n"
    "bg AS (\n"
    f"  SELECT source, {_BIGRAM_SQL} AS bg FROM base\n"
    "),\n"
    "items AS (SELECT source, bg FROM bg WHERE bg IS NOT NULL),\n"
    + S.hll_sql("bg", "source", "items").strip().lstrip(",")
    + """
SELECT source, v_empty, est_distinct FROM hll
"""
)

def _sketch_merge_internal(spark, sf_dir):
    """The per-tick plan the materialized result hides from the ledger:
    batch registers (even half as prior state, odd half as the new batch)
    merged via the bounded-key register-max shuffle, then the estimate
    chain — one frame covering the whole tick plan."""
    docs = load_table(spark, sf_dir, "documents")

    def regs_of(df: DataFrame) -> DataFrame:
        bg = (
            df.select("source", F.split("text", " ").alias("t"))
            .select("source", F.explode(_bigrams_col()).alias("bg"))
            .where(F.col("bg").contains(" "))
        )
        return S.hll_registers(bg, F.col("bg"), "source")

    prior = regs_of(docs.where(F.col("doc_id") % 2 == 0))
    batch = regs_of(docs.where(F.col("doc_id") % 2 == 1))
    merged = (
        prior.unionByName(batch)
        .groupBy("source", "idx")
        .agg(F.max("mj").alias("mj"))
    )
    est = S.hll_estimate(merged, "source").select("source", "v_empty", "est_distinct")
    return [("merge_and_estimate", est)]


register(
    QuerySpec(
        "streaming_sketch_merge_state",
        streaming_sketch_merge_state,
        STREAM_SKETCH_SQL,
        doc="streaming HLL register-state merge across two foreachBatch ticks; associative register max makes the merged state provably equal the one-shot sketch",
        cites="operators/sketches.py hll_registers/hll_estimate; SURVEY §2.10 incremental state; Flajolet et al. HLL mergeability",
        tags=("sketch", "streaming", "scale", "multi_tick"),
        internal_plan=_sketch_merge_internal,
    )
)
