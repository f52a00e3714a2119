"""Text-analysis / dedup queries over the ``documents`` table.

The large-scale training-data operators (BASELINE.json north star): token
counting, quality scoring, language-ID, fingerprinting, exact + n-gram-
Jaccard dedup. All hot-path expressions are JVM built-ins (regexp/hash) —
no Python UDFs — so they scale to a 100 TB documents table; the DuckDB
oracles pin the exact semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.functions import text as T
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.word_count("text").alias("n_words"),
        T.char_len("text").alias("n_chars_obs"),
        T.punct_count("text").alias("n_punct"),
    )


TEXT_TOKEN_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
       length(text) AS n_chars_obs,
       len(regexp_extract_all(text, '[.,;:!?''"()\-]')) AS n_punct
FROM documents
"""

register(
    QuerySpec(
        "text_token_stats",
        text_token_stats,
        TEXT_TOKEN_SQL,
        doc="token/word/char/punct counting per document",
        cites="training-data ops: token counting (BASELINE.json north star)",
        bench=True,
        tags=("text",),
    )
)


def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("source", T.quality_score("text").alias("q"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
        )
    )


TEXT_QUALITY_SQL = r"""
WITH scored AS (
  SELECT source,
    ((CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
           AND length(text) * 1.0 / len(regexp_extract_all(text, '\S+')) BETWEEN 3.0 AND 10.0
           THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN length(text) > 0
             AND len(regexp_extract_all(text, '[.,;:!?''"()\-]')) * 1.0 / length(text) < 0.10
             THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) > 0
             THEN 1.0 ELSE 0.0 END)) / 3.0 AS q
  FROM documents
)
SELECT source, COUNT(*) AS n_docs, ROUND(AVG(q), 4) AS avg_quality
FROM scored GROUP BY source
"""

register(
    QuerySpec(
        "text_quality_by_source",
        text_quality_by_source,
        TEXT_QUALITY_SQL,
        doc="heuristic quality scoring (length/punct/stopword) per source",
        cites="training-data ops: quality scoring",
        bench=True,
        tags=("text",),
    )
)


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", T.lang_guess("text").alias("lang_guess"))


LANG_ID_SQL = r"""
WITH s AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS s_en,
         len(regexp_extract_all(lower(text), '\b(der|die|und|ist|nicht)\b')) AS s_de,
         len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b')) AS s_fr
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
            WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
            WHEN s_fr > 0 THEN 'fr'
            ELSE 'und' END AS lang_guess
FROM s
"""

register(
    QuerySpec(
        "lang_id_heuristic",
        lang_id_heuristic,
        LANG_ID_SQL,
        doc="stopword-marker language identification",
        cites="training-data ops: language-ID heuristic",
        tags=("text",),
    )
)


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable fingerprint: md5 of normalized text."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", T.fingerprint("text").alias("fingerprint"))


FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                               '\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""

register(
    QuerySpec(
        "doc_fingerprints",
        doc_fingerprints,
        FINGERPRINT_SQL,
        doc="document fingerprinting (md5 of normalized text)",
        cites="training-data ops: document fingerprinting",
        tags=("text", "dedup"),
    )
)


def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup accounting per source: docs vs distinct normalized texts.

    Scale path: countDistinct over a hash groups map-side; at 100 TB this is
    a single shuffle on (source) with partial aggregation — no row explosion.
    """
    d = load_table(spark, sf_dir, "documents")
    # fingerprint projected once per row; the distinct-agg expansion then
    # carries a 32-byte hash, not the regexp chain re-evaluated per branch
    fp = d.select("source", T.fingerprint("text").alias("_fp"))
    return (
        fp.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.countDistinct("_fp").alias("n_unique"))
        .select(
            "source",
            "n_docs",
            "n_unique",
            (F.col("n_docs") - F.col("n_unique")).alias("n_dup"),
        )
    )


DEDUP_EXACT_SQL = r"""
WITH fp AS (
  SELECT source,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                 '\s+', ' ', 'g'))) AS f
  FROM documents
)
SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT f) AS n_unique,
       COUNT(*) - COUNT(DISTINCT f) AS n_dup
FROM fp GROUP BY source
"""

register(
    QuerySpec(
        "dedup_exact_stats",
        dedup_exact_stats,
        DEDUP_EXACT_SQL,
        doc="exact (hash) dedup accounting per source",
        cites="training-data ops: exact dedup (hash-groupBy)",
        bench=True,
        tags=("dedup",),
    )
)


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (token 3-gram shingles).

    Candidate generation by shingle equi-join (docs sharing ≥1 shingle), then
    |A∩B| / (|A|+|B|-|A∩B|). Scale note: the shingle join is the LSH-free
    exact formulation — quadratic in the worst case; at 100 TB use
    near-dup MinHash-LSH (operators.dedup) for candidates and this only to
    verify candidate pairs.
    """
    from analytics_data_platform_spark.functions.expr import spread
    from analytics_data_platform_spark.operators.dedup import shingle_tokens

    d = load_table(spark, sf_dir, "documents")
    # let-bound shingles (operators.dedup) — tokenization runs once per
    # doc, not once per shingle — and spread() keeps the projection
    # core-parallel on a small single-split scan
    sh = (
        spread(d.select("doc_id", "text"))
        .select("doc_id", F.explode(shingle_tokens("text", 3)).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .where(F.col("jaccard") >= 0.2)
    )


NGRAM_JACCARD_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                          '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM norm, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)
  WHERE len(toks) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.2
"""

register(
    QuerySpec(
        "ngram_jaccard_pairs",
        ngram_jaccard_pairs,
        NGRAM_JACCARD_SQL,
        doc="exact n-gram Jaccard near-duplicate pairs",
        cites="training-data ops: n-gram Jaccard near-dup",
        tags=("dedup",),
    )
)


# --- Gopher-style repetition quality filters ------------------------------


def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals per document (the Gopher/MassiveText
    filter family): unique-token ratio, most-frequent-token fraction and
    most-frequent-bigram fraction, plus the resulting keep/drop flag.

    Token and bigram frequencies are computed by explode + groupBy on
    (doc_id, gram) — the shuffle key is high-cardinality, so the op is a
    linear scan at 100 TB (per-row HOF mode-counting would be O(len²) per
    doc; the exploded formulation is the scale-correct shape)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("t"))
        .withColumn("n_tokens", F.size("t"))
    )
    tok_stats = (
        d.select("doc_id", "n_tokens", F.explode("t").alias("w"))
        .groupBy("doc_id", "n_tokens", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n_tokens")
        .agg(F.count("*").alias("n_distinct"), F.max("c").alias("top_tok"))
    )
    bigrams = F.zip_with(
        "t",
        F.expr("slice(t, 2, greatest(size(t) - 1, 0))"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    big_stats = (
        d.select("doc_id", F.explode(bigrams).alias("bg"))
        .where(F.col("bg").contains(" "))  # zip_with pads the tail with null -> no space
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_big"))
    )
    uniq_ratio = F.col("n_distinct") / F.col("n_tokens")
    top_token_frac = F.col("top_tok") / F.col("n_tokens")
    top_bigram_frac = F.col("top_big") / (F.col("n_tokens") - 1)
    return tok_stats.join(big_stats, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(uniq_ratio, 6).alias("uniq_token_ratio"),
        F.round(top_token_frac, 6).alias("top_token_frac"),
        F.round(top_bigram_frac, 6).alias("top_bigram_frac"),
        ((uniq_ratio >= 0.3) & (top_bigram_frac <= 0.18)).alias("quality_pass"),
    )


REPETITION_SQL = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
tok_c AS (
  SELECT doc_id, n_tokens, w, COUNT(*) AS c
  FROM (SELECT doc_id, n_tokens, unnest(t) AS w FROM base)
  GROUP BY doc_id, n_tokens, w
),
tok_s AS (
  SELECT doc_id, n_tokens, COUNT(*) AS n_distinct, MAX(c) AS top_tok
  FROM tok_c GROUP BY doc_id, n_tokens
),
big_c AS (
  SELECT doc_id, bg, COUNT(*) AS c
  FROM (
    SELECT doc_id,
           unnest(list_transform(list_zip(t, list_slice(t, 2, len(t))),
                                 x -> x[1] || ' ' || x[2])) AS bg
    FROM base
  )
  WHERE bg IS NOT NULL
  GROUP BY doc_id, bg
),
big_s AS (SELECT doc_id, MAX(c) AS top_big FROM big_c GROUP BY doc_id)
SELECT t.doc_id, t.n_tokens,
       ROUND(n_distinct / CAST(t.n_tokens AS DOUBLE), 6) AS uniq_token_ratio,
       ROUND(top_tok / CAST(t.n_tokens AS DOUBLE), 6) AS top_token_frac,
       ROUND(top_big / CAST(t.n_tokens - 1 AS DOUBLE), 6) AS top_bigram_frac,
       (n_distinct / CAST(t.n_tokens AS DOUBLE) >= 0.3
        AND top_big / CAST(t.n_tokens - 1 AS DOUBLE) <= 0.18) AS quality_pass
FROM tok_s t JOIN big_s b ON t.doc_id = b.doc_id
"""

register(
    QuerySpec(
        "repetition_quality",
        repetition_quality,
        REPETITION_SQL,
        doc="Gopher-style repetition filters (unique-ratio, top token/bigram fraction)",
        cites="training-data ops: quality scoring (MassiveText filter family)",
        tags=("text", "quality"),
    )
)


# --- TF-IDF keyword extraction --------------------------------------------


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf.

    Term frequencies and document frequencies come from one exploded
    groupBy each (tf reused for df — single scan of the corpus); the
    corpus size joins in as a broadcast 1-row aggregate, never a driver
    collect. Ranking happens on the ROUNDED score with a term tie-break
    so the cut is reproducible across engines; the per-doc window sorts
    only each doc's distinct terms."""
    tf = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = tf.select("doc_id").distinct().agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "tfidf")
    )


TFIDF_SQL = """
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
scored AS (
  SELECT doc_id, tf.term,
         ROUND(tf * LN(n_docs / CAST(df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, rank, term, tfidf FROM ranked WHERE rank <= 3
"""

register(
    QuerySpec(
        "tfidf_top_terms",
        tfidf_top_terms,
        TFIDF_SQL,
        doc="tf-idf top-3 characteristic terms per document",
        cites="training-data ops: document fingerprinting / keyword features",
        tags=("text",),
    )
)


# --- unigram-LM surprisal (perplexity-proxy quality signal) ---------------


def unigram_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity proxy: score each document by the mean
    negative log-probability of its tokens under the corpus's own unigram
    LM. High surprisal = rare-token-heavy (gibberish or OOD); low =
    boilerplate. The LM "training" is one token-keyed groupBy over the
    exploded corpus; scoring joins tokens back to their frequencies on
    the same key — two linear shuffles, no driver state, so the op runs
    unchanged over a 100 TB corpus."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    )
    total = tok.agg(F.count("*").alias("total"))
    freq = tok.groupBy("term").agg(F.count("*").alias("tf"))
    return (
        tok.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("tf") / F.col("total"))), 6).alias("mean_surprisal"),
        )
    )


SURPRISAL_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM tok),
freq AS (SELECT term, COUNT(*) AS tf FROM tok GROUP BY term)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(AVG(-LN(tf / total)), 6) AS mean_surprisal
FROM tok JOIN freq ON tok.term = freq.term CROSS JOIN total
GROUP BY doc_id
"""

register(
    QuerySpec(
        "unigram_surprisal_score",
        unigram_surprisal_score,
        SURPRISAL_SQL,
        doc="unigram-LM mean surprisal per doc (perplexity-proxy quality filter)",
        cites="training-data ops: quality scoring (CCNet perplexity-bucket analogue)",
        tags=("text", "quality"),
    )
)


# --- PMI collocation extraction -------------------------------------------


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-token collocations by pointwise mutual information:
    PMI(a,b) = ln( P(ab) / (P(a) P(b)) ) over corpus-wide adjacency
    counts, min support 5. One exploded unigram groupBy + one exploded
    bigram groupBy + two term-keyed joins — every shuffle key is a token,
    so the op stays linear on a 100 TB corpus. Ranking happens on the
    ROUNDED score with a bigram tie-break (engine-reproducible cut)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("t"))
    uni = (
        d.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    bigrams = F.zip_with(
        "t",
        F.expr("slice(t, 2, greatest(size(t) - 1, 0))"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    big = (
        d.select(F.explode(bigrams).alias("bg"))
        .where(F.col("bg").contains(" "))
        .groupBy("bg")
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= 5)
    )
    totals = uni.agg(
        F.sum("c").cast("double").alias("t_uni"),
    ).crossJoin(
        d.select(
            F.sum(F.greatest(F.size("t") - 1, F.lit(0))).cast("double").alias("t_big")
        )
    )
    ua = uni.select(F.col("term").alias("term_a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("c").alias("c_b"))
    scored = (
        big.withColumn("term_a", F.split("bg", " ")[0])
        .withColumn("term_b", F.split("bg", " ")[1])
        .join(ua, "term_a")
        .join(ub, "term_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "bg",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("t_big"))
                    / ((F.col("c_a") / F.col("t_uni")) * (F.col("c_b") / F.col("t_uni")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.desc("pmi"), "bg")
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= 20)
        .select("pos", "bg", "c_ab", "pmi")
    )


PMI_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
uni AS (
  SELECT term, COUNT(*) AS c
  FROM (SELECT unnest(t) AS term FROM d) GROUP BY term
),
big AS (
  SELECT bg, COUNT(*) AS c_ab
  FROM (
    SELECT unnest(list_transform(list_zip(t, list_slice(t, 2, len(t))),
                                 x -> x[1] || ' ' || x[2])) AS bg
    FROM d
  )
  WHERE bg IS NOT NULL
  GROUP BY bg HAVING COUNT(*) >= 5
),
totals AS (
  SELECT (SELECT CAST(SUM(c) AS DOUBLE) FROM uni) AS t_uni,
         (SELECT CAST(SUM(GREATEST(len(t) - 1, 0)) AS DOUBLE) FROM d) AS t_big
),
scored AS (
  SELECT bg, c_ab,
         ROUND(LN((c_ab / t_big) / ((ua.c / t_uni) * (ub.c / t_uni))), 6) AS pmi
  FROM big
  JOIN uni ua ON ua.term = string_split(bg, ' ')[1]
  JOIN uni ub ON ub.term = string_split(bg, ' ')[2]
  CROSS JOIN totals
)
SELECT * FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY pmi DESC, bg) AS pos, bg, c_ab, pmi FROM scored
) WHERE pos <= 20
"""

register(
    QuerySpec(
        "pmi_collocations",
        pmi_collocations,
        PMI_SQL,
        doc="PMI collocation extraction (top adjacent-token associations)",
        cites="training-data ops: vocabulary/collocation analysis",
        tags=("text",),
    )
)


# --- overlap-coefficient containment pairs --------------------------------


def ngram_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: overlap coefficient
    |A∩B| / min(|A|,|B|) over token 3-gram shingle sets. Jaccard misses
    the "small doc fully quoted inside a big doc" case (the union term
    swamps the intersection); overlap ≥ 0.5 catches it. Same
    shingle-equi-join candidate shape as ngram_jaccard_pairs — at 100 TB
    the candidate pairs come from MinHash-LSH and this verifies them."""
    from analytics_data_platform_spark.functions.expr import spread
    from analytics_data_platform_spark.operators.dedup import shingle_tokens

    d = load_table(spark, sf_dir, "documents")
    sh = (
        spread(d.select("doc_id", "text"))
        .select("doc_id", F.explode(shingle_tokens("text", 3)).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    overlap = F.col("n_inter") / F.least("n_a", "n_b")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(overlap, 4).alias("overlap"))
        .where(F.col("overlap") >= 0.5)
    )


NGRAM_OVERLAP_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                          '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM norm, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)
  WHERE len(toks) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(n_inter * 1.0 / LEAST(sa.n_sh, sb.n_sh), 4) AS overlap
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(n_inter * 1.0 / LEAST(sa.n_sh, sb.n_sh), 4) >= 0.5
"""

register(
    QuerySpec(
        "ngram_overlap_pairs",
        ngram_overlap_pairs,
        NGRAM_OVERLAP_SQL,
        doc="overlap-coefficient containment pairs (small-doc-inside-big-doc dedup)",
        cites="training-data ops: containment/overlap near-dup",
        tags=("dedup",),
    )
)


# --- per-source median quality gate ---------------------------------------


def quality_median_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality gate: keep documents strictly above their source's
    median quality score (exact percentile, not approx — the driver
    compares hashes). Per-source thresholding is the standard corpus-prep
    move when sources have different quality baselines; the plan is one
    groupBy(source) percentile + a broadcast join back (sources are
    low-cardinality dims even at 100 TB). Comparison happens on ROUNDED
    values so engine ulp differences in interpolation cannot flip rows."""
    from analytics_data_platform_spark.functions import text as T

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.round(T.quality_score("text"), 4).alias("q")
    )
    med = d.groupBy("source").agg(
        F.round(F.percentile("q", F.lit(0.5)), 4).alias("q_median")
    )
    return (
        d.join(F.broadcast(med), "source")
        .where(F.col("q") > F.col("q_median"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.round(F.avg("q"), 4).alias("kept_avg_q"))
        .join(med, "source")
        .select("source", "q_median", "n_kept", "kept_avg_q")
    )


QUALITY_MEDIAN_SQL = r"""
WITH scored AS (
  SELECT doc_id, source,
    ROUND(((CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
           AND length(text) * 1.0 / len(regexp_extract_all(text, '\S+')) BETWEEN 3.0 AND 10.0
           THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN length(text) > 0
             AND len(regexp_extract_all(text, '[.,;:!?''"()\-]')) * 1.0 / length(text) < 0.10
             THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) > 0
             THEN 1.0 ELSE 0.0 END)) / 3.0, 4) AS q
  FROM documents
),
med AS (
  SELECT source, ROUND(quantile_cont(q, 0.5), 4) AS q_median
  FROM scored GROUP BY source
)
SELECT s.source, m.q_median, COUNT(*) AS n_kept, ROUND(AVG(s.q), 4) AS kept_avg_q
FROM scored s JOIN med m ON s.source = m.source
WHERE s.q > m.q_median
GROUP BY s.source, m.q_median
"""

register(
    QuerySpec(
        "quality_median_filter",
        quality_median_filter,
        QUALITY_MEDIAN_SQL,
        doc="per-source median quality gate (exact percentile threshold join)",
        cites="training-data ops: adaptive quality filtering",
        tags=("text", "quality"),
    )
)


# GPT-style pre-tokenizer (lookahead-free so RE2 engines match Java):
# contraction suffixes, space-prefixed letter runs, digit runs, punct runs.
_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def pretoken_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization counts per document.

    Whitespace counting (text_token_stats) underestimates what a BPE
    tokenizer's pre-tokenizer actually splits — punctuation runs, digit
    runs and contraction suffixes become separate pre-tokens. This is
    the cheap JVM-side estimator of tokenizer load a corpus pipeline
    budgets with (the exact BPE merge table stays offline). The regex is
    lookahead-free so Java (Spark) and RE2 (DuckDB/production scanners)
    agree token-for-token."""
    d = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    toks = F.regexp_extract_all(lowered, F.lit(_PRETOKEN_RE), 0)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_pretokens"),
        T.token_count("text").alias("n_ws_tokens"),
        F.round(
            F.size(toks) / F.greatest(T.token_count("text"), F.lit(1)), 4
        ).alias("expansion_ratio"),
    )


_PRETOKEN_RE_SQL = _PRETOKEN_RE.replace("'", "''")  # SQL string-literal escape

PRETOKEN_SQL = rf"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{_PRETOKEN_RE_SQL}')) AS n_pretokens,
       len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
       ROUND(len(regexp_extract_all(lower(text), '{_PRETOKEN_RE_SQL}'))
             / CAST(GREATEST(len(regexp_extract_all(text, '\S+')), 1) AS DOUBLE), 4)
         AS expansion_ratio
FROM documents
"""

register(
    QuerySpec(
        "pretoken_stats",
        pretoken_stats,
        PRETOKEN_SQL,
        doc="BPE-style pre-tokenizer counts vs whitespace tokens",
        cites="training-data ops: token counting (whitespace + BPE-ish regex)",
        tags=("text",),
    )
)


def fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy match over part names: character-trigram
    blocking → candidate pairs → exact edit-distance verify (≤ 3).

    The scale-correct fuzzy-join: dedupe to DISTINCT name strings first
    (entities, not rows — avoids the quadratic blowup of matching every
    row pair that shares a popular name), block on shared trigrams so
    only plausibly-close names ever meet, and run levenshtein only on
    blocked candidates. Part counts per name ride along as merge
    weights."""
    p = load_table(spark, sf_dir, "part")
    names = p.groupBy(F.col("p_name").alias("name")).agg(
        F.count("*").alias("n_parts")
    )
    # substring with a dynamic start needs expr(); build (name, trigram) pairs
    grams = names.select(
        "name",
        F.explode(
            F.array_distinct(
                F.expr("transform(sequence(1, greatest(length(name) - 2, 1)), i -> substring(name, i, 3))")
            )
        ).alias("g"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g")) & (F.col("a.name") < F.col("b.name")),
        )
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .distinct()
    )
    verified = cands.select(
        "name_a", "name_b", F.levenshtein("name_a", "name_b").alias("edit_dist")
    ).where(F.col("edit_dist") <= 3)
    na = names.select(F.col("name").alias("name_a"), F.col("n_parts").alias("parts_a"))
    nb = names.select(F.col("name").alias("name_b"), F.col("n_parts").alias("parts_b"))
    return verified.join(na, "name_a").join(nb, "name_b").select(
        "name_a", "name_b", "edit_dist", "parts_a", "parts_b"
    )


FUZZY_SQL = """
WITH names AS (
  SELECT p_name AS name, COUNT(*) AS n_parts FROM part GROUP BY p_name
),
grams AS (
  SELECT DISTINCT name, g
  FROM (
    SELECT name,
           unnest(list_transform(range(1, GREATEST(len(name) - 2, 1) + 1),
                                 i -> substr(name, i, 3))) AS g
    FROM names
  )
),
cands AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM grams a JOIN grams b ON a.g = b.g AND a.name < b.name
),
verified AS (
  SELECT name_a, name_b, levenshtein(name_a, name_b) AS edit_dist
  FROM cands
  WHERE levenshtein(name_a, name_b) <= 3
)
SELECT name_a, name_b, edit_dist, na.n_parts AS parts_a, nb.n_parts AS parts_b
FROM verified
JOIN names na ON na.name = name_a
JOIN names nb ON nb.name = name_b
"""

register(
    QuerySpec(
        "fuzzy_part_names",
        fuzzy_part_names,
        FUZZY_SQL,
        doc="fuzzy name matching: trigram blocking + edit-distance verify",
        cites="training-data ops: entity resolution / fuzzy dedup",
        tags=("text", "dedup", "fuzzy"),
    )
)


# --- RAKE keyword extraction ----------------------------------------------

RAKE_STOPWORDS = (
    "the a an and or of to in is on for with as at by it this that "
    "from be are was were"
).split()
RAKE_TOP = 20


def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al.): candidate phrases are
    maximal stopword-free token runs; each word scores degree/frequency
    over the whole corpus; a phrase scores the sum of its word scores.
    Top phrases by score — unsupervised keyword mining as four key-
    partitioned shuffles (phrase explode → word stats → score join →
    phrase rollup), no Python anywhere.

    The stopword split is a single regexp_replace: the normalized text is
    double-spaced first so ADJACENT stopwords each keep their own
    delimiting spaces (an alternation with shared boundaries would
    otherwise consume them)."""
    alt = "|".join(RAKE_STOPWORDS)
    norm = T.normalized_text(F.col("text"))
    spaced = F.concat(F.lit(" "), F.regexp_replace(norm, " ", "  "), F.lit(" "))
    cut = F.regexp_replace(spaced, f" ({alt}) ", " | ")
    phrases = F.filter(
        F.transform(
            F.split(cut, "\\|"),
            lambda s: F.trim(F.regexp_replace(s, "\\s+", " ")),
        ),
        lambda p: p != "",
    )
    d = load_table(spark, sf_dir, "documents")
    ph = d.select(F.explode(phrases).alias("phrase")).where(
        F.size(F.split(F.col("phrase"), " ")) <= 4
    )
    ph = ph.select("phrase", F.split("phrase", " ").alias("words"))
    w = ph.select(F.col("phrase"), F.explode("words").alias("word"), F.size("words").alias("plen"))
    stats = w.groupBy("word").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("degree")
    )
    scored_words = w.join(stats, "word").select(
        "phrase", (F.col("degree") / F.col("freq")).alias("wscore")
    )
    agg = (
        scored_words.groupBy("phrase")
        .agg(F.round(F.sum("wscore"), 4).alias("score_sum"), F.count("*").alias("n_words"))
    )
    # identical phrases appear once per occurrence above; normalize:
    # score is per-phrase (same every occurrence) -> divide by occurrences
    occ = ph.groupBy("phrase").agg(F.count("*").alias("n_occ"))
    final = (
        agg.join(occ, "phrase")
        .select(
            "phrase",
            "n_occ",
            F.round(F.col("score_sum") / F.col("n_occ"), 4).alias("rake_score"),
        )
    )
    rank = Window.orderBy(F.desc("rake_score"), "phrase")
    return (
        final.withColumn("pos", F.row_number().over(rank))
        .where(F.col("pos") <= RAKE_TOP)
        .select("pos", "phrase", "n_occ", "rake_score")
    )


def _rake_sql() -> str:
    alt = "|".join(RAKE_STOPWORDS)
    norm = (
        r"trim(regexp_replace(regexp_replace(lower(text),"
        r" '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))"
    )
    return f"""
WITH cutup AS (
  SELECT regexp_replace(' ' || regexp_replace({norm}, ' ', '  ', 'g') || ' ',
                        ' ({alt}) ', ' | ', 'g') AS cut
  FROM documents
),
ph AS (
  SELECT trim(regexp_replace(seg, '\\s+', ' ', 'g')) AS phrase
  FROM (SELECT UNNEST(string_split(cut, '|')) AS seg FROM cutup)
  WHERE trim(regexp_replace(seg, '\\s+', ' ', 'g')) <> ''
    AND len(string_split(trim(regexp_replace(seg, '\\s+', ' ', 'g')), ' ')) <= 4
),
w AS (
  SELECT phrase, UNNEST(string_split(phrase, ' ')) AS word,
         len(string_split(phrase, ' ')) AS plen
  FROM ph
),
stats AS (SELECT word, COUNT(*) AS freq, SUM(plen) AS degree FROM w GROUP BY word),
scored AS (
  SELECT w.phrase, CAST(s.degree AS DOUBLE) / s.freq AS wscore
  FROM w JOIN stats s ON w.word = s.word
),
agg AS (
  SELECT phrase, ROUND(SUM(wscore), 4) AS score_sum, COUNT(*) AS n_words
  FROM scored GROUP BY phrase
),
occ AS (SELECT phrase, COUNT(*) AS n_occ FROM ph GROUP BY phrase),
final AS (
  SELECT a.phrase, o.n_occ, ROUND(a.score_sum / o.n_occ, 4) AS rake_score
  FROM agg a JOIN occ o ON a.phrase = o.phrase
)
SELECT pos, phrase, n_occ, rake_score FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rake_score DESC, phrase) AS pos FROM final
) WHERE pos <= {RAKE_TOP}
"""


register(
    QuerySpec(
        "rake_keywords",
        rake_keywords,
        _rake_sql(),
        doc="RAKE keyword extraction (stopword-run phrases, degree/freq scores)",
        cites="text mining: unsupervised keyword extraction (Rose et al.)",
        tags=("text",),
    )
)
