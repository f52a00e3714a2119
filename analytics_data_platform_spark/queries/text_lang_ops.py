"""Language-model / language-ID text queries: per-source term-vector
cosine, lang-ID confusion + kappa evaluation, spell suggestion,
keyness, and the in-engine bigram-LM cross-entropy.

Split out of text_ops.py purely to keep query modules under the
1,500-line hygiene bound; every query keeps its name, oracle, and tags.
Hot-path expressions stay JVM built-ins (regexp/hash) as in text_ops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.functions import text as T
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table


# --- source term-distribution similarity ----------------------------------

SOURCE_SIM_TOP = 10


def source_term_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity of per-source unigram count vectors —
    "which crawls look alike?", the corpus-mix diagnostic run before
    domain-mixture decisions.

    The vectors are never materialized: the dot product is a word-keyed
    self-join of (source, word, count) rows (sparse-vector algebra as
    joins — the only formulation that survives a vocabulary too wide for
    any dense array), norms are per-source aggregates, and everything
    stays integer until the one rounded division. Top pairs by rounded
    cosine with a full tie-break."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "source",
        F.explode(
            F.filter(F.split(T.normalized_text(F.col("text")), " "), lambda x: x != "")
        ).alias("word"),
    )
    counts = words.groupBy("source", "word").agg(F.count("*").alias("n"))
    norms = counts.groupBy("source").agg(F.sum(F.col("n") * F.col("n")).alias("sq"))
    a, b = counts.alias("a"), counts.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.sum(F.col("a.n") * F.col("b.n")).alias("dot"))
    )
    na = norms.select(F.col("source").alias("src_a"), F.col("sq").alias("sq_a"))
    nb = norms.select(F.col("source").alias("src_b"), F.col("sq").alias("sq_b"))
    scored = (
        dots.join(na, "src_a")
        .join(nb, "src_b")
        .select(
            "src_a",
            "src_b",
            F.round(
                F.col("dot") / (F.sqrt("sq_a") * F.sqrt("sq_b")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.orderBy(F.desc("cos_sim"), "src_a", "src_b")
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= SOURCE_SIM_TOP)
        .select("pos", "src_a", "src_b", "cos_sim")
    )


SOURCE_SIM_SQL = f"""
WITH words AS (
  SELECT source,
         UNNEST(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), ' '), x -> x <> '')) AS word
  FROM documents
),
counts AS (SELECT source, word, COUNT(*) AS n FROM words GROUP BY source, word),
norms AS (SELECT source, SUM(n * n) AS sq FROM counts GROUP BY source),
dots AS (
  SELECT a.source AS src_a, b.source AS src_b, SUM(a.n * b.n) AS dot
  FROM counts a JOIN counts b ON a.word = b.word AND a.source < b.source
  GROUP BY 1, 2
),
scored AS (
  SELECT d.src_a, d.src_b,
         ROUND(d.dot / (SQRT(na.sq) * SQRT(nb.sq)), 6) AS cos_sim
  FROM dots d
  JOIN norms na ON na.source = d.src_a
  JOIN norms nb ON nb.source = d.src_b
)
SELECT pos, src_a, src_b, cos_sim FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, src_a, src_b) AS pos FROM scored
) WHERE pos <= {SOURCE_SIM_TOP}
"""


register(
    QuerySpec(
        "source_term_cosine",
        source_term_cosine,
        SOURCE_SIM_SQL,
        doc="per-source term-distribution cosine via word-keyed sparse dot products",
        cites="corpus-mix diagnostics; sparse-vector algebra as joins",
        tags=("text", "stats"),
    )
)


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + per-class precision/recall for the n-gram
    language-ID heuristic against the labeled `lang` column — the
    evaluation loop every classifier in the corpus pipeline needs. One
    groupBy over (label, prediction); the rate columns are single double
    divisions of exact counts against broadcast per-class totals."""
    d = load_table(spark, sf_dir, "documents")
    pred = d.select("lang", T.lang_guess("text").alias("guess"))
    cm = pred.groupBy("lang", "guess").agg(F.count(F.lit(1)).alias("n"))
    by_label = cm.groupBy("lang").agg(F.sum("n").alias("n_label"))
    by_guess = cm.groupBy("guess").agg(F.sum("n").alias("n_guess"))
    return (
        cm.join(F.broadcast(by_label), "lang")
        .join(F.broadcast(by_guess), "guess")
        .select(
            "lang",
            "guess",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_label"), 6).alias("recall_share"),
            F.round(F.col("n").cast("double") / F.col("n_guess"), 6).alias("precision_share"),
        )
        .orderBy("lang", "guess")
    )


LANG_CONFUSION_SQL = r"""
WITH s AS (
  SELECT lang,
         len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS s_en,
         len(regexp_extract_all(lower(text), '\b(der|die|und|ist|nicht)\b')) AS s_de,
         len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b')) AS s_fr
  FROM documents
),
pred AS (
  SELECT lang,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
              WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
              WHEN s_fr > 0 THEN 'fr'
              ELSE 'und' END AS guess
  FROM s
),
cm AS (SELECT lang, guess, COUNT(*) AS n FROM pred GROUP BY 1, 2),
bl AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_label FROM cm GROUP BY 1),
bg AS (SELECT guess, CAST(SUM(n) AS BIGINT) AS n_guess FROM cm GROUP BY 1)
SELECT cm.lang, cm.guess, cm.n,
       ROUND(CAST(cm.n AS DOUBLE) / bl.n_label, 6) AS recall_share,
       ROUND(CAST(cm.n AS DOUBLE) / bg.n_guess, 6) AS precision_share
FROM cm JOIN bl ON cm.lang = bl.lang JOIN bg ON cm.guess = bg.guess
ORDER BY cm.lang, cm.guess
"""

register(
    QuerySpec(
        "lang_id_confusion",
        lang_id_confusion,
        LANG_CONFUSION_SQL,
        doc="confusion matrix + precision/recall shares for the language-ID heuristic",
        cites="evaluation of lang_id_heuristic; confusion idiom of naive_bayes_source",
        tags=("text", "eval"),
    )
)


def lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the language-ID heuristic: chance-corrected
    agreement between labels and predictions. Observed and expected
    agreement both come from exact confusion-matrix counts — expected =
    Σ (row_total · col_total) / n², computed in cleared-denominator form
    so only the final kappa divides."""
    d = load_table(spark, sf_dir, "documents")
    pred = d.select("lang", T.lang_guess("text").alias("guess"))
    cm = pred.groupBy("lang", "guess").agg(F.count(F.lit(1)).alias("c"))
    rows = cm.groupBy("lang").agg(F.sum("c").alias("rt"))
    cols = cm.groupBy("guess").agg(F.sum("c").alias("ct"))
    agree = cm.where(F.col("lang") == F.col("guess")).agg(
        F.sum("c").alias("po_num")
    )
    exp = (
        rows.join(cols, rows["lang"] == cols["guess"])
        .agg(F.sum(F.col("rt") * F.col("ct")).alias("pe_num"))
    )
    n = pred.agg(F.count(F.lit(1)).alias("n"))
    return (
        agree.crossJoin(exp)
        .crossJoin(n)
        .selectExpr(
            "n AS n_docs",
            "round(CAST(po_num AS DOUBLE) / n, 6) AS observed_agreement",
            "round(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS expected_agreement",
            "round((CAST(po_num AS DOUBLE) * n - pe_num)"
            " / (CAST(n AS DOUBLE) * n - pe_num), 6) AS kappa",
        )
    )


KAPPA_SQL = r"""
WITH s AS (
  SELECT lang,
         len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS s_en,
         len(regexp_extract_all(lower(text), '\b(der|die|und|ist|nicht)\b')) AS s_de,
         len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b')) AS s_fr
  FROM documents
),
pred AS (
  SELECT lang,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
              WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
              WHEN s_fr > 0 THEN 'fr'
              ELSE 'und' END AS guess
  FROM s
),
cm AS (SELECT lang, guess, COUNT(*) AS c FROM pred GROUP BY 1, 2),
rt AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS rt FROM cm GROUP BY 1),
ct AS (SELECT guess, CAST(SUM(c) AS BIGINT) AS ct FROM cm GROUP BY 1),
po AS (SELECT CAST(SUM(c) AS BIGINT) AS po_num FROM cm WHERE lang = guess),
pe AS (
  SELECT CAST(SUM(rt.rt * ct.ct) AS BIGINT) AS pe_num
  FROM rt JOIN ct ON rt.lang = ct.guess
),
nn AS (SELECT COUNT(*) AS n FROM pred)
SELECT n AS n_docs,
       ROUND(CAST(po_num AS DOUBLE) / n, 6) AS observed_agreement,
       ROUND(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS expected_agreement,
       ROUND((CAST(po_num AS DOUBLE) * n - pe_num)
             / (CAST(n AS DOUBLE) * n - pe_num), 6) AS kappa
FROM po, pe, nn
"""

register(
    QuerySpec(
        "lang_id_kappa",
        lang_id_kappa,
        KAPPA_SQL,
        doc="Cohen's kappa (chance-corrected agreement) for the language-ID heuristic",
        cites="agreement stat over lang_id_confusion's matrix",
        tags=("text", "eval", "stats"),
    )
)


# --- spell suggestion: banded edit-distance join ---------------------------

SPELL_VOCAB_N = 30


def spell_suggest_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did-you-mean: for deterministic misspellings (each top-vocab term
    with its 2nd character dropped), suggest the nearest vocabulary term
    by Levenshtein distance. The candidate join is BLOCKED on length
    bands (|len(query) − len(term)| ≤ 1 guarantees distance ≤ 1 edits of
    length change) — a 3-key explode + equi-join, so the edit-distance
    UDF-free comparison runs on O(vocab per band), never vocab² —
    the same banding idea the MinHash/SimHash operators use.

    Output proves round-trip recovery: hit = (suggestion == original)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.length("tok") >= 4
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    w_top = Window.orderBy(F.desc("n"), "tok")
    vocab = (
        freq.withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") <= SPELL_VOCAB_N)
        .select(F.col("tok").alias("term"))
    )
    queries = vocab.select(
        F.col("term").alias("truth"),
        F.concat(F.substring("term", 1, 1), F.expr("substring(term, 3)")).alias("q"),
    )
    banded = queries.select(
        "truth", "q",
        F.explode(
            F.array(F.length("q") - 1, F.length("q"), F.length("q") + 1)
        ).alias("blen"),
    )
    cand = banded.join(
        F.broadcast(vocab.withColumn("blen", F.length("term"))), "blen"
    ).select("truth", "q", "term", F.levenshtein("q", "term").alias("dist"))
    w_best = Window.partitionBy("q").orderBy("dist", "term")
    return (
        cand.withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") == 1)
        .select(
            "q", "truth", F.col("term").alias("suggestion"), "dist",
            (F.col("term") == F.col("truth")).alias("hit"),
        )
    )


SPELL_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
freq AS (
  SELECT tok, COUNT(*) AS n FROM toks WHERE length(tok) >= 4 GROUP BY tok
),
vocab AS (
  SELECT tok AS term FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rn FROM freq
  ) WHERE rn <= {SPELL_VOCAB_N}
),
queries AS (
  SELECT term AS truth, substr(term, 1, 1) || substr(term, 3) AS q FROM vocab
),
banded AS (
  SELECT truth, q, unnest([length(q) - 1, length(q), length(q) + 1]) AS blen
  FROM queries
),
cand AS (
  SELECT b.truth, b.q, v.term, levenshtein(b.q, v.term) AS dist
  FROM banded b JOIN vocab v ON length(v.term) = b.blen
)
SELECT q, truth, term AS suggestion, dist, term = truth AS hit FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q ORDER BY dist, term) AS rn FROM cand
) WHERE rn = 1
"""

register(
    QuerySpec(
        "spell_suggest_vocab",
        spell_suggest_vocab,
        SPELL_SQL,
        doc="did-you-mean via length-banded Levenshtein join over the corpus vocabulary",
        cites="fuzzy-matching family; banding bounds the comparison set",
        tags=("text", "search", "join"),
    )
)


# --- keyness: distinctive vocabulary per language (log-odds) ---------------

KEYNESS_TOP = 5
_KEY_SCALE = 1_000_000  # micro-nats (naive-Bayes quantization idiom)


def keyness_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per language: smoothed log-odds of each
    term inside vs outside the language (Monroe et al.'s +1-prior
    log-odds), top 5 per language. Counts are exact integers from one
    token explode; the two ln() calls are quantized to integer
    micro-nats before differencing, so cross-engine libm ulps cannot
    reach the hash. Group totals come from a window over the term-lang
    aggregate — no second corpus pass."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(F.split("text", " ")).alias("tok")).where(
        F.length("tok") >= 3
    )
    tl = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("a"))
    w_lang = Window.partitionBy("lang")
    w_tok = Window.partitionBy("tok")
    # corpus total as a scalar aggregate + broadcast (a partitionBy()-less
    # window would single-reduce the |vocab×lang| aggregate at scale)
    total = tl.agg(F.sum("a").alias("_tot"))
    stats = (
        tl.select(
            "lang", "tok", "a",
            F.sum("a").over(w_lang).alias("big_a"),
            (F.sum("a").over(w_tok) - F.col("a")).alias("b"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn("big_b", F.col("_tot") - F.col("big_a"))
    )
    lodds = (
        F.expr(f"CAST(round(ln((a + 1) / CAST(big_a - a + 1 AS DOUBLE)) * {_KEY_SCALE}) AS BIGINT)")
        - F.expr(f"CAST(round(ln((b + 1) / CAST(big_b - b + 1 AS DOUBLE)) * {_KEY_SCALE}) AS BIGINT)")
    )
    scored = stats.select("lang", "tok", "a", lodds.alias("lodds_micro"))
    w_top = Window.partitionBy("lang").orderBy(F.desc("lodds_micro"), "tok")
    return (
        scored.withColumn("pos", F.row_number().over(w_top))
        .where(F.col("pos") <= KEYNESS_TOP)
        .select("lang", "pos", "tok", "a", "lodds_micro")
    )


KEYNESS_SQL = f"""
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
tl AS (
  SELECT lang, tok, COUNT(*) AS a FROM toks WHERE length(tok) >= 3 GROUP BY 1, 2
),
stats AS (
  SELECT lang, tok, a,
         SUM(a) OVER (PARTITION BY lang) AS big_a,
         SUM(a) OVER (PARTITION BY tok) - a AS b,
         SUM(a) OVER () - SUM(a) OVER (PARTITION BY lang) AS big_b
  FROM tl
),
scored AS (
  SELECT lang, tok, a,
         CAST(round(ln((a + 1) / CAST(big_a - a + 1 AS DOUBLE)) * {_KEY_SCALE}) AS BIGINT)
         - CAST(round(ln((b + 1) / CAST(big_b - b + 1 AS DOUBLE)) * {_KEY_SCALE}) AS BIGINT)
           AS lodds_micro
  FROM stats
)
SELECT lang, pos, tok, a, lodds_micro FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY lodds_micro DESC, tok) AS pos
  FROM scored
) WHERE pos <= {KEYNESS_TOP}
"""

register(
    QuerySpec(
        "keyness_by_lang",
        keyness_by_lang,
        KEYNESS_SQL,
        doc="distinctive terms per language via smoothed log-odds (micro-nat quantized)",
        cites="corpus-analytics family; Monroe-style keyness",
        tags=("text", "window"),
    )
)


# ---------------------------------------------------------------------------
# Interpolated bigram LM cross-entropy (CCNet-style perplexity filter, one
# level up from unigram_surprisal_score)
# ---------------------------------------------------------------------------

LM_LAMBDA_NUM, LM_LAMBDA_DEN = 3, 4  # λ = 0.75 bigram weight, exact rational
LM_LOGSCALE = 1_000_000  # fixed-point micro-nat units


def lm_bigram_xent_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language cross-entropy of the corpus under its own interpolated
    bigram LM: P(w₂|w₁) = λ·c(w₁w₂)/c(w₁) + (1−λ)·c(w₂)/N — the CCNet
    perplexity-bucketing signal computed WITHOUT an external model
    (Wenzek et al. 2020 filter shape; here the LM trains in-engine).

    Determinism/scale shape (the DSIR fixed-point contract):
    - the surprisal −ln P is computed once per bigram TYPE (vocabulary-
      bounded, not corpus-bounded) and fixed-pointed to integer micro-nats;
    - each document's total surprisal is then an exact integer dot product
      of its bigram counts — no float re-association across the corpus;
    - per-language xent is ONE division of two exact integer sums.
    Shuffles: bigram-type groupBy, unigram groupBy, two type-keyed joins,
    one language agg — all token-keyed, linear in corpus size; the unigram
    table joins broadcast-style only if small, otherwise hash (Catalyst's
    call via AQE).
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.length(F.trim("text")) > 0)
        .select("doc_id", "lang", F.split(F.trim("text"), r"\s+").alias("t"))
    )
    uni = d.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c_w")
    )
    n_tok = uni.agg(F.sum("c_w").alias("n_tok"))
    bg_pairs = F.filter(
        F.zip_with(
            "t",
            F.expr("slice(t, 2, greatest(size(t) - 1, 0))"),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda s: s.getField("w2").isNotNull(),
    )
    doc_bg = (
        d.select("doc_id", "lang", F.explode(bg_pairs).alias("bg"))
        .select("doc_id", "lang", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("doc_id", "lang", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bg_types = doc_bg.groupBy("w1", "w2").agg(F.sum("n").alias("c_ab"))
    lam = F.lit(LM_LAMBDA_NUM) / F.lit(LM_LAMBDA_DEN)
    scored_types = (
        bg_types.join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_w2")), "w2")
        .crossJoin(F.broadcast(n_tok))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log(
                    lam * F.col("c_ab").cast("double") / F.col("c_w1").cast("double")
                    + (F.lit(1) - lam)
                    * F.col("c_w2").cast("double")
                    / F.col("n_tok").cast("double")
                )
                * LM_LOGSCALE
            )
            .cast("bigint")
            .alias("s_micro"),
        )
    )
    return (
        doc_bg.join(scored_types, ["w1", "w2"])
        .groupBy("lang")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.sum("n").alias("n_bigrams"),
            # DECIMAL(38,0) accumulator (the JL sum_y2 pattern): the int64
            # sum of n*s_micro overflows a few TB into the corpus the
            # docstring targets; DOUBLE is the surface type only
            F.sum((F.col("n") * F.col("s_micro")).cast("decimal(38,0)"))
            .cast("double")
            .alias("xent_micro_sum"),
            F.round(
                F.sum((F.col("n") * F.col("s_micro")).cast("decimal(38,0)")).cast("double")
                / (F.sum("n").cast("double") * LM_LOGSCALE),
                6,
            ).alias("xent_nats"),
        )
        .orderBy("lang")
    )


LM_BIGRAM_SQL = f"""
WITH d AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS t
           FROM documents WHERE length(trim(text)) > 0),
doc_bg AS (
  SELECT doc_id, lang, string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
         COUNT(*) AS n
  FROM (
    SELECT doc_id, lang,
           unnest(list_transform(list_zip(t, list_slice(t, 2, len(t))),
                                 x -> x[1] || ' ' || x[2])) AS bg
    FROM d
  )
  WHERE bg IS NOT NULL
  GROUP BY 1, 2, 3, 4
),
uni AS (
  SELECT w, COUNT(*) AS c_w
  FROM (SELECT unnest(t) AS w FROM d) GROUP BY w
),
n_tok AS (SELECT SUM(c_w) AS n_tok FROM uni),
bg_types AS (SELECT w1, w2, SUM(n) AS c_ab FROM doc_bg GROUP BY 1, 2),
scored_types AS (
  SELECT w1, w2,
         CAST(ROUND(-LN(({LM_LAMBDA_NUM} / CAST({LM_LAMBDA_DEN} AS DOUBLE))
                          * CAST(c_ab AS DOUBLE) / CAST(u1.c_w AS DOUBLE)
                        + (1 - {LM_LAMBDA_NUM} / CAST({LM_LAMBDA_DEN} AS DOUBLE))
                          * CAST(u2.c_w AS DOUBLE) / CAST(n_tok AS DOUBLE))
                    * {LM_LOGSCALE}) AS BIGINT) AS s_micro
  FROM bg_types
  JOIN uni u1 ON bg_types.w1 = u1.w
  JOIN uni u2 ON bg_types.w2 = u2.w
  CROSS JOIN n_tok
)
SELECT lang,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_bigrams,
       CAST(SUM(CAST(n * s_micro AS HUGEINT)) AS DOUBLE) AS xent_micro_sum,
       ROUND(CAST(SUM(CAST(n * s_micro AS HUGEINT)) AS DOUBLE)
             / (CAST(SUM(n) AS DOUBLE) * {LM_LOGSCALE}), 6) AS xent_nats
FROM doc_bg JOIN scored_types USING (w1, w2)
GROUP BY lang
ORDER BY lang
"""

register(
    QuerySpec(
        "lm_bigram_xent_by_lang",
        lm_bigram_xent_by_lang,
        LM_BIGRAM_SQL,
        doc="interpolated bigram LM cross-entropy per language (in-engine CCNet-style perplexity)",
        cites="training-data ops: perplexity quality filter (Wenzek et al. 2020 CCNet shape)",
        tags=("text", "quality", "training"),
    )
)


# ---------------------------------------------------------------------------
# Corpus cartography: per-source Jensen-Shannon divergence vs the rest of the
# corpus — the distance that drives domain-mixing / source-pruning decisions
# ---------------------------------------------------------------------------


def source_token_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (micro-nats) between each source's token
    unigram distribution P and the rest-of-corpus distribution Q — the
    symmetric, bounded (≤ ln 2) divergence used to map how far each
    domain sits from the corpus when choosing mixture weights or pruning
    redundant sources.

    Exactness contract (the keyness/DSIR fixed-point idiom): with integer
    counts a=count(tok in s), b=count(tok outside s), A=Σa, B=Σb,
    p/m = 2aB/(aB+bA) and q/m = 2bA/(aB+bA), so every ln() argument is a
    ratio of products of exact integers. Each product is computed in
    DOUBLE (correctly-rounded IEEE ops on identical operands — int64
    products would overflow at corpus scale), each ln is quantized to
    integer micro-nats BEFORE weighting, per-term weights are exact
    integers, and the per-source sums accumulate in DECIMAL(38,0) /
    HUGEINT (b·micro-nat overflows int64 at 100 TB — the JL sum_y2
    pattern). The only surfaced floats are two terminal divisions of
    exact sums. One token explode feeds everything; group totals ride
    windows over the |vocab x source| aggregate, the corpus total
    broadcasts as a scalar.

    ABSENT-token completeness (round-9 fix): the per-(source, tok) rows
    cover only tokens the source CONTAINS, so the q-side sum would miss
    KL(Q||M) contributions of rest-of-corpus tokens absent from the
    source — for those p=0, q/m = 2, and each contributes exactly
    q·ln 2; summed, (B − Σ_observed b)/B · ln 2. Both engines add that
    closed-form correction (as the exact integer
    (B − Σ_observed b) · 693147 micro-nats), so two disjoint-vocabulary
    sources now report the true JSD = ln 2, not half of it — the regime
    where a divergence metric steering mixing/pruning matters most.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    tl = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("a"))
    w_src = Window.partitionBy("source")
    w_tok = Window.partitionBy("tok")
    total = tl.agg(F.sum("a").alias("_tot"))
    stats = (
        tl.select(
            "source", "tok", "a",
            F.sum("a").over(w_src).alias("big_a"),
            (F.sum("a").over(w_tok) - F.col("a")).alias("b"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn("big_b", F.col("_tot") - F.col("big_a"))
    )
    # micro-nat ln of a two-integer product, computed in double
    ln2p = lambda x, y: f"CAST(round(ln(CAST({x} AS DOUBLE) * CAST({y} AS DOUBLE)) * {_KEY_SCALE}) AS BIGINT)"
    mix = f"CAST(round(ln(CAST(a AS DOUBLE) * CAST(big_b AS DOUBLE) + CAST(b AS DOUBLE) * CAST(big_a AS DOUBLE)) * {_KEY_SCALE}) AS BIGINT)"
    p_term = (
        f"CASE WHEN a > 0 THEN CAST(a AS DECIMAL(19,0)) * CAST({ln2p('2 * a', 'big_b')} - {mix} AS DECIMAL(19,0)) "
        "ELSE CAST(0 AS DECIMAL(38,0)) END"
    )
    q_term = (
        f"CASE WHEN b > 0 THEN CAST(b AS DECIMAL(19,0)) * CAST({ln2p('2 * b', 'big_a')} - {mix} AS DECIMAL(19,0)) "
        "ELSE CAST(0 AS DECIMAL(38,0)) END"
    )
    agg = stats.groupBy("source").agg(
        F.max("big_a").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.expr(p_term)).alias("_ps"),
        F.sum(F.expr(q_term)).alias("_qs"),
        F.max("big_b").alias("_bb"),
        F.sum(F.col("b").cast("decimal(38,0)")).alias("_ob"),
    )
    # closed-form q-side mass of tokens ABSENT from the source (p=0 ⇒
    # q·ln 2 each): exact integers, identical in the DuckDB mirror
    q_total = F.col("_qs") + (
        F.col("_bb").cast("decimal(38,0)") - F.col("_ob")
    ) * F.lit(_LN2_MICRO)
    return agg.select(
        "source",
        "n_tokens",
        "vocab",
        (
            (F.col("_ps").cast("double") / F.col("n_tokens")
             + q_total.cast("double") / F.col("_bb")) / F.lit(2.0)
        ).alias("jsd_micro"),
    )


_LN2_MICRO = 693147  # round(ln 2 · _KEY_SCALE): the per-token absent-term contribution

_JS_LN = lambda x, y: f"CAST(round(ln(CAST({x} AS DOUBLE) * CAST({y} AS DOUBLE)) * {_KEY_SCALE}) AS BIGINT)"
_JS_MIX = f"CAST(round(ln(CAST(a AS DOUBLE) * CAST(big_b AS DOUBLE) + CAST(b AS DOUBLE) * CAST(big_a AS DOUBLE)) * {_KEY_SCALE}) AS BIGINT)"

JS_DIVERGENCE_SQL = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
tl AS (
  SELECT source, tok, COUNT(*) AS a FROM toks GROUP BY 1, 2
),
stats AS (
  SELECT source, tok, a,
         SUM(a) OVER (PARTITION BY source) AS big_a,
         SUM(a) OVER (PARTITION BY tok) - a AS b,
         SUM(a) OVER () - SUM(a) OVER (PARTITION BY source) AS big_b
  FROM tl
),
terms AS (
  SELECT source, a, big_a, b, big_b,
         CASE WHEN a > 0 THEN CAST(a AS HUGEINT) * ({_JS_LN('2 * a', 'big_b')} - {_JS_MIX}) ELSE CAST(0 AS HUGEINT) END AS p_term,
         CASE WHEN b > 0 THEN CAST(b AS HUGEINT) * ({_JS_LN('2 * b', 'big_a')} - {_JS_MIX}) ELSE CAST(0 AS HUGEINT) END AS q_term
  FROM stats
)
SELECT source,
       CAST(MAX(big_a) AS BIGINT) AS n_tokens,
       COUNT(*) AS vocab,
       (CAST(SUM(p_term) AS DOUBLE) / CAST(MAX(big_a) AS DOUBLE)
        + CAST(SUM(q_term)
               + (CAST(MAX(big_b) AS HUGEINT) - SUM(CAST(b AS HUGEINT))) * {_LN2_MICRO}
               AS DOUBLE) / CAST(MAX(big_b) AS DOUBLE)) / 2.0 AS jsd_micro
FROM terms
GROUP BY source
"""

register(
    QuerySpec(
        "source_token_js_divergence",
        source_token_js_divergence,
        JS_DIVERGENCE_SQL,
        doc="per-source JSD vs rest-of-corpus token distribution (micro-nat fixed point)",
        cites="training-data ops: domain mixing / corpus cartography; keyness fixed-point idiom",
        tags=("text", "training", "corpus"),
    )
)
