"""Corpus-preparation operators: chunking and redaction.

The two remaining everyday LLM-training-data transforms: split documents
into overlapping token-window chunks (context-length packing) and scrub
PII-shaped spans. Both pure JVM expressions with DuckDB oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.operators.ordered import with_global_order
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table

CHUNK = 64  # tokens per chunk
STRIDE = 48  # tokens advanced per chunk (CHUNK-STRIDE = 16 overlap)


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: one row per (doc, chunk).

    Chunks start every STRIDE tokens; the final window keeps the tail
    (shorter chunk) so no token is dropped. All array ops — the chunk
    explosion happens JVM-side with zero data movement beyond the rows
    produced.
    """
    from analytics_data_platform_spark.functions.expr import bind

    d = load_table(spark, sf_dir, "documents")
    # let-bound token array: split once per doc, not once per chunk window
    chunks = bind(
        F.split(F.trim("text"), r"\s+"),
        lambda toks: F.transform(
            F.sequence(
                F.lit(0),
                F.when(F.size(toks) <= CHUNK, F.lit(1)).otherwise(
                    F.ceil((F.size(toks) - CHUNK).cast("double") / STRIDE).cast("int") + 1
                )
                - 1,
            ),
            lambda i: F.struct(
                i.alias("chunk_id"),
                F.concat_ws(" ", F.slice(toks, i * STRIDE + 1, CHUNK)).alias("chunk_text"),
            ),
        ),
    )
    return (
        d.where(F.length(F.trim("text")) > 0)
        .select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.size(F.split(F.col("c.chunk_text"), r"\s+")).alias("chunk_tokens"),
        )
    )


CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
),
sized AS (
  SELECT doc_id, t, len(t) AS n,
         CASE WHEN len(t) <= {CHUNK} THEN 1
              ELSE CAST(ceil((len(t) - {CHUNK}) * 1.0 / {STRIDE}) AS INT) + 1 END AS n_chunks
  FROM toks
)
SELECT doc_id, i AS chunk_id,
       array_to_string(t[i*{STRIDE}+1 : i*{STRIDE}+{CHUNK}], ' ') AS chunk_text,
       len(t[i*{STRIDE}+1 : i*{STRIDE}+{CHUNK}]) AS chunk_tokens
FROM sized CROSS JOIN generate_series(0, 99) AS g(i)
WHERE i < n_chunks
"""

register(
    QuerySpec(
        "chunk_documents",
        chunk_documents,
        CHUNK_SQL,
        doc=f"overlapping token-window chunking ({CHUNK} tokens, stride {STRIDE})",
        cites="training-data ops: context-window chunking",
        bench=True,
        tags=("text", "chunking"),
    )
)


_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
_PHONE = r"\+?\d[\d\-\s]{7,}\d"


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrubbing over a synthetic PII-injected column.

    The corpus has no real PII, so a deterministic column derived from the
    doc id is appended before scrubbing — the measured behavior (pattern
    hit counts, redacted output) is what matters at 100 TB, and it's all
    in one regexp pass per pattern.
    """
    d = load_table(spark, sf_dir, "documents")
    salted = d.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 80),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +44 1235 44"),
            F.col("doc_id").cast("string"),
            F.lit("1"),
        ).alias("raw"),
    )
    emails = F.regexp_count("raw", F.lit(_EMAIL))
    redacted = F.regexp_replace(F.regexp_replace("raw", _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>")
    return salted.select(
        "doc_id",
        emails.alias("n_emails"),
        F.regexp_count(redacted, F.lit("<PHONE>")).alias("n_phones"),
        redacted.alias("redacted"),
    )


REDACT_SQL = rf"""
WITH salted AS (
  SELECT doc_id,
         substr(text, 1, 80) || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@example.com or +44 1235 44' || CAST(doc_id AS VARCHAR) || '1' AS raw
  FROM documents
),
red AS (
  SELECT doc_id,
         len(regexp_extract_all(raw, '{_EMAIL}')) AS n_emails,
         regexp_replace(regexp_replace(raw, '{_EMAIL}', '<EMAIL>', 'g'),
                        '{_PHONE}', '<PHONE>', 'g') AS redacted
  FROM salted
)
SELECT doc_id, n_emails,
       len(regexp_extract_all(redacted, '<PHONE>')) AS n_phones,
       redacted
FROM red
"""

register(
    QuerySpec(
        "redact_pii",
        redact_pii,
        REDACT_SQL,
        doc="regex PII redaction (emails/phones) with hit accounting",
        cites="training-data ops: corpus scrubbing",
        tags=("text", "redaction"),
    )
)


# --------------------------------------------------------------------------
# Exact duplicated-passage detection (substring-level dedup signal)
# --------------------------------------------------------------------------

PASSAGE_N = 8  # tokens per passage
PASSAGE_MAX_DOCS = 50  # ignore grams so common they carry no pair signal
PASSAGE_TOP = 100


def duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing verbatim 8-token passages — the exact
    substring-dedup signal (Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better" §4.1, adapted from suffix arrays to a
    shuffle-friendly shingle formulation).

    Every doc emits its distinct 8-gram md5 fingerprints (JVM transform/
    slice HOFs, one pass); one hash-shuffle groups grams; grams seen in
    2..50 distinct docs expand to doc pairs. Work is Σ bucket² over gram
    buckets — the common-gram cap bounds the quadratic term, and the cap
    is an explicit, logged predicate (not silent sampling): grams above
    it are boilerplate that substring dedup handles via per-doc masking,
    not pairing. Output: top pairs by shared-passage count.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= PASSAGE_N
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) - {PASSAGE_N}),"
                f" i -> md5(concat_ws(' ', slice(t, i + 1, {PASSAGE_N}))))"
            )
        ).alias("g"),
    ).distinct()
    # count first, THEN collect: the per-gram doc arrays are built only for
    # grams already known to be in [2, 50] docs, so no array ever exceeds
    # the cap even when a boilerplate gram appears in millions of docs
    counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    keep = counts.where((F.col("nd") >= 2) & (F.col("nd") <= PASSAGE_MAX_DOCS)).select("g")
    eligible = (
        grams.join(keep, "g")
        .groupBy("g")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
    )
    pairs = (
        eligible.select(
            F.explode(
                F.expr(
                    "flatten(transform(docs, (a, i) ->"
                    " transform(slice(docs, i + 2, size(docs)), b -> struct(a, b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_passages"))
    )
    w = Window.orderBy(F.desc("shared_passages"), "doc_a", "doc_b")
    return (
        pairs.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= PASSAGE_TOP)
        .select("pos", "doc_a", "doc_b", "shared_passages")
    )


DUP_PASSAGES_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= {PASSAGE_N}
),
grams AS (
  SELECT DISTINCT doc_id, g
  FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(0, len(t) - {PASSAGE_N} + 1),
                  i -> md5(array_to_string(t[i + 1: i + {PASSAGE_N}], ' ')))) AS g
    FROM toks
  )
),
by_gram AS (
  SELECT g, COUNT(*) AS nd FROM grams GROUP BY g
),
eligible AS (
  SELECT g FROM by_gram WHERE nd BETWEEN 2 AND {PASSAGE_MAX_DOCS}
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_passages
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  JOIN eligible e ON a.g = e.g
  GROUP BY a.doc_id, b.doc_id
)
SELECT pos, doc_a, doc_b, shared_passages FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY shared_passages DESC, doc_a, doc_b) AS pos
  FROM pairs
) WHERE pos <= {PASSAGE_TOP}
"""

register(
    QuerySpec(
        "duplicate_passages",
        duplicate_passages,
        DUP_PASSAGES_SQL,
        doc="verbatim shared 8-token passages across doc pairs (substring-dedup signal)",
        cites="training-data ops: exact substring dedup (Lee et al. 2022)",
        tags=("text", "dedup"),
    )
)


# ---- Heaps'-law vocabulary growth ------------------------------------------


def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law curve: cumulative vocabulary size after each decile of
    the corpus (by doc_id order) vs cumulative token count — the
    sublinear V(n) growth that sizes tokenizers and dedup memory.

    Distributed shape: one explode+groupBy finds each word's FIRST doc
    (min doc_id) and each doc's token count; decile thresholds come from
    integer row positions over the |docs|-sized count table (an exists()
    HOF against the in-window position — no driver scalar); the curve is
    then two small-side range joins (10 threshold rows broadcast).
    'Cumulative' is computed as first-seen ≤ threshold — the same trick
    as cumulative_new_users, so nothing scans sequentially.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.expr(r"regexp_extract_all(lower(text), '[a-z]+', 0)")).alias("w"),
    )
    first_seen = words.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    doc_tokens = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("toks"))
    n_docs = doc_tokens.agg(F.count(F.lit(1)).alias("n"))
    thresholds = (
        # distributed global position over |documents| (operators/
        # ordered.py two-pass scan — no global sort window)
        with_global_order(doc_tokens, "doc_id", rank_col="rn")
        .crossJoin(F.broadcast(n_docs))
        .where(F.expr("exists(sequence(1, 10), k -> rn = greatest(1, (k * n) div 10))"))
        .select(F.col("doc_id").alias("cut"), F.col("rn").cast("bigint").alias("docs_seen"))
    )
    vocab = (
        F.broadcast(thresholds)
        .join(first_seen, F.col("first_doc") <= F.col("cut"))
        .groupBy("cut", "docs_seen")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )
    toks = (
        F.broadcast(thresholds)
        .join(doc_tokens, F.col("doc_id") <= F.col("cut"))
        .groupBy("cut", "docs_seen")
        .agg(F.sum("toks").alias("tokens_seen"))
    )
    return (
        vocab.join(toks, ["cut", "docs_seen"])
        .select("docs_seen", "tokens_seen", "vocab_size")
        .orderBy("docs_seen")
    )


VOCAB_GROWTH_SQL = """
WITH words AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
first_seen AS (SELECT w, MIN(doc_id) AS first_doc FROM words GROUP BY 1),
doc_tokens AS (SELECT doc_id, COUNT(*) AS toks FROM words GROUP BY 1),
pos AS (
  SELECT doc_id, toks, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM doc_tokens
),
thresholds AS (
  SELECT DISTINCT doc_id AS cut, CAST(rn AS BIGINT) AS docs_seen
  FROM pos, (SELECT UNNEST(generate_series(1, 10)) AS k) ks
  WHERE rn = GREATEST(1, (k * n) // 10)
),
vocab AS (
  SELECT t.cut, t.docs_seen, COUNT(*) AS vocab_size
  FROM thresholds t JOIN first_seen f ON f.first_doc <= t.cut
  GROUP BY 1, 2
),
toks AS (
  SELECT t.cut, t.docs_seen, CAST(SUM(d.toks) AS BIGINT) AS tokens_seen
  FROM thresholds t JOIN doc_tokens d ON d.doc_id <= t.cut
  GROUP BY 1, 2
)
SELECT v.docs_seen, tk.tokens_seen, v.vocab_size
FROM vocab v JOIN toks tk ON v.cut = tk.cut AND v.docs_seen = tk.docs_seen
ORDER BY v.docs_seen
"""


register(
    QuerySpec(
        "vocab_growth_curve",
        vocab_growth_curve,
        VOCAB_GROWTH_SQL,
        doc="Heaps-law vocabulary growth at corpus deciles via first-seen thresholds",
        cites="corpus statistics; first-seen idiom of cumulative_new_users",
        tags=("corpus", "text", "stats"),
    )
)


def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source: docs vs distinct content
    fingerprints (md5 of normalized text) — the per-provider ops metric
    that decides which upstream feeds need dedup pressure. The shuffle
    carries 16-byte digests, never documents."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "source",
        F.md5(
            F.expr(r"trim(regexp_replace(lower(text), '\\s+', ' '))")
        ).alias("fp"),
    )
    return (
        fp.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "n_unique",
            "n_docs - n_unique AS n_dupes",
            "round(CAST(n_docs - n_unique AS DOUBLE) / n_docs, 6) AS dup_rate",
        )
        .orderBy("source")
    )


DUP_RATE_SQL = r"""
WITH fp AS (
  SELECT source, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM documents
)
SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_unique,
       COUNT(*) - COUNT(DISTINCT fp) AS n_dupes,
       ROUND(CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 6) AS dup_rate
FROM fp GROUP BY 1 ORDER BY 1
"""


register(
    QuerySpec(
        "dup_rate_by_source",
        dup_rate_by_source,
        DUP_RATE_SQL,
        doc="per-source exact-duplicate rate from normalized-text fingerprints",
        cites="ops twin of dedup_exact_stats; functions/text.py fingerprint normalization",
        tags=("dedup", "corpus", "ops"),
    )
)


_ZIPF_TOP = 200


def zipf_exponent_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of ln(freq)
    on ln(rank) for the top-200 terms (natural corpora: slope ≈ −1;
    strong deviation flags templated/synthetic text — a corpus-quality
    screen next to the Gopher repetition filters). Logs are quantized to
    integer micro-nats (the elasticity idiom) so the moment sums are
    exact BIGINT; moments convert to double before the closed-form
    slope."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.expr(r"regexp_extract_all(lower(text), '[a-z]+', 0)")).alias("w")
    )
    freqs = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    wr = Window.orderBy(F.desc("f"), "w")
    top = freqs.withColumn("rank", F.row_number().over(wr)).where(
        F.col("rank") <= _ZIPF_TOP
    )
    obs = top.select(
        F.expr("CAST(round(ln(rank) * 1000000) AS BIGINT)").alias("x"),
        F.expr("CAST(round(ln(f) * 1000000) AS BIGINT)").alias("y"),
    )
    mom = obs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return mom.selectExpr(
        "n AS n_terms",
        "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope",
    )


ZIPF_SQL = f"""
WITH words AS (
  SELECT UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
),
freqs AS (SELECT w, COUNT(*) AS f FROM words GROUP BY 1),
top AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS rank
  FROM freqs QUALIFY rank <= {_ZIPF_TOP}
),
obs AS (
  SELECT CAST(ROUND(ln(rank) * 1000000) AS BIGINT) AS x,
         CAST(ROUND(ln(f) * 1000000) AS BIGINT) AS y
  FROM top
),
mom AS (
  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM obs
)
SELECT n AS n_terms,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope
FROM mom
"""


register(
    QuerySpec(
        "zipf_exponent_fit",
        zipf_exponent_fit,
        ZIPF_SQL,
        doc="Zipf exponent over top-200 terms (micro-nat quantized log-log OLS)",
        cites="corpus-law pair with vocab_growth_curve; quantized-log idiom of demand_elasticity",
        tags=("corpus", "text", "stats"),
    )
)


# --------------------------------------------------------------------------
# winnowing fingerprints (MOSS): guaranteed-coverage fingerprint sampling
# --------------------------------------------------------------------------

WIN_K = 4  # tokens per k-gram
WIN_W = 5  # winnowing window (consecutive k-gram hashes)
WIN_MAX_DOCS = 50  # boilerplate cap, same rationale as duplicate_passages
WIN_TOP = 50


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top document pairs by shared WINNOWING fingerprints (Schleimer,
    Wilkerson & Aiken 2003 — the MOSS local fingerprinting algorithm).

    Winnowing selects min(hash) from every window of W consecutive k-gram
    hashes, keeping ~2/(W+1) of the grams while GUARANTEEING any shared
    token run of length ≥ W+K-1 (= 8 here, the duplicate_passages
    passage size) yields at least one shared fingerprint — sampling with
    a coverage proof, unlike MinHash's probabilistic bands. At 100 TB
    that is a W-fold cut in the gram shuffle with zero recall loss for
    runs above the threshold. The selection is one pass of JVM array HOFs
    per doc: both the token array and the hash array are let-bound
    (functions/expr.bind) so CollapseProject cannot re-evaluate the hash
    chain per window. Pairing then follows the duplicate_passages shape:
    fingerprint equi-join with a boilerplate cap bounding Σ bucket².
    """
    from analytics_data_platform_spark.functions.expr import bind, spread
    from analytics_data_platform_spark.operators.sketches import h32

    d = load_table(spark, sf_dir, "documents")
    fps_arr = bind(
        F.split("text", " "),
        lambda t: F.when(
            F.size(t) >= WIN_K + WIN_W - 1,
            bind(
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (WIN_K - 1)),
                    lambda i: h32(F.concat_ws(" ", F.slice(t, i, WIN_K))),
                ),
                lambda h: F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(h) - (WIN_W - 1)),
                        lambda j: F.array_min(F.slice(h, j, WIN_W)),
                    )
                ),
            ),
        ),
    )
    # no .distinct() needed: fps_arr is array_distinct per doc, so the
    # exploded (doc_id, fp) stream is already unique — one shuffle saved
    fps = spread(d.select("doc_id", "text")).select(
        "doc_id", F.explode(fps_arr).alias("fp")
    )
    counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("nd"))
    keep = counts.where((F.col("nd") >= 2) & (F.col("nd") <= WIN_MAX_DOCS)).select("fp")
    eligible = (
        fps.join(keep, "fp")
        .groupBy("fp")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
    )
    pairs = (
        eligible.select(
            F.explode(
                F.expr(
                    "flatten(transform(docs, (a, i) ->"
                    " transform(slice(docs, i + 2, size(docs)), b -> struct(a, b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )
    w = Window.orderBy(F.desc("shared_fps"), "doc_a", "doc_b")
    return (
        pairs.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= WIN_TOP)
        .select("pos", "doc_a", "doc_b", "shared_fps")
    )


def _winnowing_sql() -> str:
    from analytics_data_platform_spark.operators.sketches import h32_sql

    gram = h32_sql(f"array_to_string(t[i + 1: i + {WIN_K}], ' ')")
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= {WIN_K + WIN_W - 1}
),
hs AS (
  SELECT doc_id,
         list_transform(range(0, len(t) - {WIN_K} + 1), i -> {gram}) AS h
  FROM toks
),
fps AS (
  SELECT DISTINCT doc_id, unnest(
    list_transform(range(0, len(h) - {WIN_W} + 1),
                   j -> list_aggregate(h[j + 1: j + {WIN_W}], 'min'))
  ) AS fp
  FROM hs
),
by_fp AS (SELECT fp, COUNT(*) AS nd FROM fps GROUP BY fp),
eligible AS (SELECT fp FROM by_fp WHERE nd BETWEEN 2 AND {WIN_MAX_DOCS}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  JOIN eligible e ON a.fp = e.fp
  GROUP BY a.doc_id, b.doc_id
)
SELECT pos, doc_a, doc_b, shared_fps FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY shared_fps DESC, doc_a, doc_b) AS pos
  FROM pairs
) WHERE pos <= {WIN_TOP}
"""


register(
    QuerySpec(
        "winnowing_fingerprints",
        winnowing_fingerprints,
        _winnowing_sql(),
        doc="MOSS winnowing: guaranteed-coverage fingerprint sampling + pair matches",
        cites="training-data ops: near-verbatim copy detection at reduced shuffle",
        tags=("dedup", "text"),
    )
)


def boilerplate_gram_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-substring masking report — the masking half of
    Lee et al. 2022 dedup that duplicate_passages defers to: every
    occurrence of a corpus-repeated 8-token passage is masked EXCEPT in
    the passage's canonical keeper doc (min doc_id among holders), and
    the per-source masked-token footprint is reported.

    Scale shape — this is the NO-quadratic-term dedup op: gram
    occurrences stream with positions (one JVM transform pass), one hash
    shuffle groups grams for (holder count, keeper) stats, matched
    occurrences expand 8× into covered token positions, and a doc-key
    shuffle counts distinct masked positions. No pair join anywhere, so
    boilerplate grams held by millions of docs cost O(occurrences), not
    O(holders²) — masking is exactly what the pair-capped
    duplicate_passages cannot afford to do by pairing. The mask rate is
    a single division of two exact integer sums (no float
    re-association).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.split("text", " ").alias("t")
    ).withColumn("n_tokens", F.size("t"))
    occ = toks.where(F.size("t") >= PASSAGE_N).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) - {PASSAGE_N}),"
                f" i -> struct(i AS pos, md5(concat_ws(' ', slice(t, i + 1, {PASSAGE_N}))) AS g))"
            )
        ).alias("o"),
    ).select("doc_id", F.col("o.pos").alias("pos"), F.col("o.g").alias("g"))
    gstats = (
        occ.select("doc_id", "g").distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"), F.min("doc_id").alias("keeper"))
        .where(F.col("nd") >= 2)
    )
    masked_pos = (
        occ.join(gstats, "g")
        .where(F.col("doc_id") != F.col("keeper"))
        .select("doc_id", F.explode(F.expr(f"sequence(pos, pos + {PASSAGE_N - 1})")).alias("tp"))
        .groupBy("doc_id")
        .agg(F.count_distinct("tp").alias("masked_tokens"))
    )
    return (
        toks.join(masked_pos, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("masked_tokens").alias("docs_masked"),
            F.sum(F.coalesce("masked_tokens", F.lit(0))).alias("masked_tokens"),
            F.sum("n_tokens").alias("total_tokens"),
            (
                F.sum(F.coalesce("masked_tokens", F.lit(0))).cast("double")
                / F.sum("n_tokens").cast("double")
            ).alias("mask_rate"),
        )
    )


BOILERPLATE_MASK_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
occ AS (
  SELECT doc_id, UNNEST(list_transform(range(0, len(t) - {PASSAGE_N} + 1),
                 i -> struct_pack(pos := i,
                                  g := md5(array_to_string(t[i + 1: i + {PASSAGE_N}], ' '))))) AS o
  FROM toks WHERE n_tokens >= {PASSAGE_N}
),
occ2 AS (SELECT doc_id, o.pos AS pos, o.g AS g FROM occ),
gstats AS (
  SELECT g, COUNT(*) AS nd, MIN(doc_id) AS keeper
  FROM (SELECT DISTINCT doc_id, g FROM occ2)
  GROUP BY g HAVING COUNT(*) >= 2
),
masked AS (
  SELECT doc_id, COUNT(DISTINCT tp) AS masked_tokens
  FROM (
    SELECT o.doc_id, UNNEST(range(o.pos, o.pos + {PASSAGE_N})) AS tp
    FROM occ2 o JOIN gstats s ON o.g = s.g AND o.doc_id <> s.keeper
  )
  GROUP BY doc_id
)
SELECT t.source, COUNT(*) AS n_docs,
       COUNT(m.masked_tokens) AS docs_masked,
       CAST(COALESCE(SUM(m.masked_tokens), 0) AS BIGINT) AS masked_tokens,
       CAST(SUM(t.n_tokens) AS BIGINT) AS total_tokens,
       CAST(COALESCE(SUM(m.masked_tokens), 0) AS DOUBLE) / CAST(SUM(t.n_tokens) AS DOUBLE) AS mask_rate
FROM toks t LEFT JOIN masked m ON t.doc_id = m.doc_id
GROUP BY t.source
"""

register(
    QuerySpec(
        "boilerplate_gram_mask",
        boilerplate_gram_mask,
        BOILERPLATE_MASK_SQL,
        doc="exact-substring masking footprint per source (keeper-doc rule, no pair join)",
        cites="training-data ops: substring dedup masking (Lee et al. 2022 §4.1)",
        tags=("text", "dedup"),
    )
)


# ---------------------------------------------------------------------------
# C4 / Gopher cleaning-rule audit — named-rule pass rates per source
# ---------------------------------------------------------------------------


C4_CORE_RULES = (
    "r_word_count",
    "r_mean_word_len",
    "r_symbol_ratio",
    "r_alpha_words",
    "r_no_lorem",
    "r_no_braces",
)


def c4_rules(text_col: str = "text") -> dict:
    """The named C4/Gopher rule predicates as Columns — the SINGLE source
    shared by the audit query, the training-corpus pipeline, and tests (a
    threshold change cannot silently desynchronize them)."""
    t = F.split(F.trim(text_col), r"\s+")
    n_w = F.size(t)
    word_chars = F.aggregate(
        F.transform(t, lambda w: F.length(w)), F.lit(0), lambda a, v: a + v
    )
    n_alpha = F.size(F.filter(t, lambda w: w.rlike("(?i)[a-z]")))
    n_sym = F.size(F.regexp_extract_all(text_col, F.lit(r"#|\.\.\."), F.lit(0)))
    n_stop = F.size(
        F.array_intersect(t, F.array(*[F.lit(w) for w in ("the", "be", "to", "of", "and")]))
    )
    return {
        "r_word_count": (n_w >= 30) & (n_w <= 100000),
        "r_mean_word_len": (word_chars >= 3 * n_w) & (word_chars <= 10 * n_w),
        "r_symbol_ratio": 10 * n_sym <= n_w,
        "r_alpha_words": 5 * n_alpha >= 4 * n_w,
        "r_terminal_punct": F.expr(f"right(trim({text_col}), 1)").isin(".", "!", "?", '"'),
        "r_stopwords": n_stop >= 2,
        "r_no_lorem": ~F.lower(text_col).contains("lorem ipsum"),
        "r_no_braces": ~F.col(text_col).contains("{"),
    }


def c4_core_pass(text_col: str = "text"):
    """Conjunction of the structural core rules (pass_core semantics)."""
    rules = c4_rules(text_col)
    cond = rules[C4_CORE_RULES[0]]
    for name in C4_CORE_RULES[1:]:
        cond = cond & rules[name]
    return cond


def c4_gopher_rule_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source pass counts for the canonical web-corpus cleaning rules
    (C4, Raffel et al. 2020 §2.2; Gopher, Rae et al. 2021 §A1.1): word
    count floor, mean-word-length band, symbol-to-word ratio,
    alphabetic-word fraction, terminal punctuation, stopword presence,
    lorem-ipsum and curly-brace exclusion, plus the all-rules pass count.

    Every rule is an EXACT integer comparison (mean-word-length ∈ [3,10]
    becomes 3·n_w ≤ chars ≤ 10·n_w — no division, no float), so the audit
    hash-verifies. One narrow projection + one per-source agg: at 100 TB
    this is a single corpus scan with map-side partials; the same rule
    columns gate a cleaning WRITE by filtering on pass_all.
    """
    d = load_table(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    rules = c4_rules("text")
    flags = d.select(
        "source", *[cond.cast("bigint").alias(name) for name, cond in rules.items()]
    )
    agg = [F.sum(name).alias(name) for name in rules]
    # core = the structural rules; terminal-punct and stopwords are
    # English-prose-specific (C4 applies rule subsets per corpus — on this
    # synthetic keyword corpus they are the rules a calibration pass would
    # drop, and the audit columns SHOW that: their pass counts are 0)
    core = list(C4_CORE_RULES)
    pass_all = F.sum(
        F.when(
            sum(F.col(c) for c in rules) == len(rules), F.lit(1)
        ).otherwise(F.lit(0))
    ).alias("pass_all")
    pass_core = F.sum(
        F.when(sum(F.col(c) for c in core) == len(core), F.lit(1)).otherwise(F.lit(0))
    ).alias("pass_core")
    return (
        flags.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), *agg, pass_all, pass_core)
        .orderBy("source")
    )


C4_GOPHER_SQL = r"""
WITH d AS (
  SELECT source, text, string_split(trim(text), ' ') AS t
  FROM documents WHERE length(trim(text)) > 0
),
flags AS (
  SELECT source,
    CASE WHEN len(t) >= 30 AND len(t) <= 100000 THEN 1 ELSE 0 END AS r_word_count,
    CASE WHEN list_sum(list_transform(t, w -> len(w))) >= 3 * len(t)
          AND list_sum(list_transform(t, w -> len(w))) <= 10 * len(t)
         THEN 1 ELSE 0 END AS r_mean_word_len,
    CASE WHEN 10 * len(regexp_extract_all(text, '#|\.\.\.')) <= len(t)
         THEN 1 ELSE 0 END AS r_symbol_ratio,
    CASE WHEN 5 * len(list_filter(t, w -> regexp_matches(w, '(?i)[a-z]'))) >= 4 * len(t)
         THEN 1 ELSE 0 END AS r_alpha_words,
    CASE WHEN right(trim(text), 1) IN ('.', '!', '?', '"') THEN 1 ELSE 0 END AS r_terminal_punct,
    CASE WHEN len(list_intersect(t, ['the', 'be', 'to', 'of', 'and'])) >= 2
         THEN 1 ELSE 0 END AS r_stopwords,
    CASE WHEN NOT contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END AS r_no_lorem,
    CASE WHEN NOT contains(text, '{') THEN 1 ELSE 0 END AS r_no_braces
  FROM d
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(r_word_count) AS BIGINT) AS r_word_count,
       CAST(SUM(r_mean_word_len) AS BIGINT) AS r_mean_word_len,
       CAST(SUM(r_symbol_ratio) AS BIGINT) AS r_symbol_ratio,
       CAST(SUM(r_alpha_words) AS BIGINT) AS r_alpha_words,
       CAST(SUM(r_terminal_punct) AS BIGINT) AS r_terminal_punct,
       CAST(SUM(r_stopwords) AS BIGINT) AS r_stopwords,
       CAST(SUM(r_no_lorem) AS BIGINT) AS r_no_lorem,
       CAST(SUM(r_no_braces) AS BIGINT) AS r_no_braces,
       CAST(SUM(CASE WHEN r_word_count + r_mean_word_len + r_symbol_ratio + r_alpha_words
                        + r_terminal_punct + r_stopwords + r_no_lorem + r_no_braces = 8
                     THEN 1 ELSE 0 END) AS BIGINT) AS pass_all,
       CAST(SUM(CASE WHEN r_word_count + r_mean_word_len + r_symbol_ratio + r_alpha_words
                        + r_no_lorem + r_no_braces = 6
                     THEN 1 ELSE 0 END) AS BIGINT) AS pass_core
FROM flags
GROUP BY source
ORDER BY source
"""

register(
    QuerySpec(
        "c4_gopher_rule_stats",
        c4_gopher_rule_stats,
        C4_GOPHER_SQL,
        doc="C4/Gopher web-corpus cleaning rules: exact-integer pass counts per source",
        cites="training-data ops: heuristic quality filtering (Raffel et al. 2020; Rae et al. 2021)",
        tags=("text", "quality", "training"),
    )
)


_PPL_SCALE = 1_000_000  # micro-nats (the repo's fixed-point log idiom)


def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): score
    every document by its mean token surprisal under the corpus's own
    unigram LM, then split EACH LANGUAGE into head/middle/tail thirds by
    that score — the quality-tiering step a web-scale pipeline runs
    before choosing which tier feeds training.

    Fixed-point contract: ln is computed once per distinct term
    frequency (vocab-bounded), quantized to integer micro-nats; each
    document's score is an exact integer sum with ONE floor division by
    its token count, so the per-language ordering (score, doc_id) is
    total and tie-free across engines. The tercile rule is the explicit
    closed form bucket = ((rank−1)·3) // n_lang + 1 on BOTH engines —
    not NTILE, whose remainder-distribution rule would have to be
    replicated blind.

    Scale shape: LM training and scoring are two term-keyed linear
    shuffles (no driver state); the per-language rank is the one
    data-linear-per-key sort — inherent to CCNet's per-language split —
    and shards with the two-pass bucketed-rank recipe
    (operators/ordered.py) applied per language at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    # micro-nat surprisal per TERM (vocab-bounded ln), exact int per token
    s_int = F.floor(
        F.lit(_PPL_SCALE)
        * F.log(F.col("total").cast("double") / F.col("tf").cast("double"))
    ).cast("bigint")
    scored = (
        tok.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(s_int).alias("s_sum"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr("s_sum div n_tokens").alias("score"),
        )
    )
    w = Window.partitionBy("lang").orderBy("score", "doc_id")
    n_lang = scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    bucketed = (
        scored.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(n_lang), "lang")
        .withColumn(
            "bucket",
            F.when(F.expr("((rn - 1) * 3) div n_lang") == 0, "head")
            .when(F.expr("((rn - 1) * 3) div n_lang") == 1, "middle")
            .otherwise("tail"),
        )
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
        .orderBy("lang", "bucket")
    )


CCNET_PPL_SQL = f"""
WITH base AS (SELECT doc_id, lang, text FROM documents WHERE length(trim(text)) > 0),
tok AS (
  SELECT doc_id, lang, term FROM (
    SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS term FROM base
  ) WHERE term <> ''
),
total AS (SELECT COUNT(*) AS total FROM tok),
freq AS (SELECT term, COUNT(*) AS tf FROM tok GROUP BY term),
scored AS (
  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         SUM(CAST(FLOOR({_PPL_SCALE} * LN(CAST(total AS DOUBLE) / CAST(tf AS DOUBLE))) AS BIGINT))
           // COUNT(*) AS score
  FROM tok JOIN freq USING (term) CROSS JOIN total
  GROUP BY doc_id, lang
),
ranked AS (
  SELECT lang, n_tokens, score,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n_lang
  FROM scored
),
bucketed AS (
  SELECT lang, n_tokens, score,
         CASE ((rn - 1) * 3) // n_lang
           WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
  FROM ranked
)
SELECT lang, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(MIN(score) AS BIGINT) AS min_score,
       CAST(MAX(score) AS BIGINT) AS max_score
FROM bucketed
GROUP BY lang, bucket
ORDER BY lang, bucket
"""

register(
    QuerySpec(
        "ccnet_perplexity_buckets",
        ccnet_perplexity_buckets,
        CCNET_PPL_SQL,
        doc="CCNet head/middle/tail perplexity tiers per language (fixed-point surprisal, closed-form terciles)",
        cites="training-data ops: CCNet quality bucketing (Wenzek et al. 2020); builds on unigram_surprisal_score",
        tags=("text", "quality", "training", "corpus"),
    )
)


# ---------------------------------------------------------------------------
# Exact substring-CONTAINMENT dedup — the removal half of suffix-style dedup
# (boilerplate_gram_mask masks repeated passages; this drops whole documents
# that are verbatim contained in a longer document)
# ---------------------------------------------------------------------------


def substring_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source report of documents whose ENTIRE token sequence appears
    verbatim inside another document (crawl snapshots re-publishing a page
    inside a larger page, quote-wrapped reposts): such a doc is dropped in
    favor of its longest container (ties on equal length = identical text;
    min doc_id keeps). Containment is token-aligned — ``' '+A+' '`` a
    substring of ``' '+B+' '`` — so partial-word matches never count.

    Scale shape: the quadratic "A contained in B" scan is pruned to an
    ANCHOR equi-join — if A ⊆ B then A's FIRST ``PASSAGE_N``-token gram
    occurs in B's gram stream at the alignment point (the padded match
    starts right after a token boundary), so joining each doc's anchor
    hash against the corpus gram-occurrence index finds every containment
    candidate (provably lossless; only docs with ≥ PASSAGE_N tokens are
    in scope on BOTH engines). Cost is Σ_g anchors(g)·occurrences(g) —
    the LSH-bucket-join family, never n² — and the expensive
    ``contains()`` verify runs only on candidates. The oracle is the
    independent brute-force all-pairs formulation.

    Reference analogue: dedup policy knobs of the ingest contract
    (elt-common/src/elt_common/extract.py) — this is the containment
    policy the reference's exact-hash dedup cannot express.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "text", "n_chars", F.split("text", " ").alias("t"))
    elig = toks.where(F.size("t") >= PASSAGE_N)
    occ = (
        elig.select(
            F.col("doc_id").alias("b_id"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {PASSAGE_N}),"
                    f" i -> md5(concat_ws(' ', slice(t, i + 1, {PASSAGE_N}))))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    anchors = elig.select(
        F.col("doc_id").alias("a_id"),
        F.expr(f"md5(concat_ws(' ', slice(t, 1, {PASSAGE_N})))").alias("g"),
    )
    cands = (
        anchors.join(occ, "g")
        .where(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    a_side = elig.select(
        F.col("doc_id").alias("a_id"),
        F.col("text").alias("a_text"),
        F.col("n_chars").alias("a_chars"),
    )
    b_side = elig.select(
        F.col("doc_id").alias("b_id"),
        F.col("text").alias("b_text"),
        F.col("n_chars").alias("b_chars"),
    )
    contained = (
        cands.join(a_side, "a_id")
        .join(b_side, "b_id")
        .where(
            F.expr("contains(concat(' ', b_text, ' '), concat(' ', a_text, ' '))")
            & (
                (F.col("b_chars") > F.col("a_chars"))
                # equal length + containment = identical text: min id keeps
                | ((F.col("b_chars") == F.col("a_chars")) & (F.col("b_id") < F.col("a_id")))
            )
        )
        .select(F.col("a_id").alias("doc_id"))
        .distinct()
        .withColumn("is_contained", F.lit(1))
    )
    return (
        d.join(contained, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.size(F.split("text", " ")) >= PASSAGE_N).cast("long")).alias(
                "n_eligible"
            ),
            F.coalesce(F.sum("is_contained"), F.lit(0)).cast("long").alias(
                "n_contained"
            ),
            F.sum(
                F.when(F.col("is_contained").isNotNull(), F.col("n_chars")).otherwise(
                    F.lit(0)
                )
            ).alias("chars_saved"),
        )
    )


CONTAINMENT_SQL = f"""
WITH elig AS (
  SELECT doc_id, text, n_chars
  FROM documents
  WHERE len(string_split(text, ' ')) >= {PASSAGE_N}
),
contained AS (
  SELECT DISTINCT a.doc_id
  FROM elig a JOIN elig b
    ON a.doc_id <> b.doc_id
   AND contains(' ' || b.text || ' ', ' ' || a.text || ' ')
   AND (b.n_chars > a.n_chars OR (b.n_chars = a.n_chars AND b.doc_id < a.doc_id))
)
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN len(string_split(d.text, ' ')) >= {PASSAGE_N} THEN 1 ELSE 0 END) AS BIGINT) AS n_eligible,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contained,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN d.n_chars ELSE 0 END) AS BIGINT) AS chars_saved
FROM documents d LEFT JOIN contained c ON d.doc_id = c.doc_id
GROUP BY d.source
"""

register(
    QuerySpec(
        "substring_containment_dedup",
        substring_containment_dedup,
        CONTAINMENT_SQL,
        doc="drop docs verbatim-contained in a longer doc (anchor-gram pruned, token-aligned)",
        cites="training-data ops: substring dedup, removal policy (Lee et al. 2022); complements boilerplate_gram_mask",
        tags=("text", "dedup"),
    )
)


# ---------------------------------------------------------------------------
# Temperature-smoothed source mixing — the multilingual/domain sampling rule
# ---------------------------------------------------------------------------

MIX_BUDGET = 1_000_000  # tokens allocated across sources per epoch


def temperature_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=0.5 temperature-smoothed sampling allocation across sources: each
    source's sampling weight is ``isqrt(n_tokens)`` — the square-root
    smoothing that upsamples small domains relative to proportional
    sampling (the standard multilingual LM mixing rule) — and a fixed
    token budget is allocated as ``floor(budget * w / Σw)``.

    Exactness: the integer square root is computed identically on both
    engines as a double ``sqrt`` corrected by ±1 integer steps (exact for
    counts < 2^52 — double sqrt is correctly rounded, so the error is
    below one integer). The allocation is integer floor division; the
    only surfaced float is the share ratio (one terminal division of two
    exact integers). One token-count aggregate feeds everything; the
    20-row source table broadcasts against its scalar total.
    """
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens")
    )
    isqrt = (
        "CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)"
    )
    w = (
        f"CASE WHEN ({isqrt} + 1) * ({isqrt} + 1) <= n_tokens THEN {isqrt} + 1 "
        f"WHEN {isqrt} * {isqrt} > n_tokens THEN {isqrt} - 1 ELSE {isqrt} END"
    )
    weighted = per_source.withColumn("w", F.expr(w))
    total = weighted.agg(F.sum("w").alias("_wtot"))
    return weighted.crossJoin(F.broadcast(total)).select(
        "source",
        "n_tokens",
        "w",
        (F.col("w").cast("double") / F.col("_wtot")).alias("share"),
        F.expr(f"CAST({MIX_BUDGET} AS BIGINT) * w DIV _wtot").alias("tok_alloc"),
    )


_ISQRT = "CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)"
_W = (
    f"CASE WHEN ({_ISQRT} + 1) * ({_ISQRT} + 1) <= n_tokens THEN {_ISQRT} + 1 "
    f"WHEN {_ISQRT} * {_ISQRT} > n_tokens THEN {_ISQRT} - 1 ELSE {_ISQRT} END"
)

MIXTURE_SQL = f"""
WITH per_source AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
weighted AS (SELECT source, n_tokens, {_W} AS w FROM per_source)
SELECT source, n_tokens, w,
       CAST(w AS DOUBLE) / (SELECT SUM(w) FROM weighted) AS share,
       CAST({MIX_BUDGET} AS BIGINT) * w // (SELECT CAST(SUM(w) AS BIGINT) FROM weighted) AS tok_alloc
FROM weighted
"""

register(
    QuerySpec(
        "temperature_mixture_allocation",
        temperature_mixture_allocation,
        MIXTURE_SQL,
        doc="sqrt-temperature source sampling weights + exact integer token allocation",
        cites="training-data ops: temperature-smoothed multilingual/domain mixing (alpha=0.5)",
        tags=("training", "corpus"),
    )
)
