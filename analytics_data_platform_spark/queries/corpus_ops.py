"""Corpus-preparation operators: chunking and redaction.

The two remaining everyday LLM-training-data transforms: split documents
into overlapping token-window chunks (context-length packing) and scrub
PII-shaped spans. Both pure JVM expressions with DuckDB oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

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
