"""Text-analysis column expressions for large-scale document pipelines.

All pure built-in expressions (regexp/hash/length) — they run JVM-side under
whole-stage codegen, so a 100 TB documents table is processed without any
Python boundary. Each has a matching ANSI-SQL formulation used by the DuckDB
oracles in the query registry, so semantics are pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword language
# heuristic. Chosen to be discriminative between en/de/fr and cheap to count.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est"),
}

_WORD = r"[A-Za-z]+"


def token_count(text: Column | str) -> Column:
    """Whitespace token count: number of ``\\S+`` runs (0 for empty/blank)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"\S+"))


def word_count(text: Column | str) -> Column:
    """Alphabetic word count (``[A-Za-z]+`` runs) — BPE-ish pre-tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(_WORD))


def char_len(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def punct_count(text: Column | str) -> Column:
    """Count of ASCII punctuation chars ``.,;:!?'"()-``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"""[.,;:!?'"()\-]"""))


def stopword_count(text: Column | str, lang: str = "en") -> Column:
    """Occurrences of the language's marker stopwords as standalone words."""
    c = F.col(text) if isinstance(text, str) else text
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pat))


def quality_score(text: Column | str) -> Column:
    """Heuristic document-quality score in [0,1].

    mean of: token-length sanity (mean token len in [3,10] chars),
    punctuation ratio < 10%, stopword presence. Mirrors common LLM-corpus
    quality filters (length / punctuation / stopword-density rules).
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = token_count(c)
    n = char_len(c)
    mean_tok_len = F.when(toks > 0, n.cast("double") / toks).otherwise(F.lit(0.0))
    punct_ratio = F.when(n > 0, punct_count(c).cast("double") / n).otherwise(F.lit(0.0))
    has_stop = (stopword_count(c, "en") > 0).cast("double")
    len_ok = ((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0)).cast("double")
    punct_ok = (punct_ratio < 0.10).cast("double")
    return (len_ok + punct_ok + has_stop) / F.lit(3.0)


def lang_scores(text: Column | str) -> dict[str, Column]:
    c = F.col(text) if isinstance(text, str) else text
    return {lang: stopword_count(c, lang) for lang in LANG_MARKERS}


def lang_guess(text: Column | str) -> Column:
    """argmax over language marker hits; ties broken en > de > fr; 'und' if 0.

    Deterministic chained-when formulation (same shape as the SQL oracle).
    """
    s = lang_scores(text)
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] > 0), F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] > 0), F.lit("de"))
        .when(s["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def normalized_text(text: Column | str) -> Column:
    """Canonical form for dedup/fingerprinting: lowercase, collapse
    whitespace, strip non-alphanumerics (keeps spaces)."""
    c = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(c)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 (not Spark's xxhash64) so external engines can reproduce it —
    content-addressable across the lakehouse, not just within one job.
    """
    return F.md5(normalized_text(text))
