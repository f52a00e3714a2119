"""Python UDTF surface (SURVEY §2.9).

The reference's only table-in/table-out operator (the monitor-peak fit,
X2) runs here as Arrow-batched ``mapInPandas`` (sources/archive.py) — the
right tool for bulk work. This module covers the remaining §2.9 API
surface: Spark 4's scalar→table Python UDTF, registered so SQL users can
LATERAL-join a fan-out transform. Row-at-a-time by design — use it for
small expansions in interactive SQL, never a 100 TB hot path (that's
what the mapInPandas/pandas_udf operators are for).

Built lazily inside the registration call: decorating at import time can
precede an active SparkSession (same constraint as @pandas_udf).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _split_sentences_cls():
    class SplitSentences:
        """(pos, sentence) per '.'-delimited sentence of the input."""

        def eval(self, text: str):  # noqa: ANN001 — UDTF protocol
            if text is None:
                return
            pos = 0
            for part in text.split("."):
                s = part.strip()
                if s:
                    yield (pos, s)
                    pos += 1

    return SplitSentences


def register_udtfs(spark: SparkSession) -> None:
    """Register the SQL table functions: ``split_sentences(text)``."""
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "split_sentences",
        udtf(_split_sentences_cls(), returnType="pos int, sentence string"),
    )
