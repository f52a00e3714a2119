"""Structured-Streaming queries under the DuckDB oracle gate.

Everything else in streaming/ is pytest-verified; this module puts an
actual streaming EXECUTION under the same external hash-verification as
the batch registry: the query runs a real ``readStream → window agg →
availableNow`` pipeline over the events table and returns its final
result, and the oracle recomputes the same aggregate in batch SQL — if
the streaming engine dropped, duplicated, or mis-windowed anything, the
value hash catches it. (Exactly-once replay, watermark-drop and state
semantics stay in tests/test_streaming.py — they need multiple drains.)
"""

from __future__ import annotations

import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from analytics_data_platform_spark.queries import QuerySpec, register

# the events parquet stores TIMESTAMP(NANOS); with the session's
# nanosAsLong conf it surfaces as LongType nanos (see sources/testdata.py)
_EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def streaming_hourly_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type event counts computed BY THE STREAMING ENGINE
    (file-stream source → event-time tumbling window → availableNow drain
    → complete-mode memory sink) and hash-compared with a batch oracle.

    Output cardinality is calendar×|types| — bounded regardless of corpus
    size, so the complete-mode state is safe at any SF (a data-linear
    aggregate would use append mode + watermark instead, as
    streaming/streams.py does). At 100 TB the same plan runs continuously
    with ``trigger(processingTime=…)`` against arriving files; availableNow
    here makes it a terminating, driver-gateable query.
    """
    from analytics_data_platform_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    stream = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        # the file-stream source needs a DIRECTORY; select just the events
        # file out of the sf dir with a glob filter
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        # the streaming parquet reader coerces TIMESTAMP(NANOS)→LongType to
        # MICROS (unlike the batch nanosAsLong path, which yields nanos) —
        # normalize by magnitude so either behavior converts correctly:
        # epoch micros are ~1e15-1e16 this millennium, nanos ~1e18
        .withColumn(
            "ts",
            F.timestamp_micros(
                F.when(F.col("ts") > F.lit(100_000_000_000_000_000), F.expr("ts div 1000"))
                .otherwise(F.col("ts"))
            ),
        )
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"stream_hourly_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="adps-stream-q-")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("hour_start"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
    )


STREAM_HOURLY_SQL = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
"""

register(
    QuerySpec(
        "streaming_hourly_type_counts",
        streaming_hourly_type_counts,
        STREAM_HOURLY_SQL,
        doc="hourly event counts computed by Structured Streaming (availableNow), batch-oracle hash-verified",
        cites="streaming/streams.py windowed aggregation; SURVEY §2.10 streaming family",
        tags=("streaming",),
    )
)
