"""Streaming operators over an events stream.

Each builder takes a streaming DataFrame (``spark.readStream`` source) and
returns the transformed streaming DataFrame; callers attach the sink. All
are late-data-safe via event-time watermarks. Tested with file sources +
``trigger(availableNow=True)`` so the same code path that would run against
Kafka runs deterministically in CI.

Design notes (cluster behavior):
- windowed_event_counts / windowed_value_sums: incremental state per
  (window, key) in the state store; watermark bounds state size.
- sessionize_stream: ``session_window`` — Spark merges overlapping
  session fragments in the state store; the batch analogue is
  queries/relational.py::sessionize_events (same 30-min gap semantics).
- streaming_dedup: dropDuplicates WITH watermark — state truncates to the
  watermark horizon; without it state grows unboundedly (the classic
  production footgun).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def with_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    return events.withWatermark("ts", delay)


def windowed_event_counts(
    events: DataFrame, window: str = "5 minutes", delay: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark."""
    return (
        with_watermark(events, delay)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", delay: str = "10 minutes"
) -> DataFrame:
    """Native session windows (gap-close semantics match the batch
    sessionize_events operator)."""
    return (
        with_watermark(events, delay)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Exactly-once-per-event_id within the watermark horizon."""
    return with_watermark(events, delay).dropDuplicatesWithinWatermark(["event_id"])


def run_available_now(stream_df: DataFrame, checkpoint: str, out_path: str) -> None:
    """Drain everything currently available to parquet and stop — the
    incremental-batch execution mode (the streaming twin of the reference's
    cron ticks: each invocation processes exactly the new data, exactly
    once, via the checkpoint)."""
    (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
        .awaitTermination()
    )
