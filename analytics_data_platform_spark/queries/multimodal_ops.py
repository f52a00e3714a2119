"""Multimodal binary-column queries under the DuckDB oracle gate.

operators/multimodal.py carries the binary-payload plumbing (opaque
``binary`` columns + typed metadata, Arrow-batched Python feature
stages, JVM frame-sampling) but was pytest-only until this module: here
a deterministic media table is derived FROM the documents corpus — a
real format magic header (PNG/JPEG/RIFF by ``doc_id % 3``) prepended to
the UTF-8 text bytes — so DuckDB can rebuild byte-identical payloads
and verify everything the Spark side computes about them:

- ``multimodal_binary_stats`` drives the REAL ``extract_byte_features``
  mapInPandas stage (size-bounded Arrow batches) and verifies its
  n_bytes/header outputs plus an md5 content checksum per media type;
- ``multimodal_frame_sample`` drives the JVM ``sample_frames`` explode
  and verifies the sampled-frame counts/timestamps.

The codec-requiring stages (decode_media/resize_media) stay env-gated
pytest with injected fakes — no image/audio libraries in this container
(reference analogue: the binary file handling of S7/S10).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.operators.multimodal import (
    extract_byte_features,
    sample_frames,
)
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table

# (media_type, magic-bytes hex) by doc_id % 3 — real format signatures:
# PNG (8-byte), JPEG/JFIF (4-byte), RIFF (4-byte, the WAV container)
_FORMATS = (
    ("image/png", "89504E470D0A1A0A"),
    ("image/jpeg", "FFD8FFE0"),
    ("audio/wav", "52494646"),
)

_FRAME_EVERY_MS = 250


def _media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic media table: payload = magic ‖ utf8(text)."""
    d = load_table(spark, sf_dir, "documents")
    sel = F.col("doc_id") % 3
    mtype = (
        F.when(sel == 0, _FORMATS[0][0])
        .when(sel == 1, _FORMATS[1][0])
        .otherwise(_FORMATS[2][0])
    )
    magic = (
        F.when(sel == 0, _FORMATS[0][1])
        .when(sel == 1, _FORMATS[1][1])
        .otherwise(_FORMATS[2][1])
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.unhex(magic), F.encode("text", "UTF-8")).alias("payload"),
        mtype.alias("media_type"),
        magic.alias("magic_hex"),
        F.col("n_chars").cast("int").alias("duration_ms"),
    )


def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type stats of a binary payload column, computed through
    the REAL Arrow-batched feature stage and hash-verified end to end:
    ``extract_byte_features`` (mapInPandas over size-bounded partitions)
    supplies n_bytes and the 8-byte header signature; an md5 over the
    payload hex is the content checksum — if the Python stage corrupted,
    truncated, or re-ordered a single byte of any payload, a count, the
    magic-match tally, or the md5 extrema would diverge from the oracle.

    Scale shape: payloads never reach the driver (the one collect is the
    |media_types|-row result); the Python stage sees ~256 MB Arrow
    batches via the operator's size-bounded repartition; everything else
    is one JVM projection + one partial-aggregated groupBy.
    """
    media = _media_frame(spark, sf_dir)
    feats = extract_byte_features(media)  # media_id, n_bytes, entropy, byte_mean, header_hex
    joined = feats.join(
        media.select("media_id", "media_type", "magic_hex", F.md5(F.hex("payload")).alias("md5_hex")),
        "media_id",
    )
    return (
        joined.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
            F.sum(
                F.upper("header_hex").startswith(F.col("magic_hex")).cast("bigint")
            ).alias("n_magic_ok"),
            F.count_distinct("md5_hex").alias("n_distinct_md5"),
            F.min("md5_hex").alias("min_md5"),
            F.max("md5_hex").alias("max_md5"),
        )
        .orderBy("media_type")
    )


def _media_sql() -> str:
    mtype = (
        f"CASE doc_id % 3 WHEN 0 THEN '{_FORMATS[0][0]}' "
        f"WHEN 1 THEN '{_FORMATS[1][0]}' ELSE '{_FORMATS[2][0]}' END"
    )
    magic = (
        f"CASE doc_id % 3 WHEN 0 THEN '{_FORMATS[0][1]}' "
        f"WHEN 1 THEN '{_FORMATS[1][1]}' ELSE '{_FORMATS[2][1]}' END"
    )
    return f"""
media AS (
  SELECT doc_id AS media_id,
         unhex({magic}) || encode(text) AS payload,
         {mtype} AS media_type,
         {magic} AS magic_hex,
         CAST(n_chars AS INT) AS duration_ms
  FROM documents
)"""


MM_BINARY_SQL = f"""
WITH {_media_sql().strip()},
feats AS (
  SELECT media_id, media_type, magic_hex,
         octet_length(payload) AS n_bytes,
         substr(hex(payload), 1, 16) AS header_hex,
         md5(hex(payload)) AS md5_hex
  FROM media
)
SELECT media_type,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
       CAST(SUM(CASE WHEN substr(header_hex, 1, len(magic_hex)) = magic_hex
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_magic_ok,
       CAST(COUNT(DISTINCT md5_hex) AS BIGINT) AS n_distinct_md5,
       MIN(md5_hex) AS min_md5,
       MAX(md5_hex) AS max_md5
FROM feats
GROUP BY media_type
ORDER BY media_type
"""

register(
    QuerySpec(
        "multimodal_binary_stats",
        multimodal_binary_stats,
        MM_BINARY_SQL,
        doc="binary media payload stats through the Arrow-batched feature stage, md5 content-checksummed",
        cites="operators/multimodal.py extract_byte_features; reference binary handling S7/S10",
        tags=("multimodal", "binary"),
    )
)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing verified end to end: ``sample_frames``
    explodes one row per sampled timestamp (pure JVM — no Python in the
    fan-out path), using n_chars as a deterministic duration_ms proxy.
    The oracle recomputes the exact frame grid, so an off-by-one in the
    sequence bounds, a dropped zero-duration item, or a wrong timestamp
    stride diverges immediately.

    Scale shape: explode fan-out is bounded by duration/stride per item
    and stays in whole-stage codegen; the aggregate is one partial-agg
    groupBy over |media_types| keys.
    """
    media = _media_frame(spark, sf_dir)
    frames = sample_frames(media, every_ms=_FRAME_EVERY_MS)
    return (
        frames.join(media.select("media_id", "media_type"), "media_id")
        .groupBy("media_type")
        .agg(
            F.count_distinct("media_id").alias("n_media"),
            F.count(F.lit(1)).alias("n_frames"),
            F.max("frame_ts_ms").cast("bigint").alias("max_frame_ts_ms"),
            F.sum("frame_ts_ms").alias("sum_frame_ts_ms"),
        )
        .orderBy("media_type")
    )


MM_FRAMES_SQL = f"""
WITH {_media_sql().strip()},
frames AS (
  SELECT media_id, media_type,
         UNNEST(range(0, duration_ms // {_FRAME_EVERY_MS})) * {_FRAME_EVERY_MS} AS frame_ts_ms
  FROM media
)
SELECT media_type,
       CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(MAX(frame_ts_ms) AS BIGINT) AS max_frame_ts_ms,
       CAST(SUM(frame_ts_ms) AS BIGINT) AS sum_frame_ts_ms
FROM frames
GROUP BY media_type
ORDER BY media_type
"""

register(
    QuerySpec(
        "multimodal_frame_sample",
        multimodal_frame_sample,
        MM_FRAMES_SQL,
        doc="video-frame sampling grid (JVM explode) per media type, oracle-verified frame counts/timestamps",
        cites="operators/multimodal.py sample_frames; reference binary handling S7/S10",
        tags=("multimodal", "binary"),
    )
)
