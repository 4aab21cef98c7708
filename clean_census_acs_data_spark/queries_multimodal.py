"""Multimodal feature-extraction query. The oracle recomputes the
byte-level features in SQL (documents are pure-ASCII so char ops equal
byte ops), proving the mapInPandas binary path end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.operators.multimodal import extract_features, synthesize_media
from clean_census_acs_data_spark.queries import register

_MM_ORACLE = """
SELECT doc_id AS asset_id,
       ['image', 'audio', 'video'][(doc_id % 3) + 1] AS modality,
       CAST(length(text) AS BIGINT) AS byte_len,
       CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS first_byte,
       CAST(list_sum(list_transform(range(1, length(text) + 1),
                     i -> ascii(substring(text, i, 1)))) % 997 AS BIGINT) AS checksum_mod,
       CAST(length(text) % 16 + 1 AS INTEGER) AS n_frames
FROM documents
"""


@register("multimodal_features", oracle=_MM_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column (synthesized utf-8 payloads + modality
    metadata) → Arrow-batched mapInPandas feature extraction. The
    decode step is a documented stub (no codecs in this env); byte-level
    features prove schema/batching/binary round-trip. Stateless per-batch
    Python: scales linearly, AQE can split skew."""
    # no spread() here: mapInPandas spawns one Python worker per
    # partition, and worker startup dominates at local scale; at 100 TB
    # the scan's natural partitioning already parallelizes the Python
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media)


_FRAME_ORACLE = """
WITH f AS (
  SELECT doc_id AS asset_id, text,
         greatest(CAST(ceil(length(text) / 16.0) AS INTEGER), 1) AS n_frames
  FROM documents WHERE doc_id % 41 = 0
)
SELECT asset_id,
       CAST(u.fi AS INTEGER) AS frame_idx,
       CAST(length(substring(text, u.fi * 16 + 1, 16)) AS INTEGER) AS frame_len,
       CAST(list_sum(list_transform(
              range(1, length(substring(text, u.fi * 16 + 1, 16)) + 1),
              i -> ascii(substring(substring(text, u.fi * 16 + 1, 16), i, 1))))
            % 997 AS BIGINT) AS frame_checksum
FROM f, UNNEST(range(0, n_frames, 4)) AS u(fi)
"""


@register("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every 4th 16-byte frame per asset via the
    Arrow-batched generator (operators/multimodal.py:sample_frames) —
    the video frame-extraction shape with a deterministic byte-window
    stand-in for the codec. The oracle re-derives frames with substring
    windows (payloads are ASCII here, so byte ops == char ops)."""
    from clean_census_acs_data_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 41 == 0)
    return sample_frames(synthesize_media(docs), frame_bytes=16, stride=4)


_ARROW_STATS_ORACLE = """
SELECT doc_id AS asset_id,
       CAST(length(text) AS BIGINT) AS byte_len,
       CAST(list_sum(list_transform(range(1, length(text) + 1),
                     i -> ascii(substring(text, i, 1)))) AS BIGINT) AS ascii_sum
FROM documents
"""


@register("multimodal_arrow_stats", oracle=_ARROW_STATS_ORACLE)
def multimodal_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow byte statistics: the binary payload column reduced
    with numpy directly over Arrow buffers (no pandas boundary, no
    per-row Python) — one vectorized cumsum per RecordBatch. Oracle
    recomputes the byte sums character-wise (pure-ASCII fixture, so
    char ops equal byte ops)."""
    from clean_census_acs_data_spark.operators.multimodal import (
        arrow_byte_stats,
        synthesize_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    return arrow_byte_stats(synthesize_media(docs))
