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


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_checksum", LongType()),
    ]
)


def sample_frames(
    media: DataFrame, *, frame_bytes: int = 16, stride: int = 4, checksum_mod: int = 997
) -> DataFrame:
    """Frame sampling over opaque payloads: split each payload into
    fixed-width byte frames, keep every ``stride``-th one — the video
    frame-sample shape (1 input row → N output rows) as an Arrow-batched
    generator. A real decoder would replace the byte-windowing with
    codec frame extraction; schema/batching/fan-out are identical.
    Stateless per batch → linear scale, AQE splits skew."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(1, -(-len(b) // frame_bytes))
                for fi in range(0, n_frames, stride):
                    fr = b[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(aid)
                    idxs.append(fi)
                    lens.append(len(fr))
                    sums.append(sum(fr) % checksum_mod)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def resize_payload(
    media: DataFrame,
    *,
    target_bytes: int = 64,
    resizer: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing: transform each payload to a fixed byte budget.
    A real image resize needs a codec (inject ``resizer``); the default
    deterministic stand-in truncates — preserving the contract the
    downstream cares about (bounded payload size, same schema). Binary
    in, binary out, per-batch Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fn = resizer or (lambda b, n: b[:n])
            resized = pdf["payload"].map(lambda b: fn(bytes(b), target_bytes))
            out = pdf.copy()
            out["payload"] = resized
            out["byte_len"] = resized.map(len).astype("int64")
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


def arrow_byte_stats(media: DataFrame) -> DataFrame:
    """Arrow-native byte statistics via ``mapInArrow`` — the zero-copy
    tier below mapInPandas: RecordBatches arrive as raw Arrow buffers
    and the whole batch is reduced with numpy over the flattened binary
    data buffer (one cumsum per batch, O(bytes), no per-row Python and
    no pandas materialization). The right boundary for byte-level
    multimodal work (checksums, histograms, magic-number sniffing)
    where even pandas object arrays are overhead."""
    import numpy as np
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            ids = batch.column("asset_id")
            payload = batch.column("payload")
            # normalize the slice view: offsets index into the data
            # buffer relative to arr.offset
            arr = payload.slice(0, len(payload))
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset : arr.offset + len(arr) + 1
            ].astype(np.int64)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            csum = np.concatenate(
                ([0], np.cumsum(data, dtype=np.int64))
            )
            sums = csum[offs[1:]] - csum[offs[:-1]]
            lens = offs[1:] - offs[:-1]
            yield pa.record_batch(
                {
                    "asset_id": ids,
                    "byte_len": pa.array(lens, pa.int64()),
                    "ascii_sum": pa.array(sums, pa.int64()),
                }
            )

    return media.select("asset_id", "payload").mapInArrow(
        run, "asset_id long, byte_len long, ascii_sum long"
    )
