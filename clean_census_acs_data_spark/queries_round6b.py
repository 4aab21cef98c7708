"""Round-6 tier B: streaming maintenance of the remaining mergeable
index/sketch states.

The hash-checked streaming family covers one aggregation algebra per
entry — count (streaming_cms_merge, streaming_log2_histogram), count +
sort-limit (streaming_topk_complete), max (streaming_hll_registers).
This module adds the two missing algebras:

- ``streaming_bitmap_index`` — bitwise OR state: the bitmap index
  (bitmap_index_status's words) maintained by the streaming engine.
  OR is commutative/associative/idempotent, so the complete-mode
  replay is batch-equal and the entry hash-checks; idempotence means
  even at-least-once delivery cannot corrupt this state.
- ``streaming_kmv_state``   — bottom-k (min-k) state: the KMV sketch
  (distinct_kmv_estimate's hash list) maintained as a complete-mode
  sort-limit. Order-insensitive by construction → hash-checks.

With these, every mergeable-state algebra the batch tier uses
(sum / max / or / bottom-k) has a streaming twin proven equal to its
batch oracle.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.operators import text as X
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import H15

_BM_WORD = 63  # 63-bit words (DuckDB BIGINT << 63 overflows the sign bit)
_KMV_K = 32

_STREAM_BITMAP_ORACLE = f"""
SELECT event_type,
       user_id // {_BM_WORD} AS word_idx,
       CAST(bit_or(CAST(1 AS BIGINT) << CAST(user_id % {_BM_WORD} AS INT))
            AS BIGINT) AS bitmap_word
FROM events
GROUP BY event_type, user_id // {_BM_WORD}
"""


@register("streaming_bitmap_index", oracle=_STREAM_BITMAP_ORACLE)
def streaming_bitmap_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type user bitmap maintained BY the streaming engine:
    complete-mode bit_or over (event_type, 63-user word). OR-state is
    the friendliest streaming aggregate of all — idempotent, so
    at-least-once redelivery is harmless, and mergeable, so shards OR
    independently. The replayed stream's words are batch-equal, hence
    this hash-checks against the batch oracle (fifth hash-checked
    streaming entry; the batch twin is bitmap_index_status)."""
    from clean_census_acs_data_spark.streaming.windows import (
        _events_stream,
        _streaming_scope,
    )

    spark = _streaming_scope(spark)  # default state partitions, clone-scoped
    ev = _events_stream(spark, sf_dir)
    bit = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {_BM_WORD} AS INT))"
    )
    agg = ev.groupBy(
        "event_type", F.expr(f"user_id div {_BM_WORD}").alias("word_idx")
    ).agg(F.bit_or(bit).cast("long").alias("bitmap_word"))
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


_STREAM_KMV_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT {H15.format(x="CAST(user_id AS VARCHAR)")} AS h FROM events
)
SELECT h FROM h ORDER BY h LIMIT {_KMV_K}
"""


@register("streaming_kmv_state", oracle=_STREAM_KMV_ORACLE)
def streaming_kmv_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV bottom-{_KMV_K} hash list maintained BY the streaming
    engine: complete-mode DISTINCT aggregation on the 60-bit user-id
    hash, then ORDER BY + LIMIT (legal in complete mode). Bottom-k is
    a semilattice (merge = union, keep k smallest) and the hash set is
    order-insensitive, so full replay is batch-equal and the entry
    hash-checks. Estimation on top of this state is
    distinct_kmv_estimate — with streaming_hll_registers this closes
    the incremental-distinct story for BOTH sketch families."""
    from clean_census_acs_data_spark.streaming.windows import (
        _events_stream,
        _streaming_scope,
    )

    spark = _streaming_scope(spark)  # default state partitions, clone-scoped
    ev = _events_stream(spark, sf_dir)
    h = ev.select(X.md5_long(F.col("user_id").cast("string")).alias("h"))
    agg = (
        h.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select("h")
        .orderBy("h")
        .limit(_KMV_K)
    )
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
