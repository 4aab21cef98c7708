"""Round-12 wave 7: 1-bit embedding quantization with Hamming-distance
retrieval — the cheapest ANN path in current production retrieval
stacks (binary quantization: 64-dim float32 → 64 bits = 32× smaller
than int8, distance = one XOR + popcount). Completes the quantization
ladder: float → int8 (embedding_quantize_int8) → PQ codes
(embedding_pq_codes / pq_adc_topk) → 1-bit (this).

Exactness: the sign bits are packed into TWO 32-bit words per vector
(packing all 64 into one int64 would set the sign bit and, under
ANSI-mode sum-overflow semantics, is engine-dependent; two half-words
stay far from 2⁶³ on both engines). Hamming = bit_count(xor(w0)) +
bit_count(xor(w1)) — exact integers, deterministic (vec_id-tiebroken)
top-k.

Reference tie: none (SURVEY.md §2B) — ANN/similarity extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _pack_sql(lo: int, hi: int) -> str:
    """DuckDB: pack sign bits [lo, hi) of the embedding into one word."""
    return (
        f"list_sum(list_transform(range({lo + 1}, {hi + 1}),"
        f" i -> CASE WHEN embedding[i] > 0"
        f" THEN (1::BIGINT << (i - {lo + 1})) ELSE 0 END))"
    )


def _pack_spark(lo: int, hi: int):
    return F.expr(
        f"aggregate(transform(sequence({lo + 1}, {hi}),"
        f" i -> CASE WHEN embedding[i - 1] > 0"
        f" THEN shiftleft(1L, i - {lo + 1}) ELSE 0L END), 0L, (a, x) -> a + x)"
    )


_HAMMING_ORACLE = f"""
WITH b AS (
  SELECT vec_id,
         CAST({_pack_sql(0, 32)} AS BIGINT) AS w0,
         CAST({_pack_sql(32, 64)} AS BIGINT) AS w1
  FROM embeddings
),
q AS (SELECT w0 AS qw0, w1 AS qw1 FROM b WHERE vec_id = 0),
d AS (
  SELECT vec_id,
         CAST(bit_count(xor(w0, qw0)) + bit_count(xor(w1, qw1)) AS BIGINT)
           AS hamming,
         w0, w1
  FROM b, q WHERE vec_id <> 0
)
SELECT vec_id, hamming, w0, w1
FROM d ORDER BY hamming, vec_id LIMIT 10
"""


@register("ann_binary_hamming_topk", oracle=_HAMMING_ORACLE)
def ann_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized top-10 neighbors of vec_id 0: sign-bit packing
    (two 32-bit words per 64-dim vector), Hamming distance via
    XOR+popcount, TakeOrderedAndProject top-k with a vec_id tiebreak.
    For unit-norm-ish embeddings Hamming distance is a monotone proxy
    for angular distance; this rank-front is the candidate set a
    binary-first retrieval stack rescores with full-precision vectors
    (exactly the funnel ann_jl_lsh_topk builds with JL projections —
    this is the 1-bit rung).

    100-TB shape: packing is row-local (8 bytes of index per vector —
    the whole corpus index fits in a fraction of the raw embeddings);
    the query word pair is a broadcast 1-row cross; top-k keeps k rows
    per partition, no global sort. A billion vectors scan as pure
    int64 columns with whole-stage codegen — no float math at query
    time at all."""
    b = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        _pack_spark(0, 32).cast("long").alias("w0"),
        _pack_spark(32, 64).cast("long").alias("w1"),
    )
    q = b.where(F.col("vec_id") == 0).select(
        F.col("w0").alias("qw0"), F.col("w1").alias("qw1")
    )
    hamming = (
        F.bit_count(F.col("w0").bitwiseXOR(F.col("qw0")))
        + F.bit_count(F.col("w1").bitwiseXOR(F.col("qw1")))
    ).cast("long")
    return (
        b.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", hamming.alias("hamming"), "w0", "w1")
        .orderBy("hamming", "vec_id")
        .limit(10)
    )
