"""Round-5 tier F: production-monitoring and privacy-governance ops.

- ``psi_drift_buckets`` — Population Stability Index terms between the
  first and second half of the event stream, per log2 value bucket:
  THE drift monitor run between a training snapshot and live traffic.
  Per-bucket PSI terms are quantized to integer micro-units so the
  total (Σ term_e6) is an exact integer sum — the float-summation
  discipline applied to a monitoring statistic.
- ``k_anonymity_audit``   — group sizes over the quasi-identifier pair
  (nation, market segment) with a k<25 risk flag: the re-identification
  audit run before releasing joined data; risky cells get generalized
  (coarser nation rollup) or suppressed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.functions.detmath import det_ln_ratio_signed as DET_LNS
from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# PSI drift between stream halves
# ---------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-16 00:00:00"

_PSI_ORACLE = f"""
WITH c AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         ts < TIMESTAMP '{_PSI_SPLIT}' AS is_ref
  FROM events
),
b AS (
  SELECT CAST(length(bin(cents)) - 1 AS BIGINT) AS bucket, is_ref
  FROM c WHERE cents >= 1
),
per AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
  FROM b GROUP BY bucket
),
tot AS (
  SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
         CAST(SUM(n_cur) AS BIGINT) AS t_cur,
         COUNT(*) AS n_buckets
  FROM per
)
SELECT per.bucket, per.n_ref, per.n_cur,
       CAST(ROUND(
         (CAST(per.n_ref + 1 AS DOUBLE) / CAST(tot.t_ref + tot.n_buckets AS DOUBLE)
          - CAST(per.n_cur + 1 AS DOUBLE) / CAST(tot.t_cur + tot.n_buckets AS DOUBLE))
         * ({DET_LNS('per.n_ref + 1', 'per.n_cur + 1', div='//')}
            + {DET_LNS('tot.t_cur + tot.n_buckets', 'tot.t_ref + tot.n_buckets', div='//')})
         * 1000000.0) AS BIGINT) AS psi_term_e6
FROM per CROSS JOIN tot
"""


@register("psi_drift_buckets", oracle=_PSI_ORACLE)
def psi_drift_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the reference (first half)
    and current (second half) of the event stream, per log2 value
    bucket: term = (p−q)·ln(p/q) with add-one-smoothed bucket shares;
    PSI = Σ terms (>0.2 conventionally triggers retraining review).

    Determinism: each bucket's term is one pinned double expression
    rounded to integer micro-units, so the total is an exact integer
    sum — a float Σ over buckets would hash differently per summation
    order. Shape: one scan, conditional partial agg per bucket (≤64
    groups), 1-row totals broadcast back — the monitoring statistic
    costs a sketch, not a shuffle of the data, and the per-half bucket
    counts are exactly the mergeable histogram state
    (quantile_log2_sketch / streaming_log2_histogram) a deployment
    already maintains.

    Scale bound: det_ln args are counts+1 (< 2^63); each term is (p−q)·lnratio·1e6 with |p−q| ≤ 1 and |lnratio| < 44, so |psi_term_e6| < 4.4e7 and the bucket sum stays < 2^63 below ~2·10¹¹ buckets."""
    c = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp")).alias("is_ref"),
    )
    b = c.where(F.col("cents") >= 1).select(
        (F.length(F.bin("cents")) - 1).cast("long").alias("bucket"), "is_ref"
    )
    per = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).cast("long").alias("n_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).cast("long").alias("n_cur"),
    )
    tot = per.agg(
        F.sum("n_ref").cast("long").alias("t_ref"),
        F.sum("n_cur").cast("long").alias("t_cur"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    p = (F.col("n_ref") + 1).cast("double") / (
        F.col("t_ref") + F.col("n_buckets")
    ).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (
        F.col("t_cur") + F.col("n_buckets")
    ).cast("double")
    # ln(p/q) decomposed into exact-integer ratios: p/q =
    # ((n_ref+1)/(n_cur+1)) · ((t_cur+nb)/(t_ref+nb)), so ln(p/q) =
    # det_ln(n_ref+1, n_cur+1) + det_ln(t_cur+nb, t_ref+nb) — each term
    # the deterministic atanh-series ln (sign-handled CASE), keeping
    # every factor inside BIGINT range where the cross-multiplied
    # single-ratio form (products of two counts) could overflow at
    # 100 TB. Addition of deterministic doubles is correctly rounded,
    # so psi_term is bit-identical across engines before rounding.
    lnratio = F.expr(
        DET_LNS("n_ref + 1", "n_cur + 1", div="DIV")
    ) + F.expr(
        DET_LNS("t_cur + n_buckets", "t_ref + n_buckets", div="DIV")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round((p - q) * lnratio * 1000000.0)
        .cast("long")
        .alias("psi_term_e6"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------

_K_ANON = 25

_KANON_ORACLE = f"""
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS k,
       COUNT(*) < {_K_ANON} AS is_risky
FROM customer GROUP BY c_nationkey, c_mktsegment
"""


@register("k_anonymity_audit", oracle=_KANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the quasi-identifier pair (nation, market
    segment): each equivalence class reports its size and a k<{_K_ANON}
    risk flag. Classes below k re-identify individuals when joined with
    external data — the release gate either generalizes the QI
    (rollup_geo's coarser hierarchy) or suppresses the cell
    (text_pii_redaction handles the direct identifiers; this audits
    the indirect ones).

    One partial-agg shuffle on the QI columns; output is
    |QI-cross|-bounded. At 100 TB the same query audits any proposed
    release projection before it leaves the platform."""
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("k"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k",
            (F.col("k") < _K_ANON).alias("is_risky"),
        )
    )
