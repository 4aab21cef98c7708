"""Round-8 tier F: calendar reporting and the distributed-sketch merge
law.

- ``yoy_revenue_growth``       — monthly revenue with year-over-year
  growth in integer micro-units: the comparable-period report every
  finance dashboard leads with (seasonality-free growth, unlike
  month-over-month).
- ``hll_merge_across_sources`` — per-event-type HLL registers merged
  (MAX) against globally-built registers, proven equal register by
  register: the law that lets 1000 executors sketch independently and
  merge — stated as data, not a comment.

Reference tie: the reference implements none of this tier (SURVEY.md
§2B marks the category ABSENT) — BASELINE.json extension operators
under the repo's exact-integer / portable-hash discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.operators import text as X
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import H15


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# year-over-year revenue growth
# ---------------------------------------------------------------------------

_YOY_ORACLE = """
WITH per AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY yr, mo
),
lagd AS (
  SELECT yr, mo, rev_cents,
         LAG(rev_cents) OVER (PARTITION BY mo ORDER BY yr) AS prev_cents
  FROM per
)
SELECT yr, mo, rev_cents, prev_cents,
       CAST(CASE WHEN prev_cents IS NOT NULL AND prev_cents > 0
                 THEN (rev_cents - prev_cents) * 1000000 // prev_cents
            END AS BIGINT) AS yoy_growth_micro
FROM lagd
"""


@register("yoy_revenue_growth", oracle=_YOY_ORACLE)
def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth: each (year, month)
    cell compared to the SAME month a year earlier (LAG partitioned by
    month, ordered by year) — the seasonality-free growth figure, as
    opposed to month-over-month which mostly measures the calendar.
    Growth is integer-floored micro-units; months without a prior year
    carry NULL rather than a fake zero.

    One fact agg to a ≤|years|·12-row frame (map-side combined), one
    window over that frame — the report costs a sketch at any order
    volume. year()/month() agree across engines for DATE inputs (both
    proleptic Gregorian here)."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(F.sum(cents).cast("long").alias("rev_cents"))
    )
    w = Window.partitionBy("mo").orderBy("yr")
    lagd = per.withColumn("prev_cents", F.lag("rev_cents").over(w))
    return lagd.select(
        "yr",
        "mo",
        "rev_cents",
        "prev_cents",
        F.when(
            F.col("prev_cents").isNotNull() & (F.col("prev_cents") > 0),
            F.expr("(rev_cents - prev_cents) * 1000000 div prev_cents"),
        )
        .cast("long")
        .alias("yoy_growth_micro"),
    )


# ---------------------------------------------------------------------------
# HLL register merge law across sources
# ---------------------------------------------------------------------------

_HLLM_M = 64
_HLLM_REM_BITS = 54  # 60-bit hash, 6 bits spent on the bucket

_HLL_MERGE_ORACLE = f"""
WITH h AS (
  SELECT event_type, {H15.format(x="CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
b AS (SELECT event_type, h % {_HLLM_M} AS bucket, h // {_HLLM_M} AS rem FROM h),
r AS (
  SELECT event_type, bucket,
         CASE WHEN rem > 0 THEN {_HLLM_REM_BITS + 1} - length(bin(rem))
              ELSE {_HLLM_REM_BITS + 1} END AS rho
  FROM b
),
per_src AS (SELECT event_type, bucket, MAX(rho) AS m_j FROM r GROUP BY event_type, bucket),
merged AS (SELECT bucket, CAST(MAX(m_j) AS BIGINT) AS merged_m_j FROM per_src GROUP BY bucket),
globl AS (SELECT bucket, CAST(MAX(rho) AS BIGINT) AS global_m_j FROM r GROUP BY bucket)
SELECT merged.bucket, merged_m_j, global_m_j,
       merged_m_j = global_m_j AS registers_equal
FROM merged JOIN globl ON globl.bucket = merged.bucket
"""


@register("hll_merge_across_sources", oracle=_HLL_MERGE_ORACLE)
def hll_merge_across_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed-sketch merge law as a query: build deterministic
    HLL registers per event_type (five independent sketches of the
    user-id universe), merge them with register-wise MAX, and compare
    to registers built globally — equal bucket by bucket, by the
    semilattice property of max. This is WHY 1000 executors can sketch
    their partitions independently: the merge loses nothing, ever
    (hll_deterministic_estimate turns these registers into a count;
    streaming_hll_registers maintains them live; this entry certifies
    the composition).

    Both register tables reduce from the same hashed projection; the
    comparison join is 64 rows. The registers_equal column is
    all-true BY MATHEMATICS — pinned under the hash gate so a future
    refactor that breaks mergeability (e.g. switching MAX to a
    non-idempotent accumulator) turns the table red."""
    h = _t(spark, sf_dir, "events").select(
        "event_type",
        X.md5_long(F.col("user_id").cast("string")).alias("h"),
    )
    b = h.select(
        "event_type",
        (F.col("h") % _HLLM_M).alias("bucket"),
        F.expr(f"h div {_HLLM_M}").alias("rem"),
    )
    rho = (
        F.when(
            F.col("rem") > 0,
            F.lit(_HLLM_REM_BITS + 1) - F.length(F.bin("rem")),
        )
        .otherwise(F.lit(_HLLM_REM_BITS + 1))
        .alias("rho")
    )
    r = b.select("event_type", "bucket", rho)
    per_src = r.groupBy("event_type", "bucket").agg(F.max("rho").alias("m_j"))
    merged = per_src.groupBy("bucket").agg(
        F.max("m_j").cast("long").alias("merged_m_j")
    )
    globl = r.groupBy("bucket").agg(F.max("rho").cast("long").alias("global_m_j"))
    return merged.join(globl, "bucket").select(
        "bucket",
        "merged_m_j",
        "global_m_j",
        (F.col("merged_m_j") == F.col("global_m_j")).alias("registers_equal"),
    )
