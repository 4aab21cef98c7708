"""Round-8 tier E: freshness analytics and rank normalization.

- ``trending_event_types``    — per hour, the top-3 event types by
  count GROWTH over the previous hour: "trending" proper (rank by
  delta, not by volume), the freshness signal dashboards and feed
  rankers compute every tick.
- ``quantile_rank_normalize`` — each document's length mapped to its
  corpus quantile rank in integer micro-units: quantile normalization,
  the monotone feature transform that makes heavy-tailed features
  comparable across corpora (winsorize_clip trims tails; this
  replaces the value with its rank).

Reference tie: the reference implements none of this tier (SURVEY.md
§2B marks the category ABSENT) — BASELINE.json extension operators
under the repo's exact-integer discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# trending event types (rank by hour-over-hour growth)
# ---------------------------------------------------------------------------

_US_HOUR = 3_600_000_000

_TRENDING_ORACLE = f"""
WITH per AS (
  SELECT epoch_us(ts) // {_US_HOUR} AS hour_bucket, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY hour_bucket, event_type
),
lagd AS (
  SELECT hour_bucket, event_type, n,
         COALESCE(LAG(n) OVER (PARTITION BY event_type ORDER BY hour_bucket), 0)
           AS prev_n
  FROM per
)
SELECT CAST(hour_bucket AS BIGINT) AS hour_bucket, event_type, n,
       CAST(n - prev_n AS BIGINT) AS delta,
       CAST(trend_rank AS BIGINT) AS trend_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_bucket
                               ORDER BY n - prev_n DESC, event_type) AS trend_rank
  FROM lagd
) WHERE trend_rank <= 3
"""


@register("trending_event_types", oracle=_TRENDING_ORACLE)
def trending_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per hour, the 3 event types with the largest count GROWTH over
    their previous active hour — trending proper: volume ranking
    surfaces the permanently-popular, delta ranking surfaces what is
    CHANGING, which is what feed rankers and incident dashboards
    actually watch. Missing previous hours count as zero (a type's
    first appearance trends by its full volume).

    Two windows on the sketch-sized (hour × type) aggregate — the LAG
    partitions by type, the rank by hour; both operate on at most
    |hours|·|types| rows regardless of event volume, so the trend feed
    costs nothing beyond the count rollup at any scale.

    Scale bound: hour buckets are µs div constants and everything downstream is a count — int64 to 9.2·10¹⁸ events."""
    per = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.expr(f"unix_micros(ts) div {_US_HOUR}").alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wl = Window.partitionBy("event_type").orderBy("hour_bucket")
    lagd = per.withColumn(
        "delta", F.col("n") - F.coalesce(F.lag("n").over(wl), F.lit(0))
    )
    wr = Window.partitionBy("hour_bucket").orderBy(
        F.desc("delta"), F.asc("event_type")
    )
    return (
        lagd.withColumn("trend_rank", F.row_number().over(wr))
        .where(F.col("trend_rank") <= 3)
        .select(
            F.col("hour_bucket").cast("long"),
            "event_type",
            "n",
            F.col("delta").cast("long"),
            F.col("trend_rank").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# quantile-rank normalization
# ---------------------------------------------------------------------------

_QRANK_ORACLE = """
WITH r AS (
  SELECT doc_id, n_chars,
         RANK() OVER (ORDER BY n_chars) AS rk,
         COUNT(*) OVER () AS n
  FROM documents
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST((rk - 1) * 1000000 // n AS BIGINT) AS quantile_micro
FROM r
"""


@register("quantile_rank_normalize", oracle=_QRANK_ORACLE)
def quantile_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length: each doc's n_chars
    replaced by its corpus quantile rank ((rank−1)/n in integer
    micro-units; ties share the RANK value so equal lengths get equal
    quantiles). The monotone transform that makes heavy-tailed
    features comparable across corpora and robust to outliers —
    winsorize_clip's rank-space sibling, and the per-feature step of
    classic quantile normalization in batch-effect correction.

    The global rank window runs over the (doc, length) projection —
    16 bytes/row; at 100 TB the same numbers come from
    range_partition_boundaries-style split points plus per-partition
    local ranks (the documented scale path for every global-rank
    entry in this repo). Integer-floored micro quantiles, no
    doubles."""
    r = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )
    return r.select(
        "doc_id",
        "n_chars",
        # rank() yields INT; widen BEFORE the ×1e6 or ranks past 2147
        # overflow int32 under ANSI mode (caught by the sf0.1 bench —
        # sf0.001/0.01 have too few docs to trip it)
        F.expr(
            "cast((cast(rank() over (order by n_chars) as bigint) - 1) * 1000000"
            " div (count(1) over ()) as long)"
        ).alias("quantile_micro"),
    )
