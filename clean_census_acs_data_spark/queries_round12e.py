"""Round-12 wave 5: monitoring operators — CUSUM changepoint detection
and forecast-baseline accuracy (WAPE) — exact-integer oracle
discipline.

- ``cusum_changepoint``   — one-sided upper CUSUM over each event
  type's daily counts. The textbook recursion
  S_t = max(0, S_{t-1} + (x_t − k)) is not window-expressible, but its
  closed form IS: S_t = P_t − min(0, min_{s≤t} P_s) where P is the
  prefix sum of (x_t − k) — two cumulative windows, exact in milli
  fixed-point. The drift/regression alarm every metrics pipeline
  wants, computed without a stateful UDF.
- ``forecast_naive_wape`` — WAPE/bias of the two standard forecasting
  baselines (lag-1 naive, lag-7 seasonal naive) per event type:
  Σ|y−ŷ| and Σy as exact integers, the ratio as one IEEE division.
  The gate a real forecasting model must beat — and the first number
  a forecast-accuracy review asks for.

Reference tie: none (SURVEY.md §2B) — engine-extension tier.
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
# CUSUM changepoint (closed-form via prefix sums, milli fixed-point)
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS dy, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
ref AS (  -- per-type reference level: mean daily count, milli fixed-point
  SELECT event_type, dy, cnt,
         (SUM(cnt) OVER (PARTITION BY event_type) * 1000)
           // COUNT(*) OVER (PARTITION BY event_type) AS k_milli
  FROM daily
),
p AS (
  SELECT event_type, dy, cnt, k_milli,
         SUM(cnt * 1000 - k_milli) OVER (
           PARTITION BY event_type ORDER BY dy
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_milli
  FROM ref
),
c AS (
  SELECT event_type, dy, cnt, k_milli, p_milli,
         p_milli - LEAST(0, MIN(p_milli) OVER (
           PARTITION BY event_type ORDER BY dy
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum_milli
  FROM p
)
SELECT event_type, dy, cnt,
       CAST(k_milli AS BIGINT) AS k_milli,
       CAST(p_milli AS BIGINT) AS p_milli,
       CAST(cusum_milli AS BIGINT) AS cusum_milli,
       cusum_milli > k_milli // 4 AS alarm
FROM c
"""


@register("cusum_changepoint", oracle=_CUSUM_ORACLE)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided upper CUSUM per event type over daily counts, with the
    per-type mean daily count as the reference level k and an alarm at
    S > k/4. The recursion S_t = max(0, S_{t−1} + (x_t − k)) is
    re-expressed in closed form S_t = P_t − min(0, min_{s≤t} P_s)
    (P = prefix sum of deviations) — two cumulative windows instead of
    a stateful loop, exact in milli fixed-point (k is a floor-divided
    rational; everything after is integer adds and mins, so the alarm
    threshold cannot flip between engines).

    100-TB shape: one partial-agg shuffle to the (type, day) grid;
    both cumulative windows and the reference level share the single
    hash partitioning on event_type (exchange reuse); per-type state
    streams in day order. A monitoring sweep over a million metrics is
    the same plan with metric_id for event_type."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("dy"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ref = daily.select(
        "event_type",
        "dy",
        "cnt",
        F.expr(
            "(sum(cnt) OVER (PARTITION BY event_type) * 1000)"
            " DIV count(*) OVER (PARTITION BY event_type)"
        ).alias("k_milli"),
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("dy")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = ref.withColumn(
        "p_milli", F.sum(F.col("cnt") * 1000 - F.col("k_milli")).over(wc)
    )
    c = p.withColumn(
        "cusum_milli",
        F.col("p_milli")
        - F.least(F.lit(0), F.min("p_milli").over(wc)),
    )
    return c.select(
        "event_type",
        "dy",
        "cnt",
        F.col("k_milli").cast("long").alias("k_milli"),
        F.col("p_milli").cast("long").alias("p_milli"),
        F.col("cusum_milli").cast("long").alias("cusum_milli"),
        (F.col("cusum_milli") > F.expr("k_milli DIV 4")).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# naive-forecast WAPE audit (lag-1 and lag-7 baselines)
# ---------------------------------------------------------------------------

_WAPE_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS dy, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
l AS (
  SELECT event_type, dy, cnt,
         LAG(cnt, 1) OVER (PARTITION BY event_type ORDER BY dy) AS yhat1,
         LAG(cnt, 7) OVER (PARTITION BY event_type ORDER BY dy) AS yhat7
  FROM daily
),
g AS (
  SELECT event_type,
         SUM(CASE WHEN yhat1 IS NOT NULL THEN ABS(cnt - yhat1) END) AS ae1,
         SUM(CASE WHEN yhat1 IS NOT NULL THEN cnt - yhat1 END) AS bias1,
         SUM(CASE WHEN yhat1 IS NOT NULL THEN cnt END) AS y1,
         SUM(CASE WHEN yhat7 IS NOT NULL THEN ABS(cnt - yhat7) END) AS ae7,
         SUM(CASE WHEN yhat7 IS NOT NULL THEN cnt - yhat7 END) AS bias7,
         SUM(CASE WHEN yhat7 IS NOT NULL THEN cnt END) AS y7,
         COUNT(yhat1) AS n1, COUNT(yhat7) AS n7
  FROM l GROUP BY event_type
)
SELECT event_type,
       CAST(n1 AS BIGINT) AS n_rounds_lag1,
       CAST(n7 AS BIGINT) AS n_rounds_lag7,
       CAST(ae1 AS BIGINT) AS abs_err_lag1,
       CAST(bias1 AS BIGINT) AS bias_lag1,
       CAST(ae7 AS BIGINT) AS abs_err_lag7,
       CAST(bias7 AS BIGINT) AS bias_lag7,
       CAST(ae1 AS DOUBLE) / CAST(y1 AS DOUBLE) AS wape_lag1,
       CAST(ae7 AS DOUBLE) / CAST(y7 AS DOUBLE) AS wape_lag7
FROM g
"""


@register("forecast_naive_wape", oracle=_WAPE_ORACLE)
def forecast_naive_wape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline accuracy per event type: WAPE (Σ|y−ŷ|/Σy) and
    signed bias for the lag-1 naive and lag-7 seasonal-naive
    forecasts of daily counts — the two baselines every forecasting
    model must beat before it ships, evaluated only on days where the
    baseline is defined (the first 1/7 days warm up). Absolute errors
    and totals are exact integers; each WAPE is one IEEE division.

    100-TB shape: one partial-agg shuffle to the (type, day) grid; the
    two lags and the final aggregate all ride the event_type hash
    partitioning (one exchange, reused); output is |types| rows."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("dy"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("dy")
    lagd = daily.select(
        "event_type",
        "cnt",
        F.lag("cnt", 1).over(w).alias("yhat1"),
        F.lag("cnt", 7).over(w).alias("yhat7"),
    )

    def s(col, expr_col):
        return F.sum(F.when(F.col(col).isNotNull(), expr_col))

    g = lagd.groupBy("event_type").agg(
        s("yhat1", F.abs(F.col("cnt") - F.col("yhat1"))).alias("ae1"),
        s("yhat1", F.col("cnt") - F.col("yhat1")).alias("bias1"),
        s("yhat1", F.col("cnt")).alias("y1"),
        s("yhat7", F.abs(F.col("cnt") - F.col("yhat7"))).alias("ae7"),
        s("yhat7", F.col("cnt") - F.col("yhat7")).alias("bias7"),
        s("yhat7", F.col("cnt")).alias("y7"),
        F.count("yhat1").alias("n1"),
        F.count("yhat7").alias("n7"),
    )
    return g.select(
        "event_type",
        F.col("n1").cast("long").alias("n_rounds_lag1"),
        F.col("n7").cast("long").alias("n_rounds_lag7"),
        F.col("ae1").cast("long").alias("abs_err_lag1"),
        F.col("bias1").cast("long").alias("bias_lag1"),
        F.col("ae7").cast("long").alias("abs_err_lag7"),
        F.col("bias7").cast("long").alias("bias_lag7"),
        (F.col("ae1").cast("double") / F.col("y1").cast("double")).alias(
            "wape_lag1"
        ),
        (F.col("ae7").cast("double") / F.col("y7").cast("double")).alias(
            "wape_lag7"
        ),
    )


@register("streaming_cusum_monitor")  # rows-only check
def streaming_cusum_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third custom stateful operator: per-metric streaming CUSUM
    drift monitor over the staged deterministic micro-batch replay —
    S = max(0, S + (value_cents − k)) carried across batches in exact
    integer state, alarms at S > h the moment a batch closes
    (streaming/stateful.py:cusum_with_state). The batch twin
    cusum_changepoint proves the closed form against a DuckDB oracle;
    this operator is the unbounded-stream form, cross-checked against
    that closed form and for replay determinism in
    tests/test_streaming_cusum.py."""
    from clean_census_acs_data_spark.streaming.stateful import (
        cusum_events_availablenow,
    )

    return cusum_events_availablenow(spark, sf_dir)
