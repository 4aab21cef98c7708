"""Window-aggregate, as-of/range-join, grouping-sets, median and
sketch queries. Registered into the shared QUERIES/ORACLES registry.

The tumbling/sliding/session batch queries define the event-time window
semantics with DuckDB oracles (time_bucket / gaps-and-islands); the
``streaming_*`` entries run the SAME aggregations through Structured
Streaming (watermark + AvailableNow) and are rows-only checks — append
mode withholds windows the final watermark hasn't passed, which no
batch SQL mirrors exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.functions import cents
from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.operators.asof import asof_join, range_count_join
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.streaming import windows as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# event-time windows (batch semantics, oracle-checked)
# ---------------------------------------------------------------------------


@register(
    "tumbling_window_agg",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts)                   AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type. Epoch-aligned buckets on
    both engines; one shuffle after partial agg."""
    return W.tumbling_agg(_t(spark, sf_dir, "events"), "1 hour")


@register(
    "sliding_window_agg",
    oracle="""
    WITH w AS (
      SELECT e.*, time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes'
               AS window_start
      FROM events e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    )
    SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM w
    GROUP BY 1, 2
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min: each event lands in exactly
    window/slide = 4 windows (Spark's Expand). Event amplification is
    the scale cost — slide ratio is the knob."""
    return W.sliding_agg(_t(spark, sf_dir, "events"), "1 hour", "15 minutes")


@register(
    "session_window_agg",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           MIN(ts)                      AS session_start,
           MAX(ts) + INTERVAL 6 HOUR    AS session_end,
           COUNT(*)                     AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM s
    GROUP BY user_id, sid
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour-gap session windows per user (session end = last event +
    gap). The oracle derives identical sessions with gaps-and-islands
    SQL. Spark's session_window shuffles once on user_id then merges
    sorted runs — O(1) state per open session."""
    return W.session_agg(_t(spark, sf_dir, "events"), "6 hours")


# ---------------------------------------------------------------------------
# as-of + range joins
# ---------------------------------------------------------------------------


@register(
    "asof_join_last_click",
    oracle="""
    WITH pur AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    cl AS (SELECT user_id, ts, MIN(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, p.ts,
           c.ts       AS asof_ts,
           c.click_id AS asof_click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM pur p
    ASOF LEFT JOIN cl c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gains the user's most recent click at
    or before it. Spark has no native ASOF — implemented as
    union→sort→last-carry-forward (operators/asof.py): one shuffle, no
    range explosion, works at any scale. Clicks pre-deduped per
    (user, ts) so tie resolution is deterministic on both engines."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("click_id"))
    )
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts", right_payload=["click_id"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "asof_ts",
        "asof_click_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_ts"))).alias("gap_us"),
    )


@register(
    "range_join_recent_clicks",
    oracle="""
    WITH pur AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    cl AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT COUNT(*) FROM cl c
            WHERE c.user_id = p.user_id
              AND epoch_us(c.ts) > epoch_us(p.ts) - 3600000000
              AND epoch_us(c.ts) < epoch_us(p.ts)) AS n_recent_clicks
    FROM pur p
    """,
)
def range_join_recent_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: clicks in the hour before each purchase.
    Implemented as a time-bucketed equi-join (each purchase probes 2
    buckets) — never an inequality join, so the plan is
    shuffle-hash-joinable and linear at scale."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    return range_count_join(
        purchases,
        clicks,
        key="user_id",
        window_us=3_600_000_000,
        out_col="n_recent_clicks",
    )


# ---------------------------------------------------------------------------
# grouping sets + exact discrete median
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_mix",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-flag, per-
    status, and grand totals in one Expand+agg pass. gid derived from
    per-column GROUPING() so the bit order is pinned on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               COUNT(*) AS n_rows
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "exact_median_disc",
    oracle="""
    WITH c AS (
      SELECT c_nationkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents, c_custkey
      FROM customer
    ),
    r AS (
      SELECT c_nationkey, cents,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY cents, c_custkey) AS rn,
             COUNT(*)    OVER (PARTITION BY c_nationkey) AS cnt
      FROM c
    )
    SELECT c_nationkey, cents AS median_cents FROM r WHERE rn = (cnt + 1) // 2
    """,
)
def exact_median_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete (lower) median per group via row_number — the
    deterministic alternative to interpolating percentiles whose
    float arithmetic differs across engines. One shuffle + sort."""
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey", cents("c_acctbal").alias("cents"), "c_custkey"
    )
    w = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
    wc = Window.partitionBy("c_nationkey")
    r = c.select(
        "c_nationkey",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return r.where(F.col("rn") == F.expr("(cnt + 1) div 2")).select(
        "c_nationkey", F.col("cents").alias("median_cents")
    )


# ---------------------------------------------------------------------------
# approximate sketches (rows-only: HLL/KLL internals differ per engine,
# so no value-hash oracle exists by construction)
# ---------------------------------------------------------------------------


@register("approx_distinct_sketch")  # rows-only check
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) and percentile_approx
    (KLL-ish quantile sketch) per order priority. Sketches are the
    100-TB answer when exact distinct is too expensive; their values
    are engine-specific, hence no DuckDB oracle (driver rows-only)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.percentile_approx("o_totalprice", 0.5).alias("approx_median_price"),
    )


# ---------------------------------------------------------------------------
# structured streaming (rows-only: append-mode watermark semantics)
# ---------------------------------------------------------------------------


@register("streaming_tumbling_watermark")  # rows-only check
def streaming_tumbling_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows + 10-min watermark executed by the streaming
    engine (readStream → state store → append-mode memory sink,
    Trigger.AvailableNow). Emits only watermark-passed windows."""
    return W.streaming_tumbling(spark, sf_dir)


@register("streaming_session_window")  # rows-only check
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (merging session state) + watermark, streaming."""
    return W.streaming_session(spark, sf_dir)


@register("streaming_dedup_watermark")  # rows-only check
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark — bounded-state streaming dedup."""
    return W.streaming_dedup_within_watermark(spark, sf_dir)


@register("streaming_interval_join")  # rows-only check
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (views ⋈ same-user clicks within 30
    minutes) with watermarked, evictable state on both sides — the
    canonical unbounded-join shape. Batch-verifiable: the inner-join
    result equals the static join (streaming only changes *when* rows
    emit, not which rows, for an inner join whose inputs are fully
    replayed), checked in tests/test_streaming.py."""
    return W.streaming_interval_join(spark, sf_dir)


@register("streaming_stateful_sessions")  # rows-only check
def streaming_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: applyInPandasWithState sessionizer
    (user-defined state struct + event-time timeouts), replayed over
    deterministic time-ordered micro-batches. The general form of
    custom streaming state that built-in session_window can't express
    (streaming/stateful.py)."""
    from clean_census_acs_data_spark.streaming.stateful import (
        sessionize_events_availablenow,
    )

    return sessionize_events_availablenow(spark, sf_dir)


@register("streaming_replay_source")  # rows-only check
def streaming_replay_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python streaming DataSource path: the documents table replayed
    as micro-batches through the simpleStreamReader replay source
    (checkpointable row offsets, exactly-once readBetweenOffsets
    recovery), aggregated per source as it streams. Proves the custom-
    source API end to end; per-batch correctness and offset semantics
    in tests/test_replay_stream.py."""
    import uuid

    from pyspark.sql import functions as F

    from clean_census_acs_data_spark.sources.replay_stream import (
        register_replay_source,
    )

    register_replay_source(spark)
    # Size batches off the parquet footer so the run is always ~3
    # micro-batches at ANY scale factor: per-micro-batch engine
    # overhead (~2 s each) dominated the wall clock with a fixed
    # batch_rows (5 batches at sf0.1), while sf0.01 degenerated to a
    # single batch and never exercised the multi-batch path.
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    stream = (
        spark.readStream.format("parquet_replay")
        .option("path", f"{sf_dir}/documents.parquet")
        .option("batch_rows", max(1, -(-n_rows // 3)))
        .load()
    )
    agg = stream.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)
