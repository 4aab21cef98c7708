"""Round-8 tier: time-series finance kernels and optimizer-stats
collection.

- ``ohlc_bars_hourly``      — open/high/low/close/volume bars per
  (user, hour): the finance-style windowed aggregate where open/close
  are argmin/argmax BY TIME, not value extrema.
- ``time_weighted_average`` — duration-weighted mean of a signal per
  user (each reading weighted by how long it was current): the correct
  average for irregularly-sampled state, where the plain mean
  over-weights busy periods.
- ``sliding_distinct_users`` — exact distinct users per sliding
  window (1 h window, 15 min slide): the expensive streaming statistic
  done the two-phase way (dedup to (window, user), then count).
- ``analyze_table_stats``   — ANALYZE-style per-column statistics
  (ndv, null count, min/max) in one pass: what the optimizer's CBO
  consumes; join_size_cms_estimate is its sketch-side cousin.

Reference tie: the reference implements none of this tier (SURVEY.md §2B marks the category ABSENT; its only analytics are pre-aggregated census measures, Test_census_tract.py:287-313) — these are the BASELINE.json 100-TB extension operators, built with the repo's exact-integer discipline.
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
# OHLC bars
# ---------------------------------------------------------------------------

_US_HOUR = 3_600_000_000

_OHLC_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {_US_HOUR} AS hour_bucket,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS us, event_id AS eid
  FROM events
)
SELECT user_id, CAST(hour_bucket AS BIGINT) AS hour_bucket,
       (MIN(struct_pack(us := us, eid := eid, cents := cents))).cents AS open_cents,
       CAST(MAX(cents) AS BIGINT) AS high_cents,
       CAST(MIN(cents) AS BIGINT) AS low_cents,
       (MAX(struct_pack(us := us, eid := eid, cents := cents))).cents AS close_cents,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM e GROUP BY user_id, hour_bucket
"""


@register("ohlc_bars_hourly", oracle=_OHLC_ORACLE)
def ohlc_bars_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars per (user, hour): high/low are plain extrema, but
    open/close are the values AT the earliest/latest event — the
    time-argmin/argmax aggregate finance rollups need and plain
    min/max can't express. Time ties break on event_id via lexical
    struct ordering over (µs, event_id, cents), so open/close are
    total-order deterministic.

    Implemented as min/max over (µs, event_id, value) structs in
    ONE partial-aggregated pass — struct min orders field-by-field,
    giving argmin-by-time without a window or a join-back; one shuffle
    on the (user, hour) key at any scale.

    Scale bound: no integer arithmetic on the ordering key at all (the
    earlier µs·4096 + id%4096 packing overflowed int64 at epoch-µs ≥
    2^63/4096 — May 2041); struct comparison never multiplies, so the
    plan is safe for any timestamp int64 can hold (~year 294000)."""
    cents = F.round(F.col("value") * 100).cast("long")
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_US_HOUR}").alias("hour_bucket"),
        cents.alias("cents"),
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("eid"),
    )
    return (
        e.groupBy("user_id", "hour_bucket")
        .agg(
            F.min(F.struct("us", "eid", "cents")).alias("__first"),
            F.max("cents").cast("long").alias("high_cents"),
            F.min("cents").cast("long").alias("low_cents"),
            F.max(F.struct("us", "eid", "cents")).alias("__last"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("hour_bucket").cast("long"),
            F.col("__first.cents").cast("long").alias("open_cents"),
            "high_cents",
            "low_cents",
            F.col("__last.cents").cast("long").alias("close_cents"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# streaming OHLC maintenance (complete-mode struct-min/max state)
# ---------------------------------------------------------------------------


@register("streaming_ohlc_state", oracle=_OHLC_ORACLE)
def streaming_ohlc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OHLC bar table maintained BY the streaming engine:
    complete-mode min/max aggregation where open/close are struct
    min/max over (µs, event_id, value) — argmin/argmax-by-time as
    pure semilattice state, so the replayed stream's bars are
    batch-equal and the entry hash-checks against the same oracle as
    ohlc_bars_hourly. Eighth hash-checked streaming algebra
    (count / max / OR / bottom-k / sort-limit / CMS / min / lexical
    struct-extrema): the live ticker-bar pipeline, per-key state is
    five longs forever.

    Scale bound: lexical struct ordering, no key arithmetic — same
    overflow-free rationale as ohlc_bars_hourly (the µs·4096 packing
    it replaced died at epoch-µs ≥ 2^63/4096, May 2041)."""
    import uuid

    from clean_census_acs_data_spark.streaming.windows import _streaming_scope

    # rebind: the memory-sink temp view registers on the session that
    # starts the query, so the scoped clone must be the one we read from
    spark = _streaming_scope(spark)
    ev = _events_stream_helper(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    e = ev.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_US_HOUR}").alias("hour_bucket"),
        cents.alias("cents"),
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("eid"),
    )
    agg = (
        e.groupBy("user_id", "hour_bucket")
        .agg(
            F.min(F.struct("us", "eid", "cents")).alias("__first"),
            F.max("cents").cast("long").alias("high_cents"),
            F.min("cents").cast("long").alias("low_cents"),
            F.max(F.struct("us", "eid", "cents")).alias("__last"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("hour_bucket").cast("long"),
            F.col("__first.cents").cast("long").alias("open_cents"),
            "high_cents",
            "low_cents",
            F.col("__last.cents").cast("long").alias("close_cents"),
            "n_events",
        )
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


def _events_stream_helper(spark: SparkSession, sf_dir: str):
    from clean_census_acs_data_spark.streaming.windows import _events_stream

    return _events_stream(spark, sf_dir)


# ---------------------------------------------------------------------------
# time-weighted average
# ---------------------------------------------------------------------------

_TWA_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_us
  FROM events
),
w AS (
  SELECT user_id, CAST(cents AS HUGEINT) * (next_us - us) AS num,
         next_us - us AS dur
  FROM e WHERE next_us IS NOT NULL
)
SELECT user_id,
       CAST(SUM(num) AS DOUBLE) AS weighted_sum,
       CAST(SUM(dur) AS BIGINT) AS total_dur_us,
       CAST(SUM(num) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE) AS twa_cents
FROM w GROUP BY user_id
HAVING SUM(dur) > 0
"""


@register("time_weighted_average", oracle=_TWA_ORACLE)
def time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's value signal: every
    reading is weighted by how long it stayed current (until the next
    reading). The correct mean for irregularly-sampled state — a
    plain AVG over-weights bursts; billing, utilization, and exposure
    metrics are all TWAs.

    One user-keyed window (LEAD) feeds one user-keyed agg — the same
    shuffle, no second exchange. The numerator accumulates in
    DECIMAL(38,0) (HUGEINT in the oracle); the final division is the
    only double; users whose events all share one timestamp drop out
    with the zero-duration HAVING guard in both engines.

    Scale bound: Σ cents·Δµs ≤ max|cents|·user_span_µs, and int64
    wraps already at ~$300 held for 10 years (29,224 cents × 3.2e14
    µs) — a REALISTIC book, so the sum is widened to DECIMAL(38,0) /
    HUGEINT (good to 10³⁸) and weighted_sum is emitted as the double
    of that exact integer. Cross-engine caveat (ADVICE r8): Spark's
    Decimal→double is correctly rounded, but DuckDB converts HUGEINT
    via upper/lower 64-bit limbs and can double-round, so for |wsum|
    beyond 2⁵³ the engines may differ in the last ulp — sealed
    identical at sf0.1, where sums stay inside 2⁵³·scale; if a future
    scale-up hash-mismatches on weighted_sum alone, this is why (the
    exact fix: emit wsum as DECIMAL/string instead of double). dur
    sums telescope to the span (< 2^63 µs always)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    )
    agg = (
        e.where(F.col("next_us").isNotNull())
        .select(
            "user_id",
            (
                F.col("cents").cast("decimal(38,0)")
                * (F.col("next_us") - F.col("us"))
            ).alias("num"),
            (F.col("next_us") - F.col("us")).alias("dur"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("num").alias("wsum"),
            F.sum("dur").cast("long").alias("total_dur_us"),
        )
        .where(F.col("total_dur_us") > 0)
    )
    return agg.select(
        "user_id",
        F.col("wsum").cast("double").alias("weighted_sum"),
        "total_dur_us",
        (
            F.col("wsum").cast("double")
            / F.col("total_dur_us").cast("double")
        ).alias("twa_cents"),
    )


# ---------------------------------------------------------------------------
# exact distinct users per sliding window
# ---------------------------------------------------------------------------

_SLIDE_STEP_US = 900_000_000  # 15 min
_SLIDE_PANES = 4  # 1 h window / 15 min slide

_SLIDING_DISTINCT_ORACLE = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
inst AS (
  SELECT DISTINCT (us // {_SLIDE_STEP_US} - p) * {_SLIDE_STEP_US} AS win_start_us,
         user_id
  FROM e, (SELECT unnest(range(0, {_SLIDE_PANES})) AS p)
)
SELECT CAST(win_start_us AS BIGINT) AS win_start_us,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_users
FROM inst GROUP BY win_start_us
"""


@register("sliding_distinct_users", oracle=_SLIDING_DISTINCT_ORACLE)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per sliding 1-hour window (15-minute
    slide): the expensive sliding statistic (COUNT DISTINCT is not
    pane-mergeable, unlike the sums sliding_window_agg composes from
    panes) done the scalable two-phase way — explode each event into
    its 4 covering windows, distinct-reduce to (window, user), then
    count. The shuffle carries (window, user) pairs; the 4× fan-out is
    the price of exactness (streaming_hll_registers is the sketch that
    replaces this when ±2% is acceptable).

    Window starts are integer µs arithmetic (bucket − pane offset), so
    both engines enumerate identical windows with no calendar
    functions.

    Scale bound: window indices are µs div step (≤ epoch-µs/step); re-multiplying by the step reproduces ≤ the original µs — no overflow at any event count."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    inst = e.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    (
                        (F.expr(f"us div {_SLIDE_STEP_US}") - F.lit(p))
                        * _SLIDE_STEP_US
                    ).cast("long")
                    for p in range(_SLIDE_PANES)
                ]
            )
        ).alias("win_start_us"),
    ).distinct()
    return inst.groupBy("win_start_us").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_users")
    )


# ---------------------------------------------------------------------------
# ANALYZE-style column statistics
# ---------------------------------------------------------------------------

_ANALYZE_ORACLE = """
WITH c AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS d
  FROM orders
)
SELECT 'o_orderkey' AS column_name, CAST(COUNT(DISTINCT k) AS BIGINT) AS ndv,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(MIN(k) AS BIGINT) AS min_val, CAST(MAX(k) AS BIGINT) AS max_val
FROM c
UNION ALL
SELECT 'o_custkey', CAST(COUNT(DISTINCT ck) AS BIGINT),
       CAST(SUM(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(ck) AS BIGINT), CAST(MAX(ck) AS BIGINT) FROM c
UNION ALL
SELECT 'o_totalprice_cents', CAST(COUNT(DISTINCT cents) AS BIGINT),
       CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(cents) AS BIGINT), CAST(MAX(cents) AS BIGINT) FROM c
UNION ALL
SELECT 'o_orderdate_days', CAST(COUNT(DISTINCT d) AS BIGINT),
       CAST(SUM(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(d) AS BIGINT), CAST(MAX(d) AS BIGINT) FROM c
"""


@register("analyze_table_stats", oracle=_ANALYZE_ORACLE)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS, as a query:
    per-column exact NDV, null count, and min/max over four orders
    columns (prices as cents, dates as epoch days — one integer type
    for the whole report). These are the numbers a cost-based
    optimizer joins/reorders by; the CMS/KMV/HLL entries are the
    sketch path for when exact NDV is too expensive, and
    zone_map_pruning_stats is the same min/max harvested per shard
    instead of per table.

    One scan, one multi-distinct aggregate (Spark plans it as Expand +
    two-phase partial aggs — the standard multi-count-distinct
    strategy), then a 4-row unpivot of the scalar frame."""
    c = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    )
    stats = c.agg(
        *[
            fn
            for col in ("k", "ck", "cents", "d")
            for fn in (
                F.countDistinct(col).cast("long").alias(f"ndv_{col}"),
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"nulls_{col}"),
                F.min(col).cast("long").alias(f"min_{col}"),
                F.max(col).cast("long").alias(f"max_{col}"),
            )
        ]
    )
    names = {
        "k": "o_orderkey",
        "ck": "o_custkey",
        "cents": "o_totalprice_cents",
        "d": "o_orderdate_days",
    }
    rows = F.array(
        *[
            F.struct(
                F.lit(names[col]).alias("column_name"),
                F.col(f"ndv_{col}").alias("ndv"),
                F.col(f"nulls_{col}").alias("n_nulls"),
                F.col(f"min_{col}").alias("min_val"),
                F.col(f"max_{col}").alias("max_val"),
            )
            for col in ("k", "ck", "cents", "d")
        ]
    )
    return stats.select(F.explode(rows).alias("r")).select(
        "r.column_name", "r.ndv", "r.n_nulls", "r.min_val", "r.max_val"
    )
