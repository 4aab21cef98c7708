"""Round-12 wave 8: gaps-and-islands operators — run-length encoding
of event sequences and consecutive-day activity streaks. The islands
pattern (segment a sequence wherever a change/gap occurs, then
aggregate per segment) is the workhorse behind session repair, streak
features, and sequence compression; both entries are pure
window+aggregate compositions, exact integers throughout.

- ``rle_sequence_encode``   — per-user run-length encoding of the
  event-type sequence: consecutive repeats collapse to (run_idx,
  event_type, run_len, ts span). The sequence-compression primitive
  (repeat-collapse before n-gram features; bot detection — long
  single-type runs); also exactly the encoding a columnar engine
  applies to sorted low-cardinality columns.
- ``user_activity_streaks`` — per-user consecutive-day streaks via
  the classic date − dense-day-rank trick (equal ⇒ same island):
  longest streak, current-streak length at the last active day, and
  streak count. The engagement feature every retention model wants.

Reference tie: none (SURVEY.md §2B) — windows/sequence extension tier
(complements sessionize_lag_cumsum, which islands on TIME GAPS; these
island on VALUE CHANGE and CALENDAR ADJACENCY).
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
# run-length encoding of per-user event-type sequences
# ---------------------------------------------------------------------------

_RLE_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_idx
  FROM e
)
SELECT user_id,
       CAST(run_idx AS BIGINT) AS run_idx,
       ANY_VALUE(event_type) AS event_type,
       CAST(COUNT(*) AS BIGINT) AS run_len,
       MIN(ts) AS run_start,
       MAX(ts) AS run_end
FROM runs
GROUP BY user_id, run_idx
"""


@register("rle_sequence_encode", oracle=_RLE_ORACLE)
def rle_sequence_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encode each user's event-type sequence: a change
    flag (lag ≠ current, null-safe) prefix-summed into a run index,
    then one aggregate per (user, run). run_idx starts at 1 (the first
    row always breaks against the null lag), so (user_id, run_idx) is
    a dense 1-based sequence key.

    100-TB shape: ONE hash exchange on user_id serves the lag window,
    the prefix sum (same window spec — single Window operator), and
    the final aggregate (key prefix match ⇒ exchange reuse). State per
    row is O(1); skewed users stream through the sort. The output is
    the compressed sequence — strictly smaller than the input,
    bounded by it."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    runs = e.withColumn("run_idx", F.sum("brk").over(wc))
    return runs.groupBy("user_id", F.col("run_idx").cast("long").alias("run_idx")).agg(
        F.first("event_type").alias("event_type"),
        F.count(F.lit(1)).cast("long").alias("run_len"),
        F.min("ts").alias("run_start"),
        F.max("ts").alias("run_end"),
    )


# ---------------------------------------------------------------------------
# consecutive-day activity streaks (date − day-rank islands)
# ---------------------------------------------------------------------------

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS dy FROM events
),
r AS (
  SELECT user_id, dy,
         row_number() OVER (PARTITION BY user_id ORDER BY dy) AS rn
  FROM days
),
isl AS (
  SELECT user_id, dy,
         CAST(dy AS DATE) - CAST(rn AS INTEGER) AS island
  FROM r
),
streaks AS (
  SELECT user_id, island,
         CAST(COUNT(*) AS BIGINT) AS len,
         MIN(dy) AS streak_start,
         MAX(dy) AS streak_end
  FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(SUM(len) AS BIGINT) AS active_days,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(MAX_BY(len, streak_end) AS BIGINT) AS last_streak_len,
       MAX(streak_end) AS last_active_day
FROM streaks
GROUP BY user_id
"""


@register("user_activity_streaks", oracle=_STREAK_ORACLE)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-day streaks: distinct active days ranked
    per user; day − rank is CONSTANT exactly within a run of
    consecutive days (the classic islands trick — no self-join, no
    loop), so grouping on it yields streaks. Reports streak count,
    total active days, the longest streak, and the most recent
    streak's length (max_by on streak end — the "current streak" every
    engagement model features).

    100-TB shape: distinct (user, day) partial-aggregates map-side
    (events per user-day collapse before the shuffle); the rank window
    and both aggregates share the user_id hash partitioning. Calendar
    arithmetic is exact integer day counts on both engines."""
    days = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("dy"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("dy")
    isl = days.select(
        "user_id",
        "dy",
        F.date_sub(F.col("dy").cast("date"), F.row_number().over(w)).alias(
            "island"
        ),
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("dy").alias("streak_start"),
        F.max("dy").alias("streak_end"),
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.sum("len").cast("long").alias("active_days"),
        F.max("len").cast("long").alias("longest_streak"),
        F.expr("max_by(len, streak_end)").cast("long").alias("last_streak_len"),
        F.max("streak_end").alias("last_active_day"),
    )
