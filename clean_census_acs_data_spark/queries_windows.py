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
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      -- ORDER BY (ts, event_id) mirrors the lag window above: new_s was
      -- computed in that order, so summing in any other tie order could
      -- misassign sid across tied timestamps (ADVICE r7)
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
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
    (user, ts) so tie resolution is deterministic on both engines.

    Scale bound: gap_us is a single µs difference bounded by the data's time-span; no µs products or cross-row µs sums — int64 epoch-µs is safe to ~year 294000."""
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
    shuffle-hash-joinable and linear at scale.

    Scale bound: the only integer arithmetic is epoch-µs minus the
    3.6·10⁹ µs window — int64 epoch-µs cannot wrap until ~year 294000
    and the offset cannot underflow for any post-1970-01-01T01:00
    timestamp; counts are plain int64 COUNTs."""
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
# approximate sketches — deterministic forms under the hash gate.
# Spark's native approx_count_distinct / percentile_approx internals are
# engine-specific (no cross-engine oracle exists for THEM), so this
# entry runs the same sketch ALGORITHMS in deterministic form: a
# from-scratch grouped HyperLogLog (m=64 registers, exact-integer
# harmonic sum, one final double division — the path proven by
# hll_deterministic_estimate) and a log2-bucket quantile histogram
# median. Both are mergeable-state sketches — the 100-TB answer when
# exact distinct / exact median are too expensive — now hash-checked
# instead of rows-only (VERDICT r3 ask #3).
# ---------------------------------------------------------------------------

_ADS_M = 64  # HLL registers (p = 6)
_ADS_REM = 60 - 6  # md5_long is 60 bits; 6 spent on the bucket
_ADS_ALPHA = "0.709"  # alpha_64 = 0.7213/(1 + 1.079/64), one literal both sides

_ADS_ORACLE = f"""
WITH h AS (
  SELECT o_orderpriority AS prio,
         CAST(concat('0x', substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM orders
),
reg AS (
  SELECT prio, h % {_ADS_M} AS bucket,
         MAX(CASE WHEN h // {_ADS_M} > 0
                  THEN {_ADS_REM + 1} - length(bin(h // {_ADS_M}))
                  ELSE {_ADS_REM + 1} END) AS m_j
  FROM h GROUP BY prio, h % {_ADS_M}
),
k AS (SELECT prio, MAX(m_j) AS k_max, COUNT(*) AS n_occ FROM reg GROUP BY prio),
hll AS (
  SELECT k.prio,
         CAST({_ADS_ALPHA} AS DOUBLE) * CAST({_ADS_M * _ADS_M} AS DOUBLE)
           * CAST((CAST(1 AS BIGINT) << k.k_max) AS DOUBLE)
           / CAST(SUM(CAST(1 AS BIGINT) << (k.k_max - reg.m_j))
                  + ({_ADS_M} - k.n_occ) * (CAST(1 AS BIGINT) << k.k_max) AS DOUBLE)
           AS approx_customers
  FROM reg JOIN k ON reg.prio = k.prio
  GROUP BY k.prio, k.k_max, k.n_occ
),
exact AS (
  SELECT o_orderpriority AS prio, COUNT(DISTINCT o_custkey) AS exact_customers
  FROM orders GROUP BY o_orderpriority
),
c AS (
  SELECT o_orderpriority AS prio,
         length(bin(CAST(ROUND(o_totalprice * 100) AS BIGINT))) - 1 AS bkt
  FROM orders
),
cnt AS (SELECT prio, bkt, COUNT(*) AS n FROM c GROUP BY prio, bkt),
cum AS (
  SELECT prio, bkt,
         SUM(n) OVER (PARTITION BY prio ORDER BY bkt) AS cum_n,
         SUM(n) OVER (PARTITION BY prio) AS tot_n
  FROM cnt
),
med AS (
  SELECT prio, MIN(bkt) AS med_bkt FROM cum
  WHERE cum_n >= (tot_n + 1) // 2 GROUP BY prio
)
SELECT hll.prio AS o_orderpriority,
       hll.approx_customers,
       CAST(exact.exact_customers AS BIGINT) AS exact_customers,
       CAST(CASE WHEN med.med_bkt >= 1
                 THEN 3 * (CAST(1 AS BIGINT) << (med.med_bkt - 1))
                 ELSE 1 END AS BIGINT)
         AS approx_median_cents
FROM hll JOIN exact ON hll.prio = exact.prio JOIN med ON hll.prio = med.prio
"""


@register("approx_distinct_sketch", oracle=_ADS_ORACLE)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority deterministic sketches, hash-checked: a grouped
    HyperLogLog distinct-customer estimate (md5-60-bit hash → 6-bit
    bucket + 54-bit remainder; register = max rho per (group, bucket);
    harmonic sum rescaled by 2^k_max so every term is an exact int64 and
    the only float op is one final division) and a log2-histogram
    approximate median (bucket = floor(log2(cents)); median bucket by
    cumulative count; estimate = bucket midpoint 3·2^(b-1), exact
    integer).

    Scale shape: register table is ≤ 64 rows × |groups| regardless of
    input, built with map-side partial max; histogram is ≤ ~40 buckets
    × |groups|. Merging shards = cell-wise max / bucket-wise add — both
    semilattices, so the sketch state is shard-mergeable exactly like
    production HLL/KLL. exact_customers rides along to show estimate
    quality under the same hash gate."""
    from clean_census_acs_data_spark.operators.text import md5_long

    o = _t(spark, sf_dir, "orders")
    p2 = lambda e: F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({e} AS INT))")  # noqa: E731
    h = o.select(
        F.col("o_orderpriority").alias("prio"),
        md5_long(F.col("o_custkey").cast("string")).alias("h"),
    )
    reg = (
        h.select(
            "prio",
            (F.col("h") % _ADS_M).alias("bucket"),
            F.when(
                F.expr(f"h div {_ADS_M}") > 0,
                F.lit(_ADS_REM + 1) - F.length(F.bin(F.expr(f"h div {_ADS_M}"))),
            )
            .otherwise(F.lit(_ADS_REM + 1))
            .alias("rho"),
        )
        .groupBy("prio", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    k = reg.groupBy("prio").agg(
        F.max("m_j").alias("k_max"), F.count(F.lit(1)).alias("n_occ")
    )
    hll = (
        reg.join(F.broadcast(k), "prio")
        .groupBy("prio", "k_max", "n_occ")
        .agg(F.sum(p2("k_max - m_j")).cast("long").alias("s_occ"))
        .select(
            "prio",
            (
                F.lit(float(_ADS_ALPHA))
                * F.lit(float(_ADS_M * _ADS_M))
                * p2("k_max").cast("double")
                / (
                    F.col("s_occ")
                    + (F.lit(_ADS_M) - F.col("n_occ")) * p2("k_max")
                ).cast("double")
            ).alias("approx_customers"),
        )
    )
    exact = o.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_customers")
    )
    cnt = (
        o.select(
            F.col("o_orderpriority").alias("prio"),
            (F.length(F.bin(cents("o_totalprice"))) - 1).alias("bkt"),
        )
        .groupBy("prio", "bkt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wcum = Window.partitionBy("prio").orderBy("bkt")
    wtot = Window.partitionBy("prio")
    med = (
        cnt.select(
            "prio",
            "bkt",
            F.sum("n").over(wcum).alias("cum_n"),
            F.sum("n").over(wtot).alias("tot_n"),
        )
        .where(F.col("cum_n") >= F.expr("(tot_n + 1) div 2"))
        .groupBy("prio")
        .agg(F.min("bkt").alias("med_bkt"))
        .select(
            "prio",
            # med_bkt = 0 (cents of 0/1) would shift by -1: DuckDB
            # raises, Spark's shiftleft masks to 63 and returns garbage
            # — guard identically on both sides
            F.when(F.col("med_bkt") >= 1, F.lit(3) * p2("med_bkt - 1"))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("approx_median_cents"),
        )
    )
    return (
        hll.join(F.broadcast(exact), "prio")
        .join(F.broadcast(med), "prio")
        .select(
            F.col("prio").alias("o_orderpriority"),
            "approx_customers",
            "exact_customers",
            "approx_median_cents",
        )
    )


# ---------------------------------------------------------------------------
# structured streaming. Promoted from rows-only to oracle-backed in
# round 7: for a fully-replayed single-file source under
# Trigger.AvailableNow the engine's output is a DETERMINISTIC function
# of the input — append mode emits exactly the windows/sessions whose
# end ≤ final watermark, and the final watermark is
# floor_ms(max event time) − delay (Spark tracks event-time stats in
# MILLISECONDS; pinned empirically: a window ending exactly AT the
# watermark IS emitted, and a session ending 200 µs after the
# ms-floored watermark is NOT — see the round-7 probes). The oracles
# are therefore the batch twins plus that watermark filter. Boundary
# caveat: emit-at-equality vs sub-ms ties is measure-zero on µs-noise
# event times and identical on all three test scales.
# ---------------------------------------------------------------------------

# final watermark in epoch-µs: ms-floored max event time minus 10 min
_WM_US = (
    "(SELECT (epoch_us(MAX(ts)) // 1000) * 1000 - 600000000 FROM events)"
)

_STREAM_TUMBLING_ORACLE = f"""
WITH base AS (
  SELECT time_bucket(INTERVAL '1 hour', ts)                   AS window_start,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS window_end,
         event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events
  GROUP BY 1, 2, 3
)
SELECT * FROM base WHERE epoch_us(window_end) <= {_WM_US}
"""


@register("streaming_tumbling_watermark", oracle=_STREAM_TUMBLING_ORACLE)
def streaming_tumbling_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows + 10-min watermark executed by the streaming
    engine (readStream → state store → append-mode memory sink,
    Trigger.AvailableNow). Emits only watermark-passed windows — which
    for a replayed finite input is exactly the batch aggregate
    filtered to window_end ≤ floor_ms(max ts) − 10 min, so the entry
    hash-checks against DuckDB like any batch query."""
    return W.streaming_tumbling(spark, sf_dir)


_STREAM_SESSION_ORACLE = f"""
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  -- (ts, event_id) mirrors the lag window's order so tied timestamps
  -- cannot misassign sid (ADVICE r7). The new_s boundary stays STRICT
  -- (>): Spark's session_window MERGES an event at exactly
  -- prev_ts + gap into the running session (pinned by
  -- tests/test_watermark_semantics.py::test_session_window_exact_gap_merges),
  -- so the advisor's suggested >= would desync the engines.
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
base AS (
  SELECT user_id,
         MIN(ts)                      AS session_start,
         MAX(ts) + INTERVAL 6 HOUR    AS session_end,
         COUNT(*)                     AS n_events,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM s
  GROUP BY user_id, sid
)
SELECT * FROM base WHERE epoch_us(session_end) <= {_WM_US}
"""


@register("streaming_session_window", oracle=_STREAM_SESSION_ORACLE)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (merging session state) + watermark, streaming.
    Emitted sessions = the batch gaps-and-islands sessions whose end
    (last event + gap) has been passed by the ms-floored final
    watermark — hash-checked against that closed form."""
    return W.streaming_session(spark, sf_dir)


@register("streaming_dedup_watermark")  # rows-only check
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark — bounded-state streaming dedup."""
    return W.streaming_dedup_within_watermark(spark, sf_dir)


_STREAM_IJ_ORACLE = """
WITH v AS (
  SELECT event_id AS view_id, user_id AS v_user, ts AS view_ts
  FROM events WHERE event_type = 'view'
),
c AS (
  SELECT event_id AS click_id, user_id AS c_user, ts AS click_ts
  FROM events WHERE event_type = 'click'
)
SELECT view_id, click_id, v_user AS user_id, view_ts, click_ts
FROM v JOIN c
  ON v_user = c_user
 AND click_ts >= view_ts
 AND click_ts <= view_ts + INTERVAL 30 MINUTE
"""


@register("streaming_interval_join", oracle=_STREAM_IJ_ORACLE)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (views ⋈ same-user clicks within 30
    minutes) with watermarked, evictable state on both sides — the
    canonical unbounded-join shape. Oracle-backed: an INNER join over
    fully-replayed inputs emits exactly the static join's rows
    (streaming only changes *when* rows emit, never which — no
    watermark filter needed), so the entry hash-checks against the
    plain SQL join; the single-file source replays in one micro-batch,
    so no intermediate watermark can drop late rows."""
    return W.streaming_interval_join(spark, sf_dir)


# The custom sessionizer's emission rule, as SQL: 30-min-gap sessions
# per user (gaps-and-islands); every non-trailing session emits (its
# gap was observed in-data), the trailing session emits iff its
# event-time timeout (session_end + gap, ms-floored) has been passed
# by the final watermark. Deterministic because the staged batches are
# fixed TIME splits: no batch boundary can reorder events into or out
# of a session (batch-2 timestamps all exceed batch-1's watermark by
# more than the delay), so only the FINAL watermark matters.
_STATEFUL_SESS_ORACLE = f"""
WITH e AS (
  SELECT user_id, ts, event_id, CAST(ROUND(value * 100) AS BIGINT) AS value_cents
  FROM events WHERE ts IS NOT NULL
),
o AS (
  -- (ts, event_id) tie order in BOTH windows (ADVICE r7): tied
  -- timestamps always share a session (gap 0 ≤ gap on any order), but
  -- an inconsistent SUM tie order could split the sid assignment. The
  -- boundary stays strict (>): the sessionizer breaks on
  -- np.diff(ts) > gap (streaming/stateful.py:130).
  SELECT user_id, ts, event_id, value_cents,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
g AS (
  SELECT user_id, sid,
         MIN(ts) AS session_start, MAX(ts) AS session_end,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(value_cents) AS BIGINT) AS value_cents
  FROM s GROUP BY user_id, sid
),
mx AS (SELECT user_id, MAX(sid) AS last_sid FROM g GROUP BY user_id),
wm AS (SELECT {_WM_US} AS wm_us)
SELECT g.user_id, g.session_start, g.session_end, g.n_events, g.value_cents
FROM g JOIN mx USING (user_id), wm
WHERE g.sid < mx.last_sid
   OR (epoch_us(g.session_end) // 1000) * 1000 + 1800000000 <= wm.wm_us
"""


@register("streaming_stateful_sessions", oracle=_STATEFUL_SESS_ORACLE)
def streaming_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: applyInPandasWithState sessionizer
    (user-defined state struct + event-time timeouts), replayed over
    deterministic time-ordered micro-batches. The general form of
    custom streaming state that built-in session_window can't express
    (streaming/stateful.py). Oracle-backed since round 7: the emission
    rule is a closed form over gaps-and-islands sessions (non-trailing
    sessions always emit; trailing ones emit iff the ms-floored final
    watermark passed session_end + gap), so the streamed output
    hash-checks against plain SQL — the same closed form
    tests/test_streaming.py asserts batch-by-batch."""
    from clean_census_acs_data_spark.streaming.stateful import (
        sessionize_events_availablenow,
    )

    return sessionize_events_availablenow(spark, sf_dir)


_REPLAY_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM documents GROUP BY source
"""


@register("streaming_replay_source", oracle=_REPLAY_ORACLE)  # complete mode
def streaming_replay_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python streaming DataSource path: the documents table replayed
    as micro-batches through the simpleStreamReader replay source
    (checkpointable row offsets, exactly-once readBetweenOffsets
    recovery), aggregated per source as it streams. Proves the custom-
    source API end to end; per-batch correctness and offset semantics
    in tests/test_replay_stream.py. Oracle-backed since round 7: the
    complete-mode sink after a full replay must equal the batch GROUP
    BY exactly — if the source ever dropped or duplicated a row across
    offsets, the hash would flip."""
    import uuid

    from pyspark.sql import functions as F

    from clean_census_acs_data_spark.sources.replay_stream import (
        register_replay_source,
    )
    from clean_census_acs_data_spark.streaming.windows import _streaming_scope

    # few state partitions: every micro-batch runs one task per state
    # partition, so 32 over a test-sized stream is pure scheduling
    # overhead. Scoped to a session clone (shared SparkContext,
    # independent SQLConf) so concurrent queries never observe it;
    # the Python DataSource registration is per-session, so register
    # on the clone. sp=2 (the r9 default) re-A/B'd here too: warm
    # interleaved at sf0.1, sp=2 2.96/3.02 s vs sp=8 3.19/3.56.
    spark = _streaming_scope(spark, state_partitions=2)
    register_replay_source(spark)
    # Size batches off the parquet footer so the run is always exactly
    # 2 micro-batches at ANY scale factor: per-micro-batch engine +
    # Python-datasource overhead (~2 s each) dominates wall clock, and
    # 2 is the minimum that still exercises the multi-batch offset path
    # (a fixed batch_rows gave 5 batches at sf0.1 while sf0.01
    # degenerated to a single batch). Offset/recovery depth beyond two
    # batches is covered by tests/test_replay_stream.py.
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    stream = (
        spark.readStream.format("parquet_replay")
        .option("path", f"{sf_dir}/documents.parquet")
        .option("batch_rows", max(1, -(-n_rows // 2)))
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
