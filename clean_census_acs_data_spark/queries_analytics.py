"""Advanced-analytics tier: offset/distribution window functions,
exact moments (variance/stddev) from integer sums, arg-min/max and
conditional aggregates, ordered string aggregation, extended date
arithmetic, exact interpolated percentiles.

Determinism notes per query; the recurring trick is the one from
queries.py — do all accumulation in exact integer/decimal space and
spend at most one double division/sqrt at the very end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.functions import cents
from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# offset windows: lag / lead / first_value / last_value
# ---------------------------------------------------------------------------


@register(
    "window_offsets",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey)  OVER w AS prev_order,
           LEAD(o_orderkey) OVER w AS next_order,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order,
           CAST(date_diff('day',
                CAST(LAG(o_orderdate) OVER w AS DATE),
                CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset window pack (lag/lead/first/last + day gap to previous
    order). Total ordering via the unique orderkey tiebreak makes every
    offset deterministic. One shuffle on the partition key; offsets are
    O(1) per row within the sorted frame."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# distribution windows: ntile / percent_rank / cume_dist
# ---------------------------------------------------------------------------


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey,
           NTILE(4)       OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window pack. percent_rank/cume_dist are single
    double divisions over exact integer ranks/counts → bit-portable;
    ntile is pure integer. Unique tiebreak (custkey) keeps rank
    assignment total."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# ---------------------------------------------------------------------------
# exact moments: variance / stddev from integer power sums
# ---------------------------------------------------------------------------


@register(
    "stats_moments",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS s1,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                 * CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS s2
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           n,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)                      AS mean_cents,
           CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE)    AS var_pop,
           SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE)) AS std_pop
    FROM s
    """,
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance/stddev computed from exact integer power
    sums (n, Σx, Σx²) instead of the engines' streaming Welford
    aggregates (whose intermediate rounding is engine-specific and NOT
    bit-portable). n·s2 − s1² stays in 128-bit exact space (decimal in
    Spark, hugeint in DuckDB); one double division + one sqrt at the
    end. Same single-shuffle partial-agg shape as any groupBy."""
    o = _t(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    dec = "decimal(38,0)"
    s = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c.cast(dec)).alias("s1"),
        F.sum((c * c).cast(dec)).alias("s2"),
    )
    num = (F.col("n").cast(dec) * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    den = (F.col("n") * F.col("n")).cast("double")
    return s.select(
        "o_orderpriority",
        "n",
        (F.col("s1").cast("double") / F.col("n").cast("double")).alias("mean_cents"),
        (num / den).alias("var_pop"),
        F.sqrt(num / den).alias("std_pop"),
    )


# ---------------------------------------------------------------------------
# arg-max / conditional / boolean aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_argmax_conditional",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
             AS biggest_order,
           arg_min(o_orderkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
             AS smallest_order,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           bool_and(o_totalprice > 0)                  AS all_positive,
           bool_or(o_orderstatus = 'P')                AS any_pending
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_argmax_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (arg-max), filtered count, and boolean aggregates.
    The arg-max comparand is made *unique* (cents·10^7 + orderkey) —
    plain max_by on a tied value is free to return either row on
    either engine, so determinism requires a total comparand. All are
    partial-aggregable: one shuffle of |groups| rows."""
    o = _t(spark, sf_dir, "orders")
    comparand = cents("o_totalprice") * F.lit(10_000_000) + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", comparand).alias("biggest_order"),
        F.min_by("o_orderkey", comparand).alias("smallest_order"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.some(F.col("o_orderstatus") == "P").alias("any_pending"),
    )


# ---------------------------------------------------------------------------
# ordered string aggregation
# ---------------------------------------------------------------------------


@register(
    "string_agg_sorted",
    oracle="""
    SELECT n_name,
           string_agg(c_name, ',' ORDER BY c_name) AS customer_csv,
           COUNT(*) AS n_sampled
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey % 199 = 0
    GROUP BY n_name
    """,
)
def string_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string_agg: collect_list is unordered in a distributed
    engine (assembly order = task completion order), so determinism
    requires an explicit array_sort before joining. The sampled filter
    bounds the aggregated string; at scale an unbounded string agg is
    an anti-pattern (collect the top-k instead)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 199 == 0)
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("customer_csv"),
            F.count(F.lit(1)).alias("n_sampled"),
        )
    )


# ---------------------------------------------------------------------------
# extended date arithmetic
# ---------------------------------------------------------------------------


@register(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + 90 AS TIMESTAMP)   AS due_ts,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end_ts,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER)
                                                               AS days_to_1999,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INTEGER) AS dow_sunday0,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_week,
           CAST(make_date(2000, CAST(MONTH(o_orderdate) AS INTEGER), 1) AS TIMESTAMP)
                                                               AS anchor_month_ts
    FROM orders WHERE o_orderkey % 37 = 0
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date pack: day offsets, month boundaries, day-of-week
    (normalized to Sunday=0 on both engines — Spark's dayofweek is
    1-based, DuckDB's is 0-based), ISO week, date construction. Date
    results are surfaced as timestamps on both sides: DuckDB's
    pandas bridge is inconsistent about DATE (object vs datetime64
    per function), so the comparable type is TIMESTAMP. All codegen'd
    integer calendar math."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 37 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 90).cast("timestamp").alias("due_ts"),
        F.last_day(d).cast("timestamp").alias("month_end_ts"),
        F.datediff(F.lit("1999-01-01").cast("date"), d).alias("days_to_1999"),
        (F.dayofweek(d) - 1).alias("dow_sunday0"),
        F.weekofyear(d).alias("iso_week"),
        F.make_date(F.lit(2000), F.month(d), F.lit(1))
        .cast("timestamp")
        .alias("anchor_month_ts"),
    )


# ---------------------------------------------------------------------------
# range-frame window: trailing 7-day sum
# ---------------------------------------------------------------------------


@register(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_7d_cents
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per customer, the sum of order value in the
    trailing 7 days *by event time* (not row count) — rowsBetween can't
    express this; rangeBetween over epoch seconds can, identically in
    both engines. Rows sharing a timestamp share a frame, so no
    tiebreak is needed for determinism (the frame is value-defined)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604_800, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(cents("o_totalprice")).over(w).alias("trailing_7d_cents"),
    )


# ---------------------------------------------------------------------------
# fixed-bucket histogram
# ---------------------------------------------------------------------------


@register(
    "histogram_prices",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 50000) * 50000 AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY floor(o_totalprice / 50000)
    """,
)
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as groupBy(floor(x/width)) — the
    distribution-profiling op. Bucketing is a pure projection, so the
    aggregate is the standard partial→shuffle-of-|buckets|→final shape;
    at any scale the shuffle carries one row per bucket per task."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000)
    return o.groupBy(bucket.alias("bucket")).agg(
        (F.col("bucket") * 50000).cast("double").alias("bucket_lo"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# time-series: hourly resample + gap fill + forward fill
# ---------------------------------------------------------------------------


@register(
    "gap_fill_forward",
    oracle="""
    WITH ev AS (SELECT * FROM events WHERE user_id < 5),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents,
             COUNT(*) AS n_events
      FROM ev GROUP BY user_id, date_trunc('hour', ts)
    ),
    spine_hours AS (
      SELECT unnest(generate_series(
        (SELECT date_trunc('hour', MIN(ts)) FROM ev),
        (SELECT date_trunc('hour', MAX(ts)) FROM ev),
        INTERVAL 1 HOUR)) AS h
    ),
    spine AS (
      SELECT u.user_id, s.h
      FROM (SELECT DISTINCT user_id FROM ev) u, spine_hours s
    )
    SELECT spine.user_id, spine.h,
           COALESCE(hourly.n_events, 0) AS n_events,
           last_value(hourly.cents IGNORE NULLS) OVER (
             PARTITION BY spine.user_id ORDER BY spine.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_cents
    FROM spine LEFT JOIN hourly
      ON spine.user_id = hourly.user_id AND spine.h = hourly.h
    """,
)
def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample: bucket events hourly, build the dense
    user×hour spine (sequence + explode — the hypertable-rollup shape),
    left-join observations, forward-fill gaps with
    last(ignorenulls) over an ordered frame. The spine cross join is
    |users|·|hours| rows *by definition of the output* — at scale the
    spine generates per-partition (explode of a per-user sequence),
    never a shuffled cartesian; the only shuffle is the final window by
    user."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 5)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(cents("value")).alias("cents"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    # per-user spine: explode a per-row sequence — a Generate, not a
    # shuffled cartesian (each user row expands locally)
    users = ev.select("user_id").distinct()
    spine = (
        users.join(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            "h",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("cents", ignorenulls=True).over(w).alias("filled_cents"),
        )
    )


# ---------------------------------------------------------------------------
# data profiling: one pass over all columns
# ---------------------------------------------------------------------------


@register(
    "profile_columns",
    oracle="""
    SELECT 'l_quantity' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_quantity) AS n_null,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           MIN(l_quantity) AS min_val, MAX(l_quantity) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount), MIN(l_discount), MAX(l_discount)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
           COUNT(DISTINCT l_tax), MIN(l_tax), MAX(l_tax)
    FROM lineitem
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null rate, cardinality, range) for a
    training-data quality report — in ONE scan: unpivot the measured
    columns to (column_name, value) rows via a single Expand, then one
    grouped aggregate. The oracle's UNION ALL form scans the table once
    per column; at 100 TB that difference is the whole game. (For
    approximate profiling at extreme cardinality swap count_distinct
    for approx_count_distinct — see approx_distinct_sketch.)"""
    li = _t(spark, sf_dir, "lineitem").select("l_quantity", "l_discount", "l_tax")
    tall = li.unpivot(
        ids=[],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="column_name",
        valueColumnName="value",
    )
    return tall.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("value")).alias("n_null"),
        F.countDistinct("value").alias("n_distinct"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
    )


# ---------------------------------------------------------------------------
# SQL interface: one query text, two engines
# ---------------------------------------------------------------------------

_SQL_BOTH_ENGINES = """
WITH rev AS (
  SELECT n_name,
         CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS revenue_cents
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, YEAR(o_orderdate)
)
SELECT n_name, order_year, revenue_cents, rnk FROM (
  SELECT n_name, order_year, revenue_cents,
         RANK() OVER (PARTITION BY order_year
                      ORDER BY revenue_cents DESC, n_name) AS rnk
  FROM rev
)
WHERE rnk <= 3
"""


@register("sql_interface_rank", oracle=_SQL_BOTH_ENGINES)
def sql_interface_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: the *identical ANSI SQL text* (CTE + 4-way
    join + agg + window rank) runs via spark.sql() on registered views
    and via DuckDB as its own oracle — proving dialect-portable SQL
    parity, not just DataFrame parity. Catalyst plans it exactly like
    the DataFrame form (broadcast dims, partial agg, single window
    shuffle)."""
    from clean_census_acs_data_spark.io import load_table

    # register only the four views the statement reads — registering the
    # whole catalog re-reads six unrelated parquet footers per call
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_BOTH_ENGINES)


# ---------------------------------------------------------------------------
# exact interpolated percentiles
# ---------------------------------------------------------------------------


@register(
    "percentile_exact",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.25) AS p25_cents,
           quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.50) AS p50_cents,
           quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.75) AS p75_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles over integer cents. Both
    engines use rank = p·(n−1) with linear interpolation between exact
    integers — the interpolation is one double multiply-add on
    identical operands, so results are bit-identical. The exact
    percentile requires a per-group sort (vs percentile_approx's
    mergeable sketch, see approx_distinct_sketch, which is the 100-TB
    path)."""
    o = _t(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    # one array-percentile aggregate = one per-group value buffer, not
    # three (same fix as percentile_cont_interp)
    return (
        o.groupBy("o_orderpriority")
        .agg(F.percentile(c, F.lit([0.25, 0.50, 0.75])).alias("ps"))
        .select(
            "o_orderpriority",
            F.col("ps")[0].alias("p25_cents"),
            F.col("ps")[1].alias("p50_cents"),
            F.col("ps")[2].alias("p75_cents"),
        )
    )


# ---------------------------------------------------------------------------
# exact-moment correlation / covariance
# ---------------------------------------------------------------------------


@register(
    "stats_corr_covar",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS sx,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy,
             SUM(CAST(l_quantity AS BIGINT)
                 * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sxy,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sx2,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * n AS DOUBLE) AS covar_pop,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sx2 - sx * sx AS DOUBLE))
                * SQRT(CAST(n * sy2 - sy * sy AS DOUBLE))) AS corr
    FROM s
    """,
)
def stats_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation and population covariance from exact integer
    power sums (n, Σx, Σy, Σxy, Σx², Σy²) — the same no-Welford
    discipline as stats_moments, extended to the cross moment. The
    squares exceed int64 at scale, so accumulation runs in
    decimal(38,0) / HUGEINT; two sqrts and one division at the end,
    identical association both engines. Single partial-agg shuffle of
    six integers per group at any data size."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    x = F.col("l_quantity").cast("long")
    y = cents("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((x * y).cast(dec)).alias("sxy"),
        F.sum((x * x).cast(dec)).alias("sx2"),
        F.sum((y * y).cast(dec)).alias("sy2"),
    )
    n_d = F.col("n").cast(dec)
    cov_num = (n_d * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = (n_d * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double")
    vary = (n_d * F.col("sy2") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        "l_returnflag",
        "n",
        (cov_num / (F.col("n") * F.col("n")).cast("double")).alias("covar_pop"),
        (cov_num / (F.sqrt(varx) * F.sqrt(vary))).alias("corr"),
    )


# ---------------------------------------------------------------------------
# per-group mode with deterministic tiebreak
# ---------------------------------------------------------------------------


@register(
    "mode_per_group",
    oracle="""
    SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM (
      SELECT l_returnflag, l_quantity, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_quantity) AS rn
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ) WHERE rn = 1
    """,
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a total tiebreak (smallest value
    wins on count ties) — engines' built-in mode() breaks ties
    arbitrarily, so it can never be cross-engine deterministic; this
    count→row_number form is. Two shuffles: (group, value) partial-agg
    counts, then a WindowGroupLimit keyed on the group keeps one row
    per group — state O(1), skew-immune at any cardinality."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"), "cnt")
    )


# ---------------------------------------------------------------------------
# recursive CTE: hierarchy walk (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

_RECURSIVE_HIERARCHY = """
WITH RECURSIVE chain AS (
  SELECT c_custkey, c_custkey AS root, 0 AS depth
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, chain.root, chain.depth + 1
  FROM customer c
  JOIN chain ON CAST(FLOOR(c.c_custkey / 10) AS BIGINT) = chain.c_custkey
  WHERE c.c_custkey >= 10
)
SELECT c_custkey, root, CAST(depth AS BIGINT) AS depth FROM chain
"""


@register("recursive_hierarchy_walk", oracle=_RECURSIVE_HIERARCHY)
def recursive_hierarchy_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE hierarchy flattening (org-chart / BOM walk): every
    customer resolved to its root and depth in the derived decimal-tree
    hierarchy (parent = custkey/10). The IDENTICAL SQL text runs on
    Spark 4's WITH RECURSIVE and as the DuckDB oracle. Each recursion
    level is one equi-join of the frontier against the child scan —
    the frontier shrinks geometrically, and depth is bounded by
    log₁₀(max key), so the unrolled plan stays shallow at any scale."""
    from clean_census_acs_data_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_HIERARCHY)
