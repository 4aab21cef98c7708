"""Round-2 catalog growth: TPC-H planner patterns the engine hadn't
exercised yet (EXISTS semi with a non-equi residual, disjunctive
pushdown, HAVING join-back, scalar-subquery + anti-join), and
training-pipeline analytics (per-label embedding centroids, batch
sessionization with an oracle, funnel conversion, retention cohorts).

Same determinism discipline as queries.py: exact integer aggregation,
single post-agg divisions, total orderings, identical aliases both
sides."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.functions import cents
from clean_census_acs_data_spark.queries import _t, register

# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi join with a non-equi residual condition
# ---------------------------------------------------------------------------


@register(
    "tpch_q4_late_shipped",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_late_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_late_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS → left-semi join on the order key with a
    non-equi residual (shipdate > orderdate + 90d). The semi join keeps
    the probe side at one output row per order regardless of lineitem
    fan-out — no dedup needed. Date filter prunes orders at the scan;
    the semi join shuffles only (orderkey, orderdate) + lineitem's
    (orderkey, shipdate): narrow columns at any scale."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: 4-way join + agg + top-k
# ---------------------------------------------------------------------------


@register(
    "tpch_q10_returned_topk",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_cents DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-item revenue per customer, top 20. Returnflag
    + date filters reach both scans; nation broadcasts; customer joins
    after the lineitem-orders join has already shrunk the fact side;
    final top-k is a TakeOrderedAndProject heap (k rows per partition),
    never a global sort."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: conditional aggregate ratio (promo revenue share)
# ---------------------------------------------------------------------------


@register(
    "tpch_q14_promo_share",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN p_type = 'PROMO'
               THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS promo_cents,
      CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS BIGINT) AS total_cents,
      100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                       ELSE 0 END) AS DOUBLE)
            / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                   AS DOUBLE) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share over one month. Part broadcasts
    (dim-sized); both conditional and total sums are exact integer
    cents aggregated in one pass; the share is a single post-agg
    double division — bit-deterministic."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    agg = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
                "promo_cents"
            ),
            F.sum(rev).alias("total_cents"),
        )
    )
    return agg.select(
        "promo_cents",
        "total_cents",
        (
            100.0
            * F.col("promo_cents").cast("double")
            / F.col("total_cents").cast("double")
        ).alias("promo_share_pct"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 flavor: supplier variety per brand/type with exclusion
# ---------------------------------------------------------------------------


@register(
    "supplier_variety",
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
    GROUP BY p_brand, p_type
    """,
)
def supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 flavor (no partsupp table in this universe): distinct
    suppliers serving each (brand, type), excluding one brand. The
    exclusion predicate pushes into the broadcast dim before the join;
    COUNT(DISTINCT) expands to a two-phase aggregate (distinct partial
    per partition, then merge) — no row explosion crosses the wire."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#13")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("n_suppliers"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: HAVING on a grouped fact, joined back to dimensions
# ---------------------------------------------------------------------------


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, big.sum_qty
    FROM (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) >= 140
    ) big
    JOIN orders   ON big.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: aggregate the fact first (sum qty per order, partial
    agg shrinks it to |orders| before any join), filter with HAVING,
    then join the small surviving set back to orders/customer. Doing
    the joins first would shuffle the full lineitem — aggregate-then-
    join is the scale-correct order, and AQE converts the join-back to
    broadcast once the HAVING filter leaves few rows."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") >= 140)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "sum_qty")
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive (OR-of-ANDs) predicate across join sides
# ---------------------------------------------------------------------------


@register(
    "tpch_q19_disjunctive",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 5 AND 25
           AND l_quantity BETWEEN 20 AND 40)
       OR (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 40
           AND l_quantity BETWEEN 1 AND 15)
    """,
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs spanning both join sides. Catalyst derives
    pushable per-side residuals from the disjunction (the l_quantity
    range union reaches the lineitem scan, the brand/size union reaches
    the part scan) while the full predicate evaluates post-join —
    free scan pruning even for disjunctions."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(20, 40)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(1, 40)
            & F.col("l_quantity").between(1, 15)
        )
    )
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(F.sum(rev).alias("revenue_cents"), F.count(F.lit(1)).alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: scalar subquery threshold + anti join
# ---------------------------------------------------------------------------


@register(
    "tpch_q22_idle_customers",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS total_acctbal_cents
    FROM customer
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > (
            SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE)
            FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers above the average positive balance with no
    orders, per nation. The average is a 1-row scalar subquery
    (broadcast), the no-orders check a left-anti join on the order key;
    balances compare in exact integer cents against a deterministic
    single-division double threshold."""
    c = _t(spark, sf_dir, "customer").withColumn("bal_cents", cents("c_acctbal"))
    avg_pos = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum("bal_cents").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_cents")
        )
    )
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_pos))
        .where(F.col("bal_cents") > F.col("avg_cents"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("bal_cents").alias("total_acctbal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# embedding centroids per label (tall form)
# ---------------------------------------------------------------------------


@register(
    "embedding_centroids",
    oracle="""
    SELECT label, pos,
           CAST(SUM(qv) AS BIGINT) AS q_sum,
           COUNT(*) AS n,
           CAST(SUM(qv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS centroid
    FROM (
      SELECT label,
             generate_subscripts(embedding, 1) AS pos,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS qv
      FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, tall form
    (label, dimension position, centroid component). The IVF training
    step as a pure DataFrame op: posexplode → exact int64 component
    sums with map-side combine (shuffle carries |labels|·dim partial
    rows, independent of input size) → one double division. Tall output
    avoids array re-assembly order hazards in cross-engine comparison.

    Scale bound: per-cluster component sums are ≤ n_members·max|q| with |q| ≤ 1e6·max|x| ≈ 2e6, so int64 holds to ~4.6e12 vectors per cluster."""
    e = _t(spark, sf_dir, "embeddings")
    tall = e.select(
        "label",
        F.posexplode("embedding").alias("pos0", "x"),
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("x").cast("double") * 1_000_000).cast("long").alias("qv"),
    )
    return (
        tall.groupBy("label", "pos")
        .agg(
            F.sum("qv").alias("q_sum"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "label",
            "pos",
            "q_sum",
            "n",
            (F.col("q_sum").cast("double") / F.col("n").cast("double")).alias("centroid"),
        )
    )


# ---------------------------------------------------------------------------
# batch sessionization (lag + cumulative sum) — oracle-checked twin of the
# streaming stateful sessionizer
# ---------------------------------------------------------------------------

_SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, value_cents,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(value_cents) AS BIGINT) AS value_cents
FROM sess
GROUP BY user_id, session_id
"""


@register("sessionize_lag_cumsum", oracle=_SESSIONIZE_ORACLE)
def sessionize_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a gap > 30 min starts a new session; the
    session id is the running count of session starts (lag + cumulative
    sum over one window partition). The oracle-checked twin of the
    applyInPandasWithState streaming sessionizer — same session bounds,
    derivable in pure SQL. One shuffle on user_id serves both windows
    and the final group-by (same partitioning reused across stages).

    Scale bound: the only integer arithmetic is one epoch-µs
    difference per row compared to 1.8·10⁹ — int64 epoch-µs cannot
    wrap until ~year 294000 and no µs values are multiplied or
    summed across rows."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        cents("value").alias("value_cents"),
        F.when(
            F.lag("ts").over(w).isNull()
            # exact µs comparison: cast("long") truncates to whole
            # seconds and disagrees with the oracle's INTERVAL compare
            # for gaps inside (1800s, 1801s) when timestamps carry
            # sub-second parts (this data: always)
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.withColumn(
        "session_id", F.sum("new_session").over(wrun).cast("long")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value_cents").alias("value_cents"),
    )


# ---------------------------------------------------------------------------
# funnel conversion (view → click → purchase)
# ---------------------------------------------------------------------------


@register(
    "event_funnel_conversion",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS n_view,
      COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view)
        AS n_click_after_view,
      COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                       AND t_purchase > t_click) AS n_purchase_after_click
    FROM per_user
    """,
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes their first
    click precedes their first purchase. One conditional-min aggregate
    per user (single shuffle, |users| rows), then a 1-row count
    rollup — the standard product-analytics funnel without any
    self-join explosion."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    stage2 = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(stage2, 1)).alias("n_click_after_view"),
        F.count(F.when(stage3, 1)).alias("n_purchase_after_click"),
    )


# ---------------------------------------------------------------------------
# retention cohorts (weekly)
# ---------------------------------------------------------------------------


@register(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
    )
    SELECT CAST(first_day AS TIMESTAMP) AS cohort_day,
           CAST(FLOOR(date_diff('day', first_day, CAST(ts AS DATE)) / 7) AS BIGINT)
             AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY cohort_day, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen day,
    counted distinct per (cohort day, weeks since). The firsts
    aggregate shrinks to |users| before the join back (broadcast-able
    for realistic user counts vs event counts); integer day arithmetic
    only — no timezone-sensitive week truncation. Cohort day emitted
    as timestamp: Spark DATE surfaces in pandas as Python date objects
    while DuckDB DATE arrives as datetime64, so a raw date column
    would type-mismatch in the driver hash."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            F.col("first_day").cast("timestamp").alias("cohort_day"),
            F.floor(F.datediff("day", "first_day") / 7).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )


# ---------------------------------------------------------------------------
# MERGE (upsert + delete) — copy-on-write CDC apply
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_name, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
agg AS (
  SELECT o_custkey,
         CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS new_bal
  FROM orders GROUP BY o_custkey
),
changes AS (
  SELECT o_custkey AS k, new_bal AS bal_cents, FALSE AS is_delete
  FROM agg WHERE o_custkey % 3 = 0 AND o_custkey % 13 <> 0
  UNION ALL
  SELECT o_custkey + 10000000, new_bal, FALSE FROM agg WHERE o_custkey % 11 = 0
  UNION ALL
  SELECT o_custkey, new_bal, TRUE FROM agg WHERE o_custkey % 13 = 0
)
SELECT COALESCE(b.c_custkey, c.k) AS c_custkey,
       b.c_name AS c_name,
       CASE WHEN c.k IS NOT NULL THEN c.bal_cents ELSE b.bal_cents END AS bal_cents
FROM base b FULL OUTER JOIN changes c ON b.c_custkey = c.k
WHERE NOT COALESCE(c.is_delete, FALSE)
"""


@register("merge_upsert_cdc", oracle=_MERGE_ORACLE)
def merge_upsert_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE: a derived change set (updates on custkeys
    divisible by 3, inserts with shifted keys on 11, deletes on 13)
    applied to the customer base in ONE full-outer shuffle join with
    conditional column resolution — the row-level semantics behind
    Delta/Iceberg MERGE INTO. Base-only columns (c_name) pass through
    on updates and stay NULL on inserts. With the base bucketed on the
    key this is a single co-located join at any scale."""
    from clean_census_acs_data_spark.operators.merge import merge_upsert

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", cents("c_acctbal").alias("bal_cents")
    )
    agg = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.max(cents("o_totalprice")).alias("new_bal"))
    )
    upd = agg.where((F.col("o_custkey") % 3 == 0) & (F.col("o_custkey") % 13 != 0)).select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("new_bal").alias("bal_cents"),
        F.lit(False).alias("is_delete"),
    )
    ins = agg.where(F.col("o_custkey") % 11 == 0).select(
        (F.col("o_custkey") + 10_000_000).alias("c_custkey"),
        F.col("new_bal").alias("bal_cents"),
        F.lit(False).alias("is_delete"),
    )
    dels = agg.where(F.col("o_custkey") % 13 == 0).select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("new_bal").alias("bal_cents"),
        F.lit(True).alias("is_delete"),
    )
    changes = upd.unionByName(ins).unionByName(dels)
    return merge_upsert(c, changes, key="c_custkey", delete_col="is_delete")


# ---------------------------------------------------------------------------
# SCD2 history from a change log
# ---------------------------------------------------------------------------


@register(
    "scd2_user_values",
    oracle="""
    SELECT user_id,
           CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM events
    """,
)
def scd2_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: every change opens a
    validity interval closed by the next change's timestamp (LEAD over
    the key, unique event_id tiebreak); the last change stays open
    (is_current). One window shuffle — the standard warehouse
    historization pattern as a single operator."""
    from clean_census_acs_data_spark.operators.merge import scd2_from_events

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", cents("value").alias("value_cents")
    )
    return scd2_from_events(
        ev,
        key="user_id",
        ts_col="ts",
        tiebreak_col="event_id",
        value_cols=("value_cents",),
    )


# ---------------------------------------------------------------------------
# stream-static enrichment join (oracle-backed since round 7: a
# stream-static inner join over a fully-replayed stream emits exactly
# the static join — no watermark, no state, nothing time-dependent)
# ---------------------------------------------------------------------------

_STREAM_ENRICH_ORACLE = """
SELECT e.user_id, e.event_id, e.event_type, c.c_name, c.c_nationkey
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


@register("streaming_static_enrich", oracle=_STREAM_ENRICH_ORACLE)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream enriched against the
    static customer dimension. The static side is broadcast to the
    stream's tasks each micro-batch — no state store involvement at
    all (unlike stream-stream joins), which is why dimension
    enrichment should always join static, not stream, sides.
    Hash-checks against the plain SQL join: replaying the whole stream
    through the engine must reproduce the static result exactly."""
    from clean_census_acs_data_spark.streaming.windows import (
        _events_stream,
        _run_to_memory,
        _streaming_scope,
    )

    spark = _streaming_scope(spark)  # default state partitions, clone-scoped
    ev = _events_stream(spark, sf_dir).select("event_id", "user_id", "event_type")
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_nationkey"
    )
    return _run_to_memory(ev.join(F.broadcast(dim), "user_id"))


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering code
# ---------------------------------------------------------------------------


def _morton_oracle() -> str:
    from clean_census_acs_data_spark.operators.layout import morton_code_sql

    return f"""
    SELECT p_partkey,
           {morton_code_sql('p_size', 'p_partkey', bits=10)} AS zcode
    FROM part
    """


@register("zorder_morton", oracle=_morton_oracle())
def zorder_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) interleave of (p_size, p_partkey): the
    clustering key behind two-dimensional row-group skipping (sort by
    zcode at write time → range predicates on either column prune).
    Pure shift/mask integer arithmetic inside codegen; the oracle is
    the SQL-generated twin of the same bit interleave."""
    from clean_census_acs_data_spark.operators.layout import morton_code

    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        morton_code(F.col("p_size"), F.col("p_partkey"), bits=10).alias("zcode"),
    )


# ---------------------------------------------------------------------------
# exact-integer outlier detection (decimal128 arithmetic)
# ---------------------------------------------------------------------------

_OUTLIER_ORACLE = """
WITH stats AS (
  SELECT o_custkey,
         COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s1,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                  * CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s2
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders JOIN stats USING (o_custkey)
WHERE n >= 3
  AND CAST(CAST(n AS HUGEINT) * CAST(ROUND(o_totalprice * 100) AS HUGEINT)
           - CAST(s1 AS HUGEINT) AS HUGEINT)
      * CAST(CAST(n AS HUGEINT) * CAST(ROUND(o_totalprice * 100) AS HUGEINT)
           - CAST(s1 AS HUGEINT) AS HUGEINT)
      > 4 * (CAST(n AS HUGEINT) * CAST(s2 AS HUGEINT)
             - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT))
"""


@register("outlier_orders_exact", oracle=_OUTLIER_ORACLE)
def outlier_orders_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer 2-sigma outlier orders with EXACT integer
    arithmetic: |x - mean| > 2sigma rewritten as
    (n*x - S1)^2 > 4*(n*S2 - S1^2) over cents — no floating-point mean
    or stddev anywhere, so the flagged set is bit-identical in any
    engine. The squares exceed int64, so the comparison runs in
    decimal(38,0) (Spark) / HUGEINT (DuckDB): int128 exactness as an
    engine surface. One partial-agg shuffle for the moments, one join
    back (AQE broadcasts the aggregated side when small)."""
    o = _t(spark, sf_dir, "orders").withColumn("price_cents", cents("o_totalprice"))
    stats = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("price_cents").alias("s1"),
        F.sum(F.col("price_cents") * F.col("price_cents")).alias("s2"),
    )
    dec = "decimal(38,0)"
    n_d = F.col("n").cast(dec)
    x_d = F.col("price_cents").cast(dec)
    s1_d = F.col("s1").cast(dec)
    s2_d = F.col("s2").cast(dec)
    dev = n_d * x_d - s1_d
    cond = (dev * dev) > (F.lit(4).cast(dec) * (n_d * s2_d - s1_d * s1_d))
    return (
        o.join(stats, "o_custkey")
        .where((F.col("n") >= 3) & cond)
        .select("o_custkey", "o_orderkey", "price_cents")
    )


# ---------------------------------------------------------------------------
# PII redaction (training-data hygiene)
# ---------------------------------------------------------------------------

# Deliberately simple, dialect-portable patterns: both engines use the
# same RE2/ICU-compatible syntax for these (no lookaround, no \b).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


@register(
    "text_pii_redaction",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(length(regexp_replace(text, '{_EMAIL_RE}', '', 'g'))
                AS BIGINT) AS len_no_email
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: email/phone patterns replaced with typed
    placeholder tokens — the mandatory hygiene step before text enters
    a training corpus. Row-local regexp_replace (JVM, codegen, no
    shuffle); patterns restricted to the regex subset both engines
    interpret identically so the oracle is bit-exact."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    red = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        red.alias("redacted"),
        F.length(F.regexp_replace(F.col("text"), _EMAIL_RE, "")).cast("long").alias(
            "len_no_email"
        ),
    )


# ---------------------------------------------------------------------------
# per-source quality capping (corpus balancing)
# ---------------------------------------------------------------------------


@register(
    "cap_docs_per_source",
    oracle="""
    SELECT doc_id, source, quality_cents FROM (
      SELECT doc_id, source, quality_cents,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY quality_cents DESC, doc_id) AS rn
      FROM (
        SELECT doc_id, source,
               CAST(LENGTH(text) AS BIGINT) * 100
               - CAST(LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS quality_cents
        FROM documents
      )
    ) WHERE rn <= 50
    """,
)
def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus balancing: keep the top 50 documents per source by a
    deterministic integer quality score (here a length/whitespace
    proxy; production plugs in text_quality_score). Window row_number
    with a unique tiebreak; Spark turns the rn <= k filter into a
    WindowGroupLimit, so per-source state is k rows at any corpus
    size — the scale-safe way to cap dominant sources in a training
    mix."""
    d = _t(spark, sf_dir, "documents")
    quality = (
        F.length("text").cast("long") * 100
        - F.length(F.regexp_replace(F.col("text"), " ", "")).cast("long")
    )
    from pyspark.sql.window import Window as W

    scored = d.select("doc_id", "source", quality.alias("quality_cents"))
    w = W.partitionBy("source").orderBy(F.desc("quality_cents"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# forward as-of join
# ---------------------------------------------------------------------------


@register(
    "asof_join_next_click",
    oracle="""
    WITH pur AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    cl AS (SELECT user_id, ts, MIN(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, p.ts,
           c.ts       AS asof_ts,
           c.click_id AS asof_click_id
    FROM pur p
    ASOF LEFT JOIN cl c ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def asof_join_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each purchase gains the user's EARLIEST
    click at or after it (post-purchase behavior attribution). Same
    join-free union-sort-carry plan as the backward form with the
    frame flipped to first-over-following; clicks pre-deduped per
    (user, ts) so tie resolution is deterministic on both engines."""
    from clean_census_acs_data_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("click_id"))
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_id"],
        direction="forward",
    )


# ---------------------------------------------------------------------------
# data-quality constraint gates
# ---------------------------------------------------------------------------


@register(
    "dq_constraint_checks",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM (
         SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
       )) AS n_dup_orderkeys,
      (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS n_null_custkey,
      (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS n_orphan_orders,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0 OR l_discount < 0
          OR l_discount > 1) AS n_bad_lineitems
    """,
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: uniqueness, not-null, referential-integrity
    and domain-range checks as ONE single-row report (the dbt-test /
    Deequ pattern). Each check is an aggregate or anti-join that
    partial-aggregates before its shuffle; the orphan check broadcasts
    the customer key set at dim scale. Run before a merge/publish, fail
    the pipeline on non-zero counts."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    n_dup = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("n_dup_orderkeys"))
    )
    n_null = o.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_null_custkey")
    )
    n_orphan = (
        o.join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphan_orders"))
    )
    n_bad = li.agg(
        F.count(
            F.when(
                (F.col("l_quantity") <= 0)
                | (F.col("l_discount") < 0)
                | (F.col("l_discount") > 1),
                1,
            )
        ).alias("n_bad_lineitems")
    )
    return n_dup.crossJoin(n_null).crossJoin(n_orphan).crossJoin(n_bad)
