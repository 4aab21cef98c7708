"""Round-6 tier: incremental maintenance for similarity search.

- ``incremental_topk_maintenance`` — maintain a cosine top-k result
  under batch appends WITHOUT rescanning the corpus: the stored top-k
  of the base set merges with the top-k of the delta batch, and
  top-k(old ∪ delta-topk) ≡ top-k(whole corpus) because top-k under a
  total order is a semilattice merge (same algebra that makes
  incremental_agg_maintenance work for subtractable aggregates, here
  for rank selection). The DuckDB oracle computes the full-corpus
  top-k directly, so the hash gate PROVES the incremental merge equals
  the full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.operators import similarity as S
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import _dot, _quant_list


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)

_DELTA_FROM = 400  # vec_id >= this = the newly-appended batch

_INC_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, {_quant_list("embedding")} AS q FROM embeddings),
qq AS (SELECT q AS qv, {_dot("q", "q")} AS qn2 FROM e WHERE vec_id = 0),
sc AS (
  SELECT vec_id,
         CAST({_dot("q", "qv")} AS DOUBLE) /
         (sqrt(CAST({_dot("q", "q")} AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE))) AS cosine
  FROM e, qq WHERE vec_id <> 0
)
SELECT vec_id, cosine FROM sc ORDER BY cosine DESC, vec_id LIMIT 10
"""


@register("incremental_topk_maintenance", oracle=_INC_TOPK_ORACLE)
def incremental_topk_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors maintained incrementally: the persisted
    top-10 over the base corpus (vec_id < {_DELTA_FROM}) merges with
    the top-10 of the appended delta batch (vec_id ≥ {_DELTA_FROM}),
    and the 20-row union re-ranks to the final 10. The oracle computes
    the FULL-corpus top-10 directly — hash equality proves
    top-k(top-k(A) ∪ top-k(B)) = top-k(A ∪ B), the semilattice law
    that makes ANN serving indexes appendable.

    At 100 TB this is the difference between scoring a day's delta
    (delta-sized scan + a 2k-row merge) and rescanning the corpus per
    refresh; the interactive-session top-k literature (EDBT 2020
    incremental top-k) is built on exactly this merge. Both legs are
    the existing heap top-k operator (broadcast query vector,
    TakeOrderedAndProject); the merge is a 20-row sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0)
    base = emb.where((F.col("vec_id") != 0) & (F.col("vec_id") < _DELTA_FROM))
    delta = emb.where(F.col("vec_id") >= _DELTA_FROM)
    old_topk = S.brute_force_topk(base.unionAll(qrow), query_id=0, k=10)
    delta_topk = S.brute_force_topk(delta.unionAll(qrow), query_id=0, k=10)
    return (
        old_topk.unionAll(delta_topk)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# join-size estimation via CMS inner product
# ---------------------------------------------------------------------------

from clean_census_acs_data_spark.operators import text as X  # noqa: E402
from clean_census_acs_data_spark.queries_round4 import (  # noqa: E402
    CMS_D,
    CMS_W,
    _cms_cell,
    _cms_cell_sql,
)


def _cms_side_sql(table: str, key: str) -> str:
    return " UNION ALL ".join(
        f"SELECT {d} AS depth, {_cms_cell_sql(f'CAST({key} AS VARCHAR)', d)} AS cell "
        f"FROM {table}"
        for d in range(CMS_D)
    )


_JOINSIZE_ORACLE = f"""
WITH a AS (
  SELECT depth, cell, COUNT(*) AS cnt FROM ({_cms_side_sql("orders", "o_custkey")})
  GROUP BY depth, cell
),
b AS (
  SELECT depth, cell, COUNT(*) AS cnt FROM ({_cms_side_sql("customer", "c_custkey")})
  GROUP BY depth, cell
),
per_depth AS (
  SELECT a.depth, CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS est_d
  FROM a JOIN b ON a.depth = b.depth AND a.cell = b.cell
  GROUP BY a.depth
)
SELECT CAST(MIN(est_d) AS BIGINT) AS est_join_size,
       (SELECT COUNT(*) FROM orders JOIN customer ON o_custkey = c_custkey)
         AS exact_join_size
FROM per_depth
"""


@register("join_size_cms_estimate", oracle=_JOINSIZE_ORACLE)
def join_size_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation WITHOUT running the join: the inner
    product of the two sides' Count-Min sketches (est_d = Σ_cells
    a[d,c]·b[d,c], est = min over depths) upper-bounds
    |orders ⋈ customer| — the classic AMS/CMS estimator a cost-based
    optimizer consults before choosing join strategy. Exact join count
    alongside exposes the one-sided error.

    Each side's sketch is the 256-row mergeable state from
    token_countmin_sketch; the estimate is a 256-row join + 4-group
    agg, so deciding 'is this join explosive?' costs KB of state
    instead of the join itself — at 100 TB that is the difference
    between planning and running the accident."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("k")
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("k")
    )

    def sketch(df: DataFrame) -> DataFrame:
        cells = F.array(*[_cms_cell(F.col("k"), d) for d in range(CMS_D)])
        return (
            df.select(F.posexplode(cells).alias("depth", "cell"))
            .groupBy(F.col("depth").cast("int").alias("depth"), "cell")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    a = sketch(o).withColumnRenamed("cnt", "a_cnt")
    b = sketch(c).withColumnRenamed("cnt", "b_cnt")
    per_depth = (
        a.join(b, ["depth", "cell"])
        .groupBy("depth")
        .agg(F.sum(F.col("a_cnt") * F.col("b_cnt")).cast("long").alias("est_d"))
    )
    est = per_depth.agg(F.min("est_d").cast("long").alias("est_join_size"))
    exact = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .agg(F.count(F.lit(1)).alias("exact_join_size"))
    )
    return est.crossJoin(F.broadcast(exact))


# ---------------------------------------------------------------------------
# KMV (bottom-k) distinct-count estimator
# ---------------------------------------------------------------------------

_KMV_K = 32

from clean_census_acs_data_spark.queries_ext import H15  # noqa: E402

_KMV_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT {H15.format(x="CAST(o_custkey AS VARCHAR)")} AS h FROM orders
),
bot AS (SELECT h FROM h ORDER BY h LIMIT {_KMV_K})
SELECT CAST({_KMV_K} AS BIGINT) AS k,
       CAST(MAX(h) AS BIGINT) AS kth_hash,
       CAST({_KMV_K - 1} AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
         / CAST(MAX(h) AS DOUBLE) AS kmv_estimate,
       (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS exact_distinct
FROM bot
"""


@register("distinct_kmv_estimate", oracle=_KMV_ORACLE)
def distinct_kmv_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count estimate: keep
    the {_KMV_K} smallest distinct 60-bit hashes; est = (k−1)·2^60 /
    h_k. The third distinct-count strategy in the package — exact
    (countDistinct), HLL (hll_deterministic_estimate: fixed 64
    registers, cheapest), KMV (this: k hashes, supports set
    INTERSECTION estimates HLL cannot) — all audited against truth
    under the hash gate.

    The bottom-k state is mergeable (union = merge-sort, keep k
    smallest) and the estimate is one double division; (k−1)·2^60 is
    exact in double (5 significant bits) and long→double casts are
    IEEE round-to-nearest in both engines."""
    o = _t(spark, sf_dir, "orders")
    h = o.select(
        X.md5_long(F.col("o_custkey").cast("string")).alias("h")
    ).distinct()
    bot = h.orderBy("h").limit(_KMV_K)
    exact = o.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    return (
        bot.agg(F.max("h").alias("kth_hash"))
        .select(
            F.lit(_KMV_K).cast("long").alias("k"),
            F.col("kth_hash").cast("long").alias("kth_hash"),
            (
                F.lit(float(_KMV_K - 1))
                * F.lit(float(1 << 60))
                / F.col("kth_hash").cast("double")
            ).alias("kmv_estimate"),
        )
        .crossJoin(F.broadcast(exact))
    )


# ---------------------------------------------------------------------------
# KMV set-intersection estimate (the capability HLL lacks)
# ---------------------------------------------------------------------------

_KMV_JOINT_ORACLE = f"""
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
u AS (
  SELECT DISTINCT {H15.format(x="CAST(user_id AS VARCHAR)")} AS h, user_id
  FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)
),
bot AS (SELECT h, user_id FROM u ORDER BY h, user_id LIMIT {_KMV_K}),
flags AS (
  SELECT bot.h,
         CASE WHEN bot.user_id IN (SELECT user_id FROM a)
               AND bot.user_id IN (SELECT user_id FROM b)
              THEN 1 ELSE 0 END AS in_both
  FROM bot
)
SELECT CAST({_KMV_K} AS BIGINT) AS k,
       CAST(SUM(in_both) AS BIGINT) AS k_in_both,
       CAST(MAX(h) AS BIGINT) AS kth_hash,
       (CAST(SUM(in_both) AS DOUBLE) / CAST({_KMV_K} AS DOUBLE))
         * (CAST({_KMV_K - 1} AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
            / CAST(MAX(h) AS DOUBLE)) AS est_intersection,
       (SELECT COUNT(*) FROM a JOIN b ON a.user_id = b.user_id)
         AS exact_intersection
FROM flags
"""


@register("kmv_intersection_estimate", oracle=_KMV_JOINT_ORACLE)
def kmv_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-intersection estimate from KMV sketches — the query
    HLL registers cannot answer: |purchasers ∩ error-reporters| ≈
    (fraction of the union's bottom-k hashes belonging to both sets) ×
    KMV-estimate of |union|. The bottom-k of the union is computable
    from the two sides' bottom-k sketches alone (min-merge), so two
    32-hash sketches answer overlap questions about arbitrarily large
    sets; exact intersection rides alongside as the audit.

    Shape: two distinct-reductions (user-keyed partial aggs), a
    32-row heap (TakeOrderedAndProject), and membership flags via
    broadcast semi-join-shaped lookups — estimate cost is
    sketch-sized, the exact leg exists only because this is the audit
    twin."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    b = ev.where(F.col("event_type") == "error").select("user_id").distinct()
    u = (
        a.unionAll(b)
        .distinct()
        .select(
            X.md5_long(F.col("user_id").cast("string")).alias("h"), "user_id"
        )
    )
    bot = u.orderBy("h", "user_id").limit(_KMV_K)
    flags = (
        bot.join(
            a.select(F.col("user_id"), F.lit(1).alias("__a")), "user_id", "left"
        )
        .join(b.select(F.col("user_id"), F.lit(1).alias("__b")), "user_id", "left")
        .select(
            "h",
            F.when(
                F.col("__a").isNotNull() & F.col("__b").isNotNull(), 1
            ).otherwise(0).alias("in_both"),
        )
    )
    exact = a.join(b, "user_id").agg(
        F.count(F.lit(1)).alias("exact_intersection")
    )
    return (
        flags.agg(
            F.sum("in_both").cast("long").alias("k_in_both"),
            F.max("h").alias("kth_hash"),
        )
        .select(
            F.lit(_KMV_K).cast("long").alias("k"),
            "k_in_both",
            F.col("kth_hash").cast("long").alias("kth_hash"),
            (
                (F.col("k_in_both").cast("double") / F.lit(float(_KMV_K)))
                * (
                    F.lit(float(_KMV_K - 1))
                    * F.lit(float(1 << 60))
                    / F.col("kth_hash").cast("double")
                )
            ).alias("est_intersection"),
        )
        .crossJoin(F.broadcast(exact))
    )


# ---------------------------------------------------------------------------
# as-of linear interpolation (join-free union-sort-carry, both directions)
# ---------------------------------------------------------------------------

from pyspark.sql.window import Window  # noqa: E402

_INTERP_ORACLE = """
WITH cl AS (
  SELECT user_id, ts, arg_min(value, event_id) AS cv
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
vw AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
u AS (
  SELECT user_id, ts, CAST(NULL AS BIGINT) AS event_id, cv, 1 AS is_click FROM cl
  UNION ALL
  SELECT user_id, ts, event_id, CAST(NULL AS DOUBLE) AS cv, 0 AS is_click FROM vw
),
carried AS (
  SELECT user_id, ts, event_id, is_click,
         LAST_VALUE(CASE WHEN is_click = 1 THEN ts END IGNORE NULLS)
           OVER w_prev AS prev_ts,
         LAST_VALUE(cv IGNORE NULLS) OVER w_prev AS prev_v,
         FIRST_VALUE(CASE WHEN is_click = 1 THEN ts END IGNORE NULLS)
           OVER w_next AS next_ts,
         FIRST_VALUE(cv IGNORE NULLS) OVER w_next AS next_v
  FROM u
  WINDOW
    w_prev AS (PARTITION BY user_id
               ORDER BY ts, is_click DESC, COALESCE(event_id, -1)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY user_id
               ORDER BY ts, is_click DESC, COALESCE(event_id, -1)
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id, ts, prev_ts, next_ts,
       prev_v + (next_v - prev_v)
         * (CAST(epoch_us(ts) - epoch_us(prev_ts) AS DOUBLE)
            / CAST(epoch_us(next_ts) - epoch_us(prev_ts) AS DOUBLE)) AS v_interp
FROM carried
WHERE is_click = 0 AND prev_ts IS NOT NULL AND next_ts IS NOT NULL
"""


@register("asof_interpolate", oracle=_INTERP_ORACLE)
def asof_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation enrichment: every 'view' event gains the
    value linearly interpolated between the user's bracketing 'click'
    events — the sensor/financial resampling primitive (mark a sparse
    series onto another series' timestamps).

    Join-free, like asof_join_last_click: clicks and views union into
    one stream, ONE user-keyed sort carries the previous click
    (backward window) and next click (forward window) past every view
    — no range join, no per-pair expansion, scale-invariant. Clicks
    pre-deduped per (user, ts) by arg-min event_id so tie resolution
    is deterministic; interpolation is one pinned double expression
    over exact integer microseconds.

    Scale bound: interpolation weights are µs differences cast to double BEFORE multiplying — no integer µs products; int64 epoch-µs safe to ~year 294000."""
    ev = _t(spark, sf_dir, "events")
    cl = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min_by("value", "event_id").alias("cv"))
    )
    vw = ev.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    u = cl.select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        "cv",
        F.lit(1).alias("is_click"),
    ).unionAll(
        vw.select(
            "user_id",
            "ts",
            "event_id",
            F.lit(None).cast("double").alias("cv"),
            F.lit(0).alias("is_click"),
        )
    )
    order = [
        F.col("ts").asc(),
        F.col("is_click").desc(),
        F.coalesce("event_id", F.lit(-1)).asc(),
    ]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("is_click") == 1, F.col("ts"))
    carried = u.select(
        "user_id",
        "ts",
        "event_id",
        "is_click",
        F.last(click_ts, ignorenulls=True).over(w_prev).alias("prev_ts"),
        F.last("cv", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.first(click_ts, ignorenulls=True).over(w_next).alias("next_ts"),
        F.first("cv", ignorenulls=True).over(w_next).alias("next_v"),
    )
    frac = (
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))).cast("double")
        / (
            F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("prev_ts"))
        ).cast("double")
    )
    return (
        carried.where(
            (F.col("is_click") == 0)
            & F.col("prev_ts").isNotNull()
            & F.col("next_ts").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            "prev_ts",
            "next_ts",
            (F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac).alias(
                "v_interp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# cohort conversion with Wilson confidence bounds
# ---------------------------------------------------------------------------

_WILSON_ORACLE = """
WITH j AS (
  SELECT e.user_id, e.event_type, c.c_nationkey
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
),
agg AS (
  SELECT c_nationkey,
         COUNT(DISTINCT user_id) AS n_users,
         COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)
           AS n_conv
  FROM j GROUP BY c_nationkey
),
d AS (
  SELECT c_nationkey, n_users, n_conv,
         CAST(n_users AS DOUBLE) AS n,
         CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS p
  FROM agg
)
SELECT c_nationkey,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_conv AS BIGINT) AS n_conv,
       p AS conv_rate,
       (p + CAST(3.8416 AS DOUBLE) / (CAST(2 AS DOUBLE) * n)
        - CAST(1.96 AS DOUBLE)
          * sqrt((p * (CAST(1 AS DOUBLE) - p)
                  + CAST(3.8416 AS DOUBLE) / (CAST(4 AS DOUBLE) * n)) / n))
       / (CAST(1 AS DOUBLE) + CAST(3.8416 AS DOUBLE) / n) AS wilson_lo,
       (p + CAST(3.8416 AS DOUBLE) / (CAST(2 AS DOUBLE) * n)
        + CAST(1.96 AS DOUBLE)
          * sqrt((p * (CAST(1 AS DOUBLE) - p)
                  + CAST(3.8416 AS DOUBLE) / (CAST(4 AS DOUBLE) * n)) / n))
       / (CAST(1 AS DOUBLE) + CAST(3.8416 AS DOUBLE) / n) AS wilson_hi
FROM d
"""


@register("conversion_wilson_by_nation", oracle=_WILSON_ORACLE)
def conversion_wilson_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation user-level conversion rate (users with ≥1 purchase /
    active users) with 95% Wilson score interval — the experiment-
    readout statistic that stays sane at small n where the normal
    approximation lies. Distinct counts are exact; the Wilson algebra
    is written with IDENTICAL association on both engines (every
    constant cast, every parenthesis mirrored), so even sqrt-bearing
    doubles hash-match — the cosine-similarity discipline applied to
    inferential statistics.

    Shape: fact joins the 1500-row customer dim by broadcast, then one
    distinct-expand aggregate per nation; output is |nations|-sized."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    j = ev.join(F.broadcast(cust), "user_id")
    agg = j.groupBy("c_nationkey").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("n_conv"),
    )
    n = F.col("n_users").cast("double")
    p = F.col("n_conv").cast("double") / F.col("n_users").cast("double")
    z, z2 = F.lit(1.96), F.lit(3.8416)
    margin = z * F.sqrt(
        (p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * n)) / n
    )
    denom = F.lit(1.0) + z2 / n
    center = p + z2 / (F.lit(2.0) * n)
    return agg.select(
        "c_nationkey",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_conv").cast("long").alias("n_conv"),
        p.alias("conv_rate"),
        ((center - margin) / denom).alias("wilson_lo"),
        ((center + margin) / denom).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# skyline / Pareto front
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH o AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         epoch_us(o_orderdate) AS e
  FROM orders WHERE o_orderstatus = 'F'
),
dmin AS (SELECT e, MIN(cents) AS min_same FROM o GROUP BY e),
dm AS (
  SELECT e, min_same,
         MIN(min_same) OVER (ORDER BY e DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS min_later
  FROM dmin
)
SELECT o.o_orderkey, o.cents, CAST(o.e AS BIGINT) AS order_epoch_us
FROM o JOIN dm ON o.e = dm.e
WHERE (dm.min_later IS NULL OR dm.min_later > o.cents)
  AND o.cents = dm.min_same
"""


@register("skyline_pareto_orders", oracle=_SKYLINE_ORACLE)
def skyline_pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto front) of finished orders under (maximize
    recency, minimize price): an order survives iff no other order is
    at least as recent AND at least as cheap with one strict — the
    classic multi-criteria shortlist operator (BNL/D&C skyline papers)
    that SQL engines lack natively.

    Implemented without a self-join: sorted by order date, two window
    MINs decide dominance — min price over STRICTLY LATER dates (range
    frame, so equal dates are excluded exactly) and min price within
    the SAME date (ties: only the cheapest per date can survive). One
    sort, no O(n²) pair comparisons; at 100 TB the range frame
    partitions by coarse date bucket first and merges the per-bucket
    fronts (front size is tiny by construction).

    Note the dominance tiebreak: equal-price-equal-date orders are
    mutually non-dominating, but only one front representative per
    (date, price) cell is kept (min_same = cents admits all equal-min
    rows — duplicates of the same cell agree on both criteria, so the
    front keeps them all; determinism needs no per-key tiebreak
    because membership is a pure predicate).

    Scale bound: epoch-µs is an ordering key only (never multiplied or summed); cents are per-order values — no cross-row integer products."""
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            # o_orderdate loads as TIMESTAMP_NTZ; session TZ is pinned
            # UTC so the cast is wall-clock identity (io.py contract)
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("e"),
        )
    )
    # per-date minima first: dominance only needs, per date, the
    # cheapest price ON that date and the cheapest on any STRICTLY
    # later date. The date-minima table is |distinct dates| rows (2.4k
    # at sf0.1); its strictly-later min is a growing ROWS frame — O(n)
    # streaming, where the naive shrinking RANGE frame over the raw
    # rows re-scanned per row (measured 8.5 s -> 0.9 s) — and it
    # broadcasts back onto the fact scan.
    dmin = o.groupBy("e").agg(F.min("cents").alias("min_same"))
    w = Window.orderBy(F.desc("e")).rowsBetween(Window.unboundedPreceding, -1)
    dm = dmin.select(
        "e", "min_same", F.min("min_same").over(w).alias("min_later")
    )
    return (
        o.join(F.broadcast(dm), "e")
        .where(
            (F.col("min_later").isNull() | (F.col("min_later") > F.col("cents")))
            & (F.col("cents") == F.col("min_same"))
        )
        .select(
            "o_orderkey", "cents", F.col("e").cast("long").alias("order_epoch_us")
        )
    )


# ---------------------------------------------------------------------------
# bitmap index build (bit_or-packed posting words)
# ---------------------------------------------------------------------------

# 63-bit words: DuckDB raises on BIGINT << 63 (sign-bit overflow), so
# bit positions stay in 0..62 and every word is non-negative in both
# engines.
_BM_WORD = 63

_BITMAP_ORACLE = f"""
SELECT o_orderstatus,
       o_orderkey // {_BM_WORD} AS word_idx,
       CAST(bit_or(CAST(1 AS BIGINT) << CAST(o_orderkey % {_BM_WORD} AS INT))
            AS BIGINT) AS bitmap_word,
       CAST(bit_count(CAST(bit_or(CAST(1 AS BIGINT)
                           << CAST(o_orderkey % {_BM_WORD} AS INT)) AS BIGINT))
            AS BIGINT) AS n_set
FROM orders
GROUP BY o_orderstatus, o_orderkey // {_BM_WORD}
"""


@register("bitmap_index_status", oracle=_BITMAP_ORACLE)
def bitmap_index_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap index over the low-cardinality o_orderstatus column:
    per (status, 63-key word), the OR of key-position bits plus the
    word's popcount. The index structure low-cardinality predicates
    compile to in columnar engines — `status = 'F' AND status2 = 'O'`
    becomes word-wise AND over two bitmap columns, and COUNT(*)
    becomes Σ bit_count, never touching the fact rows.

    Built with one partial-agg shuffle (bit_or combines map-side — OR
    is commutative/associative, the textbook mergeable aggregate);
    output is |statuses| × |key-range|/63 words. At 100 TB the words
    partition by key range exactly like the fact's zone maps
    (zone_map_pruning_stats), making bitmap AND/OR pruning a manifest
    operation."""
    o = _t(spark, sf_dir, "orders")
    bit = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(o_orderkey % {_BM_WORD} AS INT))"
    )
    return (
        o.groupBy(
            "o_orderstatus",
            F.expr(f"o_orderkey div {_BM_WORD}").alias("word_idx"),
        )
        .agg(F.bit_or(bit).cast("long").alias("bitmap_word"))
        .select(
            "o_orderstatus",
            "word_idx",
            "bitmap_word",
            F.bit_count("bitmap_word").cast("long").alias("n_set"),
        )
    )


# ---------------------------------------------------------------------------
# conversion latency (first view → first purchase) with exact medians
# ---------------------------------------------------------------------------

_CONV_LATENCY_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
),
conv AS (
  SELECT u.user_id, c.c_nationkey,
         epoch_us(u.first_purchase) - epoch_us(u.first_view) AS latency_us
  FROM per_user u JOIN customer c ON u.user_id = c.c_custkey
  WHERE u.first_view IS NOT NULL AND u.first_purchase IS NOT NULL
    AND u.first_purchase >= u.first_view
),
r AS (
  SELECT c_nationkey, latency_us,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY latency_us, user_id) AS rn,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS cnt
  FROM conv
)
SELECT c_nationkey,
       CAST(MAX(cnt) AS BIGINT) AS n_converted,
       CAST(MIN(latency_us) AS BIGINT) AS min_latency_us,
       CAST(MAX(latency_us) AS BIGINT) AS max_latency_us,
       CAST(MAX(CASE WHEN rn = (cnt + 1) // 2 THEN latency_us END) AS BIGINT)
         AS median_latency_us
FROM r GROUP BY c_nationkey
"""


@register("conversion_latency_median", oracle=_CONV_LATENCY_ORACLE)
def conversion_latency_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert analytics: per user, first 'view' → first
    'purchase' latency in exact integer µs (users whose first purchase
    precedes any view are excluded — they converted through another
    door); per nation, the converted count, min/max, and exact lower
    median latency. The growth-analytics readout that pairs with
    event_funnel_conversion (how many) by answering how fast.

    Shape: one user-keyed conditional-MIN aggregate (no self-join for
    the two firsts), broadcast customer dim for the cohort key, then
    the per-group exact-median window (exact_median_disc's pattern) —
    sorts only the converted-user rows, cohort-parallel.

    Scale bound: only µs differences bounded by the data's time-span enter the arithmetic (no µs products, no cross-row sums of raw epoch-µs); int64 epoch-µs is safe to ~year 294000."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    conv = (
        per_user.where(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view"))
        )
        .join(F.broadcast(cust), "user_id")
        .select(
            "user_id",
            "c_nationkey",
            (
                F.unix_micros(F.col("first_purchase"))
                - F.unix_micros(F.col("first_view"))
            ).alias("latency_us"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy("latency_us", "user_id")
    wc = Window.partitionBy("c_nationkey")
    r = conv.select(
        "c_nationkey",
        "latency_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return r.groupBy("c_nationkey").agg(
        F.max("cnt").cast("long").alias("n_converted"),
        F.min("latency_us").cast("long").alias("min_latency_us"),
        F.max("latency_us").cast("long").alias("max_latency_us"),
        F.max(
            F.when(F.col("rn") == F.expr("(cnt + 1) div 2"), F.col("latency_us"))
        )
        .cast("long")
        .alias("median_latency_us"),
    )


# ---------------------------------------------------------------------------
# one GNN message-passing round over the near-dup graph
# ---------------------------------------------------------------------------

from clean_census_acs_data_spark.operators import dedup as D  # noqa: E402
from clean_census_acs_data_spark.queries_ext import _MINHASH_ORACLE  # noqa: E402

_GNN_DIMS = 8  # aggregate the first 8 embedding dims (keeps the oracle tractable)

_GNN_ORACLE = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE.strip()})),
und AS (
  SELECT doc_a AS v, doc_b AS w FROM pairs
  UNION ALL SELECT doc_b AS v, doc_a AS w FROM pairs
),
e AS (
  SELECT vec_id, {_quant_list("embedding")} AS q FROM embeddings
),
msg AS (
  SELECT und.v, t.k, e.q[t.k + 1] AS qk
  FROM und
  JOIN e ON und.w % 500 = e.vec_id
  CROSS JOIN range(0, {_GNN_DIMS}) t(k)
)
SELECT v AS doc_id, CAST(k AS INT) AS k,
       COUNT(*) AS degree,
       CAST(SUM(qk) AS BIGINT) AS neighbor_sum_q,
       CAST(SUM(qk) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS neighbor_mean_q
FROM msg GROUP BY v, k
"""


@register("gnn_neighbor_sum", oracle=_GNN_ORACLE)
def gnn_neighbor_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One graph-neural-network message-passing round expressed
    relationally: for every node of the near-dup graph, the sum and
    mean of its neighbors' (int64-quantized) embedding features over
    the first 8 dims — h'(v) = mean_{w∈N(v)} q_w, the aggregation half
    of a GraphSAGE/GCN layer. Neighbor ids map onto the embedding
    table mod 500 (the corpora are id-aligned at that size).

    Shape: edges join the feature table on the neighbor key (at 100 TB
    this is THE GNN-on-relational shuffle — edge-partitioned, feature
    side bucketed by vec_id), features fan out per dim via one
    Generate, and the (node, dim) partial agg carries only longs.
    Integer sums make the layer hash-checkable; the single mean
    division is post-agg. Multi-layer = iterate, exactly like
    graph_pagerank_int's unrolled rounds."""
    pairs = D.standard_near_dup_pairs(spark, sf_dir, threshold=0.5)
    und = pairs.select(
        F.col("doc_a").alias("v"), F.col("doc_b").alias("w")
    ).unionAll(pairs.select(F.col("doc_b").alias("v"), F.col("doc_a").alias("w")))
    from clean_census_acs_data_spark.operators.similarity import QUANT

    qv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * QUANT).cast("long"),
    )
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.slice(qv, 1, _GNN_DIMS).alias("q")
    )
    msg = (
        und.join(e, und["w"] % 500 == e["vec_id"])
        .select("v", F.posexplode("q").alias("k", "qk"))
    )
    return (
        msg.groupBy(F.col("v").alias("doc_id"), F.col("k").cast("int").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("degree"),
            F.sum("qk").cast("long").alias("neighbor_sum_q"),
            (F.sum("qk").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "neighbor_mean_q"
            ),
        )
    )
