"""Round-16 tier: robust statistics, divisor apportionment, exact
survival curves, and weighted quantiles — four shapes the registry
lacked.

- ``theil_sen_slope_user``     — Theil–Sen robust slope per user over
  purchase (time, value) points: the lower median of all pairwise
  slopes. The outlier-immune complement of ols_slope_per_group's
  moment-based fit (one corrupted point moves OLS arbitrarily; it
  moves Theil–Sen by one rank).
- ``apportion_dhondt_divisor`` — D'Hondt highest-averages seat
  apportionment: top-S of the members/divisor quotient table. The
  divisor-method complement of apportion_largest_remainder's quota
  method (the two disagree on real data — that disagreement is the
  classic apportionment-paradox demo).
- ``kaplan_meier_survival``    — product-limit survival curve in EXACT
  micro-nats: log S(t) = Σ ln((n−d)/n) with every term a det_ln_ratio
  over exact integers. nelson_aalen_hazard's docstring noted a float
  KM product "could never hash-match across engines" — this entry is
  the counter-construction via the deterministic-ln infrastructure.
- ``weighted_percentile_exact`` — exact weighted p50/p90 per group via
  running weight sums over a totally-ordered sort (ceil-threshold
  selection) — integer end-to-end, the weighted complement of
  percentile_exact.

Determinism discipline per the package standard (queries.py module
docstring): integer arithmetic or det_ln micro-nats end-to-end;
doubles only as identical single divisions; orderings made total with
key tiebreaks.

Reference tie: none (SURVEY.md §2D engine-extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.functions import cents
from clean_census_acs_data_spark.functions.detmath import det_ln_ratio
from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Theil–Sen robust slope per user (lower median of pairwise slopes)
# ---------------------------------------------------------------------------

_TS_ORACLE = """
WITH p AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS x,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase'
),
sl AS (
  SELECT a.user_id,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope,
         a.event_id AS ea, b.event_id AS eb
  FROM p a JOIN p b
    ON a.user_id = b.user_id AND a.event_id < b.event_id AND a.x <> b.x
),
r AS (
  SELECT user_id, slope,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY slope, ea, eb) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_pairs
  FROM sl
)
SELECT user_id,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       slope AS theil_sen_slope
FROM r WHERE rn = (n_pairs + 1) // 2
"""


@register("theil_sen_slope_user", oracle=_TS_ORACLE)
def theil_sen_slope_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust slope of purchase value over time, per user:
    the LOWER median of all pairwise slopes (Δcents/Δµs), pairs with
    identical timestamps excluded. Each slope is one double division
    of exact integers (IEEE-deterministic); median is selection, not
    summation, so no float-accumulation order exists; rank ties break
    on the event-id pair, making row_number total.

    100-TB shape: the pair join is keyed on user_id, so the quadratic
    term is per-user-bounded (the per-entity-bounded self-join
    discipline of market_basket_lift); everything after runs on the
    pair table partitioned by the same key — one shuffle total. A user
    with millions of events would need per-user pair sampling; typical
    entity event counts keep pairs ≲ n·k².

    Scale bound: no integer products anywhere — slopes are single
    double divisions of int64 deltas (Δcents, Δµs), and epoch-µs
    deltas wrap int64 only past ~292,000 years."""
    p = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("x"),
            cents("value").alias("y"),
        )
    )
    a = p.select(
        "user_id",
        F.col("event_id").alias("ea"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = p.select(
        F.col("user_id").alias("ub"),
        F.col("event_id").alias("eb"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    sl = (
        a.join(
            b,
            (F.col("user_id") == F.col("ub"))
            & (F.col("ea") < F.col("eb"))
            & (F.col("xa") != F.col("xb")),
        )
        .select(
            "user_id",
            (
                (F.col("yb") - F.col("ya")).cast("double")
                / (F.col("xb") - F.col("xa")).cast("double")
            ).alias("slope"),
            "ea",
            "eb",
        )
    )
    w = Window.partitionBy("user_id").orderBy("slope", "ea", "eb")
    r = sl.select(
        "user_id",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_pairs"),
    )
    return r.where(
        F.col("rn") == F.expr("(n_pairs + 1) DIV 2")
    ).select(
        "user_id",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("slope").alias("theil_sen_slope"),
    )


# ---------------------------------------------------------------------------
# D'Hondt (highest-averages) apportionment
# ---------------------------------------------------------------------------

_DH_SEATS = 100

_DH_ORACLE = f"""
WITH c AS (
  SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS members
  FROM customer GROUP BY 1
),
q AS (
  SELECT nk, members, d,
         CAST(members AS DOUBLE) / CAST(d AS DOUBLE) AS quot
  FROM c, (SELECT unnest(range(1, {_DH_SEATS} + 1)) AS d)
),
r AS (
  SELECT nk, members,
         ROW_NUMBER() OVER (ORDER BY quot DESC, nk, d) AS rk
  FROM q
)
SELECT nk AS c_nationkey,
       ANY_VALUE(members) AS members,
       CAST(SUM(CASE WHEN rk <= {_DH_SEATS} THEN 1 ELSE 0 END) AS BIGINT) AS seats
FROM r GROUP BY nk
"""


@register("apportion_dhondt_divisor", oracle=_DH_ORACLE)
def apportion_dhondt_divisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Hondt highest-averages apportionment of {S} seats across
    nations by customer count: rank all members/divisor quotients
    (divisors 1..{S}), award one seat per top-{S} row. The divisor-
    method complement of apportion_largest_remainder — the two methods
    genuinely disagree (D'Hondt favors large parties), which is the
    textbook apportionment-paradox demonstration. Quotients are single
    double divisions of exact integers (bit-identical both engines);
    the ranking is made total by (quotient desc, nation, divisor), so
    equal quotients — e.g. 10/2 = 5/1 — award deterministically.

    100-TB shape: one partial-agg count to |nations| rows, then every
    downstream op runs on the |nations|·S quotient table — dimension-
    bounded, like apportion_largest_remainder's ranking. The single-
    partition window is |nations|·S rows, never fact-bounded.
    """.format(S=_DH_SEATS)
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).cast("long").alias("members"))
    )
    d = c.select(
        "nk",
        "members",
        F.explode(F.sequence(F.lit(1), F.lit(_DH_SEATS))).alias("d"),
    ).select(
        "nk",
        "members",
        "d",
        (F.col("members").cast("double") / F.col("d").cast("double")).alias("quot"),
    )
    w = Window.orderBy(F.desc("quot"), F.asc("nk"), F.asc("d"))
    r = d.withColumn("rk", F.row_number().over(w))
    return r.groupBy(F.col("nk").alias("c_nationkey")).agg(
        F.first("members").alias("members"),
        F.sum(F.when(F.col("rk") <= _DH_SEATS, 1).otherwise(0))
        .cast("long")
        .alias("seats"),
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier product-limit survival in exact micro-nats
# ---------------------------------------------------------------------------

_KM_STUDY_END = "2024-01-31 00:00:00"


def _km_oracle() -> str:
    term = det_ln_ratio("n_risk", "n_risk - d_events", div="//")
    return f"""
WITH u AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS first_us,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS conv_us
  FROM events GROUP BY user_id
),
d AS (
  SELECT CASE WHEN conv_us IS NOT NULL THEN 1 ELSE 0 END AS event,
         (COALESCE(conv_us, epoch_us(TIMESTAMP '{_KM_STUDY_END}')) - first_us)
           // 3600000000 AS t_hours
  FROM u
),
agg AS (
  SELECT t_hours,
         CAST(SUM(event) AS BIGINT) AS d_events,
         CAST(SUM(1 - event) AS BIGINT) AS c_censored
  FROM d GROUP BY t_hours
),
risk AS (
  SELECT *,
         CAST(SUM(d_events + c_censored) OVER (ORDER BY t_hours DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_risk
  FROM agg
),
terms AS (
  SELECT t_hours, n_risk, d_events, c_censored,
         CASE WHEN d_events = 0 THEN CAST(0 AS BIGINT)
              WHEN d_events < n_risk
              THEN CAST(-ROUND({term} * 1000000) AS BIGINT)
              ELSE NULL END AS term_micro_nats
  FROM risk
)
SELECT t_hours, n_risk, d_events, c_censored, term_micro_nats,
       CAST(SUM(term_micro_nats) OVER (ORDER BY t_hours
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS log_survival_micro_nats
FROM terms
"""


@register("kaplan_meier_survival", oracle=_km_oracle())
def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier product-limit survival of time-to-first-purchase,
    right-censored at the study end, in EXACT micro-nats: log S(t) =
    Σ_{{t_i ≤ t}} ln((n_i − d_i)/n_i), each term a det_ln_ratio over
    exact integers quantized to ×1e6 micro-nats, then an integer
    cumulative sum — so the product-limit curve hash-matches across
    engines, the construction nelson_aalen_hazard's docstring said a
    float product could never achieve. Same risk-set grid as
    Nelson–Aalen (reverse cumulative window over the hourly
    aggregate). A bucket where every at-risk subject dies (d = n, the
    log's pole) can only be the LAST bucket — n_risk counts all later
    buckets' subjects — and emits NULL on both engines; d = 0 buckets
    contribute an exact 0 (skipping det_ln's p = q path keeps the
    quantized term exactly zero).

    100-TB shape: one shuffle to per-user extrema, one to the hourly
    grid; windows run on the ≤study-span grid. Scale bound: each
    |term| ≤ ln(n)·1e6 < 6·10⁷ at any population; the cumsum is
    grid-bounded (≤ buckets·ln(n)·1e6) — int64 wraps only past 10¹¹
    buckets."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("first_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("conv_us"),
    )
    d = u.select(
        F.when(F.col("conv_us").isNotNull(), 1).otherwise(0).alias("event"),
        F.expr(
            f"(coalesce(conv_us, unix_micros(TIMESTAMP '{_KM_STUDY_END}'))"
            " - first_us) DIV 3600000000"
        ).alias("t_hours"),
    )
    agg = d.groupBy("t_hours").agg(
        F.sum("event").cast("long").alias("d_events"),
        F.sum(F.lit(1) - F.col("event")).cast("long").alias("c_censored"),
    )
    w_rev = Window.orderBy(F.desc("t_hours")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = agg.withColumn(
        "n_risk",
        F.sum(F.col("d_events") + F.col("c_censored")).over(w_rev).cast("long"),
    )
    term = det_ln_ratio("n_risk", "n_risk - d_events", div="DIV")
    terms = risk.withColumn(
        "term_micro_nats",
        F.expr(
            "CASE WHEN d_events = 0 THEN CAST(0 AS BIGINT)"
            " WHEN d_events < n_risk"
            f" THEN CAST(-ROUND({term} * 1000000) AS BIGINT)"
            " ELSE NULL END"
        ),
    )
    w_fwd = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return terms.select(
        F.col("t_hours").cast("long").alias("t_hours"),
        "n_risk",
        "d_events",
        "c_censored",
        "term_micro_nats",
        F.sum("term_micro_nats").over(w_fwd).cast("long").alias(
            "log_survival_micro_nats"
        ),
    )


# ---------------------------------------------------------------------------
# exact weighted percentiles per group
# ---------------------------------------------------------------------------

_WP_ORACLE = """
WITH base AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
         CAST(l_quantity AS BIGINT) AS wt,
         l_orderkey, l_linenumber
  FROM lineitem
),
c AS (
  SELECT *,
         SUM(wt) OVER (PARTITION BY l_returnflag
                       ORDER BY price_cents, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumw,
         SUM(wt) OVER (PARTITION BY l_returnflag) AS totw
  FROM base
)
SELECT l_returnflag,
       CAST(ANY_VALUE(totw) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN cumw * 100 >= totw * 50 THEN price_cents END)
            AS BIGINT) AS wp50_cents,
       CAST(MIN(CASE WHEN cumw * 100 >= totw * 90 THEN price_cents END)
            AS BIGINT) AS wp90_cents
FROM c GROUP BY l_returnflag
"""


@register("weighted_percentile_exact", oracle=_WP_ORACLE)
def weighted_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted percentiles (p50/p90 of extended price weighted
    by quantity) per return flag: sort each group totally (price, then
    the unique line key), running weight sum, and the percentile is
    the first value whose cumulative weight reaches p% of the total —
    the cumw·100 ≥ totw·p comparison is all-integer, so no float
    threshold can straddle engines. The weighted complement of
    percentile_exact (every row counts wt times without materializing
    wt copies).

    100-TB shape: one shuffle to partition groups, one in-partition
    sort (the same cost as any exact percentile); the two percentile
    picks fold into the final group agg. Skewed groups → the
    percentile-per-group pattern over range-partitioned ranks
    (stable_id_assignment's two-phase layout). Scale bound:
    cumw·100 < 2⁶³ while a group's total quantity stays below
    9.2·10¹⁶ — ~10³ × the 100-TB lineitem grain."""
    base = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        cents("l_extendedprice").alias("price_cents"),
        F.col("l_quantity").cast("long").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    w_run = Window.partitionBy("l_returnflag").orderBy(
        "price_cents", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_tot = Window.partitionBy("l_returnflag")
    c = base.select(
        "l_returnflag",
        "price_cents",
        F.sum("wt").over(w_run).alias("cumw"),
        F.sum("wt").over(w_tot).alias("totw"),
    )
    return c.groupBy("l_returnflag").agg(
        F.first("totw").cast("long").alias("total_weight"),
        F.min(
            F.when(F.col("cumw") * 100 >= F.col("totw") * 50, F.col("price_cents"))
        )
        .cast("long")
        .alias("wp50_cents"),
        F.min(
            F.when(F.col("cumw") * 100 >= F.col("totw") * 90, F.col("price_cents"))
        )
        .cast("long")
        .alias("wp90_cents"),
    )
