"""Round-19 tier, fourth batch: two-sample survival comparison
(log-rank) and ordered-dose trend (Cochran–Armitage).

- ``logrank_test``            — completes the survival family
  (kaplan_meier_survival estimates each curve, nelson_aalen_hazard the
  cumulative hazard; log-rank asks whether TWO cohorts' curves
  differ). Per pooled time bucket the O−E and hypergeometric-variance
  terms are exact micro-quantized rationals (the variance numerator in
  DECIMAL(38,0)/HUGEINT); z is one float tail over the integer sums.
- ``cochran_armitage_trend``  — dose-response trend across the ORDERED
  order-priority levels (1-URGENT … 5-LOW) against the finished-status
  response, per market segment: the test McNemar/χ² can't do because
  they ignore the ordering. T and Var(T) are exact micro-quantized
  rationals (wide-type numerators).

Determinism discipline per the package standard. Reference tie: none
(SURVEY.md §2D engine-extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table, register_views
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# log-rank test between two behavioral cohorts' time-to-purchase curves
# ---------------------------------------------------------------------------

_LR_STUDY_END = "2024-07-01 00:00:00"  # same censoring point as KM


def _logrank_sql(epoch_fn: str, wide: str, intdiv: str) -> str:
    # Cohort = whether the user's FIRST event (total (us, event_id)
    # order) is a click. Same risk-set construction as the KM entry
    # (hour buckets, reverse cumulative at-risk), but per group.
    # Per bucket with pooled deaths d, group-A deaths d_a, at-risk
    # n_a/n_b (n = n_a + n_b):
    #   O−E  = d_a − d·n_a/n       → oe_micro = 1e6·(d_a·n − d·n_a) DIV n
    #   Var  = d·n_a·n_b·(n−d) / (n²·(n−1))
    #        → v_micro = 1e6·d·n_a·n_b·(n−d) DIV (n·n·(n−1)), in the
    #          wide type (numerator ≤ 1e6·n⁴ — int64 wraps at n ≈ 9k
    #          subjects, real cohorts exceed that).
    return f"""
WITH first_ev AS (
  SELECT user_id,
         MIN({epoch_fn}(ts)) AS first_us,
         MIN(CASE WHEN event_type = 'purchase' THEN {epoch_fn}(ts) END)
           AS conv_us
  FROM events GROUP BY user_id
),
first_type AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY {epoch_fn}(ts), event_id) AS rn
  FROM events
),
u AS (
  SELECT f.user_id,
         CASE WHEN ft.event_type = 'click' THEN 1 ELSE 0 END AS grp_a,
         CASE WHEN f.conv_us IS NOT NULL THEN 1 ELSE 0 END AS event,
         (COALESCE(f.conv_us, {epoch_fn}(TIMESTAMP '{_LR_STUDY_END}'))
          - f.first_us) {intdiv} 3600000000 AS t_hours
  FROM first_ev f
  JOIN first_type ft ON f.user_id = ft.user_id AND ft.rn = 1
),
agg AS (
  SELECT t_hours,
         CAST(SUM(CASE WHEN grp_a = 1 THEN event ELSE 0 END) AS BIGINT)
           AS d_a,
         CAST(SUM(CASE WHEN grp_a = 0 THEN event ELSE 0 END) AS BIGINT)
           AS d_b,
         CAST(SUM(grp_a) AS BIGINT) AS subj_a,
         CAST(SUM(1 - grp_a) AS BIGINT) AS subj_b
  FROM u GROUP BY t_hours
),
risk AS (
  SELECT t_hours, d_a, d_b,
         CAST(SUM(subj_a) OVER (ORDER BY t_hours DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_a,
         CAST(SUM(subj_b) OVER (ORDER BY t_hours DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_b
  FROM agg
),
terms AS (
  SELECT t_hours, d_a, d_b, n_a, n_b,
         CAST((1000000 * (d_a * (n_a + n_b) - (d_a + d_b) * n_a))
              {intdiv} (n_a + n_b) AS BIGINT) AS oe_micro,
         CASE WHEN n_a + n_b > 1 THEN
           CAST((CAST(1000000 AS {wide}) * (d_a + d_b) * n_a * n_b
                 * (n_a + n_b - d_a - d_b))
                {intdiv} (CAST(n_a + n_b AS {wide}) * (n_a + n_b)
                          * (n_a + n_b - 1)) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS v_micro
  FROM risk WHERE d_a + d_b > 0
)
SELECT t_hours, d_a, d_b, n_a, n_b, oe_micro, v_micro,
       CAST(SUM(oe_micro) OVER () AS BIGINT) AS oe_total_micro,
       CAST(SUM(v_micro) OVER () AS BIGINT) AS v_total_micro,
       CASE WHEN SUM(v_micro) OVER () > 0 THEN
         CAST(SUM(oe_micro) OVER () AS DOUBLE)
         / sqrt(CAST(SUM(v_micro) OVER () AS DOUBLE) * 1000000.0)
       ELSE NULL END AS z_score
FROM terms
"""


@register("logrank_test", oracle=_logrank_sql("epoch_us", "HUGEINT", "//"))
def logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel–Cox) test: do users whose FIRST event is a
    click convert to purchase on a different survival curve than users
    who start any other way? Completes the survival family —
    kaplan_meier_survival draws each curve, nelson_aalen_hazard the
    hazard; log-rank is the hypothesis test between cohorts, the
    standard A/B answer when the outcome is time-to-event with
    censoring (same study-end censoring as KM). Per pooled hour bucket
    the O−E term and the hypergeometric variance are exact
    micro-quantized rationals — the variance numerator
    10⁶·d·n_a·n_b·(n−d) runs in DECIMAL(38,0) (HUGEINT oracle) because
    int64 wraps at only ≈9k at-risk subjects; the bucket terms sum as
    integers (order-free) and z = ΣOE/√(ΣV·10⁶) is the single float
    tail.

    100-TB shape: one shuffle to per-user extrema + first-type (two
    windows on user_id), one to the hour grid; the reverse-cumulative
    risk windows run on the ≤study-span grid exactly like KM.
    Scale bound: oe numerator ≤ 10⁶·n² (int64 to n ≈ 3×10⁶ subjects);
    v numerator ≤ 10⁶·n⁴ (38-digit wide type to n ≈ 10⁸)."""
    register_views(spark, sf_dir)
    return spark.sql(_logrank_sql("unix_micros", "DECIMAL(38,0)", "DIV"))


# ---------------------------------------------------------------------------
# Cochran–Armitage trend test across ordered dose levels
# ---------------------------------------------------------------------------


def _ca_sql(wide: str, intdiv: str) -> str:
    # Doses w = the priority's leading digit (1..5); response = F
    # status. T = Σ w·d − D·(Σ w·m)/n with d = per-dose responders,
    # m = per-dose totals, D/n the pooled rate:
    #   t_micro = 1e6·(n·Σwd − D·Σwm) DIV n
    #   Var(T)  = D(n−D)/n³ · (n·Σw²m − (Σwm)²)
    #   v_micro = 1e6·D·(n−D)·(n·Σw²m − (Σwm)²) DIV (n·n·n)  [wide]
    return f"""
WITH o AS (
  SELECT c.c_mktsegment AS segment,
         CAST(SUBSTRING(o.o_orderpriority, 1, 1) AS BIGINT) AS w,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS resp
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
dose AS (
  SELECT segment, w,
         CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(resp) AS BIGINT) AS d
  FROM o GROUP BY segment, w
),
agg AS (
  SELECT segment,
         CAST(SUM(m) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS dd,
         CAST(SUM(w * d) AS BIGINT) AS swd,
         CAST(SUM(w * m) AS BIGINT) AS swm,
         CAST(SUM(w * w * m) AS BIGINT) AS sw2m
  FROM dose GROUP BY segment
)
SELECT segment, n, dd AS responders, swd, swm, sw2m,
       CAST((1000000 * (n * swd - dd * swm)) {intdiv} n AS BIGINT)
         AS t_micro,
       CAST((CAST(1000000 AS {wide}) * dd * (n - dd)
             * (n * sw2m - swm * swm))
            {intdiv} (CAST(n AS {wide}) * n * n) AS BIGINT) AS v_micro,
       CASE WHEN dd > 0 AND dd < n AND n * sw2m > swm * swm THEN
         CAST((1000000 * (n * swd - dd * swm)) {intdiv} n AS DOUBLE)
         / sqrt(CAST((CAST(1000000 AS {wide}) * dd * (n - dd)
                      * (n * sw2m - swm * swm))
                     {intdiv} (CAST(n AS {wide}) * n * n) AS DOUBLE)
                * 1000000.0)
       ELSE NULL END AS z_score
FROM agg
"""


@register("cochran_armitage_trend", oracle=_ca_sql("HUGEINT", "//"))
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test per market segment: does the
    finished-status rate trend MONOTONICALLY across the ordered
    order-priority levels (1-URGENT … 5-LOW, scored by the leading
    digit)? The test χ²/McNemar cannot express — they treat the levels
    as unordered — and the standard dose-response audit (e.g. does
    document-quality band predict dedup survival). T = Σw·d − D·Σw·m/n
    and Var(T) = D(n−D)(n·Σw²m − (Σwm)²)/n³ are exact micro-quantized
    rationals; the variance numerator runs in DECIMAL(38,0)/HUGEINT
    (≤ 10⁶·25·n³ wraps int64 at n ≈ 7×10³ rows per segment — every
    sealed scale exceeds that); z is the single float tail over the
    two exact integers.

    100-TB shape: one fact⋈dim join, one partial agg to the ≤5-dose
    frame per segment, a segment-row aggregate — no window. Scale
    bound: the wide numerator ≤ 2.5×10⁷·n³ stays inside 38 digits to
    n ≈ 3×10¹⁰ rows per segment."""
    register_views(spark, sf_dir)
    return spark.sql(_ca_sql("DECIMAL(38,0)", "DIV"))
