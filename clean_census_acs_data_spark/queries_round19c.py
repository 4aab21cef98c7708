"""Round-19 tier, third batch: the rest of the nonparametric-test
family — paired (Wilcoxon signed-rank), change-point (Pettitt), and
paired-binary (McNemar).

With mann_whitney_u (unpaired location), kolmogorov_smirnov_2sample
(shape), spearman/kendall (association), and these three, the registry
covers the standard nonparametric battery a data-quality/experiment
pipeline runs — every statistic an exact integer with a single
shared-form float tail.

- ``wilcoxon_signed_rank``  — paired test on each customer's FIRST vs
  LAST order value per nation; |d| ranks ride the integer double-rank
  device, so 2·W⁺ and the tie correction Σ(t³−t) are exact int64.
- ``pettitt_change_point``  — nonparametric change-point per user over
  the purchase sequence: U_t = Σ_{i≤t} dr_i − t·(n+1) via the mid-rank
  identity (ties included — the pairwise sgn double-sum collapses to a
  running rank sum, antisymmetry cancels the within-prefix part), K =
  max|U_t| by integer selection. The rank-based complement of
  cusum_changepoint's mean-shift form.
- ``mcnemar_paired_flags``  — paired dichotomous test per market
  segment: urgent-priority vs finished-status flags on the same order;
  χ² = (b−c)²/(b+c) as exact micro-quantized rationals.

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
# Wilcoxon signed-rank (paired), tie-exact integer core — ONE shared text
# ---------------------------------------------------------------------------

_WILCOXON_SQL = """
WITH o AS (
  SELECT o_custkey AS cust,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC)
           AS rn_d,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n_ord
  FROM orders
),
pair AS (
  SELECT f.cust,
         l.cents - f.cents AS d
  FROM (SELECT cust, cents FROM o WHERE rn_a = 1 AND n_ord >= 2) f
  JOIN (SELECT cust, cents FROM o WHERE rn_d = 1) l ON f.cust = l.cust
  WHERE l.cents - f.cents <> 0
),
nk AS (
  SELECT p.cust, c.c_nationkey AS nkey, p.d, ABS(p.d) AS ad
  FROM pair p JOIN customer c ON p.cust = c.c_custkey
),
r AS (
  SELECT nkey, d,
         CAST(2 * RANK() OVER (PARTITION BY nkey ORDER BY ad)
              + COUNT(*) OVER (PARTITION BY nkey, ad) - 1 AS BIGINT) AS dr,
         ad
  FROM nk
),
t AS (
  SELECT nkey, ad, CAST(COUNT(*) AS BIGINT) AS tie FROM r GROUP BY nkey, ad
),
ties AS (
  SELECT nkey, CAST(SUM(tie * tie * tie - tie) AS BIGINT) AS tie_cubes
  FROM t GROUP BY nkey
),
agg AS (
  SELECT nkey,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN d > 0 THEN dr ELSE 0 END) AS BIGINT)
           AS w_plus_dbl
  FROM r GROUP BY nkey
)
SELECT nat.n_name AS nation_name,
       a.n_pairs, a.w_plus_dbl, ti.tie_cubes,
       CASE WHEN a.n_pairs > 1 THEN
         (CAST(a.w_plus_dbl AS DOUBLE) / 2
          - CAST(a.n_pairs * (a.n_pairs + 1) AS DOUBLE) / 4)
         / sqrt(CAST(a.n_pairs * (a.n_pairs + 1) * (2 * a.n_pairs + 1)
                     AS DOUBLE) / 24
                - CAST(ti.tie_cubes AS DOUBLE) / 48)
       ELSE NULL END AS z_score
FROM agg a
JOIN ties ti ON a.nkey = ti.nkey
JOIN nation nat ON a.nkey = nat.n_nationkey
"""


@register("wilcoxon_signed_rank", oracle=_WILCOXON_SQL)
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test per nation on the PAIRED differences
    between each customer's first and last order value (customers with
    ≥2 orders; zero differences dropped per the standard procedure) —
    the paired complement of mann_whitney_u: did repeat customers'
    order values shift, using each customer as their own control?
    |d| ranks are tie-averaged and kept exact as integer double-ranks,
    so 2·W⁺ (w_plus_dbl) and the tie correction Σ(t³−t) are exact
    int64; the z statistic (normal approximation, tie-corrected
    variance n(n+1)(2n+1)/24 − Σ(t³−t)/48) is the single shared-text
    float tail. ONE dialect-shared SQL text runs verbatim on both
    engines.

    100-TB shape: two per-customer windows ride one shuffle, a
    dimension join, one ranking window on the 25-value nation key, a
    25-row agg — the spearman/MWU profile. Scale bound: w_plus_dbl ≤
    2n² (int64 to n ≈ 2×10⁹ pairs per nation); Σ(t³−t) ≤ n³ (int64 to
    n ≈ 2×10⁶ — past that, the DECIMAL(38,0) switch per
    spearman_rho_decimal)."""
    register_views(spark, sf_dir)
    return spark.sql(_WILCOXON_SQL)


# ---------------------------------------------------------------------------
# Pettitt change-point (rank-based), exact integer statistic
# ---------------------------------------------------------------------------

# U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j). The mid-rank identity makes it
# a running rank sum: Σ_{j≠i} sgn(x_i − x_j) = 2·r̄_i − n − 1 (ties
# included — mid-rank r̄ = #less + (c+1)/2 makes the tie terms cancel),
# and the within-prefix part of the double sum vanishes by
# antisymmetry, so U_t = Σ_{i≤t} (2r̄_i − n − 1) = S_dbl_t − t·(n+1)
# with S_dbl_t the running sum of integer double-ranks. K = max|U_t|
# over t = 1..n−1 is pure integer selection (earliest t on ties).

def _pettitt_sql(epoch_fn: str) -> str:
    return f"""
WITH p AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         {epoch_fn}(ts) AS us
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, event_id, us,
         CAST(2 * RANK() OVER (PARTITION BY user_id ORDER BY cents)
              + COUNT(*) OVER (PARTITION BY user_id, cents) - 1
              AS BIGINT) AS dr,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS t,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM p
),
u AS (
  SELECT user_id, event_id, us, t, n,
         CAST(SUM(dr) OVER (PARTITION BY user_id ORDER BY t
                            ROWS UNBOUNDED PRECEDING)
              - t * (n + 1) AS BIGINT) AS u_t
  FROM r
),
k AS (
  SELECT user_id, t, us, u_t, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ABS(u_t) DESC, t) AS pick
  FROM u WHERE t < n
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_points,
       CAST(ABS(u_t) AS BIGINT) AS k_stat,
       CAST(t AS BIGINT) AS change_after_t,
       CAST(us AS BIGINT) AS change_after_us
FROM k WHERE pick = 1
"""


@register("pettitt_change_point", oracle=_pettitt_sql("epoch_us"))
def pettitt_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt's nonparametric change-point test per user over the
    purchase-value sequence: K = max_t |U_t| with U_t the
    Mann-Whitney-style prefix/suffix rank statistic — WHERE did this
    user's spending distribution shift, with no distributional
    assumption? The rank-based complement of cusum_changepoint (mean
    shifts in cents) and streaming_cusum_monitor (online form); Pettitt
    is what a drift monitor runs when magnitudes are heavy-tailed.

    The pairwise double sum collapses exactly to a running sum of
    tie-averaged integer double-ranks (mid-rank identity; see the
    module comment for the two-line proof), so U_t, K, and the argmax
    location are all int64 selection — users needing only ≥1 point,
    location tiebreak = earliest t. ONE dialect-shared SQL text.

    100-TB shape: two windows on the user key (value ranks, time
    order) share one shuffle; the argmax is a per-user row_number pick.
    Scale bound: |U_t| < n² per user — int64 to n ≈ 3×10⁹ points per
    user."""
    register_views(spark, sf_dir)
    return spark.sql(_pettitt_sql("unix_micros"))


# ---------------------------------------------------------------------------
# McNemar's test on paired binary flags, exact micro-quantized rational
# ---------------------------------------------------------------------------

def _mcnemar_sql(intdiv: str) -> str:
    # (b−c)²·10⁶ fits int64 to b+c ≈ 3×10⁶ discordant pairs — and the
    # guard below documents the switch; no wide type needed at any
    # sealed scale, so the text stays dialect-shared except the DIV
    # spelling.
    return f"""
WITH o AS (
  SELECT c.c_mktsegment AS segment,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS x,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (
  SELECT segment,
         CAST(SUM(x * (1 - y)) AS BIGINT) AS b,
         CAST(SUM((1 - x) * y) AS BIGINT) AS c,
         CAST(SUM(x * y) AS BIGINT) AS both_pos,
         CAST(SUM((1 - x) * (1 - y)) AS BIGINT) AS both_neg
  FROM o GROUP BY segment
)
SELECT segment, b, c, both_pos, both_neg,
       CASE WHEN b + c > 0
            THEN CAST(((b - c) * (b - c) * 1000000) {intdiv} (b + c)
                      AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS chi2_micro,
       CASE WHEN b + c > 0
            THEN CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE)
            ELSE CAST(0 AS DOUBLE) END AS chi2
FROM cells
"""


@register("mcnemar_paired_flags", oracle=_mcnemar_sql("//"))
def mcnemar_paired_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test per market segment on two binary flags measured
    on the SAME order (urgent/high priority vs finished status): is
    the disagreement between the flags symmetric? Only the discordant
    cells matter — χ² = (b−c)²/(b+c) — which is exactly why it is the
    right test for paired labels (e.g. two quality classifiers scored
    on the same documents: b = only-A-fires, c = only-B-fires). Kept
    exact as the micro-quantized rational (b−c)²·10⁶ DIV (b+c); the
    continuity-corrected and exact-binomial variants differ only in
    this tail and share the same four integer cells, all emitted.

    100-TB shape: one fact⋈dim join, one partial-agg scan to the
    |segments|-row cell frame — no window at all. Scale bound:
    (b−c)²·10⁶ wraps int64 at |b−c| ≈ 3×10⁶ discordant orders per
    segment; past that, drop the ×10⁶ pre-scale or switch the product
    to DECIMAL(38,0)/HUGEINT (documented, not silent)."""
    register_views(spark, sf_dir)
    return spark.sql(_mcnemar_sql("DIV"))
