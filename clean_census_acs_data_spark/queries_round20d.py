"""Round-20 tier D (driver round 12, batch 3): the ordered-alternative
companion of the Friedman blocks and an exact outlier scan — two
oracle-backed entries, each pinned by a brute-force property test and
sealed bit-exact at sf0.001/0.01/0.1.

- ``page_trend_test`` — Page's L over the SAME ranked (day × type)
  blocks as friedman_balanced_blocks (the CTEs are shared verbatim):
  where Friedman asks "does ANY type out-rank the others", Page asks
  "do the within-day ranks increase along a FIXED treatment order"
  (lexicographic type order here) — the blocked-design sibling of
  jonckheere_terpstra_trend. L = Σ_j j·R_j; with doubled midranks
  L·2, μ·4 = nk(k+1)² and Var·144 = nk²(k+1)²(k−1) are exact int64.
- ``grubbs_outlier_scan`` — Grubbs' max-studentized-deviation
  statistic per nation over customer balances, n²-cleared: with
  dev_i = n·x_i − S, G² = (n−1)·dev*²/Σdev_i² exactly; the wide
  squares ride the DECIMAL(38,0)/HUGEINT device and the emitted
  g2_micro = 10⁶·(n−1)·dev*² DIV Σdev² is an exact BIGINT (the
  chi_squared_cells discipline — no float cast of any wide value).
  The single-point outlier audit that mad_robust_outliers' bulk
  flagging does not give: WHICH point, and how extreme exactly.

Determinism discipline per the package standard. Reference tie: none
(SURVEY.md §2D engine-extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clean_census_acs_data_spark.io import register_views
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_round20c import _BLOCK_RANK_CTES


def _page_sql() -> str:
    """ONE shared text over the shared block-rank CTEs. The treatment
    order is the lexicographic type order (ROW_NUMBER over ty) — a
    FIXED hypothesis, as Page requires; j and the moments use only
    n and k, so everything but z is exact int64."""
    return f"""
WITH {_BLOCK_RANK_CTES},
torder AS (
  SELECT ty, CAST(ROW_NUMBER() OVER (ORDER BY ty) AS BIGINT) AS j
  FROM types
),
rj AS (
  SELECT r.ty, CAST(SUM(r.dr) AS BIGINT) AS rd
  FROM r GROUP BY r.ty
),
dims AS (
  SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT ty) AS BIGINT) AS k
  FROM r
),
lsum AS (
  SELECT CAST(SUM(t.j * rj.rd) AS BIGINT) AS l_dbl
  FROM rj JOIN torder t ON t.ty = rj.ty
)
SELECT rj.ty AS event_type, t.j AS treatment_order, rj.rd AS rank_sum_dbl,
       d.n AS n_blocks, d.k AS k_treatments, l.l_dbl,
       CAST(d.n * d.k * (d.k + 1) * (d.k + 1) AS BIGINT) AS mu_x4,
       CAST(d.n * d.k * d.k * (d.k + 1) * (d.k + 1) * (d.k - 1) AS BIGINT)
         AS var_x144,
       CAST(3 * (2 * l.l_dbl - d.n * d.k * (d.k + 1) * (d.k + 1)) AS DOUBLE)
         / sqrt(CAST(d.n * d.k * d.k * (d.k + 1) * (d.k + 1) * (d.k - 1)
                     AS DOUBLE)) AS z_score
FROM rj JOIN torder t ON t.ty = rj.ty, dims d, lsum l
"""


@register("page_trend_test", oracle=_page_sql())
def page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's trend test over the balanced (day × event type) block
    design — the ordered-alternative companion of
    friedman_balanced_blocks, riding its EXACT ranked-block CTEs
    (shared verbatim, one plan profile): do the within-day ranks
    increase monotonically along the fixed lexicographic type order?
    Friedman spends its power on ANY departure; when the hypothesis
    is an ordering, Page's L = Σ_j j·R_j is the right statistic —
    the blocked-design sibling of jonckheere_terpstra_trend (which
    handles independent groups). With doubled midranks, L·2 is an
    exact int64 rank-weighted sum; E[L]·4 = nk(k+1)² and
    Var[L]·144 = nk²(k+1)²(k−1) are closed-form integers; z =
    3·(2L₂ − μ₄)/√Var₁₄₄ is the single float tail (no-ties variance,
    documented; the ranks themselves are tie-exact midranks).

    100-TB shape: identical to friedman_balanced_blocks — map-side
    partial counts, one (day, type) shuffle, day-partitioned ranking
    windows, then tiny-aggregate broadcast crosses. Scale bound:
    l_dbl ≤ 2nk·k(k+1) and var_x144 ~ nk⁴ ⟹ int64 to n ≈ 10¹⁴/k⁴
    blocks — far past any real design; no wide types needed."""
    register_views(spark, sf_dir)
    return spark.sql(_page_sql())


# ---------------------------------------------------------------------------
# Grubbs' outlier statistic, n²-cleared with the wide-integer device
# ---------------------------------------------------------------------------


def _grubbs_sql(wide: str, intdiv: str) -> str:
    """dev_i = n·x_i − S fits int64 (n·|x| ≤ ~10¹² at sealed scales);
    dev² and Σdev² take the wide type; the emitted statistic is the
    exact integral division 10⁶·(n−1)·dev*² DIV Σdev² — a BIGINT
    (G² ≤ n−1 ⟹ g2_micro ≤ 10⁶·n), so no float cast of any wide
    value exists (the chi_squared_cells discipline)."""
    return f"""
WITH base AS (
  SELECT c_nationkey AS nk, c_custkey AS ck,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
m AS (
  SELECT nk, ck, cents,
         CAST(COUNT(*) OVER (PARTITION BY nk) AS BIGINT) AS n,
         CAST(SUM(cents) OVER (PARTITION BY nk) AS BIGINT) AS s
  FROM base
),
d AS (
  SELECT nk, ck, n,
         CAST(n * cents - s AS BIGINT) AS dev,
         ROW_NUMBER() OVER (PARTITION BY nk
                            ORDER BY ABS(n * cents - s) DESC, ck) AS rn
  FROM m
),
ss AS (
  SELECT nk, SUM(CAST(dev AS {wide}) * dev) AS sum_dev2
  FROM d GROUP BY nk
)
SELECT d.nk AS nation_key, d.n AS n_cust, d.ck AS outlier_custkey,
       d.dev AS dev_n_cleared,
       CAST((CAST(d.n - 1 AS {wide}) * d.dev * d.dev * 1000000)
            {intdiv} ss.sum_dev2 AS BIGINT) AS g2_micro,
       sqrt(CAST((CAST(d.n - 1 AS {wide}) * d.dev * d.dev * 1000000)
                 {intdiv} ss.sum_dev2 AS BIGINT) / 1000000.0) AS g_stat
FROM d JOIN ss ON ss.nk = d.nk
WHERE d.rn = 1 AND ss.sum_dev2 > 0
"""


@register("grubbs_outlier_scan", oracle=_grubbs_sql("HUGEINT", "//"))
def grubbs_outlier_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' (maximum studentized deviation) outlier statistic per
    nation over customer account balances: WHICH single point is most
    extreme, and exactly how extreme — the pointwise audit that
    mad_robust_outliers' bulk flagging does not give (MAD flags a SET
    robustly; Grubbs scores THE candidate against the normal-theory
    yardstick G = |x* − x̄|/s). The rational mean and variance are
    cleared by the n² identity: with dev_i = n·x_i − S,
    G² = (n−1)·dev*² / Σ dev_i² EXACTLY (x̄ = S/n and s² =
    Σdev²/(n²(n−1)) — the n² cancels). dev fits int64; the squares
    ride the DECIMAL(38,0)/HUGEINT wide device (spearman_rho_decimal)
    and the emitted g2_micro = 10⁶·(n−1)·dev*² DIV Σdev² is an exact
    integral division of wides into BIGINT — no float cast of any
    wide value anywhere (the chi_squared_cells discipline). The
    argmax is total-ordered by (|dev| DESC, custkey); g_stat =
    √(g2_micro/10⁶) is the single float tail.

    100-TB shape: two windows and one aggregate, all partitioned by
    the 25-value nation key — one shuffle profile; the argmax is a
    per-group top-1 (window group limit at this shape). Skew = the
    heaviest nation, same bound as any per-group window. Scale bound:
    dev ≤ 2n·max|x| ⟹ int64 to n·|x| ≈ 4×10¹⁸ per group;
    Σdev² ≤ 4n³·max|x|² stays inside the 38-digit wide to
    n ≈ 2×10⁸ per group at 10⁶-cent balances."""
    register_views(spark, sf_dir)
    return spark.sql(_grubbs_sql("DECIMAL(38,0)", "DIV"))
