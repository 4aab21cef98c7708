"""Round-20 tier C (driver round 12, batch 2): the ordered-alternative
and balanced-block completions of the nonparametric battery, plus the
split-conformal calibration primitive — three oracle-backed entries,
each pinned by a brute-force property test and sealed bit-exact at
sf0.001/0.01/0.1.

- ``jonckheere_terpstra_trend`` — the ordered-alternative k-sample
  test (is order value stochastically INCREASING in priority?): J =
  #{(a, b) : g_a < g_b, x_a < x_b} computed WITHOUT a pair join —
  sort once by value, accumulate per-group running counts with a
  strict RANGE frame, and sum each row's lower-group-lower-value
  count. Mann–Whitney answers "do these two differ"; Cochran–Armitage
  answers it for binary outcomes; this is the k-sample ordinal-dose
  version for continuous outcomes. J, μ·4 and Var·72 are exact
  int64s; z is the one float tail.
- ``friedman_balanced_blocks`` — the repeated-measures k-treatment
  rank test over the (day × event type) balanced design: does any
  event type systematically out-rank the others day after day?
  Wilcoxon signed-rank's k-treatment generalization, in Conover's
  tie-robust form T = (k−1)(ΣR_j² − n²k(k+1)²/4)/(A₂ − nk(k+1)²/4) —
  with doubled midranks both numerator and denominator are exact
  int64s and the ×4 scalings cancel.
- ``conformal_quantile_calibration`` — split-conformal prediction:
  q̂_α = the ⌈(n_cal+1)(1−α)⌉-th smallest nonconformity score on the
  deterministic calibration half (pure integer selection, the
  distribution-free coverage guarantee's exact index), then the
  realized coverage on the held-out half. The calibration primitive
  under every "guarantee 90% coverage without distributional
  assumptions" ML deployment.

Determinism discipline per the package standard. Reference tie: none
(SURVEY.md §2D engine-extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clean_census_acs_data_spark.io import register_views
from clean_census_acs_data_spark.queries import register

_JT_GROUPS = 5  # o_orderpriority '1-URGENT'..'5-LOW' — a fixed ordinal domain


def _jt_sql() -> str:
    """ONE shared text. The per-row contribution needs, for each row,
    the count of strictly-lower values in every strictly-lower group:
    k−1 conditional running sums over ONE value-ordered window with a
    strict RANGE frame (integer cents, so `1 PRECEDING` = `< cents`),
    then a CASE on the row's own group sums the applicable ones."""
    cums = ",\n         ".join(
        f"COALESCE(SUM(CASE WHEN g = {gi} THEN 1 ELSE 0 END) OVER "
        f"(ORDER BY cents RANGE BETWEEN UNBOUNDED PRECEDING AND "
        f"1 PRECEDING), 0) AS c{gi}"
        for gi in range(1, _JT_GROUPS)
    )
    lt = " ".join(
        f"WHEN g = {gi} THEN " + " + ".join(f"c{gj}" for gj in range(1, gi))
        for gi in range(2, _JT_GROUPS + 1)
    )
    return f"""
WITH o AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
w AS (
  SELECT g, cents,
         {cums}
  FROM o
),
jagg AS (
  SELECT CAST(SUM(CASE {lt} ELSE 0 END) AS BIGINT) AS j_stat,
         CAST(COUNT(*) AS BIGINT) AS n_total
  FROM w
),
sizes AS (
  SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS sum_n2,
         CAST(SUM(cnt * cnt * (2 * cnt + 3)) AS BIGINT) AS sum_n2_2n3
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM o GROUP BY g) gs
)
SELECT j.n_total, j.j_stat,
       CAST(j.n_total * j.n_total - s.sum_n2 AS BIGINT) AS mu_x4,
       CAST(j.n_total * j.n_total * (2 * j.n_total + 3) - s.sum_n2_2n3
            AS BIGINT) AS var_x72,
       CAST(4 * j.j_stat - (j.n_total * j.n_total - s.sum_n2) AS DOUBLE)
         / 4.0
         / sqrt(CAST(j.n_total * j.n_total * (2 * j.n_total + 3)
                     - s.sum_n2_2n3 AS DOUBLE) / 72.0) AS z_score
FROM jagg j, sizes s
"""


@register("jonckheere_terpstra_trend", oracle=_jt_sql())
def jonckheere_terpstra_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere–Terpstra ordered-alternative test: is order value
    stochastically increasing across the ordinal priority levels
    '1-URGENT' → '5-LOW'? J = Σ over level pairs i < j of the
    Mann–Whitney count #{x_a < x_b} — the k-sample test with POWER
    AGAINST THE ORDERING, which Kruskal–Wallis-style omnibus tests
    throw away (mann_whitney_u is its 2-sample member;
    cochran_armitage_trend its binary-outcome sibling). Computed
    without any pair join: one value-ordered pass where each row adds
    the count of strictly-lower values in strictly-lower groups —
    k−1 conditional running sums with a strict RANGE frame (exact on
    integer cents), fixed k = 5 from the priority domain. J (exact
    pair count), μ·4 = N² − Σn_j² and Var·72 = N²(2N+3) − Σn_j²(2n_j+3)
    are all exact int64; z is the single float tail (normal
    approximation; the variance is the no-ties form — J itself is
    tie-exact since only strict inequalities count, ties contribute
    nothing on either engine).

    100-TB shape: ONE value-ordered exchange carries all k−1 running
    counts (a single-partition window at test scale; the documented
    scale path is the global_rank device — per-partition counts +
    prefix offsets make the same running sums range-partitioned); the
    final combine is a 1-row × 1-row broadcast cross. Scale bound:
    var_x72 ~ 2N³ ⟹ int64 to N ≈ 1.6×10⁶ — past that the three
    moments switch to DECIMAL(38,0), the spearman_rho_decimal
    device."""
    register_views(spark, sf_dir)
    return spark.sql(_jt_sql())


# ---------------------------------------------------------------------------
# Friedman test over the balanced (day × event type) design
# ---------------------------------------------------------------------------


# The dense (day × type) block design with doubled within-block
# midranks — shared verbatim by friedman_balanced_blocks and
# page_trend_test (queries_round20d), which are the omnibus and
# ordered-alternative tests over the SAME ranked blocks.
_BLOCK_RANK_CTES = """
days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events),
types AS (SELECT DISTINCT event_type AS ty FROM events),
cellraw AS (
  SELECT date_trunc('day', ts) AS d, event_type AS ty,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY date_trunc('day', ts), event_type
),
cell AS (
  SELECT dy.d, t.ty, CAST(COALESCE(c.x, 0) AS BIGINT) AS x
  FROM days dy CROSS JOIN types t
  LEFT JOIN cellraw c ON c.d = dy.d AND c.ty = t.ty
),
r AS (
  SELECT d, ty, x,
         CAST(2 * RANK() OVER (PARTITION BY d ORDER BY x)
              + COUNT(*) OVER (PARTITION BY d, x) - 1 AS BIGINT) AS dr
  FROM cell
)"""


def _friedman_sql() -> str:
    """ONE shared text (date_trunc/rank/count are common). Balanced by
    construction: every observed day × every observed type, missing
    cells = 0 events — a day with NO events at all would drop the
    whole block, which is the correct Friedman treatment of a missing
    block."""
    return f"""
WITH {_BLOCK_RANK_CTES},
dims AS (
  SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT ty) AS BIGINT) AS k,
         CAST(SUM(dr * dr) AS BIGINT) AS a2_x4
  FROM r
),
rj AS (
  SELECT ty, CAST(SUM(dr) AS BIGINT) AS rd
  FROM r GROUP BY ty
),
gsum AS (
  SELECT CAST(SUM(rd * rd) AS BIGINT) AS sum_rd2 FROM rj
)
SELECT rj.ty AS event_type, d.n AS n_blocks, d.k AS k_treatments,
       rj.rd AS rank_sum_dbl,
       CAST((d.k - 1) * (g.sum_rd2 - d.n * d.n * d.k * (d.k + 1) * (d.k + 1))
            AS BIGINT) AS chi2_num,
       CAST(d.a2_x4 - d.n * d.k * (d.k + 1) * (d.k + 1) AS BIGINT)
         AS chi2_den,
       CASE WHEN d.a2_x4 - d.n * d.k * (d.k + 1) * (d.k + 1) > 0 THEN
         CAST((d.k - 1) * (g.sum_rd2
                           - d.n * d.n * d.k * (d.k + 1) * (d.k + 1))
              AS DOUBLE)
         / CAST(d.a2_x4 - d.n * d.k * (d.k + 1) * (d.k + 1) AS DOUBLE)
       ELSE NULL END AS chi2_f
FROM rj, dims d, gsum g
"""


@register("friedman_balanced_blocks", oracle=_friedman_sql())
def friedman_balanced_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test over the balanced (day × event type) block
    design: does some event type systematically out-rank the others
    day after day, judged only by WITHIN-day rankings (so global
    volume drift between days — the thing that poisons a naive
    pooled comparison — cancels exactly)? The k-treatment
    repeated-measures generalization of wilcoxon_signed_rank, in
    Conover's tie-robust form T = (k−1)(Σ_j R_j² − n²k(k+1)²/4) /
    (A₂ − nk(k+1)²/4) with A₂ = Σ r² over all cells. With the doubled
    midrank device (2·RANK + ties − 1), the ×4 scalings cancel
    between numerator and denominator, leaving chi2_num = (k−1)·
    (Σ Rd_j² − n²k(k+1)²) and chi2_den = Σ dr² − nk(k+1)² — BOTH
    exact int64s; χ²_F is the single float division (df = k−1; the
    no-ties special case collapses to the textbook
    12ΣR²/(nk(k+1)) − 3n(k+1), asserted by the property test).
    Missing (day, type) cells count 0 events — dense by the spine
    cross, the acf/seasonal device; a fully absent day drops its
    whole block, Friedman's correct missing-block treatment.

    100-TB shape: counts partial-aggregate map-side before one
    shuffle on (day, type); ranking windows partition by the DAY key
    (n blocks wide, never global); the statistic assembles from two
    tiny aggregates via 1-row broadcast crosses. Scale bound:
    Σ dr² ≤ n·k·(2k)² and n²k(k+1)² ⟹ int64 to n ≈ 4×10⁷ blocks at
    k ≤ 10 — past that, DECIMAL(38,0), the spearman_rho_decimal
    device."""
    register_views(spark, sf_dir)
    return spark.sql(_friedman_sql())


# ---------------------------------------------------------------------------
# split-conformal calibration quantile + held-out coverage
# ---------------------------------------------------------------------------


def _conformal_sql(tokenlen: str, div: str) -> str:
    """Dialect knobs: token-count expression and integral division."""
    return f"""
WITH s AS (
  SELECT doc_id,
         CAST(ABS(n_chars - 6 * {tokenlen}) AS BIGINT) AS score,
         doc_id % 2 = 0 AS is_cal
  FROM documents
),
cal AS (
  SELECT score, ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rn
  FROM s WHERE is_cal
),
ncal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
alphas AS (
  SELECT CAST(1 AS BIGINT) AS a_num, CAST(10 AS BIGINT) AS a_den
  UNION ALL
  SELECT CAST(1 AS BIGINT), CAST(20 AS BIGINT)
),
idx AS (
  SELECT a.a_num, a.a_den, nc.n_cal,
         CAST(((a.a_den - a.a_num) * (nc.n_cal + 1) + a.a_den - 1)
              {div} a.a_den AS BIGINT) AS k_idx
  FROM alphas a, ncal nc
),
q AS (
  SELECT i.a_num, i.a_den, i.n_cal, i.k_idx, c.score AS qhat
  FROM idx i JOIN cal c ON c.rn = i.k_idx
),
tst AS (SELECT score FROM s WHERE NOT is_cal)
SELECT q.a_num AS alpha_num, q.a_den AS alpha_den, q.n_cal, q.k_idx,
       q.qhat,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN t.score <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
         AS n_covered,
       CAST(SUM(CASE WHEN t.score <= q.qhat THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS coverage
FROM q CROSS JOIN tst t
GROUP BY q.a_num, q.a_den, q.n_cal, q.k_idx, q.qhat
"""


@register(
    "conformal_quantile_calibration",
    oracle=_conformal_sql("len(string_split(text, ' '))", "//"),
)
def conformal_quantile_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal prediction calibration: nonconformity score =
    |n_chars − 6·tokens| (the residual of a fixed 6-chars-per-token
    length model — any fixed model works, that is conformal's point),
    calibration half = doc_id % 2 = 0, and for α ∈ {1/10, 1/20} the
    conformal quantile q̂_α = the ⌈(n_cal+1)(1−α)⌉-th smallest
    calibration score — the EXACT finite-sample index that makes
    P(score_new ≤ q̂) ≥ 1 − α distribution-free for exchangeable data
    (Vovk et al.; the +1 is the guarantee, not a detail). The index is
    an exact ceiling division, the selection a ROW_NUMBER pick with
    (score, doc_id) total tiebreak, and the held-out coverage an
    integer count over the test half with one final division. An
    α small enough that k_idx > n_cal has no finite q̂ — such a row
    drops at the rank join rather than mis-reporting (the HAVING-guard
    discipline; both αs here are safely inside).

    100-TB shape: scoring is row-local; the calibration rank is one
    sort of the calibration HALF (at scale: the global_rank
    two-phase device); coverage is one broadcast of the 2-row q̂
    table against the test half with map-side partial counts. Scale
    bound: counts only — no products of data-sized terms anywhere."""
    register_views(spark, sf_dir)
    return spark.sql(_conformal_sql("size(split(text, ' '))", "DIV"))
