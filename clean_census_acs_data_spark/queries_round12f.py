"""Round-12 wave 6: privacy-risk audits beyond k-anonymity —
l-diversity and t-closeness — completing the anonymization-audit tier
(k_anonymity_audit measures group SIZE; these measure what the group
reveals about the SENSITIVE attribute). Exact-integer oracle
discipline: t-closeness' earth-mover distance is computed entirely on
cross-multiplied cumulative counts (rationals with common
denominators), no float until one final division.

- ``l_diversity_audit``     — per quasi-identifier group (market
  segment × nation band): how many distinct sensitive values (account-
  balance bands) appear, and how dominant the top one is. A group can
  be k-anonymous yet 1-diverse (everyone shares the sensitive value —
  full disclosure); l and the dominant share are the standard
  disclosure-risk pair.
- ``t_closeness_emd_audit`` — per group: earth-mover distance between
  the group's sensitive-value distribution and the global one, for
  ORDERED categories (EMD = Σ_b |cum_p(b) − cum_q(b)| / (B−1)).
  Cross-multiplied form: Σ_b |cum_g(b)·N − cum_all(b)·n_g| over
  (n_g·N·(B−1)) — exact BIGINTs, one IEEE division for t. Groups with
  t above a threshold leak the sensitive attribute's distribution
  even when k and l look fine.

Reference tie: none (SURVEY.md §2B) — extends the privacy tier
(k_anonymity_audit, dp_noisy_release).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# sensitive attribute: account balance banded into 10 ordered buckets.
# TPC-H fixes c_acctbal ∈ [-999.99, 9999.99], so the banding is
# scale-stable: (cents + 100000) DIV 110000 ∈ [0, 9] at every sf.
_SENS_BUCKET_SQL = (
    "(CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) // 110000"
)
_SENS_BUCKET_SPARK = (
    "(CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) DIV 110000"
)
_N_BUCKETS = 10


_LDIV_ORACLE = f"""
WITH c AS (
  SELECT c_mktsegment AS seg, c_nationkey // 5 AS band,
         {_SENS_BUCKET_SQL} AS sens
  FROM customer
),
g AS (
  SELECT seg, band, sens, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM c GROUP BY 1, 2, 3
)
SELECT seg, band,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS l_distinct,
       CAST(MAX(cnt) AS BIGINT) AS top_count,
       CAST((MAX(cnt) * 1000) // SUM(cnt) AS BIGINT)
         AS dominant_share_permille
FROM g
GROUP BY 1, 2
"""


@register("l_diversity_audit", oracle=_LDIV_ORACLE)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l diversity per quasi-identifier group: the number of
    distinct sensitive bands present and the dominant band's share
    (permille, exact floor division). l = 1 or dominant ≈ 1000 means a
    k-anonymous group still discloses its members' sensitive value —
    the audit k-anonymity alone cannot express.

    100-TB shape: one partial-agg shuffle to the (group, sensitive)
    grid, then a group-level aggregate on the same keys' prefix
    (exchange reuse); output is |groups| rows."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.expr("c_nationkey DIV 5").alias("band"),
        F.expr(_SENS_BUCKET_SPARK).alias("sens"),
    )
    g = c.groupBy("seg", "band", "sens").agg(F.count(F.lit(1)).alias("cnt"))
    return g.groupBy("seg", "band").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
        F.max("cnt").cast("long").alias("top_count"),
        F.expr("(MAX(cnt) * 1000) DIV SUM(cnt)")
        .cast("long")
        .alias("dominant_share_permille"),
    )


_TCLOSE_ORACLE = f"""
WITH c AS (
  SELECT c_mktsegment AS seg, c_nationkey // 5 AS band,
         {_SENS_BUCKET_SQL} AS sens
  FROM customer
),
groups AS (SELECT DISTINCT seg, band FROM c),
grid AS (
  SELECT seg, band, b.sens
  FROM groups, (SELECT unnest(range(0, {_N_BUCKETS})) AS sens) b
),
gc AS (
  SELECT seg, band, sens, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM c GROUP BY 1, 2, 3
),
filled AS (
  SELECT grid.seg, grid.band, grid.sens, COALESCE(gc.cnt, 0) AS cnt
  FROM grid LEFT JOIN gc
    ON gc.seg = grid.seg AND gc.band = grid.band AND gc.sens = grid.sens
),
cums AS (
  SELECT seg, band, sens,
         SUM(cnt) OVER (PARTITION BY seg, band ORDER BY sens
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_g,
         SUM(cnt) OVER (PARTITION BY seg, band) AS n_g
  FROM filled
),
gtot AS (
  SELECT sens,
         SUM(CAST(cnt AS BIGINT)) AS bucket_cnt
  FROM gc GROUP BY sens
),
gcum AS (
  SELECT sens,
         SUM(bucket_cnt) OVER (ORDER BY sens
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_all,
         SUM(bucket_cnt) OVER () AS n_all
  FROM gtot
),
terms AS (
  SELECT cums.seg, cums.band, cums.n_g, gcum.n_all,
         ABS(cums.cum_g * gcum.n_all - gcum.cum_all * cums.n_g) AS term
  FROM cums JOIN gcum ON gcum.sens = cums.sens
  WHERE cums.sens < {_N_BUCKETS - 1}
)
SELECT seg, band,
       CAST(ANY_VALUE(n_g) AS BIGINT) AS n_rows,
       CAST(SUM(term) AS BIGINT) AS emd_num,
       CAST(ANY_VALUE(n_g) * ANY_VALUE(n_all) * {_N_BUCKETS - 1} AS BIGINT)
         AS emd_den,
       CAST(SUM(term) AS DOUBLE)
         / CAST(ANY_VALUE(n_g) * ANY_VALUE(n_all) * {_N_BUCKETS - 1} AS DOUBLE)
         AS t_closeness
FROM terms
GROUP BY 1, 2
"""


@register("t_closeness_emd_audit", oracle=_TCLOSE_ORACLE)
def t_closeness_emd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness per quasi-identifier group: earth-mover distance
    between the group's sensitive-band distribution and the global
    one. For ordered categories EMD has the closed form
    Σ_b |cum_p(b) − cum_q(b)|/(B−1); cross-multiplying by n_g·N turns
    every term into an exact BIGINT, so emd_num/emd_den are exact and
    t is one IEEE division. The last bucket's cumulative term is
    identically zero (both cumsums hit their totals) and is excluded
    on both engines. Missing (group, bucket) cells are zero-filled
    via a generated grid — a cumsum over a sparse grid would silently
    skip plateaus and understate the distance.

    100-TB shape: one shuffle to the (group, bucket) grid; group
    cumsums ride a (group)-partitioned window over ≤B rows per group;
    the global distribution is B rows broadcast back on the bucket
    key. Exact while n_g·N < 2⁶³/B (~10⁹ rows per side)."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.expr("c_nationkey DIV 5").alias("band"),
        F.expr(_SENS_BUCKET_SPARK).alias("sens"),
    )
    gc = c.groupBy("seg", "band", "sens").agg(F.count(F.lit(1)).alias("cnt"))
    groups = gc.select("seg", "band").distinct()
    grid = groups.select(
        "seg",
        "band",
        F.explode(F.sequence(F.lit(0), F.lit(_N_BUCKETS - 1))).alias("sens"),
    )
    filled = grid.join(gc, ["seg", "band", "sens"], "left").select(
        "seg", "band", "sens", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    wg = (
        Window.partitionBy("seg", "band")
        .orderBy("sens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = filled.select(
        "seg",
        "band",
        "sens",
        F.sum("cnt").over(wg).alias("cum_g"),
        F.sum("cnt").over(Window.partitionBy("seg", "band")).alias("n_g"),
    )
    glob = gc.groupBy("sens").agg(F.sum("cnt").alias("bucket_cnt"))
    wa = Window.orderBy("sens").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gcum = glob.select(
        "sens",
        F.sum("bucket_cnt").over(wa).alias("cum_all"),
        F.sum("bucket_cnt").over(Window.partitionBy()).alias("n_all"),
    )
    terms = (
        cums.where(F.col("sens") < _N_BUCKETS - 1)
        .join(F.broadcast(gcum), "sens")
        .select(
            "seg",
            "band",
            "n_g",
            "n_all",
            F.abs(
                F.col("cum_g") * F.col("n_all")
                - F.col("cum_all") * F.col("n_g")
            ).alias("term"),
        )
    )
    den = F.col("n_g") * F.col("n_all") * (_N_BUCKETS - 1)
    return (
        terms.groupBy("seg", "band")
        .agg(
            F.first("n_g").alias("n_g"),
            F.first("n_all").alias("n_all"),
            F.sum("term").alias("emd_num"),
        )
        .select(
            "seg",
            "band",
            F.col("n_g").cast("long").alias("n_rows"),
            F.col("emd_num").cast("long").alias("emd_num"),
            den.cast("long").alias("emd_den"),
            (F.col("emd_num").cast("double") / den.cast("double")).alias(
                "t_closeness"
            ),
        )
    )
