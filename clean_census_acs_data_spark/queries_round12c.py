"""Round-12 wave 3: survey calibration (iterative proportional
fitting) and robust location estimation — exact-integer oracle
discipline (fixed-point milli/micro weights, integer floor division on
both engines).

- ``ipf_raking_weights``   — two rounds of IPF/raking over the
  (market segment × nation band) contingency table: scale cell
  weights to uniform row targets, then to uniform column targets,
  entirely in milli fixed-point. The weighting step every survey /
  panel / eval-set calibration pipeline runs; two rounds bound the
  query plan while demonstrating the fixpoint shape (each further
  round is the same two CTEs again — same generated-round discipline
  as bpe_train_merges).
- ``trimmed_mean_by_nation`` — 10%-trimmed mean of order value per
  nation (drop ⌊n/10⌋ at each tail by exact rank) next to the plain
  mean — the robust-location complement to mad_robust_outliers /
  winsorize_clip (which CLIP; this TRIMS).

Reference tie: none (SURVEY.md §2B) — engine-extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# IPF / raking (2 rounds, milli fixed-point)
# ---------------------------------------------------------------------------

_IPF_ORACLE = """
WITH cells AS (
  SELECT c_mktsegment AS seg, c_nationkey // 5 AS band,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer GROUP BY 1, 2
),
w0 AS (
  SELECT seg, band, cnt, cnt * 1000 AS w0,
         SUM(cnt * 1000) OVER () AS n_milli,
         COUNT(DISTINCT seg) OVER () AS n_seg,
         COUNT(DISTINCT band) OVER () AS n_band
  FROM cells
),
r1 AS (
  SELECT seg, band, cnt, n_milli, n_seg, n_band,
         (w0 * (n_milli // n_seg)) // SUM(w0) OVER (PARTITION BY seg) AS w1
  FROM w0
),
r2 AS (
  SELECT seg, band, cnt, n_milli, n_seg, w1,
         (w1 * (n_milli // n_band)) // SUM(w1) OVER (PARTITION BY band) AS w2
  FROM r1
)
SELECT seg, band, cnt,
       CAST(w1 AS BIGINT) AS w1_milli,
       CAST(w2 AS BIGINT) AS w2_milli,
       CAST(ABS(SUM(w2) OVER (PARTITION BY seg) - n_milli // n_seg)
            AS BIGINT) AS row_dev_milli
FROM r2
"""


@register("ipf_raking_weights", oracle=_IPF_ORACLE)
def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) of the customer
    (segment × nation-band) table to uniform margins, two rounds in
    milli fixed-point: w1 scales each ROW to the uniform row target
    N/|segments|, w2 then scales each COLUMN to N/|bands|;
    row_dev_milli reports how far the column pass drifted the rows —
    the convergence diagnostic a raking loop watches. Every step is
    integer floor division, so both engines agree bit-for-bit (the
    float IPF's drift is exactly what makes it unhashable).

    100-TB shape: one partial-agg shuffle to the cell grid; every
    subsequent sum is a window over the |segments|·|bands| aggregate
    (25 rows here) — iteration cost is independent of the fact-table
    size, which is why raking at warehouse scale is cheap. Exact while
    w·(N·1000/R) < 2⁶³ — ~sf1000 for this grid; the same CTEs lift to
    decimal(38,0) past that."""
    cells = (
        _t(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.expr("c_nationkey DIV 5").alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    all_w = Window.partitionBy()
    w0 = cells.select(
        "seg",
        "band",
        "cnt",
        (F.col("cnt") * 1000).alias("w0"),
        F.sum(F.col("cnt") * 1000).over(all_w).alias("n_milli"),
        F.size(F.collect_set("seg").over(all_w)).cast("long").alias("n_seg"),
        F.size(F.collect_set("band").over(all_w)).cast("long").alias("n_band"),
    )
    r1 = w0.select(
        "seg",
        "band",
        "cnt",
        "n_milli",
        "n_seg",
        "n_band",
        F.expr(
            "(w0 * (n_milli DIV n_seg)) DIV"
            " sum(w0) OVER (PARTITION BY seg)"
        ).alias("w1"),
    )
    r2 = r1.select(
        "seg",
        "band",
        "cnt",
        "n_milli",
        "n_seg",
        "w1",
        F.expr(
            "(w1 * (n_milli DIV n_band)) DIV"
            " sum(w1) OVER (PARTITION BY band)"
        ).alias("w2"),
    )
    return r2.select(
        "seg",
        "band",
        "cnt",
        F.col("w1").cast("long").alias("w1_milli"),
        F.col("w2").cast("long").alias("w2_milli"),
        F.abs(
            F.sum("w2").over(Window.partitionBy("seg"))
            - F.expr("n_milli DIV n_seg")
        )
        .cast("long")
        .alias("row_dev_milli"),
    )


# ---------------------------------------------------------------------------
# trimmed mean per nation (exact rank trim)
# ---------------------------------------------------------------------------

_TRIM_ORACLE = """
WITH v AS (
  SELECT c.c_nationkey,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
         o.o_orderkey
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
r AS (
  SELECT c_nationkey, cents,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY cents, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
  FROM v
),
g AS (
  SELECT c_nationkey,
         ANY_VALUE(n) AS n,
         ANY_VALUE(n // 10) AS k,
         SUM(cents) AS s_all,
         SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                  THEN cents ELSE 0 END) AS s_mid
  FROM r GROUP BY 1
)
SELECT c_nationkey,
       CAST(n AS BIGINT) AS n_orders,
       CAST(k AS BIGINT) AS k_trimmed_each_side,
       CAST((s_all * 10000) // n AS BIGINT) AS mean_micro,
       CAST((s_mid * 10000) // (n - 2 * k) AS BIGINT)
         AS trimmed_mean_micro
FROM g
"""


@register("trimmed_mean_by_nation", oracle=_TRIM_ORACLE)
def trimmed_mean_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of order value per customer nation: drop
    exactly ⌊n/10⌋ orders at each tail (by total rank with an orderkey
    tiebreak, so the trim set is deterministic) and average the middle
    in micro fixed-point, next to the untrimmed mean. Complements
    winsorize_clip (which caps tails at the cut value) and
    mad_robust_outliers (which flags them) with the estimator that
    REMOVES them.

    100-TB shape: one hash exchange on nation for the rank window, and
    the aggregate rides the same partitioning (exchange reuse) — the
    conditional sum means the trimmed and plain statistics come out of
    one pass. Skew: nation is a bounded key set; within a nation the
    window streams."""
    v = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("c_nationkey")
    r = v.select(
        "c_nationkey",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mid = (F.col("rn") > F.expr("n DIV 10")) & (
        F.col("rn") <= F.col("n") - F.expr("n DIV 10")
    )
    g = r.groupBy("c_nationkey").agg(
        F.first("n").alias("n"),
        F.first(F.expr("n DIV 10")).alias("k"),
        F.sum("cents").alias("s_all"),
        F.sum(F.when(mid, F.col("cents")).otherwise(F.lit(0))).alias("s_mid"),
    )
    return g.select(
        "c_nationkey",
        F.col("n").cast("long").alias("n_orders"),
        F.col("k").cast("long").alias("k_trimmed_each_side"),
        F.expr("(s_all * 10000) DIV n").cast("long").alias("mean_micro"),
        F.expr("(s_mid * 10000) DIV (n - 2 * k)")
        .cast("long")
        .alias("trimmed_mean_micro"),
    )
