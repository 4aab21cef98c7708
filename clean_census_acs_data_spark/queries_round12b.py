"""Round-12 wave 2: inequality/concentration economics, a
nonparametric trend test, and Kneser–Ney continuation statistics —
exact-integer oracle discipline throughout (float columns are single
IEEE ops over exact integers; sqrt/division are correctly rounded, so
chained once they stay bit-identical across engines).

- ``gini_concentration_by_nation`` — Gini coefficient of customer
  spend per nation from the exact rank identity
  G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ): numerator/denominator exact
  BIGINTs over per-nation ranks, one IEEE division for the
  coefficient. The corpus analog (domain concentration of training
  tokens) is the same query with sources for nations.
- ``herfindahl_by_segment``   — market concentration: per-segment HHI
  over customer spend shares at permille resolution (shares are exact
  integer permille via DIV; the index is Σ share², an exact integer ≤
  10⁶). Quantization is part of the statistic's definition here —
  that's what makes it hashable.
- ``mann_kendall_trend``      — per-month monotone-trend test over
  daily order counts: S statistic from sign pairs (bounded ≤31²/2
  pairs per group), tie-corrected variance ×18 as an exact integer,
  and the normal z approximation as three correctly-rounded IEEE ops.
- ``kn_bigram_stats``         — Kneser–Ney continuation counts: c(ab),
  c(a·), N1+(a·) (distinct continuations) and N1+(·b) (distinct
  histories), plus the absolute-discounted probability with d=3/4 —
  a RATIONAL discount, so (4·c(ab)−3)/(4·c(a)) is one exact-integer
  division. The smoothing constants every n-gram LM pipeline needs,
  computed corpus-wide.

Reference tie: none (SURVEY.md §2B) — engine-extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.session import tracked_cache


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Gini coefficient per nation (rank identity, exact)
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH spend AS (
  SELECT c.c_custkey, c.c_nationkey,
         COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0)
           AS cents
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
r AS (
  SELECT c_nationkey, cents,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY cents, c_custkey) AS i
  FROM spend
),
g AS (
  SELECT c_nationkey,
         COUNT(*) AS n,
         SUM(cents) AS sx,
         SUM(i * cents) AS six
  FROM r GROUP BY 1
)
SELECT c_nationkey,
       CAST(n AS BIGINT) AS n_customers,
       CAST(sx AS BIGINT) AS total_cents,
       CAST(2 * six - (n + 1) * sx AS BIGINT) AS gini_num,
       CAST(n * sx AS BIGINT) AS gini_den,
       CAST(2 * six - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE)
         AS gini
FROM g
"""


@register("gini_concentration_by_nation", oracle=_GINI_ORACLE)
def gini_concentration_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime spend per nation, via the
    rank identity G = (2Σi·xᵢ − (n+1)Σxᵢ)/(nΣxᵢ) over ascending spend
    ranks — the inequality audit (and, swapped onto sources/tokens,
    the domain-concentration audit a corpus mix review starts from).
    Zero-spend customers participate (LEFT join), so G reflects the
    whole population. gini_num/gini_den are exact BIGINTs; gini is one
    IEEE division of those.

    100-TB shape: one shuffle to per-customer spend (partial-agg), one
    hash exchange on nation for the rank window — per-nation state
    streams through the window operator; no global sort. Exact while
    n·Σx < 2⁶³ per nation (~10⁹ customers × $10⁸ cents); past that the
    identity lifts to decimal(38,0) unchanged."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).alias("cents"))
    )
    w = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
    r = spend.withColumn("i", F.row_number().over(w))
    g = r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("i") * F.col("cents")).alias("six"),
    )
    num = F.lit(2) * F.col("six") - (F.col("n") + 1) * F.col("sx")
    den = F.col("n") * F.col("sx")
    return g.select(
        "c_nationkey",
        F.col("n").cast("long").alias("n_customers"),
        F.col("sx").cast("long").alias("total_cents"),
        num.cast("long").alias("gini_num"),
        den.cast("long").alias("gini_den"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman index per market segment (permille resolution)
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
WITH spend AS (
  SELECT c.c_mktsegment, c.c_custkey,
         SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
s AS (
  SELECT c_mktsegment, c_custkey, cents,
         SUM(cents) OVER (PARTITION BY c_mktsegment) AS seg_total
  FROM spend
),
p AS (
  SELECT c_mktsegment, seg_total,
         (cents * 1000) // seg_total AS share_permille
  FROM s
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_holders,
       CAST(ANY_VALUE(seg_total) AS BIGINT) AS total_cents,
       CAST(SUM(share_permille * share_permille) AS BIGINT)
         AS hhi_permille2,
       CAST(MAX(share_permille) AS BIGINT) AS top_share_permille
FROM p
GROUP BY 1
"""


@register("herfindahl_by_segment", oracle=_HHI_ORACLE)
def herfindahl_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of customer spend per
    market segment, at permille share resolution: each holder's share
    is the exact integer floor(cents·1000/total) and the index is
    Σ share² — an exact integer in [0, 10⁶]. The quantization IS the
    statistic's published definition here (that is what makes it
    exact); at permille resolution the floor undercounts true HHI by
    < 2·1000 = 0.2% of scale, bounded and one-sided.

    100-TB shape: per-customer partial-agg shuffle, then the segment
    total via a window keyed like the following aggregate (exchange
    reuse); the index aggregate is |segments| rows. No float until
    there is no float at all."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    s = spend.withColumn(
        "seg_total", F.sum("cents").over(Window.partitionBy("c_mktsegment"))
    )
    p = s.select(
        "c_mktsegment",
        "seg_total",
        F.expr("(cents * 1000) DIV seg_total").alias("share_permille"),
    )
    return p.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_holders"),
        F.first("seg_total").cast("long").alias("total_cents"),
        F.sum(F.col("share_permille") * F.col("share_permille"))
        .cast("long")
        .alias("hhi_permille2"),
        F.max("share_permille").cast("long").alias("top_share_permille"),
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test per month (daily order counts)
# ---------------------------------------------------------------------------

_MK_ORACLE = """
WITH daily AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT a.month,
         CASE WHEN b.cnt > a.cnt THEN 1
              WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b ON a.month = b.month AND a.day < b.day
),
s AS (SELECT month, SUM(sgn) AS s_stat FROM pairs GROUP BY month),
ties AS (
  SELECT month, SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT month, cnt, COUNT(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY month
),
nn AS (SELECT month, COUNT(*) AS n FROM daily GROUP BY month)
SELECT nn.month AS month,
       CAST(nn.n AS BIGINT) AS n_days,
       CAST(s.s_stat AS BIGINT) AS s_stat,
       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term AS BIGINT)
         AS var18,
       CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                 / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                             - ties.tie_term AS DOUBLE) / 18.0)
            WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                 / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                             - ties.tie_term AS DOUBLE) / 18.0)
            ELSE 0.0 END AS z
FROM nn JOIN s ON s.month = nn.month JOIN ties ON ties.month = nn.month
"""


@register("mann_kendall_trend", oracle=_MK_ORACLE)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotone-trend test on each month's daily order
    counts: S = Σ_{i<j} sign(xⱼ − xᵢ) (exact integer from the bounded
    ≤31·30/2 within-month pair join), the tie-corrected variance kept
    as the exact integer 18·Var(S), and the continuity-corrected
    normal z. z is three IEEE ops on exact integers (divide by 18,
    sqrt, divide) — each correctly rounded, so both engines emit the
    same bits.

    Months with a single observed day have no pairs and are dropped by
    the inner join on the S aggregate (deliberate: a one-point series
    has no defined trend; the DuckDB oracle's identical join expresses
    the same rule).

    100-TB shape: the pair join is within-group on a ≤31-row series
    per group — candidate volume is groups·31², linear in groups; all
    three aggregates hash-partition on month (exchange reuse). The
    trend test every metrics pipeline runs per entity-month, in one
    query."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    a = daily.select(
        F.col("month"), F.col("day").alias("day_a"), F.col("cnt").alias("cnt_a")
    )
    b = daily.select(
        F.col("month"), F.col("day").alias("day_b"), F.col("cnt").alias("cnt_b")
    )
    pairs = a.join(b, ["month"]).where(F.col("day_a") < F.col("day_b"))
    s = pairs.groupBy("month").agg(
        F.sum(
            F.when(F.col("cnt_b") > F.col("cnt_a"), 1)
            .when(F.col("cnt_b") < F.col("cnt_a"), -1)
            .otherwise(0)
        ).alias("s_stat")
    )
    ties = (
        daily.groupBy("month", "cnt")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("month")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    nn = daily.groupBy("month").agg(F.count(F.lit(1)).alias("n"))
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    )
    sigma = F.sqrt(var18.cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double") / sigma)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double") / sigma)
        .otherwise(F.lit(0.0))
    )
    return (
        nn.join(s, "month")
        .join(ties, "month")
        .select(
            F.col("month").alias("month"),
            F.col("n").cast("long").alias("n_days"),
            F.col("s_stat").cast("long").alias("s_stat"),
            var18.cast("long").alias("var18"),
            z.alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# Kneser–Ney continuation statistics (d = 3/4, rational discount)
# ---------------------------------------------------------------------------

_KN_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
big AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS u(i)
  WHERE t[i] <> '' AND t[i + 1] <> ''
),
cab AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab FROM big GROUP BY 1, 2),
ca AS (
  SELECT w1, SUM(c_ab) AS c_a, COUNT(*) AS n_follow_a
  FROM cab GROUP BY w1
),
cb AS (SELECT w2, COUNT(*) AS n_precede_b FROM cab GROUP BY w2)
SELECT cab.w1, cab.w2, cab.c_ab,
       CAST(ca.c_a AS BIGINT) AS c_a,
       CAST(ca.n_follow_a AS BIGINT) AS n_follow_a,
       CAST(cb.n_precede_b AS BIGINT) AS n_precede_b,
       CAST(4 * cab.c_ab - 3 AS BIGINT) AS p_disc_num,
       CAST(4 * ca.c_a AS BIGINT) AS p_disc_den,
       CAST(4 * cab.c_ab - 3 AS DOUBLE) / CAST(4 * ca.c_a AS DOUBLE)
         AS p_discounted
FROM cab JOIN ca ON ca.w1 = cab.w1 JOIN cb ON cb.w2 = cab.w2
WHERE cab.c_ab >= 3
"""


@register("kn_bigram_stats", oracle=_KN_ORACLE)
def kn_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser–Ney smoothing statistics for the corpus bigram LM:
    c(ab), c(a·), the continuation counts N1+(a·) (distinct words
    following a — the backoff weight's numerator) and N1+(·b)
    (distinct histories of b — the continuation probability's
    numerator), plus the absolute-discounted probability with the
    RATIONAL discount d = 3/4: (c(ab) − 3/4)/c(a) = (4c(ab) − 3)/(4c(a)),
    exact integers and one IEEE division. These four counts are the
    entire parameterization of interpolated KN — the assembly into
    P_KN is downstream arithmetic. Reported for bigrams seen ≥ 3
    times (the LM's min-count cutoff).

    100-TB shape: bigram counts partial-aggregate map-side; the two
    marginals group on w1/w2 (the c_ab table is the input, already
    tiny relative to the corpus); joins back are hash equi-joins on
    those keys. Same posting discipline as lm_bigram_surprisal, plus
    the continuation-count legs."""
    d = _t(spark, sf_dir, "documents").repartition(8)
    big = (
        d.select(
            F.explode(
                F.expr(
                    "zip_with(slice(split(lower(text), ' '), 1,"
                    " greatest(size(split(lower(text), ' ')) - 1, 0)),"
                    " slice(split(lower(text), ' '), 2,"
                    " greatest(size(split(lower(text), ' ')) - 1, 0)),"
                    " (x, y) -> struct(x AS w1, y AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .where((F.col("w1") != "") & (F.col("w2") != ""))
    )
    # cached: the bigram-type counts feed the discounted output, the
    # follower aggregate and the predecessor aggregate — uncached, the
    # zip_with bigram explode + count shuffle ran three times
    cab = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab")).transform(tracked_cache)
    cab.count()  # eager: sibling subtrees race a lazy cache fill
    ca = cab.groupBy("w1").agg(
        F.sum("c_ab").alias("c_a"), F.count(F.lit(1)).alias("n_follow_a")
    )
    cb = cab.groupBy("w2").agg(F.count(F.lit(1)).alias("n_precede_b"))
    num = F.lit(4) * F.col("c_ab") - 3
    den = F.lit(4) * F.col("c_a")
    return (
        cab.where(F.col("c_ab") >= 3)
        .join(ca, "w1")
        .join(cb, "w2")
        .select(
            "w1",
            "w2",
            "c_ab",
            F.col("c_a").cast("long").alias("c_a"),
            F.col("n_follow_a").cast("long").alias("n_follow_a"),
            F.col("n_precede_b").cast("long").alias("n_precede_b"),
            num.cast("long").alias("p_disc_num"),
            den.cast("long").alias("p_disc_den"),
            (num.cast("double") / den.cast("double")).alias("p_discounted"),
        )
    )
