"""Round-7 tier F: tokenizer-regex stats, exact higher moments,
ratio-to-parent reporting.

- ``token_count_bpe_regex`` — token counting under a BPE-ish regex
  (letter runs / digit runs / punctuation runs) next to the whitespace
  count: the checklist's "token counting (whitespace + a BPE-ish
  regex)" item made explicit — the pre-tokenizer census that sizes a
  training corpus in tokens, not bytes.
- ``stats_skew_kurtosis``   — population skewness and excess kurtosis
  from EXACT integer power sums (3rd/4th moments): distribution-shape
  profiling beyond stats_corr_covar's 2nd-order moments.
- ``ratio_to_parent_rollup`` — nation revenue as a share of its
  region and of the total: the ratio-to-parent report every BI rollup
  ships, as integer micro-shares.

Reference tie: the reference implements none of this tier (SURVEY.md §2B marks the category ABSENT; its only analytics are pre-aggregated census measures, Test_census_tract.py:287-313) — these are the BASELINE.json 100-TB extension operators, built with the repo's exact-integer discipline.
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
# BPE-ish regex token counting
# ---------------------------------------------------------------------------

# disjoint ASCII classes — alternation order can't matter, so Java
# (Spark) and RE2-style (DuckDB) engines extract identical runs
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"

_BPE_TOKENS_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_ws_tokens,
         regexp_extract_all(text, '{_BPE_PATTERN}') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(n_ws_tokens AS BIGINT) AS n_ws_tokens,
       CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_bpe
FROM g
"""


@register("token_count_bpe_regex", oracle=_BPE_TOKENS_ORACLE)
def token_count_bpe_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under a BPE-style pre-tokenizer regex (runs of
    letters / digits / other) alongside the whitespace count — the two
    numbers whose ratio predicts how a real subword tokenizer will
    blow up a document (punctuation-dense text tokenizes far past its
    word count; corpus budgets are set in tokens, not words).

    Row-local: one regexp_extract_all + two array sizes per document,
    zero shuffles. The pattern uses disjoint ASCII classes only so the
    leftmost-alternation semantics of Java and RE2 regex engines
    cannot diverge (the same dialect-portability discipline as
    text_pii_redaction)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.expr(f"regexp_extract_all(text, '{_BPE_PATTERN}', 0)")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_ws_tokens"),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_bpe"),
    )


# ---------------------------------------------------------------------------
# exact 3rd/4th-moment shape statistics
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS s2,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS s4
  FROM lineitem GROUP BY l_returnflag
),
d AS (
  SELECT l_returnflag, n, s1, s2, s3, s4,
         CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
         CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
         CAST(s4 AS DOUBLE) AS s4d
  FROM s
)
SELECT l_returnflag, n, s1, s2, s3, s4,
       (nd * nd * s3d - 3.0 * nd * s1d * s2d + 2.0 * s1d * s1d * s1d)
         / ((nd * s2d - s1d * s1d) * sqrt(nd * s2d - s1d * s1d)) AS skewness,
       (nd * nd * nd * s4d - 4.0 * nd * nd * s1d * s3d
          + 6.0 * nd * s1d * s1d * s2d - 3.0 * s1d * s1d * s1d * s1d)
         / ((nd * s2d - s1d * s1d) * (nd * s2d - s1d * s1d)) - 3.0
         AS kurtosis_excess
FROM d
"""


@register("stats_skew_kurtosis", oracle=_SKEW_ORACLE)
def stats_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of l_quantity per
    return flag, from EXACT integer power sums Σx..Σx⁴ (x ≤ 50, so
    even Σx⁴ fits int64 with orders of magnitude to spare). The
    distribution-shape audit used to pick robust-vs-moment statistics
    before 100 TB of them get computed (stats_corr_covar stops at the
    2nd moment; mad_robust_outliers is the route you take when THIS
    query says the tails are heavy).

    Numeric discipline: one map-side-combined agg produces five exact
    longs per group; skewness/kurtosis derive through one fixed-shape
    double expression — products, subtractions, divisions and a sqrt
    only (d3/d2^1.5 via d2·√d2, no libm pow), so both engines execute
    the identical IEEE operation sequence on identical integers —
    bit-equal doubles without quantization."""
    q = F.col("l_quantity").cast("long")
    s = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(q).cast("long").alias("s1"),
            F.sum(q * q).cast("long").alias("s2"),
            F.sum(q * q * q).cast("long").alias("s3"),
            F.sum(q * q * q * q).cast("long").alias("s4"),
        )
    )
    nd, s1d, s2d, s3d, s4d = [
        F.col(c).cast("double") for c in ("n", "s1", "s2", "s3", "s4")
    ]
    d2 = nd * s2d - s1d * s1d
    skew = (nd * nd * s3d - F.lit(3.0) * nd * s1d * s2d + F.lit(2.0) * s1d * s1d * s1d) / (
        d2 * F.sqrt(d2)
    )
    kurt = (
        nd * nd * nd * s4d
        - F.lit(4.0) * nd * nd * s1d * s3d
        + F.lit(6.0) * nd * s1d * s1d * s2d
        - F.lit(3.0) * s1d * s1d * s1d * s1d
    ) / (d2 * d2) - F.lit(3.0)
    return s.select(
        "l_returnflag",
        "n",
        "s1",
        "s2",
        "s3",
        "s4",
        skew.alias("skewness"),
        kurt.alias("kurtosis_excess"),
    )


# ---------------------------------------------------------------------------
# ratio-to-parent rollup report
# ---------------------------------------------------------------------------

_RATIO_ORACLE = """
WITH rev AS (
  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region_name, nation_name, rev_cents,
       CAST(rev_cents * 1000000
            // SUM(rev_cents) OVER (PARTITION BY region_name) AS BIGINT)
         AS share_of_region_micro,
       CAST(rev_cents * 1000000 // SUM(rev_cents) OVER () AS BIGINT)
         AS share_of_total_micro
FROM rev
"""


@register("ratio_to_parent_rollup", oracle=_RATIO_ORACLE)
def ratio_to_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent report: each nation's order revenue as an
    integer micro-share of its region and of the grand total — the
    percent-of-parent column every hierarchy dashboard computes
    (rollup_geo gives the subtotals; this gives the shares).

    One fact agg (orders ⋈ customer on the key — AQE picks broadcast
    when customer fits; nation/region broadcast unconditionally),
    map-side combined to 25 rows, then two windows OVER THE 25-ROW
    AGGREGATE — at any fact scale the windowed part is
    dimension-sized. Shares are integer-floored micro-units, immune to
    engine float formatting."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    rev = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(F.sum(cents).cast("long").alias("rev_cents"))
    )
    wr = Window.partitionBy("region_name")
    wt = Window.partitionBy()
    return rev.select(
        "region_name",
        "nation_name",
        "rev_cents",
        F.expr("rev_cents * 1000000")
        .cast("long")
        .alias("__num"),
        F.sum("rev_cents").over(wr).alias("__r"),
        F.sum("rev_cents").over(wt).alias("__t"),
    ).select(
        "region_name",
        "nation_name",
        "rev_cents",
        F.expr("__num div __r").cast("long").alias("share_of_region_micro"),
        F.expr("__num div __t").cast("long").alias("share_of_total_micro"),
    )
