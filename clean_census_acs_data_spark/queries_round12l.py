"""Round-12 wave 12: nucleus (top-p) vocabulary coverage — the
vocab-truncation sizing query run before fixing a tokenizer or
embedding-table budget.

``vocab_topp_coverage``: per source, rank tokens by frequency and
report how many distinct tokens cover 90% of the token mass (the
"nucleus"), plus the head token's share. Zipfian text needs a tiny
fraction of its vocabulary for most of its mass — this measures that
exactly per domain: integer cumulative sums against the exact
threshold ceil(0.9·total) = (9·total + 9) DIV 10, no float mass.

Reference tie: none (SURVEY.md §2B) — corpus-ops extension tier
(complements zipf_slope_fit, which fits the rank-frequency LAW; this
prices the truncation DECISION).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_TOPP_ORACLE = """
WITH toks AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
),
c AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE token <> '' GROUP BY 1, 2
),
r AS (
  SELECT source, token, cnt,
         SUM(cnt) OVER (PARTITION BY source ORDER BY cnt DESC, token
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(cnt) OVER (PARTITION BY source) AS total,
         COUNT(*) OVER (PARTITION BY source) AS vocab,
         MAX(cnt) OVER (PARTITION BY source) AS top_cnt
  FROM c
)
SELECT source,
       CAST(ANY_VALUE(total) AS BIGINT) AS total_tokens,
       CAST(ANY_VALUE(vocab) AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN cum - cnt < (9 * total + 9) // 10
                     THEN 1 ELSE 0 END) AS BIGINT) AS nucleus_size,
       CAST(CAST(ANY_VALUE(top_cnt) AS HUGEINT) * 1000000
            // ANY_VALUE(total) AS BIGINT)
         AS head_share_ppm
FROM r
GROUP BY source
"""


@register("vocab_topp_coverage", oracle=_TOPP_ORACLE)
def vocab_topp_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (p = 0.9) vocabulary nucleus per source: tokens ranked by
    frequency (token-string tiebreak ⇒ total order), a token belongs
    to the nucleus while the mass BEFORE it is under the exact integer
    threshold ceil(0.9·total) — so the nucleus is the minimal prefix
    reaching 90% coverage, computed without any float mass. Reports
    nucleus size against full vocabulary size and the head token's
    ppm share — the numbers that size embedding tables and decide
    OOV-vs-byte-fallback budgets per domain.

    100-TB shape: token counts partial-aggregate map-side; the rank
    window, the per-source totals, and the final aggregate all ride
    ONE hash partitioning on source. Output is |sources| rows.

    Scale bound: head_share_ppm runs in DECIMAL(38,0)/HUGEINT — the BIGINT product top_cnt·1e6 wraps at 9.2e12 tokens and a 100-TB corpus holds ~2e13; the nucleus threshold 9·total+9 wraps only past ~10¹⁸ tokens."""
    toks = (
        _t(spark, sf_dir, "documents")
        .repartition(8)
        .select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
        )
        .where(F.col("token") != "")
    )
    c = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("source")
        .orderBy(F.desc("cnt"), "token")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("source")
    r = c.select(
        "source",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("vocab"),
        F.max("cnt").over(wall).alias("top_cnt"),
    )
    thresh = F.expr("(9 * total + 9) DIV 10")
    return r.groupBy("source").agg(
        F.first("total").cast("long").alias("total_tokens"),
        F.first("vocab").cast("long").alias("vocab_size"),
        F.sum(F.when(F.col("cum") - F.col("cnt") < thresh, 1).otherwise(0))
        .cast("long")
        .alias("nucleus_size"),
        # DECIMAL(38,0): top_cnt·1e6 wraps BIGINT at top_cnt ≥ 9.2e12
        # tokens — a 100-TB corpus holds ~2e13, so the widened form is
        # required, not precautionary (positive operands; DuckDB twin
        # uses HUGEINT //, identical integral semantics)
        F.expr("(CAST(first(top_cnt) AS DECIMAL(38,0)) * 1000000) DIV first(total)")
        .cast("long")
        .alias("head_share_ppm"),
    )
