"""Scale-technique queries: salted aggregation, token-frequency
explode (UDTF-shaped), vocabulary stats. All oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.functions import cents
from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.operators.skew import salted_sum_count
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "salted_agg_skew",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS base_cents,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def salted_agg_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a low-cardinality (hot) key:
    16 deterministic salt buckets spread each key across reducers, a
    second tiny shuffle re-aggregates the partials. Additive aggregates
    → bit-identical to the plain group-by the oracle runs."""
    li = _t(spark, sf_dir, "lineitem")
    return salted_sum_count(
        li,
        ["l_returnflag"],
        salt_col=F.col("l_orderkey"),
        salt_buckets=16,
        sum_exprs={
            "sum_qty": F.col("l_quantity").cast("long"),
            "base_cents": cents("l_extendedprice"),
        },
    )


@register(
    "salted_join_skew",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey % 97 = 0
    GROUP BY o_orderpriority
    """,
)
def salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manually salted equi-join: the (conceptually skewed) lineitem
    side is salted into 16 deterministic buckets; the filtered orders
    side is replicated ×16 with an exploded salt column; joining on
    (key, salt) spreads any hot key across 16 reducers. Result is
    bit-identical to the plain join the oracle runs — salting changes
    the physical distribution, never the semantics
    (operators/skew.py:salted_join)."""
    from clean_census_acs_data_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(
        li,
        o,
        large_key="l_orderkey",
        small_key="o_orderkey",
        salt_col=F.col("l_linenumber") + F.col("l_orderkey"),
        salt_buckets=16,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


@register(
    "token_frequencies",
    oracle="""
    SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: explode(split) — the UDTF-shaped generator op
    (SURVEY.md §2B UDF/UDTF row) — then count + per-doc frequency.
    Explode amplifies rows ~n_tokens×, but partial aggregation collapses
    them before the shuffle; the shuffle carries |vocab| rows."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )
