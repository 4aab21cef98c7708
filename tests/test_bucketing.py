"""Bucketed co-located join: the shuffle-elimination story for the
100-TB fact-fact join. Writing both sides bucketed by the join key
lets Spark sort-merge join them with ZERO Exchange — at scale this
turns the biggest shuffle in the workload into a local merge."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is static; tables land in ./spark-warehouse
    # (gitignored) and are dropped in teardown
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdemo")
    load_table(spark, SF, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("buckdemo.lineitem_b")
    load_table(spark, SF, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("buckdemo.orders_b")
    yield "buckdemo.lineitem_b", "buckdemo.orders_b"
    spark.sql("DROP TABLE IF EXISTS buckdemo.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS buckdemo.orders_b")
    spark.sql("DROP DATABASE IF EXISTS buckdemo")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table(li_t)
        o = spark.table(o_t)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        )
        p = plan_of(joined)
        # the join itself must not shuffle: the only Exchange allowed is
        # the one for the 5-group aggregate after the join
        join_section = p.split("HashAggregate")[0]
        assert "SortMergeJoin" in p
        assert "Exchange" not in join_section.split("== Physical Plan ==")[-1].split("(1) Scan")[0] or True
        # stronger: count Exchanges in whole plan — exactly 1 (for the agg)
        import re

        n_exchanges = len(re.findall(r"\(\d+\) Exchange", p))
        assert n_exchanges == 1, p
        # and the result is correct
        assert joined.count() == 5
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_shuffles_both_sides(spark):
    """Control: the same join on plain parquet shuffles both inputs."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        )
        import re

        p = plan_of(joined)
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", p))
        assert n_exchanges == 3  # both join inputs + the aggregate
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
