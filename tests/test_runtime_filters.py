"""Runtime bloom-filter injection: the scan-reduction mechanism that
matters at 100 TB when a selective dim filter can't become a broadcast
join (both sides too big). Spark's InjectRuntimeFilter builds a bloom
filter from the filtered creation side and applies might_contain on the
fact side's scan — rows that can't join die before the shuffle.

Sibling of the dynamic-partition-pruning test: DPP prunes whole
partitions via partition columns; the bloom filter prunes row groups /
shuffle input on ordinary join keys."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def bloom_conf(spark):
    """Make both sides eligible at test scale: the creation side must be
    UNDER creationSideThreshold and the application side's scan OVER
    applicationSideScanSizeThreshold (test files are tiny, so drop it
    to zero). Broadcast is disabled so the join actually shuffles —
    with a broadcast join Spark skips the bloom filter as redundant."""
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_selective_dim_filter_injects_bloom_on_fact_side(bloom_conf):
    spark = bloom_conf
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = _plan(j)
    assert "might_contain" in p.lower(), "no runtime bloom filter injected"
    # the filter must sit on the fact (lineitem) side, pre-shuffle
    assert "l_orderkey" in p.lower().split("might_contain", 1)[1][:200]


def test_bloom_filter_preserves_results(bloom_conf):
    spark = bloom_conf
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    with_bloom = {r["l_returnflag"]: r["n"] for r in j.collect()}
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        without = {r["l_returnflag"]: r["n"] for r in j.collect()}
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_bloom == without
