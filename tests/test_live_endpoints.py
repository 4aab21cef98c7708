"""Env-gated LIVE S3 / warehouse integration (VERDICT r3 carried #7).

The sandbox has no reachable object store or warehouse, so these tests
skip by default; when the environment gains endpoints, set

    SPARK_GRAFT_S3_URI=s3a://bucket/prefix    (plus AWS creds / endpoint)
    SPARK_GRAFT_S3_ENDPOINT=http://host:9000  (optional, e.g. MinIO)
    SPARK_GRAFT_JDBC_URL=jdbc:postgresql://host:5439/db?user=..&password=..

and the SAME conf/DDL surfaces the unit tests assert offline
(session.s3a_conf, sources.jdbc.plan_jdbc_write) are exercised end to
end: write → read-back → row equality. No production code changes are
needed to go live — that is the point of the gate.
"""

from __future__ import annotations

import os
import uuid

import pytest

S3_URI = os.environ.get("SPARK_GRAFT_S3_URI")
JDBC_URL = os.environ.get("SPARK_GRAFT_JDBC_URL")


@pytest.fixture(scope="module")
def spark():
    from clean_census_acs_data_spark.session import get_spark, s3a_conf

    s = get_spark(shuffle_partitions=4)
    for k, v in s3a_conf(
        endpoint=os.environ.get("SPARK_GRAFT_S3_ENDPOINT")
    ).items():
        # hadoop confs must land on the live context for s3a to see them
        s.sparkContext._jsc.hadoopConfiguration().set(
            k.removeprefix("spark.hadoop."), v
        )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.mark.skipif(not S3_URI, reason="SPARK_GRAFT_S3_URI not set — no live S3")
def test_live_s3_roundtrip(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    path = f"{S3_URI.rstrip('/')}/sparkgraft_it_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert sorted(r.k for r in back.collect()) == list(range(100))


@pytest.mark.skipif(
    not JDBC_URL, reason="SPARK_GRAFT_JDBC_URL not set — no live warehouse"
)
def test_live_jdbc_ddl_and_roundtrip(spark):
    from clean_census_acs_data_spark.sources.jdbc import write_jdbc

    df = spark.range(50).selectExpr(
        "CAST(id AS BIGINT) AS k", "CAST(id AS STRING) AS label"
    )
    table = f"sparkgraft_it_{uuid.uuid4().hex[:8]}"
    # diststyle/sortkey default to the reference's Redshift layout; a
    # plain Postgres target needs them off
    write_jdbc(df, JDBC_URL, table, diststyle=None, sort_cols=())
    back = (
        spark.read.format("jdbc").option("url", JDBC_URL).option("dbtable", table).load()
    )
    assert back.count() == 50
