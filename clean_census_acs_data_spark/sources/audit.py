"""API-usage audit sink — the reference's SQLite ``usage`` table
(Test_census_tract.py:63-104) as an append-only parquet table.

Schema mirrors the DDL (:69-81): monotonic id, ISO-8601 UTC timestamp,
endpoint, params JSON (key redacted), x-ratelimit* headers JSON. Append
mode; at scale this is a partitioned table (by date) written by every
fetch job — parquet/Delta instead of a driver-local sqlite file, so
executors can write concurrently and the log itself is queryable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def audit_records(responses: DataFrame) -> DataFrame:
    """Project fetch responses into audit rows (one per request — every
    attempt's final state is recorded, success or failure, preserving
    the audit-before-status-check ordering of Test_census_tract.py:
    118-119)."""
    return responses.select(
        F.monotonically_increasing_id().alias("id"),
        F.col("audit_timestamp").alias("timestamp"),
        F.col("url").alias("endpoint"),
        F.col("audit_params").alias("params"),
        F.col("audit_headers").alias("headers"),
    )


def append_audit(responses: DataFrame, path: str) -> None:
    audit_records(responses).write.mode("append").parquet(path)


def read_audit(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
