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


def write_stream_with_audit(
    stream: DataFrame, *, data_path: str, audit_path: str, checkpoint: str
):
    """foreachBatch multi-sink: every micro-batch lands in the data
    table AND appends one audit row (batch id, row count, written-at) —
    the streaming form of the reference's log-every-call discipline.
    foreachBatch is the escape hatch when one stream must feed sinks
    the streaming engine can't address natively (JDBC, multiple
    tables): the function runs once per batch with a *batch* DataFrame,
    so any batch writer works; exactly-once comes from the checkpoint
    replaying idempotent batch ids."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.write.mode("append").parquet(data_path)
            spark = batch_df.sparkSession
            audit = spark.createDataFrame(
                [(batch_id, batch_df.count())], "batch_id LONG, n_rows LONG"
            ).withColumn(
                "written_at",
                F.date_format(
                    F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX"
                ),
            )
            audit.write.mode("append").parquet(audit_path)
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
