"""SparkSession factory tuned for this engine.

Defaults are chosen for correctness-first local runs but scale: AQE handles
runtime re-planning (skew joins, partition coalescing) on a real cluster,
and the same config keys are what a 1000-executor deployment would tune.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def s3a_conf(*, endpoint: str | None = None) -> dict[str, str]:
    """Standard s3a client settings for cloud-object-store reads/writes
    (the SURVEY §7 Phase 0 "s3a-ready" promise; all keys are stock
    hadoop-aws configuration). Credentials come from the default
    provider chain (env vars / instance profile) — never inlined.

    - connection pool + thread pool sized for many concurrent
      multipart uploads across 32 task slots
    - fast upload with byte-buffer staging (no local-disk spooling)
    - 128 MB multipart size aligned with parquet row-group targets
    - magic committer: S3-consistent task commits without the
      rename-based O(data) commit penalty
    """
    conf = {
        "spark.hadoop.fs.s3a.connection.maximum": "96",
        "spark.hadoop.fs.s3a.threads.max": "64",
        "spark.hadoop.fs.s3a.fast.upload": "true",
        "spark.hadoop.fs.s3a.fast.upload.buffer": "bytebuffer",
        "spark.hadoop.fs.s3a.multipart.size": "134217728",
        "spark.hadoop.fs.s3a.block.size": "134217728",
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        "spark.sql.parquet.output.committer.class":
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
        "spark.sql.sources.commitProtocolClass":
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    }
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    return conf


def get_spark(
    app_name: str = "clean_census_acs_data_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    s3a: bool | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - AQE on: runtime shuffle-partition coalescing + skew-join splitting,
      the 100-TB safety net for uneven keys.
    - Arrow on: fast pandas/Pandas-UDF boundary (vectorized batches).
    - UTC session timezone: deterministic date/timestamp semantics
      regardless of host timezone.
    - Broadcast threshold left at default (10 MB) — dim tables (region,
      nation, config mappings) broadcast automatically; we also mark them
      explicitly with F.broadcast at the call sites.
    - s3a: opt-in via the ``s3a`` flag or SPARK_GRAFT_S3A=1 — applies
      the :func:`s3a_conf` cloud-object-store settings (no-op for local
      paths; requires hadoop-aws on the classpath in a real deployment).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if s3a is None:
        s3a = os.environ.get("SPARK_GRAFT_S3A", "") in ("1", "true", "yes")
    if s3a:
        for k, v in s3a_conf(
            endpoint=os.environ.get("SPARK_GRAFT_S3A_ENDPOINT") or None
        ).items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created
    session (the driver harness constructs its own SparkSession and passes
    it to ``queries()`` callables; these confs keep semantics deterministic
    there too)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        # Python DataSource filter pushdown (census_rest state pruning)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static conf on some builds; the source still works unpruned
    # a harness-built session keeps Spark's default 200 shuffle
    # partitions — 6× the local core count, all fixed-overhead tasks at
    # test scale. Right-size it to the core budget; AQE still coalesces
    # below this at runtime. Only override the untouched default so an
    # explicitly configured session is respected.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
    return spark
