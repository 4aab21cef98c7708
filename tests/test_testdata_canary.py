"""Testdata-schema canary (VERDICT r2 ask #2).

The driver can regenerate /root/testdata between rounds; round 2 lost 11
driver queries and the whole bench to a silent ``events.ts`` dtype change
(nanos-as-long → native timestamp[us]). This canary loads EVERY table at
sf0.001 through the real ``load_table`` path and asserts the contract the
rest of the engine depends on, so a regeneration breaks loudly here in
seconds, not deep inside a windowed aggregation.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import TimestampType

from clean_census_acs_data_spark.io import TABLES, load_table

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", TABLES)
def test_load_table_succeeds(spark, name):
    df = load_table(spark, SF_SMOKE, name)
    # Force one real read; limit(1) keeps it a metadata-cheap scan.
    assert df.limit(1).count() >= 0
    assert len(df.schema.fields) > 0


def test_events_ts_is_timestamp(spark):
    df = load_table(spark, SF_SMOKE, "events")
    dt = df.schema["ts"].dataType
    assert isinstance(dt, TimestampType), (
        f"events.ts loaded as {dt}; load_table must normalize to "
        "TimestampType (LTZ) regardless of how the driver generated the "
        "parquet — downstream unix_micros/window/watermark assume it"
    )
    # The event-time queries compare/subtract ts — make sure arithmetic
    # planning succeeds (this is exactly what crashed in round 2).
    from pyspark.sql import functions as F

    df.select((F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t2")).limit(
        1
    ).collect()


def test_embeddings_contract(spark):
    """The similarity/ANN tier assumes vec_id + 64-dim float arrays; a
    regenerated embeddings table with a different dim must fail here,
    not inside a zip_with fold."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType

    df = load_table(spark, SF_SMOKE, "embeddings")
    assert isinstance(df.schema["embedding"].dataType, ArrayType)
    dims = df.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r.d for r in dims] == [64], f"embedding dims changed: {dims}"


def test_documents_contract(spark):
    """The corpus tier assumes these columns; n_chars must agree with
    length(text) (quality gates and the log2 sketch key off it)."""
    from pyspark.sql import functions as F

    df = load_table(spark, SF_SMOKE, "documents")
    assert {"doc_id", "text", "lang", "source", "n_chars"} <= set(df.columns)
    bad = df.where(F.length("text") != F.col("n_chars")).count()
    assert bad == 0, f"{bad} documents where n_chars != length(text)"
