"""Python streaming DataSource (simpleStreamReader): deterministic
parquet replay with checkpointable row offsets."""

from __future__ import annotations

import duckdb

from clean_census_acs_data_spark.sources.replay_stream import (
    ParquetReplayStreamReader,
    register_replay_source,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _expected_count() -> int:
    return duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{DOCS}')").fetchone()[0]


def test_replay_stream_emits_all_rows_once(spark, tmp_path):
    register_replay_source(spark)
    q = (
        spark.readStream.format("parquet_replay")
        .option("path", DOCS)
        .option("batch_rows", 17)  # deliberately not a divisor of the count
        .load()
        .writeStream.format("memory")
        .queryName("replay_docs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # a simple stream reader advances one batch per trigger;
    # processAllAvailable drains until the offset stops moving
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT COUNT(*) AS n FROM replay_docs").collect()[0]["n"]
    assert got == _expected_count()
    # no duplicate doc_ids: each offset range served exactly once
    dup = spark.sql(
        "SELECT COUNT(*) AS n FROM (SELECT doc_id FROM replay_docs"
        " GROUP BY doc_id HAVING COUNT(*) > 1)"
    ).collect()[0]["n"]
    assert dup == 0


def test_replay_offsets_advance_and_rewind():
    r = ParquetReplayStreamReader({"path": DOCS, "batch_rows": 7})
    assert r.initialOffset() == {"row": 0}
    it, nxt = r.read({"row": 0})
    first = list(it)
    assert len(first) == 7 and nxt == {"row": 7}
    # recovery path: re-asking for the same range returns identical rows
    again = list(r.readBetweenOffsets({"row": 0}, {"row": 7}))
    assert again == first
    # tail batch is short, offset clamps at the row count
    n = _expected_count()
    it, end = r.read({"row": n - 3})
    assert len(list(it)) == 3 and end == {"row": n}
    it, end2 = r.read(end)
    assert list(it) == [] and end2 == end


def test_clone_registration_routes_to_clone(spark):
    """Regression for the suite's intermittent streaming_replay_source
    failure: pyspark's ``spark.dataSource.register`` routes through the
    JVM's ACTIVE session, so registering on a ``newSession()`` clone
    while the parent (already holding the name) is active raised
    DATA_SOURCE_ALREADY_EXISTS against the PARENT and left the CLONE's
    manager empty — its ``.load()`` then failed DATA_SOURCE_NOT_FOUND.
    The trigger was exactly this test file registering on the parent
    before test_rows_only ran the entry. register_python_datasource
    pins the target session active during registration."""
    from clean_census_acs_data_spark.queries import QUERIES
    from clean_census_acs_data_spark.sources.replay_stream import (
        register_replay_source,
    )

    register_replay_source(spark)  # parent holds the name (the trigger)
    # the entry registers on a fresh clone internally — twice, like the
    # determinism gate does
    for _ in range(2):
        out = QUERIES["streaming_replay_source"](spark, "/root/testdata/sf0.001")
        assert out.count() > 0
