"""Deterministic parquet replay as a Python streaming DataSource
(Spark 4 ``simpleStreamReader`` API) — the testing/backfill analog of
replaying a Kafka topic from offset 0: a bounded table is re-emitted as
a stream of fixed-size micro-batches with monotonically increasing,
checkpointable row offsets.

Offset model: ``{"row": n}`` = n rows already emitted. ``read(start)``
returns the next batch and the advanced offset; ``readBetweenOffsets``
re-serves an exact historical range, which is what gives the source
exactly-once replay under checkpoint recovery (the engine re-asks for
the same [start, end) after a crash and gets identical rows).

The simple-reader variant executes on the driver — appropriate for a
test/backfill source of bounded tables. A production fan-in source
would use the partitioned ``streamReader`` API instead; the offset
contract is identical, so this file documents the semantics that
matter.

Rows are served from pyarrow (no Spark job inside the source); only
scalar column types appear in the replayed tables (documents/events),
mapped to their Spark equivalents in ``schema()``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_ARROW_TO_SPARK = {
    "int64": LongType(),
    "int32": LongType(),
    "double": DoubleType(),
    "float": DoubleType(),
    "string": StringType(),
    "large_string": StringType(),
}


def _spark_field(name: str, arrow_type) -> StructField:
    t = str(arrow_type)
    if t.startswith("timestamp"):
        return StructField(name, TimestampType())
    if t not in _ARROW_TO_SPARK:
        raise TypeError(f"replay source: unsupported column type {name}: {t}")
    return StructField(name, _ARROW_TO_SPARK[t])


def _load_rows(path: str) -> list[tuple]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    # normalize nanos → micros so datetime conversion is exact Spark-side
    import pyarrow as pa

    cols = []
    for field, col in zip(tbl.schema, tbl.columns):
        if str(field.type).startswith("timestamp"):
            col = col.cast(pa.timestamp("us"))
        cols.append(col)
    tbl = pa.table(cols, names=tbl.column_names)
    cols_py = [c.to_pylist() for c in tbl.columns]
    return list(zip(*cols_py)) if cols_py else []


class ParquetReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_rows = int(options.get("batch_rows", 100))
        self._rows: list[tuple] | None = None

    def _rows_cached(self) -> list[tuple]:
        if self._rows is None:
            self._rows = _load_rows(self.path)
        return self._rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows = self._rows_cached()
        lo = start["row"]
        hi = min(lo + self.batch_rows, len(rows))
        return iter(rows[lo:hi]), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # exact historical range replay — the recovery path
        return iter(self._rows_cached()[start["row"] : end["row"]])


class ParquetReplayDataSource(DataSource):
    """spark.readStream.format("parquet_replay").option("path", ...)
    .option("batch_rows", n)."""

    @classmethod
    def name(cls) -> str:
        return "parquet_replay"

    def schema(self) -> StructType:
        import pyarrow.parquet as pq

        sch = pq.read_schema(self.options["path"])
        return StructType([_spark_field(f.name, f.type) for f in sch])

    def simpleStreamReader(self, schema: StructType):
        return ParquetReplayStreamReader(self.options)


def register_replay_source(spark) -> None:
    """Register on EXACTLY this session via the active-session-pinned
    helper — pyspark's plain register routes through the JVM's ACTIVE
    session, which made clone-side registration land on the parent
    (and the clone's .load() then fail with DATA_SOURCE_NOT_FOUND).
    Root cause + fix: session.register_python_datasource."""
    from clean_census_acs_data_spark.session import register_python_datasource

    register_python_datasource(spark, ParquetReplayDataSource)
