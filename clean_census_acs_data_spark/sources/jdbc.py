"""JDBC warehouse sink — the reference's Redshift CREATE TABLE +
COPY path (Test_census_tract.py:225-243,268-282) as a Spark JDBC
writer.

The reference hand-writes DDL (VARCHAR(255) dimensions, BIGINT
measures, DISTSTYLE EVEN, SORTKEY(state_fips, county, tract)) and bulk
loads via S3 COPY. Spark's native equivalent is
``df.write.jdbc(...)`` with ``createTableColumnTypes`` carrying the
column-type DDL fragment and ``createTableOptions`` carrying the
trailing physical-layout clause — the table Spark creates matches the
reference's DDL, and the write itself runs one INSERT batch per
partition (the distributed analog of COPY's parallel slices; a real
Redshift deployment would still stage via S3+COPY, which is the
``write_warehouse_layout`` + COPY path, but the JDBC form completes
the connector surface and is the right path for Postgres-protocol
warehouses).

No warehouse exists in the sandbox, so ``plan_jdbc_write`` is split
out pure: it resolves (url, table, options) without touching the
network, and ``write_jdbc`` applies it. Tests assert the generated
DDL/options; a live run only needs a reachable url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)

# Spark type → warehouse DDL type, mirroring the reference's choices:
# VARCHAR(255) for every string dimension, BIGINT for measures
# (Test_census_tract.py:228-233).
_DDL_TYPES: list[tuple[type, str]] = [
    (StringType, "VARCHAR(255)"),
    (LongType, "BIGINT"),
    (IntegerType, "INTEGER"),
    (DoubleType, "DOUBLE PRECISION"),
    (FloatType, "REAL"),
    (DateType, "DATE"),
    (TimestampType, "TIMESTAMP"),
]


def ddl_type_for(dt: DataType) -> str | None:
    for spark_t, ddl in _DDL_TYPES:
        if isinstance(dt, spark_t):
            return ddl
    return None  # let Spark's JDBC dialect pick


def create_table_column_types(
    df: DataFrame, overrides: dict[str, str] | None = None
) -> str:
    """The ``createTableColumnTypes`` fragment: `"col TYPE, col TYPE"`.
    Column order follows the DataFrame schema; ``overrides`` pins
    specific columns (e.g. a wide NAME column to VARCHAR(512))."""
    overrides = overrides or {}
    parts = []
    for f in df.schema.fields:
        ddl = overrides.get(f.name) or ddl_type_for(f.dataType)
        if ddl:
            # quote names with spaces/case the way Spark's JDBC writer does
            name = f'`{f.name}`' if (" " in f.name or not f.name.isidentifier()) else f.name
            parts.append(f"{name} {ddl}")
    return ", ".join(parts)


def plan_jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "overwrite",
    column_types: dict[str, str] | None = None,
    sort_cols: tuple[str, ...] = ("STATE_FIPS", "COUNTY", "TRACT"),
    diststyle: str | None = "EVEN",
    num_partitions: int = 8,
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Resolve the full JDBC writer option map (pure — no I/O).

    - ``createTableColumnTypes``: the reference's column DDL.
    - ``createTableOptions``: DISTSTYLE/SORTKEY layout clause
      (Test_census_tract.py:236-237) appended to CREATE TABLE.
    - ``numPartitions``/``batchsize``: write parallelism — one JDBC
      connection per partition, batched inserts.
    """
    present_sort = [c for c in sort_cols if c in df.columns]
    layout_parts = []
    if diststyle:
        layout_parts.append(f"DISTSTYLE {diststyle}")
    if present_sort:
        layout_parts.append(f"SORTKEY ({', '.join(present_sort)})")
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "numPartitions": str(num_partitions),
        "batchsize": str(batch_size),
        "createTableColumnTypes": create_table_column_types(df, column_types),
    }
    if layout_parts:
        opts["createTableOptions"] = " ".join(layout_parts)
    for k, v in (properties or {}).items():
        opts[k] = v
    opts["__mode__"] = mode
    return opts


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    **kwargs,
) -> dict[str, str]:
    """Execute the planned JDBC write. Repartitions to ``numPartitions``
    (matching the reference's even-distribution intent) and sorts within
    partitions on the sort key so the warehouse receives pre-ordered
    batches. Returns the resolved option map (for logging/audit)."""
    opts = plan_jdbc_write(df, url, table, **kwargs)
    mode = opts.pop("__mode__")
    sort_cols = kwargs.get("sort_cols", ("STATE_FIPS", "COUNTY", "TRACT"))
    present_sort = [c for c in sort_cols if c in df.columns]
    out = df.repartition(int(opts["numPartitions"]))
    if present_sort:
        out = out.sortWithinPartitions(*present_sort)
    writer = out.write.format("jdbc").mode(mode)
    for k, v in opts.items():
        writer = writer.option(k, v)
    writer.save()
    return opts
