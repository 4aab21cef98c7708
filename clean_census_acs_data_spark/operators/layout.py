"""Multi-dimensional data layout: Morton (Z-order) interleaving.

Sorting a table by one column gives parquet row-group min/max skipping
on that column only; interleaving the bits of two (or more) columns
into a Morton code and sorting by it clusters rows so that range
predicates on EITHER dimension prune row groups — the technique behind
Delta/Iceberg Z-ORDER table maintenance, here as a plain column
expression + sorted write (no table format required).

The code is pure integer arithmetic (shifts/masks composed per bit),
so it stays inside whole-stage codegen and is reproducible anywhere —
the SQL-generated twin of the expression is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(a: Column, b: Column, *, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of non-negative ints ``a`` (even
    positions) and ``b`` (odd positions) into a single long. Inputs are
    masked to ``bits`` bits first, so out-of-range values wrap rather
    than collide across dimensions."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    mask = (1 << bits) - 1
    am = F.pmod(a.cast("long"), F.lit(mask + 1))
    bm = F.pmod(b.cast("long"), F.lit(mask + 1))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(am, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(bm, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def morton_code_sql(a: str, b: str, *, bits: int = 16) -> str:
    """The identical Morton interleave as engine-portable SQL text
    (integer divisions/mods — no shift operators needed), for oracle
    parity and for engines without bit-shift builtins."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    m = 1 << bits
    # wrap inputs to the bit budget, mirroring morton_code's pmod —
    # double-mod so negative inputs wrap into [0, m) like F.pmod does
    # (plain SQL % keeps the dividend's sign)
    aw = f"(((({a}) % {m}) + {m}) % {m})"
    bw = f"(((({b}) % {m}) + {m}) % {m})"
    terms = []
    for i in range(bits):
        terms.append(f"(({aw} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({bw} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return f"CAST({' + '.join(terms)} AS BIGINT)"


def write_zorder_layout(
    df: DataFrame,
    path: str,
    *,
    cols: tuple[str, str],
    bits: int = 16,
    num_files: int = 8,
    fmt: str = "parquet",
) -> None:
    """Z-ordered write: repartition for even file sizes, sort within
    partitions by the Morton code of ``cols`` so parquet row-group
    min/max statistics prune on both dimensions. The Z-ORDER BY analog
    for plain parquet tables."""
    code = morton_code(F.col(cols[0]), F.col(cols[1]), bits=bits)
    writer = (
        df.withColumn("__z", code)
        .repartition(num_files)
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
    )
    if fmt == "csv":
        writer.option("header", True).csv(path)
    else:
        writer.parquet(path)
