"""Skew-resistant aggregation: two-stage salted group-by.

At 100 TB a single hot key (one viral document source, one degenerate
join key) can pin an entire aggregation on one reducer. Salting splits
each key into ``salt_buckets`` sub-keys for the first (partial)
aggregation, then re-aggregates the partials — the hot key's work
spreads across ``salt_buckets`` reducers at the cost of a second tiny
shuffle. AQE's skew handling covers joins; salting covers aggregations
whose partial-agg reduction factor is poor (e.g. count distinct-ish
payloads, collect-style aggs).

The salt must be deterministic for oracle checks — derived from a row
key, not rand(). For pure additive aggregates (sum/count/min/max) the
result is exactly the unsalted result."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    group_cols: Sequence[str],
    *,
    salt_col: Column,
    salt_buckets: int = 16,
    sum_exprs: dict[str, Column],
) -> DataFrame:
    """groupBy(group_cols) with sums/counts computed via a salted
    two-stage aggregation. ``sum_exprs`` maps output name → column to
    sum (exact integer columns for determinism). A ``__cnt`` count
    rides along as ``n_rows``."""
    # pmod, not %: Spark's % keeps the dividend's sign, so a negative
    # salt source (e.g. a hash) would yield salts in (-buckets, 0)
    salt = F.pmod(salt_col, F.lit(salt_buckets)).alias("__salt")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(
            *[F.sum(c).alias(f"__p_{name}") for name, c in sum_exprs.items()],
            F.count(F.lit(1)).alias("__p_cnt"),
        )
    )
    return stage1.groupBy(*group_cols).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in sum_exprs],
        F.sum("__p_cnt").alias("n_rows"),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    *,
    large_key: str,
    small_key: str,
    salt_col: Column,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the large side gets a deterministic salt in
    [0, salt_buckets); the small side is replicated once per salt value
    (explode of a literal sequence); the join key becomes
    (key, salt) — a hot key's rows now land on ``salt_buckets``
    reducers instead of one.

    Semantically identical to ``large.join(small, key, how)`` for
    inner/left joins (each large row matches exactly the replica
    carrying its own salt). Cost: small side inflates ×salt_buckets —
    acceptable precisely when the small side is small; for
    broadcast-able sides prefer F.broadcast (no shuffle at all), and
    for sort-merge joins of two large tables prefer AQE skew-join
    splitting (spark.sql.adaptive.skewJoin). Manual salting is the tool
    when the hot key is known and AQE's split granularity isn't enough.

    ``salt_col`` must be deterministic (derived from row content, not
    rand()) so results are reproducible and oracle-checkable."""
    # pmod, not %: a negative salt_col (e.g. xxhash64 output) under % gives
    # salts in (-buckets, 0) that match no replica — rows silently drop
    # from an inner join
    salted_large = large.withColumn("__salt", F.pmod(salt_col, F.lit(salt_buckets)).cast("int"))
    replicas = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    cond = (salted_large[large_key] == replicas[small_key]) & (
        salted_large["__salt"] == replicas["__salt"]
    )
    return salted_large.join(replicas, cond, how).drop(replicas["__salt"]).drop("__salt")
