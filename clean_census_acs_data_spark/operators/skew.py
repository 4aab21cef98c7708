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
    salt = (salt_col % salt_buckets).alias("__salt")
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
