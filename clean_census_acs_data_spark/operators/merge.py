"""Batch MERGE (upsert/delete) and SCD2 history — the table-maintenance
operators every warehouse pipeline needs (the reference's closest analog
is its truncate-and-reload DDL, Test_census_tract.py:268-282; MERGE is
what replaces that full rewrite at scale).

``merge_upsert`` is copy-on-write MERGE semantics as a pure DataFrame
op: one full-outer shuffle join on the key, conditional column
resolution. Matched keys take the change row's values (or are dropped
when the change is a delete), unmatched base rows pass through,
unmatched change rows insert. With the base bucketed on the key this
is a single co-located join at any scale; table formats (Delta/Iceberg)
add file-level pruning on top, but the row-level semantics are exactly
this plan.

``scd2_from_events`` builds a type-2 slowly-changing-dimension history
(validity intervals) from a change log with one LEAD window — the
standard warehouse historization pattern."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE ``changes`` into ``base`` on ``key``:

    - matched → the change row's non-key columns win (columns present
      only in base pass through unchanged);
    - not matched by target → insert the change row (base-only columns
      NULL);
    - not matched by source → keep the base row;
    - ``delete_col`` (boolean on changes): matched + true → row removed.

    ``changes`` must be unique per key (pre-compact with latest_by_key
    for CDC streams) — enforced downstream by the full-outer join
    producing duplicate keys otherwise.
    """
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    if delete_col is not None:
        joined = joined.where(
            ~F.coalesce(F.col(f"c.{delete_col}"), F.lit(False))
        )
    base_cols = base.columns
    change_cols = set(changes.columns) - {key} - ({delete_col} if delete_col else set())
    out = [
        F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key)
    ]
    for col in base_cols:
        if col == key:
            continue
        if col in change_cols:
            # matched or insert → change value; base-only → base value.
            # The change side decides via ITS key (NULL ⇔ no change row).
            out.append(
                F.when(F.col(f"c.{key}").isNotNull(), F.col(f"c.{col}"))
                .otherwise(F.col(f"b.{col}"))
                .alias(col)
            )
        else:
            out.append(F.col(f"b.{col}").alias(col))
    for col in changes.columns:
        if col not in base_cols and col != key and col != delete_col:
            out.append(F.col(f"c.{col}").alias(col))
    return joined.select(*out)


def scd2_from_events(
    changes: DataFrame,
    *,
    key: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    value_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Type-2 history from a change log: each change opens a validity
    interval [ts, next change ts); the latest change per key stays open
    (valid_to NULL, is_current true). One window shuffle on the key;
    the ordering gets a unique tiebreak so intervals are deterministic
    even with equal timestamps."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    lead_ts = F.lead(ts_col).over(w)
    return changes.select(
        key,
        *value_cols,
        F.col(ts_col).alias("valid_from"),
        lead_ts.alias("valid_to"),
        lead_ts.isNull().alias("is_current"),
    )
