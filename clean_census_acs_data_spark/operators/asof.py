"""As-of join and bounded range join — operators Spark lacks natively,
built as compositions of existing DataFrame ops (no UDFs).

as-of join (``last value at or before t``): the scalable technique is
NOT a range self-join (which explodes) but union→sort→carry-forward:

    1. tag right rows 0, left rows 1; union by name
    2. one shuffle: partition by the equality key, sort by (ts, tag)
    3. last(right_payload, ignorenulls=True) over an unbounded-preceding
       window carries the most recent right row onto every left row
    4. keep tag==1

One shuffle + one sort, O(n) state — survives any scale and any key
skew AQE can handle. Right rows sort before left at equal ts (tag 0<1),
giving `>=` as-of semantics.

range join (``count right rows in (t-Δ, t)``): bucketize time into
Δ-width buckets; each left row probes buckets {b-1, b}; the join is an
equi-join on (key, bucket) — never an unbounded inequality join — then
an exact filter. Shuffle is O(left·2 + right).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] = (),
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row gains one right row for the same
    key (NULLs if none) — with ``direction="backward"`` the greatest
    right_ts <= left_ts (most recent at-or-before), with ``"forward"``
    the smallest right_ts >= left_ts (earliest at-or-after). Right
    payload columns come back prefixed ``asof_``; the matched right
    timestamp is ``asof_ts``.

    Same single-shuffle union-sort-carry plan in both directions; only
    the tag order (which side wins ties) and the carry window flip:
    backward carries the last right row from the preceding frame,
    forward the first right row from the following frame."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload = list(right_payload)
    # backward (>=): right rows sort BEFORE left at equal ts so an
    # equal-ts right row is inside the preceding frame. forward (<=):
    # right rows sort AFTER left so an equal-ts right row is inside
    # the following frame.
    right_tag, left_tag = (0, 1) if direction == "backward" else (1, 0)
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        F.struct(F.col(right_ts).alias("asof_ts"), *[F.col(c).alias(f"asof_{c}") for c in payload]).alias(
            "__rp"
        ),
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(left_tag).alias("__tag"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lp"),
    )
    r = r.withColumn("__lp", F.lit(None).cast(l.schema["__lp"].dataType))
    u = r.unionByName(l)
    base = Window.partitionBy("__k").orderBy("__ts", "__tag")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = F.last("__rp", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = F.first("__rp", ignorenulls=True).over(w)
    carried = u.withColumn("__match", carry)
    out = carried.where(F.col("__tag") == left_tag).select("__lp.*", "__match.*")
    return out


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_us: int = 3_600_000_000,
    out_col: str = "n_in_range",
) -> DataFrame:
    """For each left row, count right rows with the same key and
    right_ts strictly inside (left_ts - window, left_ts). Bucketed
    equi-join: right rows land in bucket floor(us/window); each left row
    probes its own and the previous bucket."""
    lt = F.unix_micros(F.col(left_ts))
    rt = F.unix_micros(F.col(right_ts))
    # F.floor on both sides: integer % truncates toward zero, so pre-epoch
    # (negative-µs) timestamps would land in a bucket one higher than the
    # left probe's floor-bucket and matches would be silently missed
    r = right.select(
        F.col(key).alias("__k"), rt.alias("__rus"),
        F.floor(rt / window_us).cast("long").alias("__bucket"),
    )
    # unique per-row surrogate BEFORE the explode: grouping on left
    # columns alone would collapse fully-identical left rows into one
    # output row with a combined count
    l = left.withColumn("__lid", F.monotonically_increasing_id()).withColumn(
        "__lus", lt
    ).withColumn(
        "__bucket_probe",
        F.explode(
            F.array(
                (F.floor(F.col("__lus") / window_us) - 1).cast("long"),
                F.floor(F.col("__lus") / window_us).cast("long"),
            )
        ),
    )
    joined = l.join(
        r,
        (l["__bucket_probe"] == r["__bucket"])
        & (F.col(key) == F.col("__k"))
        & (F.col("__rus") > F.col("__lus") - F.lit(window_us))
        & (F.col("__rus") < F.col("__lus")),
        "left",
    )
    group_cols = [c for c in left.columns]
    counted = (
        joined.groupBy("__lid", *group_cols)
        .agg(F.count("__rus").alias("__n"))
        # each left row appears twice (two probe buckets) pre-join; the
        # group-by on the surrogate collapses exactly those two, and
        # count("__rus") ignores the NULLs from unmatched probes
        .drop("__lid")
        .withColumnRenamed("__n", out_col)
    )
    return counted
