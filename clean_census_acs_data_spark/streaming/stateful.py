"""Custom stateful streaming operator: per-user sessionization with
arbitrary state via ``applyInPandasWithState``.

Built-in ``session_window`` covers gap-based session *aggregation*;
this operator is the general form — the state is a user-defined struct
(session bounds, counts, integer value sum) updated per micro-batch,
with event-time timeouts closing sessions once the watermark passes
session_end + gap. That is the shape every custom streaming operator
takes (sessionization, per-entity rate limiting, online feature
accumulation) when the built-ins genuinely can't express it
(SURVEY.md §2B "Streaming" extension tier).

Scale notes: state lives in the executor state store partitioned by
group key (spark.sql.shuffle.partitions state partitions) — per-key
state here is O(1) (five scalars), so 10^9 users ≈ tens of GB across
a cluster, and the watermark timeout guarantees eviction. The Arrow
boundary batches whole key groups per micro-batch — no per-row Python.

Reference lineage: the reference has no streaming at all (SURVEY.md
§2B); its nearest analog is the sequential chunk loop
(Test_census_tract.py:342-344) = hand-rolled micro-batching.

API note: Spark 4 also offers transformWithStateInPandas (richer
state: ValueState/ListState/MapState + timers). Its Python driver
worker requires google.protobuf, which is unavailable in this
environment — probed and gated out; applyInPandasWithState expresses
the same sessionization with a single state struct.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)

# state tuple: (start_us, end_us, n_events, value_cents)
STATE_SCHEMA = "start_us LONG, end_us LONG, n_events LONG, value_cents LONG"


def _sessionize_fn(gap_ms: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed end + gap: the session is closed — emit it
            start_us, end_us, n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "value_cents": [cents],
                }
            )
            return

        closed: list[tuple[int, int, int, int]] = []
        cur = state.get if state.exists else None
        # Arrow hands the key's micro-batch as multiple chunks with no
        # ordering guarantee ACROSS chunks: sorting each independently
        # lets a later chunk carry earlier timestamps past the gap check
        # (negative gap) and corrupt session bounds. Accumulate all
        # chunks, sort once, then fold.
        parts = [pdf for pdf in pdfs if not pdf.empty]
        if parts:
            pdf = pd.concat(parts, ignore_index=True).sort_values("ts")
            # normalize to ns first: pandas may hand us datetime64[us] or [ns]
            ts_us = (
                pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
            ).to_numpy()
            cents = pdf["value_cents"].to_numpy()
            for t, v in zip(ts_us, cents):
                if cur is None:
                    cur = (int(t), int(t), 1, int(v))
                elif t - cur[1] <= gap_ms * 1000:
                    cur = (cur[0], int(t), cur[2] + 1, cur[3] + int(v))
                else:
                    # gap exceeded within observed data: close the old
                    # session immediately (no need to wait for watermark)
                    closed.append(cur)
                    cur = (int(t), int(t), 1, int(v))
        if cur is not None:
            state.update(cur)
            # close via event-time timeout once the watermark passes
            # session_end + gap
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in closed],
                    "n_events": [n for _, _, n, _ in closed],
                    "value_cents": [c for _, _, _, c in closed],
                }
            )

    return fn


def sessionize_with_state(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Gap-based sessions per user with custom state. ``events`` must be
    a *streaming* DataFrame with columns (user_id LONG, ts TIMESTAMP,
    value_cents LONG). Emits one row per closed session; the trailing
    session of each user stays in state until the watermark passes it
    (append-mode semantics, same as the built-in windows)."""
    unit_ms = {"minutes": 60_000, "minute": 60_000, "hours": 3_600_000, "hour": 3_600_000}
    qty, unit = gap.split()
    gap_ms = int(qty) * unit_ms[unit]
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# deterministic multi-batch harness
# ---------------------------------------------------------------------------


def stage_event_batches(spark, sf_dir: str, stage_dir: str, n_splits: int = 3) -> None:
    """Split the events table into ``n_splits`` time-ordered parquet
    files under ``stage_dir`` with increasing mtimes, so a file stream
    with maxFilesPerTrigger=1 replays them as successive micro-batches
    in event-time order — each batch advances the watermark and fires
    the previous batches' session timeouts deterministically."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from clean_census_acs_data_spark.functions import cents
    from clean_census_acs_data_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", cents("value").alias("value_cents")
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / n_splits
    for i in range(n_splits):
        a, b = lo + i * span, lo + (i + 1) * span
        cond = (F.col("ts") >= F.lit(a)) & (
            (F.col("ts") <= F.lit(hi)) if i == n_splits - 1 else (F.col("ts") < F.lit(b))
        )
        tmp = os.path.join(stage_dir, f"_b{i}")
        ev.where(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = os.path.join(stage_dir, f"b{i}.parquet")
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_000_000_000 + i * 10, 1_000_000_000 + i * 10))


def sessionize_events_availablenow(
    spark,
    sf_dir: str,
    *,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    n_splits: int = 3,
) -> DataFrame:
    """End-to-end: stage events into time-ordered file batches, stream
    them one-file-per-trigger through the stateful sessionizer, collect
    closed sessions from a memory sink. Deterministic: batch boundaries
    are fixed time splits, so the watermark trajectory (and therefore
    which sessions emit) is the same on every run."""
    import tempfile

    from clean_census_acs_data_spark.streaming.windows import _run_to_memory

    stage = tempfile.mkdtemp(prefix="stateful_stage_")
    stage_event_batches(spark, sf_dir, stage, n_splits)
    schema = spark.read.parquet(f"{stage}/b0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "b*.parquet")
        .parquet(stage)
    )
    # default state partitions (8 via _run_to_memory): unlike the JVM
    # streaming entries this one is bound by per-GROUP pandas apply
    # cost in the Python state workers, so it wants the parallelism —
    # 4 partitions measured slower, not faster
    return _run_to_memory(sessionize_with_state(stream, gap=gap, watermark=watermark))
