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
    BooleanType,
    LongType,
    StringType,
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
    import numpy as np

    gap_us = gap_ms * 1000

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
            # direct construction from 1-element numpy arrays with
            # datetime64[us] views (~143 µs/call, CoW-safe: no in-place
            # writes into a copied frame — pandas 3 copy-on-write makes
            # Series.to_numpy() views read-only)
            yield pd.DataFrame(
                {
                    "user_id": np.array([user_id], dtype=np.int64),
                    "session_start": np.array([start_us], dtype=np.int64).view(
                        "datetime64[us]"
                    ),
                    "session_end": np.array([end_us], dtype=np.int64).view(
                        "datetime64[us]"
                    ),
                    "n_events": np.array([n], dtype=np.int64),
                    "value_cents": np.array([cents], dtype=np.int64),
                },
                copy=False,
            )
            return

        cur = state.get if state.exists else None
        # Arrow hands the key's micro-batch as multiple chunks with no
        # ordering guarantee ACROSS chunks: sorting each independently
        # lets a later chunk carry earlier timestamps past the gap check
        # (negative gap) and corrupt session bounds. Accumulate all
        # chunks, sort once, then fold — VECTORIZED: a per-row Python
        # loop here is the per-event hot path (100k events/batch at
        # sf0.1 ⇒ seconds of pure interpreter time; at cluster scale,
        # the whole operator). Session boundaries are diff(ts) > gap,
        # segment aggregates come from cumsum differences.
        parts = [pdf for pdf in pdfs if not pdf.empty]
        out = None
        if parts:
            pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
            # normalize to ns first: pandas may hand us datetime64[us] or [ns]
            ts_us = (
                pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
                // 1000
            )
            cents = pdf["value_cents"].to_numpy(dtype=np.int64)
            order = np.argsort(ts_us, kind="stable")
            ts_us = ts_us[order]
            cents = cents[order]
            m = len(ts_us)
            # seg_brk[i] True ⇒ event i opens a new segment. Index 0 is
            # ALWAYS a structural segment start (so `starts` always
            # contains 0 and the fold below can index s_*[0]); whether
            # that first segment CONTINUES the open session from state
            # is a separate decision (`continues`) — conflating the two
            # mis-segmented (or crashed on) batches whose first event
            # was within the gap of carried state.
            seg_brk = np.empty(m, dtype=bool)
            seg_brk[0] = True
            np.greater(np.diff(ts_us), gap_us, out=seg_brk[1:])
            starts = np.flatnonzero(seg_brk)  # first event of each segment
            ends = np.append(starts[1:], m)  # one past last event
            csum = np.concatenate(([0], np.cumsum(cents)))
            s_start = ts_us[starts]
            s_end = ts_us[ends - 1]
            s_n = (ends - starts).astype(np.int64)
            s_cents = csum[ends] - csum[starts]
            prev = cur  # open session carried in from state (or None)
            continues = prev is not None and (ts_us[0] - prev[1]) <= gap_us
            carry_closed = prev is not None and not continues
            if continues:
                # first segment continues the open session from state
                s_start[0] = prev[0]
                s_n[0] += prev[2]
                s_cents[0] += prev[3]
            # every segment but the last closes NOW (gap already
            # exceeded within observed data); the last becomes state
            k = len(starts) - 1
            cur = (int(s_start[k]), int(s_end[k]), int(s_n[k]), int(s_cents[k]))
            if k or carry_closed:
                if carry_closed:
                    # prepend the carried-over session closed by the gap
                    prev_start, prev_end, prev_n, prev_cents = prev
                    s_start = np.concatenate(([prev_start], s_start[:k]))
                    s_end = np.concatenate(([prev_end], s_end[:k]))
                    s_n = np.concatenate(([prev_n], s_n[:k]))
                    s_cents = np.concatenate(([prev_cents], s_cents[:k]))
                else:
                    s_start, s_end = s_start[:k], s_end[:k]
                    s_n, s_cents = s_n[:k], s_cents[:k]
                # datetime64[us] views, not pd.to_datetime: same values,
                # ~2.7× cheaper per group call (measured 388→143 µs)
                out = pd.DataFrame(
                    {
                        "user_id": np.full(len(s_start), user_id, dtype=np.int64),
                        "session_start": s_start.astype(np.int64).view("datetime64[us]"),
                        "session_end": s_end.astype(np.int64).view("datetime64[us]"),
                        "n_events": s_n,
                        "value_cents": s_cents,
                    },
                    copy=False,
                )
        if cur is not None:
            state.update(cur)
            # close via event-time timeout once the watermark passes
            # session_end + gap
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_ms)
        if out is not None:
            yield out

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


def _ts_bounds_us(sf_dir: str) -> tuple[int | None, int | None]:
    """(min, max) of events.ts in µs from parquet row-group statistics —
    a driver-side footer read, no Spark job. Returns (None, None) when
    stats are absent or the ts column isn't a timestamp/int96-free type
    the footer can bound exactly."""
    import os

    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata
        idx = md.schema.names.index("ts")
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None, None
            mn, mx = st.min, st.max
            if hasattr(mn, "timestamp"):  # datetime → µs
                from datetime import timezone

                # naive stats are NTZ wall-clock; the session tz is
                # pinned UTC, so naive-as-UTC matches unix_micros(ts)
                if mn.tzinfo is None:
                    mn = mn.replace(tzinfo=timezone.utc)
                    mx = mx.replace(tzinfo=timezone.utc)
                mn = int(mn.timestamp() * 1_000_000)
                mx = int(mx.timestamp() * 1_000_000)
            elif isinstance(mn, int):  # TIMESTAMP(NANOS) read as long
                mn, mx = mn // 1000, mx // 1000
            else:
                return None, None
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        return lo, hi
    except Exception:
        return None, None


# (SparkContext id, sf_dir, n_splits, extra_cols) -> staged dir.
# Staging is a full events scan + partitioned write; the sessionizer and
# rate limiter share an identical signature, so memoizing saves one
# redundant Spark write job per bench/correctness sweep (and every
# repeat invocation). Keyed on the context id so a fresh JVM re-stages
# (temp dirs don't outlive the machine, but a long-lived session must
# never read batches staged by a dead context's conf).
_STAGE_CACHE: dict = {}


def staged_events_dir(
    spark,
    sf_dir: str,
    n_splits: int,
    *,
    extra_cols: tuple[str, ...] = (),
) -> str:
    """Memoized :func:`stage_event_batches` — returns a staging dir that
    is built at most once per (SparkContext, sf_dir, n_splits,
    extra_cols) and shared by every stateful-streaming consumer."""
    import os
    import tempfile

    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        n_splits,
        tuple(extra_cols),
    )
    stage = _STAGE_CACHE.get(key)
    # Reuse only if the staged batch files actually survive: a temp
    # reaper (or partial cleanup) can empty the dir while leaving it in
    # place, and every consumer reads b0.parquet first for its schema —
    # a dir-only check would hand consumers a confusing read failure.
    # The full complement must be present, not just b0: a half-reaped
    # stage replays fewer micro-batches and silently changes watermark
    # firing order. Falls through to re-staging otherwise.
    if stage is not None and all(
        os.path.isfile(os.path.join(stage, f"b{i}.parquet"))
        for i in range(n_splits)
    ):
        return stage
    stage = tempfile.mkdtemp(prefix="stateful_stage_")
    stage_event_batches(spark, sf_dir, stage, n_splits, extra_cols=extra_cols)
    _STAGE_CACHE[key] = stage
    return stage



# stage dir -> staged-batch schema: the three stateful consumers each
# ran a batch footer read of b0.parquet per call; the staged files are
# written once per (session, sf_dir, splits) so the schema is as
# immutable as the stage itself.
_STAGE_SCHEMA_MEMO: dict = {}


def _staged_schema(spark, stage: str):
    schema = _STAGE_SCHEMA_MEMO.get(stage)
    if schema is None:
        schema = spark.read.parquet(stage + "/b0.parquet").schema
        _STAGE_SCHEMA_MEMO[stage] = schema
    return schema


def stage_event_batches(
    spark,
    sf_dir: str,
    stage_dir: str,
    n_splits: int = 3,
    *,
    extra_cols: tuple[str, ...] = (),
) -> None:
    """Split the events table into ``n_splits`` time-ordered parquet
    files under ``stage_dir`` with increasing mtimes, so a file stream
    with maxFilesPerTrigger=1 replays them as successive micro-batches
    in event-time order — each batch advances the watermark and fires
    the previous batches' session timeouts deterministically.
    ``extra_cols`` appends further event columns (e.g. event_type for
    the CUSUM monitor) without changing the default staging schema the
    sessionizer/rate-limiter consumers rely on."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from clean_census_acs_data_spark.functions import cents
    from clean_census_acs_data_spark.io import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id", "ts", cents("value").alias("value_cents"), *extra_cols
        )
        # Pin the pre-r5 semantics explicitly: the old per-split range
        # filters (ts >= a AND ts < b) dropped NULL-ts rows; the bucket
        # expression below would route them to b0 instead (greatest
        # skips NULLs). Current fixtures have no NULL ts, but a nullable
        # source staged here must not silently change batch membership.
        # (ADVICE r5 #3.)
        .where(F.col("ts").isNotNull())
    )
    # SINGLE pass over events: bounds from the parquet FOOTER stats
    # (driver-side metadata read, no Spark job — exactly what a scan
    # with partition pruning would consult) + one partitioned write
    # (the previous shape ran one filtered scan+write PER split — 4 jobs
    # and n_splits full scans of the table). Batch id is an integer
    # time-bucket; hash-repartitioning on it gives exactly one file per
    # batch directory.
    lo_us, hi_us = _ts_bounds_us(sf_dir)
    if lo_us is None:  # stats missing → one bounds job, same semantics
        lo_us, hi_us = ev.agg(
            F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
        ).collect()[0]
    span_us = (hi_us - lo_us) // n_splits + 1  # ⇒ bucket ids in [0, n_splits)
    tmp = os.path.join(stage_dir, "_staged")
    (
        ev.withColumn(
            "b",
            F.least(  # clamp: footer-stat bounds are authoritative for
                F.lit(n_splits - 1),  # pruning but defensive here
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.unix_micros("ts") - F.lit(lo_us)) / F.lit(span_us)
                    ).cast("int"),
                ),
            ),
        )
        .repartition(n_splits, "b")
        .write.mode("overwrite")
        .partitionBy("b")
        .parquet(tmp)
    )
    for i in range(n_splits):
        parts = glob.glob(os.path.join(tmp, f"b={i}", "part-*.parquet"))
        if not parts:  # empty time bucket (tiny fixtures): fewer batches
            continue
        dst = os.path.join(stage_dir, f"b{i}.parquet")
        shutil.move(parts[0], dst)
        os.utime(dst, (1_000_000_000 + i * 10, 1_000_000_000 + i * 10))
    shutil.rmtree(tmp)


def sessionize_events_availablenow(
    spark,
    sf_dir: str,
    *,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    n_splits: int = 1,
) -> DataFrame:
    """End-to-end: stage events into time-ordered file batches, stream
    them one-file-per-trigger through the stateful sessionizer, collect
    closed sessions from a memory sink. Deterministic: batch boundaries
    are fixed time splits, so the watermark trajectory (and therefore
    which sessions emit) is the same on every run.

    n_splits=1 (⇒ 2 triggers: one data batch + the final no-data
    timeout batch, which still fires event-time timeouts because the
    watermark advances after the data batch) is the registered default
    since r10: the emitted row set is SPLIT-INVARIANT — the staged
    batches are fixed time splits, so only the FINAL watermark decides
    the trailing session, which is exactly the closed form the oracle
    states — verified 1≡2≡3 row-identical at sf0.001 and sf0.01, and
    the interleaved cold A/B at sf0.1 measured 5.5/6.4 s (2 splits) →
    5.2/4.3 s (1 split). Cross-batch state carry and multi-batch
    timeout firing stay covered by tests, which pass n_splits
    explicitly (test_stateful_sessionizer_*). Per-trigger cost is
    ~0.75 s of micro-batch machinery (replan + state-store
    load/commit) plus ~0.36 ms per active key in the Arrow state
    serializer, so extra batches buy no additional semantic coverage,
    only fixed overhead."""
    from clean_census_acs_data_spark.streaming.windows import (
        _run_to_memory,
        _streaming_scope,
    )

    # staged WITH event_type so all three stateful consumers (sessions,
    # rate limiter, CUSUM — which needs the column) share ONE memoized
    # staging pass per session instead of two; the extra column is
    # inert for consumers that don't select it (r9: saves a full
    # events scan + partitioned write per bench/correctness sweep).
    stage = staged_events_dir(
        spark, sf_dir, n_splits, extra_cols=("event_type",)
    )
    # 16 state partitions: unlike the JVM streaming entries this one is
    # bound by per-GROUP serializer cost in the Python state workers, so
    # it wants MORE parallelism than the 8-partition default (measured
    # at sf0.1 on local[32]: sp=4 ≈ 5.8-7.0 s, sp=8 ≈ 4.2-4.8 s,
    # sp=16 ≈ 3.85-3.95 s end-to-end incl. staging). Applied on a
    # session clone so the override is scoped to this one plan.
    spark = _streaming_scope(spark, state_partitions=16)
    schema = _staged_schema(spark, stage)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "b*.parquet")
        .parquet(stage)
    )
    return _run_to_memory(
        sessionize_with_state(stream, gap=gap, watermark=watermark)
    )


# ---------------------------------------------------------------------------
# per-entity token-bucket rate limiter (second custom stateful operator)
# ---------------------------------------------------------------------------

RATE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value_cents", LongType()),
        StructField("tokens_left_micro", LongType()),
    ]
)

# state: (tokens_micro, last_ts_us); 1 token = 1_000_000 µtokens
RATE_STATE_SCHEMA = "tokens_micro LONG, last_ts_us LONG"


def _rate_limit_fn(capacity_micro: int, accrual_div: int):
    """Token bucket per key: integer µtoken arithmetic (1 token =
    10^6 µtokens; accrual = elapsed_µs // accrual_div) — exact and
    replay-deterministic, no float drift. The admission recurrence
    (tokens_i = min(cap, tokens_{i-1} + accrual) − admit_i) is
    sequential by nature; the loop runs per KEY per batch over that
    key's events only."""
    import numpy as np

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # no timeouts registered — defensive
            state.remove()
            return
        tokens, last_us = (
            state.get if state.exists else (capacity_micro, None)
        )
        parts = [pdf for pdf in pdfs if not pdf.empty]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        ts_us = (
            pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 1000
        )
        cents = pdf["value_cents"].to_numpy(dtype=np.int64)
        order = np.argsort(ts_us, kind="stable")
        ts_us, cents = ts_us[order], cents[order]
        adm_ts, adm_cents, adm_left = [], [], []
        for t, v in zip(ts_us, cents):
            # Accrual clock only moves FORWARD: a late-but-within-
            # watermark event arriving in a later micro-batch has
            # t <= last_us — crediting it and rewinding last_us would
            # double-count the same elapsed interval on the next event
            # (over-admission). Late events still spend tokens at the
            # current balance. (ADVICE r5 #1; regression test in
            # tests/test_streaming.py::test_rate_limiter_late_event.)
            if last_us is None:
                last_us = int(t)
            elif t > last_us:
                tokens = min(
                    capacity_micro, tokens + (int(t) - last_us) // accrual_div
                )
                last_us = int(t)
            if tokens >= 1_000_000:
                tokens -= 1_000_000
                adm_ts.append(t)
                adm_cents.append(v)
                adm_left.append(tokens)
        state.update((int(tokens), int(last_us)))
        if adm_ts:
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(adm_ts), user_id, dtype=np.int64),
                    "ts": np.asarray(adm_ts, dtype=np.int64).view("datetime64[us]"),
                    "value_cents": np.asarray(adm_cents, dtype=np.int64),
                    "tokens_left_micro": np.asarray(adm_left, dtype=np.int64),
                },
                copy=False,
            )

    return fn


def rate_limit_with_state(
    events: DataFrame,
    *,
    capacity: int = 5,
    refill_period: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Admit at most ``capacity`` burst events per user, refilling one
    token per ``refill_period`` of EVENT time — the per-entity
    throttling shape (API quotas, abuse control, crawl politeness)
    that needs arbitrary state: the admission decision depends on the
    running token balance, which no built-in windowed aggregate can
    express. Emits admitted events with their post-admission balance."""
    unit_ms = {"minutes": 60_000, "minute": 60_000, "hours": 3_600_000, "hour": 3_600_000}
    qty, unit = refill_period.split()
    period_us = int(qty) * unit_ms[unit] * 1000
    # accrual_div: µs of elapsed time per µtoken = period_us / 1e6
    accrual_div = max(1, period_us // 1_000_000)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _rate_limit_fn(capacity * 1_000_000, accrual_div),
            outputStructType=RATE_SCHEMA,
            stateStructType=RATE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def rate_limit_events_availablenow(
    spark,
    sf_dir: str,
    *,
    capacity: int = 5,
    refill_period: str = "10 minutes",
    n_splits: int = 1,
) -> DataFrame:
    """End-to-end: the staged deterministic micro-batch replay (same
    harness as the sessionizer) through the token-bucket limiter.

    n_splits=1 since r10: time-split staging means later batches only
    carry later timestamps, so the per-key admission fold visits
    events in the same order at any split count — output verified
    1≡2≡3 row-identical at sf0.001/sf0.01 (pinned by
    test_rate_limiter_split_invariance) and the cold A/B at sf0.1
    measured 2.7/3.0 → 1.6/1.7 s. Cross-batch state carry stays
    covered by tests that pass n_splits explicitly."""
    import tempfile

    from clean_census_acs_data_spark.streaming.windows import (
        _run_to_memory,
        _streaming_scope,
    )

    # staged WITH event_type so all three stateful consumers (sessions,
    # rate limiter, CUSUM — which needs the column) share ONE memoized
    # staging pass per session instead of two; the extra column is
    # inert for consumers that don't select it (r9: saves a full
    # events scan + partitioned write per bench/correctness sweep).
    stage = staged_events_dir(
        spark, sf_dir, n_splits, extra_cols=("event_type",)
    )
    spark = _streaming_scope(spark, state_partitions=16)
    schema = _staged_schema(spark, stage)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "b*.parquet")
        .parquet(stage)
    )
    return _run_to_memory(
        rate_limit_with_state(stream, capacity=capacity, refill_period=refill_period)
    )


# ---------------------------------------------------------------------------
# per-metric streaming CUSUM monitor (third custom stateful operator)
# ---------------------------------------------------------------------------

CUSUM_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value_cents", LongType()),
        StructField("cusum_cents", LongType()),
        StructField("alarm", BooleanType()),
    ]
)

# state: the running one-sided CUSUM statistic, in exact cents
CUSUM_STATE_SCHEMA = "s_cents LONG"


def _cusum_fn(k_cents: int, h_cents: int):
    """One-sided upper CUSUM per key: S_i = max(0, S_{i-1} + (v_i − k)),
    alarm when S > h. Exact integer cents — the statistic is the same
    recursion cusum_changepoint expresses in closed form for batch, so
    the streaming output is cross-checkable against the windowed twin
    (tests/test_streaming.py). The recursion is order-sequential per
    key; the loop runs per KEY per micro-batch over that key's events
    only (same cost model as the sessionizer/rate limiter)."""
    import numpy as np

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.hasTimedOut:  # no timeouts registered — defensive
            state.remove()
            return
        (s,) = state.get if state.exists else (0,)
        parts = [pdf for pdf in pdfs if not pdf.empty]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        ts_us = (
            pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 1000
        )
        cents = pdf["value_cents"].to_numpy(dtype=np.int64)
        # deterministic event-time order within the batch (staging
        # guarantees batches themselves are time-ordered)
        order = np.argsort(ts_us, kind="stable")
        ts_us, cents = ts_us[order], cents[order]
        out = np.empty(len(cents), dtype=np.int64)
        for i, v in enumerate(cents):
            s = s + int(v) - k_cents
            if s < 0:
                s = 0
            out[i] = s
        state.update((int(s),))
        yield pd.DataFrame(
            {
                "event_type": np.full(len(ts_us), event_type, dtype=object),
                "ts": ts_us.view("datetime64[us]"),
                "value_cents": cents,
                "cusum_cents": out,
                "alarm": out > h_cents,
            },
            copy=False,
        )

    return fn


def cusum_with_state(
    events: DataFrame,
    *,
    k_cents: int = 26_000,
    h_cents: int = 100_000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-metric CUSUM drift monitor: maintain the one-sided
    statistic S = max(0, S + (value − k)) per event_type and flag
    S > h — the alarm every metrics pipeline wants the moment a batch
    closes, not at end-of-day. The statistic depends on the running
    S, which no built-in windowed aggregate expresses; the batch twin
    (cusum_changepoint) proves the closed form, this operator carries
    it across unbounded micro-batches with exact integer state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _cusum_fn(k_cents, h_cents),
            outputStructType=CUSUM_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cusum_events_availablenow(
    spark,
    sf_dir: str,
    *,
    k_cents: int = 26_000,
    h_cents: int = 100_000,
    n_splits: int = 1,
) -> DataFrame:
    """End-to-end: the staged deterministic micro-batch replay (same
    harness as the sessionizer/rate limiter) through the CUSUM
    monitor. value_cents derives from the exact integer-cents cast of
    the event value.

    n_splits=1 since r10: the CUSUM recursion folds events in
    event-time order per key and time-split staging preserves that
    order at any split count — test_streaming_cusum pins 1≡3, and the
    cold A/B at sf0.1 measured 2.2/2.7 → 1.9/2.1 s."""
    from clean_census_acs_data_spark.streaming.windows import (
        _run_to_memory,
        _streaming_scope,
    )

    stage = staged_events_dir(
        spark, sf_dir, n_splits, extra_cols=("event_type",)
    )
    spark = _streaming_scope(spark, state_partitions=8)
    schema = _staged_schema(spark, stage)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "b*.parquet")
        .parquet(stage)
    )
    withcents = stream.select("event_type", "ts", "value_cents")
    return _run_to_memory(
        cusum_with_state(withcents, k_cents=k_cents, h_cents=h_cents)
    )
