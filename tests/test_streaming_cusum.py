"""Semantics + determinism tests for the streaming CUSUM monitor (the
rows-only streaming entry's evidence, same discipline as the
sessionizer and rate limiter in tests/test_streaming.py)."""

from __future__ import annotations

import pandas as pd

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.streaming.stateful import (
    cusum_events_availablenow,
)

SF = "/root/testdata/sf0.001"
K, H = 26_000, 100_000


def _collect(spark, n_splits):
    df = cusum_events_availablenow(
        spark, SF, k_cents=K, h_cents=H, n_splits=n_splits
    )
    return sorted(
        (r.event_type, r.ts, r.value_cents, r.cusum_cents, r.alarm)
        for r in df.collect()
    )


def _closed_form(spark):
    """Batch reference: the exact stateful recursion in pandas over
    event-time order — what the stream must reproduce regardless of
    micro-batch boundaries."""
    ev = load_table(spark, SF, "events").toPandas()
    ev["value_cents"] = (ev["value"] * 100).round().astype("int64")
    out = []
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        s = 0
        for _, row in g.iterrows():
            s = max(0, s + int(row.value_cents) - K)
            out.append((et, row.ts.to_pydatetime(), int(row.value_cents), s, s > H))
    return sorted(out)


def test_stream_matches_batch_recursion(spark):
    got = _collect(spark, n_splits=2)
    ref = _closed_form(spark)
    assert len(got) == len(ref)
    # compare everything except exact tie ordering *within* identical
    # (type, ts): the kernel's stable event-time sort resolves ties by
    # batch arrival, the reference by event_id — cusum values can swap
    # between tied rows. The multiset of rows must still be identical.
    assert got == ref or sorted(got) == sorted(ref)


def test_stream_is_replay_deterministic(spark):
    assert _collect(spark, n_splits=2) == _collect(spark, n_splits=2)


def test_batch_boundaries_do_not_change_output(spark):
    """State must carry across micro-batches exactly: 1-split and
    3-split replays of the same events produce identical rows."""
    assert _collect(spark, n_splits=1) == _collect(spark, n_splits=3)


def test_alarm_consistency(spark):
    for _, _, _, s, alarm in _collect(spark, n_splits=2):
        assert s >= 0
        assert alarm == (s > H)
