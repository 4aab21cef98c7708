"""Property tests for the round-12 wave-8 gaps-and-islands batch.
Exact parity runs in tests/test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_rle_roundtrip_reconstructs_sequence(spark):
    """Decoding the RLE output must reproduce each user's original
    event-type sequence exactly — the lossless-compression contract."""
    ev = load_table(spark, SF, "events").toPandas()
    rows = QUERIES["rle_sequence_encode"](spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        runs = sorted(by_user[uid], key=lambda r: r.run_idx)
        decoded = [r.event_type for r in runs for _ in range(r.run_len)]
        assert decoded == list(g.event_type)
        # run indexes are dense 1..k and adjacent runs differ
        assert [r.run_idx for r in runs] == list(range(1, len(runs) + 1))
        for a, b in zip(runs, runs[1:]):
            assert a.event_type != b.event_type
            assert a.run_end <= b.run_start
        assert sum(r.run_len for r in runs) == len(g)


def test_streaks_bruteforce(spark):
    ev = load_table(spark, SF, "events").toPandas()
    ev["dy"] = ev["ts"].dt.floor("D").dt.date
    got = {r.user_id: r for r in QUERIES["user_activity_streaks"](spark, SF).collect()}
    for uid, g in ev.groupby("user_id"):
        days = sorted(set(g.dy))
        streaks = []
        start = prev = days[0]
        for d in days[1:]:
            if (d - prev).days == 1:
                prev = d
            else:
                streaks.append((start, prev))
                start = prev = d
        streaks.append((start, prev))
        r = got[uid]
        assert r.n_streaks == len(streaks)
        assert r.active_days == len(days)
        lens = [(e - s).days + 1 for s, e in streaks]
        assert r.longest_streak == max(lens)
        assert r.last_streak_len == lens[-1]
        assert r.last_active_day.date() == streaks[-1][1]
        assert sum(lens) == len(days)  # islands partition the day set
