"""Property tests for the round-12 wave-5 batch (CUSUM changepoint,
naive-forecast WAPE). Exact parity runs in tests/test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    ev = load_table(spark, SF, "events").toPandas()
    ev["dy"] = ev["ts"].dt.floor("D")
    return ev.groupby(["event_type", "dy"]).size()


def test_cusum_equals_stateful_recursion(spark):
    """The closed form must reproduce the textbook stateful recursion
    S_t = max(0, S_{t-1} + (x_t - k)) exactly."""
    daily = _daily(spark)
    rows = QUERIES["cusum_changepoint"](spark, SF).collect()
    got = {(r.event_type, r.dy): r for r in rows}
    for et, g in daily.groupby(level=0):
        series = g.sort_index()
        total = int(series.sum())
        k_milli = total * 1000 // len(series)
        s = 0
        for (_, dy), cnt in series.items():
            s = max(0, s + int(cnt) * 1000 - k_milli)
            r = got[(et, dy)]
            assert r.cnt == int(cnt)
            assert r.k_milli == k_milli
            assert r.cusum_milli == s
            assert r.alarm == (s > k_milli // 4)
    assert len(rows) == len(daily)


def test_cusum_nonnegative_and_resets(spark):
    rows = QUERIES["cusum_changepoint"](spark, SF).collect()
    for r in rows:
        assert r.cusum_milli >= 0
        # the closed form: cusum == p - min(0, running-min(p)) >= p
        assert r.cusum_milli >= r.p_milli


def test_wape_bruteforce(spark):
    daily = _daily(spark)
    got = {r.event_type: r for r in QUERIES["forecast_naive_wape"](spark, SF).collect()}
    for et, g in daily.groupby(level=0):
        xs = [int(c) for c in g.sort_index()]
        for lag, (n_col, ae_col, b_col, w_col) in {
            1: ("n_rounds_lag1", "abs_err_lag1", "bias_lag1", "wape_lag1"),
            7: ("n_rounds_lag7", "abs_err_lag7", "bias_lag7", "wape_lag7"),
        }.items():
            pairs = [(xs[i], xs[i - lag]) for i in range(lag, len(xs))]
            r = got[et]
            assert getattr(r, n_col) == len(pairs)
            assert getattr(r, ae_col) == sum(abs(y - yh) for y, yh in pairs)
            assert getattr(r, b_col) == sum(y - yh for y, yh in pairs)
            assert getattr(r, w_col) == sum(
                abs(y - yh) for y, yh in pairs
            ) / sum(y for y, _ in pairs)
