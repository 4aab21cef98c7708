"""Property tests for the round-12 wave-3 batch (IPF raking, trimmed
mean). Exact parity runs in tests/test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_ipf_column_margins_hit_target(spark):
    """After the column pass (w2), every column margin must equal the
    uniform target to within per-cell floor slack."""
    rows = QUERIES["ipf_raking_weights"](spark, SF).collect()
    n_milli = sum(r.cnt for r in rows) * 1000
    bands = {r.band for r in rows}
    segs = {r.seg for r in rows}
    t_col = n_milli // len(bands)
    by_band: dict[int, int] = {}
    for r in rows:
        by_band[r.band] = by_band.get(r.band, 0) + r.w2_milli
    for band, s in by_band.items():
        # each cell's floor loses < 1 milli-unit
        assert 0 <= t_col - s <= len(segs)
    # row deviation column is consistent with the w2 values
    t_row = n_milli // len(segs)
    by_seg: dict[str, int] = {}
    for r in rows:
        by_seg[r.seg] = by_seg.get(r.seg, 0) + r.w2_milli
    for r in rows:
        assert r.row_dev_milli == abs(by_seg[r.seg] - t_row)


def test_ipf_row_pass_bruteforce(spark):
    """w1 must equal the exact integer row-raking of the counts."""
    rows = QUERIES["ipf_raking_weights"](spark, SF).collect()
    n_milli = sum(r.cnt for r in rows) * 1000
    segs = {r.seg for r in rows}
    t_row = n_milli // len(segs)
    row_sum: dict[str, int] = {}
    for r in rows:
        row_sum[r.seg] = row_sum.get(r.seg, 0) + r.cnt * 1000
    for r in rows:
        assert r.w1_milli == (r.cnt * 1000 * t_row) // row_sum[r.seg]


def test_trimmed_mean_bruteforce_and_robustness(spark):
    cust = load_table(spark, SF, "customer").toPandas()
    orders = load_table(spark, SF, "orders").toPandas()
    orders["cents"] = (orders["o_totalprice"] * 100).round().astype("int64")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    got = {
        r.c_nationkey: r
        for r in QUERIES["trimmed_mean_by_nation"](spark, SF).collect()
    }
    for nat, g in j.groupby("c_nationkey"):
        xs = [c for c, _ in sorted(zip(g.cents, g.o_orderkey))]
        n = len(xs)
        k = n // 10
        mid = xs[k : n - k]
        r = got[nat]
        assert r.n_orders == n
        assert r.k_trimmed_each_side == k
        assert r.mean_micro == sum(xs) * 10000 // n
        assert r.trimmed_mean_micro == sum(mid) * 10000 // len(mid)
        # trimming a right-skewed distribution must not raise the mean
        # above the max, and the trim set really is symmetric
        assert len(mid) == n - 2 * k
