"""Property tests for the round-12 batch (exact oracle parity runs in
tests/test_oracle_parity.py; these pin the semantic invariants that a
hash match alone wouldn't explain)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# chi2_independence_cells
# ---------------------------------------------------------------------------


def test_chi2_totals_and_margins(spark):
    rows = QUERIES["chi2_independence_cells"](spark, SF).collect()
    cells = [r for r in rows if r.priority != "(all)"]
    total = [r for r in rows if r.priority == "(all)"]
    assert len(total) == 1
    t = total[0]
    assert t.observed == sum(r.observed for r in cells)
    assert t.chi2_milli == sum(r.chi2_milli for r in cells)
    # expected counts reproduce the grand total up to the milli floor:
    # sum(floor(r*c*1000/n)) is within #cells of n*1000
    assert 0 <= t.observed * 1000 - t.expected_milli <= len(cells)


def test_chi2_matches_scipy_free_float_reference(spark):
    """Per-cell contribution equals the float chi-square to within the
    milli-floor error bound (proves the fixed-point encodes the real
    statistic, not some other quantity)."""
    rows = QUERIES["chi2_independence_cells"](spark, SF).collect()
    cells = [r for r in rows if r.priority != "(all)"]
    n = sum(r.observed for r in cells)
    rtot: dict[str, int] = {}
    ctot: dict[str, int] = {}
    for r in cells:
        rtot[r.priority] = rtot.get(r.priority, 0) + r.observed
        ctot[r.status] = ctot.get(r.status, 0) + r.observed
    for r in cells:
        e = rtot[r.priority] * ctot[r.status] / n
        chi = (r.observed - e) ** 2 / e
        assert abs(r.expected_milli / 1000 - e) < 0.002
        # floored expected shifts the ratio by O(1/e); allow that slack
        assert abs(r.chi2_milli / 1000 - chi) < 0.01 + 2 * chi / max(e, 1.0)


# ---------------------------------------------------------------------------
# did_estimator
# ---------------------------------------------------------------------------


def test_did_matches_pandas_cells(spark):
    ev = load_table(spark, SF, "events").toPandas()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    ev["treated"] = ev["user_id"] % 2 == 0
    ev["post"] = ev["ts"] >= "2024-01-16"
    got = QUERIES["did_estimator"](spark, SF).collect()[0]

    def mean_micro(t, p):
        g = ev[(ev.treated == t) & (ev.post == p)]
        return int(g.cents.sum()) * 10000 // len(g)

    assert got.mean_treated_post_micro == mean_micro(True, True)
    assert got.mean_treated_pre_micro == mean_micro(True, False)
    assert got.mean_control_post_micro == mean_micro(False, True)
    assert got.mean_control_pre_micro == mean_micro(False, False)
    assert got.did_micro == (
        mean_micro(True, True) - mean_micro(True, False)
    ) - (mean_micro(False, True) - mean_micro(False, False))
    assert (
        got.n_treated_post
        + got.n_treated_pre
        + got.n_control_post
        + got.n_control_pre
        == len(ev)
    )


# ---------------------------------------------------------------------------
# nelson_aalen_hazard
# ---------------------------------------------------------------------------


def test_nelson_aalen_invariants(spark):
    rows = sorted(
        QUERIES["nelson_aalen_hazard"](spark, SF).collect(),
        key=lambda r: r.t_hours,
    )
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    # the earliest risk set contains every subject
    assert rows[0].n_risk == n_users
    # the risk set is exactly the reverse cumulative subject count
    remaining = n_users
    cum = 0
    for r in rows:
        assert r.n_risk == remaining
        assert r.hazard_micro == r.d_events * 1_000_000 // r.n_risk
        cum += r.hazard_micro
        assert r.cum_hazard_micro == cum  # floor-then-cumsum, exactly
        remaining -= r.d_events + r.c_censored
    assert remaining == 0
    # cumulative hazard is nondecreasing
    hs = [r.cum_hazard_micro for r in rows]
    assert hs == sorted(hs)


# ---------------------------------------------------------------------------
# ewma_dyadic_user_value
# ---------------------------------------------------------------------------


def test_ewma_matches_bruteforce(spark):
    ev = load_table(spark, SF, "events").toPandas()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    got = {
        r.event_id: (r.ewma_num, r.ewma_den, r.ewma_cents)
        for r in QUERIES["ewma_dyadic_user_value"](spark, SF).collect()
    }
    for _, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        hist: list[tuple[int, int]] = []  # (event_id, cents) in order
        for _, row in g.iterrows():
            hist.append((row.event_id, row.cents))
            frame = hist[-16:]
            m = len(frame)
            num = sum(
                c * (1 << (16 - m + k)) for k, (_, c) in enumerate(frame)
            )
            den = (1 << 16) - (1 << (16 - m))
            assert got[row.event_id] == (num, den, num // den)


def test_ewma_weight_identity(spark):
    """Weights must sum to the denominator (the EWMA is a true weighted
    mean: constant series ⇒ ewma_cents == the constant)."""
    rows = QUERIES["ewma_dyadic_user_value"](spark, SF).collect()
    for r in rows[:100]:
        assert r.ewma_den > 0
        # mean bounds: min ≤ ewma ≤ max over the window is implied by
        # weights summing to den; spot-check the constant-series bound
        assert 0 <= r.ewma_cents  # values are nonneg cents


# ---------------------------------------------------------------------------
# tv_distance_sources
# ---------------------------------------------------------------------------


def test_tv_bounds_pairs_and_bruteforce(spark):
    rows = QUERIES["tv_distance_sources"](spark, SF).collect()
    srcs = set()
    for r in rows:
        srcs.add(r.source_a)
        srcs.add(r.source_b)
        assert r.source_a < r.source_b
        assert 0 <= r.tv_num <= r.tv_den
        assert math.isclose(r.tv, r.tv_num / r.tv_den, rel_tol=0, abs_tol=0)
    k = len(srcs)
    assert len(rows) == k * (k - 1) // 2  # every unordered pair, once

    # brute-force TV for one pair from raw tokens
    docs = load_table(spark, SF, "documents").toPandas()
    r0 = rows[0]

    def counts(src):
        from collections import Counter

        c: Counter = Counter()
        for t in docs[docs.source == src].text:
            c.update(w for w in t.lower().split(" ") if w)
        return c

    ca, cb = counts(r0.source_a), counts(r0.source_b)
    na, nb = sum(ca.values()), sum(cb.values())
    num = sum(
        abs(ca.get(t, 0) * nb - cb.get(t, 0) * na)
        for t in set(ca) | set(cb)
    )
    assert (r0.tv_num, r0.tv_den) == (num, 2 * na * nb)


# ---------------------------------------------------------------------------
# length_bucket_batching
# ---------------------------------------------------------------------------


def test_batching_invariants(spark):
    rows = QUERIES["length_bucket_batching"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").toPandas()
    assert sum(r.n_docs for r in rows) == len(docs)
    for r in rows:
        assert 1 <= r.n_docs <= 32  # batch size cap
        assert r.padded_chars == r.n_docs * r.max_chars - r.sum_chars
        assert r.padded_chars >= 0
        # every doc in the batch fits its bucket's length band
        assert 64 * r.bucket <= r.max_chars < 64 * (r.bucket + 1)
        assert math.isclose(
            r.fill_ratio, r.sum_chars / (r.n_docs * r.max_chars)
        )
    # only the LAST batch of a bucket may be short
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bs in by_bucket.values():
        bs.sort(key=lambda r: r.batch_id)
        assert [r.batch_id for r in bs] == list(range(len(bs)))
        for r in bs[:-1]:
            assert r.n_docs == 32
