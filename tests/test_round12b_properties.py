"""Property tests for the round-12 wave-2 batch (exact oracle parity
runs in tests/test_oracle_parity.py; these pin semantic invariants)."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# gini_concentration_by_nation
# ---------------------------------------------------------------------------


def test_gini_matches_bruteforce_and_bounds(spark):
    cust = load_table(spark, SF, "customer").toPandas()
    orders = load_table(spark, SF, "orders").toPandas()
    orders["cents"] = (orders["o_totalprice"] * 100).round().astype("int64")
    spend = (
        cust.merge(
            orders.groupby("o_custkey").cents.sum().rename("cents"),
            left_on="c_custkey",
            right_index=True,
            how="left",
        )
        .fillna({"cents": 0})
        .astype({"cents": "int64"})
    )
    got = {
        r.c_nationkey: r
        for r in QUERIES["gini_concentration_by_nation"](spark, SF).collect()
    }
    for nat, g in spend.groupby("c_nationkey"):
        xs = sorted(zip(g.cents, g.c_custkey))
        n = len(xs)
        sx = sum(x for x, _ in xs)
        six = sum(i * x for i, (x, _) in enumerate(xs, start=1))
        r = got[nat]
        assert r.n_customers == n
        assert r.total_cents == sx
        assert r.gini_num == 2 * six - (n + 1) * sx
        assert r.gini_den == n * sx
        assert 0.0 <= r.gini < 1.0
        assert r.gini == r.gini_num / r.gini_den


def test_gini_includes_zero_spend_customers(spark):
    n_cust = load_table(spark, SF, "customer").count()
    rows = QUERIES["gini_concentration_by_nation"](spark, SF).collect()
    assert sum(r.n_customers for r in rows) == n_cust


# ---------------------------------------------------------------------------
# herfindahl_by_segment
# ---------------------------------------------------------------------------


def test_hhi_bounds_and_bruteforce(spark):
    rows = QUERIES["herfindahl_by_segment"](spark, SF).collect()
    cust = load_table(spark, SF, "customer").toPandas()
    orders = load_table(spark, SF, "orders").toPandas()
    orders["cents"] = (orders["o_totalprice"] * 100).round().astype("int64")
    j = cust.merge(orders, left_on="c_custkey", right_on="o_custkey")
    for r in rows:
        g = j[j.c_mktsegment == r.c_mktsegment].groupby("c_custkey").cents.sum()
        total = int(g.sum())
        shares = [int(c) * 1000 // total for c in g]
        assert r.n_holders == len(g)
        assert r.total_cents == total
        assert r.hhi_permille2 == sum(s * s for s in shares)
        assert r.top_share_permille == max(shares)
        # bounds: perfectly-even 1e6/n ≤ HHI ≤ 1e6 (up to floor slack)
        assert r.hhi_permille2 <= 1_000_000
        assert r.top_share_permille < 1000


# ---------------------------------------------------------------------------
# mann_kendall_trend
# ---------------------------------------------------------------------------


def test_mann_kendall_matches_bruteforce(spark):
    orders = load_table(spark, SF, "orders").toPandas()
    orders["month"] = orders["o_orderdate"].dt.to_period("M")
    orders["day"] = orders["o_orderdate"].dt.date
    got = {
        r.month.strftime("%Y-%m"): r
        for r in QUERIES["mann_kendall_trend"](spark, SF).collect()
    }
    for month, g in orders.groupby("month"):
        daily = g.groupby("day").size().sort_index().tolist()
        n = len(daily)
        if n < 2:
            # a one-day month has no pairs: dropped by design
            assert str(month) not in got
            continue
        s = sum(
            (0 if a == b else (1 if b > a else -1))
            for a, b in itertools.combinations(daily, 2)
        )
        ties = {}
        for c in daily:
            ties[c] = ties.get(c, 0) + 1
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        r = got[str(month)]
        assert r.n_days == n
        assert r.s_stat == s
        assert r.var18 == var18
        if s != 0:
            sigma = math.sqrt(var18 / 18.0)
            z = (s - 1) / sigma if s > 0 else (s + 1) / sigma
            assert math.isclose(r.z, z, rel_tol=1e-12)
        else:
            assert r.z == 0.0


# ---------------------------------------------------------------------------
# kn_bigram_stats
# ---------------------------------------------------------------------------


def test_kn_counts_bruteforce(spark):
    docs = load_table(spark, SF, "documents").toPandas()
    from collections import Counter, defaultdict

    cab: Counter = Counter()
    for t in docs.text:
        ws = [w for w in t.lower().split(" ")]
        for a, b in zip(ws, ws[1:]):
            if a and b:
                cab[(a, b)] += 1
    ca: Counter = Counter()
    nf: Counter = Counter()
    npre: Counter = Counter()
    for (a, b), c in cab.items():
        ca[a] += c
        nf[a] += 1
        npre[b] += 1
    rows = QUERIES["kn_bigram_stats"](spark, SF).collect()
    expected = {k: v for k, v in cab.items() if v >= 3}
    assert {(r.w1, r.w2) for r in rows} == set(expected)
    for r in rows:
        assert r.c_ab == cab[(r.w1, r.w2)]
        assert r.c_a == ca[r.w1]
        assert r.n_follow_a == nf[r.w1]
        assert r.n_precede_b == npre[r.w2]
        assert r.p_disc_num == 4 * r.c_ab - 3
        assert r.p_disc_den == 4 * r.c_a
        assert 0.0 < r.p_discounted <= 1.0


def test_kn_discount_below_mle(spark):
    """Discounting must strictly reduce every bigram's probability vs
    the MLE c(ab)/c(a) — the mass freed is what the backoff gets."""
    for r in QUERIES["kn_bigram_stats"](spark, SF).collect():
        assert r.p_discounted < r.c_ab / r.c_a
