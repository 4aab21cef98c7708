"""Round-20 tier property tests: sliding-frame exact distinct,
Passing–Bablok regression, and the analyze-time table-schema UDTF —
each pinned against an independent brute-force recompute of the
DEFINITION (the round-19 discipline)."""

from __future__ import annotations

import pyspark.sql.functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_windowed_distinct_sliding_bruteforce(spark):
    """The interval-delta rewrite must equal the textbook definition:
    for every event, |{event_type of the last min(10, pos+1) rows}| —
    recomputed here with plain Python sets over the same (us, event_id)
    total order."""
    from clean_census_acs_data_spark.queries_round20 import _SLIDE_K

    raw = (
        load_table(spark, SF, "events")
        .select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in raw:
        by_user.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], r["event_type"])
        )
    expect: dict[int, int] = {}
    for evs in by_user.values():
        evs.sort()
        for i in range(len(evs)):
            window = evs[max(0, i - _SLIDE_K) : i + 1]
            expect[window[-1][1]] = len({t for _, _, t in window})
    got = {
        r["event_id"]: r["n_distinct_window"]
        for r in QUERIES["windowed_distinct_sliding"](spark, SF).collect()
    }
    assert got == expect and got
    # the frame actually slides: some count must DROP somewhere (a
    # suffix/prefix frame's counts are monotone per user; a sliding
    # frame's are not)
    drops = 0
    for evs in by_user.values():
        ids = [e[1] for e in sorted(evs)]
        vals = [got[i] for i in ids]
        drops += sum(1 for a, b in zip(vals, vals[1:]) if b < a)
    assert drops > 0, "no count ever dropped — frame is not sliding"


def test_passing_bablok_bruteforce(spark):
    """Full Python recompute of the PB definition: x-ordered integer
    pairs, S = dy/dx as the same IEEE double, drop S = −1 (dy = −dx),
    K = #{dy + dx < 0}, slope = K-shifted median with (s, ia, ib)
    tiebreak (mean of two in the even case), intercept = lower median
    of y − b·x with customer tiebreak."""
    cust = (
        load_table(spark, SF, "customer")
        .join(
            load_table(spark, SF, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
        )
        .select(
            F.col("c_nationkey").alias("nk"),
            F.col("c_custkey").alias("ck"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
            "y",
        )
        .collect()
    )
    by_nk: dict[int, list] = {}
    for r in cust:
        by_nk.setdefault(r["nk"], []).append((r["ck"], r["x"], r["y"]))
    expect = {}
    for nk, items in by_nk.items():
        slopes = []
        kneg = 0
        for ia, xa, ya in items:
            for ib, xb, yb in items:
                if xa < xb:
                    dy, dx = yb - ya, xb - xa
                    if dy + dx == 0:
                        continue  # S = -1 discarded per PB
                    if dy + dx < 0:
                        kneg += 1
                    slopes.append((dy / dx, ia, ib))
        slopes.sort()
        n = len(slopes)
        if n == 0:
            continue
        if n % 2 == 1:
            idx = (n + 1) // 2 + kneg  # 1-based
            if idx > n:
                continue  # the HAVING guard drops it
            b = slopes[idx - 1][0]
        else:
            i1, i2 = n // 2 + kneg, n // 2 + 1 + kneg
            if i2 > n:
                continue
            b = (slopes[i1 - 1][0] + slopes[i2 - 1][0]) / 2
        resid = sorted((y - b * x, ck) for ck, x, y in items)
        a = resid[(len(resid) + 1) // 2 - 1][0]
        expect[nk] = (len(items), n, kneg, b, a)
    got = {
        r["nation_key"]: (
            r["n_items"],
            r["n_pairs"],
            r["k_neg"],
            r["pb_slope"],
            r["pb_intercept"],
        )
        for r in QUERIES["passing_bablok_regression"](spark, SF).collect()
    }
    assert got == expect and got
    # K must actually bite somewhere, else the entry degenerates to a
    # plain (Theil–Sen-style) median and the shift machinery is untested
    assert any(v[2] > 0 for v in expect.values()), "K = 0 everywhere"


def test_quantile_regression_origin_minimizes_check_loss(spark):
    """The selection device must return a true argmin of the check
    loss: for every (nation, τ), Σ ρ_τ(y − b_τ·x) ≤ Σ ρ_τ(y − s·x)
    for EVERY candidate slope s (the optimum of a piecewise-linear
    objective sits on a breakpoint) — plus an independent
    weighted-quantile recompute with exact integer thresholds."""
    from fractions import Fraction

    cust = (
        load_table(spark, SF, "customer")
        .join(
            load_table(spark, SF, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y"))
        .select(
            F.col("c_nationkey").alias("nk"),
            F.col("c_custkey").alias("ck"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
            "y",
        )
        .collect()
    )
    by_nk: dict[int, list] = {}
    for r in cust:
        if r["x"] != 0:
            by_nk.setdefault(r["nk"], []).append((r["ck"], r["x"], r["y"]))
    expect = {}
    for nk, items in by_nk.items():
        sw = sorted((y / x, ck, abs(x)) for ck, x, y in items)
        pw = sum(x for _, x, _ in items if x > 0)
        nw = sum(-x for _, x, _ in items if x < 0)
        for tau4 in (1, 2, 3):
            cum = 0
            thr = tau4 * pw + (4 - tau4) * nw  # 4·(τP + (1−τ)N)
            for s, _ck, w in sw:
                cum += w
                if 4 * cum >= thr:
                    expect[(nk, tau4)] = (len(items), pw + nw, s)
                    break
    got = {
        (r["nation_key"], r["tau_quarters"]): (
            r["n_items"],
            r["weight_total"],
            r["b_tau"],
        )
        for r in QUERIES["quantile_regression_origin"](spark, SF).collect()
    }
    assert got == expect and got
    # argmin property: exact-rational check loss at b_tau is <= the
    # loss at every breakpoint slope (ties allowed — flat segments)
    for nk, items in by_nk.items():
        data = [(Fraction(y), Fraction(x)) for _, x, y in items]
        cands = sorted({Fraction(y, x) for y, x in data})

        def loss(b, tau4, _data=data):
            tot = Fraction(0)
            for y, x in _data:
                r = y - b * x
                tot += Fraction(tau4, 4) * r if r >= 0 else Fraction(tau4 - 4, 4) * r
            return tot

        for tau4 in (1, 2, 3):
            b = expect[(nk, tau4)][2]
            # b is a float equal to some y/x; recover its exact rational
            b_exact = min(cands, key=lambda c: abs(float(c) - b))
            lb = loss(b_exact, tau4)
            assert all(lb <= loss(c, tau4) for c in cands), (nk, tau4)
    # the quartiles must actually spread somewhere (τ exercises the
    # weighting, not just three copies of the median)
    assert any(
        len({expect[(nk, t)][2] for t in (1, 2, 3)}) > 1 for nk in by_nk
    )


def test_udtf_unpivot_schema_derived_from_table_argument(spark):
    """The fourth UDTF shape's contract: analyze() must copy the key
    field's NAME and TYPE from the table argument and melt exactly the
    BIGINT columns — so pointing the same registered function at a
    table with a different key name/type yields a different output
    schema without redeclaration."""
    out = QUERIES["udtf_analyze_table_unpivot"](spark, SF)
    assert [f.name for f in out.schema.fields] == ["p_partkey", "metric", "value"]
    rows = out.collect()
    src = (
        load_table(spark, SF, "part")
        .select(
            "p_partkey",
            F.col("p_size").cast("long").alias("size_units"),
            F.round(F.col("p_retailprice") * 100).cast("long").alias("retail_cents"),
        )
        .collect()
    )
    expect = set()
    for r in src:
        expect.add((r["p_partkey"], "size_units", r["size_units"]))
        expect.add((r["p_partkey"], "retail_cents", r["retail_cents"]))
    assert {(r["p_partkey"], r["metric"], r["value"]) for r in rows} == expect
    # dynamic-schema proof: a STRING-keyed table re-keys the output
    spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "doc string, n_lines long, n_chars long"
    ).createOrReplaceTempView("__unpivot_alt")
    alt = spark.sql("SELECT * FROM unpivot_longs_fn(TABLE(__unpivot_alt))")
    assert [(f.name, f.dataType.simpleString()) for f in alt.schema.fields] == [
        ("doc", "string"),
        ("metric", "string"),
        ("value", "bigint"),
    ]
    assert {(r["doc"], r["metric"], r["value"]) for r in alt.collect()} == {
        ("a", "n_lines", 1),
        ("a", "n_chars", 10),
        ("b", "n_lines", 2),
        ("b", "n_chars", 20),
    }
