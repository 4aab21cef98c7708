"""Cross-engine bit-parity tests for functions/detmath.det_ln_ratio —
the deterministic ln that replaced libm ln where raw doubles reach the
value hash (text_tfidf / keyword_topk_per_doc; libm ln is not
correctly rounded and Java vs DuckDB disagreed in the last ulp at
sf0.1)."""

from __future__ import annotations

import math

import duckdb
import pytest

from clean_census_acs_data_spark.functions.detmath import det_ln_ratio


@pytest.fixture(scope="module")
def ratio_values(spark):
    """(p, q) grid: p = 5001 vs every q in 2..1001, plus power-of-two
    boundary neighbors (the normalization-exponent edge cases)."""
    pairs = [(5001, q) for q in range(2, 1002)]
    pairs += [
        (p, q)
        for m in (1, 2, 10, 30)
        for p in (2**m - 1, 2**m, 2**m + 1)
        for q in (1, 3)
        if p >= q
    ]
    sdf = spark.createDataFrame(pairs, "p long, q long")
    sdf.createOrReplaceTempView("detmath_pq")
    svals = {
        (r.p, r.q): r.v
        for r in spark.sql(
            f"SELECT p, q, {det_ln_ratio('p', 'q', div='DIV')} AS v"
            " FROM detmath_pq"
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE pq (p BIGINT, q BIGINT)")
    con.executemany("INSERT INTO pq VALUES (?, ?)", pairs)
    dvals = {
        (int(p), int(q)): v
        for p, q, v in con.execute(
            f"SELECT p, q, {det_ln_ratio('p', 'q', div='//')} AS v FROM pq"
        ).fetchall()
    }
    return svals, dvals


def test_det_ln_bit_identical_across_engines(ratio_values):
    svals, dvals = ratio_values
    assert set(svals) == set(dvals)
    mism = [k for k in svals if svals[k] != dvals[k]]
    assert not mism, f"bit mismatches: {mism[:5]}"


def test_det_ln_accuracy_bound(ratio_values):
    svals, _ = ratio_values
    for (p, q), v in svals.items():
        assert abs(v - math.log(p / q)) < 2e-9, (p, q, v)
    # exact identity at ratio 1
    one = [v for (p, q), v in svals.items() if p == q]
    assert all(v == 0.0 for v in one)


@pytest.fixture(scope="module")
def signed_values(spark):
    """Signed grid: every (p, q) ordering including p < q, straddling
    the CASE flip and power-of-two boundaries."""
    from clean_census_acs_data_spark.functions.detmath import (
        det_ln_ratio_signed,
    )

    vals = (1, 2, 3, 5, 7, 63, 64, 999, 1000)
    pairs = [(p, q) for p in vals for q in vals]
    sdf = spark.createDataFrame(pairs, "p long, q long")
    sdf.createOrReplaceTempView("detmath_signed_pq")
    svals = {
        (r.p, r.q): r.v
        for r in spark.sql(
            f"SELECT p, q, {det_ln_ratio_signed('p', 'q', div='DIV')} AS v"
            " FROM detmath_signed_pq"
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE spq (p BIGINT, q BIGINT)")
    con.executemany("INSERT INTO spq VALUES (?, ?)", pairs)
    dvals = {
        (int(p), int(q)): v
        for p, q, v in con.execute(
            f"SELECT p, q, {det_ln_ratio_signed('p', 'q', div='//')} AS v"
            " FROM spq"
        ).fetchall()
    }
    return svals, dvals


def test_det_ln_signed_bit_identical_and_antisymmetric(signed_values):
    svals, dvals = signed_values
    assert svals == dvals  # bit parity incl. the p < q branch
    for (p, q), v in svals.items():
        assert abs(v - math.log(p / q)) < 2e-9, (p, q, v)
        # exact antisymmetry: the p<q branch is literally -ln(q/p)
        assert v == -svals[(q, p)], (p, q)
