"""Hypothesis property tests for the round-12 closed-form identities.

These test the MATH both engine implementations encode, in pure
Python — no Spark session — so they run on arbitrary generated series,
far beyond what the parquet fixtures exercise:

- the CUSUM prefix-sum closed form equals the stateful recursion
  (cusum_changepoint / streaming_cusum_monitor both rely on this);
- the dyadic-EWMA weight algebra (numerator/denominator identity,
  weighted-mean bounds);
- the cross-multiplied ordered-EMD equals the float definition
  (t_closeness_emd_audit);
- the IPF row pass lands every row margin within per-cell floor slack
  (ipf_raking_weights).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# CUSUM closed form ≡ recursion
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=60),
    k=st.integers(min_value=-10**6, max_value=10**6),
)
def test_cusum_closed_form_equals_recursion(xs, k):
    s = 0
    rec = []
    for x in xs:
        s = max(0, s + (x - k))
        rec.append(s)
    p = 0
    min_p = 0
    closed = []
    for x in xs:
        p += x - k
        min_p = min(min_p, p)
        closed.append(p - min(0, min_p))
    assert closed == rec


# ---------------------------------------------------------------------------
# dyadic EWMA weight algebra
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=16)
)
def test_dyadic_ewma_weights_sum_and_bounds(vals):
    m = len(vals)
    weights = [1 << (16 - m + k) for k in range(m)]
    num = sum(v * w for v, w in zip(vals, weights))
    den = (1 << 16) - (1 << (16 - m))
    assert sum(weights) == den  # the weighted mean really is a mean
    ew = num // den
    assert min(vals) <= ew <= max(vals)
    # constant series ⇒ exact passthrough
    c = vals[0]
    assert sum(c * w for w in weights) // den == c


# ---------------------------------------------------------------------------
# ordered-EMD cross-multiplication ≡ float definition
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    g=st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=10),
    q=st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=10),
)
def test_emd_cross_multiplied_equals_float(g, q):
    b = min(len(g), len(q))
    g, q = g[:b], q[:b]
    ng, nq = sum(g), sum(q)
    if ng == 0 or nq == 0:
        return
    cg = cq = 0
    num = 0
    emd_f = 0.0
    for i in range(b - 1):  # last term identically zero
        cg += g[i]
        cq += q[i]
        num += abs(cg * nq - cq * ng)
        emd_f += abs(cg / ng - cq / nq)
    assert math.isclose(num / (ng * nq * (b - 1)), emd_f / (b - 1), rel_tol=1e-9, abs_tol=1e-12)


# ---------------------------------------------------------------------------
# IPF row pass: margins hit targets within floor slack
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    cells=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # row id
            st.integers(min_value=1, max_value=10**5),  # count
        ),
        min_size=1,
        max_size=40,
    )
)
def test_ipf_row_pass_hits_targets(cells):
    rows: dict[int, list[int]] = {}
    for r, c in cells:
        rows.setdefault(r, []).append(c * 1000)
    n_milli = sum(sum(v) for v in rows.values())
    t_row = n_milli // len(rows)
    for r, ws in rows.items():
        s = sum(ws)
        raked = [(w * t_row) // s for w in ws]
        # each cell floors away <1 milli-unit: margin within |cells|
        assert 0 <= t_row - sum(raked) <= len(ws)
