"""Deterministic transcendental math for cross-engine hash parity.

libm functions (``ln``, ``pow``, ``exp``) are NOT required to be
correctly rounded by IEEE 754, and Java's ``Math.log`` and DuckDB's C
library genuinely disagree in the last ulp on some inputs — observed
at sf0.1 on text_tfidf's idf (spark=3.7862530788999194 vs
duckdb=3.78625307889992) after both engines had agreed on every input
at sf0.001/sf0.01. The four basic operations and ``sqrt`` ARE
correctly rounded, so any finite algorithm built only from those, with
identical association order, produces bit-identical doubles on both
engines.

:func:`det_ln_ratio` computes ln(p/q) for exact positive integers
p ≥ q ≥ 1 that way:

- f = p DIV q (exact integer), m = bit_length(f) − 1, so the true
  ratio x = p/q lies in [2^m, 2^(m+1)) — m is derived from INTEGER
  arithmetic, never from a float log, so both engines pick the same
  normalization (a float-derived m could differ at a power-of-two
  boundary and change the entire rounding path).
- r = p / (q·2^m) ∈ [1, 2): ONE correctly-rounded division of exact
  integers (q·2^m is exact while m ≤ 52).
- atanh series: y = (r−1)/(r+1) ∈ [0, 1/3), ln(r) ≈ 2·y·Horner(y²)
  with odd terms through k=15 — truncation error < 2·(1/3)¹⁷/17
  ≈ 9·10⁻¹⁰, absolute.
- ln(x) = ln(r) + m·ln2 with ln2 as a double literal.

The result is a DEFINED deterministic approximation of ln (abs err
< 1e-9), identical bit-for-bit across engines at every scale — which a
libm ln can never guarantee.
"""

from __future__ import annotations

# ALL float literals below use E-notation: Spark parses a bare `1.0`
# as DECIMAL(2,1), so `1.0/3.0` would be DECIMAL division (6 digits —
# observed as a 9e-9 divergence from DuckDB's double path); `1E0` is a
# DOUBLE literal in both dialects.
_LN2 = "6.931471805599453E-1"

# odd-term atanh Horner coefficients 1/3 ... 1/15 as division
# expressions (each a correctly-rounded op on exact double literals —
# a decimal literal for 1/3 would itself be a rounding choice; the
# division form is unambiguous on both engines)
_HORNER = (
    "(1E0 + y2 * ((1E0/3E0) + y2 * ((1E0/5E0) + y2 * ((1E0/7E0)"
    " + y2 * ((1E0/9E0) + y2 * ((1E0/11E0) + y2 * ((1E0/13E0)"
    " + y2 * (1E0/15E0))))))))"
)


def det_ln_ratio(p: str, q: str, *, div: str) -> str:
    """SQL text for deterministic ln(p/q), p ≥ q ≥ 1 exact integers.

    ``p``/``q`` are SQL expressions of BIGINT type; ``div`` is the
    dialect's integer-division token (``'DIV'`` for Spark, ``'//'``
    for DuckDB) — the only token the two dialects disagree on. The
    emitted expression repeats p and q a handful of times; keep them
    simple column references (or pre-compute them in an enclosing
    SELECT)."""
    # 2^m via an integer shift — the same `<<` text parses in Spark 4
    # and DuckDB. The earlier pow(2E0, m) form worked in practice (libm
    # returns exact powers of two exactly) but pow is not REQUIRED to
    # be correctly rounded, contradicting this module's invariant
    # (ADVICE r6); the shift is exact by construction for m ≤ 62.
    m = f"(length(bin(({p}) {div} ({q}))) - 1)"
    den = f"(({q}) * (CAST(1 AS BIGINT) << {m}))"
    r = f"(CAST(({p}) AS DOUBLE) / CAST({den} AS DOUBLE))"
    y = f"(({r} - 1E0) / ({r} + 1E0))"
    body = _HORNER.replace("y2", f"({y} * {y})")
    return f"(2E0 * {y} * {body} + CAST({m} AS DOUBLE) * {_LN2})"


def det_ln_ratio_signed(p: str, q: str, *, div: str) -> str:
    """SQL text for deterministic ln(p/q) with NO p ≥ q requirement —
    both must still be exact positive BIGINT expressions. The
    magnitude is ONE :func:`det_ln_ratio` over (greatest, least) — so
    it is always evaluated on a ratio ≥ 1, where the normalization is
    defined — multiplied by a ±1 sign (multiplication by ±1E0 is
    exact, so determinism is preserved). The single-ln form matters:
    an earlier CASE-of-two-ln emission doubled the generated code and
    whole-stage-codegen COMPILE time dominated small-frame entries
    (psi_drift_buckets 0.5 → 1.9 s)."""
    mag = det_ln_ratio(
        f"greatest(({p}), ({q}))", f"least(({p}), ({q}))", div=div
    )
    return (
        f"((CASE WHEN ({p}) >= ({q}) THEN 1E0 ELSE -1E0 END) * {mag})"
    )
