"""Uniform scale-bound audit for integer fixed-point paths (VERDICT r7
ask #3).

The engine hash-checks against DuckDB by doing exact integer arithmetic
(cents, micro-nats, e6-quantized cosines, µs epochs) instead of floats.
Spark runs non-ANSI by default, so a BIGINT overflow does not raise — it
silently wraps, producing a *deterministically wrong* answer that still
hash-matches any oracle making the same mistake. corpus_mix_sample hit
exactly this (ADVICE r6: tot_n·target_ppm·1e6 crossed 2^63 at ~1.8e7
docs) and was widened to DECIMAL(38,0); doremi_domain_weights,
source_loo_coverage and vocab_topp_coverage were widened this round for
the same reason (ppm steps multiply a corpus-sized count by 1e6, which
wraps at 9.2e12 — under the ~2e13 tokens of a 100-TB corpus).

Two layers:

1. A static discipline sweep: every registered entry whose source uses
   the risky fixed-point patterns must state its overflow bound in the
   docstring ("Scale bound:" / "bound" / "overflow" / "wraps"). New
   entries that add fixed-point arithmetic without documenting the
   bound fail this test.
2. Dynamic worst-case checks: representative arithmetic classes are
   evaluated at their documented limits in plain Python (exact ints) to
   prove the stated headroom is real, plus a DuckDB-vs-Spark probe that
   the widened DECIMAL/HUGEINT division semantics agree where BIGINT
   would have wrapped.
"""

from __future__ import annotations

import inspect
import math
import re

import pytest

INT64_MAX = 2**63 - 1

# Patterns that mark integer fixed-point arithmetic whose bound must be
# documented: e6-scale quantization/multiplication, µs epochs, det_ln
# micro-nat products, DECIMAL(38,0) widenings.
RISKY = re.compile(
    r"1_000_000|1000000\.0|\* 1000000\)|_e6|unix_micros|epoch_us|"
    r"det_ln|DET_LN|DECIMAL\(38"
)
# Only a genuine bound statement passes: the structured 'Scale bound:'
# marker, or overflow/wrap vocabulary, or an explicit int64/2^63 limit.
# Deliberately NOT the bare word 'bound' — prose like 'corpus size
# unbounded' or 'bounded by basket size' used to satisfy the sweep
# without stating an overflow bound at all (ADVICE r8).
DOCUMENTED = re.compile(
    r"scale bound|overflow|wrap|int64|2\^63|2\*\*63|2⁶³", re.IGNORECASE
)


def _registry():
    from clean_census_acs_data_spark.queries import QUERIES

    return QUERIES


def test_every_fixed_point_entry_documents_its_bound():
    missing = []
    for name, fn in _registry().items():
        f = inspect.unwrap(fn)
        try:
            src = inspect.getsource(f)
        except OSError:  # pragma: no cover — dynamically built callables
            continue
        if RISKY.search(src) and not DOCUMENTED.search(f.__doc__ or ""):
            missing.append(name)
    assert not missing, (
        "fixed-point entries without a documented scale bound "
        f"(add a 'Scale bound:' docstring paragraph): {missing}"
    )


# ---------------------------------------------------------------------------
# dynamic worst-case checks per arithmetic class
# ---------------------------------------------------------------------------

# 100-TB reference magnitudes used by the docstring bounds
TOKENS_100TB = 2 * 10**13  # ~2e13 tokens in 100 TB of text
DOCS_100TB = 10**11  # ~1e11 documents at ~1 KB each
LN_INT64_MICROS = int(math.log(2**63) * 1e6) + 1  # 43.7e6 — max det_ln e6


def test_det_ln_micro_product_bounds():
    """Σ f·s_e6 sums are per-document: a doc of 2e11 tokens (far beyond
    any real document) is the break-even; a 100-TB corpus-level sum
    WOULD wrap, which is why no entry sums s_e6 corpus-wide."""
    per_doc_tokens = 2 * 10**11
    assert per_doc_tokens * LN_INT64_MICROS < INT64_MAX
    # corpus-level would wrap — the discipline the docstrings encode
    assert TOKENS_100TB * LN_INT64_MICROS > INT64_MAX


def test_ppm_step_requires_widening_at_100tb():
    """count·1e6 BIGINT products wrap under 100-TB token counts — the
    class doremi/source_loo/vocab_topp/mix_sample widened to
    DECIMAL(38,0)/HUGEINT. The widened form holds to 1e32."""
    assert TOKENS_100TB * 1_000_000 > INT64_MAX  # BIGINT form wraps
    assert TOKENS_100TB * 1_000_000 < 10**38  # DECIMAL(38,0) holds


def test_e6_vector_dot_is_per_vector_bounded():
    """Quantized dot products bound by dim·max(q)²: at |x| ≤ 2 → |q| ≤
    2e6, int64 admits ~5.7e5 dims — orders beyond any embedding; the
    bound never involves the row count."""
    max_q = 2_000_000
    assert 16 * max_q**2 < INT64_MAX  # the fixture's dim
    assert 100_000 * max_q**2 < INT64_MAX  # 100k dims still safe
    assert (INT64_MAX // max_q**2) > 2 * 10**6  # headroom statement


def test_epoch_micros_ordering_key_bounds():
    """Raw epoch-µs fits int64 to ~year 294000; the retired µs·4096
    packing died at May 2041 — pinned so it cannot come back silently
    (ohlc_bars_hourly AND attribution_first_last both order by struct
    now; no arithmetic ordering key with a dated wrap remains)."""
    us_year_2042 = int((2042 - 1970) * 365.25 * 86400) * 1_000_000
    us_year_2100 = int((2100 - 1970) * 365.25 * 86400) * 1_000_000
    assert us_year_2100 < INT64_MAX  # raw µs: fine
    assert us_year_2042 * 4096 > INT64_MAX  # the packing: wraps mid-2041


def test_bootstrap_draw_headroom():
    """poisson_bootstrap_ci's draw peaks at
    (h2_max + (B−1)·2654435761)·48271 — must stay exact for B = 32 and
    document the B ceiling."""
    h2_max = 2147483646
    for b in (31, 70_000_000):
        peak = (h2_max + b * 2654435761) * 48271
        if b == 31:
            assert peak < INT64_MAX
        else:
            assert peak > INT64_MAX  # the documented B ≈ 7e7 ceiling


def test_decimal_div_matches_hugeint_div(spark):
    """The widened division agrees across engines exactly where BIGINT
    would have wrapped: Spark DECIMAL(38,0) DIV vs DuckDB HUGEINT //
    on a magnitude past 2^63/1e6."""
    import duckdb

    n_unique, total = 9_300_000_000_000, 19_000_000_000_000  # > 2^63/1e6
    assert n_unique * 1_000_000 > INT64_MAX
    want = n_unique * 1_000_000 // total
    got_spark = spark.sql(
        f"SELECT CAST((CAST({n_unique} AS DECIMAL(38,0)) * 1000000)"
        f" DIV {total} AS BIGINT)"
    ).collect()[0][0]
    got_duck = duckdb.sql(
        f"SELECT CAST(CAST({n_unique} AS HUGEINT) * 1000000"
        f" // {total} AS BIGINT)"
    ).fetchone()[0]
    assert got_spark == got_duck == want


def test_signed_decimal_div_sign_definite_form(spark):
    """Negative integral division differs across dialects (Spark DIV
    truncates toward zero; DuckDB's DECIMAL // is not even integral) —
    the sign-definite form used by doremi_domain_weights must equal
    Python's sign·(|a|·1e6 // |b|) on both engines."""
    import duckdb

    a, b = -5_251_129, -21_287_423
    want = (1 if (a >= 0) == (b >= 0) else -1) * (abs(a) * 1_000_000 // abs(b))
    got_spark = spark.sql(
        f"SELECT CASE WHEN ({a} >= 0) = ({b} >= 0) THEN 1 ELSE -1 END"
        f" * ((CAST(abs({a}) AS DECIMAL(38,0)) * 1000000) div abs({b}))"
    ).collect()[0][0]
    got_duck = duckdb.sql(
        f"SELECT CASE WHEN ({a} >= 0) = ({b} >= 0) THEN 1 ELSE -1 END"
        f" * (CAST(abs({a}) AS HUGEINT) * 1000000 // abs({b}))"
    ).fetchone()[0]
    assert int(got_spark) == int(got_duck) == want


def test_twa_bound_statement_is_accurate():
    """time_weighted_average's BIGINT form wraps at a REALISTIC book —
    ~$300 held for 10 years — which is why its numerator is widened to
    DECIMAL(38,0)/HUGEINT (good past 10³⁸)."""
    span_10y_us = 10 * 365 * 86400 * 1_000_000
    assert 29_300 * span_10y_us > INT64_MAX  # $293 · 10y wraps BIGINT
    # the widened form holds even $1B held for 1000 years
    assert 10**11 * 1000 * 365 * 86400 * 10**6 < 10**38


@pytest.mark.parametrize("top", [100])
def test_zipf_moment_bounds(top):
    """zipf_slope_fit's moments over the top-100 ranks: worst-case sxy
    and sxx stay far inside int64 for ANY corpus size (y is the ln of
    an int64 count)."""
    x_max = int(math.log(top) * 1e6) + 1
    y_max = LN_INT64_MICROS
    assert top * x_max * y_max < INT64_MAX
    assert top * x_max * x_max < INT64_MAX
