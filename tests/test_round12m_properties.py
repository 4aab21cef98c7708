"""Property tests for pandas_iter_udf_bucketize (wave 13). Exact
parity runs in tests/test_oracle_parity.py."""

from __future__ import annotations

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_iter_udf_bucketize_bruteforce(spark):
    ev = load_table(spark, SF, "events").toPandas()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    got = {r.event_id: r for r in QUERIES["pandas_iter_udf_bucketize"](spark, SF).collect()}
    assert len(got) == len(ev)
    for r in ev.itertuples():
        row = got[r.event_id]
        assert row.value_cents == r.cents
        assert row.bucket == f"band_{min(r.cents // 5000, 9)}"


def test_iter_udf_plan_is_arrow_batched(spark):
    """The plan must show the Arrow-batched Python eval operator —
    the iterator form rides the same vectorized boundary as scalar
    pandas_udf (never row-at-a-time BatchEvalPython)."""
    import io
    from contextlib import redirect_stdout

    df = QUERIES["pandas_iter_udf_bucketize"](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    p = buf.getvalue()
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p
