"""Unit + property-based tests for the reference-parity transform
library (SURVEY.md §5.2 item 3): normalization idempotence, rename
identity-on-unknowns, alignment totality, union losslessness, mapping
collision policy, cast_clean null semantics."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from clean_census_acs_data_spark import transforms as T

# column-name strategy: census-ish names with stray case/dashes/spaces
col_name = st.from_regex(r"[A-Za-z][A-Za-z0-9_\- ]{0,14}", fullmatch=True).filter(
    lambda s: s.strip() and not s.strip().isdigit()
)


def _norm(name: str) -> str:
    return name.replace("-", "_").upper().strip()


@settings(max_examples=30, deadline=None)
@given(st.lists(col_name, min_size=1, max_size=6, unique_by=_norm))
def test_normalize_idempotent(spark, names):
    df = spark.createDataFrame([tuple("x" for _ in names)], names)
    once = T.normalize_columns(df)
    twice = T.normalize_columns(once)
    assert once.columns == twice.columns
    assert all(c == _norm(c) for c in once.columns)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(col_name, min_size=2, max_size=6, unique_by=_norm),
    st.data(),
)
def test_align_union_lossless(spark, names, data):
    """Any two column-subsets of a frame re-union losslessly by name
    with NULL fill (the pd.concat semantics, Test_census_tract.py:398)."""
    names = [_norm(n) for n in names]
    k = data.draw(st.integers(1, len(names)))
    subset_a = names[:k]
    subset_b = names[k - 1 :]
    df = spark.createDataFrame([tuple(f"v{i}" for i in range(len(names)))], names)
    a = df.select(*subset_a)
    b = df.select(*subset_b)
    u = T.union_all([T.align_schema(a, names), T.align_schema(b, names)])
    assert u.columns[: len(names)] == names
    rows = u.collect()
    assert len(rows) == 2
    # every original value survives in its column
    for i, n in enumerate(names):
        vals = {r[n] for r in rows}
        assert f"v{i}" in vals


def test_apply_mapping_identity_on_unknowns(spark):
    df = spark.createDataFrame([("a", "b")], ["KNOWN", "UNKNOWN_COL"])
    out = T.apply_mapping(df, {"KNOWN": "Label"})
    assert out.columns == ["Label", "UNKNOWN_COL"]


def test_apply_mapping_idempotent_when_disjoint(spark):
    df = spark.createDataFrame([("a",)], ["CODE1"])
    m = {"CODE1": "Label One"}
    once = T.apply_mapping(df, m)
    twice = T.apply_mapping(once, m)
    assert once.columns == twice.columns == ["Label One"]


def test_build_mapping_collision_fails_loud():
    with pytest.raises(T.MappingCollisionError):
        T.build_mapping([("A", "x"), ("A", "y")])
    with pytest.raises(T.MappingCollisionError):
        T.build_mapping([("A", "x"), ("B", "x")])
    # reference behavior opt-in: last wins silently
    m = T.build_mapping([("A", "x"), ("A", "y")], allow_last_wins=True)
    assert m == {"A": "y"}


def test_build_mapping_key_cleanup():
    m = T.build_mapping([("  dp02_0060e ", "Label")])
    assert m == {"DP02_0060E": "Label"}


def test_cast_clean_blank_sentinel_null(spark):
    df = spark.createDataFrame(
        [("1", "ok"), ("", "blank"), ("  ", "ws"), ("-888888888", "sentinel"), ("7", "ok2")],
        ["v", "tag"],
    )
    out = T.cast_clean(df, {"v": "long"}).collect()
    by_tag = {r["tag"]: r["v"] for r in out}
    assert by_tag == {"ok": 1, "blank": None, "ws": None, "sentinel": None, "ok2": 7}


def test_align_schema_orders_expected_first(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["C", "A", "EXTRA"])
    out = T.align_schema(df, ["A", "B", "C"])
    assert out.columns == ["A", "B", "C", "EXTRA"]
    row = out.collect()[0]
    assert row["B"] is None and row["A"] == 2 and row["C"] == 1


def test_unmapped_columns_diagnostic(spark):
    df = spark.createDataFrame([("x",) * 4], ["DP02_0060E", "STATE", "NAME", "DPXX_9999E"])
    unmapped = T.unmapped_columns(df, {"DP02_0060E": "Label"})
    assert unmapped == {"DPXX_9999E"}


def test_apply_mapping_join_broadcast(spark):
    """Data-level mapping join: labels attached via broadcast hash join,
    unknown codes fall back to themselves."""
    facts = spark.createDataFrame(
        [("dp02_0060e", 1), ("DP02_0061E", 2), ("ZZZ", 3)], ["code", "v"]
    )
    dim = spark.createDataFrame(
        [("DP02_0060E", "Less than High School"), ("DP02_0061E", "Some High School")],
        ["api_code", "label"],
    )
    out = T.apply_mapping_join(facts, dim, "code")
    got = {r["v"]: r["code_label"] for r in out.collect()}
    assert got == {1: "Less than High School", 2: "Some High School", 3: "ZZZ"}
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
