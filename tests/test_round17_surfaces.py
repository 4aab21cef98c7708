"""Round-17 pins: the SQL-programmability surfaces must stay
declarative — the SQL UDF inlines (no Python eval node), and the
scripting block's gated aggregate matches a literal recompute."""

from __future__ import annotations

from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_sql_udf_inlines_into_codegen(spark):
    df = QUERIES["sql_udf_scalar"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # a declarative SQL UDF is pure substitution: no Python eval, no
    # extra plan nodes — the same partial-agg scan as q1
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "HashAggregate" in plan


def test_scripting_threshold_matches_literal_median(spark):
    from pyspark.sql import functions as F

    from clean_census_acs_data_spark.io import load_table

    rows = QUERIES["sql_scripting_block"](spark, SF).collect()
    assert rows
    cuts = {r.cut_cents for r in rows}
    assert len(cuts) == 1  # one session variable, same value on every row
    prices = sorted(
        (r.p, r.o_orderkey)
        for r in load_table(spark, SF, "orders")
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("p"),
            "o_orderkey",
        )
        .collect()
    )
    lower_median = prices[(len(prices) + 1) // 2 - 1][0]
    assert cuts == {lower_median}
    for r in rows:
        assert r.n_orders > 0 and r.sum_cents >= r.n_orders * lower_median
