"""Round-17 tier: Spark 4 SQL programmability surfaces — SQL scripting
and SQL (declarative) UDFs, the engine-API complements of
sql_pipe_syntax / parameterized_sql_query / variant_extract_typed.

- ``sql_scripting_block`` — a BEGIN…END SQL-scripting procedure
  (DECLARE session variables, control flow, a data-derived threshold
  consumed by a second statement) executed natively by Spark 4's SQL
  scripting engine. The oracle is the equivalent single declarative
  query — proving the procedural form computes exactly the relational
  answer.
- ``sql_udf_scalar``      — CREATE TEMPORARY FUNCTION … RETURNS …
  RETURN <expr> (a catalog-registered DECLARATIVE UDF, inlined by the
  optimizer — not a Python/JVM black box), used inside an aggregation.
  The oracle inlines the body, proving the UDF is pure substitution.

Determinism discipline per the package standard (queries.py module
docstring): integer cents, exact selection thresholds (row_number
lower-median, not float percentile), single final divisions.

Reference tie: none (SURVEY.md §2D engine-extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clean_census_acs_data_spark.io import register_views
from clean_census_acs_data_spark.queries import register

# ---------------------------------------------------------------------------
# SQL scripting: data-derived threshold, then a gated aggregate
# ---------------------------------------------------------------------------

_SCRIPT_ORACLE = """
WITH r AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
         ROW_NUMBER() OVER (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                            o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
),
cut AS (SELECT price_cents AS cut_cents FROM r WHERE rn = (n + 1) // 2)
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       (SELECT CAST(cut_cents AS BIGINT) FROM cut) AS cut_cents
FROM orders o, cut
WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) >= cut.cut_cents
GROUP BY o.o_orderpriority
"""


@register("sql_scripting_block", oracle=_SCRIPT_ORACLE)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting (BEGIN…END): DECLARE a session variable,
    fill it with a data-derived exact threshold (the lower-median order
    price in cents — row_number selection, no float percentile), then
    run a second statement gated on the variable. The procedural
    surface every migration from stored-procedure warehouses asks for
    first; the oracle is the equivalent single declarative query, so
    the hash check proves the script computes exactly the relational
    answer.

    100-TB shape: each statement inside the block is planned by the
    same Catalyst pipeline as a standalone query (the threshold
    statement is one exact-selection window + LIMIT; the gated
    aggregate is one partial-agg scan) — scripting adds sequencing,
    not a new execution path. Scale bound: cents sums are int64-exact
    to ~9.2·10¹⁶ cents; the lower-median rank arithmetic is
    count-bounded."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE cut_cents BIGINT DEFAULT 0;
          SET cut_cents = (
            SELECT price_cents FROM (
              SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
                     ROW_NUMBER() OVER (
                       ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                                o_orderkey) AS rn,
                     COUNT(*) OVER () AS n
              FROM orders
            ) WHERE rn = (n + 1) DIV 2
          );
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
                 cut_cents AS cut_cents
          FROM orders
          WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) >= cut_cents
          GROUP BY o_orderpriority, cut_cents;
        END
        """
    )


# ---------------------------------------------------------------------------
# declarative SQL UDF, inlined by the optimizer
# ---------------------------------------------------------------------------

_SQLUDF_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS net_cents,
       CAST(SUM(CASE WHEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT) >= 500000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_large
FROM lineitem
GROUP BY l_returnflag
"""


@register("sql_udf_scalar", oracle=_SQLUDF_ORACLE)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 declarative SQL UDF (CREATE TEMPORARY FUNCTION … RETURN
    <expr>): the net-price-in-cents discipline packaged as a catalog
    function and used inside an aggregation. Unlike Python/JVM UDFs the
    body is INLINED by the optimizer — the plan is identical to writing
    the expression by hand (whole-stage codegen, pushdown intact), so
    this is the right way to share row-level business logic without
    leaving the declarative engine. The oracle inlines the body,
    proving pure substitution.

    100-TB shape: exactly q1_pricing_summary's — one partial-agg scan;
    the UDF adds zero plan nodes. Scale bound: cents sums int64-exact
    to ~9.2·10¹⁶ cents (the q1 bound)."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_cents(price DOUBLE, disc DOUBLE)"
        " RETURNS BIGINT RETURN CAST(ROUND(price * (1 - disc) * 100) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(net_cents(l_extendedprice, l_discount)) AS BIGINT)
                 AS net_cents,
               CAST(SUM(CASE WHEN net_cents(l_extendedprice, l_discount) >= 500000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_large
        FROM lineitem
        GROUP BY l_returnflag
        """
    )
