"""Round-12 wave 13: the ITERATOR-form scalar Pandas UDF — the last
uncovered Python-boundary API (scalar pandas_udf: pandas_scalar_cosine;
grouped map: applyinpandas_minmax_scale; grouped agg:
pandas_weighted_median; cogrouped: cogroup_click_purchase_stats;
mapInPandas/mapInArrow: multimodal tier; UDTF static/polymorphic:
udtf_tokenize / udtf_ngrams_polymorphic; foreachBatch: audit sink).

``pandas_iter_udf_bucketize``: an ``Iterator[pd.Series] →
Iterator[pd.Series]`` UDF whose expensive setup (here a deterministic
label table; in production a tokenizer, an ONNX session, a decoder)
runs ONCE PER PARTITION before the batch loop — the amortization
pattern that makes model-inference UDFs viable at scale (per-batch
init would pay the cost hundreds of times per task). The work itself
is exact integer bucketing so the DuckDB oracle hash-matches.

Reference tie: none (SURVEY.md §2B) — Python-boundary API tier.
"""

# NO `from __future__ import annotations` here: postponed evaluation
# turns the iterator UDF's signature into literal strings, and
# pandas_udf's eval-type inference rejects the string form
# (UNSUPPORTED_SIGNATURE) — same class of gotcha as applyInArrow's
# annotation crash noted in the round-4 workflow checklist.
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_N_BUCKETS = 10
_BUCKET_WIDTH_CENTS = 5000

_ITER_ORACLE = f"""
SELECT event_id,
       CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
       concat('band_', CAST(LEAST(CAST(ROUND(value * 100) AS BIGINT)
                                  // {_BUCKET_WIDTH_CENTS},
                                  {_N_BUCKETS - 1}) AS VARCHAR)) AS bucket
FROM events
"""


@register("pandas_iter_udf_bucketize", oracle=_ITER_ORACLE)
def pandas_iter_udf_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form scalar Pandas UDF: the label table ('band_0'..)
    builds once per PARTITION (the `# init` section before the batch
    loop), then every Arrow batch is a vectorized numpy take against
    it — the structure a model-inference UDF needs (load the model
    once, score many batches). The bucketing itself is exact integer
    arithmetic (cents DIV width, capped), so the output hash-matches
    the SQL oracle; the ENTRY's value is the API shape, and the
    equivalent JVM expression is stated in the oracle for the
    Python-tax comparison (same twin discipline as udtf_tokenize vs
    explode_tokens).

    100-TB shape: row-local (no shuffle); Arrow batches stream through
    the worker with O(1) per-partition setup. If the per-row work were
    expressible as built-ins (as here), the JVM expression wins — the
    iterator UDF is for when it is not (external models/codecs)."""
    import pandas as pd
    from collections.abc import Iterator

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def bucketize(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        # init: once per partition — the amortized expensive setup
        labels = np.array([f"band_{i}" for i in range(_N_BUCKETS)], dtype=object)
        for cents in batches:
            idx = np.minimum(
                cents.to_numpy(dtype="int64") // _BUCKET_WIDTH_CENTS,
                _N_BUCKETS - 1,
            )
            yield pd.Series(labels[idx])

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return ev.withColumn("bucket", bucketize(F.col("value_cents")))


# ---------------------------------------------------------------------------
# modern-SQL sugar: GROUP BY ALL / ORDER BY ALL, one shared text
# ---------------------------------------------------------------------------

_GBA_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@register("sql_group_by_all", oracle=_GBA_SQL)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL — the modern-SQL sugar both engines
    parse IDENTICALLY: the oracle string IS the Spark query (same
    shared-text discipline as sql_pipe_syntax and
    lateral_topk_per_nation), proving dialect parity for the clause a
    generated-SQL layer leans on (no fragile positional GROUP BY lists
    to keep in sync with the select list).

    100-TB shape: identical plan to the explicit GROUP BY — partial
    aggregation to the 15-cell grid, a tiny global sort of the
    aggregate. The sugar is parse-time only."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GBA_SQL)
