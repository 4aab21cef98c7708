"""Round-6 tier: incremental maintenance for similarity search.

- ``incremental_topk_maintenance`` — maintain a cosine top-k result
  under batch appends WITHOUT rescanning the corpus: the stored top-k
  of the base set merges with the top-k of the delta batch, and
  top-k(old ∪ delta-topk) ≡ top-k(whole corpus) because top-k under a
  total order is a semilattice merge (same algebra that makes
  incremental_agg_maintenance work for subtractable aggregates, here
  for rank selection). The DuckDB oracle computes the full-corpus
  top-k directly, so the hash gate PROVES the incremental merge equals
  the full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.operators import similarity as S
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import _dot, _quant_list

_DELTA_FROM = 400  # vec_id >= this = the newly-appended batch

_INC_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, {_quant_list("embedding")} AS q FROM embeddings),
qq AS (SELECT q AS qv, {_dot("q", "q")} AS qn2 FROM e WHERE vec_id = 0),
sc AS (
  SELECT vec_id,
         CAST({_dot("q", "qv")} AS DOUBLE) /
         (sqrt(CAST({_dot("q", "q")} AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE))) AS cosine
  FROM e, qq WHERE vec_id <> 0
)
SELECT vec_id, cosine FROM sc ORDER BY cosine DESC, vec_id LIMIT 10
"""


@register("incremental_topk_maintenance", oracle=_INC_TOPK_ORACLE)
def incremental_topk_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors maintained incrementally: the persisted
    top-10 over the base corpus (vec_id < {_DELTA_FROM}) merges with
    the top-10 of the appended delta batch (vec_id ≥ {_DELTA_FROM}),
    and the 20-row union re-ranks to the final 10. The oracle computes
    the FULL-corpus top-10 directly — hash equality proves
    top-k(top-k(A) ∪ top-k(B)) = top-k(A ∪ B), the semilattice law
    that makes ANN serving indexes appendable.

    At 100 TB this is the difference between scoring a day's delta
    (delta-sized scan + a 2k-row merge) and rescanning the corpus per
    refresh; the interactive-session top-k literature (EDBT 2020
    incremental top-k) is built on exactly this merge. Both legs are
    the existing heap top-k operator (broadcast query vector,
    TakeOrderedAndProject); the merge is a 20-row sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0)
    base = emb.where((F.col("vec_id") != 0) & (F.col("vec_id") < _DELTA_FROM))
    delta = emb.where(F.col("vec_id") >= _DELTA_FROM)
    old_topk = S.brute_force_topk(base.unionAll(qrow), query_id=0, k=10)
    delta_topk = S.brute_force_topk(delta.unionAll(qrow), query_id=0, k=10)
    return (
        old_topk.unionAll(delta_topk)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )
