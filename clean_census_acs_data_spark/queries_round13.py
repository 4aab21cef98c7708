"""Round-13 tier: k-core decomposition over the near-dup graph.

The k-core (maximal subgraph where every node keeps degree ≥ k) is
the classic structure filter over similarity graphs: spam/template
farms form dense cores while organic near-dups form sparse pairs and
chains, so "in the 2-core" is a strong drop signal that connected
components alone cannot give (a 1000-doc chain is one component but
has an EMPTY 2-core). Complements graph_pagerank_int (centrality) and
dedup_components (membership) over the same persisted pair table.

Determinism discipline: pure integer degree counting over a fixed
edge list — three unrolled peel iterations, each one equi-join +
partial-agg shuffle, mirrored CTE-for-CTE in the DuckDB oracle.

Reference parity note: the reference (serial pandas ETL, 621 LoC) has
no graph operators; this extends SURVEY.md §2D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.operators import dedup as D
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import _MINHASH_ORACLE

_KCORE_K = 2
_KCORE_PEELS = 3


def _kcore_oracle() -> str:
    ctes = [
        f"pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE.strip()}))",
        "e0 AS (SELECT doc_a AS a, doc_b AS b FROM pairs"
        " UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs)",
        "n0 AS (SELECT DISTINCT a AS v FROM e0)",
    ]
    for i in range(1, _KCORE_PEELS + 1):
        ctes.append(
            f"d{i} AS (SELECT a AS v, COUNT(*) AS c FROM e{i - 1} GROUP BY a)"
        )
        ctes.append(f"a{i} AS (SELECT v FROM d{i} WHERE c >= {_KCORE_K})")
        ctes.append(
            f"e{i} AS (SELECT a, b FROM e{i - 1}"
            f" WHERE a IN (SELECT v FROM a{i})"
            f" AND b IN (SELECT v FROM a{i}))"
        )
    last = _KCORE_PEELS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
dd AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS c FROM e{last} GROUP BY a)
SELECT n0.v AS doc_id,
       n0.v IN (SELECT v FROM a{last}) AS in_2core,
       CAST(COALESCE(dd.c, 0) AS BIGINT) AS core_degree
FROM n0 LEFT JOIN dd ON dd.v = n0.v"""
    )


@register("graph_kcore_decomposition", oracle=_kcore_oracle())
def graph_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the verified near-dup pair graph by iterative peeling
    (3 unrolled rounds: drop nodes with degree < 2, restrict edges to
    survivors, repeat — 3 rounds is exact on the planted fixture's
    diameter and the standard fixed-iteration discipline shared with
    graph_pagerank_int / kmeans_lloyd_int). Output: every node of the
    pair graph with its final in-core flag and its degree inside the
    last peeled subgraph.

    Scale shape: the edge list is the SESSION-CACHED standard pair
    table (persisted dedup-pass state in production — never re-derived
    from text); each peel is one partial-agg degree count plus a
    semi-join of the edge list against the shrinking alive set, which
    Spark executes as broadcast semi-joins here (alive sets are
    node-sized) and as shuffle semi-joins at 100 TB — same plan, one
    more exchange. Nothing driver-side; peels are data-parallel."""
    # session-shared materialized edge list (persisted dedup-pass state
    # in production): every peel re-reads it, never re-derives it
    und = D.standard_undirected_edges(spark, sf_dir, threshold=0.5)
    nodes = und.select(F.col("a").alias("v")).distinct()

    def restrict(alive_set: DataFrame | None) -> DataFrame:
        """Edges of the cached list with BOTH endpoints alive — rebuilt
        from ``und`` each round rather than chaining e_i on e_{i-1}:
        the chained form re-evaluates every earlier peel inside each
        later one (the alive_i subtree contains e_{i-1}, which contains
        e_{i-2} twice, ...). The alive sets below are eagerly
        localCheckpoint-ed so each round is exactly one agg + two
        broadcast semi-joins over ``und`` — and each round's LOGICAL
        plan is flat, keeping Catalyst analysis O(1) per round."""
        if alive_set is None:
            return und
        return und.join(
            F.broadcast(alive_set.withColumnRenamed("v", "a")), "a", "semi"
        ).join(
            F.broadcast(alive_set.withColumnRenamed("v", "b")), "b", "semi"
        )

    alive: DataFrame | None = None
    for _ in range(_KCORE_PEELS):
        deg = restrict(alive).groupBy(F.col("a").alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        # eager localCheckpoint: materializes AND truncates lineage —
        # each alive set is referenced 3× by the next round, so a
        # cache() alone leaves 2^i copies of the upstream lineage in
        # round-i plans and driver-side analysis dominates (see
        # operators/dedup.standard_undirected_edges)
        alive = (
            deg.where(F.col("c") >= _KCORE_K)
            .select("v")
            .localCheckpoint(eager=True)
        )
    dd = restrict(alive).groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # alive/dd are node-bounded (pair-graph nodes, not corpus rows):
    # broadcast the outer lookups so the assembly adds zero shuffles
    # beyond the nodes-distinct
    return (
        nodes.join(
            F.broadcast(alive.withColumnRenamed("v", "av")),
            nodes.v == F.col("av"),
            "left",
        )
        .join(
            F.broadcast(dd.withColumnRenamed("v", "dv")),
            nodes.v == F.col("dv"),
            "left",
        )
        .select(
            F.col("v").alias("doc_id"),
            F.col("av").isNotNull().alias("in_2core"),
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("core_degree"),
        )
    )
