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

from pyspark.sql.window import Window

from clean_census_acs_data_spark.operators import dedup as D
from clean_census_acs_data_spark.queries import _t, register
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
    prev = _KCORE_PEELS - 1
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
dd AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS c FROM e{last} GROUP BY a)
SELECT n0.v AS doc_id,
       n0.v IN (SELECT v FROM a{last}) AS in_2core,
       CAST(COALESCE(dd.c, 0) AS BIGINT) AS core_degree,
       n0.v IN (SELECT v FROM a{prev})
         AND n0.v NOT IN (SELECT v FROM a{last}) AS dropped_in_last_peel
FROM n0 LEFT JOIN dd ON dd.v = n0.v"""
    )


@register("graph_kcore_decomposition", oracle=_kcore_oracle())
def graph_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the verified near-dup pair graph by iterative peeling
    (3 unrolled rounds: drop nodes with degree < 2, restrict edges to
    survivors, repeat — 3 rounds is exact on the planted fixture's
    diameter and the standard fixed-iteration discipline shared with
    graph_pagerank_int / kmeans_lloyd_int). Output: every node of the
    pair graph with its final in-core flag, its degree inside the last
    peeled subgraph, and ``dropped_in_last_peel`` — TRUE iff the node
    survived peel {PEELS-1} but fell in peel {PEELS}, which makes the
    fixed-prefix approximation self-describing (VERDICT r7 wart #3): if
    NO row has the flag set, the peeling converged and the 3-peel
    prefix IS the exact 2-core; any set flag tells consumers more peels
    could still shrink the core.

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
    prev_alive: DataFrame | None = None
    for _ in range(_KCORE_PEELS):
        deg = restrict(alive).groupBy(F.col("a").alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        # eager localCheckpoint: materializes AND truncates lineage —
        # each alive set is referenced 3× by the next round, so a
        # cache() alone leaves 2^i copies of the upstream lineage in
        # round-i plans and driver-side analysis dominates (see
        # operators/dedup.standard_undirected_edges)
        prev_alive = alive
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
        .join(
            F.broadcast(prev_alive.withColumnRenamed("v", "pv")),
            nodes.v == F.col("pv"),
            "left",
        )
        .select(
            F.col("v").alias("doc_id"),
            F.col("av").isNotNull().alias("in_2core"),
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("core_degree"),
            # convergence marker (VERDICT r7): survived peel N-1 but not
            # peel N — any TRUE row means the fixed prefix has not
            # converged and the true 2-core may be smaller still
            (F.col("pv").isNotNull() & F.col("av").isNull()).alias(
                "dropped_in_last_peel"
            ),
        )
    )


# ---------------------------------------------------------------------------
# margin-based bitext-style mining (Artetxe & Schwenk ratio margin)
# ---------------------------------------------------------------------------

_MARGIN_K = 4
_MARGIN_THRESH = "1.0"  # margin > 1.0: better than your average neighbor

# NOTE: both constants are interpolated into the oracle below AND used by
# the Spark plan, so changing either cannot silently desync the engines
# (ADVICE r7).
_MARGIN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
),
n AS (
  SELECT vec_id, label, q,
         CAST(list_sum(list_transform(range(1, len(q) + 1), j -> q[j] * q[j])) AS BIGINT) AS n2
  FROM e
),
cand AS (
  SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
         CAST(ROUND(1000000.0 *
           (CAST(CAST(list_sum(list_transform(range(1, len(s.q) + 1), j -> s.q[j] * t.q[j])) AS BIGINT) AS DOUBLE)
            / (sqrt(CAST(s.n2 AS DOUBLE)) * sqrt(CAST(t.n2 AS DOUBLE))))) AS BIGINT) AS cos_e6
  FROM n s JOIN n t
    ON s.label = t.label AND s.vec_id % 2 = 0 AND t.vec_id % 2 = 1
  WHERE s.n2 > 0 AND t.n2 > 0
),
pos AS (SELECT * FROM cand WHERE cos_e6 > 0),
kx AS (
  SELECT src_id, CAST(SUM(cos_e6) AS BIGINT) AS sx, CAST(COUNT(*) AS BIGINT) AS cx
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY cos_e6 DESC, tgt_id) AS rn
    FROM pos
  ) WHERE rn <= {_MARGIN_K} GROUP BY src_id
),
ky AS (
  SELECT tgt_id, CAST(SUM(cos_e6) AS BIGINT) AS sy, CAST(COUNT(*) AS BIGINT) AS cy
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY cos_e6 DESC, src_id) AS rn
    FROM pos
  ) WHERE rn <= {_MARGIN_K} GROUP BY tgt_id
),
m AS (
  SELECT pos.src_id, pos.tgt_id, pos.cos_e6,
         CAST(2 * pos.cos_e6 * kx.cx * ky.cy AS DOUBLE)
           / CAST(kx.sx * ky.cy + ky.sy * kx.cx AS DOUBLE) AS margin
  FROM pos JOIN kx USING (src_id) JOIN ky USING (tgt_id)
),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rn
  FROM m
)
SELECT src_id, tgt_id, cos_e6, margin
FROM best WHERE rn = 1 AND margin > {_MARGIN_THRESH}
"""


@register("xlingual_margin_mining", oracle=_MARGIN_ORACLE)
def xlingual_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based parallel-pair mining (the Artetxe & Schwenk ratio
    margin behind CCMatrix/LASER bitext mining): even vec_ids play the
    source space, odd ones the target space, candidates blocked by
    label (the stand-in for an ANN bucket). A pair wins when its
    cosine beats the AVERAGE of each side's k=4 nearest candidates —
    margin = cos(x,y) / ((avg_k cos(x,·) + avg_k cos(·,y)) / 2) > 1 —
    which kills hub vectors that are merely close to everything, the
    failure mode plain cosine thresholds have in dense regions.

    Determinism discipline: cosines are quantized to integer micros
    (the value itself is deterministic — integer dots over pre-
    quantized vectors, correctly-rounded ops only), the k-NN averages
    become exact integer sums over a rank-defined set, and the margin
    is ONE division of two exact integers — margin = 2·cos·cx·cy /
    (sx·cy + sy·cx) handles sides with fewer than k candidates without
    any float accumulation. Ranking/tiebreaks on (margin desc, tgt_id)
    are identical on both engines.

    Scale shape: candidates are blocked (label here, ANN bucket at
    100 TB), both k-NN stats come from ONE materialized candidate
    table (eager localCheckpoint — it feeds three consumers), and the
    per-side top-k are WindowGroupLimit-friendly rank filters. Nothing
    is corpus-quadratic; the mining margin is exactly the persisted
    artifact an alignment pipeline re-ranks after retrieval.

    Scale bound: integer dots are per-pair, ≤ dim·max(q)² (|q| ≤ 1e6·max|x| ≈ 2e6 → 6.4e13 at dim 16); kx/ky sums ≤ k·1e6 and the margin numerator 2·cos_e6·cx·cy ≤ 2e6·k² — all bounds are per-candidate, never corpus-sized."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1_000_000).cast("long"),
    )
    n2 = F.aggregate(
        F.transform(F.col("q"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    e = emb.select("vec_id", "label", qv.alias("q")).withColumn("n2", n2)
    s = e.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"),
        "label",
        F.col("q").alias("sq"),
        F.col("n2").alias("sn2"),
    )
    t = e.where(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"),
        "label",
        F.col("q").alias("tq"),
        F.col("n2").alias("tn2"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("sq"), F.col("tq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cos_e6 = F.round(
        F.lit(1000000.0)
        * (
            dot.cast("double")
            / (
                F.sqrt(F.col("sn2").cast("double"))
                * F.sqrt(F.col("tn2").cast("double"))
            )
        )
    ).cast("long")
    # one materialized candidate table feeds the two k-NN stats AND the
    # margin assembly (the iterative-lineage discipline: three
    # consumers would otherwise re-run the blocked dot-product join)
    # zero-norm guard (ADVICE r7): a zero vector makes the cosine 0/0 —
    # Spark (non-ANSI) yields NULL but DuckDB yields NaN, which sorts
    # above 0 and can error at CAST(ROUND(NaN) AS BIGINT). Filter the
    # degenerate rows identically on both engines before dividing.
    pos = (
        s.where(F.col("sn2") > 0)
        .join(t.where(F.col("tn2") > 0), "label")
        .select("src_id", "tgt_id", cos_e6.alias("cos_e6"))
        .where(F.col("cos_e6") > 0)
        .localCheckpoint(eager=True)
    )
    wx = Window.partitionBy("src_id").orderBy(F.desc("cos_e6"), F.asc("tgt_id"))
    kx = (
        pos.withColumn("rn", F.row_number().over(wx))
        .where(F.col("rn") <= _MARGIN_K)
        .groupBy("src_id")
        .agg(
            F.sum("cos_e6").cast("long").alias("sx"),
            F.count(F.lit(1)).cast("long").alias("cx"),
        )
    )
    wy = Window.partitionBy("tgt_id").orderBy(F.desc("cos_e6"), F.asc("src_id"))
    ky = (
        pos.withColumn("rn", F.row_number().over(wy))
        .where(F.col("rn") <= _MARGIN_K)
        .groupBy("tgt_id")
        .agg(
            F.sum("cos_e6").cast("long").alias("sy"),
            F.count(F.lit(1)).cast("long").alias("cy"),
        )
    )
    margin = (
        (F.lit(2) * F.col("cos_e6") * F.col("cx") * F.col("cy")).cast("double")
        / (F.col("sx") * F.col("cy") + F.col("sy") * F.col("cx")).cast("double")
    )
    m = (
        pos.join(kx, "src_id")
        .join(ky, "tgt_id")
        .select("src_id", "tgt_id", "cos_e6", margin.alias("margin"))
    )
    wbest = Window.partitionBy("src_id").orderBy(F.desc("margin"), F.asc("tgt_id"))
    return (
        m.withColumn("rn", F.row_number().over(wbest))
        .where((F.col("rn") == 1) & (F.col("margin") > float(_MARGIN_THRESH)))
        .select("src_id", "tgt_id", "cos_e6", "margin")
    )
