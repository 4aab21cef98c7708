"""Round-15 tier: profiling, rank-statistics, weighted graphs, coreset
selection, and calendar arithmetic — five shapes the registry lacked.

- ``fk_discovery_containment`` — inclusion-dependency profiling: for
  each candidate (column → column) pair across tables, the fraction of
  the left column's distinct values contained in the right column.
  The schema-discovery primitive behind auto-join suggestion and FK
  inference (every catalog crawler runs exactly this query).
- ``kendall_tau_rankings``     — Kendall's τ between two rankings of
  the nations (revenue rank vs customer-count rank) via exact
  concordant/discordant pair counts. The rank-correlation twin of
  stats_corr_covar's Pearson (which is moment-based, not rank-based).
- ``graph_sssp_weighted``      — bounded single-source shortest path
  with integer edge weights over the verified near-dup graph: min-plus
  relaxation, the weighted generalization of graph_bfs_distance
  (hop counts → weighted distances).
- ``kcenter_coreset_select``   — greedy k-center (farthest-point
  traversal) over exactly-quantized embeddings: the classic 2-approx
  coreset/diversity selector for training-data subset curation, each
  round picking the point farthest from every chosen center.
- ``business_day_latency``     — order→ship latency in BUSINESS days
  per order priority, via the closed-form weekday-count W(n) =
  5·(n div 7) + prefix(n mod 7) on epoch days — calendar arithmetic
  with zero per-day expansion (date_arithmetic covers calendar units;
  this covers the workweek calendar).

Determinism discipline per the package standard (queries.py module
docstring): integer arithmetic end-to-end; doubles only as single
post-aggregation divisions; argmax orderings made total with key
tiebreaks.

Reference tie: none (SURVEY.md §2D engine-extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.functions import cents
from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# inclusion-dependency (FK-candidate) containment profiling
# ---------------------------------------------------------------------------

# (label, left table, left col, right table, right col). The last pair
# is the negative control: custkeys are NOT supplier keys, so a real
# FK crawler must score it low — an all-green audit would be vacuous.
_FK_PAIRS = (
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->supplier.s_suppkey", "orders", "o_custkey", "supplier", "s_suppkey"),
)

_FK_ORACLE = " UNION ALL ".join(
    f"""
SELECT '{label}' AS fk_candidate,
       COUNT(*) AS n_left_distinct,
       COUNT(r) AS n_contained,
       CAST(COUNT(r) * 1000000 // COUNT(*) AS BIGINT) AS containment_ppm,
       COUNT(r) = COUNT(*) AS is_inclusion
FROM (SELECT DISTINCT {lc} AS v FROM {lt} WHERE {lc} IS NOT NULL) l
LEFT JOIN (SELECT DISTINCT {rc} AS r FROM {rt}) x ON l.v = x.r
"""
    for label, lt, lc, rt, rc in _FK_PAIRS
)


@register("fk_discovery_containment", oracle=_FK_ORACLE)
def fk_discovery_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency profiling over declared FK candidates: per
    (A.col → B.col) pair, |distinct(A) ∩ B| / |distinct(A)| in exact
    ppm. containment_ppm = 1e6 certifies the inclusion dependency
    (the FK precondition); the o_custkey→s_suppkey row is the negative
    control. This is the catalog-crawler primitive behind join-key
    suggestion and referential-integrity audits.

    100-TB shape: per pair, one partial-agg distinct on the left column
    (8-byte keys — the widest shuffle here carries key digests only)
    left-joined to the right side's distinct (dim-sided pairs broadcast
    under AQE); counts reduce to one row per pair. Never touches
    non-key columns (column pruning reaches the scan).

    Scale bound: COUNT(r)·1e6 < 2⁶³ while a column holds < 9.2·10¹²
    distinct values; operands are non-negative so Spark DIV
    (truncation) and DuckDB // (floor) agree."""
    frames = []
    for label, lt, lc, rt, rc in _FK_PAIRS:
        left = (
            _t(spark, sf_dir, lt)
            .where(F.col(lc).isNotNull())
            .select(F.col(lc).alias("v"))
            .distinct()
        )
        right = _t(spark, sf_dir, rt).select(F.col(rc).alias("r")).distinct()
        frames.append(
            left.join(right, left.v == right.r, "left").agg(
                F.lit(label).alias("fk_candidate"),
                F.count(F.lit(1)).alias("n_left_distinct"),
                F.count("r").alias("n_contained"),
                F.expr("CAST(count(r) * 1000000 DIV count(1) AS BIGINT)").alias(
                    "containment_ppm"
                ),
                (F.count("r") == F.count(F.lit(1))).alias("is_inclusion"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionAll(fr)
    return out


# ---------------------------------------------------------------------------
# Kendall's tau between two nation rankings (exact pair counts)
# ---------------------------------------------------------------------------

_TAU_ORACLE = """
WITH m AS (
  SELECT c.c_nationkey AS nk,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
         CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_cust
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
r AS (
  SELECT nk,
         ROW_NUMBER() OVER (ORDER BY rev_cents DESC, nk) AS rank_rev,
         ROW_NUMBER() OVER (ORDER BY n_cust DESC, nk) AS rank_cust
  FROM m
),
p AS (
  SELECT CAST(SUM(CASE WHEN (a.rank_rev - b.rank_rev) * (a.rank_cust - b.rank_cust) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN (a.rank_rev - b.rank_rev) * (a.rank_cust - b.rank_cust) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM r a JOIN r b ON a.nk < b.nk
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_items,
       n_pairs, concordant, discordant,
       CAST(concordant - discordant AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS tau
FROM p
"""


@register("kendall_tau_rankings", oracle=_TAU_ORACLE)
def kendall_tau_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ between the revenue ranking and the customer-count
    ranking of the nations: exact concordant/discordant counts over all
    C(n,2) nation pairs, τ = (C − D) / C(n,2) as the single final
    division. Row_number tiebreaks (desc metric, asc key) make both
    rankings total, so the pair signs are engine-independent — the
    rank-correlation complement to stats_corr_covar's Pearson r.

    100-TB shape: the only fact-scale work is the orders⋈customer
    revenue aggregate (partial agg, 8-byte keys); ranking and the
    quadratic pair join run on the |nations|-row frame, so the O(n²)
    term is dimension-bounded — the same argument as
    skew_key_diagnostics' top-10. Scale bound: rank differences are
    < |nations| so the sign product stays far inside int64 at any
    population."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    m = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(cents("o_totalprice")).alias("rev_cents"),
            F.countDistinct("c_custkey").alias("n_cust"),
        )
    )
    r = m.select(
        "nk",
        F.row_number()
        .over(Window.orderBy(F.desc("rev_cents"), F.asc("nk")))
        .alias("rank_rev"),
        F.row_number()
        .over(Window.orderBy(F.desc("n_cust"), F.asc("nk")))
        .alias("rank_cust"),
    )
    a = r.select(
        F.col("nk").alias("a_nk"),
        F.col("rank_rev").alias("a_rev"),
        F.col("rank_cust").alias("a_cust"),
    )
    b = r.select(
        F.col("nk").alias("b_nk"),
        F.col("rank_rev").alias("b_rev"),
        F.col("rank_cust").alias("b_cust"),
    )
    sign = (F.col("a_rev") - F.col("b_rev")) * (F.col("a_cust") - F.col("b_cust"))
    pairs = a.join(b, F.col("a_nk") < F.col("b_nk")).agg(
        F.sum(F.when(sign > 0, 1).otherwise(0)).cast("long").alias("concordant"),
        F.sum(F.when(sign < 0, 1).otherwise(0)).cast("long").alias("discordant"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    n_items = m.agg(F.count(F.lit(1)).alias("n_items"))
    return pairs.crossJoin(F.broadcast(n_items)).select(
        "n_items",
        "n_pairs",
        "concordant",
        "discordant",
        (
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.col("n_pairs").cast("double")
        ).alias("tau"),
    )


# ---------------------------------------------------------------------------
# bounded weighted SSSP over the near-dup graph (min-plus relaxation)
# ---------------------------------------------------------------------------

_SSSP_HOPS = 3
_SSSP_SEED = 0  # doc_id of the source vertex


def _sssp_oracle() -> str:
    from clean_census_acs_data_spark.queries_ext import _MINHASH_ORACLE

    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE.strip()}) WHERE jaccard >= 0.5),
edges AS (
  SELECT doc_a AS v, doc_b AS w FROM pairs
  UNION
  SELECT doc_b AS v, doc_a AS w FROM pairs
),
walk(v, total, hops) AS (
  SELECT CAST({_SSSP_SEED} AS BIGINT), CAST(0 AS BIGINT), 0
  UNION ALL
  SELECT e.w, walk.total + 1 + (e.v + e.w) % 5, walk.hops + 1
  FROM walk JOIN edges e ON e.v = walk.v
  WHERE walk.hops < {_SSSP_HOPS}
)
SELECT v AS doc_id, CAST(MIN(total) AS BIGINT) AS dist_weighted
FROM walk GROUP BY v
"""


@register("graph_sssp_weighted", oracle=_sssp_oracle())
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded single-source shortest path with integer edge weights
    (w(a,b) = 1 + (a+b) mod 5 — symmetric, deterministic) over the
    verified near-dup graph: 3 min-plus relaxation rounds from the
    seed document, the weighted generalization of graph_bfs_distance.
    After round r the frame holds min path weight over all ≤ r-hop
    paths — exactly the oracle CTE's bounded walk, so unreachable-
    within-3-hops vertices are absent on both engines.

    Scale shape: each relaxation is one equi join (current distances ⋈
    edge list, both keyed on vertex) plus a min aggregation — the
    connected-components discipline with a weight accumulator; the
    session-shared localCheckpoint-ed edge list truncates lineage so
    round-r plans stay flat. Scale bound: path totals ≤ hops·(1+max_w)
    = 3·6, doc-id-independent — trivially inside int64.
    """
    from clean_census_acs_data_spark.operators.dedup import (
        standard_undirected_edges,
    )

    edges = standard_undirected_edges(spark, sf_dir, threshold=0.5).select(
        F.col("a").alias("v"),
        F.col("b").alias("w"),
        (1 + (F.col("a") + F.col("b")) % 5).cast("long").alias("wt"),
    )
    dist = spark.createDataFrame(
        [(int(_SSSP_SEED), 0)], "doc_id bigint, dist_weighted bigint"
    )
    for _ in range(_SSSP_HOPS):
        relaxed = (
            dist.join(edges, dist.doc_id == edges.v)
            .select(
                F.col("w").alias("doc_id"),
                (F.col("dist_weighted") + F.col("wt")).alias("dist_weighted"),
            )
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("doc_id")
            .agg(F.min("dist_weighted").alias("dist_weighted"))
        )
    return dist


# ---------------------------------------------------------------------------
# greedy k-center coreset selection over quantized embeddings
# ---------------------------------------------------------------------------

_KC_ROUNDS = 3  # selections after the seed → 4 centers total
_KC_SEED = 0  # vec_id of the first center

_KC_QUANT = (
    "list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
)
# squared L2 between two quantized lists — exact BIGINT
_KC_D2 = (
    "CAST(list_sum(list_transform(range(1, len({a}) + 1),"
    " j -> ({a}[j] - {b}[j]) * ({a}[j] - {b}[j]))) AS BIGINT)"
)


def _kcenter_oracle() -> str:
    parts = [
        f"WITH e AS (SELECT vec_id, {_KC_QUANT} AS q FROM embeddings),",
        f"c0 AS (SELECT q AS cq FROM e WHERE vec_id = {_KC_SEED}),",
        "d1 AS (SELECT e.vec_id, e.q, "
        + _KC_D2.format(a="e.q", b="c0.cq")
        + " AS mind FROM e, c0),",
    ]
    for r in range(1, _KC_ROUNDS + 1):
        parts.append(
            f"s{r} AS (SELECT vec_id, q, mind FROM d{r} "
            f"ORDER BY mind DESC, vec_id LIMIT 1),"
        )
        if r < _KC_ROUNDS:
            d2 = _KC_D2.format(a=f"d{r}.q", b=f"s{r}.q")
            parts.append(
                f"d{r + 1} AS (SELECT d{r}.vec_id, d{r}.q, "
                f"LEAST(d{r}.mind, {d2}) AS mind FROM d{r}, s{r}),"
            )
    parts[-1] = parts[-1].rstrip(",")
    selects = [
        f"SELECT CAST(0 AS BIGINT) AS sel_round, CAST({_KC_SEED} AS BIGINT) AS vec_id,"
        " CAST(0 AS BIGINT) AS radius_sq"
    ]
    for r in range(1, _KC_ROUNDS + 1):
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS sel_round, vec_id,"
            f" mind AS radius_sq FROM s{r}"
        )
    return "\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@register("kcenter_coreset_select", oracle=_kcenter_oracle())
def kcenter_coreset_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point traversal) coreset selection:
    starting from a seed vector, each round picks the point with the
    MAXIMUM distance to its nearest chosen center (ties → lowest
    vec_id) — the classic 2-approximation for the k-center objective
    and the standard diversity selector for training-data subset
    curation. Distances are exact integer squared-L2 over the shared
    ×1e6 embedding quantization (queries_ext._quant_list), so the
    argmax is bit-deterministic on both engines; radius_sq is the
    selected point's min-distance at selection time (the coverage
    radius achieved by the previous center set).

    100-TB shape: k passes, each one full scan computing a running
    least(min-dist, d²(·, new center)) against a BROADCAST 1-row
    center, then a TakeOrderedAndProject argmax — never a pairwise
    join; state is one column. In production the quantized frame is
    cached once (here the 3-round chain recomputes the narrow
    quantize, cheaper than a cache fill at test scale — cold-A/B'd
    per the round-8/9 discipline).

    Scale bound: per-element (Δq)² ≤ (2·10⁶)² = 4·10¹²; summed over
    dim ≤ 1000 stays < 4·10¹⁵ ≪ 2⁶³ — no overflow at any corpus size.
    """
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("q"),
    )
    d2 = (
        "aggregate(zip_with(q, cq, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    c0 = e.where(F.col("vec_id") == _KC_SEED).select(F.col("q").alias("cq"))
    d = e.crossJoin(F.broadcast(c0)).select(
        "vec_id", "q", F.expr(d2).cast("long").alias("mind")
    )
    rows = [
        spark.createDataFrame(
            [(0, int(_KC_SEED), 0)], "sel_round bigint, vec_id bigint, radius_sq bigint"
        )
    ]
    for r in range(1, _KC_ROUNDS + 1):
        sel = d.orderBy(F.desc("mind"), F.asc("vec_id")).limit(1)
        rows.append(
            sel.select(
                F.lit(r).cast("long").alias("sel_round"),
                "vec_id",
                F.col("mind").alias("radius_sq"),
            )
        )
        if r < _KC_ROUNDS:
            c = sel.select(F.col("q").alias("cq"), F.col("mind").alias("_selmind"))
            d = (
                d.crossJoin(F.broadcast(c))
                .select(
                    "vec_id",
                    "q",
                    F.least(F.col("mind"), F.expr(d2).cast("long")).alias("mind"),
                )
            )
    out = rows[0]
    for fr in rows[1:]:
        out = out.unionAll(fr)
    return out


# ---------------------------------------------------------------------------
# business-day latency (closed-form weekday counting)
# ---------------------------------------------------------------------------

# W(n) = weekdays among epoch days [0, n): epoch day 0 = Thu 1970-01-01,
# so the mod-7 sequence is Thu Fri Sat Sun Mon Tue Wed and the prefix
# counts are 0,1,2,2,2,3,4 (full week = 5). Shared SQL text keeps the
# CASE bit-identical on both engines.
_BUSDAY_PREFIX = (
    "CASE ({n}) % 7 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 2"
    " WHEN 4 THEN 2 WHEN 5 THEN 3 ELSE 4 END"
)


def _busday_w(n: str) -> str:
    # integer division: n is always >= 0 here (dates are post-1970), so
    # truncation (Spark DIV) == floor (DuckDB //); the shared /-free
    # spelling below parses as integer division on both engines via DIV
    # (Spark) and // (DuckDB) — interpolated per engine. The inner
    # parens around (n) {div} 7 are load-bearing: *, DIV and // share
    # precedence and left-associate on both engines, so the unparenthesized
    # form would compute (5*n) div 7, not 5*(n div 7).
    return f"(5 * (({n}) {{div}} 7) + {_BUSDAY_PREFIX.format(n=n)})"


_BUSDAY_ORACLE = f"""
WITH j AS (
  SELECT o.o_orderpriority,
         date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS od,
         date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE)) AS sd
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM({_busday_w("sd").format(div="//")}
              - {_busday_w("od").format(div="//")}) AS BIGINT) AS sum_busdays,
       CAST(SUM({_busday_w("sd").format(div="//")}
              - {_busday_w("od").format(div="//")}) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_busdays
FROM j
GROUP BY o_orderpriority
"""


@register("business_day_latency", oracle=_BUSDAY_ORACLE)
def business_day_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency in BUSINESS days (Mon–Fri) per order
    priority, via the closed-form weekday count W(n) = 5·(n div 7) +
    prefix(n mod 7) on epoch days — business days in [order, ship) =
    W(ship) − W(order), zero per-day row expansion (a generate-series
    + filter approach would multiply the fact table ~30×). The workweek
    complement of date_arithmetic's calendar units.

    100-TB shape: one fact⋈fact equi join on the order key (both sides
    shuffle-partitioned on it; the lineitem side prunes to two
    columns), then a partial agg on the 5-value priority — the
    dominant cost is the join Exchange, identical to
    sortmerge_join_fact's. Scale bound: epoch days < 10⁵ for any
    realistic date, W(n) < 10⁵, sums bounded by 10⁵·|lineitem| — int64
    wraps only past 9.2·10¹³ lineitems (a 9000-TB fact table).
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("od"),
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01")).alias("sd"),
    )
    busdays = F.expr(
        f"{_busday_w('sd').format(div='DIV')} - {_busday_w('od').format(div='DIV')}"
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(busdays).cast("long").alias("sum_busdays"),
        )
        .select(
            "o_orderpriority",
            "n_items",
            "sum_busdays",
            (F.col("sum_busdays").cast("double") / F.col("n_items").cast("double")).alias(
                "avg_busdays"
            ),
        )
    )
