"""Round-18 tier: rank statistics, information theory, string-similarity
join pruning, and the MapReduce-classic components algorithm.

- ``spearman_rho_exact``      — per-nation Spearman rank correlation with
  tie-averaged ranks kept EXACT via integer double-ranks (2·rank+ties−1);
  every sum is int64, the only float ops are the shared-text final
  division and an IEEE-correctly-rounded sqrt.
- ``mutual_information_cells`` — exact mutual information between
  l_returnflag and l_linestatus in integer micro-nats via the
  deterministic atanh-series ln (functions/detmath), decomposed
  sign-definite as ln(N/c_x) − ln(c_y/c_xy).
- ``edjoin_edit_distance_pairs`` — exact edit-similarity join: sliding
  length blocks + the exact char-bag bound prune candidates, banded
  levenshtein verifies (Ed-Join's prefix filter measured and rejected
  in-docstring).
- ``components_large_star``   — connected components via the alternating
  large-star/small-star algorithm (Kiveris et al., SoCC'14); same
  oracle as dedup_components — two algorithms, one fixpoint.

Determinism discipline per the package standard: integer cents/ranks/
counts, micro-nat quantization of deterministic doubles BEFORE integer
sums, single final divisions, IEEE-exact sqrt only.

Reference tie: none (SURVEY.md §2D engine-extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clean_census_acs_data_spark.functions.detmath import det_ln_ratio
from clean_census_acs_data_spark.io import load_table, register_views
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import (
    _COMPONENTS_ORACLE,
    _PLANTED_DOCS,
    _dot,
    _quant_list,
)
from clean_census_acs_data_spark.session import tracked_cache


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Spearman rank correlation, tie-exact via integer double-ranks
# ---------------------------------------------------------------------------

# ONE dialect-shared text: Spark runs it via spark.sql on registered
# views, DuckDB runs it verbatim — bit-parity by construction. The
# tie-averaged rank r + (c−1)/2 is kept integer as the DOUBLE-RANK
# 2·rank + c − 1; Spearman = Pearson on (double-)ranks, and scaling
# both variables by 2 cancels in rho. All sums are exact int64; the
# final expression is int64→double conversions (exact to 2^53), one
# multiply, one IEEE-correctly-rounded sqrt, one division — the only
# transcendental-free float tail the repo's detmath contract allows.
_SPEARMAN_SQL = """
WITH spend AS (
  SELECT o_custkey AS cust,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT c.c_nationkey AS nk,
         CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal_cents,
         s.spend_cents
  FROM customer c JOIN spend s ON c.c_custkey = s.cust
),
r AS (
  SELECT nk,
         CAST(2 * RANK() OVER (PARTITION BY nk ORDER BY bal_cents)
              + COUNT(*) OVER (PARTITION BY nk, bal_cents) - 1 AS BIGINT)
           AS drx,
         CAST(2 * RANK() OVER (PARTITION BY nk ORDER BY spend_cents)
              + COUNT(*) OVER (PARTITION BY nk, spend_cents) - 1 AS BIGINT)
           AS dry
  FROM base
),
agg AS (
  SELECT nk,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(drx * dry) AS BIGINT) AS sxy,
         CAST(SUM(drx) AS BIGINT) AS sx,
         CAST(SUM(dry) AS BIGINT) AS sy,
         CAST(SUM(drx * drx) AS BIGINT) AS sxx,
         CAST(SUM(dry * dry) AS BIGINT) AS syy
  FROM r GROUP BY nk
)
SELECT nat.n_name AS nation_name,
       a.n AS n_cust,
       CAST(a.n * a.sxy - a.sx * a.sy AS BIGINT) AS rho_num,
       CASE WHEN (a.n * a.sxx - a.sx * a.sx) > 0
             AND (a.n * a.syy - a.sy * a.sy) > 0
            THEN CAST(a.n * a.sxy - a.sx * a.sy AS DOUBLE)
                 / sqrt(CAST(a.n * a.sxx - a.sx * a.sx AS DOUBLE)
                        * CAST(a.n * a.syy - a.sy * a.sy AS DOUBLE))
            ELSE NULL END AS spearman_rho
FROM agg a JOIN nation nat ON a.nk = nat.n_nationkey
"""


@register("spearman_rho_exact", oracle=_SPEARMAN_SQL)
def spearman_rho_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Spearman rank correlation between a customer's account
    balance and their total order spend — the tie-robust monotone-
    association companion to kendall_tau_rankings (which counts pair
    concordance) and stats_corr_covar (Pearson on raw values). Ranks
    use the standard tie-average, kept EXACT as integer double-ranks
    (2·rank + tie_count − 1 = twice the average rank); the uniform ×2
    cancels in rho, so the statistic is textbook Spearman with no float
    rank arithmetic anywhere.

    100-TB shape: one groupBy(custkey) partial agg, a fact⋈fact equi
    join, two ranking windows partitioned by the 25-value nation key
    (the skew-bounded partition column), then a 25-row aggregate — the
    windows are the dominant exchange, same profile as window_rank.
    Scale bound: double-ranks ≤ 2n per nation; n·Σ(drx·dry) ≤ 4n⁴ —
    int64-exact to n ≈ 3.9×10⁴ customers per nation ((2⁶¹)^¼), and the
    final int64→double conversions stay 2^53-exact to n ≈ 6.9×10³
    ((2⁵¹)^¼; beyond that both engines round the SAME shared-text
    conversion identically, so cross-engine parity holds even when the
    last ulp is lossy). Past ~4×10⁴ per group the sums need
    DECIMAL(38,0) (the corpus_mix_sample discipline) — at that point
    switch the agg casts, not the algorithm."""
    register_views(spark, sf_dir)
    return spark.sql(_SPEARMAN_SQL)


# ---------------------------------------------------------------------------
# exact mutual information in integer micro-nats
# ---------------------------------------------------------------------------


def _mi_sql(div: str) -> str:
    # PMI(x,y) = ln(N·c_xy / (c_x·c_y)) decomposed SIGN-DEFINITE into
    # ln(N/c_x) − ln(c_y/c_xy): both ratios ≥ 1 by construction
    # (marginals bound cells), so each term is one det_ln_ratio on its
    # natural ≥1 orientation — the r7 discipline that also avoids the
    # BIGINT overflow of cross-multiplied single-ratio forms.
    t1 = det_ln_ratio("n", "c_x", div=div)
    t2 = det_ln_ratio("c_y", "c_xy", div=div)
    return f"""
WITH c AS (
  SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM lineitem GROUP BY l_returnflag, l_linestatus
),
m AS (
  SELECT l_returnflag, l_linestatus, c_xy,
         CAST(SUM(c_xy) OVER (PARTITION BY l_returnflag) AS BIGINT) AS c_x,
         CAST(SUM(c_xy) OVER (PARTITION BY l_linestatus) AS BIGINT) AS c_y,
         CAST(SUM(c_xy) OVER () AS BIGINT) AS n
  FROM c
),
p AS (
  SELECT l_returnflag, l_linestatus, c_xy, c_x, c_y, n,
         CAST(ROUND(({t1} - {t2}) * 1E6) AS BIGINT) AS pmi_micro_nats
  FROM m
)
SELECT l_returnflag, l_linestatus, c_xy, c_x, c_y, pmi_micro_nats,
       CAST(c_xy * pmi_micro_nats AS BIGINT) AS contrib_micro,
       CAST(SUM(c_xy * pmi_micro_nats) OVER () AS BIGINT) AS mi_sum_micro,
       CAST(SUM(c_xy * pmi_micro_nats) OVER () AS DOUBLE)
         / CAST(n AS DOUBLE) / 1E6 AS mi_nats
FROM p
"""


@register("mutual_information_cells", oracle=_mi_sql("//"))
def mutual_information_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mutual information between l_returnflag and l_linestatus
    (TPC-H's canonically dependent pair: returns only exist for old
    shipdates, status F only for recent ones) — per-cell PMI plus the
    count-weighted MI total, the feature-dependence score a training
    pipeline uses to drop redundant categoricals and audit label
    leakage. Each cell's ln is the deterministic atanh-series
    (micro-nat-quantized BEFORE the integer contribution sum, so the
    cross-cell total is order-free); MI itself is one final shared-text
    division pair.

    100-TB shape: one partial-agg scan to the (|X|·|Y|)-cell frame,
    then in-frame windows over ≤ dozens of rows — marginals never
    re-scan the fact table. Scale bound: pmi_micro ≤ 44·10⁶ (ln of any
    int64 ratio < 44 nats); Σ c_xy·pmi_micro ≤ 4.4·10⁷·N — int64 to
    N ≈ 2×10¹¹ rows."""
    register_views(spark, sf_dir)
    return spark.sql(_mi_sql("DIV"))


# ---------------------------------------------------------------------------
# Ed-Join: edit-distance similarity join with lossless prefix pruning
# ---------------------------------------------------------------------------

_EDJOIN_Q = 3  # q-gram width
_EDJOIN_D = 10  # edit-distance threshold

# The oracle is the NAIVE definition (block-free pair join + full
# levenshtein): the Spark side's prefix filter is a candidate-pruning
# device and must be LOSSLESS, so the verified output is filter-
# independent — exactly what the hash check proves. Two EXACT lower
# bounds keep DuckDB's unbanded O(n·m) levenshtein off the 6k+
# length-compatible pairs: |Δlen| ≤ d, and the character-bag bound
# ed ≥ L1(char histograms)/2 (a substitution moves two counts by 1,
# an indel one — and untracked characters only make the bound
# LOOSER, never wrong). The CTE is MATERIALIZED because DuckDB
# otherwise reorders the cheap bounds BEHIND the levenshtein call
# (measured 24 s → 0.6 s at sf0.01). Documents shorter than q chars
# carry no q-gram signature and are outside the operator's declared
# domain on BOTH sides (fixtures: min length 48).
_EDJOIN_HIST = (
    "list_transform(string_split('a b c d e f g h i j k l m n o p q r s t"
    " u v w x y z', ' ') || [' '],"
    " ch -> length(text) - length(replace(text, ch, '')))"
)

_EDJOIN_ORACLE = f"""
WITH base AS ({_PLANTED_DOCS}),
d AS (
  SELECT doc_id, text, {_EDJOIN_HIST} AS h
  FROM base WHERE length(text) >= {_EDJOIN_Q}
),
cand AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.text AS ta, b.text AS tb
  FROM d a JOIN d b
    ON a.doc_id < b.doc_id
   AND abs(length(a.text) - length(b.text)) <= {_EDJOIN_D}
   AND list_sum(list_transform(range(1, 28), j -> abs(a.h[j] - b.h[j])))
       <= {2 * _EDJOIN_D}
)
SELECT doc_a, doc_b, CAST(levenshtein(ta, tb) AS BIGINT) AS edit_distance
FROM cand WHERE levenshtein(ta, tb) <= {_EDJOIN_D}
"""


@register("edjoin_edit_distance_pairs", oracle=_EDJOIN_ORACLE)
def edjoin_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT edit-distance similarity join (levenshtein ≤ d = 10) over
    the planted corpus — the edit-distance complement of
    setsim_join_prefix_filter (PPJoin, Jaccard): together they cover
    both classic exact string-similarity-join regimes. Finds every
    planted first-token-dropped near-dup (ed = len(token)+1 ≤ 10).

    Plan: SLIDING LENGTH BLOCKS generate candidates exactly once
    (bucket = len div d; a pair with |Δlen| ≤ d differs by ≤ 1 bucket,
    so exploding one side to {b−1, b, b+1} and keying the other on b
    meets every qualifying pair exactly once — no dedup pass), then
    TWO exact lower bounds prune before the quadratic step: the length
    bound itself and the character-bag bound ed ≥ L1(char counts)/2
    (one substitution moves two counts by 1, one indel moves one;
    untracked characters only loosen it). Survivors get a BANDED
    levenshtein verify (Spark's 3-arg form is O(d·len), not O(len²)).

    Rejected alternative, measured: Ed-Join's df-ordered q-gram PREFIX
    filter (Xiao et al., VLDB'08 — order grams rarest-first, join on
    the first q·d+1; lossless by the prefix lemma) was implemented
    first and is counterproductive on this corpus: the word-soup
    vocabulary is 377 distinct trigrams over 5 500 docs (2 041 at q=5,
    6 344 at q=7), so every gram is a stopword and the prefix join
    generates Σp² = 1.1×10⁸ candidate rows at q=3 (6.0×10⁷ at q=5) —
    43–78 s at sf0.1 vs ~3 s for this plan. The bag bound is the form
    of Ed-Join's count-filtering that survives stopword-dominated
    vocabularies.

    100-TB shape: candidate volume is Σ_b n_b·(n_{b−1}+n_b+n_{b+1}) —
    quadratic in the LENGTH-BLOCK occupancy, not the corpus, and the
    blocks carry only (id, len, 27-int histogram) through the shuffle
    (texts join AFTER both bounds, survivor-sized). As the exact-verify
    kernel it runs downstream of a blocking key (source/lang) or an
    LSH prescreen at corpus scale, exactly like ngram_jaccard. Scale
    bound: all counts int64; histogram entries ≤ len < 2³¹."""
    from clean_census_acs_data_spark.operators.dedup import plant_near_dups

    q, d = _EDJOIN_Q, _EDJOIN_D
    hist = F.expr(
        "transform(split('a b c d e f g h i j k l m n o p q r s t u v w x y z',"
        " ' ') || array(' '),"
        " ch -> length(text) - length(replace(text, ch)))"
    )
    from clean_census_acs_data_spark.io import spread

    # spread(): the single-file documents scan is 1-2 partitions, and
    # BOTH the 27-replace histogram kernel and the downstream
    # ~900k-pair zip_with bag filter inherit that partitioning (the
    # block join broadcasts the right side, so the left's layout is
    # the output's) — unspread they serialize on 2 of 32 cores
    # (measured: corpus fill 2.6 s, survivor filter 3.25 s → 0.9/0.8)
    corpus = (
        spread(plant_near_dups(_t(spark, sf_dir, "documents")))
        .where(F.length("text") >= q)
        .select("doc_id", F.length("text").alias("len"), hist.alias("h"))
        .withColumn("bucket", F.expr(f"len DIV {d}"))
        .transform(tracked_cache)  # both block-join sides read it
    )
    corpus.count()
    left = corpus.select(
        F.col("doc_id").alias("doc_a"),
        F.col("len").alias("la"),
        F.col("h").alias("ha"),
        F.explode(
            F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)
        ).alias("k"),
    )
    right = corpus.select(
        F.col("doc_id").alias("doc_b"),
        F.col("len").alias("lb"),
        F.col("h").alias("hb"),
        F.col("bucket").alias("k"),
    )
    bag_l1 = F.expr("aggregate(zip_with(ha, hb, (x, y) -> abs(x - y)), 0, (a, v) -> a + v)")
    survivors = (
        left.join(right, "k")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(F.abs(F.col("la") - F.col("lb")) <= d)
        .where(bag_l1 <= 2 * d)  # exact bound: one edit moves L1 by ≤ 2
        .select("doc_a", "doc_b")
    )
    texts = plant_near_dups(_t(spark, sf_dir, "documents")).where(
        F.length("text") >= q
    )
    ta = texts.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    tb = texts.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    ed = F.expr(f"levenshtein(ta, tb, {d})")  # banded; -1 when > d
    return (
        survivors.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", ed.cast("long").alias("edit_distance"))
        .where(F.col("edit_distance") >= 0)
    )


# ---------------------------------------------------------------------------
# reciprocal-rank fusion of a lexical and a dense ranking
# ---------------------------------------------------------------------------

_RRF_K = 60  # the canonical RRF damping constant (Cormack et al., SIGIR'09)
# NOTE: distinct from round-10's rrf_fusion_topk, which fuses a length
# ranking with a HASH-SCORED stand-in list — this entry fuses two REAL
# retrieval legs (token-overlap lexical, exact quantized-cosine dense).

_RRF_HYBRID_ORACLE = f"""
WITH e AS (SELECT vec_id, {_quant_list("embedding")} AS q FROM embeddings),
qq AS (SELECT q AS qv, {_dot("q", "q")} AS qn2 FROM e WHERE vec_id = 0),
dense AS (
  SELECT vec_id,
         ROW_NUMBER() OVER (
           ORDER BY CAST({_dot("q", "qv")} AS DOUBLE)
                    / (sqrt(CAST({_dot("q", "q")} AS DOUBLE))
                       * sqrt(CAST(qn2 AS DOUBLE)))
                    DESC, vec_id) AS rank_dense
  FROM e, qq WHERE vec_id <> 0
),
tok AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents
),
q0 AS (SELECT t AS tq FROM tok WHERE doc_id = 0),
lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (
           ORDER BY len(list_intersect(t, tq)) DESC, doc_id) AS rank_lex
  FROM tok, q0 WHERE doc_id <> 0
)
SELECT l.doc_id,
       CAST(l.rank_lex AS BIGINT) AS rank_lex,
       CAST(d.rank_dense AS BIGINT) AS rank_dense,
       CAST(CAST(ROUND(1E9 / ({_RRF_K} + l.rank_lex)) AS BIGINT)
            + CAST(ROUND(1E9 / ({_RRF_K} + d.rank_dense)) AS BIGINT)
            AS BIGINT) AS rrf_score
FROM lex l JOIN dense d ON l.doc_id = d.vec_id
ORDER BY rrf_score DESC, l.doc_id LIMIT 10
"""


@register("rrf_hybrid_dense_lexical", oracle=_RRF_HYBRID_ORACLE)
def rrf_hybrid_dense_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.): fuse a LEXICAL ranking
    (distinct-token overlap with the query document) and a DENSE
    ranking (exact quantized cosine against the query embedding —
    vec_id and doc_id share the id space) into one top-10 by
    Σ 1/(60+rank), each reciprocal quantized to an exact nano-unit
    integer (ROUND(1e9/(60+rank)) — one correctly-rounded division per
    ranker, so the fused score is an order-free integer sum). The
    hybrid-retrieval primitive every RAG stack ships: rank-space fusion
    needs no score calibration between BM25-like and cosine-like
    scales, which is exactly why it wins over score averaging.

    100-TB shape: each leg is a 1-row broadcast cross (query vector /
    query token set) over a streamed scan + one TakeOrdered-style
    ranking window; the fusion join keys on the id. At corpus scale
    the legs come from indexes (inverted postings / ANN lists —
    inverted_index_postings, knn_join_ivf are the registered scale
    paths) and RRF still consumes only (id, rank) pairs. Scale bound:
    rrf_score ≤ 2·ROUND(1e9/61) < 2^63; ranks are row_number
    (deterministic ties on doc_id)."""
    from clean_census_acs_data_spark.operators import similarity as S
    from clean_census_acs_data_spark.io import spread

    base = S._quantized(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    qv = base.where(F.col("vec_id") == 0).select(
        F.col("__q").alias("__qvec"), F.col("__n2").alias("__qn2")
    )
    dense = (
        spread(base.where(F.col("vec_id") != 0))
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            S.cosine(
                S._dot_q(F.col("__q"), F.col("__qvec")),
                F.col("__n2"),
                F.col("__qn2"),
            ).alias("cosine"),
        )
        .withColumn(
            "rank_dense",
            F.row_number().over(
                Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
            ),
        )
        .select("vec_id", "rank_dense")
    )
    tok = _t(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("t")
    )
    q0 = tok.where(F.col("doc_id") == 0).select(F.col("t").alias("tq"))
    lex = (
        tok.where(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(q0))
        .select(
            "doc_id",
            F.size(F.array_intersect("t", "tq")).alias("overlap"),
        )
        .withColumn(
            "rank_lex",
            F.row_number().over(
                Window.orderBy(F.desc("overlap"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "rank_lex")
    )
    rr = lambda rank: F.round(F.lit(1e9) / (F.lit(_RRF_K) + F.col(rank))).cast(  # noqa: E731
        "long"
    )
    return (
        lex.join(dense, lex.doc_id == dense.vec_id)
        .select(
            "doc_id",
            F.col("rank_lex").cast("long").alias("rank_lex"),
            F.col("rank_dense").cast("long").alias("rank_dense"),
            (rr("rank_lex") + rr("rank_dense")).cast("long").alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# exact pass@k estimator (unbiased combinatorial form)
# ---------------------------------------------------------------------------

# pass@k = 1 − C(n−c, k)/C(n, k) (the HumanEval estimator), computed as
# the falling-factorial ratio Π_{i<k}(n−c−i)/(n−i) with k=3 unrolled —
# exact int64 products (n ≤ a customer's order count), one shared-text
# division, micro-quantized per entity BEFORE the per-nation integer sum.
_PASSK_SQL = """
WITH t AS (
  SELECT o_custkey AS cust,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS c
  FROM orders GROUP BY o_custkey
),
p AS (
  SELECT cust, n, c,
         CASE WHEN n - c >= 3
              THEN CAST(ROUND(1E6 - 1E6 *
                     (CAST((n - c) * (n - c - 1) * (n - c - 2) AS DOUBLE)
                      / CAST(n * (n - 1) * (n - 2) AS DOUBLE))) AS BIGINT)
              ELSE 1000000 END AS pass3_micro
  FROM t WHERE n >= 3
)
SELECT nat.n_name AS nation_name,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(p.pass3_micro) AS BIGINT) AS sum_pass_micro,
       CAST(SUM(p.pass3_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS avg_pass_micro
FROM p
JOIN customer cu ON p.cust = cu.c_custkey
JOIN nation nat ON cu.c_nationkey = nat.n_nationkey
GROUP BY nat.n_name
"""


@register("pass_at_k_exact", oracle=_PASSK_SQL)
def pass_at_k_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbiased pass@k estimator (k=3) from the HumanEval paper —
    pass@k = 1 − C(n−c,k)/C(n,k) over n trials with c successes —
    evaluated per entity (customer ↔ task; fulfilled order ↔ passing
    sample) and averaged per nation. The falling-factorial form
    Π(n−c−i)/(n−i) needs no binomials; with k=3 unrolled it is two
    exact int64 products and ONE division, micro-quantized per entity
    before the group's integer sum (order-free), with the single final
    average division. The eval-pipeline aggregation every code-model
    report runs at corpus scale; dialect-shared SQL text on both
    engines.

    100-TB shape: one groupBy(entity) partial agg over the trials
    fact, a dimension join, a tiny group agg — no window, no shuffle
    beyond the two keyed aggs. Scale bound: n³ int64-exact to
    n ≈ 2×10⁶ trials per entity; the double ratio is exact to
    n³ < 2^53 (n ≈ 2×10⁵) and shared-text identical beyond."""
    register_views(spark, sf_dir)
    return spark.sql(_PASSK_SQL)


# ---------------------------------------------------------------------------
# DataFrame.transpose — Spark 4 relational-transpose surface
# ---------------------------------------------------------------------------

_TRANSPOSE_ORACLE = """
WITH a AS (
  SELECT l_returnflag AS f,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS net_cents
  FROM lineitem GROUP BY l_returnflag
)
SELECT 'n_items' AS key,
       CAST(MAX(CASE WHEN f = 'A' THEN n_items END) AS BIGINT) AS A,
       CAST(MAX(CASE WHEN f = 'N' THEN n_items END) AS BIGINT) AS N,
       CAST(MAX(CASE WHEN f = 'R' THEN n_items END) AS BIGINT) AS R
FROM a
UNION ALL
SELECT 'qty_sum',
       CAST(MAX(CASE WHEN f = 'A' THEN qty_sum END) AS BIGINT),
       CAST(MAX(CASE WHEN f = 'N' THEN qty_sum END) AS BIGINT),
       CAST(MAX(CASE WHEN f = 'R' THEN qty_sum END) AS BIGINT)
FROM a
UNION ALL
SELECT 'net_cents',
       CAST(MAX(CASE WHEN f = 'A' THEN net_cents END) AS BIGINT),
       CAST(MAX(CASE WHEN f = 'N' THEN net_cents END) AS BIGINT),
       CAST(MAX(CASE WHEN f = 'R' THEN net_cents END) AS BIGINT)
FROM a
"""


@register("transpose_metrics_matrix", oracle=_TRANSPOSE_ORACLE)
def transpose_metrics_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``DataFrame.transpose()`` — the native relational
    transpose (rows ↔ columns) added in 4.0: the per-returnflag metrics
    frame (n_items / qty_sum / net_cents, all exact int64) flips into a
    metrics-by-flag MATRIX with one column per index value, the report
    layout every BI handoff asks for. The inverse-ish companion of
    unpivot_measures (melt); the oracle spells the transpose as the
    manual conditional-aggregation UNION it replaces, proving the
    operator is pure re-layout.

    100-TB shape: the expensive part is the upstream q1-style
    partial-agg scan; transpose itself acts on the 3-row aggregate
    (index values become column NAMES, so the frame must be
    driver-small — the operator's documented contract, same as any
    pivot without explicit values). Scale bound: cents sums int64 to
    ~9.2·10¹⁶ (the q1 bound)."""
    li = _t(spark, sf_dir, "lineitem")
    agg = (
        li.groupBy(F.col("l_returnflag").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            ).alias("net_cents"),
        )
    )
    return agg.transpose()


# ---------------------------------------------------------------------------
# LISTAGG ... WITHIN GROUP — Spark 4 ordered string aggregation surface
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
SELECT r.r_name AS region_name,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@register("sql_listagg_within_group", oracle=_LISTAGG_ORACLE)
def sql_listagg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.0's LISTAGG(expr, sep) WITHIN GROUP (ORDER BY …) — the
    ANSI ordered string aggregation (finally native; pre-4.0 this was
    concat_ws(sort_array(collect_list(...))) as string_agg_sorted still
    demonstrates). Region → alphabetized CSV of its nations; the
    in-agg ORDER BY makes the output deterministic by construction.
    Oracle: DuckDB's string_agg(expr, sep ORDER BY …), the same ANSI
    feature under its other common spelling.

    100-TB shape: an ordered string agg concentrates each group's
    values on one reducer — correct for dimension-sized groups like
    this; for data-sized groups the scale answer is the sorted
    collect_list window or an explode-join, never a giant single
    string. Scale bound: output string length = Σ name lengths per
    group (dimension-bounded here)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name AS region_name,
               CAST(COUNT(*) AS BIGINT) AS n_nations,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                 AS nations_csv
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


# ---------------------------------------------------------------------------
# connected components, the MapReduce way: large-star / small-star
# ---------------------------------------------------------------------------


@register("components_large_star", oracle=_COMPONENTS_ORACLE)
def components_large_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the standard near-dup pair graph via
    the alternating LARGE-STAR/SMALL-STAR algorithm (Kiveris et al.,
    SoCC'14) — the diameter-independent MapReduce classic
    operators/components.py's docstring cites as the adversarial-graph
    alternative to min-label propagation, now implemented
    (connected_components_two_phase). Both algorithms reach the same
    min-rooted fixpoint, so this entry shares dedup_components' oracle
    verbatim: one transitive-closure truth, two distributed algorithms
    hash-checked against it.

    100-TB shape: each phase touches only the EDGE LIST (symmetrize →
    vertex-keyed min agg → equi-join back → distinct), no separate
    label table; O(log² n) rounds regardless of diameter, each round
    eagerly localCheckpoint-ed (O(1) plan depth). Convergence is a
    count+xxhash64 edge-multiset signature — two driver-sized actions
    per round on a collision-sized frame."""
    from clean_census_acs_data_spark.operators.components import (
        connected_components_two_phase,
    )
    from clean_census_acs_data_spark.operators.dedup import standard_near_dup_pairs

    pairs = standard_near_dup_pairs(spark, sf_dir, threshold=0.5)
    return connected_components_two_phase(pairs)
