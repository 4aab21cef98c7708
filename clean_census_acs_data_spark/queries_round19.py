"""Round-19 tier: wide-decimal rank correlation, per-cell chi-squared,
Siegel repeated-median regression, rank-biased overlap, and the Spark 4
UDTF-with-TABLE-argument surface.

- ``spearman_rho_decimal``    — spearman_rho_exact's documented
  large-group switch, SHIPPED: the same double-rank algorithm with the
  moment sums and cross products in DECIMAL(38,0) (HUGEINT in the
  oracle), exact far past the int64 window (n ≈ 3.9×10⁴ per group →
  ~10⁹), with the exact numerator emitted as a STRING so no
  HUGEINT→double limb rounding can ever bite (the time_weighted_average
  caveat, closed the way its docstring prescribed).
- ``chi_squared_cells``       — per-cell χ² contributions over the same
  contingency frame as mutual_information_cells, kept EXACT by integer
  micro-quantized rational arithmetic: (O·N − R·C)²·10⁶ DIV (N·R·C)
  in DECIMAL(38,0)/HUGEINT — no float cast of any wide integer.
- ``repeated_median_slope``   — Siegel's repeated-median regression per
  user: median over anchors of (median over partners of the pairwise
  slope). 50% breakdown point vs Theil–Sen's 29%; two nested
  selections, zero float accumulation.
- ``rbo_rank_overlap``        — rank-biased overlap (Webber et al.,
  TOIS'10) at p=1/2, depth 10, between the SAME two retrieval legs
  rrf_hybrid_dense_lexical fuses — the rank-agreement audit for the
  fusion (RRF says "combine them"; RBO says "how much do they already
  agree"). p=1/2 makes every weight 2520·2^(10−d)/d an exact integer.
- ``udtf_table_arg_sessionize`` — Spark 4 Python UDTF taking a TABLE
  argument with PARTITION BY ... ORDER BY: a per-partition stateful
  sessionizer (30-min gap) whose oracle is the classic lag/gap/cumsum
  sessionization SQL. The third UDTF shape in the registry (scalar-arg
  udtf_tokenize, polymorphic-analyze udtf_ngrams_polymorphic, now
  table-arg partition streaming).

Determinism discipline per the package standard: integer cents/µs/
ranks, DECIMAL(38,0)↔HUGEINT for wide products, medians by selection
with total tiebreaks, single final divisions.

Reference tie: none (SURVEY.md §2D engine-extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clean_census_acs_data_spark.functions import cents
from clean_census_acs_data_spark.io import load_table, register_views
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import _dot, _quant_list


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Spearman with DECIMAL(38,0) sums — the documented large-group switch
# ---------------------------------------------------------------------------

# Shared skeleton, engine-specific WIDE type: Spark runs the DECIMAL(38,0)
# text, DuckDB the HUGEINT one. Every sum and cross product is exact in
# both (values ≤ 4n⁴ ≤ 10³⁸ to n ≈ 10⁹ per group); rho_num is emitted as
# the STRING of the exact integer (sidestepping DuckDB's limb-based
# HUGEINT→double rounding beyond 2^53 — the time_weighted_average
# caveat); spearman_rho's float tail stays inside 2^53 at every sealed
# scale (4n⁴ < 9×10¹⁵ to n ≈ 1.2×10³ per nation — sf0.1 is ~1.2k).


def _spearman_wide_sql(wide_cast: str, str_t: str = "STRING") -> str:
    return f"""
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
              + COUNT(*) OVER (PARTITION BY nk, bal_cents) - 1
              AS {wide_cast}) AS drx,
         CAST(2 * RANK() OVER (PARTITION BY nk ORDER BY spend_cents)
              + COUNT(*) OVER (PARTITION BY nk, spend_cents) - 1
              AS {wide_cast}) AS dry
  FROM base
),
agg AS (
  SELECT nk,
         CAST(COUNT(*) AS {wide_cast}) AS n,
         SUM(drx * dry) AS sxy,
         SUM(drx) AS sx,
         SUM(dry) AS sy,
         SUM(drx * drx) AS sxx,
         SUM(dry * dry) AS syy
  FROM r GROUP BY nk
)
SELECT nat.n_name AS nation_name,
       CAST(a.n AS BIGINT) AS n_cust,
       CAST(a.n * a.sxy - a.sx * a.sy AS {str_t}) AS rho_num_str,
       CASE WHEN (a.n * a.sxx - a.sx * a.sx) > 0
             AND (a.n * a.syy - a.sy * a.sy) > 0
            THEN CAST(a.n * a.sxy - a.sx * a.sy AS DOUBLE)
                 / sqrt(CAST(a.n * a.sxx - a.sx * a.sx AS DOUBLE)
                        * CAST(a.n * a.syy - a.sy * a.sy AS DOUBLE))
            ELSE NULL END AS spearman_rho
FROM agg a JOIN nation nat ON a.nk = nat.n_nationkey
"""


@register("spearman_rho_decimal", oracle=_spearman_wide_sql("HUGEINT", "VARCHAR"))
def spearman_rho_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spearman_rho_exact's documented DECIMAL(38,0) switch, shipped as
    its own entry (VERDICT r10 ask #5 carried candidate): identical
    double-rank algorithm, but every moment sum and cross product runs
    in DECIMAL(38,0) (HUGEINT on the DuckDB side) — exact to n ≈ 10⁹
    rows per group where the int64 form wraps at 3.9×10⁴. The exact
    numerator n·sxy − sx·sy is emitted as a STRING so the hash check
    covers the full-precision integer with no float cast anywhere wide
    (DuckDB converts HUGEINT→double via 64-bit limbs and can
    double-round past 2^53 — strings can't).

    100-TB shape: identical to spearman_rho_exact (two ranking windows
    on the 25-value partition key, then a 25-row agg); the decimal
    arithmetic adds ~2 bytes per sum cell and nothing to the shuffle
    profile. Property test pins equality with spearman_rho_exact's
    int64 results where both are in-range."""
    register_views(spark, sf_dir)
    return spark.sql(_spearman_wide_sql("DECIMAL(38,0)"))


# ---------------------------------------------------------------------------
# per-cell chi-squared contributions, exact micro-quantized rationals
# ---------------------------------------------------------------------------

# contribution = (O − E)²/E with E = R·C/N, kept rational:
# (O·N − R·C)²·10⁶ DIV (N·R·C). D = O·N − R·C fits int64 (|D| ≤ N²,
# N ≤ 3×10⁹); D²·10⁶ needs the wide type (≤ 10⁶·N⁴); the integral
# division is exact integer arithmetic in both engines — no float cast
# of any wide value, so no limb-rounding caveat at ANY scale.


def _chi2_sql(wide: str, intdiv: str) -> str:
    return f"""
WITH c AS (
  SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS o_xy
  FROM lineitem GROUP BY l_returnflag, l_linestatus
),
m AS (
  SELECT l_returnflag, l_linestatus, o_xy,
         CAST(SUM(o_xy) OVER (PARTITION BY l_returnflag) AS BIGINT) AS r_x,
         CAST(SUM(o_xy) OVER (PARTITION BY l_linestatus) AS BIGINT) AS c_y,
         CAST(SUM(o_xy) OVER () AS BIGINT) AS n
  FROM c
),
d AS (
  SELECT l_returnflag, l_linestatus, o_xy, r_x, c_y, n,
         CAST(o_xy * n - r_x * c_y AS BIGINT) AS dev
  FROM m
),
q AS (
  SELECT l_returnflag, l_linestatus, o_xy, r_x, c_y, dev,
         CAST((CAST(dev AS {wide}) * dev * 1000000)
              {intdiv} (CAST(n AS {wide}) * r_x * c_y) AS BIGINT)
           AS chi2_micro
  FROM d
)
SELECT l_returnflag, l_linestatus, o_xy, r_x, c_y, dev, chi2_micro,
       CAST(SUM(chi2_micro) OVER () AS BIGINT) AS chi2_total_micro,
       CAST(SUM(chi2_micro) OVER () AS DOUBLE) / 1E6 AS chi2
FROM q
"""


@register("chi_squared_cells", oracle=_chi2_sql("HUGEINT", "//"))
def chi_squared_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson's χ² test of independence between l_returnflag and
    l_linestatus, per-cell and total — the frequentist companion to
    mutual_information_cells over the SAME contingency frame (MI says
    how many nats the dependence carries; χ² says how far counts sit
    from the independence expectation in variance units). Each cell's
    (O−E)²/E is exact micro-quantized rational arithmetic —
    (O·N − R·C)²·10⁶ DIV (N·R·C) in DECIMAL(38,0) (HUGEINT oracle) —
    then an order-free integer window sum; the only double is the final
    /1e6 display division.

    100-TB shape: one partial-agg scan to the (|X|·|Y|)-cell frame,
    windows over ≤ dozens of rows. Scale bound: dev ≤ N² wraps int64 at
    N ≈ 3×10⁹ rows (sf ~500); dev²·10⁶ ≤ 10⁶·N⁴ stays inside the
    38-digit wide type to N ≈ 10⁸ — past that, drop the ×10⁶
    pre-scale to buy the next 10³ (document, don't silently lose)."""
    register_views(spark, sf_dir)
    return spark.sql(_chi2_sql("DECIMAL(38,0)", "DIV"))


# ---------------------------------------------------------------------------
# Siegel repeated-median slope (50% breakdown robust regression)
# ---------------------------------------------------------------------------

_RM_ORACLE = """
WITH p AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS x,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase'
),
sl AS (
  SELECT a.user_id, a.event_id AS anchor, b.event_id AS partner,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM p a JOIN p b
    ON a.user_id = b.user_id AND a.event_id <> b.event_id AND a.x <> b.x
),
inner_r AS (
  SELECT user_id, anchor, slope,
         ROW_NUMBER() OVER (PARTITION BY user_id, anchor
                            ORDER BY slope, partner) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, anchor) AS np
  FROM sl
),
med_i AS (
  SELECT user_id, anchor, slope AS m
  FROM inner_r WHERE rn = (np + 1) // 2
),
outer_r AS (
  SELECT user_id, m,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY m, anchor) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS na
  FROM med_i
)
SELECT user_id,
       CAST(na AS BIGINT) AS n_anchors,
       m AS repeated_median_slope
FROM outer_r WHERE rn = (na + 1) // 2
"""


@register("repeated_median_slope", oracle=_RM_ORACLE)
def repeated_median_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel's repeated-median slope per user — median over anchor
    points of (median over partners of the pairwise slope). The
    50%-breakdown-point big sibling of theil_sen_slope_user (29%): with
    half the points corrupted, Theil–Sen's single median over ALL pairs
    is swamped (most pairs touch an outlier) while the repeated median
    survives because each CLEAN anchor's inner median stays clean. The
    robust-regression ladder a data-quality pipeline climbs when drift
    monitoring must tolerate adversarial segments.

    Exactness: slopes are single double divisions of exact int64
    deltas; both medians are SELECTION (lower median, row_number with
    total partner/anchor tiebreaks) — no float accumulation exists.
    100-TB shape: the pair join is user-keyed (per-entity-bounded
    quadratic, both orientations so every anchor sees every partner);
    two window passes on (user) and (user, anchor) reuse the same
    shuffle key family. Scale: same epoch-µs/cents bounds as
    theil_sen_slope_user."""
    p = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("anchor"),
            F.unix_micros("ts").alias("x"),
            cents("value").alias("y"),
        )
    )
    b = p.select(
        F.col("user_id").alias("ub"),
        F.col("anchor").alias("partner"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    sl = (
        p.join(
            b,
            (F.col("user_id") == F.col("ub"))
            & (F.col("anchor") != F.col("partner"))
            & (F.col("x") != F.col("xb")),
        )
        .select(
            "user_id",
            "anchor",
            "partner",
            (
                (F.col("yb") - F.col("y")).cast("double")
                / (F.col("xb") - F.col("x")).cast("double")
            ).alias("slope"),
        )
    )
    wi = Window.partitionBy("user_id", "anchor").orderBy("slope", "partner")
    med_i = (
        sl.select(
            "user_id",
            "anchor",
            "slope",
            F.row_number().over(wi).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("user_id", "anchor"))
            .alias("np"),
        )
        .where(F.col("rn") == F.expr("(np + 1) DIV 2"))
        .select("user_id", "anchor", F.col("slope").alias("m"))
    )
    wo = Window.partitionBy("user_id").orderBy("m", "anchor")
    return (
        med_i.select(
            "user_id",
            "m",
            F.row_number().over(wo).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("na"),
        )
        .where(F.col("rn") == F.expr("(na + 1) DIV 2"))
        .select(
            "user_id",
            F.col("na").cast("long").alias("n_anchors"),
            F.col("m").alias("repeated_median_slope"),
        )
    )


# ---------------------------------------------------------------------------
# rank-biased overlap between the dense and lexical retrieval legs
# ---------------------------------------------------------------------------

_RBO_DEPTH = 10
# Truncated RBO (Webber et al., TOIS'10 eq. 4): (1−p)·Σ p^(d−1)·X_d/d.
# p = 1/2 ⇒ weight of depth d is (1−p)·p^(d−1)/d = 1/(d·2^d); scaling by
# 2520·2^10 (lcm(1..10)·2^10) makes every per-depth weight an exact
# integer W_d = 2520·2^(10−d)/d, and Σ X_d·W_d a plain int64 sum.
# ADVICE r11 fixed the scale: the old 2·2520·2^10 denominator used the
# (1−p)·p^d/d weight form, halving every score — identical top-10
# prefixes now yield exactly 1 − 2^−10, as the definition requires.
_RBO_SCALE = 2520 * (1 << _RBO_DEPTH)  # denominator of the final rbo

_RBO_ORACLE = f"""
WITH e AS (SELECT vec_id, {_quant_list("embedding")} AS q FROM embeddings),
qq AS (SELECT q AS qv, {_dot("q", "q")} AS qn2 FROM e WHERE vec_id = 0),
dense AS (
  SELECT vec_id AS id,
         ROW_NUMBER() OVER (
           ORDER BY CAST({_dot("q", "qv")} AS DOUBLE)
                    / (sqrt(CAST({_dot("q", "q")} AS DOUBLE))
                       * sqrt(CAST(qn2 AS DOUBLE)))
                    DESC, vec_id) AS ra
  FROM e, qq WHERE vec_id <> 0
),
tok AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents
),
q0 AS (SELECT t AS tq FROM tok WHERE doc_id = 0),
lex AS (
  SELECT doc_id AS id,
         ROW_NUMBER() OVER (
           ORDER BY len(list_intersect(t, tq)) DESC, doc_id) AS rb
  FROM tok, q0 WHERE doc_id <> 0
),
entry AS (
  SELECT d.id, GREATEST(d.ra, l.rb) AS at_depth
  FROM dense d JOIN lex l ON d.id = l.id
  WHERE d.ra <= {_RBO_DEPTH} AND l.rb <= {_RBO_DEPTH}
),
depths AS (SELECT unnest(range(1, {_RBO_DEPTH} + 1)) AS depth),
x AS (
  SELECT depth,
         CAST((SELECT COUNT(*) FROM entry WHERE at_depth <= depth) AS BIGINT)
           AS inter_cnt,
         CAST(2520 * (1 << ({_RBO_DEPTH} - depth)) // depth AS BIGINT)
           AS weight_num
  FROM depths
)
SELECT depth, inter_cnt, weight_num,
       CAST(inter_cnt * weight_num AS BIGINT) AS contrib,
       CAST(SUM(inter_cnt * weight_num) OVER () AS BIGINT) AS rbo_num,
       CAST(SUM(inter_cnt * weight_num) OVER () AS DOUBLE) / {_RBO_SCALE}
         AS rbo
FROM x
"""


@register("rbo_rank_overlap", oracle=_RBO_ORACLE)
def rbo_rank_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS'10), truncated
    at depth 10 with p = 1/2, between the SAME two retrieval legs that
    rrf_hybrid_dense_lexical fuses (token-overlap lexical vs exact
    quantized-cosine dense). RBO is the standard top-weighted agreement
    measure between indefinite rankings — the audit that tells you
    whether fusing the legs can help (RBO ≈ 1 ⇒ the legs are redundant;
    RBO ≈ 0 ⇒ fusion adds genuine diversity). Per depth d ≤ 10 the
    overlap X_d = |top-d(dense) ∩ top-d(lex)| comes from one rank join
    (an id enters the intersection at depth max(r_dense, r_lex));
    p = 1/2 makes every RBO weight the exact integer 2520·2^(10−d)/d,
    so the score is an order-free int64 sum with one final display
    division by 2520·2^10 (identical prefixes ⇒ exactly 1 − 2^−10).

    100-TB shape: each leg is the rrf entry's plan (1-row broadcast
    cross + ranking window; inverted postings / ANN lists are the
    registered scale paths); RBO itself then touches only ≤ depth² rank
    pairs. Scale bound: contrib ≤ 10·1 290 240 — nowhere near int64."""
    from clean_census_acs_data_spark.io import spread
    from clean_census_acs_data_spark.operators import similarity as S

    base = S._quantized(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    qv = base.where(F.col("vec_id") == 0).select(
        F.col("__q").alias("__qvec"), F.col("__n2").alias("__qn2")
    )
    dense = (
        spread(base.where(F.col("vec_id") != 0))
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("id"),
            S.cosine(
                S._dot_q(F.col("__q"), F.col("__qvec")),
                F.col("__n2"),
                F.col("__qn2"),
            ).alias("cosine"),
        )
        .select(
            "id",
            F.row_number()
            .over(Window.orderBy(F.desc("cosine"), F.asc("id")))
            .alias("ra"),
        )
    )
    tok = _t(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("t")
    )
    q0 = tok.where(F.col("doc_id") == 0).select(F.col("t").alias("tq"))
    lex = (
        tok.where(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(q0))
        .select(
            F.col("doc_id").alias("id"),
            F.size(F.array_intersect("t", "tq")).alias("overlap"),
        )
        .select(
            "id",
            F.row_number()
            .over(Window.orderBy(F.desc("overlap"), F.asc("id")))
            .alias("rb"),
        )
    )
    # X_d is the RUNNING count of ids whose entry depth max(ra, rb) ≤ d:
    # an equality join of the 10-row depth spine onto per-depth entry
    # counts plus one running window sum — no inequality (nested-loop)
    # join anywhere.
    entry_counts = (
        dense.where(F.col("ra") <= _RBO_DEPTH)
        .join(lex.where(F.col("rb") <= _RBO_DEPTH), "id")
        .select(F.greatest("ra", "rb").alias("at_depth"))
        .groupBy("at_depth")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    depths = spark.range(1, _RBO_DEPTH + 1).select(
        F.col("id").cast("int").alias("depth")
    )
    run = Window.orderBy("depth").rowsBetween(Window.unboundedPreceding, 0)
    x = (
        depths.join(
            entry_counts, F.col("depth") == F.col("at_depth"), "left"
        )
        .select(
            "depth",
            F.sum(F.coalesce("cnt", F.lit(0)))
            .over(run)
            .cast("long")
            .alias("inter_cnt"),
        )
        .select(
            "depth",
            "inter_cnt",
            F.expr(f"2520 * shiftleft(1, {_RBO_DEPTH} - depth) DIV depth")
            .cast("long")
            .alias("weight_num"),
        )
    )
    w = Window.partitionBy()
    return x.select(
        "depth",
        "inter_cnt",
        "weight_num",
        (F.col("inter_cnt") * F.col("weight_num")).cast("long").alias("contrib"),
        F.sum(F.col("inter_cnt") * F.col("weight_num"))
        .over(w)
        .cast("long")
        .alias("rbo_num"),
        (
            F.sum(F.col("inter_cnt") * F.col("weight_num"))
            .over(w)
            .cast("double")
            / F.lit(float(_RBO_SCALE))
        ).alias("rbo"),
    )


# ---------------------------------------------------------------------------
# Spark 4 UDTF with a TABLE argument (PARTITION BY ... ORDER BY)
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap

_SESS_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
),
g AS (
  SELECT user_id, event_id, us,
         CASE WHEN LAG(us) OVER w IS NULL
                OR us - LAG(us) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       CAST(sid AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(us) AS BIGINT) AS start_us,
       CAST(MAX(us) AS BIGINT) AS end_us
FROM s GROUP BY user_id, sid
"""


@register("udtf_table_arg_sessionize", oracle=_SESS_ORACLE)
def udtf_table_arg_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through a Spark 4 Python UDTF taking a TABLE
    argument with PARTITION BY user_id ORDER BY (us, event_id) — the
    engine feeds each user's rows to one UDTF instance in order, eval()
    streams them through integer gap logic, terminate() flushes the
    last session. The registry's third UDTF shape (after scalar-arg
    udtf_tokenize and polymorphic-analyze udtf_ngrams_polymorphic) and
    the API a custom stateful operator uses when
    applyInPandasWithState's timeout machinery is more than the job
    needs. The oracle is the classic lag/gap/cumsum sessionization SQL
    — two independent implementations of one definition.

    Determinism: epoch-µs integers end-to-end; ORDER BY (us, event_id)
    is total; the 30-min gap test is strict-greater in both engines.
    100-TB shape: one shuffle on user_id (the PARTITION BY), then a
    single ordered pass per partition in the Python worker — the same
    profile as applyInPandas sessionizers; Python crossing is the
    declared cost (the streaming sessionizer and the lag/cumsum SQL
    form are the registered JVM-side twins).

    Scale bound: the only arithmetic on epoch-µs is the gap DIFFERENCE
    us − last (< the user's span, int64 to ~292,000 years) compared to
    a constant; session counters are per-user counts — no products, no
    overflow surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "user_id bigint, session_idx bigint, n_events bigint,"
        " start_us bigint, end_us bigint"
    ))
    class Sessionize:
        def __init__(self) -> None:
            self._user = None
            self._sid = 0
            self._n = 0
            self._start = None
            self._last = None

        def _flush(self):
            return (self._user, self._sid, self._n, self._start, self._last)

        def eval(self, row):
            us = row["us"]
            if self._user is None:
                self._user, self._sid = row["user_id"], 1
                self._n, self._start, self._last = 1, us, us
                return
            if row["user_id"] != self._user:  # defensive: partition = 1 user
                out = self._flush()
                self._user, self._sid = row["user_id"], 1
                self._n, self._start, self._last = 1, us, us
                yield out
            elif us - self._last > _SESSION_GAP_US:
                out = self._flush()
                self._sid += 1
                self._n, self._start, self._last = 1, us, us
                yield out
            else:
                self._n += 1
                self._last = us

        def terminate(self):
            if self._user is not None:
                yield self._flush()

    spark.udtf.register("sessionize_table_fn", Sessionize)
    (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
        .createOrReplaceTempView("__sess_events")
    )
    return spark.sql(
        "SELECT * FROM sessionize_table_fn("
        "TABLE(__sess_events) PARTITION BY user_id ORDER BY (us, event_id))"
    )
