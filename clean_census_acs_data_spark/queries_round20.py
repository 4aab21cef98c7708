"""Round-20 tier (driver round 12): the VERDICT r11 ask-#6 named
candidates (sliding-frame two-phase distinct, Passing–Bablok, quantile
regression by selection, the table-schema UDTF) plus the regression /
eval / writer completions that grew out of them — nine oracle-backed
entries, each pinned by a brute-force property test and sealed
bit-exact at sf0.001/0.01/0.1.

- ``windowed_distinct_sliding`` — exact COUNT(DISTINCT) over ROWS
  BETWEEN 9 PRECEDING AND CURRENT ROW with O(1) per-row state: each
  occurrence contributes +1 to exactly the contiguous position
  interval [max(pos, prev+k+1), pos+k] of window ends where it is the
  FIRST in-window occurrence of its key; interval endpoints become ±1
  delta events and one running sum reads the answer off. The sibling
  of windowed_distinct_suffix (last-occurrence flag) at the frame
  shape engines reject outright; window_distinct_rolling's
  frame-local array_distinct is the memory-∝-frame baseline this
  replaces with integer deltas.
- ``passing_bablok_regression`` — the robust method-comparison
  sibling of theil_sen_slope_user (VERDICT r11 ask #6's named
  candidate): slope = the K-shifted median of pairwise slopes
  (excluding S = −1; K = #{S < −1} restores scale-swap symmetry),
  intercept = lower median of y − b·x. Every predicate and rank is
  exact integer arithmetic (S < −1 ⟺ dy + dx < 0 when dx > 0); the
  only floats are the slope divisions (single IEEE ops on int64
  deltas, bit-identical across engines) and the final b/a values.
- ``quantile_regression_origin`` — exact τ-quantile regression
  through the origin by the selection device (the ask's OTHER named
  candidate): b_τ is the weighted τ-quantile of per-item slopes with
  |x| weights (the check loss is piecewise linear in b), found by the
  exact integer threshold 4·cumw ≥ τ4·W — no IRLS, no iteration.
- ``udtf_analyze_table_unpivot`` — Spark 4 UDTF whose ``analyze()``
  reads the TABLE argument's StructType and derives the OUTPUT schema
  from it (key field name/type copied from the input's first column):
  the fourth UDTF shape after static-returnType (udtf_tokenize),
  literal-polymorphic (udtf_ngrams_polymorphic), and table-arg
  PARTITION BY/ORDER BY (udtf_table_arg_sessionize).
- ``isotonic_regression_pava`` — monotone least-squares calibration
  fit via PAVA's exact closed form ŷ_i = max_{j≤i} min_{k≥i}
  avg(y_j..y_k): prefix sums + a per-user-bounded pair join + suffix
  MIN + MAX — no sequential loop, ONE shared SQL text.
- ``acf_hourly_lag_profile`` — exact lag-1/lag-24 autocorrelation of
  the dense hourly count series per event type (the daily-seasonality
  / structural-change audit); the rational mean is cleared by the n²
  identity so every term is an exact int64 product.
- ``keyed_layout_binned_readback`` — the multi-file-per-key writer
  regime oracle-checked end-to-end: lineitem through
  write_keyed_layout(target_rows_per_file=8000), read back, per-key
  aggregate vs the raw table (census_write_readback's scale inverse).
- ``langid_eval_prf`` — per-class precision/recall/F1 over the
  language-ID confusion matrix as exact truncating integer ratios
  (F1 = 2·10⁶·tp DIV (predicted + support) — no float anywhere).
- ``mrr_eval_retrieval`` — mean reciprocal rank of the live lexical
  leg (10 probe queries, same-source relevance), RR = 10⁶ DIV rank;
  completes the retrieval-eval triad with ndcg (prefix quality) and
  rbo (ranking agreement).

Determinism discipline per the package standard. Reference tie: none
(SURVEY.md §2D engine-extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table, register_views
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# sliding-frame exact distinct count (two-phase: interval deltas + running sum)
# ---------------------------------------------------------------------------

_SLIDE_K = 9  # ROWS BETWEEN 9 PRECEDING AND CURRENT ROW — a 10-row frame

# The oracle is the brute-force DEFINITION: DuckDB supports
# COUNT(DISTINCT) OVER a ROWS frame natively (Spark does not), so the
# two engines run genuinely independent algorithms for one definition —
# the strongest oracle form (cf. udtf_table_arg_sessionize).
_SLIDE_DISTINCT_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
)
SELECT event_id, user_id,
       CAST(COUNT(DISTINCT event_type) OVER (
              PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN {_SLIDE_K} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_distinct_window
FROM e
"""


@register("windowed_distinct_sliding", oracle=_SLIDE_DISTINCT_ORACLE)
def windowed_distinct_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT event_type) over the SLIDING frame (ROWS
    BETWEEN 9 PRECEDING AND CURRENT ROW) — "distinct event types in
    the user's last 10 actions", the short-horizon behavioural-
    diversity feature. Engines reject COUNT(DISTINCT) OVER any frame;
    the two-phase rewrite here needs O(1) state per row (unlike
    window_distinct_rolling's frame-local array_distinct, whose
    per-row set is ∝ frame length):

    (1) position each row (row_number per user) and find the previous
        occurrence position p of the same (user, type) (lag over the
        per-type ordering);
    (2) the row is the first IN-WINDOW occurrence of its type for
        exactly the window ends i ∈ [max(pos, p+k+1), pos+k] — a
        CONTIGUOUS interval (it enters once its predecessor has left,
        and leaves when it does), so distinct(i) = Σ rows whose
        interval covers i;
    (3) emit +1/−1 delta events at the interval endpoints, aggregate
        deltas per position, and one running sum over positions reads
        off the count — classic interval stabbing by prefix sum,
        every value an exact integer.

    100-TB shape: all four exchanges hash on user_id (±type); per-row
    state is two ints (position, previous position) and the delta
    table is exactly 2 rows per event pre-aggregation. Skew = the
    heaviest user's history, same bound as any per-user window. Scale
    bound: positions and deltas are bounded by per-user event counts —
    no products, no overflow surface."""
    k = _SLIDE_K
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w_user = Window.partitionBy("user_id").orderBy("us", "event_id")
    pos = e.select(
        "user_id",
        "event_id",
        "event_type",
        (F.row_number().over(w_user) - 1).alias("pos"),
    )
    w_type = Window.partitionBy("user_id", "event_type").orderBy("pos")
    marked = pos.select(
        "user_id",
        "event_id",
        "pos",
        F.lag("pos").over(w_type).alias("prev"),
    )
    # interval of window-end positions where this occurrence is counted
    start = F.when(
        F.col("prev").isNull(), F.col("pos")
    ).otherwise(F.greatest(F.col("pos"), F.col("prev") + k + 1))
    deltas = (
        marked.select(
            "user_id",
            F.explode(
                F.array(
                    F.struct(start.alias("p"), F.lit(1).alias("d")),
                    F.struct((F.col("pos") + k + 1).alias("p"), F.lit(-1).alias("d")),
                )
            ).alias("ev"),
        )
        .select(
            F.col("user_id").alias("uid"),
            F.col("ev.p").alias("p"),
            F.col("ev.d").alias("d"),
        )
        .groupBy("uid", "p")
        .agg(F.sum("d").alias("delta"))
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marked.join(
            deltas,
            (F.col("user_id") == F.col("uid")) & (F.col("pos") == F.col("p")),
            "left",
        )
        .select(
            "user_id",
            "event_id",
            "pos",
            F.coalesce("delta", F.lit(0)).alias("delta"),
        )
        .select(
            "event_id",
            "user_id",
            F.sum("delta").over(run).cast("long").alias("n_distinct_window"),
        )
    )


# ---------------------------------------------------------------------------
# Passing–Bablok method-comparison regression (K-shifted slope median)
# ---------------------------------------------------------------------------


_PB_CUST = """
  SELECT c.c_custkey AS ck, c.c_nationkey AS nk,
         CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
"""


def _pb_sql(div: str, cust: str = _PB_CUST) -> str:
    """ONE shared text, dialect-parameterized only on integer division
    (DuckDB ``//`` vs Spark ``DIV``) — the mcnemar device. ``cust``
    lets the Spark side substitute a materialized base (r12: the CTE
    is referenced 3×, which Spark's CTE inlining re-derives; DuckDB
    materializes it, so the oracle keeps the default text)."""
    return f"""
WITH cust AS ({cust}),
pairs AS (
  SELECT a.nk, a.ck AS ia, b.ck AS ib,
         b.y - a.y AS dy, b.x - a.x AS dx
  FROM cust a JOIN cust b ON a.nk = b.nk AND a.x < b.x
),
sl AS (
  SELECT nk, ia, ib,
         CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) AS s,
         CASE WHEN dy + dx < 0 THEN 1 ELSE 0 END AS is_neg
  FROM pairs WHERE dy + dx <> 0
),
r AS (
  SELECT nk, s,
         ROW_NUMBER() OVER (PARTITION BY nk ORDER BY s, ia, ib) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY nk) AS BIGINT) AS n,
         CAST(SUM(is_neg) OVER (PARTITION BY nk) AS BIGINT) AS kneg
  FROM sl
),
bsel AS (
  SELECT nk, n, kneg, AVG(s) AS b
  FROM r
  WHERE (n % 2 = 1 AND rn = (n + 1) {div} 2 + kneg)
     OR (n % 2 = 0 AND rn IN (n {div} 2 + kneg, n {div} 2 + 1 + kneg))
  GROUP BY nk, n, kneg
  HAVING CAST(COUNT(*) AS BIGINT) = CASE WHEN n % 2 = 1 THEN 1 ELSE 2 END
),
resid AS (
  SELECT c.nk, c.ck,
         CAST(c.y AS DOUBLE) - bs.b * CAST(c.x AS DOUBLE) AS e,
         bs.n, bs.kneg, bs.b
  FROM cust c JOIN bsel bs ON c.nk = bs.nk
),
rr AS (
  SELECT nk, n, kneg, b, e,
         ROW_NUMBER() OVER (PARTITION BY nk ORDER BY e, ck) AS rn_e,
         CAST(COUNT(*) OVER (PARTITION BY nk) AS BIGINT) AS n_items
  FROM resid
)
SELECT nk AS nation_key, n_items, n AS n_pairs, kneg AS k_neg,
       b AS pb_slope, e AS pb_intercept
FROM rr WHERE rn_e = (n_items + 1) {div} 2
"""


@register("passing_bablok_regression", oracle=_pb_sql("//"))
def passing_bablok_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passing–Bablok (1983) robust method-comparison regression per
    nation: method X = account balance, method Y = lifetime order
    spend, items = customers with ≥1 order (both in exact cents). The
    grouped robust-regression sibling of theil_sen_slope_user (VERDICT
    r11 ask #6's named candidate): where Theil–Sen takes the plain
    median of pairwise slopes, PB discards S = −1, counts K = #{S <
    −1}, and takes the K-SHIFTED median — making the estimate
    invariant under swapping X and Y (the property that matters when
    neither variable is "the" regressor), with the same 29% breakdown.

    Exactness: pairs are x-ordered so dx > 0, making S < −1 ⟺
    dy + dx < 0 and S = −1 ⟺ dy + dx = 0 — integer predicates, no
    float compare; slopes are single IEEE divisions of int64 deltas
    (bit-identical across engines, the theil_sen device); the shifted
    median is ROW_NUMBER selection with total (s, ia, ib) tiebreak,
    averaging two slopes in the even case (one add of two doubles —
    commutative, order-free); a HAVING guard drops a group if the K
    shift pushes the selection out of range rather than silently
    mis-selecting. Intercept = LOWER median of y − b·x by the same
    selection device (each residual is one multiply+subtract of
    bit-identical operands). x ties are excluded from the pair set
    (the reference procedure's dx = 0 slopes need the ±∞ ordinal
    machinery; the exclusion is documented and symmetrical). ONE
    dialect-shared SQL text runs on both engines (// vs DIV).

    100-TB shape: the pair join is keyed on the 25-value nation key —
    the per-entity-bounded self-join discipline of theil_sen — and
    everything downstream is windows over the same key; one shuffle
    profile. Group sizes of millions need per-group pair sampling
    first (the documented Theil–Sen switch point). Scale bound: y
    sums cents per customer (int64 to ~9×10¹⁶ cents); dy + dx is a
    sum of two int64 cent deltas — no products anywhere.

    r12 perf adjudication (SURVEY's r13 watch item, closed EARLY with
    measurements): Spark's CTE inlining re-derives ``cust`` once per
    reference (3×, 12 file scans — the misra_gries pattern), so three
    materialization variants were built and measured at sf0.1:
    (a) eager localCheckpoint + view substitution — cold interleaved
    fresh-process A/B 11.7/13.7 s vs 9.0/10.0 s inlined: LOSS (the
    ExistingRDD base has no stats, the pair and residual joins fall
    from broadcast to sort-merge); (b) same + explicit BROADCAST
    hints — same-session 5.12/2.60 vs 3.63/2.98 s: cold loss, warm
    wash; (c) tracked_cache + eager fill (stats flow, broadcasts come
    back) — fill+tail 7.83/3.99 vs 5.15/3.74 s: cold loss, warm wash.
    ALL REJECTED: the re-derived subtree is a customer⋈orders
    aggregation over SMALL dims, cheaper than any materialization
    barrier + fill at this scale. The inlined shared text stands as
    the measured local optimum (plan evidence:
    plans/r12/passing_bablok_regression_before.txt = the LIVE inlined
    plan, .._rejected_materialized.txt = variant (a), kept as the
    adjudication record: parquet scans 12 → 0, Exchange 18 → 6, but
    BroadcastHashJoin 6 → 0 / SortMergeJoin 4 — the stats loss). At
    true 100-TB the decision flips — materialize ``cust`` via the
    ``_pb_sql(cust=...)`` seam exactly as variant (a) does — because
    customer⋈orders becomes the dominant cost and three derivations
    of it dwarf one materialization; that switch point is the same
    scale knob as misra_gries' (data-sized base vs bounded summary)."""
    register_views(spark, sf_dir)
    return spark.sql(_pb_sql("DIV"))


# ---------------------------------------------------------------------------
# quantile regression through the origin (exact weighted-quantile selection)
# ---------------------------------------------------------------------------


def _qr_sql() -> str:
    """ONE shared text, no dialect parameters — every threshold compare
    is multiplicative (integer quarters), so nothing needs // vs DIV."""
    return """
WITH cust AS (
  SELECT c.c_custkey AS ck, c.c_nationkey AS nk,
         CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
),
sl AS (
  SELECT nk, ck,
         CAST(y AS DOUBLE) / CAST(x AS DOUBLE) AS s,
         CAST(ABS(x) AS BIGINT) AS w,
         CASE WHEN x > 0 THEN 1 ELSE -1 END AS sgn
  FROM cust WHERE x <> 0
),
r AS (
  SELECT nk, ck, s, w, sgn,
         CAST(SUM(w) OVER (PARTITION BY nk ORDER BY s, ck
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cw,
         CAST(SUM(CASE WHEN sgn > 0 THEN w ELSE 0 END)
              OVER (PARTITION BY nk) AS BIGINT) AS pw,
         CAST(SUM(CASE WHEN sgn < 0 THEN w ELSE 0 END)
              OVER (PARTITION BY nk) AS BIGINT) AS nw,
         CAST(COUNT(*) OVER (PARTITION BY nk) AS BIGINT) AS n_items
  FROM sl
),
taus AS (
  SELECT CAST(1 AS BIGINT) AS tau4 UNION ALL
  SELECT CAST(2 AS BIGINT) UNION ALL SELECT CAST(3 AS BIGINT)
),
hit AS (
  SELECT r.nk, t.tau4, r.s, r.n_items, r.pw + r.nw AS tw
  FROM r JOIN taus t
    ON 4 * r.cw >= t.tau4 * r.pw + (4 - t.tau4) * r.nw
   AND 4 * (r.cw - r.w) < t.tau4 * r.pw + (4 - t.tau4) * r.nw
)
SELECT nk AS nation_key, tau4 AS tau_quarters, n_items,
       tw AS weight_total, s AS b_tau
FROM hit
"""


@register("quantile_regression_origin", oracle=_qr_sql())
def quantile_regression_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile regression through the origin, exact by SELECTION (the
    second of VERDICT r11 ask #6's named candidates): for the model
    y = b·x, the check loss L(b) = Σ ρ_τ(y_i − b·x_i) is piecewise
    linear in b with breakpoints at the slopes s_i = y_i/x_i, and
    crossing ANY breakpoint ascending raises dL/db by exactly |x_i|
    (for x_i > 0 the residual turns negative; for x_i < 0 it turns
    POSITIVE — both add |x_i|). Starting from dL/db(−∞) =
    −τ·P − (1−τ)·N with P = Σ_{x>0} x and N = Σ_{x<0} |x|, the argmin
    is the first slope (in (s, ck) total order) whose cumulative
    |x|-weight reaches τ·P + (1−τ)·N — the plain weighted τ-quantile
    τ·W only when no negative x exist (the property test's argmin
    check caught exactly this: the naive τ·W threshold mis-selects at
    τ = ¾ in nations with negative balances). No iteration, no IRLS,
    no float accumulation: the threshold is the exact integer compare
    4·cumw ≥ τ4·P + (4−τ4)·N (τ ∈ {¼, ½, ¾} as integer quarters),
    each slope one IEEE division of int64 cents. Emitted per nation
    at all three quartiles — the b_¼/b_¾ spread is a robust
    heteroscedasticity ("spend per unit balance widens with
    balance?") audit, the grouped regression complement of
    weighted_quantiles_exact's plain quantiles.

    100-TB shape: ONE shuffle on the group key — the running
    cumulative-weight window and the total ride the same partition;
    the 3-row τ spine is a broadcast non-equi join whose BOTH-SIDED
    threshold predicate (4·(cumw−w) < τ4·W ≤ 4·cumw) admits exactly
    the first-hit row, so the join output is exactly 3 rows per group
    with no ranking window after it. Skew = the heaviest group, same
    bound as any per-group window. Scale bound:
    4·cumw ≤ 4·Σ|x| cents (int64 to ~2×10¹⁶ cents per group);
    τ4·W ≤ 3·W — no products of data-sized terms."""
    register_views(spark, sf_dir)
    return spark.sql(_qr_sql())


# ---------------------------------------------------------------------------
# per-class precision / recall / F1 over the language-ID confusion matrix
# ---------------------------------------------------------------------------


def _prf_oracle() -> str:
    from clean_census_acs_data_spark.queries_round7c import _LANG_CONFUSION_ORACLE

    return f"""
WITH cm AS ({_LANG_CONFUSION_ORACLE.strip()}),
tp AS (
  SELECT labeled_lang AS cls, CAST(SUM(n_docs) AS BIGINT) AS tp
  FROM cm WHERE labeled_lang = pred_lang GROUP BY labeled_lang
),
rowsum AS (
  SELECT labeled_lang AS cls, CAST(SUM(n_docs) AS BIGINT) AS support
  FROM cm GROUP BY labeled_lang
),
colsum AS (
  SELECT pred_lang AS cls, CAST(SUM(n_docs) AS BIGINT) AS predicted
  FROM cm GROUP BY pred_lang
)
SELECT r.cls AS lang,
       COALESCE(t.tp, 0) AS tp,
       COALESCE(c.predicted, 0) - COALESCE(t.tp, 0) AS fp,
       r.support - COALESCE(t.tp, 0) AS fn,
       r.support,
       CASE WHEN COALESCE(c.predicted, 0) > 0
            THEN 1000000 * COALESCE(t.tp, 0) // COALESCE(c.predicted, 0)
            ELSE CAST(0 AS BIGINT) END AS precision_ppm,
       CASE WHEN r.support > 0
            THEN 1000000 * COALESCE(t.tp, 0) // r.support
            ELSE CAST(0 AS BIGINT) END AS recall_ppm,
       CASE WHEN COALESCE(c.predicted, 0) + r.support > 0
            THEN 2000000 * COALESCE(t.tp, 0)
                 // (COALESCE(c.predicted, 0) + r.support)
            ELSE CAST(0 AS BIGINT) END AS f1_ppm
FROM rowsum r
LEFT JOIN tp t ON t.cls = r.cls
LEFT JOIN colsum c ON c.cls = r.cls
"""


@register("langid_eval_prf", oracle=_prf_oracle())
def langid_eval_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the language-ID heuristic
    against the labeled lang column — the eval-table completion of
    lang_id_confusion (the matrix names WHICH pairs confuse; this
    scores each class for the ship/no-ship decision). From the
    confusion matrix: tp = diagonal, fp = column sum − tp, fn = row
    sum − tp; precision/recall/F1 are micro-quantized EXACT truncating
    integer divisions (P = 10⁶·tp DIV predicted, R = 10⁶·tp DIV
    support, F1 = 2·10⁶·tp DIV (predicted + support) — the harmonic
    mean 2PR/(P+R) simplifies to one integer ratio, no float
    anywhere). Classes are the LABELED languages (rows); a class never
    predicted gets precision 0 by convention.

    100-TB shape: rides lang_id_confusion's plan — one row-local
    scoring pass, a ≤|langs|²-cell aggregate, then |langs|-row joins;
    eval cost is a sketch regardless of corpus size. Scale bound:
    10⁶·tp ≤ 10⁶·|docs| — int64 to ~9×10¹² docs."""
    from clean_census_acs_data_spark.queries_round7c import lang_id_confusion

    cm = lang_id_confusion(spark, sf_dir)
    # r12 optimization (guide §1.2): tp/rowsum/colsum are three DIFFERENT
    # aggregations of cm, so the former three-branch join re-derived the
    # whole confusion-matrix pipeline (scan + scoring + exchange) once
    # per branch — no exchange reuse possible across distinct grouping
    # keys. Instead each of the ≤|langs|² cells contributes to its
    # row-class (support, tp) and its column-class (predicted) via a
    # 2-way explode, and ONE groupBy(cls) reads all three sums off a
    # single cm derivation (cold A/B 5.2/5.4 → 1.6/1.7 s). Classes that
    # only ever appear as predictions (support = 0) are dropped, exactly
    # the oracle's FROM rowsum semantics; sums are the same exact
    # integers, so the output is bit-identical.
    zero = F.lit(0).cast("long")
    n = F.col("n_docs").cast("long")
    contrib = cm.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("labeled_lang").alias("cls"),
                    n.alias("sup_n"),
                    F.when(F.col("labeled_lang") == F.col("pred_lang"), n)
                    .otherwise(zero)
                    .alias("tp_n"),
                    zero.alias("pred_nc"),
                ),
                F.struct(
                    F.col("pred_lang").alias("cls"),
                    zero.alias("sup_n"),
                    zero.alias("tp_n"),
                    n.alias("pred_nc"),
                ),
            )
        ).alias("c")
    ).select("c.*")
    j = (
        contrib.groupBy("cls")
        .agg(
            F.sum("sup_n").cast("long").alias("support"),
            F.sum("tp_n").cast("long").alias("tp"),
            F.sum("pred_nc").cast("long").alias("pred_n"),
        )
        .where(F.col("support") > 0)
        .select("cls", "tp", "pred_n", "support")
    )
    return j.select(
        F.col("cls").alias("lang"),
        "tp",
        (F.col("pred_n") - F.col("tp")).cast("long").alias("fp"),
        (F.col("support") - F.col("tp")).cast("long").alias("fn"),
        "support",
        F.when(F.col("pred_n") > 0, F.expr("1000000 * tp DIV pred_n"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("precision_ppm"),
        F.when(F.col("support") > 0, F.expr("1000000 * tp DIV support"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("recall_ppm"),
        F.when(
            (F.col("pred_n") + F.col("support")) > 0,
            F.expr("2000000 * tp DIV (pred_n + support)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("f1_ppm"),
    )


# ---------------------------------------------------------------------------
# mean reciprocal rank of the live lexical retrieval leg
# ---------------------------------------------------------------------------

_MRR_ORACLE = """
WITH tok AS (
  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS t
  FROM documents
),
q AS (SELECT doc_id AS qid, source AS qsrc, t AS tq FROM tok WHERE doc_id < 10),
c AS (SELECT doc_id AS cid, source AS csrc, t FROM tok WHERE doc_id >= 10),
ranked AS (
  SELECT q.qid, q.qsrc, c.cid, c.csrc,
         ROW_NUMBER() OVER (PARTITION BY q.qid
                            ORDER BY len(list_intersect(c.t, q.tq)) DESC,
                                     c.cid) AS rnk
  FROM q CROSS JOIN c
),
firstrel AS (
  SELECT qid,
         CAST(MIN(CASE WHEN csrc = qsrc THEN rnk END) AS BIGINT)
           AS first_rel_rank,
         CAST(SUM(CASE WHEN csrc = qsrc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_relevant
  FROM ranked GROUP BY qid
)
SELECT qid AS query_doc, first_rel_rank, n_relevant,
       CAST(COALESCE(1000000 // first_rel_rank, 0) AS BIGINT) AS rr_ppm,
       CAST(SUM(CAST(COALESCE(1000000 // first_rel_rank, 0) AS BIGINT))
            OVER () AS BIGINT) AS mrr_ppm_sum,
       CAST(COUNT(*) OVER () AS BIGINT) AS n_queries
FROM firstrel
"""


@register("mrr_eval_retrieval", oracle=_MRR_ORACLE)
def mrr_eval_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the live token-overlap lexical leg (the
    same ranking rrf_hybrid_dense_lexical fuses and rbo_rank_overlap
    audits): 10 query documents (doc_id < 10), candidates = the rest,
    relevance = same ``source`` as the query doc. RR = 1/rank of the
    first relevant hit, micro-quantized by EXACT truncating integer
    division (10⁶ DIV rank — identical in both engines; 0 when no
    relevant doc ranks at all); MRR rides along as the order-free
    integer sum + query count, one final float division away. The
    third leg of the retrieval-eval triad: ndcg_eval_prefix_retrieval
    grades the whole prefix, rbo compares two rankings, MRR grades the
    first-hit latency — the metric that matters when one good document
    is enough (RAG, fact lookup).

    100-TB shape: the query side is a tiny broadcast (panel of probe
    queries); ranking is one window per query partition over the
    candidate score table (inverted postings are the registered scale
    path for the overlap scores); the eval output is |queries| rows.
    Scale bound: rr_ppm ≤ 10⁶, sums ≤ 10⁶·|queries|."""
    tok = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("t")
    )
    q = tok.where(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("qid"),
        F.col("source").alias("qsrc"),
        F.col("t").alias("tq"),
    )
    c = tok.where(F.col("doc_id") >= 10).select(
        F.col("doc_id").alias("cid"),
        F.col("source").alias("csrc"),
        "t",
    )
    ranked = (
        c.crossJoin(F.broadcast(q))
        .select(
            "qid",
            "qsrc",
            "cid",
            "csrc",
            F.size(F.array_intersect("t", "tq")).alias("overlap"),
        )
        .select(
            "qid",
            "qsrc",
            "csrc",
            F.row_number()
            .over(
                Window.partitionBy("qid").orderBy(
                    F.desc("overlap"), F.asc("cid")
                )
            )
            .alias("rnk"),
        )
    )
    firstrel = ranked.groupBy("qid").agg(
        F.min(F.when(F.col("csrc") == F.col("qsrc"), F.col("rnk")))
        .cast("long")
        .alias("first_rel_rank"),
        F.sum(F.when(F.col("csrc") == F.col("qsrc"), 1).otherwise(0))
        .cast("long")
        .alias("n_relevant"),
    )
    w = Window.partitionBy()
    rr = F.coalesce(
        F.expr("1000000 DIV first_rel_rank"), F.lit(0)
    ).cast("long")
    return firstrel.select(
        F.col("qid").alias("query_doc"),
        "first_rel_rank",
        "n_relevant",
        rr.alias("rr_ppm"),
        F.sum(rr).over(w).cast("long").alias("mrr_ppm_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_queries"),
    )


# ---------------------------------------------------------------------------
# binned keyed-layout write → readback (the 100-TB multi-file-per-key regime)
# ---------------------------------------------------------------------------

_BINNED_ORACLE = """
SELECT l_returnflag AS k,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem GROUP BY l_returnflag
"""


@register("keyed_layout_binned_readback", oracle=_BINNED_ORACLE)
def keyed_layout_binned_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-file-per-key writer regime, oracle-checked end-to-end
    (VERDICT r11 ask #7's scale half — census_write_readback certifies
    the one-file-per-key regime; this certifies the inverse). lineitem
    is written through write_keyed_layout with a row target, so each
    l_returnflag directory splits into ~ceil(n/target) hash-binned
    files written in PARALLEL by the (key, bin) shuffle; the frame is
    then READ BACK and aggregated per key. Hash-green against the
    aggregate of the RAW table certifies that binning lost, duplicated,
    and mutated nothing — the invariant a DISTKEY-analog loader must
    hold when a single key is terabytes wide. The layout itself
    (file counts, per-file sort) is pinned by
    tests/test_sinks.py::test_keyed_layout_multi_file_per_key.

    100-TB shape: one count aggregate (manifest-grained, broadcast
    back), one (key, bin) shuffle of explicit width, one partitioned
    write — write parallelism WITHIN a key = its bin count. Scale
    bound: cents sums per flag — int64 to ~9×10¹⁶ cents."""
    import os

    from clean_census_acs_data_spark.functions import cents
    from clean_census_acs_data_spark.plans.census_pipeline import write_keyed_layout

    df = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        cents("l_extendedprice").alias("price_cents_row"),
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        "keyed_layout_binned.parquet",
    )
    write_keyed_layout(
        df,
        path,
        key="l_returnflag",
        sort_cols=("l_orderkey",),
        target_rows_per_file=8000,
    )
    back = spark.read.schema(df.schema).parquet(path)
    return back.groupBy(F.col("l_returnflag").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        F.sum("price_cents_row").cast("long").alias("price_cents"),
    )


# ---------------------------------------------------------------------------
# isotonic regression via the exact min-max formula (PAVA's closed form)
# ---------------------------------------------------------------------------

_ISO_SQL = """
WITH p AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS y,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i
  FROM events WHERE event_type = 'purchase'
),
ps AS (
  SELECT user_id, i, y,
         CAST(SUM(y) OVER (PARTITION BY user_id ORDER BY i) AS BIGINT) AS s
  FROM p
),
pairs AS (
  SELECT a.user_id, a.i AS j, b.i AS k,
         CAST(b.s - a.s + a.y AS DOUBLE) / CAST(b.i - a.i + 1 AS DOUBLE)
           AS avgjk
  FROM ps a JOIN ps b ON a.user_id = b.user_id AND a.i <= b.i
),
sm AS (
  SELECT user_id, j, k,
         MIN(avgjk) OVER (PARTITION BY user_id, j ORDER BY k
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS suffmin
  FROM pairs
),
fit AS (
  SELECT user_id, k AS i, MAX(suffmin) AS yhat
  FROM sm GROUP BY user_id, k
)
SELECT f.user_id, CAST(f.i AS BIGINT) AS pos, p2.y AS y_cents, f.yhat
FROM fit f JOIN ps p2 ON p2.user_id = f.user_id AND p2.i = f.i
"""


@register("isotonic_regression_pava", oracle=_ISO_SQL)
def isotonic_regression_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing least-squares) regression of
    each user's purchase values over time — the calibration primitive
    behind monotone probability calibration and score-to-rate mapping
    in ranking pipelines (calibration_bins_audit is the binned
    sibling; this is the exact fit). Instead of the sequential
    pool-adjacent-violators loop, the engine computes PAVA's CLOSED
    FORM: ŷ_i = max_{j≤i} min_{k≥i} avg(y_j..y_k) — one per-user
    prefix-sum window, one per-user pair self-join, a suffix-MIN
    window per (user, j), and a MAX group-by. Every candidate average
    is a single IEEE division of int64 prefix-sum differences
    (bit-identical across engines); MIN/MAX never accumulate floats.
    ONE shared SQL text runs verbatim on both engines.

    100-TB shape: the O(n²) pair table is per-user bounded (the Walsh
    pairs / theil_sen discipline — ≤ 26 purchases/user here means
    ≤ 351 pairs/user); every exchange hashes on user_id. Groups of
    millions need the sequential-PAVA-in-applyInPandas switch (O(n)
    per group) — same answer, different physical strategy; the
    min-max form is the one with an engine-shared exact text. Scale
    bound: prefix sums of cents per user — int64 to ~9×10¹⁶ cents."""
    register_views(spark, sf_dir)
    return spark.sql(_ISO_SQL)


# ---------------------------------------------------------------------------
# exact hourly autocorrelation profile (lag 1 vs lag 24 — seasonality audit)
# ---------------------------------------------------------------------------


def _acf_sql(series_fn: str) -> str:
    """Shared text; only the dense-hour-spine generator is dialect-
    specific (Spark explode(sequence(...)) vs DuckDB
    unnest(generate_series(...)))."""
    return f"""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS mn, date_trunc('hour', MAX(ts)) AS mx
  FROM events
),
spine AS (SELECT {series_fn} AS h FROM bounds),
types AS (SELECT DISTINCT event_type FROM events),
cnt AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
series AS (
  SELECT t.event_type, s.h, CAST(COALESCE(c.x, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN spine s
  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.h = s.h
),
w AS (
  SELECT event_type, h, x,
         LEAD(x, 1)  OVER (PARTITION BY event_type ORDER BY h) AS x1,
         LEAD(x, 24) OVER (PARTITION BY event_type ORDER BY h) AS x24,
         CAST(SUM(x)    OVER (PARTITION BY event_type) AS BIGINT) AS sx,
         CAST(COUNT(*)  OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM series
),
agg AS (
  SELECT event_type,
         CAST(MAX(n) AS BIGINT) AS n_hours,
         CAST(MAX(sx) AS BIGINT) AS sum_x,
         CAST(SUM((n * x - sx) * (n * x - sx)) AS BIGINT) AS acf_den,
         CAST(SUM(CASE WHEN x1 IS NOT NULL
                       THEN (n * x - sx) * (n * x1 - sx) ELSE 0 END)
              AS BIGINT) AS acf1_num,
         CAST(SUM(CASE WHEN x24 IS NOT NULL
                       THEN (n * x - sx) * (n * x24 - sx) ELSE 0 END)
              AS BIGINT) AS acf24_num
  FROM w GROUP BY event_type
)
SELECT event_type, n_hours, sum_x, acf1_num, acf24_num, acf_den,
       CASE WHEN acf_den > 0
            THEN CAST(acf1_num AS DOUBLE) / CAST(acf_den AS DOUBLE)
            ELSE NULL END AS r_lag1,
       CASE WHEN acf_den > 0
            THEN CAST(acf24_num AS DOUBLE) / CAST(acf_den AS DOUBLE)
            ELSE NULL END AS r_lag24
FROM agg
"""


@register(
    "acf_hourly_lag_profile",
    oracle=_acf_sql("unnest(generate_series(mn, mx, INTERVAL 1 hour))"),
)
def acf_hourly_lag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sample autocorrelation of each event type's hourly count
    series at lag 1 vs lag 24 — the seasonality/monitoring audit
    (r_24 ≫ r_1 ⟹ daily cycle dominates; a drop in r_24 is the
    earliest structural-change alarm for an ingestion pipeline). The
    series is made DENSE first (hour spine × type, missing hours
    count 0 — silently skipping empty hours would corrupt every lag),
    then r_L = Σ(x_t−x̄)(x_{t+L}−x̄)/Σ(x_t−x̄)², cleared of the
    rational mean by multiplying through by n²: every numerator and
    denominator term is the exact integer (n·x_t − S)(n·x_{t+L} − S),
    summed order-free; the two r values are single final divisions.
    Shared SQL text; only the spine generator is dialect-specific.

    100-TB shape: the spine cross is |types| × |hours| (a broadcast
    of the tiny side); counts partial-aggregate map-side before the
    one shuffle on (type, hour); the lag windows ride one exchange on
    event_type. Scale bound at sealed scales: n = 720 hours, x ≤ a
    few hundred/hour ⇒ |n·x − S| ≤ ~10⁵·7×10² and term sums ≤ ~10¹³
    (inside int64 AND 2^53 for the float tail). Hour counts of ~10⁹
    (true 100-TB firehose) overflow the int64 products — that regime
    switches these sums to DECIMAL(38,0)/HUGEINT, the
    spearman_rho_decimal device, same text shape."""
    register_views(spark, sf_dir)
    return spark.sql(_acf_sql("explode(sequence(mn, mx, interval 1 hour))"))


# ---------------------------------------------------------------------------
# UDTF shape 4: analyze-time output schema derived from the TABLE argument
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH v AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS size_units,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS retail_cents
  FROM part
)
SELECT p_partkey, 'size_units' AS metric, size_units AS value FROM v
UNION ALL
SELECT p_partkey, 'retail_cents' AS metric, retail_cents AS value FROM v
"""


@register("udtf_analyze_table_unpivot", oracle=_UNPIVOT_ORACLE)
def udtf_analyze_table_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT through a Spark 4 Python UDTF whose ``analyze()``
    derives the output schema FROM THE TABLE ARGUMENT'S StructType —
    the key column keeps the input's first field name AND type, and
    every other BIGINT column melts into (metric, value) rows. This is
    the fourth UDTF shape in the registry (VERDICT r11 ask #6's named
    candidate): static returnType (udtf_tokenize) < literal-driven
    polymorphic analyze (udtf_ngrams_polymorphic) < TABLE argument
    with PARTITION BY/ORDER BY (udtf_table_arg_sessionize) < THIS —
    schema a function of the input RELATION's shape, the contract a
    reusable melt/normalize operator needs (point it at any keyed
    table of metrics without redeclaring output columns).

    The oracle is the plain UNION ALL expansion — independent
    algorithms for one definition. Built-in stack()/UNPIVOT is the
    JVM hot-path twin; this entry exists to cover the API shape.
    Contract note: NULL metric cells are dropped (eval dispatches on
    the VALUE's runtime type — the UDTF API gives eval() no schema
    handle, so a null long is indistinguishable from a null string);
    the melted tables here are null-free by construction. For the same
    reason analyze() REJECTS tables with INT/SMALLINT/TINYINT metric
    columns (cast to BIGINT first): eval's runtime-int dispatch cannot
    tell them from BIGINT, so accepting them would melt columns the
    declared contract excludes.

    100-TB shape: row-local generation, no shuffle induced by the
    UDTF itself (no PARTITION BY — the planner keeps the scan's
    partitioning); like every row-at-a-time Python UDTF it is the
    declared slow path. Scale bound: none — values pass through."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class UnpivotLongs:
        @staticmethod
        def analyze(t: AnalyzeArgument) -> AnalyzeResult:
            from pyspark.sql.types import ByteType, IntegerType, ShortType

            fields = list(t.dataType.fields)
            key = fields[0]
            melted = [
                f.name for f in fields[1:] if isinstance(f.dataType, LongType)
            ]
            # eval() dispatches on the VALUE's runtime type (Python
            # int), which cannot tell BIGINT from INT/SMALLINT/TINYINT
            # — so analyze() must REJECT tables where the two rules
            # would disagree instead of silently melting columns the
            # declared BIGINT-only contract excludes (r12 review
            # finding).
            narrow = [
                f.name
                for f in fields[1:]
                if isinstance(f.dataType, (ByteType, ShortType, IntegerType))
            ]
            if narrow:
                raise ValueError(
                    f"non-BIGINT integer metric columns {narrow}: the melt "
                    "contract is BIGINT-only — CAST them to BIGINT first"
                )
            if not melted:
                raise ValueError("table argument has no BIGINT metric columns")
            return AnalyzeResult(
                StructType(
                    [
                        StructField(key.name, key.dataType),
                        StructField("metric", StringType()),
                        StructField("value", LongType()),
                    ]
                )
            )

        def eval(self, row):
            fields = row.__fields__
            key = row[fields[0]]
            for name in fields[1:]:
                v = row[name]
                if isinstance(v, int) and not isinstance(v, bool):
                    yield (key, name, v)

    spark.udtf.register("unpivot_longs_fn", UnpivotLongs)
    from clean_census_acs_data_spark.io import spread

    spread(
        _t(spark, sf_dir, "part").select(
            "p_partkey",
            F.col("p_size").cast("long").alias("size_units"),
            F.round(F.col("p_retailprice") * 100)
            .cast("long")
            .alias("retail_cents"),
        )
    ).createOrReplaceTempView("__unpivot_parts")
    return spark.sql("SELECT * FROM unpivot_longs_fn(TABLE(__unpivot_parts))")
