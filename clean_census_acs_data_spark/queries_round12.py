"""Round-12 batch: causal/survival statistics and two corpus-ops, all
under the repo's exact-integer oracle discipline (every float column is
a SINGLE IEEE division of exact integers, so Spark and DuckDB produce
bit-identical doubles).

- ``chi2_independence_cells`` — contingency-table independence audit
  (order priority × status): observed counts, milli-fixed-point
  expected counts and per-cell chi-square contributions, plus the
  summed statistic row. Integer ``DIV``/``//`` floor division on both
  engines — no float in the statistic at all.
- ``did_estimator``          — difference-in-differences: 2×2
  (treated × pre/post) conditional aggregation to ONE row, means in
  exact micro-units, the DiD contrast as pure integer arithmetic.
- ``nelson_aalen_hazard``    — right-censored time-to-conversion:
  per-hour risk sets via a reverse cumulative window, Nelson–Aalen
  cumulative hazard as a fixed-point (micro) floor-then-cumsum — the
  survival-analysis estimator, exact.
- ``ewma_dyadic_user_value`` — per-user exponential moving average
  with dyadic (α=1/2) weights over the trailing 16 events: weights are
  powers of two, so the weighted numerator/denominator are exact
  BIGINTs and the EWMA is exact integer division — no recursive float
  state anywhere.
- ``tv_distance_sources``    — pairwise total-variation distance
  between per-source token distributions, via the inner-join-only
  identity TV·2·Na·Nb = 2·Na·Nb − Nb·Σ∩ca − Na·Σ∩cb + Σ∩|ca·Nb − cb·Na|
  (tokens private to one source never materialize a joined row).
- ``length_bucket_batching`` — inference-serving batch packer audit:
  64-char length buckets, 32-doc batches in (length, id) order,
  per-batch padding waste — the query that prices padding before a
  bucketing strategy is fixed.

Reference tie: none of this exists in the reference (SURVEY.md §2B);
these extend the engine's stats/corpus tiers. Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# chi-square independence audit (priority × status), exact fixed-point
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH cells AS (
  SELECT o_orderpriority AS priority, o_orderstatus AS status,
         CAST(COUNT(*) AS BIGINT) AS observed
  FROM orders GROUP BY 1, 2
),
tot AS (
  SELECT priority, status, observed,
         SUM(observed) OVER (PARTITION BY priority) AS r,
         SUM(observed) OVER (PARTITION BY status) AS c,
         SUM(observed) OVER () AS n
  FROM cells
),
k AS (
  SELECT priority, status, observed,
         (r * c * 1000) // n AS expected_milli,
         ((observed * 1000 - (r * c * 1000) // n)
          * (observed * 1000 - (r * c * 1000) // n))
           // ((r * c * 1000) // n) AS chi2_milli
  FROM tot
)
SELECT priority, status, observed,
       CAST(expected_milli AS BIGINT) AS expected_milli,
       CAST(chi2_milli AS BIGINT) AS chi2_milli
FROM k
UNION ALL
SELECT '(all)', '(all)', CAST(SUM(observed) AS BIGINT),
       CAST(SUM(expected_milli) AS BIGINT),
       CAST(SUM(chi2_milli) AS BIGINT)
FROM k
"""


@register("chi2_independence_cells", oracle=_CHI2_ORACLE)
def chi2_independence_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence audit of order priority vs
    status: per-cell observed counts, expected counts under
    independence (r·c/n) and chi-square contributions ((o−e)²/e), all
    in milli-fixed-point computed with integer floor division — the
    statistic is exact, so the hash can't drift on float summation
    order. A summed '(all)' row carries the test statistic (df is the
    constant (R−1)(C−1), left to the consumer).

    Expected/contribution milli values are exact while r·c·1000 and
    (1000·(o−e))² fit int64 — up to ~sf1000 and ~sf10 respectively for
    this 15-cell grid; past that the same expressions lift to
    decimal(38,0) unchanged.

    100-TB shape: ONE partial-aggregated shuffle to the 15-cell grid;
    the row/column/grand totals are windows over the 15-row aggregate
    (post-agg, sub-kilobyte), never a second pass over the fact
    table."""
    cells = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    tot = cells.select(
        "priority",
        "status",
        "observed",
        F.sum("observed").over(Window.partitionBy("priority")).alias("r"),
        F.sum("observed").over(Window.partitionBy("status")).alias("c"),
        F.sum("observed").over(Window.partitionBy()).alias("n"),
    )
    e_milli = F.expr("(r * c * 1000) DIV n")
    k = tot.select(
        "priority",
        "status",
        "observed",
        e_milli.cast("long").alias("expected_milli"),
        F.expr(
            "((observed * 1000 - (r * c * 1000) DIV n)"
            " * (observed * 1000 - (r * c * 1000) DIV n))"
            " DIV ((r * c * 1000) DIV n)"
        )
        .cast("long")
        .alias("chi2_milli"),
    )
    total = k.agg(
        F.sum("observed").cast("long").alias("observed"),
        F.sum("expected_milli").cast("long").alias("expected_milli"),
        F.sum("chi2_milli").cast("long").alias("chi2_milli"),
    ).select(
        F.lit("(all)").alias("priority"),
        F.lit("(all)").alias("status"),
        "observed",
        "expected_milli",
        "chi2_milli",
    )
    return k.unionByName(total)


# ---------------------------------------------------------------------------
# difference-in-differences (2×2 conditional aggregation, one row)
# ---------------------------------------------------------------------------

_DID_CUTOFF = "2024-01-16 00:00:00"


def _did_cell_sql(treated: int, post: str) -> str:
    cond = (
        f"user_id % 2 {'=' if treated else '<>'} 0 AND "
        f"ts {'>=' if post == 'post' else '<'} TIMESTAMP '{_DID_CUTOFF}'"
    )
    return cond


_DID_ORACLE = f"""
WITH v AS (
  SELECT user_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
g AS (
  SELECT
    SUM(CASE WHEN {_did_cell_sql(1, 'post')} THEN cents ELSE 0 END) AS s11,
    SUM(CASE WHEN {_did_cell_sql(1, 'pre')} THEN cents ELSE 0 END) AS s10,
    SUM(CASE WHEN {_did_cell_sql(0, 'post')} THEN cents ELSE 0 END) AS s01,
    SUM(CASE WHEN {_did_cell_sql(0, 'pre')} THEN cents ELSE 0 END) AS s00,
    SUM(CASE WHEN {_did_cell_sql(1, 'post')} THEN 1 ELSE 0 END) AS n11,
    SUM(CASE WHEN {_did_cell_sql(1, 'pre')} THEN 1 ELSE 0 END) AS n10,
    SUM(CASE WHEN {_did_cell_sql(0, 'post')} THEN 1 ELSE 0 END) AS n01,
    SUM(CASE WHEN {_did_cell_sql(0, 'pre')} THEN 1 ELSE 0 END) AS n00
  FROM v
)
SELECT
  CAST(n11 AS BIGINT) AS n_treated_post, CAST(n10 AS BIGINT) AS n_treated_pre,
  CAST(n01 AS BIGINT) AS n_control_post, CAST(n00 AS BIGINT) AS n_control_pre,
  CAST((s11 * 10000) // n11 AS BIGINT) AS mean_treated_post_micro,
  CAST((s10 * 10000) // n10 AS BIGINT) AS mean_treated_pre_micro,
  CAST((s01 * 10000) // n01 AS BIGINT) AS mean_control_post_micro,
  CAST((s00 * 10000) // n00 AS BIGINT) AS mean_control_pre_micro,
  CAST(((s11 * 10000) // n11 - (s10 * 10000) // n10)
       - ((s01 * 10000) // n01 - (s00 * 10000) // n00) AS BIGINT)
    AS did_micro
FROM g
"""


@register("did_estimator", oracle=_DID_ORACLE)
def did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the events stream: treated =
    even user_id (a deterministic synthetic assignment — the OPERATOR
    is the 2×2 contrast, not the assignment), post = on/after Jan 16.
    Cell means are exact micro-dollar fixed-point ((Σcents·10⁴) DIV n)
    and the DiD contrast is integer subtraction of those — the whole
    estimator is exact, no float mean anywhere.

    100-TB shape: one conditional aggregation — eight partial-agg
    accumulators map-side, a single 1-row reduce. No join, no window,
    no second pass; this is the cheapest possible causal contrast at
    any scale."""
    treated = F.col("user_id") % 2 == 0
    post = F.col("ts") >= F.lit(_DID_CUTOFF).cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")

    def s(t, p):
        cond = (treated if t else ~treated) & (post if p else ~post)
        return F.sum(F.when(cond, cents).otherwise(F.lit(0)))

    def n(t, p):
        cond = (treated if t else ~treated) & (post if p else ~post)
        return F.sum(F.when(cond, 1).otherwise(0))

    g = _t(spark, sf_dir, "events").agg(
        s(1, 1).alias("s11"), s(1, 0).alias("s10"),
        s(0, 1).alias("s01"), s(0, 0).alias("s00"),
        n(1, 1).alias("n11"), n(1, 0).alias("n10"),
        n(0, 1).alias("n01"), n(0, 0).alias("n00"),
    )
    mean = lambda sc, nc: F.expr(f"({sc} * 10000) DIV {nc}")  # noqa: E731
    return g.select(
        F.col("n11").cast("long").alias("n_treated_post"),
        F.col("n10").cast("long").alias("n_treated_pre"),
        F.col("n01").cast("long").alias("n_control_post"),
        F.col("n00").cast("long").alias("n_control_pre"),
        mean("s11", "n11").cast("long").alias("mean_treated_post_micro"),
        mean("s10", "n10").cast("long").alias("mean_treated_pre_micro"),
        mean("s01", "n01").cast("long").alias("mean_control_post_micro"),
        mean("s00", "n00").cast("long").alias("mean_control_pre_micro"),
        (
            (mean("s11", "n11") - mean("s10", "n10"))
            - (mean("s01", "n01") - mean("s00", "n00"))
        )
        .cast("long")
        .alias("did_micro"),
    )


# ---------------------------------------------------------------------------
# Nelson–Aalen cumulative hazard (right-censored time-to-conversion)
# ---------------------------------------------------------------------------

_STUDY_END = "2024-01-31 00:00:00"

_NA_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         MIN(ts) AS first_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS conv_ts
  FROM events GROUP BY user_id
),
d AS (
  SELECT user_id,
         CASE WHEN conv_ts IS NOT NULL THEN 1 ELSE 0 END AS event,
         (epoch_us(COALESCE(conv_ts, TIMESTAMP '{_STUDY_END}'))
          - epoch_us(first_ts)) // 3600000000 AS t_hours
  FROM u
),
agg AS (
  SELECT t_hours,
         SUM(event) AS d_events,
         SUM(1 - event) AS c_censored
  FROM d GROUP BY t_hours
),
risk AS (
  SELECT t_hours, d_events, c_censored,
         SUM(d_events + c_censored) OVER (
           ORDER BY t_hours DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
  FROM agg
),
h AS (
  SELECT t_hours, n_risk, d_events, c_censored,
         (d_events * 1000000) // n_risk AS hazard_micro
  FROM risk
)
SELECT CAST(t_hours AS BIGINT) AS t_hours,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d_events AS BIGINT) AS d_events,
       CAST(c_censored AS BIGINT) AS c_censored,
       CAST(hazard_micro AS BIGINT) AS hazard_micro,
       CAST(SUM(hazard_micro) OVER (
         ORDER BY t_hours
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_hazard_micro
FROM h
"""


@register("nelson_aalen_hazard", oracle=_NA_ORACLE)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimate of time-to-first-
    purchase, right-censored at the study end: per user, duration =
    hours from first event to first purchase (or to the fixed study
    end if none). Risk set n(t) = users still unconverted and
    uncensored at t, via a REVERSE cumulative window over the per-hour
    aggregate; hazard increments d(t)/n(t) in micro fixed-point
    (floor), then a forward cumsum — the estimator is exact integers
    end to end, which a product-limit (Kaplan–Meier) float form could
    never hash-match across engines.

    100-TB shape: one shuffle to per-user extrema (partial-agg
    min/conditional-min), one to the per-hour grid (≤ study span
    rows); both windows run over the post-agg grid, not the events.
    The fixed study end keeps the pipeline join-free — a data-derived
    end would add one broadcast 1-row scalar.

    Scale bound: hazard_micro = d·1e6 DIV n_risk with d ≤ n_risk, so each term ≤ 1e6 and the product wraps only at d ≥ 9.2e12 deaths in ONE hour bucket; the cumulative sum ≤ n_buckets·1e6."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "conv_ts"
        ),
    )
    end = F.lit(_STUDY_END).cast("timestamp")
    d = u.select(
        F.when(F.col("conv_ts").isNotNull(), 1).otherwise(0).alias("event"),
        F.expr(
            f"(unix_micros(coalesce(conv_ts, TIMESTAMP '{_STUDY_END}'))"
            " - unix_micros(first_ts)) DIV 3600000000"
        ).alias("t_hours"),
    )
    agg = d.groupBy("t_hours").agg(
        F.sum("event").alias("d_events"),
        F.sum(F.lit(1) - F.col("event")).alias("c_censored"),
    )
    w_rev = (
        Window.orderBy(F.desc("t_hours"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = agg.withColumn(
        "n_risk", F.sum(F.col("d_events") + F.col("c_censored")).over(w_rev)
    )
    h = risk.withColumn(
        "hazard_micro", F.expr("(d_events * 1000000) DIV n_risk")
    )
    w_fwd = (
        Window.orderBy("t_hours")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return h.select(
        F.col("t_hours").cast("long").alias("t_hours"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_events").cast("long").alias("d_events"),
        F.col("c_censored").cast("long").alias("c_censored"),
        F.col("hazard_micro").cast("long").alias("hazard_micro"),
        F.sum("hazard_micro").over(w_fwd).cast("long").alias("cum_hazard_micro"),
    )


# ---------------------------------------------------------------------------
# dyadic EWMA (α = 1/2), trailing 16 events, exact integers
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS v_cents
  FROM events
),
f AS (
  SELECT event_id, user_id, v_cents,
         list(v_cents) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS a
  FROM v
)
SELECT event_id, user_id, v_cents,
       CAST(list_sum(list_transform(range(1, len(a) + 1),
              i -> a[i] * ((1::BIGINT) << (16 - len(a) + i - 1)))) AS BIGINT)
         AS ewma_num,
       CAST(((1::BIGINT) << 16) - ((1::BIGINT) << (16 - len(a))) AS BIGINT)
         AS ewma_den,
       CAST(list_sum(list_transform(range(1, len(a) + 1),
              i -> a[i] * ((1::BIGINT) << (16 - len(a) + i - 1))))
            // (((1::BIGINT) << 16) - ((1::BIGINT) << (16 - len(a))))
            AS BIGINT) AS ewma_cents
FROM f
"""


@register("ewma_dyadic_user_value", oracle=_EWMA_ORACLE)
def ewma_dyadic_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average of event value with dyadic
    decay (α = 1/2) over the trailing 16 events: the current event
    carries weight 2¹⁵, each older one half that, so numerator and
    denominator are EXACT int64 (weights are bit-shifts, values are
    cents) and the smoothed value is exact integer division. The usual
    recursive float EWMA can't cross-engine hash; the truncated dyadic
    form is the fixed-point answer (the dropped tail past 16 lags
    weighs < 2⁻¹⁶ of the window — below one cent for any realistic
    value).

    100-TB shape: one hash exchange on user_id; the frame bounds state
    at 16 values per row regardless of user history (same skew
    argument as window_distinct_rolling). The weighted sum is a JVM
    higher-order zip_with/aggregate over a ≤16-element array — no
    Python, no explode."""
    v = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, Window.currentRow)
    )
    f = v.select(
        "event_id",
        "user_id",
        "v_cents",
        F.collect_list("v_cents").over(w).alias("a"),
    )
    num = F.expr(
        "aggregate(zip_with(a, sequence(1, size(a)),"
        " (x, i) -> x * shiftleft(1L, 16 - size(a) + i - 1)),"
        " 0L, (acc, x) -> acc + x)"
    )
    den = F.expr("shiftleft(1L, 16) - shiftleft(1L, 16 - size(a))")
    return f.select(
        "event_id",
        "user_id",
        "v_cents",
        num.cast("long").alias("ewma_num"),
        den.cast("long").alias("ewma_den"),
    ).withColumn(
        "ewma_cents", F.expr("ewma_num DIV ewma_den").cast("long")
    )


# ---------------------------------------------------------------------------
# pairwise total-variation distance between source token distributions
# ---------------------------------------------------------------------------

_TV_ORACLE = """
WITH toks AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
),
c AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE token <> '' GROUP BY 1, 2
),
n AS (SELECT source, SUM(cnt) AS total FROM c GROUP BY source),
cw AS (SELECT c.source, c.token, c.cnt, n.total FROM c JOIN n USING (source)),
pair AS (
  SELECT a.source AS source_a, b.source AS source_b,
         ANY_VALUE(a.total) AS na, ANY_VALUE(b.total) AS nb,
         SUM(a.cnt) AS s_ca, SUM(b.cnt) AS s_cb,
         SUM(ABS(a.cnt * b.total - b.cnt * a.total)) AS s_abs
  FROM cw a JOIN cw b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b,
       CAST((na * nb - nb * s_ca) + (na * nb - na * s_cb) + s_abs AS BIGINT)
         AS tv_num,
       CAST(2 * na * nb AS BIGINT) AS tv_den,
       CAST((na * nb - nb * s_ca) + (na * nb - na * s_cb) + s_abs AS DOUBLE)
         / CAST(2 * na * nb AS DOUBLE) AS tv
FROM pair
"""


@register("tv_distance_sources", oracle=_TV_ORACLE)
def tv_distance_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance ½·Σ|p−q| between every pair of
    source-level token distributions — the exact corpus-drift /
    domain-shift number (its sibling divergences need logs; TV is
    rational, so it hashes). The Σ over ALL tokens reduces to the
    INNER join only: tokens private to a source contribute
    Na·Nb − Nb·Σ∩ca (resp. Na·Nb − Na·Σ∩cb) via totals — no full-outer
    join, no zero-filled rows. tv_num/tv_den are exact BIGINTs; tv is
    one IEEE division of those (bit-identical on both engines).

    100-TB shape: counts partial-aggregate to |source×vocab|; the
    pair join is a posting-style self-equi-join on token whose fan-out
    per token is (#sources containing it)² — bounded by the domain
    count squared, independent of corpus size. Totals ride a broadcast
    join on source. int64 holds tv_num while Na·Nb < 2⁶³ (~3·10⁹
    tokens per source); past that the same algebra lifts to
    decimal(38,0)."""
    d = _t(spark, sf_dir, "documents").repartition(8)
    toks = d.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    ).where(F.col("token") != "")
    # token strings never leave the tokenize stage: the count shuffle and
    # the pair self-join key on the 8-byte xxhash64 instead (collision
    # odds ~1e-10 at 100 TB vocab sizes; a collision would merge two
    # tokens' counts on both legs symmetrically). Same discipline as
    # ngram_jaccard_pairs.
    c = toks.groupBy("source", F.xxhash64("token").alias("tok_h")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    n = c.groupBy("source").agg(F.sum("cnt").alias("total"))
    # cw feeds both join sides but is NOT cached: warm A/B at sf0.1
    # measured 1.15 s uncached vs 1.29 cached (fill + eager count beat
    # the codegen recompute)
    cw = c.join(F.broadcast(n), "source")
    a = cw.select(
        F.col("source").alias("source_a"),
        F.col("tok_h"),
        F.col("cnt").alias("ca"),
        F.col("total").alias("na"),
    )
    b = cw.select(
        F.col("source").alias("source_b"),
        F.col("tok_h"),
        F.col("cnt").alias("cb"),
        F.col("total").alias("nb"),
    )
    pair = (
        a.join(b, ["tok_h"])
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
            F.sum("ca").alias("s_ca"),
            F.sum("cb").alias("s_cb"),
            F.sum(
                F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
            ).alias("s_abs"),
        )
    )
    num = (
        (F.col("na") * F.col("nb") - F.col("nb") * F.col("s_ca"))
        + (F.col("na") * F.col("nb") - F.col("na") * F.col("s_cb"))
        + F.col("s_abs")
    )
    den = F.lit(2) * F.col("na") * F.col("nb")
    return pair.select(
        "source_a",
        "source_b",
        num.cast("long").alias("tv_num"),
        den.cast("long").alias("tv_den"),
        (num.cast("double") / den.cast("double")).alias("tv"),
    )


# ---------------------------------------------------------------------------
# length-bucket batching audit (inference padding waste)
# ---------------------------------------------------------------------------

_BATCH_ORACLE = """
WITH b AS (
  SELECT doc_id, n_chars,
         n_chars // 64 AS bucket,
         row_number() OVER (PARTITION BY n_chars // 64
                            ORDER BY n_chars, doc_id) AS rn
  FROM documents
),
g AS (
  SELECT bucket, (rn - 1) // 32 AS batch_id, n_chars
  FROM b
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(batch_id AS BIGINT) AS batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(COUNT(*) * MAX(n_chars) - SUM(n_chars) AS BIGINT)
         AS padded_chars,
       CAST(SUM(n_chars) AS DOUBLE)
         / CAST(COUNT(*) * MAX(n_chars) AS DOUBLE) AS fill_ratio
FROM g
GROUP BY 1, 2
"""


@register("length_bucket_batching", oracle=_BATCH_ORACLE)
def length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference batch-packing audit: documents fall into 64-char
    length buckets, are batched 32 at a time in (length, id) order
    within each bucket, and each batch reports its padding waste
    (batch is padded to its longest member). This is the query that
    prices a serving/tokenization bucketing strategy before it's
    deployed — padded_chars is the wasted compute, fill_ratio the
    utilization (one IEEE division of exact integers).

    100-TB shape: one hash exchange on bucket for the row_number
    window (buckets are numerous and balanced by construction — the
    64-char quantization is the salt), then the batch aggregate reuses
    the same partitioning. No joins; output is |docs|/32 rows."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bucket = F.expr("n_chars DIV 64")
    w = Window.partitionBy(bucket).orderBy("n_chars", "doc_id")
    b = d.select(
        bucket.alias("bucket"),
        "n_chars",
        F.row_number().over(w).alias("rn"),
    )
    g = b.select(
        "bucket", F.expr("(rn - 1) DIV 32").alias("batch_id"), "n_chars"
    )
    return (
        g.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("batch_id").cast("long").alias("batch_id"),
            "n_docs",
            "max_chars",
            "sum_chars",
            (F.col("n_docs") * F.col("max_chars") - F.col("sum_chars"))
            .cast("long")
            .alias("padded_chars"),
            (
                F.col("sum_chars").cast("double")
                / (F.col("n_docs") * F.col("max_chars")).cast("double")
            ).alias("fill_ratio"),
        )
    )
