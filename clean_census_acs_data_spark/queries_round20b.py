"""Round-20 tier B (driver round 12, carried-candidate drain): the two
remaining named candidates from SURVEY's carried list — Krippendorff's
alpha and a deterministic mergeable Misra–Gries summary (the carried
note said "rows-only unless a canonical-order oracle is found"; the
canonical bucket-fold below IS that oracle) — plus the STL-style
seasonal decompose. Three oracle-backed entries, each pinned by a
brute-force property test and sealed bit-exact at sf0.001/0.01/0.1.

- ``krippendorff_alpha_nominal`` — multi-labeler chance-corrected
  agreement with MISSING labels, the generalization of
  cohens_kappa_labelers that Fleiss' kappa cannot express: three
  deterministic raters over documents, the third covering only
  doc_id % 3 != 0 (partial coverage is Krippendorff's whole point).
  α = 1 − (n−1)·ΣᵤDᵤ / (n² − Σ_c n_c²) with Dᵤ = (mᵤ² − Σ_c n_uc²)
  / (mᵤ − 1), every term an exact integer after the 2520 scaling
  (the RBO device: 2520 = lcm(1..9) clears every mᵤ − 1 ≤ 9).
- ``misra_gries_mergeable`` — the EXACT deterministic counterpart of
  heavy_hitters_cms: Misra–Gries(k=8) summaries built per canonical
  bucket (doc_id % 4) and folded in bucket order with the mergeable-
  summaries merge (Agarwal et al. 2012: pointwise add, subtract the
  (k+1)-th largest, drop non-positives). Because the bucket
  partition and fold order are CANONICAL (data-derived, not
  scheduler-derived), the summary is a pure function of the data —
  so the same 4-stage unrolled fold runs verbatim on both engines.
- ``seasonal_decompose_ma`` — classical additive decomposition of
  each event type's dense hourly series: trend = centered 24-period
  moving average (the ×48 integer form: x_{t−12} + 2·Σ_{−11..11} +
  x_{t+12}), seasonal = hour-of-day mean of the detrended series,
  remainder = the rest; every emitted float is a SINGLE division of
  exact int64 numerators. The monitoring decomposition behind
  "is traffic down, or is it just 3am?" — acf_hourly_lag_profile
  detects the daily cycle, this one removes it.

Determinism discipline per the package standard. Reference tie: none
(SURVEY.md §2D engine-extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table, register_views
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_round12d import _LOGIT_SQL


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Krippendorff's alpha (nominal, ≥2 raters, missing labels allowed)
# ---------------------------------------------------------------------------

# 2520 = lcm(1..9): clears every (m_u - 1) divisor for up to 10 raters
# per unit — the same integer-rational scaling device as RBO's depth
# weights and the survival family's rank denominators.
_ALPHA_SCALE = 2520

_ALPHA_ORACLE = f"""
WITH lab AS (
  SELECT doc_id,
         CASE WHEN {_LOGIT_SQL} >= 8000 THEN 'keep'
              WHEN {_LOGIT_SQL} >= 3000 THEN 'review' ELSE 'drop' END AS label
  FROM documents
  UNION ALL
  SELECT doc_id,
         CASE WHEN n_chars >= 320 THEN 'keep'
              WHEN n_chars >= 160 THEN 'review' ELSE 'drop' END
  FROM documents
  UNION ALL
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 60 THEN 'keep'
              WHEN len(string_split(text, ' ')) >= 30 THEN 'review'
              ELSE 'drop' END
  FROM documents WHERE doc_id % 3 <> 0
),
uc AS (
  SELECT doc_id, label, CAST(COUNT(*) AS BIGINT) AS c
  FROM lab GROUP BY doc_id, label
),
unit AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS m,
         CAST(SUM(c * c) AS BIGINT) AS ssq
  FROM uc GROUP BY doc_id
),
uagg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
         CAST(SUM(m) AS BIGINT) AS n_values,
         CAST(SUM({_ALPHA_SCALE} * (m * m - ssq) / (m - 1)) AS BIGINT)
           AS do_scaled
  FROM unit WHERE m >= 2
),
tot AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS csq
  FROM (SELECT label, CAST(COUNT(*) AS BIGINT) AS c
        FROM lab
        WHERE doc_id IN (SELECT doc_id FROM unit WHERE m >= 2)
        GROUP BY label) lt
)
SELECT u.n_units, u.n_values, u.do_scaled,
       CAST(u.n_values * u.n_values - t.csq AS BIGINT) AS de_pairs,
       CAST({_ALPHA_SCALE} * (u.n_values * u.n_values - t.csq)
            - (u.n_values - 1) * u.do_scaled AS BIGINT) AS alpha_num,
       CAST({_ALPHA_SCALE} * (u.n_values * u.n_values - t.csq)
            AS BIGINT) AS alpha_den,
       CAST({_ALPHA_SCALE} * (u.n_values * u.n_values - t.csq)
            - (u.n_values - 1) * u.do_scaled AS DOUBLE)
         / CAST({_ALPHA_SCALE} * (u.n_values * u.n_values - t.csq)
                AS DOUBLE) AS alpha
FROM uagg u, tot t
"""


@register("krippendorff_alpha_nominal", oracle=_ALPHA_ORACLE)
def krippendorff_alpha_nominal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal metric) over three deterministic
    document raters — the multi-labeler agreement statistic that
    handles MISSING labels, which is exactly what a real labeling
    pipeline has (every doc gets the cheap raters, a subset gets the
    expensive one). Raters: the linear quality model's band and the
    length band (cohens_kappa_labelers' two raters), plus a
    token-count band that only labels doc_id % 3 != 0 (deterministic
    partial coverage). Per unit u with m_u ≥ 2 labels, the observed
    disagreement is D_u = (m_u² − Σ_c n_uc²)/(m_u − 1) (ordered
    disagreeing label pairs, pair-normalized); α = 1 −
    (n−1)·Σ_u D_u / (n² − Σ_c n_c²) with n = Σ m_u pairable values
    and n_c the label marginals over pairable units. Every quantity
    is an exact integer after scaling D_u by 2520 = lcm(1..9) (the
    RBO device — m_u − 1 ≤ 9 always divides it); alpha is ONE final
    float division of two int64s. Single-unit sanity: α = 1 on
    perfect agreement, ~0 under label-marginal chance.

    Why not Fleiss: Fleiss' kappa requires every unit to have the
    SAME number of ratings; dropping the third rater's uncovered
    units would bias the cheap raters' marginals. Alpha's
    per-unit (m_u − 1) normalization is the principled treatment.

    100-TB shape: the label table is 3 row-local projections unioned
    (no shuffle until the aggregate); per-unit counts shuffle once on
    doc_id, label marginals once on the 3-value label key; the final
    combine is a 1-row × 1-row broadcast cross. Scale bound:
    2520·n² < 2⁶³ ⟹ n ≤ 6×10⁷ pairable labels in int64 — beyond
    that the sums switch to DECIMAL(38,0), the spearman_rho_decimal
    device, same text shape."""
    runs = lambda pat: F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)"))  # noqa: E731
    logit = (
        F.lit(120) * F.size(F.split(F.col("text"), " "))
        + F.lit(45) * runs("[A-Za-z]+")
        + F.lit(-260) * runs("[^A-Za-z0-9 ]+")
        + F.lit(-130) * runs("[0-9]+")
        + F.lit(-2) * F.col("n_chars")
    )
    ra = (
        F.when(logit >= 8000, "keep")
        .when(logit >= 3000, "review")
        .otherwise("drop")
    )
    rb = (
        F.when(F.col("n_chars") >= 320, "keep")
        .when(F.col("n_chars") >= 160, "review")
        .otherwise("drop")
    )
    ntok = F.size(F.split(F.col("text"), " "))
    rc = (
        F.when(ntok >= 60, "keep").when(ntok >= 30, "review").otherwise("drop")
    )
    docs = _t(spark, sf_dir, "documents")
    lab = (
        docs.select("doc_id", ra.alias("label"))
        .unionAll(docs.select("doc_id", rb.alias("label")))
        .unionAll(
            docs.where(F.col("doc_id") % 3 != 0).select(
                "doc_id", rc.alias("label")
            )
        )
    )
    uc = lab.groupBy("doc_id", "label").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    unit = uc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("m"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ssq"),
    )
    # every unit here has m >= 2 by construction (raters A and B are
    # total), but the filter keeps the statistic's definition honest
    pairable = unit.where(F.col("m") >= 2)
    uagg = pairable.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("m").cast("long").alias("n_values"),
        F.sum(
            F.expr(
                f"{_ALPHA_SCALE} * (m * m - ssq) DIV (m - 1)"
            )
        )
        .cast("long")
        .alias("do_scaled"),
    )
    tot = (
        lab.join(pairable.select("doc_id"), "doc_id")
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("csq"))
    )
    de = F.col("n_values") * F.col("n_values") - F.col("csq")
    anum = F.lit(_ALPHA_SCALE) * de - (F.col("n_values") - 1) * F.col(
        "do_scaled"
    )
    aden = F.lit(_ALPHA_SCALE) * de
    return (
        uagg.crossJoin(F.broadcast(tot))
        .select(
            "n_units",
            "n_values",
            "do_scaled",
            de.cast("long").alias("de_pairs"),
            anum.cast("long").alias("alpha_num"),
            aden.cast("long").alias("alpha_den"),
            (anum.cast("double") / aden.cast("double")).alias("alpha"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic mergeable Misra–Gries (canonical bucket fold)
# ---------------------------------------------------------------------------

_MG_K = 8  # counters kept per summary
_MG_B = 4  # canonical buckets (doc_id % B)


def _mg_sql(tok_source: str) -> str:
    """4-stage unrolled mergeable-MG fold, ONE text for both engines.

    Per stage b: merge the carried summary with bucket b's exact
    counts (pointwise SUM), rank by the canonical total order
    (v DESC, token), read the (k+1)-th value as the decrement t_b
    (0 when ≤ k items), subtract it from every counter and keep the
    positive ones — Agarwal et al. 2012's MERGE. Only the tokenizer
    leg is dialect-specific."""
    parts = [
        f"tok AS (SELECT doc_id % {_MG_B} AS b, token FROM ({tok_source}) tsrc)"
    ]
    for b in range(_MG_B):
        parts.append(
            f"c{b} AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS v "
            f"FROM tok WHERE b = {b} GROUP BY token)"
        )
    for b in range(_MG_B):
        if b == 0:
            src = "c0"
        else:
            src = (
                f"(SELECT token, CAST(SUM(v) AS BIGINT) AS v FROM "
                f"(SELECT token, v FROM s{b - 1} UNION ALL "
                f"SELECT token, v FROM c{b}) u{b} GROUP BY token)"
            )
        parts.append(
            f"r{b} AS (SELECT token, v, ROW_NUMBER() OVER "
            f"(ORDER BY v DESC, token) AS rn FROM {src} m{b})"
        )
        parts.append(
            f"t{b} AS (SELECT CAST(COALESCE(MAX(CASE WHEN rn = {_MG_K + 1} "
            f"THEN v END), 0) AS BIGINT) AS t FROM r{b})"
        )
        parts.append(
            f"s{b} AS (SELECT r{b}.token, CAST(r{b}.v - t{b}.t AS BIGINT) "
            f"AS v FROM r{b}, t{b} WHERE r{b}.v - t{b}.t > 0)"
        )
    last = _MG_B - 1
    t_sum = " + ".join(f"t{b}.t" for b in range(_MG_B))
    t_from = ", ".join(f"t{b}" for b in range(_MG_B))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT s{last}.token, CAST(s{last}.v AS BIGINT) AS counter,
       CAST({t_sum} AS BIGINT) AS decrement_total
FROM s{last}, {t_from}
"""
    )


_MG_SPARK_TOK = "SELECT doc_id, explode(split(text, ' ')) AS token FROM documents"
_MG_DUCK_TOK = (
    "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
)


@register("misra_gries_mergeable", oracle=_mg_sql(_MG_DUCK_TOK))
def misra_gries_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable Misra–Gries(k=8) heavy-hitter summary of
    the token stream — the EXACT counterpart of heavy_hitters_cms
    (CMS overestimates with a probabilistic bound; MG underestimates
    with the deterministic bound exact − D ≤ counter ≤ exact, D =
    decrement_total emitted alongside). The carried note said
    "rows-only unless a canonical-order oracle is found"; this is
    that oracle: MG summaries depend on merge order, so the entry
    pins a CANONICAL one — exact counts per bucket doc_id % 4, folded
    in bucket order with Agarwal et al. 2012's merge (pointwise add,
    subtract the (k+1)-th largest by the total order (v DESC, token),
    drop non-positives); any ≥ n/(k+1)-frequent token is guaranteed
    present in the final summary.

    Engine split (a DELIBERATE exception to the shared-text default):
    the DuckDB oracle runs the 4-stage unrolled fold as one WITH text
    (DuckDB materializes repeated CTEs), but Spark INLINES repeated
    CTE references — the same text exploded to 112 file scans of the
    documents table (the tokenize pass re-derived once per reference
    path, ~2× per stage compounding). The Spark side therefore
    tokenizes ONCE into a materialized (bucket, token, count) base
    (eager localCheckpoint — the repo's lineage-truncation memo
    device) and folds with per-stage ≤ k-row checkpointed summaries:
    4 micro-jobs over vocabulary-sized frames, lineage depth O(1) per
    stage, ONE scan of the corpus. Parity plus the sequential-fold
    property test pin the two implementations to the same summary.

    100-TB shape: the stream-order dependence is the whole point of
    choosing merge-based MG — per-shard summaries are ≤ k rows
    regardless of shard size, each stage's rank is a top-(k+1)
    selection over (≤ k + bucket-vocab) rows (TakeOrderedAndProject
    at scale, a full window only at this test scale), and the
    per-stage threshold join is a 1-row broadcast cross. The bucket
    count B is the tree fan-in knob: at 1000 executors B = executors
    and the fold becomes a lg(B)-deep merge tree of ≤ k-row frames.
    Scale bound: counters are exact int64 counts — no products
    anywhere."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % _MG_B).alias("b"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    # ONE tokenize pass; the fold below re-reads this materialized
    # frame instead of re-deriving the explode per CTE reference.
    bc = (
        tok.groupBy("b", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
        .localCheckpoint(eager=True)
    )
    w = Window.orderBy(F.col("v").desc(), "token")
    s = None
    d_frames = []
    for b in range(_MG_B):
        cb = bc.where(F.col("b") == b).select("token", "v")
        m = (
            cb
            if s is None
            else s.unionByName(cb)
            .groupBy("token")
            .agg(F.sum("v").cast("long").alias("v"))
        )
        r = m.withColumn("rn", F.row_number().over(w))
        t = r.agg(
            F.coalesce(
                F.max(F.when(F.col("rn") == _MG_K + 1, F.col("v"))), F.lit(0)
            )
            .cast("long")
            .alias("t")
        )
        s = (
            r.crossJoin(F.broadcast(t))
            .where(F.col("v") - F.col("t") > 0)
            .select("token", (F.col("v") - F.col("t")).cast("long").alias("v"))
            .localCheckpoint(eager=True)
        )
        d_frames.append(t.select(F.col("t").alias(f"t{b}")))
    dec = d_frames[0]
    for f in d_frames[1:]:
        dec = dec.crossJoin(F.broadcast(f))
    dec_total = dec.select(
        sum((F.col(f"t{b}") for b in range(1, _MG_B)), F.col("t0"))
        .cast("long")
        .alias("decrement_total")
    )
    return s.crossJoin(F.broadcast(dec_total)).select(
        "token", F.col("v").alias("counter"), "decrement_total"
    )


# ---------------------------------------------------------------------------
# classical additive seasonal decomposition (centered MA, exact integers)
# ---------------------------------------------------------------------------


def _stl_sql(series_fn: str) -> str:
    """Shared text; only the dense-hour-spine generator is dialect-
    specific (the acf_hourly_lag_profile device)."""
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
         LAG(x, 12)  OVER (PARTITION BY event_type ORDER BY h) AS xm12,
         LEAD(x, 12) OVER (PARTITION BY event_type ORDER BY h) AS xp12,
         CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY h
                           ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING)
              AS BIGINT) AS s23,
         CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY h
                             ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING)
              AS BIGINT) AS c23
  FROM series
),
det AS (
  SELECT event_type, h, x,
         CASE WHEN xm12 IS NOT NULL AND xp12 IS NOT NULL AND c23 = 23
              THEN CAST(xm12 + xp12 + 2 * s23 AS BIGINT) END AS trend48,
         CASE WHEN xm12 IS NOT NULL AND xp12 IS NOT NULL AND c23 = 23
              THEN CAST(48 * x - (xm12 + xp12 + 2 * s23) AS BIGINT)
              END AS det48,
         CAST(extract(hour FROM h) AS BIGINT) AS hod
  FROM w
),
seas AS (
  SELECT event_type, hod,
         CAST(SUM(det48) AS BIGINT) AS s_num,
         CAST(COUNT(det48) AS BIGINT) AS s_den
  FROM det WHERE det48 IS NOT NULL GROUP BY event_type, hod
)
SELECT d.event_type, d.h, d.x, d.trend48, d.det48, se.s_num, se.s_den,
       CAST(d.trend48 AS DOUBLE) / 48.0 AS trend,
       CAST(se.s_num AS DOUBLE) / CAST(48 * se.s_den AS DOUBLE) AS seasonal,
       CASE WHEN d.det48 IS NOT NULL
            THEN CAST(d.det48 * se.s_den - se.s_num AS DOUBLE)
                 / CAST(48 * se.s_den AS DOUBLE) END AS remainder
FROM det d
JOIN seas se ON se.event_type = d.event_type AND se.hod = d.hod
"""


@register(
    "seasonal_decompose_ma",
    oracle=_stl_sql("unnest(generate_series(mn, mx, INTERVAL 1 hour))"),
)
def seasonal_decompose_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of each event type's
    DENSE hourly count series (x = trend + seasonal + remainder) — the
    monitoring primitive behind "is traffic actually down, or is it
    just 3am?": acf_hourly_lag_profile DETECTS the daily cycle, this
    entry REMOVES it so the remainder is the alarm channel. Trend =
    centered 24-period moving average in the ×48 integer form
    x_{t−12} + 2·Σ_{i=−11..11} x_{t+i} + x_{t+12} (half-weight
    endpoints — the standard even-period centering), defined only
    where the full 25-hour window exists (NULL margins, never a
    shrunken window — a shrunken MA would leak trend into seasonal).
    Seasonal = per (type, hour-of-day) mean of the detrended series
    carried as the exact integer pair (Σ det48, count); remainder =
    det48/48 − seasonal, emitted via the single division
    (det48·s_den − s_num)/(48·s_den). Every float column is ONE IEEE
    division of exact int64s — no float ever enters an aggregate.
    (First-pass classical decomposition: the seasonal means are not
    re-centered to sum zero and there is no robustness iteration —
    documented simplification, same as statsmodels' seasonal_decompose
    defaults vs full STL.)

    100-TB shape: counts partial-aggregate map-side before ONE shuffle
    on (type, hour); the spine cross is a broadcast of the tiny hour
    spine (the acf device); trend windows and the seasonal join ride
    one exchange on event_type / (event_type, hod). Scale bound at
    sealed scales: x ≤ a few hundred/hour ⇒ 48·x and det48·s_den ≤
    ~10⁶ — far inside int64 AND 2⁵³; hour counts of ~10⁹ (true
    firehose) switch the sums to DECIMAL(38,0), the
    spearman_rho_decimal device, same text shape."""
    register_views(spark, sf_dir)
    return spark.sql(_stl_sql("explode(sequence(mn, mx, interval 1 hour))"))
