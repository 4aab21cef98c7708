"""Round-7 tier C: model-quality audits, retrieval features, and
sweep-line / sessionization analytics.

- ``lang_id_confusion``     — confusion matrix of the language-ID
  heuristic against the labeled ``lang`` column: the acceptance audit
  every classifier in the corpus pipeline ships with (ann_recall_audit
  is its ANN twin).
- ``keyword_topk_per_doc``  — top-3 keywords per document from the
  TF-IDF table, ranked by the integer-deterministic (tf desc, df asc,
  token) rule; the retrieval-feature extraction step.
- ``zipf_slope_fit``        — least-squares slope of ln(freq) vs
  ln(rank) over the top-100 tokens: the Zipf-law audit that flags
  synthetic/templated corpora (natural text ≈ −1). Integer micro-nat
  sums; one fixed-shape double expression at the end.
- ``open_orders_sweep``     — daily open-order backlog via a
  sweep-line (+1 at placement, −1 after last shipment): the classic
  interval-stabbing-by-prefix-sum decomposition, never a day×order
  range join.
- ``session_duration_log2`` — 30-minute-gap sessionization → session
  durations → mergeable log2-bucket histogram (bit-length buckets, no
  libm — quantile_log2_sketch's discipline on derived intervals).

Reference tie: the reference implements none of this tier (SURVEY.md §2B marks the category ABSENT; its only analytics are pre-aggregated census measures, Test_census_tract.py:287-313) — these are the BASELINE.json 100-TB extension operators, built with the repo's exact-integer discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.functions.detmath import det_ln_ratio as DET_LN
from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import _lang_oracle
from clean_census_acs_data_spark.queries_corpus import _TFIDF_ORACLE, text_tfidf


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# language-ID confusion matrix
# ---------------------------------------------------------------------------

_LANG_CONFUSION_ORACLE = f"""
WITH li AS ({_lang_oracle().strip()})
SELECT labeled_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM li GROUP BY labeled_lang, pred_lang
"""


@register("lang_id_confusion", oracle=_LANG_CONFUSION_ORACLE)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-ratio language-ID heuristic
    (text_lang_id) against the labeled lang column: per
    (labeled, predicted) cell count. The diagonal mass is the
    heuristic's accuracy; off-diagonal cells name exactly which
    language pairs it confuses — the audit that decides whether the
    cheap heuristic suffices or a model is warranted before 100 TB of
    routing decisions depend on it.

    One row-local scoring pass (the same argmax fold as text_lang_id)
    followed by a ≤|langs|²-group partial agg — audit cost is a sketch
    regardless of corpus size."""
    from clean_census_acs_data_spark.queries_ext import text_lang_id

    li = text_lang_id(spark, sf_dir)
    return li.groupBy("labeled_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# per-document keyword extraction (top-3 from the TF-IDF table)
# ---------------------------------------------------------------------------

_KEYWORD_ORACLE = f"""
WITH tfidf AS ({_TFIDF_ORACLE.strip()})
SELECT doc_id, token, tf, df, tfidf, CAST(kw_rank AS BIGINT) AS kw_rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tf DESC, df ASC, token) AS kw_rank
  FROM tfidf
) WHERE kw_rank <= 3
"""


@register("keyword_topk_per_doc", oracle=_KEYWORD_ORACLE)
def keyword_topk_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document: the TF-IDF table cut to 3 rows per
    doc at the window (WindowGroupLimit). Ranking is the
    integer-deterministic (tf desc, df asc, token asc) rule — the same
    ordering TF-IDF induces when tf dominates, but immune to the 1-ulp
    ln drift that makes cross-engine float ranking a hash hazard; the
    float tfidf weight still rides along for consumers.

    This is the retrieval-feature extraction step (sparse doc
    signatures for BM25 pre-filtering, tag suggestion, index
    pruning); at 100 TB it adds one WindowGroupLimit pass over the
    already-computed (doc, token) aggregate, nothing over raw text."""
    tfidf = text_tfidf(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        tfidf.withColumn("kw_rank", F.row_number().over(w))
        .where(F.col("kw_rank") <= 3)
        .select("doc_id", "token", "tf", "df", "tfidf", F.col("kw_rank").cast("long"))
    )


# ---------------------------------------------------------------------------
# Zipf slope fit over the token rank-frequency curve
# ---------------------------------------------------------------------------

_ZIPF_TOP = 100

_ZIPF_ORACLE = f"""
WITH tf AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
rk AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, token) AS r
  FROM tf
),
xy AS (
  SELECT CAST(ROUND({DET_LN('r', '1', div='//')} * 1000000) AS BIGINT) AS x,
         CAST(ROUND({DET_LN('f', '1', div='//')} * 1000000) AS BIGINT) AS y
  FROM rk WHERE r <= {_ZIPF_TOP}
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM xy
)
SELECT n, sx, sy, sxy, sxx,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS zipf_slope
FROM s
"""


@register("zipf_slope_fit", oracle=_ZIPF_ORACLE)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law audit: least-squares slope of ln(frequency) on
    ln(rank) over the corpus's top-100 tokens. Natural language sits
    near −1; a flat slope screams templated/synthetic text and a
    too-steep one a degenerate vocabulary — the corpus-level
    counterpart of char_ngram_entropy's per-doc signal.

    Numeric discipline: each ln is the deterministic atanh-series
    ln of an exact integer (functions/detmath — no libm),
    micro-nat-quantized per (rank, freq) POINT; the regression
    moments are exact int64 sums of those
    integers (order-independent), and the slope is one fixed-shape
    double expression over five scalars — every operation from long
    casts onward is an IEEE-determined function of identical inputs in
    both engines. Token counting is the token_frequencies shuffle; the
    top-100 cut is a heap (TakeOrderedAndProject), and the moments
    reduce 100 rows.

    Scale bound: the regression sees only the top-100 ranks: |x| ≤ ln(100)·1e6 < 5e6 and |y| < 44e6, so sxy ≤ 100·5e6·44e6 ≈ 2.2e16 and sxx ≤ 2.5e15 — both ≪ 2^63 at ANY corpus size."""
    tf = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    w = Window.orderBy(F.desc("f"), F.asc("token"))
    xy = (
        tf.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _ZIPF_TOP)
        .select(
            # ln of an exact integer = det_ln_ratio(n, 1): no libm, so
            # the micro-nat rounding quantizes a bit-identical double
            F.round(F.expr(DET_LN("r", "1", div="DIV")) * 1_000_000)
            .cast("long")
            .alias("x"),
            F.round(F.expr(DET_LN("f", "1", div="DIV")) * 1_000_000)
            .cast("long")
            .alias("y"),
        )
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.col("n").cast("double") * F.col("sxy").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sy").cast("double")
    den = F.col("n").cast("double") * F.col("sxx").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sx").cast("double")
    return s.select("n", "sx", "sy", "sxy", "sxx", (num / den).alias("zipf_slope"))


# ---------------------------------------------------------------------------
# open-order backlog sweep line
# ---------------------------------------------------------------------------

_SWEEP_ORACLE = """
WITH closes AS (
  SELECT l_orderkey, MAX(l_shipdate) AS close_date
  FROM lineitem GROUP BY l_orderkey
),
deltas AS (
  SELECT o_orderdate AS day, 1 AS delta
  FROM orders JOIN closes ON closes.l_orderkey = o_orderkey
  UNION ALL
  SELECT close_date + INTERVAL 1 DAY AS day, -1 AS delta
  FROM orders JOIN closes ON closes.l_orderkey = o_orderkey
),
per AS (SELECT CAST(day AS DATE) AS day, CAST(SUM(delta) AS BIGINT) AS d
        FROM deltas GROUP BY day)
SELECT day,
       CAST(SUM(d) OVER (ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS open_orders
FROM per
"""


@register("open_orders_sweep", oracle=_SWEEP_ORACLE)
def open_orders_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog: an order is open from its placement
    date through its last line shipment. Computed as a sweep line —
    +1 delta at placement, −1 the day after close, per-day delta agg,
    then a prefix sum over the ~2 500-row day series — NOT as a
    day×order interval-stabbing join (which is O(days·orders) and the
    classic accidental quadratic in backlog reports).

    Shapes: one per-order agg for close dates (map-side combined), a
    narrow join back to orders, a tiny per-day agg, and a running sum
    whose single-partition window runs over the day-count-sized
    aggregate — same discipline as pareto_8020_concentration. At
    100 TB only the first two steps touch fact data.

    r12: both deltas of an order are emitted IN-ROW (explode of a
    2-struct array) instead of a self-union of the joined frame — the
    union's two branches each re-derived the whole closes-aggregate +
    join pipeline (4 parquet scans / 2 joins → 2 / 1 in the committed
    plans), and the (day, delta) multiset they produce is identical by
    construction."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    closes = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_date"))
    j = o.join(closes, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_orderdate", "close_date"
    )
    deltas = j.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("o_orderdate").alias("day"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(
                    F.date_add("close_date", 1).alias("day"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("dd")
    ).select("dd.day", "dd.delta")
    per = deltas.groupBy("day").agg(F.sum("delta").cast("long").alias("d"))
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.select(
        "day", F.sum("d").over(wcum).cast("long").alias("open_orders")
    )


# ---------------------------------------------------------------------------
# session-duration log2 histogram
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 1_800_000_000

_SESSION_HIST_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
m AS (
  SELECT user_id, us, event_id,
         CASE WHEN prev_us IS NULL OR us - prev_us > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_start
  FROM e
),
sid AS (
  SELECT user_id, us,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_no
  FROM m
),
ses AS (
  SELECT user_id, session_no, MAX(us) - MIN(us) AS dur_us,
         COUNT(*) AS n_events
  FROM sid GROUP BY user_id, session_no
)
SELECT CAST(CASE WHEN dur_us = 0 THEN 0 ELSE length(bin(dur_us)) END AS BIGINT)
         AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM ses GROUP BY bucket
"""


@register("session_duration_log2", oracle=_SESSION_HIST_ORACLE)
def session_duration_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration distribution as a mergeable log2 histogram:
    30-minute-gap sessionization (the sessionize_lag_cumsum kernel),
    per-session duration in exact µs, then bit-length buckets — the
    libm-free quantile_log2_sketch discipline applied to a DERIVED
    interval rather than a stored column. Bucket b covers [2^(b−1),
    2^b) µs; single-event sessions land in bucket 0.

    One user-keyed shuffle powers both windows (LAG and the running
    is_start sum share partitioning), the session agg keys on
    (user, session_no) — a prefix of the same key, no new exchange —
    and the ≤64-bucket rollup is sketch-sized state suitable for
    streaming maintenance (same semilattice as streaming_log2_histogram).

    Scale bound: durations are µs differences ≤ the session span; log2 buckets are det_ln doubles — no integer products."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    )
    m = e.withColumn(
        "is_start",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    wcum = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sid = m.select(
        "user_id", "us", F.sum("is_start").over(wcum).alias("session_no")
    )
    ses = sid.groupBy("user_id", "session_no").agg(
        (F.max("us") - F.min("us")).alias("dur_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bucket = (
        F.when(F.col("dur_us") == 0, F.lit(0))
        .otherwise(F.length(F.bin("dur_us")))
        .cast("long")
    )
    return (
        ses.select(bucket.alias("bucket"), "n_events")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
    )
