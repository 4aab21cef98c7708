"""Round-5 tier D: sequence modeling, vocabulary audits, temporal
features, corpus profiling, and dedup-cluster statistics.

- ``markov_transition_counts`` — first-order event-type transition
  matrix (counts + row-normalized probabilities) from per-user event
  sequences: the sequence-modeling aggregate behind next-event
  prediction and behavioral anomaly scoring.
- ``vocab_oov_rate``       — per-document out-of-vocabulary rate
  against the corpus top-100 token vocabulary: the tokenizer-coverage
  audit run before committing a vocab (high OOV = the tokenizer will
  shred this slice into bytes).
- ``user_interevent_stats`` — per-user inter-event-gap statistics in
  exact integer microseconds (n, mean/min/max gap): temporal features
  for bot detection and engagement modeling.
- ``source_lang_profile``  — source × language count matrix via a
  single-scan pivot on the real ``lang`` column (the corpus
  composition dashboard; pivot_status is the relational twin on
  orders).
- ``dedup_cluster_stats``  — per-near-dup-component size and length
  statistics: the triage table that decides which clusters get
  aggressive pruning (big clusters of near-identical length = true
  template spam; dedup_survivor_selection consumes this ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table, spread
from clean_census_acs_data_spark.operators import dedup as D
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import (
    _COMPONENTS_ORACLE,
    _PLANTED_DOCS,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# first-order Markov transition matrix over event types
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
tr AS (
  SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total FROM tr GROUP BY from_type)
SELECT tr.from_type, tr.to_type, CAST(tr.n AS BIGINT) AS n,
       CAST(tr.n AS DOUBLE) / CAST(tot.row_total AS DOUBLE) AS prob
FROM tr JOIN tot USING (from_type)
"""


@register("markov_transition_counts", oracle=_MARKOV_ORACLE)
def markov_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: per-user sequences (total order:
    ts then event_id) yield LAG pairs; counts aggregate globally and
    each row normalizes to P(to | from) with one double division.

    Shape: one user-keyed window shuffle (sequences are user-local —
    never a global sort), then a |types|²-bounded aggregate; row totals
    come from a SUM window OVER the ≤|types|² aggregate itself (r12
    optimization, guide §2.4/§1.2: the former tracked_cache + eager
    count + broadcast-join-back derived the same totals but paid the
    lag-window pipeline twice — once to fill the cache, once at the
    terminal action; the window form is one single-pass plan, 16
    Exchange → 3, and the extra exchange it adds shuffles ≤25 rows).
    At 100 TB the window partitioning is the natural event-log layout
    and the matrix stays KB-sized."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    tr = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_total = F.sum("n").over(Window.partitionBy("from_type"))
    return tr.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / row_total.cast("double")).alias("prob"),
    )


# ---------------------------------------------------------------------------
# vocabulary coverage / OOV-rate audit
# ---------------------------------------------------------------------------

_VOCAB_K = 100

_OOV_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
vocab AS (SELECT w FROM cnt ORDER BY c DESC, w LIMIT {_VOCAB_K}),
per AS (
  SELECT tok.doc_id,
         COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
  FROM tok LEFT JOIN vocab ON tok.w = vocab.w
  GROUP BY tok.doc_id
)
SELECT doc_id, n_tokens, n_oov,
       CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
FROM per
"""


@register("vocab_oov_rate", oracle=_OOV_ORACLE)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV rate against the corpus top-100 vocabulary
    (count-desc, token-asc tiebreak → deterministic cut). The
    tokenizer-coverage audit: documents whose tokens fall outside the
    vocab will fragment into fallback bytes, inflating sequence length
    — high-OOV slices either get vocab expansion or exclusion.

    Shape: vocab = TakeOrderedAndProject over the token counts (heap
    top-K, no global sort) broadcast onto the token stream; per-doc
    reduction is one partial agg. At 100 TB the vocab is the persisted
    tokenizer artifact and scoring a new slice is scan + broadcast
    lookup + agg — no joins on raw tokens."""
    # tok feeds two consumers but is NOT cached: warm A/B at sf0.1 put
    # the cache fill of corpus-token string rows above the cost of
    # re-running the codegen explode (1.20 s vs 1.29 s cached)
    tok = spread(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        cnt.orderBy(F.desc("c"), F.asc("w"))
        .limit(_VOCAB_K)
        .select("w", F.lit(1).alias("__v"))
    )
    per = (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias(
            "oov_rate"
        ),
    )


# ---------------------------------------------------------------------------
# per-user inter-event gap statistics (exact integer microseconds)
# ---------------------------------------------------------------------------

_INTEREVENT_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


@register("user_interevent_stats", oracle=_INTEREVENT_ORACLE)
def user_interevent_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event-gap features in exact integer µs: gap
    count, sum, min, max, and mean (single post-agg division). Burst
    detection (tiny min gaps = scripted traffic) and engagement decay
    (large max gaps) read straight off this table.

    One user-keyed window for LAG, then a partial agg on the same key
    — Spark reuses the window's hash partitioning for the groupBy, so
    the whole feature block is a single shuffle.

    Scale bound: per-user Σ gap_µs telescopes to the user's first-to-last span (< 2^63 µs ≈ 292k years); no µs products or squares."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = _t(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )
    return (
        g.where(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_us").cast("long").alias("sum_gap_us"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            (
                F.sum("gap_us").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("mean_gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# source × language composition profile (single-scan pivot)
# ---------------------------------------------------------------------------

_LANGS = ("de", "en", "es", "fr", "zh")

_LANG_PROFILE_ORACLE = f"""
SELECT source,
       {", ".join(f"CAST(SUM(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{lg}" for lg in _LANGS)},
       COUNT(*) AS n_total
FROM documents GROUP BY source
"""


@register("source_lang_profile", oracle=_LANG_PROFILE_ORACLE)
def source_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition dashboard: source × language count matrix in
    ONE scan via pivot on the declared ``lang`` column (text_lang_id is
    the inference twin that derives lang from content; this profiles
    the metadata). Explicit pivot values keep the plan single-pass —
    no distinct-values pre-query — and the output is
    |sources|×|langs|-bounded regardless of corpus size."""
    d = _t(spark, sf_dir, "documents")
    p = (
        d.groupBy("source")
        .pivot("lang", list(_LANGS))
        .agg(F.count(F.lit(1)))
    )
    tot = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    out = p
    for lg in _LANGS:
        out = out.withColumn(f"n_{lg}", F.coalesce(F.col(lg), F.lit(0)).cast("long"))
    return out.select("source", *[f"n_{lg}" for lg in _LANGS]).join(
        F.broadcast(tot), "source"
    )


# ---------------------------------------------------------------------------
# per-component dedup cluster statistics
# ---------------------------------------------------------------------------

_CLUSTER_STATS_ORACLE = f"""
WITH base AS ({_PLANTED_DOCS}),
comp AS (SELECT doc_id, component_id FROM ({_COMPONENTS_ORACLE.strip()}))
SELECT comp.component_id,
       COUNT(*) AS cluster_size,
       CAST(MIN(length(base.text)) AS BIGINT) AS min_chars,
       CAST(MAX(length(base.text)) AS BIGINT) AS max_chars,
       CAST(SUM(CAST(length(base.text) AS BIGINT)) AS BIGINT) AS sum_chars,
       CAST(MIN(base.doc_id) AS BIGINT) AS survivor_doc_id
FROM comp JOIN base ON comp.doc_id = base.doc_id
GROUP BY comp.component_id
"""


@register("dedup_cluster_stats", oracle=_CLUSTER_STATS_ORACLE)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster triage table: per connected component, member
    count, char-length spread, total bytes, and the survivor (min doc
    id — the same canonical pick as dedup_survivor_selection). Large
    clusters with tight length spread are template spam (prune hard);
    wide-spread clusters are containment chains needing
    doc_shingle_containment review.

    The components are the dedup pipeline's existing output; this adds
    one broadcast-joinable stats pass — at 100 TB the component table
    is (doc_id, component) longs and the length stats ride the corpus
    scan already paid for by dedup."""
    docs = D.plant_near_dups(_t(spark, sf_dir, "documents"))
    comp = D.standard_components(spark, sf_dir)
    return (
        comp.join(docs, "doc_id")
        .groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min(F.length("text")).cast("long").alias("min_chars"),
            F.max(F.length("text")).cast("long").alias("max_chars"),
            F.sum(F.length("text").cast("long")).cast("long").alias("sum_chars"),
            F.min("doc_id").cast("long").alias("survivor_doc_id"),
        )
    )
