"""Round-5 tier C: estimator audits, bigram language modeling, user
feature engineering, cross-source governance, and streaming sketch
state.

- ``minhash_estimate_audit`` — MinHash-estimated Jaccard (matching
  signature components / k) vs EXACT shingle Jaccard, side by side
  with the absolute error, for every LSH candidate pair. The
  estimator-accuracy audit that justifies trusting signatures at
  100 TB where exact verification is rationed (heavy_hitters_cms is
  the same audit for CMS; this is the MinHash one).
- ``lm_bigram_surprisal``  — add-one-smoothed bigram LM surprisal per
  document: the next step up from lm_unigram_surprisal (word-order
  sensitivity catches shuffled/templated gibberish that unigram
  statistics score as fluent).
- ``user_rfm_features``    — per-user recency/frequency/monetary (+
  event-type breadth) from the events stream: the canonical
  feature-engineering aggregate for downstream model training.
- ``cross_source_fp_overlap`` — winnowing-fingerprint overlap counts
  between source pairs: the corpus-governance contamination matrix
  (which sources republish each other) computed on ~1/8-sampled
  fingerprints, never raw text.
- ``streaming_hll_registers`` — the deterministic-HLL register table
  (hll_deterministic_estimate's state) maintained BY the streaming
  engine via a complete-mode MAX aggregation: register merge = max is
  exactly why HLL state streams; batch-equal under full replay, so it
  hash-checks (fourth such streaming entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.functions.detmath import det_ln_ratio as DET_LN
from clean_census_acs_data_spark.io import load_table, spread
from clean_census_acs_data_spark.operators import dedup as D
from clean_census_acs_data_spark.operators import text as X
from clean_census_acs_data_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_M,
    minhash_signature_from_hashes,
)
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import (
    _PLANTED_DOCS,
    _SHINGLES,
    H15,
)
from clean_census_acs_data_spark.session import tracked_cache


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# MinHash estimator-accuracy audit
# ---------------------------------------------------------------------------

_MH_K = 8

_AUDIT_ORACLE = f"""
WITH base AS ({_PLANTED_DOCS}),
tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM base),
sh AS ({_SHINGLES}),
hv AS (
  SELECT doc_id, sh,
         list_transform(sh, s -> {H15.format(x="s")} % {MINHASH_M}) AS hv
  FROM sh
),
sig AS (
  SELECT doc_id, sh,
         {", ".join(f"list_min(list_transform(hv, x -> ({MINHASH_A[i]} * x + {MINHASH_B[i]}) % {MINHASH_M})) AS mh{i}" for i in range(_MH_K))}
  FROM hv
),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_id, mh{2 * b} || '#' || mh{2 * b + 1} AS band_key FROM sig" for b in range(4))}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
audit AS (
  SELECT cand.doc_a, cand.doc_b,
         ({" + ".join(f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(_MH_K))}) AS n_match,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))
              AS DOUBLE) AS exact_jaccard
  FROM cand
  JOIN sig sa ON sa.doc_id = cand.doc_a
  JOIN sig sb ON sb.doc_id = cand.doc_b
)
SELECT doc_a, doc_b,
       CAST(n_match AS DOUBLE) / {_MH_K}.0 AS est_jaccard,
       exact_jaccard,
       abs(CAST(n_match AS DOUBLE) / {_MH_K}.0 - exact_jaccard) AS abs_err
FROM audit
"""


@register("minhash_estimate_audit", oracle=_AUDIT_ORACLE)
def minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-pair MinHash accuracy audit: est_jaccard =
    matching signature components / 8 (a dyadic-exact double) next to
    the exact shingle Jaccard and their absolute error. E[est] =
    Jaccard is the MinHash theorem; this query measures the realized
    error on every LSH candidate — the evidence for rationing exact
    verification at 100 TB (score candidates from 8 ints instead of
    two shingle arrays).

    Shape identical to dedup_minhash_lsh through candidate
    generation (banded self-join on (band_id, band_key)); the audit
    then joins the 8-int signature rows — not the shingle arrays — for
    the estimate, and the arrays only for the ground truth this audit
    exists to compare against. Both stages come from the session-shared
    memos (standard_shingle_table / standard_minhash_signatures): this
    entry used to build private plan-identical caches that only looked
    cheap while CacheManager substituted an earlier entry's copy —
    per-entry cache reaping exposed the recompute (round 9)."""
    sh_tbl = D.standard_shingle_table(spark, sf_dir)
    sig = D.standard_minhash_signatures(spark, sf_dir)
    band_cols = [
        F.concat_ws("#", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))
        for b in range(4)
    ]
    banded = sig.select(
        "doc", F.posexplode(F.array(*band_cols)).alias("band_id", "band_key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sig_a = sig.select(
        F.col("doc").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(_MH_K)]
    )
    sig_b = sig.select(
        F.col("doc").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(_MH_K)]
    )
    sa = sh_tbl.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh_tbl.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    n_match = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(_MH_K)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    exact = inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - inter
    ).cast("double")
    est = F.col("n_match").cast("double") / F.lit(float(_MH_K))
    return (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("n_match", n_match)
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            est.alias("est_jaccard"),
            exact.alias("exact_jaccard"),
            F.abs(est - exact).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# add-one bigram LM surprisal
# ---------------------------------------------------------------------------

_BIGRAM_ORACLE = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tok)
),
cb AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
cu AS (
  SELECT w, COUNT(*) AS c1 FROM
    (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w
),
v AS (SELECT COUNT(*) AS vsize FROM cu),
su AS (
  SELECT cb.w1, cb.w2,
         CAST(ROUND({DET_LN('cu.c1 + v.vsize', 'cb.c12 + 1', div='//')}
                    * 1000000.0)
              AS BIGINT) AS s_e6
  FROM cb JOIN cu ON cb.w1 = cu.w CROSS JOIN v
),
tf AS (SELECT doc_id, w1, w2, COUNT(*) AS f FROM bg GROUP BY doc_id, w1, w2)
SELECT tf.doc_id,
       CAST(SUM(tf.f) AS BIGINT) AS n_bigrams,
       CAST(SUM(tf.f * su.s_e6) AS DOUBLE) / CAST(SUM(tf.f) AS DOUBLE)
         AS avg_surprisal_e6
FROM tf JOIN su ON tf.w1 = su.w1 AND tf.w2 = su.w2
GROUP BY tf.doc_id
"""


@register("lm_bigram_surprisal", oracle=_BIGRAM_ORACLE)
def lm_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average add-one-smoothed bigram surprisal in micro-nats:
    P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V). Word-order sensitive where
    lm_unigram_surprisal is not — shuffled or templated text keeps its
    unigram profile but its bigram surprisal spikes, which is why
    quality pipelines score with an n-gram LM, not token frequencies.

    Shape: one bigram Generate feeds both the global counts and the
    per-doc tf table; the unigram vocab and 1-row V broadcast onto the
    bigram-count table; ln is evaluated once per bigram TYPE via the
    deterministic atanh-series ln (functions/detmath, no libm) and
    rounded to micro-nats (the surprisal/BM25 discipline). The
    tf↔surprisal join keys on the (w1, w2) pair — pair keys are far
    more uniform than raw tokens, so no hot-key salting is needed
    where the unigram twin required a broadcast.

    Scale bound: s_e6 < 44e6 (ln of an int64 ratio < 44 nats); Σ f·s_e6 is per document, ≤ doc_bigrams·44e6 → int64 to ~2·10¹¹ bigrams in one doc; corpus size unbounded."""
    d = spread(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("t")
    )
    # cached: the bigram-position table feeds TWO consumers (the global
    # bigram LM counts and the per-doc tf) — uncached, the tokenize +
    # explode + element_at pipeline over the whole corpus runs twice
    # r12: bigrams generated IN-ROW (transform → one explode of bare
    # 2-string structs) — the old explode(sequence)+element_at form
    # carried the WHOLE token array through every position row
    # (O(tokens²) bytes per doc) before the cache fill. The where
    # guard keeps sequence(1, size−1) ascending (size ≥ 2).
    bg = (
        d.where(F.size("t") > 1)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i).alias("w1"),
                        F.element_at(F.col("t"), i + F.lit(1)).alias("w2"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
        .transform(tracked_cache)
    )
    bg.count()  # eager: sibling subtrees race a lazy cache fill
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    cu = (
        d.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    v = cu.agg(F.count(F.lit(1)).alias("vsize"))
    su = (
        cb.join(F.broadcast(cu.select(F.col("w").alias("w1"), "c1")), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            # −ln((c12+1)/(c1+V)) = ln((c1+V)/(c12+1)), a ratio of
            # exact integers with p ≥ q ≥ 1 (c12 ≤ c1, V ≥ 1) → the
            # deterministic atanh-series ln; rounding then quantizes a
            # bit-identical double on both engines
            F.round(
                F.expr(DET_LN("c1 + vsize", "c12 + 1", div="DIV"))
                * 1000000.0
            )
            .cast("long")
            .alias("s_e6"),
        )
    )
    tf = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("f"))
    return (
        tf.join(su, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("f").cast("long").alias("n_bigrams"),
            (
                F.sum(F.col("f") * F.col("s_e6")).cast("double")
                / F.sum("f").cast("double")
            ).alias("avg_surprisal_e6"),
        )
    )


# ---------------------------------------------------------------------------
# per-user RFM features
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
SELECT user_id,
       COUNT(*) AS frequency,
       MAX(ts) AS last_ts,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types
FROM events GROUP BY user_id
"""


@register("user_rfm_features", oracle=_RFM_ORACLE)
def user_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user recency/frequency/monetary feature block from the
    events table (+ event-type breadth): the canonical aggregate
    feature-engineering pass feeding downstream model training. One
    partial-agg shuffle keyed by user_id; the distinct event-type count
    rides the same shuffle (Spark plans count(distinct) as a two-phase
    expand over the same key). Money summed in exact cents."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("frequency"),
        F.max("ts").alias("last_ts"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("monetary_cents"),
        F.countDistinct("event_type").cast("long").alias("n_event_types"),
    )


# ---------------------------------------------------------------------------
# cross-source fingerprint overlap (contamination matrix)
# ---------------------------------------------------------------------------

_XSOURCE_ORACLE = f"""
WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id, source,
         list_transform(range(1, greatest(len(t) - 1, 1)),
                        i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])) AS sh
  FROM tok WHERE len(t) >= 3
),
fp AS (
  SELECT DISTINCT source, fp FROM (
    SELECT source,
           unnest(list_filter(list_transform(sh, s -> {H15.format(x="s")}),
                              h -> h % 8 = 0)) AS fp
    FROM sh
  )
)
SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared_fps
FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source
"""


@register("cross_source_fp_overlap", oracle=_XSOURCE_ORACLE)
def cross_source_fp_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: how many distinct winnowing
    fingerprints (text_fingerprint_winnow's ~1/8 shingle-hash sample)
    each PAIR of sources shares. High overlap = sources republishing
    each other — the governance signal that drives per-source dedup
    priorities and mixing weights.

    Shape (r12, guide §2.4/§1.2 step 1): ONE pass — the exploded
    (source, fp) stream partial-aggregates straight into
    ``groupBy(fp).collect_set(source)`` (collect_set dedupes per
    fingerprint map-side, so the former separate ``.distinct()``
    exchange, the cache fill + eager count, and the fp⋈fp self-join
    all disappear), then source PAIRS are generated IN-ROW from the
    sorted per-fp holder set (the market_basket upper-triangle
    device) and count-aggregated. The holder set is bounded by
    |sources| — a catalog-size constant — so the in-row fan-out is
    exactly the bounded |holders|²/2 the join produced. At 100 TB
    this is one corpus-fingerprint shuffle instead of the old
    distinct + join exchanges, and it runs just as well on the
    already-persisted fingerprint store
    (dedup_incremental_reference's table)."""
    d = spread(_t(spark, sf_dir, "documents"))
    toks = X.tokens("text")
    fps = F.filter(
        F.transform(X.shingles(toks, 3), X.md5_long),
        lambda h: h % 8 == 0,
    )
    holders = (
        d.where(F.size(F.split(F.col("text"), " ")) >= 3)
        .select("source", F.explode(fps).alias("fp"))
        .groupBy("fp")
        .agg(F.collect_set("source").alias("srcs"))
        .where(F.size("srcs") >= 2)
    )
    ss = F.array_sort(F.col("srcs"))
    pair_structs = F.flatten(
        F.transform(
            ss,
            lambda x, i: F.transform(
                F.slice(ss, i + F.lit(2), F.size(ss)),
                lambda y: F.struct(x.alias("source_a"), y.alias("source_b")),
            ),
        )
    )
    return (
        holders.select(F.explode(pair_structs).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )


# ---------------------------------------------------------------------------
# streaming HLL register maintenance (complete-mode MAX state)
# ---------------------------------------------------------------------------

_STREAM_HLL_ORACLE = f"""
WITH h AS (
  SELECT {H15.format(x="CAST(user_id AS VARCHAR)")} AS h FROM events
),
b AS (SELECT h % 64 AS bucket, h // 64 AS rem FROM h)
SELECT bucket,
       CAST(MAX(CASE WHEN rem > 0 THEN 55 - length(bin(rem)) ELSE 55 END)
            AS BIGINT) AS m_j
FROM b GROUP BY bucket
"""


@register("streaming_hll_registers", oracle=_STREAM_HLL_ORACLE)
def streaming_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic-HLL register table maintained BY the streaming
    engine: events.user_id hashes feed a complete-mode MAX-per-bucket
    aggregation through the state store (≤64 rows of state, forever).
    Register merge = max is exactly what makes HLL state streamable;
    max is order-insensitive, so the fully-replayed stream's registers
    are batch-equal and the entry hash-checks. Estimation on top of
    these registers is hll_deterministic_estimate — together they are
    the full incremental-distinct-count story under the hash gate."""
    import uuid

    from clean_census_acs_data_spark.streaming.windows import (
        _events_stream,
        _streaming_scope,
    )

    spark = _streaming_scope(spark)  # default state partitions, clone-scoped
    ev = _events_stream(spark, sf_dir)
    h = X.md5_long(F.col("user_id").cast("string"))
    b = ev.select(h.alias("h")).select(
        (F.col("h") % 64).alias("bucket"), F.expr("h div 64").alias("rem")
    )
    agg = b.select(
        "bucket",
        F.when(F.col("rem") > 0, F.lit(55) - F.length(F.bin("rem")))
        .otherwise(F.lit(55))
        .alias("rho"),
    ).groupBy("bucket").agg(F.max("rho").cast("long").alias("m_j"))
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
