"""Round-12 wave 10: data valuation and embedding-space drift.

- ``source_loo_coverage``     — leave-one-out coverage valuation per
  source: how many distinct bigrams the corpus would LOSE if the
  source were dropped (grams held by exactly one source). The
  cheapest honest data-valuation signal — the per-source complement
  of greedy_coverage_select (which picks documents by marginal gain);
  a source whose loo_drop is ~0 is fully redundant at equal quality.
- ``embedding_centroid_drift`` — per-label cosine between the
  centroids of two halves of the embedding set (even/odd vec_id —
  the deterministic stand-in for before/after snapshots): integer
  element sums (quantized milli-units) make dot and squared norms
  exact BIGINTs; the cosine is a 4-op correctly-rounded IEEE chain
  (sqrt, sqrt, multiply, divide — same determinism argument as
  mann_kendall_trend's z). The embedding-space drift monitor that
  catches encoder regressions before retrieval quality tanks.

Reference tie: none (SURVEY.md §2B) — corpus-ops extension tier.
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
# leave-one-out coverage per source
# ---------------------------------------------------------------------------

_LOO_ORACLE = """
WITH toks AS (
  SELECT source, string_split(lower(text), ' ') AS t FROM documents
),
grams AS (
  SELECT DISTINCT source,
         unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                               i -> concat(t[i], ' ', t[i + 1]))) AS gram
  FROM toks
),
holders AS (
  SELECT gram, COUNT(*) AS n_sources FROM grams GROUP BY gram
),
per AS (
  SELECT g.source,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN h.n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unique
  FROM grams g JOIN holders h ON h.gram = g.gram
  GROUP BY g.source
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_grams FROM holders)
SELECT source, n_grams, n_unique,
       (SELECT total_grams FROM tot) AS total_grams,
       CAST(CAST(n_unique AS HUGEINT) * 1000000
            // (SELECT total_grams FROM tot) AS BIGINT)
         AS loo_drop_ppm
FROM per
"""


@register("source_loo_coverage", oracle=_LOO_ORACLE)
def source_loo_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out coverage valuation: per source, its distinct
    bigram count, the bigrams held by NO other source (the exact
    coverage the corpus loses if the source is dropped), and that loss
    as ppm of the corpus vocabulary. For the coverage objective this
    IS the exact Shapley-style marginal at the full coalition — no
    sampling needed, one holder-count aggregate.

    100-TB shape (r12, guide §1.2 step 1 / §2.4): ONE corpus pass —
    the exploded (source, gram) stream partial-aggregates straight
    into ``groupBy(gram).collect_set(source)`` (the dedup happens in
    the aggregate, so the old shape's separate ``.distinct()`` and its
    THREE re-derivations — holder aggregate, join-back side, corpus
    total — collapse into one gram shuffle; a cached variant of the
    holder frame was also built and REJECTED: its array-cell fill cost
    more cold than the recompute it saved, the same lesson as the
    original uncached-grams A/B). size(srcs) rides each posexploded
    row, so the holder count needs no dictionary join; the corpus
    total rides the SAME aggregate — each gram is counted exactly once
    by attributing it to its pos-0 holder, and ``SUM(first_cnt) OVER
    ()`` over the |sources|-row report recovers total_grams without a
    second corpus derivation (first_cnt itself is collect_set-order-
    dependent per source, but only its order-invariant global sum is
    emitted). Gram strings could ride xxhash64 like
    tv_distance_sources at larger vocabularies.

    Scale bound: the ppm step runs in DECIMAL(38,0)/HUGEINT — the BIGINT form wrapped at n_unique ≥ 9.2e12 distinct grams per source, reachable in a 100-TB corpus; counts themselves are plain int64 row counts."""
    from clean_census_acs_data_spark.operators.text import shingles

    d = _t(spark, sf_dir, "documents").repartition(8)
    t = F.split(F.lower(F.col("text")), " ")
    holders = (
        d.select(
            "source",
            F.explode(F.array_distinct(shingles(t, 2))).alias("gram"),
        )
        .groupBy("gram")
        .agg(F.collect_set("source").alias("srcs"))
    )
    per = (
        holders.select(
            F.size("srcs").alias("n_sources"),
            F.posexplode("srcs").alias("pos", "source"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("n_sources") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
            # each gram counted exactly once (by its pos-0 holder);
            # the global sum below is collect_set-order-invariant
            F.sum(F.when(F.col("pos") == 0, 1).otherwise(0))
            .cast("long")
            .alias("first_cnt"),
        )
        .withColumn(
            "total_grams",
            F.sum("first_cnt").over(Window.partitionBy()),
        )
    )
    return per.select(
        "source",
        "n_grams",
        "n_unique",
        "total_grams",
        # DECIMAL(38,0): the BIGINT product n_unique·1e6 wraps at
        # n_unique ≥ 2^63/1e6 ≈ 9.2e12 distinct grams per source —
        # reachable in a 100-TB corpus (operands positive, so plain
        # widening matches DuckDB's HUGEINT // exactly)
        F.expr("(CAST(n_unique AS DECIMAL(38,0)) * 1000000) DIV total_grams")
        .cast("long")
        .alias("loo_drop_ppm"),
    )


# ---------------------------------------------------------------------------
# embedding centroid drift per label (even/odd halves)
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
WITH q AS (
  SELECT vec_id, label, vec_id % 2 AS half,
         list_transform(embedding,
                        x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT))
           AS e
  FROM embeddings
),
el AS (
  SELECT label, half, u.i AS pos, SUM(q.e[u.i]) AS s
  FROM q, unnest(range(1, len(q.e) + 1)) AS u(i)
  GROUP BY 1, 2, 3
),
pairs AS (
  SELECT a.label, a.pos, a.s AS sa, b.s AS sb
  FROM el a JOIN el b
    ON a.label = b.label AND a.pos = b.pos AND a.half = 0 AND b.half = 1
),
g AS (
  SELECT label,
         CAST(SUM(sa * sb) AS BIGINT) AS dot,
         CAST(SUM(sa * sa) AS BIGINT) AS norm2_a,
         CAST(SUM(sb * sb) AS BIGINT) AS norm2_b
  FROM pairs GROUP BY label
),
n AS (
  SELECT label,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM q GROUP BY label
)
SELECT g.label, n.n_a, n.n_b, g.dot, g.norm2_a, g.norm2_b,
       CAST(g.dot AS DOUBLE)
         / (sqrt(CAST(g.norm2_a AS DOUBLE)) * sqrt(CAST(g.norm2_b AS DOUBLE)))
         AS centroid_cosine
FROM g JOIN n ON n.label = g.label
"""


@register("embedding_centroid_drift", oracle=_DRIFT_ORACLE)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-space drift: cosine between the centroids of
    the even-id and odd-id halves (the deterministic proxy for two
    snapshot windows). Element sums are exact BIGINTs over milli-
    quantized components (the un-normalized centroid — cosine is
    scale-invariant, so dividing by n is unnecessary AND would break
    exactness); dot/norms are exact, the cosine one correctly-rounded
    IEEE chain. A healthy encoder keeps this ≈1 per label; a drop
    localizes which label's region of the space moved.

    100-TB shape: posexplode to (label, half, dim) integer partial
    sums — the shuffle carries |labels|·2·dims rows regardless of
    vector count; the half-join and final aggregate are over that tiny
    grid. Exact while (Σ components)² < 2⁶³ (~10⁹ vectors at milli
    quantization)."""
    q = _t(spark, sf_dir, "embeddings").select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.expr(
            "transform(embedding,"
            " x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
        ).alias("e"),
    )
    el = (
        q.select("label", "half", F.posexplode("e").alias("pos", "v"))
        .groupBy("label", "half", "pos")
        .agg(F.sum("v").alias("s"))
    )
    a = el.where(F.col("half") == 0).select(
        "label", "pos", F.col("s").alias("sa")
    )
    b = el.where(F.col("half") == 1).select(
        "label", "pos", F.col("s").alias("sb")
    )
    g = (
        a.join(b, ["label", "pos"])
        .groupBy("label")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).cast("long").alias("dot"),
            F.sum(F.col("sa") * F.col("sa")).cast("long").alias("norm2_a"),
            F.sum(F.col("sb") * F.col("sb")).cast("long").alias("norm2_b"),
        )
    )
    n = q.groupBy("label").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("norm2_a").cast("double"))
        * F.sqrt(F.col("norm2_b").cast("double"))
    )
    return (
        g.join(n, "label")
        .select(
            "label", "n_a", "n_b", "dot", "norm2_a", "norm2_b",
            cos.alias("centroid_cosine"),
        )
    )
