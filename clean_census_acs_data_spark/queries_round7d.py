"""Round-7 tier D: feature-store and streaming-ops kernels.

- ``point_in_time_join_scd2``  — facts joined to the dimension version
  valid AT the fact's timestamp (the feature-store "point-in-time
  correct" join; training-serving skew dies here). Join-free
  union-sort-carry, same discipline as the as-of family.
- ``label_propagation_communities`` — two unrolled rounds of
  mode-of-neighbor-labels over the near-dup graph: community detection
  proper (denser-than-connectivity structure), completing the graph
  family (components / PageRank / triangles / clustering coeff / GNN).
- ``late_arrival_profile``     — per-source-partition event lateness
  (running-max event time minus own event time, arrival order = log
  order) bucketed log2: the audit that picks a watermark delay from
  observed disorder instead of folklore.
- ``feature_hashing_bow``      — the hashing-trick bag-of-words:
  tokens folded into 32 hash buckets per document. The classical
  fixed-width featurization (CMS's cousin pointed at features, not
  frequencies).

Reference tie: the reference implements none of this tier (SURVEY.md §2B marks the category ABSENT; its only analytics are pre-aggregated census measures, Test_census_tract.py:287-313) — these are the BASELINE.json 100-TB extension operators, built with the repo's exact-integer discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table, spread
from clean_census_acs_data_spark.operators import text as X
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import H15


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# point-in-time (SCD2) dimension join
# ---------------------------------------------------------------------------

_PIT_ORACLE = """
WITH dim AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
         ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM events WHERE event_type IN ('signup', 'purchase')
),
facts AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT f.event_id, f.user_id, d.value_cents, d.valid_from
FROM facts f LEFT JOIN dim d
  ON d.user_id = f.user_id
 AND d.valid_from <= f.ts
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)
"""


@register("point_in_time_join_scd2", oracle=_PIT_ORACLE)
def point_in_time_join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct dimension join: each click is enriched
    with the value version (SCD2 validity interval from
    signup/purchase changes — scd2_user_values' intervals) valid AT
    the click's timestamp, never a later one. This is THE feature-store
    join: training rows built with future dimension values leak
    labels; this plan cannot, by construction.

    Join-free: dimension versions and facts union into one stream per
    user, sorted by (event time, version-before-fact, event_id); a
    last-non-null carry hands every fact the version in force at its
    timestamp — at equal timestamps the version row sorts first, so a
    fact coincident with a change sees the NEW version, exactly
    matching the half-open [valid_from, valid_to) interval semantics
    of the SQL oracle. One user-keyed window shuffle total, no
    interval join, no unbounded bucket replication for open-ended
    current versions (the carry handles them for free — the reason
    production PIT joins are merge-sorts, not range joins)."""
    ev = _t(spark, sf_dir, "events")
    dim = ev.where(F.col("event_type").isin("signup", "purchase")).select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.lit(None).cast("long").alias("fact_id"),
    )
    facts = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("long").alias("value_cents"),
        F.col("event_id").alias("fact_id"),
    )
    merged = dim.unionByName(facts)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "user_id",
        "ts",
        "fact_id",
        F.last("value_cents", ignorenulls=True).over(w).alias("value_cents"),
        F.last(
            F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("valid_from"),
    )
    return carried.where(F.col("fact_id").isNotNull()).select(
        F.col("fact_id").alias("event_id"), "user_id", "value_cents", "valid_from"
    )


# ---------------------------------------------------------------------------
# label-propagation community detection (2 unrolled rounds)
# ---------------------------------------------------------------------------


def _lpa_round_sql(labels: str, out: str) -> str:
    """One LPA round in SQL: each node takes the most frequent label
    among its neighbors (ties → smallest label); isolated nodes keep
    theirs (the undirected near-dup edge list has no isolated nodes)."""
    return f"""
{out}_cnt AS (
  SELECT e.v, l.lab, COUNT(*) AS c
  FROM edges e JOIN {labels} l ON l.v = e.w
  GROUP BY e.v, l.lab
),
{out}_best AS (SELECT v, MAX(c) AS mc FROM {out}_cnt GROUP BY v),
{out} AS (
  SELECT c.v, MIN(c.lab) AS lab
  FROM {out}_cnt c JOIN {out}_best b ON b.v = c.v AND c.c = b.mc
  GROUP BY c.v
)"""


def _lpa_oracle() -> str:
    from clean_census_acs_data_spark.queries_ext import _MINHASH_ORACLE

    return f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE.strip()})),
edges AS (
  SELECT doc_a AS v, doc_b AS w FROM pairs
  UNION
  SELECT doc_b AS v, doc_a AS w FROM pairs
),
l0 AS (SELECT DISTINCT v, v AS lab FROM edges),
{_lpa_round_sql("l0", "l1")},
{_lpa_round_sql("l1", "l2")}
SELECT v AS doc_id, lab AS community FROM l2
"""


@register("label_propagation_communities", oracle=_lpa_oracle())
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by label propagation over the verified
    near-dup graph: two unrolled rounds of "adopt the most frequent
    neighbor label" (ties → smallest label), starting from own-id
    labels. Unlike connected components (pure reachability), LPA's
    mode update concentrates labels inside DENSE regions — template
    families split from chains of accidental collisions, which is what
    cluster-level dedup pricing actually wants.

    Each round is one edge⋈label equi-join + two partial aggs (count
    per (node, label), then max-count/min-label argmax — the
    mode_per_group kernel applied per node). The deterministic
    tiebreak makes an otherwise order-sensitive heuristic
    hash-checkable; rounds unroll like graph_pagerank_int so no driver
    loop state. Edge list comes from the session-cached standard pair
    table."""
    from clean_census_acs_data_spark.operators import dedup as D

    # session-shared materialized edge list (pairs are unique with
    # doc_a < doc_b, so the symmetrized union is already distinct);
    # lineage-truncated so the per-round plans stay flat
    edges = D.standard_undirected_edges(spark, sf_dir, threshold=0.5).select(
        F.col("a").alias("v"), F.col("b").alias("w")
    )
    labels = edges.select("v").distinct().select("v", F.col("v").alias("lab"))
    for _ in range(2):
        cnt = (
            edges.join(labels.withColumnRenamed("v", "w"), "w")
            .groupBy("v", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = cnt.groupBy("v").agg(F.max("c").alias("mc"))
        # cnt is referenced twice (mode numerator + argmax filter) and
        # labels feeds the next round twice through it — truncate per
        # round so analysis stays O(1) (the k-core/PageRank discipline)
        labels = (
            cnt.join(best, "v")
            .where(F.col("c") == F.col("mc"))
            .groupBy("v")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
    return labels.select(F.col("v").alias("doc_id"), F.col("lab").alias("community"))


# ---------------------------------------------------------------------------
# late-arrival (watermark tuning) profile
# ---------------------------------------------------------------------------

_LATE_ORACLE = """
WITH arr AS (
  SELECT user_id % 16 AS src_part, event_id, epoch_us(ts) AS us,
         MAX(epoch_us(ts)) OVER (PARTITION BY user_id % 16 ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS runmax
  FROM events
),
lat AS (SELECT runmax - us AS late_us FROM arr)
SELECT CAST(CASE WHEN late_us = 0 THEN 0 ELSE length(bin(late_us)) END AS BIGINT)
         AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(late_us) AS BIGINT) AS max_late_us
FROM lat GROUP BY bucket
"""


@register("late_arrival_profile", oracle=_LATE_ORACLE)
def late_arrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder profile: within each source partition
    (user_id mod 16 — the partition a log consumer would own), arrival
    order is the append-log order (event_id) and an event's lateness
    is the running-max event time minus its own. The log2 histogram of
    that lateness IS the watermark-tuning curve: the bucket where the
    tail mass becomes acceptable is the delay you configure in
    withWatermark() (streaming engines track exactly this per-partition
    running max to advance their watermark).

    One partition-keyed window (running max over arrival order) and a
    ≤64-bucket rollup — the same shuffle a streaming source already
    pays to read, and the per-partition framing is the honest one at
    scale: a global arrival order doesn't exist in a distributed log.

    Scale bound: only µs differences bounded by the data's time-span enter the arithmetic (no µs products, no cross-row sums of raw epoch-µs); int64 epoch-µs is safe to ~year 294000."""
    w = (
        Window.partitionBy("src_part")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    arr = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 16).alias("src_part"),
        "event_id",
        F.unix_micros("ts").alias("us"),
    )
    lat = arr.select(
        (F.max("us").over(w) - F.col("us")).alias("late_us")
    )
    bucket = (
        F.when(F.col("late_us") == 0, F.lit(0))
        .otherwise(F.length(F.bin("late_us")))
        .cast("long")
    )
    return lat.select(bucket.alias("bucket"), "late_us").groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("late_us").cast("long").alias("max_late_us"),
    )


# ---------------------------------------------------------------------------
# hashing-trick bag-of-words featurization
# ---------------------------------------------------------------------------

_FEATHASH_BUCKETS = 32

_FEATHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT doc_id,
       CAST({H15.format(x="token")} % {_FEATHASH_BUCKETS} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM tok GROUP BY doc_id, bucket
"""


@register("feature_hashing_bow", oracle=_FEATHASH_ORACLE)
def feature_hashing_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: bag-of-words folded into a fixed 32-bucket
    feature space per document (token → md5-hash mod buckets → count).
    No vocabulary pass, no fitting, collisions accepted — the
    featurization that scales to unbounded vocabularies and is the
    sparse-input front door for linear models and MinHash-adjacent
    signatures. Long format (doc, bucket, cnt) — the array form is one
    pivot away and long is what a 100-TB shuffle wants.

    One Generate (no shuffle) + one (doc, bucket) partial agg: the
    md5 path is the repo's standard portable hash so the DuckDB twin
    folds identically."""
    d = spread(_t(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return (
        tok.select(
            "doc_id",
            (X.md5_long(F.col("token")) % _FEATHASH_BUCKETS).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
