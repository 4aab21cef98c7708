"""Round-4 tier: training-data governance and sketch operators.

Five shapes a 100-TB training-data pipeline needs beyond dedup/ANN:

- ``leakage_safe_split``  — train/val/test assignment where every
  near-duplicate *component* lands in one split (per-doc hashing leaks
  eval data through paraphrases; grouping by dedup component is the
  fix used by every serious corpus pipeline).
- ``token_countmin_sketch`` — mergeable Count-Min sketch of token
  frequencies (d×w integer cell matrix). The partial-aggregate state
  for incremental/streaming frequency tracking: shards sketch
  independently, merge = cell-wise sum.
- ``heavy_hitters_cms``   — frequent-token detection by probing the
  sketch (est = min over depths), with exact counts alongside to
  expose the CMS one-sided overestimate.
- ``semantic_dedup``      — SemDeDup-style embedding dedup: assign
  vectors to nearest centroid, prune cosine-near pairs *within* a
  cluster only (cluster-local quadratic, never corpus-quadratic).
- ``bloom_semijoin_stats`` — explicit Bloom-filter runtime-filter:
  build m-bit/k-hash filter from a selective dim subset, pre-filter
  the fact side before the true semi-join; reports the false-positive
  overhead the filter admits.

Determinism discipline is the package standard (queries.py module
docstring): md5-derived integer hashing recomputed identically in the
DuckDB oracles, exact int64 aggregation, single post-hoc double
divisions, identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.operators import dedup as D
from clean_census_acs_data_spark.operators import text as X
from clean_census_acs_data_spark.operators.similarity import (
    QUANT,
    cosine,
)
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import (
    _COMPONENTS_ORACLE,
    _PLANTED_DOCS,
    H15,
    _dot,
    _quant_list,
)
from clean_census_acs_data_spark.session import tracked_cache


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# leakage-safe train/val/test split (dedup-component-aware)
# ---------------------------------------------------------------------------

_SPLIT_CASE = (
    "CASE WHEN {g} % 10 < 8 THEN 'train' WHEN {g} % 10 = 8 THEN 'val' "
    "ELSE 'test' END"
)

_LEAKAGE_SPLIT_ORACLE = f"""
WITH
base AS ({_PLANTED_DOCS}),
comp AS (SELECT doc_id, component_id FROM ({_COMPONENTS_ORACLE.strip()}))
SELECT b.doc_id,
       COALESCE(c.component_id, b.doc_id) AS group_id,
       {_SPLIT_CASE.format(g="COALESCE(c.component_id, b.doc_id)")} AS split
FROM base b LEFT JOIN comp c ON b.doc_id = c.doc_id
"""


@register("leakage_safe_split", oracle=_LEAKAGE_SPLIT_ORACLE)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split where a whole near-dup component moves as a
    unit: group_id = connected-component id (min doc id) when the doc
    has near-dups, else its own id; split = group_id mod 10 → 80/10/10.

    Per-document hashing leaks eval data — a train doc's paraphrase
    lands in test and the model is graded on memorization. Grouping by
    the dedup component closes that channel, and the assignment stays a
    narrow hash-mod: the only heavy lifting (LSH pairs + components) is
    the dedup work the pipeline runs anyway, so at 100 TB this is a
    left join against an 8-byte (doc_id, component) table and zero
    extra shuffles over the corpus body."""
    docs = D.plant_near_dups(_t(spark, sf_dir, "documents"))
    comp = D.standard_components(spark, sf_dir)
    grp = F.coalesce(F.col("component_id"), F.col("doc_id"))
    bucket = grp % 10
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            grp.alias("group_id"),
            F.when(bucket < 8, "train")
            .when(bucket == 8, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch over token frequencies (mergeable partial state)
# ---------------------------------------------------------------------------

CMS_D = 4  # independent hash rows
CMS_W = 64  # cells per row


def _cms_cell(token_col: F.Column, depth: int) -> F.Column:
    return X.md5_long(F.concat(F.lit(f"cms{depth}|"), token_col)) % CMS_W


def _cms_cell_sql(tok: str, depth: int) -> str:
    inner = f"concat('cms{depth}|', {tok})"
    return f"{H15.format(x=inner)} % {CMS_W}"


_CMS_SKETCH_ORACLE = f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
cells AS (
  {" UNION ALL ".join(f"SELECT {d} AS depth, {_cms_cell_sql('token', d)} AS cell FROM tok" for d in range(CMS_D))}
)
SELECT depth, cell, COUNT(*) AS cnt
FROM cells GROUP BY depth, cell
"""


def _cms_sketch(docs: DataFrame) -> DataFrame:
    """(depth, cell, cnt) Count-Min state: one pass over tokens, the
    d cell ids computed per token and pos-exploded, then a partial-agg
    count keyed by (depth, cell) — at most d·w = 256 groups, so the
    shuffle after map-side combine is ~256 rows per partition no
    matter the corpus size. Merging two corpora's sketches is a
    cell-wise sum of two 256-row tables."""
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    cells = F.array(*[_cms_cell(F.col("token"), d) for d in range(CMS_D)])
    return (
        tok.select(F.posexplode(cells).alias("depth", "cell"))
        .groupBy(F.col("depth").cast("int").alias("depth"), "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register("token_countmin_sketch", oracle=_CMS_SKETCH_ORACLE)
def token_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch of token frequencies: a 4×64 integer cell
    matrix as rows (depth, cell, cnt). This is the mergeable partial
    state for frequency tracking at 100 TB — per-shard sketches are
    256 fixed rows regardless of shard size, merge = cell-wise sum,
    and a point estimate is min over the 4 depth cells. Hashing is the
    package's portable md5-60-bit (operators/text.py:29), recomputed
    inline by the DuckDB oracle."""
    from clean_census_acs_data_spark.io import spread

    return _cms_sketch(spread(_t(spark, sf_dir, "documents")))


_HEAVY_HITTERS_ORACLE = f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
sketch AS (SELECT depth, cell, cnt FROM ({_CMS_SKETCH_ORACLE.strip()})),
exact AS (SELECT token, COUNT(*) AS exact_cnt FROM tok GROUP BY token),
probe AS (
  {" UNION ALL ".join(f"SELECT token, {d} AS depth, {_cms_cell_sql('token', d)} AS cell FROM exact" for d in range(CMS_D))}
),
est AS (
  SELECT probe.token, MIN(sketch.cnt) AS est_cnt
  FROM probe JOIN sketch ON probe.depth = sketch.depth AND probe.cell = sketch.cell
  GROUP BY probe.token
)
SELECT est.token, est.est_cnt, exact.exact_cnt
FROM est JOIN exact ON est.token = exact.token
WHERE est.est_cnt * 50 >= (SELECT COUNT(*) FROM tok)
"""


@register("heavy_hitters_cms", oracle=_HEAVY_HITTERS_ORACLE)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent tokens via Count-Min probe: est = min over the 4 depth
    cells, kept when est ≥ 2% of total token mass; exact counts are
    joined alongside, exposing CMS's one-sided error (est ≥ exact
    always). The sketch side is ≤256 rows → broadcast; the probe scans
    the distinct-token table (vocabulary-sized, not corpus-sized). At
    100 TB the exact-count branch disappears and the probe answers
    from the 256-row sketch alone — that asymmetry is the point of the
    operator."""
    from clean_census_acs_data_spark.io import spread

    docs = spread(_t(spark, sf_dir, "documents"))
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    sketch = _cms_sketch(docs)
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
    cells = F.array(*[_cms_cell(F.col("token"), d) for d in range(CMS_D)])
    probe = exact.select(
        "token", F.posexplode(cells).alias("depth", "cell")
    ).withColumn("depth", F.col("depth").cast("int"))
    est = (
        probe.join(F.broadcast(sketch), ["depth", "cell"])
        .groupBy("token")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    # total token count = Σ exact per-token counts: derived from the
    # exact aggregate instead of a second full tokenize pass
    total = exact.agg(F.sum("exact_cnt").cast("long").alias("__total"))
    return (
        est.join(exact, "token")
        .crossJoin(F.broadcast(total))
        .where(F.col("est_cnt") * 50 >= F.col("__total"))
        .select("token", "est_cnt", "exact_cnt")
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup: centroid-cluster then cluster-local prune
# ---------------------------------------------------------------------------

_SEMDEDUP_N_CENT = 8
_SEMDEDUP_THRESH = 0.95

_SEMDEDUP_ORACLE = f"""
WITH e AS (SELECT vec_id, {_quant_list("embedding")} AS q FROM embeddings),
cent AS (
  SELECT vec_id AS centroid_id, q AS cq, {_dot("q", "q")} AS cn2
  FROM e WHERE vec_id < {_SEMDEDUP_N_CENT}
),
sc AS (
  SELECT e.vec_id, e.q, cent.centroid_id,
         CAST({_dot("e.q", "cent.cq")} AS DOUBLE) /
         (sqrt(CAST({_dot("e.q", "e.q")} AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS c_cos
  FROM e, cent
),
assigned AS (
  SELECT vec_id, q, {_dot("q", "q")} AS n2, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY c_cos DESC, centroid_id) AS rn
    FROM sc
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE CAST({_dot("a.q", "b.q")} AS DOUBLE) /
        (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
        >= {_SEMDEDUP_THRESH}
),
dup AS (SELECT vb AS vec_id, MIN(va) AS dup_of FROM pairs GROUP BY vb)
SELECT assigned.vec_id, assigned.centroid_id, dup.dup_of
FROM assigned LEFT JOIN dup ON assigned.vec_id = dup.vec_id
"""


@register("semantic_dedup", oracle=_SEMDEDUP_ORACLE)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped embedding dedup: every vector is assigned to its
    nearest of 8 deterministic centroids (argmax cosine, centroid-id
    tiebreak — same stand-in-for-k-means rationale as
    similarity_ivf_topk), then cosine-near pairs ≥ 0.95 are found
    *within clusters only* and the higher id is marked dup_of its
    lowest near neighbor. Output: (vec_id, centroid_id, dup_of) with
    dup_of NULL for survivors.

    Scale shape: the pair join shuffles on centroid_id, so the
    quadratic term is per-cluster, never corpus-wide; at 100 TB the
    centroid count grows (√n clusters keeps clusters ~√n) and the
    pre-quantized int64 vectors mean the per-pair dot is a bare
    zip_with fold with no casts inside the loop."""
    from clean_census_acs_data_spark.io import spread

    emb = spread(_t(spark, sf_dir, "embeddings"))
    qv = F.transform(F.col("embedding"), lambda x: F.round(x.cast("double") * QUANT).cast("long"))
    e = emb.select(F.col("vec_id"), qv.alias("q"))
    n2 = F.aggregate(
        F.transform(F.col("q"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    e = e.withColumn("n2", n2)
    cent = e.where(F.col("vec_id") < _SEMDEDUP_N_CENT).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("q").alias("cq"),
        F.col("n2").alias("cn2"),
    )
    pair_dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # r12: assignment is the in-row argbest_centroid fold over the
    # one-row centroid-array broadcast — the previous 8-way crossJoin
    # fan-out + per-vector ROW_NUMBER window shuffled and sorted 8n
    # rows just to pick a per-row argmax (identical selection
    # semantics: operators/similarity.argbest_centroid docstring).
    # materialize + truncate: the assignment feeds THREE consumers (both
    # pair-join sides and the final projection) — uncached, the
    # centroid scoring pass would re-run per consumer (the
    # iterative-lineage discipline; this is the persisted cluster
    # assignment a production SemDeDup pass writes anyway)
    from clean_census_acs_data_spark.operators.similarity import (
        argbest_centroid,
        centroid_array,
    )

    cents = centroid_array(
        cent, id_col="centroid_id", vec_col="cq", n2_col="cn2"
    )
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .withColumn(
            "__best", argbest_centroid(F.col("q"), F.col("n2"), F.col("__cents"))
        )
        .select("vec_id", "q", "n2", F.col("__best")["cid"].alias("centroid_id"))
        .localCheckpoint(eager=True)
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(
            cosine(pair_dot("a.q", "b.q"), F.col("a.n2"), F.col("b.n2"))
            >= _SEMDEDUP_THRESH
        )
        .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
    )
    dup = pairs.groupBy(F.col("vb").alias("vec_id")).agg(F.min("va").alias("dup_of"))
    return assigned.select("vec_id", "centroid_id").join(dup, "vec_id", "left")


# ---------------------------------------------------------------------------
# repeated-substring span detection (Lee et al. 2021 granularity)
# ---------------------------------------------------------------------------

_SPAN_W = 8  # tokens per window

_SUBSTR_H = H15.format(x=f"array_to_string(t[i:i + {_SPAN_W - 1}], ' ')")

_SUBSTRING_SPANS_ORACLE = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
win AS (
  SELECT doc_id, {_SUBSTR_H} AS wh
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - {_SPAN_W} + 2)) AS i
        FROM tok WHERE len(t) >= {_SPAN_W})
),
rep AS (
  SELECT wh FROM (SELECT DISTINCT doc_id, wh FROM win)
  GROUP BY wh HAVING COUNT(*) >= 2
),
per AS (
  SELECT doc_id, COUNT(*) AS n_windows,
         CAST(SUM(CASE WHEN wh IN (SELECT wh FROM rep) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_repeated_windows
  FROM win GROUP BY doc_id
)
SELECT doc_id, n_windows, n_repeated_windows,
       CAST(n_repeated_windows AS DOUBLE) / CAST(n_windows AS DOUBLE)
         AS repeated_frac
FROM per
"""


@register("dedup_substring_spans", oracle=_SUBSTRING_SPANS_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication detection at the granularity of Lee
    et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"): every 8-token window is hashed; a window that occurs in
    ≥2 distinct documents is a repeated span; each doc reports what
    fraction of its windows are cross-document repeats. Output:
    (doc_id, n_windows, n_repeated_windows, repeated_frac).

    This is the exact, every-window variant — the shuffle is keyed by
    window hash and carries one 8-byte long per token position, so at
    100 TB it is the most expensive honest shape in the dedup tier
    (~1 shuffle row per corpus token). The sampled alternatives the
    package already has — winnowing fingerprints
    (text_fingerprint_winnow) and CDC chunks (doc_chunk_cdc) — are the
    scale path; this operator is what they approximate, and the three
    agree on the planted duplicates in tests."""
    from clean_census_acs_data_spark.io import spread

    d = (
        spread(_t(spark, sf_dir, "documents"))
        .select("doc_id", F.split("text", " ").alias("t"))
        .where(F.size("t") >= _SPAN_W)
    )
    # cached: the window table feeds TWO consumers (the ≥2-docs repeat
    # set and the per-doc flag join) — uncached, the tokenize + explode
    # + per-window md5 (the dominant cost) runs twice. Two longs per
    # row; at 100 TB this is the materialized window index the repeat
    # scan would persist anyway.
    win = (
        d.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("t") - (_SPAN_W - 1))
            ).alias("i"),
            "t",
        )
        .select(
            "doc_id",
            X.md5_long(
                F.concat_ws(" ", F.slice("t", F.col("i"), _SPAN_W))
            ).alias("wh"),
        )
        .transform(tracked_cache)
    )
    win.count()  # eager: sibling subtrees race a lazy cache fill
    rep = (
        win.select("doc_id", "wh")
        .distinct()
        .groupBy("wh")
        .agg(F.count(F.lit(1)).alias("__docs"))
        .where(F.col("__docs") >= 2)
        .select("wh", F.lit(1).alias("__r"))
    )
    flagged = win.join(rep, "wh", "left")
    per = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.when(F.col("__r").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_repeated_windows"),
    )
    return per.select(
        "doc_id",
        "n_windows",
        "n_repeated_windows",
        (
            F.col("n_repeated_windows").cast("double")
            / F.col("n_windows").cast("double")
        ).alias("repeated_frac"),
    )


# ---------------------------------------------------------------------------
# mergeable log2-bucket quantile sketch
# ---------------------------------------------------------------------------

_QLOG2_ORACLE = """
WITH hist AS (
  SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket, COUNT(*) AS cnt
  FROM documents WHERE n_chars >= 1 GROUP BY 1
),
cum AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum_cnt FROM hist),
tot AS (SELECT SUM(cnt) AS total FROM hist),
qs AS (SELECT unnest([50, 90, 99]) AS q_pct),
pick AS (
  SELECT q_pct, MIN(bucket) AS bucket
  FROM qs, cum, tot
  WHERE cum_cnt * 100 >= q_pct * total
  GROUP BY q_pct
)
SELECT q_pct, bucket,
       CAST(1 << bucket AS BIGINT) AS lo,
       CAST((1 << (bucket + 1)) - 1 AS BIGINT) AS hi
FROM pick
"""


@register("quantile_log2_sketch", oracle=_QLOG2_ORACLE)
def quantile_log2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles from a mergeable log2-bucket histogram:
    doc lengths bucket by floor(log2(n_chars)) — computed as binary bit
    length, pure integer, no libm — and p50/p90/p99 resolve to the
    first bucket whose cumulative count crosses the rank. Output one
    row per quantile: (q_pct, bucket, lo, hi) with [lo, hi] the
    bucket's value range.

    The histogram is the partial state: fixed ≤64 rows per shard
    regardless of data size, merged by cell-wise sum — the same
    incremental-stats shape as token_countmin_sketch/hll_partial_merge,
    but for rank statistics. The exact-percentile twins
    (percentile_exact, percentile_cont_interp) sort real data; at
    100 TB this sketch answers from 64 longs."""
    # cached: the ≤64-row histogram feeds the cumulative walk AND the
    # total — uncached, the full documents scan ran twice for 64 rows
    hist = (
        _t(spark, sf_dir, "documents")
        .where(F.col("n_chars") >= 1)
        .groupBy(
            (F.length(F.expr("bin(n_chars)")) - 1).cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(tracked_cache)
    )
    hist.count()  # eager: sibling subtrees race a lazy cache fill
    cum = hist.select(
        "bucket",
        F.sum("cnt").over(Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)).alias("cum_cnt"),
    )
    tot = hist.agg(F.sum("cnt").alias("total"))
    qs = spark.createDataFrame([(50,), (90,), (99,)], "q_pct int")
    pick = (
        qs.crossJoin(cum)
        .crossJoin(F.broadcast(tot))
        .where(F.col("cum_cnt") * 100 >= F.col("q_pct") * F.col("total"))
        .groupBy("q_pct")
        .agg(F.min("bucket").alias("bucket"))
    )
    return pick.select(
        "q_pct",
        "bucket",
        F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) AS BIGINT)"
        ).alias("lo"),
        F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT) + 1) - 1 AS BIGINT)"
        ).alias("hi"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter runtime semi-join
# ---------------------------------------------------------------------------

_BLOOM_M = 1024  # bits
_BLOOM_K = 3  # hash functions


def _bloom_pos(key_col: F.Column, i: int) -> F.Column:
    return X.md5_long(F.concat(F.lit(f"bf{i}|"), key_col.cast("string"))) % _BLOOM_M


def _bloom_pos_sql(key: str, i: int) -> str:
    inner = f"concat('bf{i}|', CAST({key} AS VARCHAR))"
    return f"{H15.format(x=inner)} % {_BLOOM_M}"


_BLOOM_ORACLE = f"""
WITH build AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
bits AS (
  SELECT DISTINCT pos FROM (
    {" UNION ALL ".join(f"SELECT {_bloom_pos_sql('c_custkey', i)} AS pos FROM build" for i in range(_BLOOM_K))}
  )
),
probe AS (
  SELECT o_orderkey, o_custkey,
         {" + ".join(f"(CASE WHEN {_bloom_pos_sql('o_custkey', i)} IN (SELECT pos FROM bits) THEN 1 ELSE 0 END)" for i in range(_BLOOM_K))}
         AS hits
  FROM orders
)
SELECT COUNT(*) AS n_probe,
       CAST(SUM(CASE WHEN hits = {_BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM build) THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match
FROM probe
"""


@register("bloom_semijoin_stats", oracle=_BLOOM_ORACLE)
def bloom_semijoin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter runtime filter: a 1024-bit, 3-hash filter
    built from the selective customer subset (acctbal > 9000)
    pre-filters orders before the true semi-join. Output is one row:
    (n_probe, n_bloom_pass, n_true_match) — the gap between the last
    two is the false-positive traffic the filter admits.

    This is the hand-rolled form of what Spark's
    spark.sql.optimizer.runtimeFilter does inside AQE: at 100 TB the
    ≤1024-row distinct-bit table broadcasts to every scan task and
    prunes the fact side *before* the shuffle, which is exactly where
    the win is — shuffle bytes scale with bloom-pass rows, not fact
    rows. The deterministic md5 bit positions make the whole filter
    oracle-checkable, unlike the engine-internal one."""
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    bits = (
        cust.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("c_custkey"), i) for i in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # hits computed once per DISTINCT probe key (vocabulary-sized), then
    # joined back to the fact rows — not per fact row
    keys = orders.select("o_custkey").distinct()
    probe = keys.select(
        "o_custkey",
        F.posexplode(
            F.array(*[_bloom_pos(F.col("o_custkey"), i) for i in range(_BLOOM_K)])
        ).alias("i", "pos"),
    )
    key_hits = (
        probe.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    build = F.broadcast(
        cust.select(F.col("c_custkey").alias("o_custkey"), F.lit(1).alias("__m"))
    )
    per_order = (
        orders.join(key_hits, "o_custkey", "left")
        .withColumn("hits", F.coalesce("hits", F.lit(0)))
        .join(build, "o_custkey", "left")
    )
    return per_order.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.when(F.col("hits") == _BLOOM_K, 1).otherwise(0))
        .cast("long")
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("__m").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_true_match"),
    )


# ---------------------------------------------------------------------------
# streaming Count-Min maintenance (complete-mode sketch state)
# ---------------------------------------------------------------------------

_STREAM_CMS_ORACLE = f"""
WITH cells AS (
  {" UNION ALL ".join(f"SELECT {d} AS depth, {_cms_cell_sql('event_type', d)} AS cell FROM events" for d in range(CMS_D))}
)
SELECT depth, cell, COUNT(*) AS cnt
FROM cells GROUP BY depth, cell
"""


@register("streaming_cms_merge", oracle=_STREAM_CMS_ORACLE)
def streaming_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch maintained BY the streaming engine: the events
    stream's event_type column feeds the same d×w cell matrix as
    token_countmin_sketch, aggregated in complete mode through the
    state store (readStream → stateful agg → memory sink,
    Trigger.AvailableNow).

    Unlike the other streaming entries this one carries a full DuckDB
    oracle: a complete-mode count over a fully-replayed stream is
    batch-equal regardless of micro-batch boundaries, so the final
    sketch is hash-checkable — which is the operational point of CMS as
    streaming state: the sketch a cluster maintains incrementally IS
    the sketch a batch job would have built, and its ≤256-row state
    never grows with the stream."""
    import uuid

    from clean_census_acs_data_spark.streaming.windows import (
        _events_stream,
        _streaming_scope,
    )

    spark = _streaming_scope(spark)  # default state partitions, clone-scoped
    ev = _events_stream(spark, sf_dir)
    cells = F.array(*[_cms_cell(F.col("event_type"), d) for d in range(CMS_D)])
    agg = (
        ev.select(F.posexplode(cells).alias("depth", "cell"))
        .groupBy(F.col("depth").cast("int").alias("depth"), "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
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
