"""Round-8 tier C: multi-probe LSH and reproducible group sampling.

- ``similarity_lsh_multiprobe`` — LSH top-k probing the query's bucket
  AND every Hamming-distance-1 neighbor bucket (9 probes for 8
  planes): the standard recall-vs-candidates knob of production LSH,
  quantified against the single-probe entry by construction.
- ``group_sample_topk_hash``   — k-per-group reproducible uniform
  sample (smallest salted md5 per group): the sampling shape every
  eval-set builder and debugging query uses, with WindowGroupLimit
  keeping k rows at the window.

Reference tie: the reference implements none of this tier (SURVEY.md
§2B marks the category ABSENT) — BASELINE.json extension operators
under the repo's exact-integer / portable-hash discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table, spread
from clean_census_acs_data_spark.operators import similarity as S
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import H15, _bucket_sql, _dot, _quant_list


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# multi-probe LSH top-k
# ---------------------------------------------------------------------------

_MULTIPROBE_ORACLE = f"""
WITH e AS (SELECT vec_id, {_quant_list("embedding")} AS q FROM embeddings),
b AS (SELECT vec_id, q, CAST({_bucket_sql("q")} AS BIGINT) AS bucket FROM e),
qq AS (SELECT q AS qv, bucket AS qbucket, {_dot("q", "q")} AS qn2
       FROM b WHERE vec_id = 0),
probes AS (
  SELECT qv, qn2, xor(qbucket, CAST(m AS BIGINT)) AS pbucket
  FROM qq, (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS m)
),
sc AS (
  SELECT b.vec_id, b.bucket,
         CAST({_dot("b.q", "probes.qv")} AS DOUBLE) /
         (sqrt(CAST({_dot("b.q", "b.q")} AS DOUBLE)) * sqrt(CAST(probes.qn2 AS DOUBLE)))
           AS cosine
  FROM b JOIN probes ON b.bucket = probes.pbucket
  WHERE b.vec_id <> 0
)
SELECT vec_id, cosine, bucket FROM sc ORDER BY cosine DESC, vec_id LIMIT 5
"""


@register("similarity_lsh_multiprobe", oracle=_MULTIPROBE_ORACLE)
def similarity_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-5: score vectors in the query's bucket AND
    in the 8 buckets one sign-flip away (Hamming-1 ball over the 8-bit
    hyperplane code). The production recall knob: a vector near a
    hyperplane lands on either side with a coin-flip, so probing
    bit-flipped buckets recovers most single-probe misses at ~9× the
    candidates — still a 2^8/9 ≈ 28-fold pruning. ann_recall_audit
    measures exactly the gap this entry closes over
    similarity_lsh_topk.

    Shape: the probe list is a 9-row broadcast (query bucket XOR
    one-hot masks); candidates come from an equi-join on the bucket
    id — at 100 TB, 9 partition-pruned reads of a bucket-partitioned
    table, no new plan machinery."""
    emb = _t(spark, sf_dir, "embeddings")
    signs = S.hyperplane_signs(8, 64)
    base = S._quantized(spread(emb), "vec_id", "embedding")
    bucketed = base.select(
        "vec_id", "__q", "__n2", S.lsh_bucket(F.col("__q"), signs).alias("bucket")
    )
    q = bucketed.where(F.col("vec_id") == 0).select(
        F.col("__q").alias("__qvec"),
        F.col("__n2").alias("__qn2"),
        F.col("bucket").alias("__qbucket"),
    )
    masks = F.array(*[F.lit(m).cast("long") for m in (0, 1, 2, 4, 8, 16, 32, 64, 128)])
    probes = (
        q.select("__qvec", "__qn2", "__qbucket", F.explode(masks).alias("__m"))
        .select(
            "__qvec",
            "__qn2",
            F.col("__qbucket").bitwiseXOR(F.col("__m")).alias("pbucket"),
        )
    )
    return (
        bucketed.where(F.col("vec_id") != 0)
        .join(F.broadcast(probes), F.col("bucket") == F.col("pbucket"))
        .select(
            "vec_id",
            S.cosine(
                S._dot_q(F.col("__q"), F.col("__qvec")),
                F.col("__n2"),
                F.col("__qn2"),
            ).alias("cosine"),
            "bucket",
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# reproducible k-per-group hash sample
# ---------------------------------------------------------------------------

_GROUP_SAMPLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id, source,
         {H15.format(x="'sample42_' || CAST(doc_id AS VARCHAR)")} AS hkey
  FROM documents
)
SELECT doc_id, source, hkey, CAST(sample_rank AS BIGINT) AS sample_rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY hkey, doc_id) AS sample_rank
  FROM h
) WHERE sample_rank <= 5
"""


@register("group_sample_topk_hash", oracle=_GROUP_SAMPLE_ORACLE)
def group_sample_topk_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible uniform 5-per-source sample: rank documents by a
    salted md5 of their id inside each group and keep the smallest 5.
    Hash order is uniform and fixed by the salt, so the sample is (a)
    statistically uniform per group, (b) identical on every run,
    engine, and cluster size, and (c) STABLE under corpus growth — a
    doc only leaves the sample when a smaller-hash doc arrives, which
    is what makes hash-ranked samples the right eval-set builder
    (hash_sample is the Bernoulli form; this is the exactly-k form).

    WindowGroupLimit keeps 5 rows per group at the window operator —
    no group ever materializes fully sorted."""
    from clean_census_acs_data_spark.operators.text import md5_long

    h = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        md5_long(F.concat(F.lit("sample42_"), F.col("doc_id").cast("string"))).alias(
            "hkey"
        ),
    )
    w = Window.partitionBy("source").orderBy(F.asc("hkey"), F.asc("doc_id"))
    return (
        h.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= 5)
        .select("doc_id", "source", "hkey", F.col("sample_rank").cast("long"))
    )
