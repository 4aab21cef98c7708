"""Round-5 tier E: the remaining estimator-accuracy audits.

The package treats every approximation as auditable: MinHash
(minhash_estimate_audit), Count-Min (heavy_hitters_cms), Bloom
(bloom_semijoin_stats), HLL (hll_deterministic_estimate) each report
estimate-vs-truth side by side. Two audits were missing:

- ``ann_recall_audit``     — recall of the LSH and IVF approximate
  top-k against the exact brute-force top-10 for the probe vector:
  THE number an ANN index is judged by (recall@k vs candidate-set
  reduction).
- ``quantile_sketch_audit`` — the log2-bucket sketch's [lo, hi] range
  vs the EXACT rank-percentile value for p50/p90/p99, with the
  containment flag. By construction the exact value must land in the
  sketch's bucket — the audit materializes that guarantee under the
  hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.operators import similarity as S
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import (
    _IVF_TOPK_ORACLE,
    _LSH_TOPK_ORACLE,
    _SIM_TOPK_ORACLE,
)
from clean_census_acs_data_spark.queries_round4 import _QLOG2_ORACLE, quantile_log2_sketch


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# ANN recall audit
# ---------------------------------------------------------------------------

_ANN_RECALL_ORACLE = f"""
WITH ex AS (SELECT vec_id FROM ({_SIM_TOPK_ORACLE.strip()})),
l AS (SELECT vec_id FROM ({_LSH_TOPK_ORACLE.strip()})),
i AS (SELECT vec_id FROM ({_IVF_TOPK_ORACLE.strip()}))
SELECT 'lsh' AS method,
       (SELECT COUNT(*) FROM l) AS k_ann,
       (SELECT COUNT(*) FROM l WHERE vec_id IN (SELECT vec_id FROM ex))
         AS n_in_exact10,
       CAST((SELECT COUNT(*) FROM l WHERE vec_id IN (SELECT vec_id FROM ex))
            AS DOUBLE) / CAST((SELECT COUNT(*) FROM l) AS DOUBLE) AS recall
UNION ALL
SELECT 'ivf' AS method,
       (SELECT COUNT(*) FROM i) AS k_ann,
       (SELECT COUNT(*) FROM i WHERE vec_id IN (SELECT vec_id FROM ex))
         AS n_in_exact10,
       CAST((SELECT COUNT(*) FROM i WHERE vec_id IN (SELECT vec_id FROM ex))
            AS DOUBLE) / CAST((SELECT COUNT(*) FROM i) AS DOUBLE) AS recall
"""


@register("ann_recall_audit", oracle=_ANN_RECALL_ORACLE)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the two ANN paths against exact brute force: how
    many of the LSH-bucket top-5 / IVF-list top-5 appear in the true
    cosine top-10 of the probe vector. Output one row per method:
    (method, k_ann, n_in_exact10, recall).

    This is the acceptance test every ANN index ships with — the
    candidate-pruning factor (2^8 buckets / 8 inverted lists) is only
    worth its recall cost if this number stays high. All three top-k
    legs are the existing operators (broadcast query, heap top-k);
    each leg runs ONCE and its ≤10-row result is collected — the
    set-intersection arithmetic happens on driver-sized lists, the
    same treatment the repo gives every other metadata-sized value.
    (Keeping the audit as one lazy plan re-evaluated every ANN leg
    twice — each tiny DataFrame was referenced by both the semi-join
    and its own count — 13.7 s → ~4 s at sf0.1.)"""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # r12 (guide §2.6): the three top-k legs are INDEPENDENT jobs whose
    # results only meet in driver-side set arithmetic — run their
    # collects from a thread pool so the lsh/ivf legs back-fill cores
    # the brute-force leg's tail leaves idle. Each leg's result is a
    # deterministic top-k list; assembly order below is fixed.
    from concurrent.futures import ThreadPoolExecutor

    def _ids(df) -> list:
        return [r.vec_id for r in df.select("vec_id").collect()]

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_ex = pool.submit(_ids, S.brute_force_topk(emb, query_id=0, k=10))
        f_lsh = pool.submit(
            _ids, S.lsh_topk(emb, query_id=0, k=5, planes=8, dim=64)
        )
        f_ivf = pool.submit(_ids, S.ivf_topk(emb, query_id=0, k=5, n_centroids=8))
        ex = set(f_ex.result())
        legs = {"lsh": f_lsh.result(), "ivf": f_ivf.result()}
    rows = []
    for method in ("lsh", "ivf"):
        ids = legs[method]
        n_in = len(set(ids) & ex)
        rows.append((method, len(ids), n_in, float(n_in) / float(len(ids))))
    schema = StructType(
        [
            StructField("method", StringType(), False),
            StructField("k_ann", LongType(), False),
            StructField("n_in_exact10", LongType(), False),
            StructField("recall", DoubleType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# quantile-sketch containment audit
# ---------------------------------------------------------------------------

_QAUDIT_ORACLE = f"""
WITH sk AS (SELECT q_pct, lo, hi FROM ({_QLOG2_ORACLE.strip()})),
pop AS (SELECT n_chars, doc_id FROM documents WHERE n_chars >= 1),
r AS (
  SELECT n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM pop
),
ex AS (
  SELECT qs.q_pct, r.n_chars AS exact_value
  FROM (SELECT unnest([50, 90, 99]) AS q_pct) qs, r
  WHERE r.rn = (qs.q_pct * r.n + 99) // 100
)
SELECT sk.q_pct, sk.lo, sk.hi,
       CAST(ex.exact_value AS BIGINT) AS exact_value,
       ex.exact_value BETWEEN sk.lo AND sk.hi AS in_range
FROM sk JOIN ex USING (q_pct)
"""


@register("quantile_sketch_audit", oracle=_QAUDIT_ORACLE)
def quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The log2-bucket quantile sketch's bucket range vs the exact
    rank-percentile value, per quantile: (q_pct, lo, hi, exact_value,
    in_range). The containment is guaranteed by construction — the
    first bucket whose cumulative count crosses rank ⌈q·n/100⌉
    contains the element at that rank — and this audit pins the
    guarantee under the hash gate.

    The exact side global-sorts the audited column (rank statistics
    are exact or cheap, never both); in production the sketch answers
    from ≤64 longs and THIS query is what you run on a sample when
    commissioning it."""
    sk = quantile_log2_sketch(spark, sf_dir).select("q_pct", "lo", "hi")
    pop = (
        _t(spark, sf_dir, "documents")
        .where(F.col("n_chars") >= 1)
        .select("n_chars", "doc_id")
    )
    w = Window.orderBy("n_chars", "doc_id")
    r = pop.select(
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("n"),
    )
    qs = spark.createDataFrame([(50,), (90,), (99,)], "q_pct int")
    ex = (
        r.crossJoin(F.broadcast(qs))
        .where(F.col("rn") == F.expr("(q_pct * n + 99) div 100"))
        .select("q_pct", F.col("n_chars").cast("long").alias("exact_value"))
    )
    return sk.join(F.broadcast(ex), "q_pct").select(
        "q_pct",
        "lo",
        "hi",
        "exact_value",
        ((F.col("exact_value") >= F.col("lo")) & (F.col("exact_value") <= F.col("hi"))).alias(
            "in_range"
        ),
    )
