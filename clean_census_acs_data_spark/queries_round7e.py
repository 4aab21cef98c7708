"""Round-7 tier E: explainability and layout-effectiveness audits,
plus the Arrow-scalar-UDF path twin.

- ``dedup_pair_provenance``  — WHY each verified near-dup pair became
  a candidate: the LSH bands whose keys collided, per pair. The
  lineage/debuggability view of the dedup pipeline (tuning bands means
  reading exactly this table).
- ``zorder_skipping_audit``  — the measured payoff of Z-order: the
  same 2-D box predicate evaluated against zone maps of a linear
  layout vs a Morton layout of identical shard sizes; reports shards
  scanned under each. The number that justifies (or kills) a
  re-clustering job.
- ``pandas_scalar_cosine``   — brute-force cosine top-10 via an
  Arrow-batched scalar pandas UDF (numpy int64 dot), hash-identical
  to the JVM zip_with path of similarity_topk: quantifies the Python
  data path for vector math the way udtf_tokenize does for
  generators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table, spread
from clean_census_acs_data_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_M,
    minhash_signature_from_hashes,
    plant_near_dups,
    standard_minhash_signatures,
    standard_near_dup_pairs,
)
from clean_census_acs_data_spark.operators.layout import morton_code, morton_code_sql
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import (
    H15,
    _MINHASH_ORACLE,
    _SIM_TOPK_ORACLE,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# LSH candidacy provenance per verified pair
# ---------------------------------------------------------------------------


def _provenance_oracle() -> str:
    from clean_census_acs_data_spark.queries_ext import _PLANTED_DOCS, _SHINGLES

    sig_cols = ", ".join(
        f"list_min(list_transform(hv, x -> ({MINHASH_A[i]} * x + {MINHASH_B[i]})"
        f" % {MINHASH_M})) AS mh{i}"
        for i in range(8)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, mh{2 * b} || '#' || mh{2 * b + 1} AS band_key FROM sig"
        for b in range(4)
    )
    return f"""
WITH base AS ({_PLANTED_DOCS}),
tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM base),
sh AS ({_SHINGLES}),
hv AS (
  SELECT doc_id, sh,
         list_transform(sh, s -> {H15.format(x="s")} % {MINHASH_M}) AS hv
  FROM sh
),
sig AS (SELECT doc_id, {sig_cols} FROM hv),
bands AS ({band_union}),
pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE.strip()})),
prov AS (
  SELECT p.doc_a, p.doc_b, ba.band_id
  FROM pairs p
  JOIN bands ba ON ba.doc_id = p.doc_a
  JOIN bands bb ON bb.doc_id = p.doc_b
   AND bb.band_id = ba.band_id AND bb.band_key = ba.band_key
)
SELECT doc_a, doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_collide_bands,
       CAST(MIN(band_id) AS BIGINT) AS first_band
FROM prov GROUP BY doc_a, doc_b
"""


@register("dedup_pair_provenance", oracle=_provenance_oracle())
def dedup_pair_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidacy provenance for every verified near-dup pair: how many
    of the 4 LSH bands collided (and the first that did). All-4 mass =
    comfortable margin; pairs admitted by exactly one band are the
    ones a bands/rows retune would lose — this table is what you read
    before changing LSH parameters, and the audit trail when someone
    asks why two documents were merged (the reference's SQLite usage
    log answers the same "why did the pipeline do X" question for API
    calls — Test_census_tract.py:86-104).

    Shape: signatures recompute in one corpus pass (same kernel as
    minhash_lsh_pairs); the verified pair table is collision-sized, so
    both provenance joins key an 8-byte doc id against it and the
    band-match check compares ≤4 rows per pair."""
    # signatures from the session-shared memo: this entry used to
    # recompute the shingle+md5 corpus pass privately — visible only
    # once per-entry cache reaping stopped CacheManager substituting an
    # earlier entry's plan-identical cache (round 9)
    sig = standard_minhash_signatures(spark, sf_dir)
    band_cols = [
        F.concat_ws("#", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))
        for b in range(4)
    ]
    # banding the cached tiny signature table is a narrow projection —
    # no private cache needed on top of the shared signature memo
    bands = sig.select(
        "doc", F.posexplode(F.array(*band_cols)).alias("band_id", "band_key")
    )
    pairs = standard_near_dup_pairs(spark, sf_dir, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    ba = bands.select(
        F.col("doc").alias("doc_a"),
        F.col("band_id"),
        F.col("band_key").alias("key_a"),
    )
    bb = bands.select(
        F.col("doc").alias("doc_b"),
        F.col("band_id"),
        F.col("band_key").alias("key_b"),
    )
    prov = (
        pairs.join(ba, "doc_a")
        .join(bb, ["doc_b", "band_id"])
        .where(F.col("key_a") == F.col("key_b"))
    )
    return prov.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_collide_bands"),
        F.min("band_id").cast("long").alias("first_band"),
    )


# ---------------------------------------------------------------------------
# Z-order vs linear layout: measured data-skipping payoff
# ---------------------------------------------------------------------------

_ZS_SHARD_ROWS = 500
_ZS_BITS = 10
# 2-D box predicate over (custkey mod 1024, $1000 price bucket)
_ZS_D1_LO, _ZS_D1_HI = 100, 200
_ZS_D2_LO, _ZS_D2_HI = 20, 40

_ZS_ORACLE = f"""
WITH d AS (
  SELECT o_orderkey,
         o_custkey % 1024 AS d1,
         (CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000) % 1024 AS d2
  FROM orders
),
coded AS (SELECT *, {morton_code_sql("d1", "d2", bits=_ZS_BITS)} AS z FROM d),
layouts AS (
  SELECT 'linear' AS layout, d1, d2,
         (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // {_ZS_SHARD_ROWS} AS shard
  FROM coded
  UNION ALL
  SELECT 'zorder' AS layout, d1, d2,
         (ROW_NUMBER() OVER (ORDER BY z, o_orderkey) - 1) // {_ZS_SHARD_ROWS} AS shard
  FROM coded
),
zm AS (
  SELECT layout, shard,
         MIN(d1) AS min1, MAX(d1) AS max1, MIN(d2) AS min2, MAX(d2) AS max2,
         SUM(CASE WHEN d1 >= {_ZS_D1_LO} AND d1 < {_ZS_D1_HI}
                   AND d2 >= {_ZS_D2_LO} AND d2 < {_ZS_D2_HI}
                  THEN 1 ELSE 0 END) AS n_match
  FROM layouts GROUP BY layout, shard
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_shards,
       CAST(SUM(CASE WHEN max1 >= {_ZS_D1_LO} AND min1 < {_ZS_D1_HI}
                      AND max2 >= {_ZS_D2_LO} AND min2 < {_ZS_D2_HI}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
       CAST(SUM(n_match) AS BIGINT) AS n_match
FROM zm GROUP BY layout
"""


@register("zorder_skipping_audit", oracle=_ZS_ORACLE)
def zorder_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measured payoff of Z-ordering: shard orders two ways —
    natural key order vs Morton-interleaved (custkey, price-bucket) —
    into equal 500-row shards, build (min, max) zone maps on both
    dimensions, and count how many shards a 2-D box predicate must
    scan under each layout. Matching row count is layout-invariant
    (the built-in sanity check); the n_scanned gap is the exact number
    a re-clustering job buys. Linear layouts interleave one dimension
    perfectly and shred the other; Morton bounds BOTH dims per shard —
    this audit turns that folklore into a measured integer.

    The rank-based shard assignment is the write path of
    write_zorder_layout (range-partitioned sort at scale); zone-map
    arithmetic is pure integer min/max. The audit output is 2 rows."""
    d = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).alias("d1"),
        (
            (F.round(F.col("o_totalprice") * 100).cast("long") / 100000).cast(
                "long"
            )
            % 1024
        ).alias("d2"),
    )
    coded = d.withColumn("z", morton_code(F.col("d1"), F.col("d2"), bits=_ZS_BITS))
    lin = coded.withColumn(
        "shard",
        ((F.row_number().over(Window.orderBy("o_orderkey")) - 1) / _ZS_SHARD_ROWS)
        .cast("long"),
    ).select(F.lit("linear").alias("layout"), "d1", "d2", "shard")
    zo = coded.withColumn(
        "shard",
        (
            (F.row_number().over(Window.orderBy("z", "o_orderkey")) - 1)
            / _ZS_SHARD_ROWS
        ).cast("long"),
    ).select(F.lit("zorder").alias("layout"), "d1", "d2", "shard")
    in_box = (
        (F.col("d1") >= _ZS_D1_LO)
        & (F.col("d1") < _ZS_D1_HI)
        & (F.col("d2") >= _ZS_D2_LO)
        & (F.col("d2") < _ZS_D2_HI)
    )
    zm = (
        lin.unionByName(zo)
        .groupBy("layout", "shard")
        .agg(
            F.min("d1").alias("min1"),
            F.max("d1").alias("max1"),
            F.min("d2").alias("min2"),
            F.max("d2").alias("max2"),
            F.sum(F.when(in_box, 1).otherwise(0)).alias("n_match"),
        )
    )
    scans = (
        (F.col("max1") >= _ZS_D1_LO)
        & (F.col("min1") < _ZS_D1_HI)
        & (F.col("max2") >= _ZS_D2_LO)
        & (F.col("min2") < _ZS_D2_HI)
    )
    return zm.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_shards"),
        F.sum(F.when(scans, 1).otherwise(0)).cast("long").alias("n_scanned"),
        F.sum("n_match").cast("long").alias("n_match"),
    )


# ---------------------------------------------------------------------------
# Arrow scalar-UDF cosine (the Python-data-path twin of similarity_topk)
# ---------------------------------------------------------------------------


@register("pandas_scalar_cosine", oracle=_SIM_TOPK_ORACLE)
def pandas_scalar_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 of vec_id=0 computed through an
    Arrow-batched SCALAR pandas UDF (numpy int64 dot on the same
    1e-6-quantized integers) instead of the JVM zip_with fold —
    hash-identical output to similarity_topk, existing to quantify the
    Arrow scalar path for vector math exactly as udtf_tokenize does
    for generators. Quantization uses half-away-from-zero rounding to
    match Spark's ROUND (numpy's default round is half-even — the kind
    of 1-off that the bit-exact oracle gate exists to catch).

    The query vector is a metadata-sized driver constant (64 floats)
    closed over by the UDF; the UDF returns (dot, norm²) — two longs
    per row — and the final cosine stays JVM-side. r12 optimization
    (guide §4.4): the norm was previously a JVM `zip_with` fold over
    the SAME vector the Python worker had just quantized — 64
    round+cast+multiply steps per row of pure re-derivation. Folding
    it into the UDF as `(q*q).sum(axis=1)` (one vectorized numpy pass
    over data already in hand, +8 bytes/row of Arrow return traffic)
    cut the warm rep 0.78–0.84 → 0.44–0.49 s at sf0.1; output
    bit-identical (same integers, same division).

    Scale bound: numpy int64 dot/norm accumulations are per-vector, ≤ dim·max(q)² with |q| ≤ 1e6·max|x| ≈ 2e6 → ~2.3e6 dims before a silent numpy wrap; row count unbounded."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType, StructField, StructType

    from clean_census_acs_data_spark.operators.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings")
    qrow = np.asarray(
        emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0],
        dtype=np.float64,
    )
    qv = (np.sign(qrow) * np.floor(np.abs(qrow) * 1_000_000 + 0.5)).astype(np.int64)

    def _dot_norm_q(col: pd.Series) -> pd.DataFrame:
        m = np.stack(col.to_numpy()).astype(np.float64)
        q = (np.sign(m) * np.floor(np.abs(m) * 1_000_000 + 0.5)).astype(np.int64)
        return pd.DataFrame({"d": q @ qv, "n2": (q * q).sum(axis=1)})

    # annotations on a nested def can't be resolved by the typehint
    # parser when pandas is a function-local import — register with an
    # explicit eval type instead
    _dot_norm_q.__annotations__ = {}
    dot_norm_q = pandas_udf(
        _dot_norm_q,
        StructType(
            [StructField("d", LongType()), StructField("n2", LongType())]
        ),
    )

    qn2 = int(qv @ qv)
    scored = (
        spread(emb.where(F.col("vec_id") != 0))
        .select("vec_id", dot_norm_q("embedding").alias("dn"))
        .select(
            "vec_id",
            cosine(F.col("dn.d"), F.col("dn.n2"), F.lit(qn2)).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)
