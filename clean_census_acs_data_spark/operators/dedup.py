"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the point of each):

- exact_dedup: group on sha2(text) not raw text — shuffle keys are 32
  bytes instead of document bodies; partial aggregation dedups
  map-side first.
- minhash_lsh_pairs: the classic shingle→minhash→band→bucket-join
  pipeline. Candidate generation is a self-join on (band_id, band_key)
  buckets, so the shuffle is O(docs·bands), never O(docs²); only
  bucket-colliding pairs pay the exact-Jaccard verification.
- simhash: one 64/16-bit signature per doc; near-dup = banded equality
  on signature chunks (Hamming-ball probing), again avoiding O(n²).
- ngram_jaccard_pairs: exact verification kernel, used standalone only
  within small blocking groups.
- embedding near-dup: cosine over quantized-integer dot products within
  a blocking key (label); at scale the blocking key would be an LSH or
  IVF bucket (see operators/similarity.py).

Hash/arithmetic portability contract: see operators/text.py docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clean_census_acs_data_spark.operators.text import md5_long, shingles, tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per identical text. Deterministic (unlike
    dropDuplicates). Groups on sha2 so 100-TB shuffles carry 32-byte
    keys; a final equality check inside each group guards against (astronomically
    unlikely) hash collisions by grouping on (hash, text) pairs."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("__h"), F.col(text_col))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__h")
    )


def minhash_signature(toks: Column, num_hashes: int = 8, shingle_n: int = 3) -> list[Column]:
    """MinHash signature: per hash-function i, the lexicographic min of
    md5(i || '|' || shingle) over the doc's shingle set. String-min of
    md5 hex == numeric min of the 128-bit hash — portable to any engine
    with md5."""
    sh = F.array_distinct(shingles(toks, shingle_n))
    return [
        F.array_min(F.transform(sh, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}|"), s)))).alias(
            f"mh{i}"
        )
        for i in range(num_hashes)
    ]


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH.

    1. signature: num_hashes min-hashes over word-shingle sets
    2. banding: rows/band = num_hashes/bands; band key = concat of the
       band's signature values → explode to (band_id, band_key)
    3. candidates: self-join on the bucket (shuffle on band_key — at
       100 TB the hot-bucket risk is handled by AQE skew-join; salting
       would go here if a degenerate key appeared)
    4. verify: exact Jaccard over distinct shingle sets; keep ≥ threshold

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    rows_per_band = num_hashes // bands
    toks = tokens(F.col(text_col))
    sh = F.array_distinct(shingles(toks, shingle_n))
    sig = docs.select(
        F.col(id_col).alias("doc"),
        sh.alias("sh"),
        *minhash_signature(toks, num_hashes, shingle_n),
    ).where(F.size("sh") > 0)

    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws("#", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
                "band_key"
            ),
        )
        for b in range(bands)
    ]
    banded = sig.select("doc", "sh", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc", "sh", F.col("bk.band_id").alias("band_id"), F.col("bk.band_key").alias("band_key")
    )

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )

    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    union = F.size("sh_a").cast("long") + F.size("sh_b").cast("long") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "source",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Character-n-gram Jaccard similarity between documents sharing a
    blocking key. The block join bounds pair count; exact verification
    only inside blocks."""
    # substring with a column start position needs the expr form
    d = docs.select(
        F.col(id_col).alias("doc"),
        F.col(block_col).alias("blk"),
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {n - 1}, 0)),"
            f" i -> substring({text_col}, i, {n})))"
        ).alias("grams"),
    ).where(F.size("grams") > 0)
    a, b = d.alias("a"), d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).cast("long")
    union = F.size("a.grams").cast("long") + F.size("b.grams").cast("long") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc") < F.col("b.doc")))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def plant_near_dups(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    every: int = 10,
    id_offset: int = 1_000_000,
) -> DataFrame:
    """Deterministic near-duplicate injection for testing dedup recall:
    every ``every``-th doc re-appears with the first token dropped and a
    shifted id. Mirrored exactly in the DuckDB oracles."""
    toks = tokens(F.col(text_col))
    mutated = (
        docs.where(F.col(id_col) % every == 0)
        .select(
            (F.col(id_col) + id_offset).alias(id_col),
            F.concat_ws(" ", F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))).alias(
                text_col
            ),
        )
    )
    return docs.select(id_col, text_col).unionByName(mutated)
