"""Property tests for ann_binary_hamming_topk (wave 7). Exact parity
runs in tests/test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _pack(vec):
    w0 = sum(1 << i for i in range(32) if vec[i] > 0)
    w1 = sum(1 << (i - 32) for i in range(32, 64) if vec[i] > 0)
    return w0, w1


def test_hamming_topk_bruteforce(spark):
    emb = load_table(spark, SF, "embeddings").toPandas()
    packed = {r.vec_id: _pack(list(r.embedding)) for r in emb.itertuples()}
    qw0, qw1 = packed[0]
    dists = sorted(
        (
            bin((w0 ^ qw0)).count("1") + bin((w1 ^ qw1)).count("1"),
            vid,
        )
        for vid, (w0, w1) in packed.items()
        if vid != 0
    )[:10]
    rows = QUERIES["ann_binary_hamming_topk"](spark, SF).collect()
    assert [(r.hamming, r.vec_id) for r in rows] == dists
    for r in rows:
        w0, w1 = packed[r.vec_id]
        assert (r.w0, r.w1) == (w0, w1)
        assert 0 <= r.hamming <= 64


def test_hamming_is_angular_proxy(spark):
    """Sanity on the retrieval claim: the binary top-10's mean TRUE
    cosine must beat the corpus mean cosine to the query (the 1-bit
    front really ranks toward angular neighbors, not noise)."""
    import math

    emb = load_table(spark, SF, "embeddings").toPandas()
    vecs = {r.vec_id: list(r.embedding) for r in emb.itertuples()}
    q = vecs[0]
    qn = math.sqrt(sum(x * x for x in q))

    def cos(v):
        return sum(a * b for a, b in zip(v, q)) / (
            math.sqrt(sum(a * a for a in v)) * qn
        )

    rows = QUERIES["ann_binary_hamming_topk"](spark, SF).collect()
    top = [cos(vecs[r.vec_id]) for r in rows]
    allc = [cos(v) for vid, v in vecs.items() if vid != 0]
    assert sum(top) / len(top) > sum(allc) / len(allc)
