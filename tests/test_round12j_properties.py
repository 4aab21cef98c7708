"""Property tests for the round-12 wave-10 batch (LOO coverage,
centroid drift). Exact parity runs in tests/test_oracle_parity.py."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_loo_coverage_bruteforce(spark):
    docs = load_table(spark, SF, "documents").toPandas()
    per_source: dict[str, set] = {}
    for r in docs.itertuples():
        ws = r.text.lower().split(" ")
        per_source.setdefault(r.source, set()).update(
            f"{a} {b}" for a, b in zip(ws, ws[1:])
        )
    holders: Counter = Counter()
    for grams in per_source.values():
        holders.update(grams)
    total = len(holders)
    got = {r.source: r for r in QUERIES["source_loo_coverage"](spark, SF).collect()}
    assert set(got) == set(per_source)
    for src, grams in per_source.items():
        unique = sum(1 for g in grams if holders[g] == 1)
        r = got[src]
        assert r.n_grams == len(grams)
        assert r.n_unique == unique
        assert r.total_grams == total
        assert r.loo_drop_ppm == unique * 1_000_000 // total
    # uniques partition: every df that is 1 belongs to exactly one source
    assert sum(r.n_unique for r in got.values()) == sum(
        1 for c in holders.values() if c == 1
    )


def test_centroid_drift_bruteforce_and_bounds(spark):
    emb = load_table(spark, SF, "embeddings").toPandas()
    got = {r.label: r for r in QUERIES["embedding_centroid_drift"](spark, SF).collect()}
    for label, g in emb.groupby("label"):
        sums = {0: None, 1: None}
        counts = {0: 0, 1: 0}
        for r in g.itertuples():
            half = r.vec_id % 2
            q = [round(float(x) * 1000) for x in r.embedding]
            counts[half] += 1
            sums[half] = q if sums[half] is None else [
                a + b for a, b in zip(sums[half], q)
            ]
        row = got[label]
        assert (row.n_a, row.n_b) == (counts[0], counts[1])
        sa, sb = sums[0], sums[1]
        dot = sum(a * b for a, b in zip(sa, sb))
        na2 = sum(a * a for a in sa)
        nb2 = sum(b * b for b in sb)
        assert (row.dot, row.norm2_a, row.norm2_b) == (dot, na2, nb2)
        assert math.isclose(
            row.centroid_cosine, dot / (math.sqrt(na2) * math.sqrt(nb2)),
            rel_tol=1e-12,
        )
        # cosine bound (the synthetic labels are NOT coherent clusters
        # — near-zero centroids make the sign noise; the exact-value
        # assertions above are the real check)
        assert -1.0 <= row.centroid_cosine <= 1.0
