"""Invariant tests for the round-6 estimator/maintenance operators:
the one-sided-error and merge laws the oracles check numerically but
don't state. All deterministic (md5 hashing, no rand())."""

from __future__ import annotations

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.operators import similarity as S
from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_cms_join_size_is_one_sided(spark):
    """CMS inner product NEVER underestimates: est ≥ exact (collisions
    only add). The gap is the collision cost of w=64 cells."""
    r = QUERIES["join_size_cms_estimate"](spark, SF).collect()[0]
    assert r.est_join_size >= r.exact_join_size > 0


def test_kmv_estimate_within_envelope(spark):
    """KMV with k=32 has relative σ ≈ 1/√(k−2) ≈ 18%; the estimate
    must land within a 4σ band of the exact distinct count."""
    r = QUERIES["distinct_kmv_estimate"](spark, SF).collect()[0]
    rel_err = abs(r.kmv_estimate - r.exact_distinct) / r.exact_distinct
    assert rel_err < 0.75
    assert 0 < r.kth_hash < (1 << 60)


def test_kmv_intersection_within_envelope(spark):
    """The Jaccard-scaled KMV intersection estimate tracks the exact
    intersection within the same loose envelope, and k_in_both ≤ k."""
    r = QUERIES["kmv_intersection_estimate"](spark, SF).collect()[0]
    assert 0 <= r.k_in_both <= r.k
    if r.exact_intersection > 0:
        rel_err = abs(r.est_intersection - r.exact_intersection) / r.exact_intersection
        assert rel_err < 0.75


def test_incremental_topk_merge_law_any_split(spark):
    """top-k(top-k(A) ∪ top-k(B)) = top-k(A ∪ B) for ANY split point,
    not just the registered 400 — the semilattice law itself."""
    emb = load_table(spark, SF, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0)
    full = [
        (r.vec_id, r.cosine)
        for r in S.brute_force_topk(emb, query_id=0, k=10).collect()
    ]
    for split in (100, 250, 450):
        base = emb.where((F.col("vec_id") != 0) & (F.col("vec_id") < split))
        delta = emb.where(F.col("vec_id") >= split)
        merged_df = (
            S.brute_force_topk(base.unionAll(qrow), query_id=0, k=10)
            .unionAll(S.brute_force_topk(delta.unionAll(qrow), query_id=0, k=10))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(10)
        )
        merged = [(r.vec_id, r.cosine) for r in merged_df.collect()]
        assert merged == full, f"merge law broken at split {split}"


def test_wilson_interval_brackets_rate(spark):
    """lo ≤ p ≤ hi always, interval within [0, 1], and wider for
    smaller cohorts (monotonicity spot check skipped — widths depend
    on p too; the bracket law is the invariant)."""
    for r in QUERIES["conversion_wilson_by_nation"](spark, SF).collect():
        assert 0.0 <= r.wilson_lo <= r.conv_rate <= r.wilson_hi <= 1.0


def test_interpolation_bounded_by_brackets(spark):
    """Linear interpolation lies between the bracketing click values,
    and the view timestamp lies within [prev_ts, next_ts)."""
    ev = load_table(spark, SF, "events")
    clicks = {
        (r.user_id, r.ts): r.cv
        for r in ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min_by("value", "event_id").alias("cv"))
        .collect()
    }
    rows = QUERIES["asof_interpolate"](spark, SF).collect()
    assert rows, "no interpolated views at sf0.001?"
    for r in rows:
        v0 = clicks[(r.user_id, r.prev_ts)]
        v1 = clicks[(r.user_id, r.next_ts)]
        lo, hi = min(v0, v1), max(v0, v1)
        assert lo - 1e-9 <= r.v_interp <= hi + 1e-9
        assert r.prev_ts <= r.ts < r.next_ts


def test_bitmap_popcount_partitions_rows(spark):
    """Σ popcount over a status's words == that status's row count
    (each key sets exactly one bit in one word), and words never
    touch the sign bit (63-bit packing)."""
    counts = {
        r.o_orderstatus: r.cnt
        for r in load_table(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    acc: dict = {}
    for r in QUERIES["bitmap_index_status"](spark, SF).collect():
        assert r.bitmap_word > 0  # 63-bit words stay positive
        assert r.n_set == bin(r.bitmap_word).count("1")
        acc[r.o_orderstatus] = acc.get(r.o_orderstatus, 0) + r.n_set
    assert acc == counts


def test_conversion_latency_median_bracketed(spark):
    """Per cohort: min ≤ median ≤ max, all non-negative (first
    purchase at-or-after first view by the filter)."""
    rows = QUERIES["conversion_latency_median"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.min_latency_us <= r.median_latency_us <= r.max_latency_us
        assert r.n_converted >= 1


def test_gnn_degree_matches_graph(spark):
    """The message count per (node, dim) equals the node's degree in
    the undirected near-dup graph — no message lost or duplicated by
    the feature join."""
    import collections

    from clean_census_acs_data_spark.operators import dedup as D

    docs = D.plant_near_dups(load_table(spark, SF, "documents"))
    pairs = D.minhash_lsh_pairs(
        docs, num_hashes=8, bands=4, shingle_n=3, threshold=0.5
    ).collect()
    deg: collections.Counter = collections.Counter()
    for p in pairs:
        deg[p.doc_a] += 1
        deg[p.doc_b] += 1
    got = QUERIES["gnn_neighbor_sum"](spark, SF).collect()
    assert got
    for r in got:
        assert r.degree == deg[r.doc_id], (r.doc_id, r.k)


def test_seasonality_shares_sum_to_one(spark):
    """Traffic shares over the dow×hour matrix partition the stream:
    Σ share == 1 (up to float summation in the TEST only — the query
    itself never sums doubles)."""
    pdf = QUERIES["event_seasonality_profile"](spark, SF).toPandas()
    assert 0 <= pdf.dow.min() and pdf.dow.max() <= 6
    assert 0 <= pdf.hour.min() and pdf.hour.max() <= 23
    assert abs(pdf.share.sum() - 1.0) < 1e-9
    assert pdf.n_events.sum() > 0


def test_jaccard_histogram_covers_planted_dups(spark):
    """The planted near-dups (first-token-dropped twins) put mass in
    the top deciles; accidental band collisions put mass lower — the
    histogram must show the top bucket non-empty (calibration works)."""
    rows = {r.jaccard_decile: r.n_pairs for r in
            QUERIES["near_dup_jaccard_histogram"](spark, SF).collect()}
    assert max(rows) >= 8, f"no high-similarity mass: {rows}"
    assert all(0 <= d <= 9 for d in rows)


def test_range_boundaries_monotone(spark):
    """Equi-depth split points are non-decreasing in bucket id and lie
    within the data's min/max."""
    from clean_census_acs_data_spark.io import load_table as _lt

    rows = sorted(
        (r.bucket_id, r.boundary_cents)
        for r in QUERIES["range_partition_boundaries"](spark, SF).collect()
    )
    assert [b for b, _ in rows] == list(range(1, 8))
    vals = [v for _, v in rows]
    assert vals == sorted(vals)
    stats = (
        _lt(spark, SF, "orders")
        .agg(
            F.min(F.round(F.col("o_totalprice") * 100).cast("long")).alias("lo"),
            F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias("hi"),
        )
        .collect()[0]
    )
    assert stats.lo <= vals[0] and vals[-1] <= stats.hi


def test_topk_ties_keeps_all_tied_rows(spark):
    """Every (nation, rank) group at the cut keeps ALL rows with equal
    cents — no arbitrary survivor among ties — and ranks never exceed
    3 in the filter while row counts per nation are >= 3."""
    import collections

    rows = QUERIES["topk_with_ties_per_nation"](spark, SF).collect()
    per_nation = collections.Counter(r.c_nationkey for r in rows)
    assert all(c >= 3 for c in per_nation.values())
    by_cell = collections.defaultdict(set)
    for r in rows:
        assert 1 <= r.rnk <= 3
        by_cell[(r.c_nationkey, r.cents)].add(r.rnk)
    for (_, _), rnks in by_cell.items():
        assert len(rnks) == 1  # equal cents ⇒ equal rank (RANK semantics)
