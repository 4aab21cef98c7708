"""Invariant tests for the round-10 operators: the structural laws the
oracles verify numerically but don't state.

The prefix-filter completeness test is the load-bearing one: it checks
the PPJoin theorem (every pair at Jaccard ≥ t shares a prefix element
under ANY consistent global order) against a brute-force recompute, so
a future change to the ordering, prefix length, or hash keying that
silently loses pairs fails here rather than only shifting bench
numbers."""

from __future__ import annotations

from pyspark.sql import functions as F

from clean_census_acs_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _brute_force_jaccard_pairs(spark, threshold=0.5):
    """All doc pairs with shingle-set Jaccard ≥ threshold, recomputed
    driver-side from scratch (independent of every operator under
    test). sf0.001 is ~50 docs, so the n² loop is trivial."""
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    sets = {}
    for r in rows:
        t = r.text.split(" ")
        if len(t) >= 3:
            sets[r.doc_id] = {
                " ".join(t[i : i + 3]) for i in range(len(t) - 2)
            }
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a]) + len(sets[b]) - inter
            if uni and 2 * inter >= uni:
                out[(a, b)] = (inter, uni)
    return out


def test_setsim_prefix_filter_is_complete_and_sound(spark):
    """The PPJoin prefix filter must find EXACTLY the brute-force pair
    set — completeness is the theorem the operator's pruning rests on;
    soundness comes from the exact verify."""
    got = {
        (r.doc_a, r.doc_b): (r.inter, r.uni)
        for r in QUERIES["setsim_join_prefix_filter"](spark, SF).collect()
    }
    want = _brute_force_jaccard_pairs(spark)
    assert got == want


def test_snm_pairs_sound_and_within_threshold(spark):
    """Every SNM pair's reported distance equals the true edit distance
    and is ≤ the threshold (soundness — SNM's blocking makes recall
    deliberately partial, so completeness is NOT asserted)."""

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    rows = QUERIES["dedup_sorted_neighborhood"](spark, SF).collect()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.edit_dist <= 30
        assert r.edit_dist == lev(texts[r.doc_a], texts[r.doc_b])


def _bpe_reference(docs: dict[int, list[str]], iters: int):
    """Naive driver-side BPE: argmax pair (count desc, lexicographic),
    greedy left-to-right non-overlapping rewrite."""
    merges = []
    for _ in range(iters):
        counts: dict[tuple[str, str], int] = {}
        for toks in docs.values():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        new_docs = {}
        for did, toks in docs.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                    out.append(l + " " + r)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_docs[did] = out
        docs = new_docs
        merges.append((l, r, c, sum(len(t) for t in docs.values())))
    return merges


def test_bpe_matches_naive_reference(spark):
    """The distributed argmax + regex rewrite must equal the sequential
    greedy reference exactly — including on corpora with 'x x x'-style
    overlapping runs (documents at sf0.001 contain repeated tokens)."""
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    want = _bpe_reference(docs, 3)
    got = sorted(
        (r.left_tok, r.right_tok, r.pair_count, r.tokens_after)
        for r in QUERIES["bpe_train_merges"](spark, SF).collect()
    )
    want_sorted = sorted((l, r, c, n) for l, r, c, n in want)
    assert got == want_sorted


def test_multi_touch_credit_sums_to_unity(spark):
    """Within the query output, total linear and U-shaped credit are
    each exactly n_conversions · 10^6 ppm — the deterministic remainder
    pinning means no credit is created or lost."""
    rows = QUERIES["attribution_multi_touch"](spark, SF).collect()
    if not rows:
        return
    lin = sum(r.linear_credit_ppm for r in rows)
    u = sum(r.u_credit_ppm for r in rows)
    assert lin == u
    assert lin % 1_000_000 == 0


def test_poisson_bootstrap_ci_brackets_point(spark):
    """Order statistics must bracket: boot_lo ≤ boot_hi, and the weights
    driving them are a proper distribution (est within a loose factor
    of the bootstrap interval midpoint)."""
    r = QUERIES["poisson_bootstrap_ci"](spark, SF).collect()[0]
    assert r.boot_lo <= r.boot_hi
    assert r.n_replicas == 32
    mid = (r.boot_lo + r.boot_hi) / 2
    assert 0.5 * mid < r.mean_cents < 2 * mid


def test_incremental_join_maintained_equals_recomputed(spark):
    """The delta algebra's whole point: maintained_total row equals
    recomputed_full row exactly."""
    rows = {
        r.component: (r.n_rows, r.rev_cents)
        for r in QUERIES["incremental_join_maintenance"](spark, SF).collect()
    }
    assert rows["maintained_total"] == rows["recomputed_full"]


def test_auc_rank_identity(spark):
    """auc == auc_num / auc_den, and 0 ≤ auc ≤ 1 with the exact
    integers consistent."""
    r = QUERIES["auc_exact_rank"](spark, SF).collect()[0]
    assert 0.0 <= r.auc <= 1.0
    assert r.auc == r.auc_num / r.auc_den
    assert r.auc_den == 2 * r.n_pos * r.n_neg


def test_semantic_pack_order_shards_partition_corpus(spark):
    """Shard manifest covers every vector exactly once with bounded
    shard size, and cluster ranges are consistent (first ≤ last)."""
    rows = QUERIES["semantic_pack_order"](spark, SF).collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == n_vecs
    for r in rows:
        assert 0 < r.n_vecs <= 64
        assert r.first_cluster <= r.last_cluster
        assert r.n_clusters >= 1


def test_dp_noise_magnitude_and_determinism(spark):
    """Laplace(b=1) micro-noise: |noise| bounded by ln(1e6)·1e6 (the
    extreme inverse-CDF draw), deterministic across runs, and the
    released value is exactly n + noise/1e6."""
    a = QUERIES["dp_noisy_release"](spark, SF).collect()
    b = QUERIES["dp_noisy_release"](spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    import math

    bound = int(1_000_000 * math.log(1_000_000)) + 2
    for r in a:
        assert abs(r.noise_micro) <= bound
        assert r.noisy_n == r.n + r.noise_micro / 1_000_000.0


def test_hardness_prune_keeps_quarter_per_label(spark):
    """Per label: kept count == floor(n/4) (rank·4 ≤ n), ranks are
    1..kept, and kept distances dominate: every kept d2n2 ≥ the label's
    own kept minimum by construction of the rank filter."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    sizes = {
        r.label: r.n
        for r in emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = QUERIES["embedding_hardness_prune"](spark, SF).collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    for label, rs in by_label.items():
        n = sizes[label]
        assert len(rs) == n // 4
        assert sorted(r.hardness_rank for r in rs) == list(
            range(1, len(rs) + 1)
        )
        rs.sort(key=lambda r: r.hardness_rank)
        d = [r.d2n2 for r in rs]
        assert d == sorted(d, reverse=True)


def test_compaction_bins_cover_and_fill(spark):
    """Bins cover every file-group exactly once; every bin except
    possibly the last (by id) is filled to ≥ target (next-fit by
    cumulative sum can't leave an earlier bin short unless a single
    file overshoots, which also satisfies ≥ target for the PREVIOUS
    boundary)."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF}/documents.parquet")
    n_groups = d.groupBy("source", "lang").count().count()
    rows = sorted(
        QUERIES["compaction_bin_packing"](spark, SF).collect(),
        key=lambda r: r.bin,
    )
    assert sum(r.n_files for r in rows) == n_groups
    assert [r.bin for r in rows] == sorted({r.bin for r in rows})


def test_stratified_kfold_balance(spark):
    """Within every stratum the k fold sizes differ by at most 1, and
    fold sizes sum to the stratum size."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF}/documents.parquet")
    strata = {
        r.lang: r.n
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = QUERIES["stratified_kfold_assign"](spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.n_docs)
    for lang, sizes in by_lang.items():
        assert sum(sizes) == strata[lang]
        assert max(sizes) - min(sizes) <= 1


def test_novelty_first_doc_is_fully_novel(spark):
    """The smallest doc_id with ≥3 tokens has novelty exactly 1.0 (all
    its shingles first occur there), and all novelty values are in
    [0, 1] with n_novel ≤ n_grams."""
    rows = QUERIES["ngram_novelty_score"](spark, SF).collect()
    assert rows
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty == 1.0
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_novel <= r.n_grams


def test_bucketed_join_matches_plain_join(spark):
    """The bucketed-layout join must produce exactly the plain join's
    aggregate (the layout changes the plan, never the answer)."""
    from pyspark.sql import functions as F

    from clean_census_acs_data_spark.io import load_table

    got = {
        (r.o_orderpriority, r.n_lines, r.price_cents)
        for r in QUERIES["bucketed_join_shuffle_free"](spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    want = {
        (r.o_orderpriority, r.n_lines, r.price_cents)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "price_cents"
            ),
        )
        .collect()
    }
    assert got == want
