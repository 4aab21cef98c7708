"""Behavior tests for corpus-hygiene operators: the edge cases the
parquet fixtures don't exercise (docs shorter than n tokens, zero
vectors, empty eval sets, exact flag thresholds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clean_census_acs_data_spark.operators.corpus import (
    ngram_decontaminate,
    quantize_embeddings_int8,
    repetition_metrics,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_short_doc_yields_zero_row(spark):
    out = repetition_metrics(_docs(spark, [(1, "single")]), n=2).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["n_grams"] == 0
    assert r["top_gram_frac"] is None
    assert r["is_repetitive"] is False


def test_repetition_flags_loops_not_prose(spark):
    loop = " ".join(["spam ham"] * 20)          # one bigram dominates
    prose = "a b c d e f g h i j k l m n o p"   # all bigrams unique
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_metrics(
            _docs(spark, [(1, loop), (2, prose)]), n=2
        ).collect()
    }
    assert out[1]["is_repetitive"] is True
    assert out[1]["top_gram_frac"] > 0.4
    assert out[2]["is_repetitive"] is False
    assert out[2]["dup_gram_frac"] == 0.0


def test_repetition_dup_frac_counts_all_repeats(spark):
    # "x y" ×2 and "y x" ×2 among 4 grams: every occurrence is a repeat
    out = repetition_metrics(_docs(spark, [(1, "x y x y x")]), n=2).collect()[0]
    assert out["n_grams"] == 4
    assert out["n_distinct_grams"] == 2
    assert out["dup_gram_frac"] == 1.0


def test_decontaminate_flags_only_overlapping(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words nothing shared here at all"),
        ],
    )
    ev = _docs(spark, [(100, "the quick brown fox jumps elsewhere")])
    out = {
        r["doc_id"]: r.asDict()
        for r in ngram_decontaminate(train, ev, n=5).collect()
    }
    assert out[1]["n_overlap"] == 1  # "the quick brown fox jumps"
    assert out[1]["overlap_frac"] == pytest.approx(1 / 5)
    assert out[1]["is_contaminated"]
    assert out[2]["n_overlap"] == 0
    assert out[2]["overlap_frac"] == 0.0
    assert not out[2]["is_contaminated"]


def test_decontaminate_empty_eval_keeps_all_rows(spark):
    train = _docs(spark, [(1, "a b c d e f")])
    ev = _docs(spark, []).limit(0)
    out = ngram_decontaminate(train, ev, n=5).collect()
    assert len(out) == 1 and out[0]["n_overlap"] == 0


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantize_range_and_scale(spark):
    out = quantize_embeddings_int8(_emb(spark, [(1, [0.5, -1.0, 0.25])])).collect()
    by_pos = {r["pos"]: r for r in out}
    assert by_pos[1]["q8"] == 64   # round(0.5/1.0*127) = round(63.5) → 64
    assert by_pos[2]["q8"] == -127
    assert by_pos[3]["q8"] == 32   # round(31.75) → 32
    assert all(r["scale_micro"] == 1_000_000 for r in out)


def test_quantize_zero_vector_is_all_zero(spark):
    out = quantize_embeddings_int8(_emb(spark, [(1, [0.0, 0.0])])).collect()
    assert [r["q8"] for r in out] == [0, 0]
    assert all(r["scale_micro"] == 0 for r in out)


def test_mix_sample_rate_caps_and_upweights_small(spark):
    from clean_census_acs_data_spark.operators.corpus import corpus_mix_sample

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus_mix_sample(docs, alpha=0.5, target_frac=0.5)
    rates = {r["source"]: r["rate"] for r in out.select("source", "rate").distinct().collect()}
    # small sources sample at a strictly higher rate; capped at 1.0
    assert rates.get("small", 1.0) <= 1.0
    if "big" in rates and "small" in rates:
        assert rates["small"] > rates["big"]
    # deterministic: same draw twice
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in corpus_mix_sample(docs, alpha=0.5, target_frac=0.5).collect())
    assert a == b


def test_pack_sequences_bins_and_offsets(spark):
    from clean_census_acs_data_spark.operators.corpus import pack_sequences_greedy

    docs = spark.createDataFrame(
        [
            (1, "a " * 299 + "a", "s"),   # 300 tokens
            (2, "b " * 299 + "b", "s"),   # 300 tokens → starts at 300, bin 0
            (3, "c " * 99 + "c", "s"),    # 100 tokens → starts at 600, bin 1
        ],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r.asDict() for r in
           pack_sequences_greedy(docs, window_tokens=512).collect()}
    assert out[1]["bin_id"] == 0 and out[1]["bin_offset"] == 0
    assert out[2]["bin_id"] == 0 and out[2]["bin_offset"] == 300
    assert out[3]["bin_id"] == 1 and out[3]["bin_offset"] == 88  # 600-512


def test_triangle_summary_counts_known_graph(spark):
    from clean_census_acs_data_spark.operators.graph import graph_summary

    # K4 minus edge (3,4): triangles = (1,2,3), (1,2,4)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "doc_a long, doc_b long"
    )
    r = graph_summary(edges).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 5, 2)


def test_triangle_summary_empty_graph(spark):
    from clean_census_acs_data_spark.operators.graph import graph_summary

    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    r = graph_summary(edges).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (0, 0, 0)


def test_cdc_chunks_tile_documents(spark):
    """Content-defined chunks must tile each doc exactly: sorted chunk
    spans are contiguous from position 1 to length(text), so
    re-concatenating the chunks reproduces the document."""
    from clean_census_acs_data_spark.io import load_table
    from clean_census_acs_data_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    chunks = QUERIES["doc_chunk_cdc"](spark, sf)
    lens = (
        load_table(spark, sf, "documents")
        .where(F.length("text") >= 1)
        .select("doc_id", F.length("text").cast("long").alias("n"))
    )
    agg = (
        chunks.groupBy("doc_id")
        .agg(
            F.sum("chunk_len").alias("covered"),
            F.min("chunk_start").alias("first_start"),
            F.max(F.col("chunk_start") + F.col("chunk_len")).alias("end_excl"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .join(lens, "doc_id")
    )
    bad = agg.where(
        (F.col("covered") != F.col("n"))
        | (F.col("first_start") != 1)
        | (F.col("end_excl") != F.col("n") + 1)
    )
    assert bad.count() == 0
    # every chunk has positive length
    assert chunks.where(F.col("chunk_len") <= 0).count() == 0


def test_text_normalize_idempotent(spark):
    """Normalizing already-normalized text must be a fixpoint."""
    from clean_census_acs_data_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    once = QUERIES["text_normalize"](spark, sf).select(
        F.col("norm_text").alias("text"), "doc_id"
    )
    norm2 = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            "  +",
            " ",
        )
    )
    again = once.select("doc_id", F.col("text"), norm2.alias("renorm"))
    assert again.where(F.col("text") != F.col("renorm")).count() == 0
