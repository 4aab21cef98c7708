"""Focused equivalence tests for round-12 optimization rewrites.

Each optimization here changed an operator's *plan shape* while
claiming bit-identical output; these tests pin that claim against the
original (unstaged / multi-pass) formulation so the two cannot drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clean_census_acs_data_spark.operators import text as X
from clean_census_acs_data_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_lang_id_frame_matches_unstaged_fold(spark):
    """lang_id_frame (the staged-projection rewrite behind
    text_lang_id) must agree row-for-row with the original inline
    lang_id/lang_scores expressions — same argmax, same tiebreak, same
    en-ratio bits. The rewrite only restructures the expression DAG
    (stage the five stopword ratios as real columns, then fold over
    plain references); any arithmetic difference shows up here."""
    docs = load_table(spark, SF, "documents")
    staged = X.lang_id_frame(docs, "text", keep=("doc_id",)).select(
        "doc_id", "pred_lang", *[f"s_{L}" for L in sorted(X.LANG_STOPWORDS)]
    )
    toks = X.tokens("text")
    scores = X.lang_scores(toks)
    unstaged = docs.select(
        "doc_id",
        X.lang_id(toks).alias("pred_lang"),
        *[scores[L].alias(f"s_{L}") for L in sorted(X.LANG_STOPWORDS)],
    )
    assert staged.exceptAll(unstaged).count() == 0
    assert unstaged.exceptAll(staged).count() == 0
