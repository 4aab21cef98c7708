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


def test_funnel_window_probe_matches_semijoin_probe(spark):
    """funnel_time_constrained's r12 single-window-pass form must
    agree with the original chained bucketed-EXISTS decomposition
    (still live in _exists_within / attribution_first_last): the
    range frame (−(w−1), −1) on integer µs is exactly the open
    interval (us−w, us) the semi-join probes."""
    from clean_census_acs_data_spark.queries import QUERIES
    from clean_census_acs_data_spark.queries_round7b import (
        _FUNNEL_W_US,
        _exists_within,
    )

    ev = load_table(spark, SF, "events")

    def typed(t, *cols):
        return ev.where(F.col("event_type") == t).select(
            *cols, F.unix_micros("ts").alias("us")
        )

    p = typed("purchase", "event_id", "user_id")
    c = typed("click", "user_id")
    v = typed("view", "user_id")
    cv = _exists_within(c, v, _FUNNEL_W_US).distinct()
    old = (
        p.count(),
        _exists_within(p, c, _FUNNEL_W_US).count(),
        _exists_within(p, cv, _FUNNEL_W_US).count(),
    )
    r = QUERIES["funnel_time_constrained"](spark, SF).collect()[0]
    assert (r.n_purchases, r.n_with_click, r.n_full_chain) == old


def test_basket_inrow_pairs_match_selfjoin_pairs(spark):
    """market_basket_lift's r12 in-row pair generation (collect_set →
    sorted array → upper-triangle transform) must emit exactly the
    pair multiset of the original distinct-items self-join, and the
    full lift table must match the self-join reformulation row-for-
    row."""
    from clean_census_acs_data_spark.queries import QUERIES
    from clean_census_acs_data_spark.queries_round6c import (
        _BASKET_MIN_SUPPORT,
    )

    items = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    pr = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    cab = (
        pr.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= _BASKET_MIN_SUPPORT)
    )
    cu = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    tot = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    ua = cu.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))
    ub = cu.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))
    old = (
        cab.join(ua, "part_a")
        .join(ub, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(
                F.col("c_ab").cast("double")
                * F.col("n_orders").cast("double")
                / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
                * 1000000.0
            )
            .cast("long")
            .alias("lift_e6"),
        )
    )
    new = QUERIES["market_basket_lift"](spark, SF)
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    ) and new.count() > 0


def test_markov_window_totals_match_joinback(spark):
    """markov_transition_counts' r12 SUM-over-window row totals must
    equal the original aggregate-then-broadcast-join-back totals,
    probability bits included (same long/long → double division)."""
    from pyspark.sql.window import Window

    from clean_census_acs_data_spark.queries import QUERIES

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, SF, "events").select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    tr = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tr.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("row_total")
    )
    old = tr.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / F.col("row_total").cast("double")).alias(
            "prob"
        ),
    )
    new = QUERIES["markov_transition_counts"](spark, SF)
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    ) and new.count() > 0
