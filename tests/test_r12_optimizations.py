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


def test_bucketed_minmax_matches_per_user_grouping(spark):
    """applyinpandas_minmax_scale's r12 bucketed grouped-map (pmod
    user bucket + vectorized per-user groupby-transform inside) must
    emit exactly the rows of the original one-group-per-user form."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from clean_census_acs_data_spark.io import spread
    from clean_census_acs_data_spark.queries import QUERIES

    schema = StructType(
        [
            StructField("event_id", LongType(), False),
            StructField("user_id", LongType(), False),
            StructField("scaled_micro", LongType(), False),
        ]
    )

    def scale_one_user(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = pdf["cents"].to_numpy()
        mn, mx = int(cents.min()), int(cents.max())
        s = (
            np.zeros(len(cents), dtype=np.int64)
            if mx == mn
            else (cents - mn) * 1_000_000 // (mx - mn)
        )
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "scaled_micro": s.astype(np.int64),
            }
        )

    e = spread(load_table(spark, SF, "events")).select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    old = e.groupBy("user_id").applyInPandas(scale_one_user, schema)
    new = QUERIES["applyinpandas_minmax_scale"](spark, SF)
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    ) and new.count() > 0


def test_bucketed_cogroup_stats_match_per_user_grouping(spark):
    """cogroup_click_purchase_stats' r12 bucketed cogroup (vectorized
    per-user reindex inside) must emit exactly the rows of the
    original one-cogroup-per-user form, full-outer semantics
    included."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from clean_census_acs_data_spark.queries import QUERIES

    schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("n_clicks", LongType(), False),
            StructField("n_purchases", LongType(), False),
            StructField("clicks_before_first_purchase", LongType(), False),
        ]
    )

    def stats_one_user(key, clicks, purchases):
        (uid,) = key
        n_c, n_p = len(clicks), len(purchases)
        if n_p:
            first = purchases["us"].to_numpy().min()
            before = int((clicks["us"].to_numpy() < first).sum()) if n_c else 0
        else:
            before = 0
        return pd.DataFrame(
            {
                "user_id": np.array([uid], dtype=np.int64),
                "n_clicks": np.array([n_c], dtype=np.int64),
                "n_purchases": np.array([n_p], dtype=np.int64),
                "clicks_before_first_purchase": np.array([before], dtype=np.int64),
            }
        )

    ev = load_table(spark, SF, "events")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    old = (
        c.groupBy("user_id").cogroup(p.groupBy("user_id")).applyInPandas(
            stats_one_user, schema
        )
    )
    new = QUERIES["cogroup_click_purchase_stats"](spark, SF)
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    ) and new.count() > 0


def test_sweep_derived_configs_match_independent_bandings(spark):
    """lsh_parameter_sweep's r12 single-superset derivation (all three
    configs read off the 8x1 candidate set via signature predicates)
    must match the original per-config independent banding self-joins
    row-for-row."""
    from clean_census_acs_data_spark.operators import dedup as D
    from clean_census_acs_data_spark.queries import QUERIES
    from clean_census_acs_data_spark.queries_round8d import _SWEEP_CONFIGS

    sh_tbl = D.standard_shingle_table(spark, SF)
    sig = D.standard_minhash_signatures(spark, SF)
    rows = []
    for bands, rpb in _SWEEP_CONFIGS:
        band_cols = [
            F.concat_ws("#", *[F.col(f"mh{b * rpb + r}") for r in range(rpb)])
            for b in range(bands)
        ]
        banded = sig.select(
            "doc", F.posexplode(F.array(*band_cols)).alias("band_id", "band_key")
        )
        a, b = banded.alias("a"), banded.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .dropDuplicates(["doc_a", "doc_b"])
        )
        sa = sh_tbl.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
        sb = sh_tbl.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
        ver = cand.join(sa, "doc_a").join(sb, "doc_b")
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
        union = F.size("sh_a").cast("long") + F.size("sh_b").cast("long") - inter
        jac = inter.cast("double") / union.cast("double")
        r = (
            ver.select(jac.alias("jaccard"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_candidates"),
                F.sum(F.when(F.col("jaccard") >= 0.5, 1).otherwise(0))
                .cast("long")
                .alias("n_verified"),
                F.expr(
                    "cast(sum(case when jaccard >= 0.5 then 1 else 0 end)"
                    " * 1000000 div count(1) as long)"
                ).alias("precision_micro"),
            )
            .collect()[0]
        )
        rows.append((bands, r.n_candidates, r.n_verified, r.precision_micro))
    got = sorted(
        (r.bands, r.n_candidates, r.n_verified, r.precision_micro)
        for r in QUERIES["lsh_parameter_sweep"](spark, SF).collect()
    )
    assert got == sorted(rows)
    # the nesting that licenses the derivation: candidate counts are
    # monotone in band count (2x4 subset of 4x2 subset of 8x1)
    by_bands = {r[0]: r[1] for r in rows}
    assert by_bands[2] <= by_bands[4] <= by_bands[8]


def test_cc_fused_convergence_exact_on_chain_and_forest(spark):
    """connected_components' r12 fused convergence check (old_label
    carried through the checkpoint, filter+count instead of a diff
    join) must still land exactly on min-label fixpoints — exercised
    on a 12-hop chain (multiple pointer-jump rounds, nontrivial
    convergence detection) plus disjoint components."""
    from clean_census_acs_data_spark.operators.components import (
        connected_components,
    )

    chain = [(i, i + 1) for i in range(100, 112)]
    other = [(7, 3), (3, 1), (50, 40)]
    edges = spark.createDataFrame(
        chain + other, schema="doc_a long, doc_b long"
    )
    got = {
        (r.doc_id, r.component_id)
        for r in connected_components(edges).collect()
    }
    want = {(v, 100) for v in range(100, 113)}
    want |= {(v, 1) for v in (1, 3, 7)}
    want |= {(40, 40), (50, 40)}
    assert got == want
