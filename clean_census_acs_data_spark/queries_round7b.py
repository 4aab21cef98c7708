"""Round-7 tier B: serving-side analytics — recommendations, chained
funnels, normalized dedup, sequence mining, concentration audits.

- ``recsys_item_item_topk``   — the top-3 co-purchase recommendations
  per part (directed mirror of market_basket_lift + WindowGroupLimit):
  the precomputed item-item table a recommender actually serves from.
- ``funnel_time_constrained`` — view→click→purchase completion where
  EVERY step gap must fall inside one hour: the time-bounded funnel
  (event_funnel_conversion without deadlines is its unconstrained
  twin). Chained bucketed EXISTS probes, never per-user self-joins.
- ``dedup_exact_normalized``  — exact dedup AFTER text normalization
  (case/punctuation/whitespace folding): the "near-exact" tier between
  byte-identical dedup and MinHash, standard first pass in corpus
  cleaning.
- ``event_path_trigrams``     — most frequent 3-step event-type paths
  per user timeline (sequence mining; markov_transition_counts is the
  2-gram twin).
- ``pareto_8020_concentration`` — how many top customers cover 80% of
  revenue: the concentration audit behind key-account analysis and
  cache-sizing decisions, exact in integer cents.

Reference tie: the reference implements none of this tier (SURVEY.md §2B marks the category ABSENT; its only analytics are pre-aggregated census measures, Test_census_tract.py:287-313) — these are the BASELINE.json 100-TB extension operators, built with the repo's exact-integer discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_round6c import _BASKET_ORACLE


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# item-item recommendation serving table
# ---------------------------------------------------------------------------

_RECSYS_ORACLE = f"""
WITH lift AS ({_BASKET_ORACLE.strip()}),
directed AS (
  SELECT part_a AS part, part_b AS rec, c_ab, lift_e6 FROM lift
  UNION ALL
  SELECT part_b AS part, part_a AS rec, c_ab, lift_e6 FROM lift
)
SELECT part, rec, c_ab, lift_e6, CAST(rec_rank AS BIGINT) AS rec_rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY part
                               ORDER BY lift_e6 DESC, rec) AS rec_rank
  FROM directed
) WHERE rec_rank <= 3
"""


@register("recsys_item_item_topk", oracle=_RECSYS_ORACLE)
def recsys_item_item_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The item-item serving table: per part, its top-3 co-purchase
    recommendations by basket lift (support ≥ 3). Built by mirroring
    the undirected market-basket pair table into both directions and
    keeping 3 rows per part at the window (WindowGroupLimit — never a
    global sort).

    This is what "customers also bought" queries hit in production: a
    (part → 3 recs) table small enough to broadcast or serve from a
    K/V store, refreshed by exactly this batch plan. The mirror is a
    union of two projections of the SAME lift table (one pair-join
    pass), and the rank tiebreak (lift desc, rec asc) is total, so
    both engines cut identical tables.

    Scale bound: no new arithmetic — lift_e6 and c_ab arrive bounded from market_basket_lift (see its bound); ranks are window row numbers."""
    from clean_census_acs_data_spark.queries_round6c import market_basket_lift

    lift = market_basket_lift(spark, sf_dir)
    # mirror with an in-row explode, NOT a union of two projections: a
    # union references the lift subtree twice and Catalyst has no
    # plan-level CSE, so the whole basket pair pipeline would run twice
    # (measured 9.4 s → 4.4 s at sf0.1)
    directed = lift.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("part_a").alias("part"), F.col("part_b").alias("rec")
                ),
                F.struct(
                    F.col("part_b").alias("part"), F.col("part_a").alias("rec")
                ),
            )
        ).alias("pr"),
        "c_ab",
        "lift_e6",
    ).select(F.col("pr.part").alias("part"), F.col("pr.rec").alias("rec"), "c_ab", "lift_e6")
    w = Window.partitionBy("part").orderBy(F.desc("lift_e6"), F.asc("rec"))
    return (
        directed.withColumn("rec_rank", F.row_number().over(w))
        .where(F.col("rec_rank") <= 3)
        .select("part", "rec", "c_ab", "lift_e6", F.col("rec_rank").cast("long"))
    )


# ---------------------------------------------------------------------------
# time-constrained funnel (every step gap ≤ 1 hour)
# ---------------------------------------------------------------------------

_FUNNEL_W_US = 3_600_000_000

_FUNNEL_TC_ORACLE = f"""
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'),
v AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'view'),
cv AS (
  SELECT DISTINCT c.user_id, c.us FROM c
  WHERE EXISTS (SELECT 1 FROM v WHERE v.user_id = c.user_id
                AND v.us < c.us AND v.us > c.us - {_FUNNEL_W_US})
)
SELECT
  (SELECT COUNT(*) FROM p) AS n_purchases,
  (SELECT COUNT(*) FROM p WHERE EXISTS
     (SELECT 1 FROM c WHERE c.user_id = p.user_id
      AND c.us < p.us AND c.us > p.us - {_FUNNEL_W_US})) AS n_with_click,
  (SELECT COUNT(*) FROM p WHERE EXISTS
     (SELECT 1 FROM cv WHERE cv.user_id = p.user_id
      AND cv.us < p.us AND cv.us > p.us - {_FUNNEL_W_US})) AS n_full_chain
"""


def _exists_within(left: DataFrame, right: DataFrame, w_us: int) -> DataFrame:
    """Rows of ``left`` (user, us, + payload) having ≥1 ``right`` row
    (user, us) with right.us strictly inside (left.us − w, left.us).
    Bucketed probe (own + previous floor(us/w) bucket) keeps the
    equi-key (user, bucket) so candidates stay bounded per bucket
    regardless of per-user history length; the left-semi dedups the
    2× probe fan-out."""
    r = right.select(
        F.col("user_id").alias("__ru"),
        F.col("us").alias("__rus"),
        F.floor(F.col("us") / w_us).cast("long").alias("__rb"),
    )
    probes = left.withColumn(
        "__pb",
        F.explode(
            F.array(
                (F.floor(F.col("us") / w_us) - 1).cast("long"),
                F.floor(F.col("us") / w_us).cast("long"),
            )
        ),
    )
    return (
        probes.join(
            r,
            (F.col("__pb") == F.col("__rb"))
            & (F.col("user_id") == F.col("__ru"))
            & (F.col("__rus") < F.col("us"))
            & (F.col("__rus") > F.col("us") - w_us),
            "left_semi",
        )
        .drop("__pb")
        .distinct()
    )


@register("funnel_time_constrained", oracle=_FUNNEL_TC_ORACLE)
def funnel_time_constrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline-bounded funnel: a purchase completes the chain only if
    a click precedes it within one hour AND that chain's click itself
    had a view within the hour before it (EXISTS over clicks that have
    a qualifying view — not just the most recent click, so a
    slow-click/fast-click mix can still complete). Reports
    (n_purchases, n_with_click, n_full_chain) as one row.

    Shape (r12 optimization, guide §2.4): ONE user-partitioned RANGE-
    frame window pass replaces the former three bucketed-EXISTS
    semi-join probes (22 Exchange / 12 scans → 2 Exchange / 1 scan).
    ``EXISTS right IN (us−w, us)`` ≡ ``MAX(right_us) OVER (ORDER BY us
    RANGE BETWEEN w−1 PRECEDING AND 1 PRECEDING) IS NOT NULL`` on
    integer µs — MAX ignores the NULLs that mask other event types, and
    the strict range frame is exactly the open interval. Chaining is
    two Window nodes over the SAME sort (click-qualification first,
    then purchase probes over clicks/qualified-clicks) — no second
    exchange. The old probe decomposition lives on in
    attribution_first_last; here the window form is strictly less
    traffic at any scale (events shuffle once, no 2× bucket-probe
    fan-out, no distinct).

    Scale bound: epoch-µs is compared, never multiplied or summed
    across rows — int64 µs cannot wrap until ~year 294000; outputs
    are plain int64 COUNTs."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-(_FUNNEL_W_US - 1), -1)
    )
    is_click = F.col("event_type") == "click"
    is_purchase = F.col("event_type") == "purchase"
    view_us = F.when(F.col("event_type") == "view", F.col("us"))
    click_us = F.when(is_click, F.col("us"))
    staged = ev.select(
        "us",
        "user_id",
        is_purchase.alias("is_p"),
        click_us.alias("c_us"),
        # qualified click: a view strictly inside (us − w, us)
        F.when(is_click & F.max(view_us).over(w).isNotNull(), F.col("us")).alias(
            "qc_us"
        ),
    )
    probed = staged.select(
        "is_p",
        F.max("c_us").over(w).isNotNull().alias("has_c"),
        F.max("qc_us").over(w).isNotNull().alias("has_qc"),
    ).where("is_p")
    return probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum(F.when(F.col("has_c"), 1).otherwise(0))
        .cast("long")
        .alias("n_with_click"),
        F.sum(F.when(F.col("has_qc"), 1).otherwise(0))
        .cast("long")
        .alias("n_full_chain"),
    )


# ---------------------------------------------------------------------------
# normalized exact dedup (near-exact tier)
# ---------------------------------------------------------------------------

_NORM_DEDUP_ORACLE = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(length(norm_text) AS BIGINT) AS n_norm_chars
FROM n GROUP BY norm_text
"""


@register("dedup_exact_normalized", oracle=_NORM_DEDUP_ORACLE)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after normalization (lowercase, strip non-alnum,
    collapse runs of spaces, trim): catches the re-encodings,
    punctuation edits, and case changes that byte-exact dedup misses
    but MinHash is overkill for — the standard first pass of corpus
    cleaning (dedup_exact → THIS → dedup_minhash_lsh is the escalation
    ladder). Keeps the lowest doc_id per class, like dedup_exact.

    The normalization is three row-local JVM regex/string ops (no
    shuffle); the group-by would key on sha2(norm_text) at 100 TB —
    here it keys on the normalized text directly so the oracle can
    GROUP BY the same expression."""
    n = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
                " +",
                " ",
            )
        ).alias("norm_text"),
    )
    return (
        n.groupBy("norm_text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
        .select(
            "doc_id",
            "n_copies",
            F.length("norm_text").cast("long").alias("n_norm_chars"),
        )
    )


# ---------------------------------------------------------------------------
# event-path trigram mining
# ---------------------------------------------------------------------------

_PATH_TRIGRAM_ORACLE = """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type, 1) OVER w AS t1,
         LAG(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t2 AS step1, t1 AS step2, event_type AS step3,
       CAST(COUNT(*) AS BIGINT) AS n_paths
FROM o WHERE t2 IS NOT NULL
GROUP BY t2, t1, event_type
ORDER BY n_paths DESC, step1, step2, step3
LIMIT 20
"""


@register("event_path_trigrams", oracle=_PATH_TRIGRAM_ORACLE)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most common 3-step event-type paths across user
    timelines (sequence mining): the n=3 extension of
    markov_transition_counts, read to spot dominant journeys
    (view→click→purchase) and pathological loops (error→error→error).

    One user-keyed window (the sessionization shuffle the event tier
    already pays), two LAGs, a ≤|types|³-group agg, heap top-20 with a
    total ordering. Timestamp ties break on event_id in both engines
    so the lagged sequence is identical."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = _t(spark, sf_dir, "events").select(
        F.lag("event_type", 2).over(w).alias("step1"),
        F.lag("event_type", 1).over(w).alias("step2"),
        F.col("event_type").alias("step3"),
    )
    return (
        o.where(F.col("step1").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(
            F.desc("n_paths"), F.asc("step1"), F.asc("step2"), F.asc("step3")
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Pareto 80/20 revenue concentration
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH per AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT rev,
         SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(rev) OVER () AS total,
         COUNT(*) OVER () AS n_customers
  FROM per
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_top,
       CAST(MAX(n_customers) AS BIGINT) AS n_customers,
       CAST(MAX(cum) AS BIGINT) AS covered_cents,
       CAST(MAX(total) AS BIGINT) AS total_cents
FROM r WHERE (cum - rev) * 5 < total * 4
"""


@register("pareto_8020_concentration", oracle=_PARETO_ORACLE)
def pareto_8020_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the smallest top-customer set (by exact
    cents revenue, custkey tiebreak) whose cumulative revenue reaches
    80% of the total, reported as one row (n_top, n_customers,
    covered_cents, total_cents). The audit behind key-account
    programs, cache sizing, and hot-key risk: n_top ≪ n_customers
    means one salted key strategy, n_top ≈ 0.8·n means another.

    The 80% test is pure integer cross-multiplication
    ((cum−rev)·5 < total·4 — "the set BEFORE this row hadn't reached
    80%"), no doubles anywhere. The running sum's single-partition
    window runs over the per-customer AGGREGATE (thousands of rows at
    any corpus size, reduced map-side from the orders scan), not the
    fact table — same discipline as range_partition_boundaries."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(cents).cast("long").alias("rev"))
    )
    wcum = (
        Window.orderBy(F.desc("rev"), F.asc("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy()
    r = per.select(
        "rev",
        F.sum("rev").over(wcum).alias("cum"),
        F.sum("rev").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n_customers"),
    )
    kept = r.where((F.col("cum") - F.col("rev")) * 5 < F.col("total") * 4)
    return kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_top"),
        F.max("n_customers").cast("long").alias("n_customers"),
        F.max("cum").cast("long").alias("covered_cents"),
        F.max("total").cast("long").alias("total_cents"),
    )
