"""Round-14 tier: allocation, interval-sweep, and sequential-fold
operators — five classic data-engineering shapes the registry lacked.

- ``apportion_largest_remainder`` — integer seat apportionment
  (Hamilton's method): floor quotas + largest-remainder top-up. The
  exact-integer allocation every quota/budget split uses when shares
  must sum EXACTLY to the total (the ppm-credit discipline of
  attribution_multi_touch, applied to a global quota).
- ``max_concurrent_intervals``  — peak concurrency per day over the
  events' 5-minute activity intervals via the classic ±1 sweep
  (aggregate deltas per µs, one running sum). Capacity planning's
  core query.
- ``interval_union_coverage``   — per-user union of activity
  intervals: islands via the running-max-of-end trick, total covered
  µs, island count. The coverage statistic behind SLA/uptime and
  dedup-span reporting (dedup_substring_spans' temporal twin).
- ``token_budget_waterfill``    — water-filling allocation of a
  global token budget across sources: level L such that
  Σ min(n_i, L) fills the budget, found in closed form from sorted
  prefix sums — the training-data mixing allocator under per-source
  caps (corpus_mix_sample's budget-constrained complement).
- ``event_debounce_keep_first`` — greedy debounce: keep an event iff
  ≥ 12 h passed since the last KEPT event of that user. Inherently
  sequential (state = last kept timestamp, a data-dependent chain —
  NOT expressible as a window/prefix closed form, unlike CUSUM),
  so the Spark side is a grouped ``applyInPandas`` fold and the
  DuckDB oracle is a recursive CTE. The batch twin of the streaming
  rate limiter's token-bucket state.

Determinism discipline per the package standard (queries.py module
docstring): integer arithmetic end-to-end; no floats anywhere in
these five.

Reference tie: none (SURVEY.md §2D engine-extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# largest-remainder (Hamilton) apportionment of 1000 seats by nation
# ---------------------------------------------------------------------------

_SEATS = 1000

_APPORTION_ORACLE = f"""
WITH c AS (
  SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS members
  FROM customer GROUP BY 1
),
tot AS (SELECT CAST(SUM(members) AS BIGINT) AS t FROM c),
q AS (
  SELECT nk, members,
         (members * {_SEATS}) // t AS floor_seats,
         (members * {_SEATS}) % t AS remainder_num
  FROM c, tot
),
lo AS (SELECT CAST(SUM(floor_seats) AS BIGINT) AS fl FROM q),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY remainder_num DESC, nk) AS rk
  FROM q
)
SELECT r.nk AS c_nationkey, r.members,
       CAST(r.floor_seats AS BIGINT) AS floor_seats,
       CAST(r.remainder_num AS BIGINT) AS remainder_num,
       CAST(r.floor_seats
            + CASE WHEN r.rk <= {_SEATS} - lo.fl THEN 1 ELSE 0 END
            AS BIGINT) AS seats
FROM r, lo
"""


@register("apportion_largest_remainder", oracle=_APPORTION_ORACLE)
def apportion_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton apportionment of {_SEATS} seats across nations by
    customer count: floor(members·S/total) seats each, then one bonus
    seat to the largest remainders (ties → lowest nation key) until the
    house is exactly full. Integer end-to-end, so Σ seats = S exactly —
    the allocation discipline float shares cannot guarantee.

    100-TB shape: the only full-data pass is the per-nation count
    (partial agg); ranking runs on the |nations|-row quota table.
    The single-partition window is |dimension|-bounded, never
    fact-bounded — same argument as skew_key_diagnostics' top-10.

    Scale bound: members·1000 < 2⁶³ while any nation holds < 9.2·10¹⁵
    customers; remainders are < total by construction — no overflow at
    any population."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).cast("long").alias("members"))
    )
    tot = c.agg(F.sum("members").cast("long").alias("t"))
    q = c.crossJoin(F.broadcast(tot)).select(
        "nk",
        "members",
        F.expr(f"(members * {_SEATS}) DIV t").alias("floor_seats"),
        (F.col("members") * _SEATS % F.col("t")).alias("remainder_num"),
    )
    lo = q.agg(F.sum("floor_seats").cast("long").alias("fl"))
    w = Window.orderBy(F.desc("remainder_num"), F.asc("nk"))
    return (
        q.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(lo))
        .select(
            F.col("nk").alias("c_nationkey"),
            "members",
            F.col("floor_seats").cast("long").alias("floor_seats"),
            F.col("remainder_num").cast("long").alias("remainder_num"),
            (
                F.col("floor_seats")
                + F.when(F.col("rk") <= _SEATS - F.col("fl"), 1).otherwise(0)
            )
            .cast("long")
            .alias("seats"),
        )
    )


# ---------------------------------------------------------------------------
# peak concurrency per day (±1 interval sweep)
# ---------------------------------------------------------------------------

_IV_W_US = 300_000_000  # 5-minute activity interval per event
_US_DAY = 86_400_000_000

_CONCURRENCY_ORACLE = f"""
WITH iv AS (
  SELECT epoch_us(ts) AS s, epoch_us(ts) + {_IV_W_US} AS e FROM events
),
d AS (
  SELECT s AS us, 1 AS delta FROM iv
  UNION ALL
  SELECT e AS us, -1 AS delta FROM iv
),
net AS (SELECT us, CAST(SUM(delta) AS BIGINT) AS net FROM d GROUP BY us),
run AS (
  SELECT us,
         CAST(SUM(net) OVER (ORDER BY us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS conc
  FROM net
),
byday AS (SELECT us // {_US_DAY} AS day_bucket, us, conc FROM run),
mx AS (
  SELECT day_bucket, CAST(MAX(conc) AS BIGINT) AS max_concurrent
  FROM byday GROUP BY day_bucket
)
SELECT mx.day_bucket, mx.max_concurrent,
       CAST(MIN(b.us) AS BIGINT) AS first_peak_us
FROM mx JOIN byday b
  ON b.day_bucket = mx.day_bucket AND b.conc = mx.max_concurrent
GROUP BY mx.day_bucket, mx.max_concurrent
"""


@register("max_concurrent_intervals", oracle=_CONCURRENCY_ORACLE)
def max_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent 5-minute activity intervals per day, plus the
    first µs the peak is reached: the classic ±1 sweep (+1 at each
    interval start, −1 at its half-open end), deltas AGGREGATED per
    distinct µs before the running sum — so equal-timestamp starts and
    ends net out identically on both engines and no within-µs ordering
    convention is needed.

    Scale note: the running sum here is one global ordered scan (fine
    at bench scale; the net table is ≤ 2 rows per event and usually far
    smaller after the per-µs collapse). At 100 TB the same sweep runs
    as the two-phase distributed prefix sum this repo already ships for
    global_rank/stable_id_assignment: per-range partial sums, then a
    broadcast offset per range — the day grouping is unchanged.

    Scale bound: concurrency ≤ row count and µs enters only div/mod
    bucket math — int64 to 9.2·10¹⁸ events; no µs products."""
    iv = _t(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(_IV_W_US)).alias("e"),
    )
    d = iv.select(F.col("s").alias("us"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("e").alias("us"), F.lit(-1).alias("delta"))
    )
    net = d.groupBy("us").agg(F.sum("delta").cast("long").alias("net"))
    w = Window.orderBy("us").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = net.select(
        "us", F.sum("net").over(w).cast("long").alias("conc")
    ).withColumn("day_bucket", F.expr(f"us DIV {_US_DAY}"))
    mx = run.groupBy("day_bucket").agg(
        F.max("conc").cast("long").alias("max_concurrent")
    )
    return (
        mx.join(run.select("day_bucket", "us", "conc"), "day_bucket")
        .where(F.col("conc") == F.col("max_concurrent"))
        .groupBy("day_bucket", "max_concurrent")
        .agg(F.min("us").cast("long").alias("first_peak_us"))
    )


# ---------------------------------------------------------------------------
# per-user interval-union coverage (islands via running max of end)
# ---------------------------------------------------------------------------

_COVERAGE_ORACLE = f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s, epoch_us(ts) + {_IV_W_US} AS e
  FROM events
),
m AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_e
  FROM iv
),
f AS (
  SELECT user_id, s, e,
         CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
           AS new_island
  FROM m
),
isl AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
  FROM f
),
seg AS (
  SELECT user_id, island_id, MIN(s) AS st, MAX(e) AS en
  FROM isl GROUP BY user_id, island_id
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(en - st) AS BIGINT) AS covered_us,
       CAST(MAX(en) - MIN(st) AS BIGINT) AS span_us
FROM seg GROUP BY user_id
"""


@register("interval_union_coverage", oracle=_COVERAGE_ORACLE)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user union of half-open 5-minute activity intervals: island
    count, total covered µs, and overall span. Islands come from the
    running-max-of-end trick — an interval starts a new island iff its
    start exceeds the max end seen so far (touching intervals merge,
    half-open semantics). Coverage = Σ (island_end − island_start):
    overlap counted once, which a plain SUM of widths overstates.

    100-TB shape: every window and group-by partitions on user_id —
    ONE shuffle serves all four stages (the sessionize_lag_cumsum
    partitioning-reuse argument); per-user work is linear in that
    user's events after the sort.

    Scale bound: interval ends are epoch-µs + 3·10⁸ (int64 to ~year
    294000); covered_us telescopes to ≤ the user's span — no µs
    products, no cross-user sums."""
    iv = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(_IV_W_US)).alias("e"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = iv.select(
        "user_id", "s", "e", F.max("e").over(wprev).alias("prev_max_e")
    )
    f = m.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = f.select(
        "user_id", "s", "e", F.sum("new_island").over(wrun).alias("island_id")
    )
    seg = isl.groupBy("user_id", "island_id").agg(
        F.min("s").alias("st"), F.max("e").alias("en")
    )
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("en") - F.col("st")).cast("long").alias("covered_us"),
        (F.max("en") - F.min("st")).cast("long").alias("span_us"),
    )


# ---------------------------------------------------------------------------
# water-filling token-budget allocation across sources
# ---------------------------------------------------------------------------

_WATERFILL_ORACLE = """
WITH caps AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
         CAST(SUM(n_tokens) // 2 AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM caps
),
r AS (
  SELECT source, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens, source) AS k,
         COALESCE(SUM(n_tokens) OVER (ORDER BY n_tokens, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p_prev,
         COALESCE(LAG(n_tokens) OVER (ORDER BY n_tokens, source), 0)
           AS cap_prev
  FROM caps
),
cand AS (
  SELECT r.*, tot.b, tot.m,
         (tot.b - r.p_prev) // (tot.m - r.k + 1) AS lvl
  FROM r, tot
),
lvl AS (
  SELECT CAST(MAX(lvl) AS BIGINT) AS level FROM cand
  WHERE lvl >= cap_prev AND lvl < n_tokens
)
SELECT c.source, c.n_tokens, lvl.level,
       CAST(LEAST(c.n_tokens, lvl.level) AS BIGINT) AS alloc_tokens,
       c.n_tokens <= lvl.level AS at_cap
FROM caps c, lvl
"""


@register("token_budget_waterfill", oracle=_WATERFILL_ORACLE)
def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling allocation of a global token budget (half the
    corpus) across sources: find the level L where Σ min(n_i, L) fills
    the budget, give every source min(cap, L). Sources below the level
    keep everything (at_cap), big sources are clipped to L — the
    budget-constrained sampling allocator that maximizes the minimum
    per-source take (corpus_mix_sample reweights by temperature; this
    one honors hard caps).

    Closed form, no iteration: sort caps ascending; if L lands between
    cap_{{k−1}} and cap_k then Σ min = P_{{k−1}} + (m−k+1)·L, so the
    candidate per rank is (B − P_{{k−1}}) // (m−k+1) and exactly one
    candidate is consistent with its own bracket (Σ min(n_i, L) is
    monotone in L); MAX over the valid candidates selects it. Compare
    ipf_raking_weights: iteration cost independent of corpus size —
    here even the iteration disappears.

    100-TB shape: one partial-agg pass builds the |sources|-row cap
    table; everything after runs on that dimension table (broadcast
    total, |sources|-row window).

    Scale bound: all arithmetic is sums and divisions of token counts
    — int64 to 9.2·10¹⁸ total tokens; no products."""
    caps = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("long")
            .alias("n_tokens")
        )
    )
    tot = caps.agg(
        F.sum("n_tokens").cast("long").alias("t"),
        F.expr("SUM(n_tokens) DIV 2").cast("long").alias("b"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    wk = Window.orderBy("n_tokens", "source")
    r = caps.select(
        "source",
        "n_tokens",
        F.row_number().over(wk).alias("k"),
        F.coalesce(
            F.sum("n_tokens").over(wk.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("p_prev"),
        F.coalesce(F.lag("n_tokens").over(wk), F.lit(0)).alias("cap_prev"),
    )
    cand = r.crossJoin(F.broadcast(tot)).select(
        "*", F.expr("(b - p_prev) DIV (m - k + 1)").alias("lvl")
    )
    lvl = cand.where(
        (F.col("lvl") >= F.col("cap_prev")) & (F.col("lvl") < F.col("n_tokens"))
    ).agg(F.max("lvl").cast("long").alias("level"))
    return caps.crossJoin(F.broadcast(lvl)).select(
        "source",
        "n_tokens",
        "level",
        F.least(F.col("n_tokens"), F.col("level")).cast("long").alias(
            "alloc_tokens"
        ),
        (F.col("n_tokens") <= F.col("level")).alias("at_cap"),
    )


# ---------------------------------------------------------------------------
# greedy debounce (sequential fold — applyInPandas + recursive-CTE oracle)
# ---------------------------------------------------------------------------

_DEBOUNCE_GAP_US = 43_200_000_000  # 12 hours

_DEBOUNCE_ORACLE = f"""
WITH RECURSIVE ev AS (  -- one row per (user, µs): deterministic eid on ties
  SELECT user_id, epoch_us(ts) AS us, MIN(event_id) AS eid
  FROM events GROUP BY user_id, epoch_us(ts)
),
kept AS (
  SELECT user_id, MIN(us) AS us FROM ev GROUP BY user_id
  UNION ALL
  SELECT k.user_id,
         (SELECT MIN(e.us) FROM ev e
          WHERE e.user_id = k.user_id
            AND e.us >= k.us + {_DEBOUNCE_GAP_US}) AS us
  FROM kept k
  WHERE (SELECT MIN(e.us) FROM ev e
         WHERE e.user_id = k.user_id
           AND e.us >= k.us + {_DEBOUNCE_GAP_US}) IS NOT NULL
)
SELECT kept.user_id, CAST(kept.us AS BIGINT) AS kept_us,
       CAST(ev.eid AS BIGINT) AS kept_eid
FROM kept JOIN ev ON ev.user_id = kept.user_id AND ev.us = kept.us
"""


@register("event_debounce_keep_first", oracle=_DEBOUNCE_ORACLE)
def event_debounce_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy debounce: keep an event iff at least 12 h passed since
    the user's last KEPT event. The chain is data-dependent state
    (last kept µs), which — unlike CUSUM's prefix-sum closed form or
    sessionization's lag-gap flags — has NO window/closed-form SQL
    equivalent: keeping event i changes which later events qualify.
    This is the canonical case (b) operator of the build brief: a
    grouped ``applyInPandas`` fold on the Spark side (per-user O(1)
    state, Arrow-batched groups), a recursive CTE on the oracle side.
    Batch twin of streaming_rate_limiter's token-bucket state.

    100-TB shape: one shuffle on user_id; per-user fold is linear in
    that user's events with constant state — the same distribution
    argument as the stateful streaming operators, minus the
    micro-batch machinery.

    Scale bound: the only arithmetic is epoch-µs + 4.32·10¹⁰ (int64
    wraps ~year 294000); ties are pre-collapsed to one row per
    (user, µs) with MIN(event_id) on both engines.

    r12 (guide §4.2, the applyinpandas_minmax_scale device): the
    grouped map is keyed on the deterministic bucket
    pmod(user_id, 4·defaultParallelism), not raw user_id — one Python
    call + one pandas-frame construction per BUCKET instead of per
    user (a per-entity call count that tracks entity count, not data
    size). The fold inside walks the bucket sorted by (user_id, µs)
    and resets its last-kept state at each user boundary — per-user
    chains never see each other, so the output is grouping-invariant
    (pinned by test_bucketed_debounce_matches_per_user_grouping)."""
    import pandas as pd

    ev = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", F.unix_micros("ts").alias("us"))
        .agg(F.min("event_id").alias("eid"))
    )

    gap = _DEBOUNCE_GAP_US
    n_buckets = 4 * spark.sparkContext.defaultParallelism

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "us"])
        us = pdf["us"].to_numpy()
        eid = pdf["eid"].to_numpy()
        uid = pdf["user_id"].to_numpy()
        kept_uid, kept_us, kept_eid = [], [], []
        last_uid = None
        last = 0
        for i in range(len(us)):
            u = int(us[i])
            cur = int(uid[i])
            if cur != last_uid or u - last >= gap:
                kept_uid.append(cur)
                kept_us.append(u)
                kept_eid.append(int(eid[i]))
                last_uid = cur
                last = u
        return pd.DataFrame(
            {
                "user_id": kept_uid,
                "kept_us": kept_us,
                "kept_eid": kept_eid,
            }
        )

    return (
        ev.withColumn("__b", F.pmod(F.col("user_id"), F.lit(n_buckets)))
        .groupBy("__b")
        .applyInPandas(fold, schema="user_id long, kept_us long, kept_eid long")
    )
