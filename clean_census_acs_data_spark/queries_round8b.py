"""Round-8 tier B: the two grouped Pandas API surfaces not yet
exercised by the registry — applyInPandas (grouped map) and
cogroup().applyInPandas (grouped co-map). Both compute integer-exact
results so the Arrow path sits under the same hash gate as everything
else (pandas_weighted_median covers grouped-AGG, udtf_tokenize the
UDTF path, multimodal the mapInPandas/mapInArrow paths — this
completes the Pandas-API matrix from SURVEY §2B's UDF/UDAF/UDTF row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from clean_census_acs_data_spark.io import load_table, spread
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# applyInPandas grouped map: per-user min-max scaling
# ---------------------------------------------------------------------------

_MINMAX_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         MIN(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS mn,
         MAX(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS mx
  FROM events WINDOW w AS (PARTITION BY user_id)
)
SELECT event_id, user_id,
       CAST(CASE WHEN mx = mn THEN 0
                 ELSE (cents - mn) * 1000000 // (mx - mn) END AS BIGINT)
         AS scaled_micro
FROM e
"""


@register("applyinpandas_minmax_scale", oracle=_MINMAX_ORACLE)
def applyinpandas_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user min-max feature scaling THROUGH the grouped-map
    applyInPandas path, grouped by a deterministic USER BUCKET rather
    than the raw user id (r12, guide §4.2/§4.5): grouping by user_id
    invoked the Python function once per user, and at scale the call
    count tracks the entity count, not the data size. Bucketing
    pmod(user_id, 4·cores) hands each call a batch of users at once
    and the per-user min/max moves inside as ONE vectorized pandas
    groupby-transform — same floored integer expression, bit-identical
    output, exactly 4·cores Python calls regardless of user count.
    The SQL twin (window min/max + the same floored integer
    expression) proves the Arrow hop is lossless either way.

    The bucket count derives from defaultParallelism (scale-adaptive:
    4 waves per core at any cluster size, never a constant tuned to
    one box); results are bucket-count-invariant because every user's
    rows still land in exactly one group.

    Grouping by the raw entity id remains the degenerate-group hazard
    surface of this API (one giant user = one giant frame — why the
    registry's default normalization uses windows); bucketing bounds
    the hazard only as long as buckets stay balanced, which
    pmod over ~uniform user ids gives.

    Scale bound: (cents − mn)·1e6 wraps int64 at a per-group value range ≥ 9.2e12 cents (~$9·10¹⁰) — widen to object/Decimal in the pandas fn if a book ever spans that."""
    import pandas as pd

    schema = StructType(
        [
            StructField("event_id", LongType(), False),
            StructField("user_id", LongType(), False),
            StructField("scaled_micro", LongType(), False),
        ]
    )

    import numpy as np

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = pdf["cents"].to_numpy()
        g = pdf.groupby("user_id")["cents"]
        mn = g.transform("min").to_numpy()
        rng = g.transform("max").to_numpy() - mn
        # (cents - mn) ≥ 0, so // matches the SQL twin's floor division;
        # rng == 0 groups scale to 0 exactly as the per-user form did
        s = np.where(rng == 0, 0, (cents - mn) * 1_000_000 // np.where(rng == 0, 1, rng))
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "scaled_micro": s.astype(np.int64),
            },
            copy=False,
        )

    n_buckets = spark.sparkContext.defaultParallelism * 4
    e = spread(_t(spark, sf_dir, "events")).select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.pmod(F.col("user_id"), F.lit(n_buckets)).alias("__bucket"),
    )
    return e.groupBy("__bucket").applyInPandas(scale, schema)


# ---------------------------------------------------------------------------
# cogroup().applyInPandas: per-user click/purchase interleave stats
# ---------------------------------------------------------------------------

_COGROUP_ORACLE = """
WITH c AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
u AS (SELECT user_id FROM c UNION SELECT user_id FROM p),
st AS (
  SELECT u.user_id,
         (SELECT COUNT(*) FROM c WHERE c.user_id = u.user_id) AS n_clicks,
         (SELECT COUNT(*) FROM p WHERE p.user_id = u.user_id) AS n_purchases,
         (SELECT MIN(us) FROM p WHERE p.user_id = u.user_id) AS first_purchase_us
  FROM u
)
SELECT user_id, CAST(n_clicks AS BIGINT) AS n_clicks,
       CAST(n_purchases AS BIGINT) AS n_purchases,
       CAST(CASE WHEN first_purchase_us IS NULL THEN 0
            ELSE (SELECT COUNT(*) FROM c
                  WHERE c.user_id = st.user_id AND c.us < st.first_purchase_us)
            END AS BIGINT) AS clicks_before_first_purchase
FROM st
"""


@register("cogroup_click_purchase_stats", oracle=_COGROUP_ORACLE)
def cogroup_click_purchase_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user click/purchase interleave statistics THROUGH the
    cogrouped applyInPandas path: each bucket's click frame and
    purchase frame arrive together (the Pandas API's two-sided custom
    join surface), and the function counts clicks preceding each
    user's first purchase — a stand-in for any custom merge logic
    (as-of matching, churn windows) that relational operators also
    express, which is precisely what lets the SQL twin hash-check the
    Arrow hop.

    r12 (guide §4.2/§4.5): cogrouping on the raw user id invoked the
    Python function once per user — a per-entity call count whose
    1-row frame-construction constant dominated the entry. The
    cogroup key is now the deterministic bucket pmod(user_id,
    4·cores); both sides of each bucket arrive as one frame pair and
    the per-user logic is vectorized pandas groupby/reindex inside —
    integer-identical outputs, exactly 4·cores Python calls at any
    user count. Cogroup still shuffles both sides once, now on the
    bucket key. Users present on either side appear (the reindex over
    the union of per-side key sets preserves full-outer semantics).

    Scale bound: µs values are compared, never multiplied or cross-row summed; per-user counts are int64 row counts. The first-purchase map rides a float64 hop, exact for epochs < 2^53 µs (~year 2255); switch to an int64 merge if the horizon ever matters."""
    import pandas as pd

    schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("n_clicks", LongType(), False),
            StructField("n_purchases", LongType(), False),
            StructField("clicks_before_first_purchase", LongType(), False),
        ]
    )

    import numpy as np

    def stats(key, clicks: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
        # a bucket absent from one side arrives as an EMPTY frame that
        # can be column-less (no Arrow schema for the missing side) —
        # normalize so the vectorized path below sees typed columns
        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "us": pd.Series(dtype=np.int64),
            }
        )
        if "user_id" not in clicks.columns:
            clicks = empty
        if "user_id" not in purchases.columns:
            purchases = empty
        n_c = clicks.groupby("user_id").size()
        pg = purchases.groupby("user_id")["us"]
        n_p = pg.size()
        first = pg.min()
        users = n_c.index.union(n_p.index)
        # clicks strictly before the user's first purchase; users with
        # no purchase stay False. The map's float64 hop is exact for
        # µs < 2^53 (year ~2255) — noted in the scale bound below
        f = clicks["user_id"].map(first)
        valid = f.notna().to_numpy()
        before_mask = np.zeros(len(clicks), dtype=bool)
        before_mask[valid] = (
            clicks["us"].to_numpy()[valid] < f.to_numpy()[valid].astype(np.int64)
        )
        before = (
            pd.Series(before_mask, index=clicks.index)
            .groupby(clicks["user_id"])
            .sum()
            .reindex(users, fill_value=0)
        )
        return pd.DataFrame(
            {
                "user_id": users.to_numpy(dtype=np.int64),
                "n_clicks": n_c.reindex(users, fill_value=0).to_numpy(dtype=np.int64),
                "n_purchases": n_p.reindex(users, fill_value=0).to_numpy(dtype=np.int64),
                "clicks_before_first_purchase": before.to_numpy(dtype=np.int64),
            },
            copy=False,
        )

    n_buckets = spark.sparkContext.defaultParallelism * 4
    ev = _t(spark, sf_dir, "events")
    bucket = F.pmod(F.col("user_id"), F.lit(n_buckets)).alias("__bucket")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("us"), bucket
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("us"), bucket
    )
    return (
        c.groupBy("__bucket")
        .cogroup(p.groupBy("__bucket"))
        .applyInPandas(stats, schema)
    )
