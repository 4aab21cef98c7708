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
    applyInPandas path: each user's rows arrive as one Arrow-backed
    pandas frame, are scaled to integer micro-units against the
    group's own min/max, and return as a frame. The SQL twin (window
    min/max + the same floored integer expression) proves the Arrow
    hop is lossless.

    This is the degenerate-group hazard surface of the Pandas API —
    one giant user means one giant pandas frame, which is exactly why
    the registry's default normalization (winsorize_clip,
    quality_percentile_filter) uses windows instead; the entry exists
    to cover the API with honest semantics, and its docstring is the
    warning label. Scaling itself is integer-floored so engines cannot
    drift.

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
        # numpy throughout (this runs once per USER: pandas Series ops
        # and frame construction constants dominate — the sessionizer's
        # measured construction trick, applied to the grouped-map path)
        cents = pdf["cents"].to_numpy()
        mn, mx = int(cents.min()), int(cents.max())
        if mx == mn:
            s = np.zeros(len(cents), dtype=np.int64)
        else:
            s = (cents - mn) * 1_000_000 // (mx - mn)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "scaled_micro": s.astype(np.int64),
            },
            copy=False,
        )

    e = spread(_t(spark, sf_dir, "events")).select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return e.groupBy("user_id").applyInPandas(scale, schema)


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
    cogrouped applyInPandas path: each user's click frame and purchase
    frame arrive together (the Pandas API's two-sided custom join
    surface), and the function counts clicks preceding the first
    purchase — a stand-in for any custom merge logic (as-of matching,
    churn windows) that relational operators also express, which is
    precisely what lets the SQL twin hash-check the Arrow hop.

    Cogroup shuffles both sides on the user key once — the same
    exchange a join would pay; all arithmetic is integer counts, so
    there is nothing for the two runtimes to disagree on. Users
    present on either side appear (full-outer cogroup semantics).

    Scale bound: µs values are compared, never multiplied or cross-row summed; per-user counts are int64 row counts."""
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
        (uid,) = key
        n_c, n_p = len(clicks), len(purchases)
        if n_p:
            first = purchases["us"].to_numpy().min()
            before = int((clicks["us"].to_numpy() < first).sum()) if n_c else 0
        else:
            before = 0
        # 1-element numpy construction (the sessionizer's measured
        # 388→143 µs trick) — this function runs once per USER, so the
        # frame-construction constant IS the entry's dominant cost
        return pd.DataFrame(
            {
                "user_id": np.array([uid], dtype=np.int64),
                "n_clicks": np.array([n_c], dtype=np.int64),
                "n_purchases": np.array([n_p], dtype=np.int64),
                "clicks_before_first_purchase": np.array(
                    [before], dtype=np.int64
                ),
            },
            copy=False,
        )

    ev = _t(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    return (
        c.groupBy("user_id")
        .cogroup(p.groupBy("user_id"))
        .applyInPandas(stats, schema)
    )
