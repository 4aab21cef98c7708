"""Round-8 tier D: governance reporting over the dedup pipeline's own
outputs — Venn contamination, per-source impact, LSH parameter sweep.

- ``three_source_overlap_venn`` — exact fingerprint Venn counts for
  three sources (membership-bitmask aggregation): the triage view
  behind pairwise contamination (cross_source_fp_overlap) when three
  feeds republish each other.
- ``dedup_impact_report``      — per-source what-dedup-would-delete:
  docs flagged, docs removed (non-survivors), characters removed,
  removal rate in micro-units. THE stakeholder report of a dedup run.
- ``lsh_parameter_sweep``      — candidate count, verified count, and
  precision for three bandings (2×4, 4×2, 8×1) of the SAME 8-hash
  signature table: the measured tuning matrix behind the b·r
  threshold folklore ((1/b)^(1/r) sweet spots), computed from one
  signature pass.

Reference tie: the reference implements none of this tier (SURVEY.md
§2B marks the category ABSENT) — BASELINE.json extension operators
under the repo's exact-integer / portable-hash discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table, spread
from clean_census_acs_data_spark.operators import dedup as D
from clean_census_acs_data_spark.operators import text as X
from clean_census_acs_data_spark.queries import register
from clean_census_acs_data_spark.queries_ext import H15, _PLANTED_DOCS, _SHINGLES
from clean_census_acs_data_spark.queries_round3c import _SURVIVOR_ORACLE


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# three-source fingerprint Venn
# ---------------------------------------------------------------------------

_VENN_SOURCES = ("src0", "src1", "src2")

_VENN_ORACLE = f"""
WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS t
             FROM documents
             WHERE source IN ('{_VENN_SOURCES[0]}', '{_VENN_SOURCES[1]}', '{_VENN_SOURCES[2]}')
               AND len(string_split(text, ' ')) >= 3),
sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(1, len(t) - 1),
                       i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS sh
  FROM tok
),
fp AS (
  SELECT DISTINCT source, fp FROM (
    SELECT source,
           unnest(list_filter(list_transform(sh, s -> {H15.format(x="s")}),
                              h -> h % 8 = 0)) AS fp
    FROM sh
  )
),
mask AS (
  SELECT fp,
         CAST(MAX(CASE WHEN source = '{_VENN_SOURCES[0]}' THEN 1 ELSE 0 END)
            + MAX(CASE WHEN source = '{_VENN_SOURCES[1]}' THEN 2 ELSE 0 END)
            + MAX(CASE WHEN source = '{_VENN_SOURCES[2]}' THEN 4 ELSE 0 END)
           AS BIGINT) AS membership_mask
  FROM fp GROUP BY fp
)
SELECT membership_mask, CAST(COUNT(*) AS BIGINT) AS n_fps
FROM mask GROUP BY membership_mask
"""


@register("three_source_overlap_venn", oracle=_VENN_ORACLE)
def three_source_overlap_venn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Venn-region counts of winnowing fingerprints across three
    sources: each distinct fingerprint gets a membership bitmask
    (bit i = present in source i) and the 7 regions are one group-by.
    Pairwise overlap (cross_source_fp_overlap) cannot distinguish
    "A copies B and B copies C" from "one document syndicated to all
    three" — mask 7 vs masks 3+6 does, which changes the dedup
    priority order.

    Shape: fingerprint table distinct-reduced per source, one
    fp-keyed agg to fold the bitmask (MAX of indicator per source —
    order-insensitive), one ≤7-row count. At 100 TB this reads the
    persisted fingerprint store; nothing touches raw text twice."""
    d = spread(
        _t(spark, sf_dir, "documents").where(F.col("source").isin(*_VENN_SOURCES))
    )
    toks = X.tokens("text")
    fps = F.filter(
        F.transform(X.shingles(toks, 3), X.md5_long), lambda h: h % 8 == 0
    )
    fp = (
        d.where(F.size(F.split(F.col("text"), " ")) >= 3)
        .select("source", F.explode(fps).alias("fp"))
        .distinct()
    )
    mask = fp.groupBy("fp").agg(
        (
            F.max(F.when(F.col("source") == _VENN_SOURCES[0], 1).otherwise(0))
            + F.max(F.when(F.col("source") == _VENN_SOURCES[1], 2).otherwise(0))
            + F.max(F.when(F.col("source") == _VENN_SOURCES[2], 4).otherwise(0))
        )
        .cast("long")
        .alias("membership_mask")
    )
    return mask.groupBy("membership_mask").agg(
        F.count(F.lit(1)).cast("long").alias("n_fps")
    )


# ---------------------------------------------------------------------------
# per-source dedup impact report
# ---------------------------------------------------------------------------

_IMPACT_ORACLE = f"""
WITH sv AS ({_SURVIVOR_ORACLE.strip()}),
j AS (
  SELECT d.source, d.doc_id, length(d.text) AS n_chars,
         sv.is_survivor
  FROM documents d LEFT JOIN sv ON sv.doc_id = d.doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN is_survivor IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(SUM(CASE WHEN is_survivor = false THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(SUM(CASE WHEN is_survivor = false THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_removed,
       CAST(SUM(CASE WHEN is_survivor = false THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS removal_rate_micro
FROM j GROUP BY source
"""


@register("dedup_impact_report", oracle=_IMPACT_ORACLE)
def dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What dedup would delete, per source: documents flagged as
    near-dup cluster members, documents that lose survivor selection
    (longest-text, lowest-id canonical — dedup_survivor_selection's
    rule), characters those losers carry, and the integer-micro
    removal rate. The report a corpus owner reads BEFORE approving the
    deletion pass, and the per-source accountability trail afterwards
    (a source with an outsized removal rate is republishing others —
    cross_source_fp_overlap names whom).

    Composition, not recomputation: cluster labels come from the
    session-cached standard components, survivor selection is one
    window over the cluster-sized join, and the per-source rollup
    joins back to documents on the 8-byte doc id. Planted test dups
    (ids ≥ 1e6) fall out of the LEFT join automatically since only
    original ids exist in documents."""
    from pyspark.sql import Window

    docs_planted = D.plant_near_dups(_t(spark, sf_dir, "documents"))
    comp = D.standard_components(spark, sf_dir)
    lens = docs_planted.select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    w = Window.partitionBy("component_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    sv = (
        comp.join(lens, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", (F.col("rn") == 1).alias("is_survivor"))
    )
    d = _t(spark, sf_dir, "documents").select(
        "source", "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    j = d.join(sv, "doc_id", "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("is_survivor").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum(F.when(F.col("is_survivor") == False, 1).otherwise(0))  # noqa: E712
        .cast("long")
        .alias("n_removed"),
        F.sum(F.when(F.col("is_survivor") == False, F.col("n_chars")).otherwise(0))  # noqa: E712
        .cast("long")
        .alias("chars_removed"),
        F.expr(
            "cast(sum(case when is_survivor = false then 1 else 0 end) * 1000000"
            " div count(*) as long)"
        ).alias("removal_rate_micro"),
    )


# ---------------------------------------------------------------------------
# LSH banding parameter sweep
# ---------------------------------------------------------------------------

_SWEEP_CONFIGS = ((2, 4), (4, 2), (8, 1))  # (bands, rows per band)


def _sweep_oracle() -> str:
    from clean_census_acs_data_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_M,
    )

    sig_cols = ", ".join(
        f"list_min(list_transform(hv, x -> ({MINHASH_A[i]} * x + {MINHASH_B[i]})"
        f" % {MINHASH_M})) AS mh{i}"
        for i in range(8)
    )
    blocks = []
    for bands, rpb in _SWEEP_CONFIGS:
        band_union = " UNION ALL ".join(
            "SELECT doc_id, {b} AS band_id, {key} AS band_key FROM sig".format(
                b=b,
                key=" || '#' || ".join(
                    f"mh{b * rpb + r}" for r in range(rpb)
                ),
            )
            for b in range(bands)
        )
        blocks.append(
            f"""
SELECT {bands} AS bands, CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_verified,
       CAST(SUM(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS precision_micro
FROM (
  SELECT cand.doc_a, cand.doc_b,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))
              AS DOUBLE) AS jaccard
  FROM (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM ({band_union}) a JOIN ({band_union}) b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
  ) cand
  JOIN sh sa ON sa.doc_id = cand.doc_a
  JOIN sh sb ON sb.doc_id = cand.doc_b
)"""
        )
    return f"""
WITH base AS ({_PLANTED_DOCS}),
tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM base),
sh AS ({_SHINGLES}),
hv AS (
  SELECT doc_id, sh,
         list_transform(sh, s -> {H15.format(x="s")} % {MINHASH_M}) AS hv
  FROM sh
),
sig AS (SELECT doc_id, {sig_cols} FROM hv)
{" UNION ALL ".join(blocks)}
"""


@register("lsh_parameter_sweep", oracle=_sweep_oracle())
def lsh_parameter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH tuning matrix, measured: the SAME 8-minhash signature
    table banded three ways — 2 bands × 4 rows (high precision, low
    recall), 4 × 2 (the registry default), 8 × 1 (high recall, noisy)
    — with candidate count, verified-pair count (exact Jaccard ≥ 0.5)
    and integer-micro precision per configuration. The (1−(1−s^r)^b)
    S-curve is folklore; this is the number for THIS corpus, from one
    signature pass (signatures and shingle sets are cached and shared
    by all three bandings, so the sweep costs three bucket self-joins
    over collision-sized tables, not three corpus scans).

    Output is 3 rows keyed by bands — the table you consult before
    changing dedup_minhash_lsh's parameters, alongside
    near_dup_jaccard_histogram (threshold calibration) and
    dedup_pair_provenance (per-pair margins).

    r12 shape (guide §1.2 step 1, §2.4): the three bandings NEST — a
    collision on a 4-row band implies collisions on both of its 2-row
    sub-bands, which imply collisions on each constituent 1-row band —
    so candidates(2×4) ⊆ candidates(4×2) ⊆ candidates(8×1). The sweep
    therefore runs ONE banding self-join (the 8×1 superset, with both
    docs' full signatures carried through the join), derives each
    config's membership as a per-pair signature predicate, runs the
    exact-Jaccard verify ONCE over the superset, and reads all three
    configs' counts off a single conditional aggregate. The previous
    form ran two banding self-joins plus two shingle-verify joins plus
    a third aggregation over the memoized default-banding pair table
    — strictly more work over subsets of the same superset."""
    # both stages from the session-shared memos (round 9): the sweep
    # used to build private plan-identical caches of the shingle and
    # signature tables — cheap-looking only while CacheManager
    # substituted an earlier entry's live copy; per-entry cache reaping
    # exposed the recompute. The memos are already eagerly materialized,
    # so the superset self-join below reads, never recomputes.
    sh_tbl = D.standard_shingle_table(spark, sf_dir)
    sig = D.standard_minhash_signatures(spark, sf_dir)
    mh_arr = F.array(*[F.col(f"mh{i}") for i in range(8)])
    # 8×1 banding on the raw int64 minhash value (the concat_ws('#')
    # string key of a 1-row band is bijective with it)
    banded = sig.select(
        "doc",
        mh_arr.alias("sig"),
        F.posexplode(mh_arr).alias("band_id", "band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )

    def _band_hit(rpb: int, band: int):
        eqs = [
            F.col("sig_a").getItem(band * rpb + r)
            == F.col("sig_b").getItem(band * rpb + r)
            for r in range(rpb)
        ]
        out = eqs[0]
        for e in eqs[1:]:
            out = out & e
        return out

    def _any_band(rpb: int, bands: int):
        out = _band_hit(rpb, 0)
        for band in range(1, bands):
            out = out | _band_hit(rpb, band)
        return out

    sa = sh_tbl.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh_tbl.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    ver = cand.join(sa, "doc_a").join(sb, "doc_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    union = F.size("sh_a").cast("long") + F.size("sh_b").cast("long") - inter
    jac = inter.cast("double") / union.cast("double")
    flat = ver.select(
        _any_band(4, 2).alias("in2"),
        _any_band(2, 4).alias("in4"),
        jac.alias("jaccard"),
    )
    # per-config aggregate semantics mirror the old per-config frames
    # exactly, including the empty-candidate edge: n_candidates was a
    # COUNT (0 when empty — hence the coalesce), n_verified a SUM
    # (NULL when empty — hence when() WITHOUT otherwise, so a config
    # with zero candidate rows sums no inputs and stays NULL)
    hit = F.when(F.col("jaccard") >= 0.5, 1).otherwise(0)
    stats = flat.agg(
        F.count(F.lit(1)).cast("long").alias("n8"),
        F.sum(hit).cast("long").alias("v8"),
        F.coalesce(F.sum(F.when(F.col("in4"), 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n4"),
        F.sum(F.when(F.col("in4"), hit)).cast("long").alias("v4"),
        F.coalesce(F.sum(F.when(F.col("in2"), 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("in2"), hit)).cast("long").alias("v2"),
    )

    def _row(bands: int, n: str, v: str):
        return F.struct(
            F.lit(bands).cast("long").alias("bands"),
            F.col(n).alias("n_candidates"),
            F.col(v).alias("n_verified"),
            F.expr(f"cast({v} * 1000000 div {n} as long)").alias(
                "precision_micro"
            ),
        )

    return (
        stats.select(
            F.explode(
                F.array(_row(2, "n2", "v2"), _row(4, "n4", "v4"), _row(8, "n8", "v8"))
            ).alias("r")
        ).select("r.*")
    )
