"""Engine-native Datasketches HLL API surface (hll_sketch_agg /
hll_sketch_estimate / hll_union_agg).

The registry entry `hll_partial_merge` used to exercise this API
rows-only; it is now oracle-backed over the repo's deterministic
registers (the Datasketches wire format is Spark-internal, so DuckDB
can never value-check it). These tests keep the native API covered:
the per-source sketches must union into (nearly) the estimate a
direct whole-corpus sketch produces (merge ≈ recompute — the property
that makes sketch state safe to persist per batch and fold at read
time; the union gadget's HLL_8 target type means the fold is not
bit-equal, unlike the repo's deterministic registers where merge ≡
recompute exactly), and estimates must be sane vs exact counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table


def test_hll_union_equals_recompute(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("source", "text")
    per = d.groupBy("source").agg(F.hll_sketch_agg("text").alias("sk"))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    direct = d.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("text")).alias("est")
    ).collect()[0]["est"]
    # not bit-equal (the union gadget re-targets to HLL_8), but the
    # fold must agree with the direct sketch to well under the
    # sketch's own error bound
    assert abs(merged - direct) <= max(2.0, 0.02 * direct), (merged, direct)


def test_hll_estimate_close_to_exact(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("text")
    est = d.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("text")).alias("est")
    ).collect()[0]["est"]
    exact = d.distinct().count()
    # default lgConfigK=12 -> relative error well under 10% at any sf
    assert abs(est - exact) <= max(2.0, 0.1 * exact)
