"""Equivalence pins for the round-13 optimization rewrites.

Each test rebuilds the REPLACED form verbatim and asserts the live
entry's output matches it exactly — the same discipline as
tests/test_r12_optimizations.py: an optimization may change the plan,
never the rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_hodges_groupedmap_matches_jvm_inrow_fold(spark):
    """r13: hodges_lehmann_location's Walsh-median kernel moved from a
    nested transform/slice JVM fold (interpreted HOF, ~17 µs/element)
    to a numpy grouped map (np.add.outer upper triangle + np.partition
    lower-median select). The replaced r12 JVM form is rebuilt verbatim
    here; outputs must match exactly — same pair count, same selected
    sum, same float division."""
    c = load_table(spark, SF_DIR, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    g = c.groupBy("nk").agg(F.collect_list("cents").alias("cs"))
    n = F.size("cs")
    walsh = F.flatten(
        F.transform(
            "cs",
            lambda x, i: F.transform(
                F.slice("cs", i + 1, n - i), lambda y: x + y
            ),
        )
    )
    np_ = (n.cast("long") * (n.cast("long") + 1) / 2).cast("long")
    s = F.element_at(F.array_sort(walsh), ((np_ + 1) / 2).cast("int"))
    old = g.select(
        F.col("nk").alias("nation_key"),
        np_.alias("n_walsh_pairs"),
        s.cast("long").alias("hl_doubled_cents"),
        (s.cast("double") / 2).alias("hl_location_cents"),
    )
    new = QUERIES["hodges_lehmann_location"](spark, SF_DIR)
    # name+type identity (nullability may differ: a grouped-map stage
    # declares nullable fields; the driver's schema gate compares
    # pandas dtype kinds, which are nullability-blind)
    assert [(f.name, f.dataType) for f in new.schema.fields] == [
        (f.name, f.dataType) for f in old.schema.fields
    ]
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))
