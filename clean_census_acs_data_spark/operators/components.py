"""Connected components over the near-duplicate pair graph — the step
that turns pairwise dedup verdicts into canonical-document clusters
(every large-scale dedup pipeline ends with this: group near-dup pairs
into components, keep one representative per component).

Algorithm: min-label propagation. Every vertex starts labeled with its
own id; each round it takes the min of its label and its neighbors'
labels; at fixpoint every vertex in a component carries the component's
minimum id. Deterministic by construction (min is order-free), so the
result is oracle-checkable against a recursive-CTE transitive closure.

Scale notes: each round is one join + one aggregation on the edge list
(shuffle keyed by vertex). Rounds needed = graph diameter — near-dup
components are tiny and star-shaped (an original and its variants), so
2-3 rounds suffice. For adversarial graphs (long chains) the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond") halves diameter per round; this
implementation keeps the simple form and caps iterations explicitly,
failing loudly rather than silently returning a non-fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """(vertex, component) for every vertex in ``edges``; component id =
    min vertex id reachable. Vertices not in any edge are absent (they
    are trivially their own component)."""
    # undirected: materialize both directions once; cached because every
    # iteration re-joins against it
    adj = (
        edges.select(F.col(src).alias("v"), F.col(dst).alias("w"))
        .union(edges.select(F.col(dst).alias("v"), F.col(src).alias("w")))
        .distinct()
        .cache()
    )
    # localCheckpoint, not cache: every iteration references `labels`
    # twice (propagation join + convergence diff), so with plain caching
    # the LOGICAL plan doubles per round — by round ~20 the optimizer
    # itself OOMs. Checkpointing truncates lineage each round, keeping
    # the plan O(1) per iteration — the mandatory discipline for any
    # iterative DataFrame algorithm. (On a cluster with HDFS you may
    # prefer reliable .checkpoint(); localCheckpoint keeps blocks on
    # executors, which is fine for a convergence loop that rebuilds
    # cheaply on failure.)
    labels = (
        adj.select("v").distinct().select("v", F.col("v").alias("label"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iters):
        # min label among neighbors
        neighbor_min = (
            adj.join(labels.withColumnRenamed("v", "w2"), adj.w == F.col("w2"))
            .groupBy("v")
            .agg(F.min("label").alias("nlabel"))
        )
        cand = labels.join(neighbor_min, "v", "left").select(
            "v",
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
        )
        # pointer jumping (path compression): label[v] ← label[label[v]].
        # Plain neighbor propagation needs diameter rounds — a chain of
        # 10^4 hops would need 10^4 shuffles at 100 TB; with the jump the
        # label skips to its label's label each round → O(log diameter).
        lookup = labels.select(
            F.col("v").alias("lv"), F.col("label").alias("llabel")
        )
        new_labels = (
            cand.join(lookup, cand.label == F.col("lv"), "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce("llabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iters} rounds")

    adj.unpersist()
    return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("component_id"))
