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
    labels = adj.select("v").distinct().select("v", F.col("v").alias("label")).cache()
    labels.count()  # materialize before the loop

    for _ in range(max_iters):
        # min label among neighbors
        neighbor_min = (
            adj.join(labels.withColumnRenamed("v", "w2"), adj.w == F.col("w2"))
            .groupBy("v")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "v", "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iters} rounds")

    adj.unpersist()
    return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("component_id"))
