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
from clean_census_acs_data_spark.session import tracked_cache


def connected_components(
    edges: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(vertex, component) for every vertex in ``edges``; component id =
    min vertex id reachable. Vertices not in any edge are absent (they
    are trivially their own component).

    ``checkpoint_dir``: when set, per-round lineage truncation uses
    *reliable* ``.checkpoint()`` into that directory (HDFS/S3 on a
    cluster) instead of ``localCheckpoint``. localCheckpoint blocks
    live on executors, so one lost executor at hour 3 of a 100-TB job
    kills the query; reliable checkpointing survives executor loss.
    Local default stays localCheckpoint (no FS round-trip)."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        # Checkpointing (either kind) truncates lineage each round: every
        # iteration references `labels` twice (propagation join +
        # convergence diff), so with plain caching the LOGICAL plan
        # doubles per round — by round ~20 the optimizer itself OOMs.
        # O(1) plan per iteration is the mandatory discipline for any
        # iterative DataFrame algorithm.
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # undirected: materialize both directions once; cached because every
    # iteration re-joins against it
    adj = (
        edges.select(F.col(src).alias("v"), F.col(dst).alias("w"))
        .union(edges.select(F.col(dst).alias("v"), F.col(src).alias("w")))
        .distinct()
        .transform(tracked_cache)
    )
    labels = _truncate(
        adj.select("v").distinct().select("v", F.col("v").alias("label"))
    )

    for it in range(max_iters):
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
        )
        new_labels = _truncate(new_labels)
        # Round 1 can't have converged when any edge exists (every
        # edge-touching vertex with a smaller neighbor changes label),
        # so skip its convergence-diff join+count — one fewer driver
        # action per call, paid for only by degenerate empty graphs
        # doing one extra (trivial) round.
        if it == 0:
            labels = new_labels
            continue
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
