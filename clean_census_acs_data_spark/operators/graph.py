"""Join-based graph analytics over edge DataFrames.

The companion of operators/components.py (iterative connectivity):
these are the ONE-SHOT graph metrics that reduce to self-joins, so
Catalyst plans them like any relational query — no iteration, no
driver-side graph structure.

Edges are canonical undirected pairs (src < dst, deduplicated).
Triangle counting is the textbook two-hop join-and-close: its shuffle
volume is Σ_v deg(v)² in the worst case, so at 100 TB the standard
mitigation applies — orient edges from lower- to higher-degree
endpoints before joining, which bounds the expansion by O(m^1.5)
(documented here; at near-dup-graph densities the canonical id
orientation is already adequate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def graph_summary(
    edges: DataFrame, *, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """One-row (n_nodes, n_edges, n_triangles) summary of an undirected
    graph given canonical (src < dst) edges — the density/clustering
    profile of a near-dup pair graph: triangles mean clusters, not
    chance collisions.

    Three independent aggregates crossed into one row (each is a
    partial-agg or join that shrinks before shuffling):
    - nodes: distinct over the union of both endpoint columns
    - edges: plain count
    - triangles: e1(a,b) ⋈ e2(b,c) on the shared middle vertex, closed
      against e3(a,c); a<b<c holds by canonical edge order, so every
      triangle counts exactly once.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    n_nodes = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .agg(F.count_distinct("v").alias("n_nodes"))
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return n_nodes.crossJoin(n_edges).crossJoin(tri)
