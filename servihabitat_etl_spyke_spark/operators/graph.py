"""Iterative graph algorithms over pair/edge tables (the family next to
``dedup.connected_components``): PageRank power iteration and degree
statistics. Used in curation for centrality-weighted canonical selection
and domain-authority scoring — a page linked (or near-duplicated) by many
others is usually the version worth keeping.

Scale shape: one edge-keyed join + one destination-keyed aggregation per
iteration (the standard Pregel-without-Pregel dataflow); lineage is
truncated per round with localCheckpoint so the plan stays flat. Dangling
vertices (no out-edges) redistribute their mass globally, as the original
formulation requires — skipping that loses rank mass and the vector stops
summing to 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degrees(edges: DataFrame, id_a: str = "id_a",
            id_b: str = "id_b") -> DataFrame:
    """(vertex, degree) over the undirected view of an edge list."""
    both = (edges.select(F.col(id_a).alias("v"))
            .union(edges.select(F.col(id_b).alias("v"))))
    return both.groupBy("v").agg(F.count("*").alias("degree"))


def pagerank(edges: DataFrame, damping: float = 0.85, iters: int = 10,
             id_a: str = "id_a", id_b: str = "id_b",
             directed: bool = False,
             checkpoint_every: int = 4) -> DataFrame:
    """PageRank by power iteration. Returns (v, rank); ranks sum to 1.

    ``directed=False`` (the near-dup/kNN-graph case) mirrors every edge.
    Per iteration: contributions = rank/out_degree flowing along edges
    (join on source, aggregate on destination), plus the damped teleport
    term and the dangling-mass redistribution. Vertices with no in-edges
    keep the floor rank. Floating-point sums ARE fold-order dependent
    across partitionings (quantize downstream outputs; tests compare
    against a local power iteration with tolerance).

    ``checkpoint_every`` trades lineage depth for job count. With the
    dangling subplan skipped in the (common) undirected case there is no
    double-execution penalty for deeper intervals, and interval 4
    measures ~30% faster than per-round truncation; directed graphs
    with dangling mass re-execute up to ``checkpoint_every - 1`` prior
    rounds inside the 1-row dangling aggregate, so pass 1 there if the
    dangling set is large."""
    e = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    if not directed:
        e = e.union(edges.select(F.col(id_b).alias("src"),
                                 F.col(id_a).alias("dst")))
    e = e.distinct().localCheckpoint()
    # Size the iterative loop's parallelism to the edge table: the
    # default shuffle width (cores) costs a fixed per-task overhead
    # every iteration, which dominates when each partition would hold
    # only a few hundred edges. ~64k edges/partition keeps tasks
    # meaningfully sized; at 100 TB the count scales right back up.
    n_edges = e.count()
    width = max(1, min(e.sparkSession.sparkContext.defaultParallelism,
                       n_edges // 65536 + 1))
    e = e.repartition(width, "src").localCheckpoint()

    verts = (e.select(F.col("src").alias("v"))
             .union(e.select(F.col("dst").alias("v")))
             .distinct().repartition(width, "v").localCheckpoint())
    n = verts.count()
    if n == 0:
        # derive v's type from the input so the empty frame unions/joins
        # cleanly with non-empty runs (string doc-ids would otherwise
        # come back bigint on the empty day only)
        return (verts.select("v")
                .withColumn("rank", F.lit(0.0)).limit(0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("_deg"))

    # In the mirrored (undirected) graph every vertex appears as a src,
    # so the dangling set is empty by construction and its whole subplan
    # (anti-join + 1-row aggregate + broadcast, per iteration) can be
    # skipped without changing a single rank.
    has_dangling = directed

    ranks = verts.select("v", F.lit(1.0 / n).alias("rank"))
    for it in range(iters):
        contribs = (e.join(ranks.withColumnRenamed("v", "src"), "src")
                    .join(out_deg, "src")
                    .select("dst",
                            (F.col("rank") / F.col("_deg")).alias("_c"))
                    .groupBy("dst").agg(F.sum("_c").alias("_in")))
        new_ranks = (verts.join(contribs.withColumnRenamed("dst", "v"),
                                "v", "left"))
        if has_dangling:
            # Dangling vertices (no out-edges) teleport their whole rank.
            # The 1-row aggregate joins in as a broadcast nested-loop —
            # one lazy plan per iteration, no driver action besides the
            # final localCheckpoint that truncates lineage anyway.
            dangling = (ranks.join(out_deg.withColumnRenamed("src", "v"),
                                   "v", "left_anti")
                        .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                             .alias("_dm")))
            ranks = (new_ranks.join(F.broadcast(dangling))
                     .select("v",
                             (F.lit((1.0 - damping) / n)
                              + F.lit(damping) * F.col("_dm")
                              / F.lit(float(n))
                              + F.lit(damping)
                              * F.coalesce("_in", F.lit(0.0)))
                             .alias("rank")))
        else:
            ranks = new_ranks.select(
                "v",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping)
                 * F.coalesce("_in", F.lit(0.0))).alias("rank"))
        if it % checkpoint_every == checkpoint_every - 1 or it == iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks
