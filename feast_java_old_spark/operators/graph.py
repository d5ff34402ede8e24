"""Graph propagation operators.

The reference has no graph surface; this generalizes the one iterative
graph kernel it forced us to build (connected-components over dedup
candidate pairs, ``operators/dedup.py:dedup_components``) into the other
propagation shape a training-data pipeline uses: PageRank-style
importance scoring over an entity graph (e.g. document↔domain or
user↔item interaction graphs) for curation weighting.

Scale design (same contract as ``dedup_components``):

- Edge-partitioned power iteration: each step is one shuffle of the edge
  table keyed by ``src`` (join with the rank frame) and one aggregate
  keyed by ``dst`` — never an adjacency matrix, never driver-side state.
- Ranks are rounded per iteration (1e-9): double summation order differs
  per partitioning, and un-rounded drift compounds across iterations;
  9 places is far below convergence tolerance but above float noise.
- Lineage grows per iteration → ``localCheckpoint`` every
  ``checkpoint_every`` steps (configurable ``checkpoint`` fn for a
  reliable cluster checkpoint, mirroring dedup_components).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    checkpoint: Optional[Callable[[DataFrame], DataFrame]] = None,
) -> DataFrame:
    """Power-iteration PageRank on an edge list.

    ``pr_0 = 1``; ``pr_{k+1}(n) = (1-d) + d * Σ_{m→n} pr_k(m)/outdeg(m)``
    (dangling nodes contribute nothing — the uniform-restart convention).
    Returns ``(node, pagerank, outdeg)`` with ``pagerank`` rounded to 6.

    Each iteration shuffles edges once by ``src`` and aggregates once by
    ``dst``; the rank frame is node-sized. For an undirected graph, pass
    both edge directions.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg(src)) — static across iterations; materialize
    # once or every round (and the node/degree frames below) re-runs the
    # distinct + degree aggregate upstream (the dedup_components
    # edge-list lesson). Everything downstream derives from this one
    # checkpointed frame.
    ew = e.join(outdeg, "src")
    ew = checkpoint(ew) if checkpoint is not None else ew.localCheckpoint(
        eager=True
    )
    outdeg = ew.groupBy("src").agg(F.max("outdeg").alias("outdeg"))
    nodes = (
        ew.select(F.col("src").alias("node"))
        .unionByName(ew.select(F.col("dst").alias("node")))
        .distinct()
    )
    pr = nodes.withColumn("pagerank", F.lit(1.0))
    for i in range(iterations):
        contrib = (
            ew.join(pr, ew["src"] == pr["node"])
            .select("dst", (F.col("pagerank") / F.col("outdeg")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__in"))
        )
        pr = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            F.round(
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0)),
                9,
            ).alias("pagerank"),
        )
        if checkpoint is not None and (i + 1) % checkpoint_every == 0:
            pr = checkpoint(pr)
        elif checkpoint is None and (i + 1) % checkpoint_every == 0:
            pr = pr.localCheckpoint(eager=True)
    return (
        pr.join(outdeg, pr["node"] == outdeg["src"], "left")
        .select(
            "node",
            F.round("pagerank", 6).alias("pagerank"),
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
        )
    )
