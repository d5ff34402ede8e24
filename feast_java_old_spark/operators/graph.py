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


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts on an undirected edge list — the classic
    degree-ordered ("node-iterator++" / Cohen's MapReduce) formulation.

    Scale design: every edge is oriented from its lower-(degree, id)
    endpoint to its higher one, so wedges are enumerated only at each
    triangle's smallest-degree vertex. On any graph the oriented
    out-degree is O(sqrt(m)), which bounds the wedge self-join at
    O(m^1.5) worst case and near-linear on power-law graphs — the join
    NEVER enumerates a hub's full neighbor-pair set from the hub itself.
    Three shuffles total (degree agg, wedge self-join, closure join);
    no adjacency matrix, no driver state.

    Returns ``(node, degree, triangles)`` — one row per node appearing
    in any edge, ``triangles`` = number of triangles the node belongs to
    (each triangle counted once per member node).
    """
    # canonical undirected edges (a < b), self-loops dropped.
    # Materialized once (same contract as pagerank's edge frame): it
    # feeds THREE consumers (degree agg, orientation join, closure
    # join) and would otherwise re-run the caller's whole edge-building
    # lineage per consumer.
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient by (degree, id): lo endpoint -> hi endpoint
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("__db"))
    ew = e.join(da, "a").join(db, "b")
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    oriented = ew.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    # wedges at the low vertex: id-ordering the endpoint pair (v < w)
    # emits each wedge once instead of twice
    w1 = oriented.select(F.col("lo").alias("c"), F.col("hi").alias("v"))
    w2 = oriented.select(F.col("lo").alias("c"), F.col("hi").alias("w"))
    wedges = w1.join(w2, "c").where(F.col("v") < F.col("w"))
    # closure: the (v, w) edge exists in EITHER orientation of the
    # canonical form (v < w already holds by construction above when ids
    # order the same way as orientation — but orientation is by degree,
    # so check the canonical a<b edge set)
    closure = e.select(
        F.least("a", "b").alias("v"), F.greatest("a", "b").alias("w")
    )
    tris = wedges.join(closure, ["v", "w"]).select(
        F.col("c").alias("n1"), F.col("v").alias("n2"), F.col("w").alias("n3")
    )
    per_node = (
        tris.select(F.col("n1").alias("node"))
        .unionByName(tris.select(F.col("n2").alias("node")))
        .unionByName(tris.select(F.col("n3").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node", "degree", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


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
    # r16: pin the materialized edge frame's layout to hash(src) — the
    # distribution every iteration's (ew ⋈ rank) join needs. Checkpoint
    # preserves the physical partitioning, so the EDGE-sized side is
    # never re-exchanged: each iteration shuffles only the node-sized
    # rank frame into place plus the contribution aggregate keyed by
    # dst (guide §2.4 — two operations keyed the same way share one
    # exchange). Without the explicit repartition the layout depended
    # on how the outdeg join was planned (a broadcast leaves it
    # partitioned by (src, dst) from the distinct), and every iteration
    # re-shuffled the whole edge table by src.
    ew = e.join(outdeg, "src").repartition("src")
    ew = checkpoint(ew) if checkpoint is not None else ew.localCheckpoint(
        eager=True
    )
    outdeg = ew.groupBy("src").agg(F.max("outdeg").alias("outdeg"))
    # r16: the node universe feeds the rank init AND every iteration's
    # dangling-node left join — materialize the node-sized frame once
    # instead of re-running the union+distinct shuffle per consumer.
    nodes = (
        ew.select(F.col("src").alias("node"))
        .unionByName(ew.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = (
        checkpoint(nodes)
        if checkpoint is not None
        else nodes.localCheckpoint(eager=True)
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
