"""Connected components via iterative min-label propagation.

Reference parity: KMR runs graph algorithms as fixed-point map/shuffle/
reduce loops with materialized KVS state per round (ex/pagerank.c:1-30);
this operator is the same loop shape on DataFrames. Beyond-reference
purpose: turn near-duplicate PAIRS (llm_ops/dedup.py band joins) into
duplicate CLUSTERS so a pipeline can keep one document per group —
the step every training-data dedup needs after LSH.

Algorithm: label(v) starts as v; each round label(v) <- min(label(u))
over u in N(v) ∪ {v} (self-loops make the update monotone). After
enough rounds every node carries the minimum id of its component.
Rounds are a FIXED count so the DuckDB oracle (an unrolled CTE chain
doing the identical integer mins) is bit-deterministic; a convergence
test asserts the count suffices on the test corpora. Near-dup graphs
from banded LSH have small diameter (bands create quasi-cliques), so a
small constant works; general graphs would use the alternating
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond") — same join/groupBy building blocks, fewer
rounds on high-diameter graphs.

Scale shape per round: one shuffle of (node, label) against the
persisted adjacency (both keyed on the node id — at cluster scale the
adjacency would be bucketed on src so the join is co-located, see
sources/bucketing.py), one map-side-combined min aggregation. Label
state is node-sized. Lineage is truncated with localCheckpoint every
few rounds (same iteration hygiene as plans/iterative.py pagerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", n_iters: int = 8,
                         checkpoint_every: int = 4) -> DataFrame:
    """Labels each node of the undirected pair graph with the minimum
    node id of its connected component. Returns (node, label)."""
    # materialize the (possibly expensive) pair source ONCE: the
    # adjacency build scans it three times (fwd, rev, self-loop
    # branches) and those union branches run as separate stages that
    # would each recompute an uncached upstream (e.g. a full LSH
    # pipeline) in parallel past an unfilled cache
    pairs = pairs.persist()
    pairs.count()
    nodes = (
        pairs.select(F.col(src).alias("node"))
        .unionByName(pairs.select(F.col(dst).alias("node")))
        .distinct()
    )
    adj = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .unionByName(nodes.select(F.col("node").alias("s"), F.col("node").alias("d")))
        .persist()
    )
    # initial labels from the adjacency's self-loop rows (reads the adj
    # cache instead of re-deriving the node set from the pair source)
    labels = adj.filter(F.col("s") == F.col("d")).select(
        F.col("s").alias("node"), F.col("s").alias("label"))
    for i in range(n_iters):
        labels = (
            adj.join(labels, adj["s"] == labels["node"])
            .groupBy("d").agg(F.min("label").alias("label"))
            .select(F.col("d").alias("node"), "label")
        )
        if (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint()
    labels = labels.localCheckpoint()  # materialize, then drop the caches
    adj.unpersist()
    pairs.unpersist()
    return labels
