"""Distributed connected components — dedup-cluster resolution.

A training-data pipeline that finds near-duplicate PAIRS (MinHash LSH,
embedding cosine, n-gram jaccard — ``operators/dedup.py``,
``operators/similarity.py``) still has to turn those pairs into
CLUSTERS to pick one canonical document per group. That closure is a
connected-components problem over the candidate-pair graph.

Implementation: iterative min-label propagation — every node starts
labeled with itself, and each round takes the min label over itself and
its neighbors until a fixpoint. This is the Pregel formulation (GraphX
runs the same algorithm); rounds = graph diameter, and near-dup
clusters are shallow by construction (a dup cluster's diameter is tiny
— documents similar to a common ancestor are similar to each other), so
the loop converges in a handful of rounds. Each round is one shuffle
(groupBy node); ``localCheckpoint`` severs lineage so plan depth stays
constant across iterations instead of growing — the standard guard for
iterative DataFrame algorithms. For adversarially deep graphs (long
chains) the alternating large-star/small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond") drops rounds to
O(log n); near-dup clustering does not need it.

The result is deterministic: the converged fixpoint (min reachable
node id per node) does not depend on iteration schedule, so the same
clusters come out on any cluster size — and the DuckDB recursive-CTE
oracle can check it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable. Undirected: edges are symmetrized internally."""
    half = edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
    sym = half.union(half.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    # sever the (possibly expensive) edge-derivation lineage once; every
    # iteration re-reads this materialized edge set
    sym = sym.localCheckpoint()
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn("comp", F.col("node"))
    for _ in range(max_iter):
        # change detection folded into the SAME aggregation that computes
        # the new labels: the old label rides along as a second column
        # (non-null on exactly the one row contributed by `labels`), so no
        # extra join/shuffle per round — the count below scans only the
        # just-checkpointed in-memory result.
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "comp", F.lit(None).cast("long").alias("old"))
        )
        mine = labels.select("node", "comp", F.col("comp").alias("old"))
        new = (
            mine.unionByName(neighbor_min)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.max("old").alias("old"))
            .localCheckpoint()
        )
        changed = new.filter(F.col("comp") != F.col("old")).count()
        labels = new.select("node", "comp")
        if changed == 0:
            break
    return labels
