"""SemDedup — semantic (embedding-space) deduplication.

Abbas et al., "SemDedup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): k-means the corpus
embeddings into clusters, compute pairwise cosine WITHIN each cluster
only, and keep one representative per group of semantic duplicates.
The clustering bounds the quadratic term: pair work is
Σ |cluster|², and choosing ``n_lists`` ∝ N keeps expected cluster size
(and therefore per-cluster cost) constant as the corpus grows — the
same inverted-file trick as ``operators/ann``.

Pipeline (all deterministic, so the output is committed-golden
checkable):

1. centroids = layout-independent Lloyd's fit on a bounded,
   content-selected sample (``ann.fit_ivf_centroids_deterministic``);
2. cluster assignment = shuffle-free literal-centroid map pass
   (``ann.assign_lists``) — the corpus never moves;
3. within-cluster pairs from ONE self-join on list_id (at scale: salt
   the join like ``similarity.block_knn`` if clusters skew);
4. drop policy: a vector is pruned iff some LOWER-id vector in the
   same cluster has cosine ≥ threshold ("earlier-id shadowing") —
   single join + aggregation, no iteration, deterministic without any
   tie-break subtlety. This is the common greedy realization of the
   paper's keep-one-per-ε-ball step.

Cosine uses the sequential-fold JVM expression from
``operators.similarity`` — bit-identical on any partitioning, which is
what makes the golden oracle sound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.operators.ann import (
    assign_lists,
    fit_ivf_centroids_deterministic,
)
from postgre_to_clickhouse_spark.operators.similarity import cosine_similarity


def semdedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
) -> DataFrame:
    """(id, cluster_id, is_kept) for every input vector.

    ``is_kept`` = False iff a lower-id same-cluster vector is within
    ``threshold`` cosine. ``n_lists`` should grow ∝ corpus size (model
    constant per deployment, not data-derived at runtime).
    """
    cents = fit_ivf_centroids_deterministic(
        vectors, vec_col=vec_col, id_col=id_col, n_lists=n_lists, seed=seed
    )
    assigned = assign_lists(vectors, cents, id_col=id_col, vec_col=vec_col)
    left = assigned.select(
        F.col(id_col).alias("__id_a"), "list_id", F.col(vec_col).alias("__vec_a")
    )
    right = assigned.select(
        F.col(id_col).alias("__id_b"), "list_id", F.col(vec_col).alias("__vec_b")
    )
    shadowed = (
        left.join(right, "list_id")
        .filter(F.col("__id_b") < F.col("__id_a"))
        .filter(cosine_similarity("__vec_a", "__vec_b") >= F.lit(threshold))
        .select(F.col("__id_a").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return assigned.join(shadowed, id_col, "left").select(
        F.col(id_col),
        F.col("list_id").alias("cluster_id"),
        F.coalesce(F.col("__dropped") == F.lit(False), F.lit(True)).alias("is_kept"),
    )
