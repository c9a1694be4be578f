"""SemDedup — semantic (embedding-space) deduplication.

Abbas et al., "SemDedup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): k-means the corpus
embeddings into clusters, compute pairwise cosine WITHIN each cluster
only, and keep one representative per group of semantic duplicates.
The clustering bounds the quadratic term: pair work is
Σ |cluster|², and choosing ``n_lists`` ∝ N keeps expected cluster size
(and therefore per-cluster cost) constant as the corpus grows — the
same inverted-file trick as ``operators/ann``.

Pipeline (deterministic for a FIXED platform, so the output is
committed-golden checkable — with one caveat: the Arrow path's float64
BLAS matmuls (assignment argmax, pairwise cosine vs the threshold) are
not bit-stable across BLAS builds, so a near-tie assignment or a
cosine landing within an ulp of the threshold could flip on a machine
with a different BLAS than the one that generated the goldens. The
``arrow=False`` JVM path uses the sequential-fold convention and is
the bit-stable reference; regenerate goldens from it if a platform
move ever breaks them):

1. centroids = layout-independent Lloyd's fit on a bounded,
   content-selected sample (``ann.fit_ivf_centroids_deterministic``);
2. cluster assignment = map pass against the broadcast centroid matrix
   (one BLAS matmul per Arrow batch) — the corpus never moves, and
   argmax(X·Ĉᵀ) equals the cosine argmax because the row norm is a
   positive scale;
3. within-cluster pairwise cosine + prune emitted from ONE Arrow group
   per cluster (``applyInPandas`` on list_id), scored by a single BLAS
   matmul, rows sorted by id inside the group so the result is
   independent of shuffle arrival order. Cluster sizes are bounded by
   the n_lists ∝ N contract, so groups stay small and embarrassingly
   parallel. The whole operator is two Python stages and one shuffle;
   nothing is evaluated twice. (Scale smoke history at 20×/40k
   vectors: self-join + interpreted JVM-fold cosine 120 s → interpreted
   literal-expression assignment evaluated twice ~25 s at 5× → this
   shape ~seconds.)
4. drop policy: a vector is pruned iff some LOWER-id vector in the
   same cluster has cosine ≥ threshold ("earlier-id shadowing") —
   deterministic without any tie-break subtlety. This is the common
   greedy realization of the paper's keep-one-per-ε-ball step.

A JVM-expression path (``arrow=False``: ``ann.assign_lists`` literal
expressions + self-join + sequential-fold cosine) is kept as the
no-Python-workers fallback and the equivalence check in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.operators.ann import (
    assign_lists,
    fit_ivf_centroids_deterministic,
)
from postgre_to_clickhouse_spark.operators.similarity import cosine_similarity


def _semdedup_arrow(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Arrow pipeline: BLAS batch assignment → one group per cluster →
    prune decision emitted directly (no rejoin — the group already
    holds everything the output row needs)."""
    import math

    import numpy as np
    import pandas as pd

    from postgre_to_clickhouse_spark.operators.ann import _centroid_rows

    crows = _centroid_rows(centroids)
    lids = np.asarray([lid for lid, _ in crows], dtype=np.int64)
    # normalize with the same fsum-based arithmetic assign_lists uses
    # for its literal constants (cosine argmax == dot argmax vs
    # normalized centroids; the row norm is a positive scale)
    cn = np.asarray(
        [[v / math.sqrt(math.fsum(x * x for x in c)) for v in c] for _, c in crows]
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            a = (x @ cn.T).argmax(axis=1)  # first max -> lowest list_id
            yield pd.DataFrame(
                {id_col: pdf[id_col], vec_col: pdf[vec_col], "list_id": lids[a]}
            )

    assigned = vectors.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, {vec_col} array<float>, list_id int"
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        nrm = np.sqrt((x * x).sum(axis=1))
        xn = x / np.where(nrm == 0.0, 1.0, nrm)[:, None]
        sims = xn @ xn.T
        # strictly-lower triangle = pairs (i, j<i): shadowed iff any hit
        dropped = (np.tril(sims, k=-1) >= threshold).any(axis=1)
        return pd.DataFrame(
            {id_col: pdf[id_col], "cluster_id": pdf["list_id"], "is_kept": ~dropped}
        )

    return assigned.groupBy("list_id").applyInPandas(
        prune, schema=f"{id_col} long, cluster_id int, is_kept boolean"
    )


def _shadowed_jvm(assigned: DataFrame, id_col: str, vec_col: str, threshold: float) -> DataFrame:
    left = assigned.select(
        F.col(id_col).alias("__id_a"), "list_id", F.col(vec_col).alias("__vec_a")
    )
    right = assigned.select(
        F.col(id_col).alias("__id_b"), "list_id", F.col(vec_col).alias("__vec_b")
    )
    return (
        left.join(right, "list_id")
        .filter(F.col("__id_b") < F.col("__id_a"))
        .filter(cosine_similarity("__vec_a", "__vec_b") >= F.lit(threshold))
        .select(F.col("__id_a").alias(id_col))
        .distinct()
    )


def semdedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
    arrow: bool = True,
) -> DataFrame:
    """(id, cluster_id, is_kept) for every input vector.

    ``is_kept`` = False iff a lower-id same-cluster vector is within
    ``threshold`` cosine. ``n_lists`` should grow ∝ corpus size (model
    constant per deployment, not data-derived at runtime).
    """
    cents = fit_ivf_centroids_deterministic(
        vectors, vec_col=vec_col, id_col=id_col, n_lists=n_lists, seed=seed
    )
    if arrow:
        return _semdedup_arrow(vectors, cents, id_col, vec_col, threshold)
    assigned = assign_lists(vectors, cents, id_col=id_col, vec_col=vec_col)
    shadowed = _shadowed_jvm(assigned, id_col, vec_col, threshold).withColumn(
        "__dropped", F.lit(True)
    )
    return assigned.join(shadowed, id_col, "left").select(
        F.col(id_col),
        F.col("list_id").alias("cluster_id"),
        F.col("__dropped").isNull().alias("is_kept"),
    )
