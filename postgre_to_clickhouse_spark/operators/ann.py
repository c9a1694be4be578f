"""IVF-style approximate nearest neighbor (SURVEY.md C3 scale path #2).

Classic inverted-file ANN: k-means the corpus into ``n_lists`` coarse
cells, store each vector under its nearest centroid, and at query time
probe only the ``n_probe`` nearest cells, exact-reranking the short
candidate list. Complements the hyperplane-LSH path in ``similarity``:
IVF adapts to the data distribution (learned centroids) where LSH is
data-oblivious.

Scale: the centroid fit samples the corpus (k-means on a bounded
sample); assignment is one broadcast-join map pass; the query probe
turns a full scan into ``n_probe/n_lists`` of the data — the standard
way to search billions of vectors. All distance math is JVM-side
(``zip_with``/``aggregate``); k-means itself is pyspark.ml (seeded,
deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.operators.similarity import _dot, _norm, cosine_similarity


def _to_ml_vector(df: DataFrame, vec_col: str, out: str = "__mlvec") -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out, array_to_vector(F.col(vec_col).cast("array<double>")))


def fit_ivf_centroids(
    vectors: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    sample_fraction: float = 1.0,
) -> DataFrame:
    """K-means coarse quantizer → DataFrame (list_id, centroid array)."""
    from pyspark.ml.clustering import KMeans

    train = vectors if sample_fraction >= 1.0 else vectors.sample(sample_fraction, seed=seed)
    ml = _to_ml_vector(train, vec_col)
    km = KMeans(k=n_lists, seed=seed, featuresCol="__mlvec", maxIter=8, initMode="k-means||")
    model = km.fit(ml)
    spark = vectors.sparkSession
    cents = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return spark.createDataFrame(cents, "list_id int, centroid array<double>")


def assign_lists(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach nearest-centroid list_id to every vector (broadcast join +
    window argmin — one map-side pass, no shuffle of the corpus)."""
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "__d", _dot(vec_col, "centroid") / (_norm(vec_col) * _norm("centroid"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__d").desc(), F.col("list_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__d", "centroid")
    )


def ivf_topk(
    indexed: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe the ``n_probe`` nearest lists per query, exact-rerank.

    ``indexed`` = output of :func:`assign_lists` (vectors + list_id).
    """
    qc = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "__d", _dot(query_vec_col, "centroid") / (_norm(query_vec_col) * _norm("centroid"))
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("__d").desc(), F.col("list_id"))
    probes = (
        qc.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select(query_id_col, query_vec_col, "list_id")
    )
    cand = indexed.join(F.broadcast(probes), "list_id").filter(F.col(id_col) != F.col(query_id_col))
    scored = cand.select(
        query_id_col, id_col, cosine_similarity(vec_col, query_vec_col).alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
