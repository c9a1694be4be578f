"""IVF-style approximate nearest neighbor (SURVEY.md C3 scale path #2).

Classic inverted-file ANN: k-means the corpus into ``n_lists`` coarse
cells, store each vector under its nearest centroid, and at query time
probe only the ``n_probe`` nearest cells, exact-reranking the short
candidate list. Complements the hyperplane-LSH path in ``similarity``:
IVF adapts to the data distribution (learned centroids) where LSH is
data-oblivious.

Scale: the centroid fit samples the corpus (k-means on a bounded,
cached sample); everything downstream treats the centroid table as
what it is — a driver-size constant (``n_lists`` rows, never data-
proportional). Assignment and query probing are therefore pure map
passes over literal centroid arrays: ZERO shuffle, no cross-join row
blow-up, no window sort. The only shuffles left in the whole search
are the candidate hash-join on list_id and the final per-query top-k.
All distance math is JVM-side (``zip_with``/``aggregate``); k-means
itself is pyspark.ml (seeded, deterministic).
"""

from __future__ import annotations

import weakref

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.operators.similarity import _norm, cosine_similarity

# r17 (ADVICE r16): within-query centroid-row memo, keyed WEAKLY by the
# exact DataFrame object the fit returned — a module-level map instead
# of a monkey-attribute on the DataFrame (which any transformation,
# checkpoint or serialization silently drops, and which Connect-style
# proxies may not carry). Lifetime equals the frame object's: a fresh
# fit builds fresh rows, a transformed frame is a MISS (falls back to
# the collect, which returns the same values) — never cross-run caching.
_CENTROID_ROWS: "weakref.WeakKeyDictionary[DataFrame, list]" = (
    weakref.WeakKeyDictionary()
)


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
    """K-means coarse quantizer → DataFrame (list_id, centroid array).

    The training set is cached for the fit: k-means is iterative, and
    without the cache every iteration re-reads and re-decodes the
    source (at 100 TB: pass ``sample_fraction`` so the cached sample is
    bounded — IVF centroid quality needs only a sample anyway). The
    cached sample is also re-coalesced to match its actual row count:
    every k-means iteration is a full job over the sample, and a small
    sample scattered across hundreds of source partitions pays
    scheduling overhead per iteration instead of compute. Init is
    seeded random rather than k-means|| — the || init costs extra
    distributed passes to optimize a coarse quantizer whose cells get
    exact-reranked anyway.
    """
    from pyspark.ml.clustering import KMeans

    train = vectors if sample_fraction >= 1.0 else vectors.sample(sample_fraction, seed=seed)
    cached = _to_ml_vector(train.select(vec_col), vec_col).cache()
    try:
        n = cached.count()  # materializes the cache; sizes the coalesce
        ml = cached.coalesce(max(1, min(int(n // 20_000) + 1, 256)))
        km = KMeans(k=n_lists, seed=seed, featuresCol="__mlvec", maxIter=8, initMode="random")
        model = km.fit(ml)
    finally:
        cached.unpersist()
    spark = vectors.sparkSession
    cents = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return spark.createDataFrame(cents, "list_id int, centroid array<double>")


def fit_ivf_centroids_deterministic(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    seed: int = 42,
    max_sample: int = 100_000,
    max_iter: int = 8,
) -> DataFrame:
    """Layout-independent coarse-quantizer fit: deterministic Lloyd's
    k-means on a bounded, deterministically-chosen sample.

    :func:`fit_ivf_centroids` (pyspark.ml) is partition-sensitive — its
    seeded random init samples per partition, so the same data read with
    a different parallelism yields different centroids. For a learned
    index that must be REPRODUCIBLE (committed-golden correctness, or
    re-building the same index on a different cluster size), select the
    sample by content (``xxhash64(id) % m``, never ``.sample()``), sort
    it, and run the small fit in numpy on the driver. The sample is
    bounded by ``max_sample`` (model constant, not data-proportional) —
    identical scale posture to the ml path: centroid quality only needs
    a sample, and everything downstream is unchanged.
    """
    n = vectors.count()
    m = max(1, n // max_sample)
    sampled = vectors if m == 1 else vectors.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)) == 0)
    # Arrow materialization (toPandas), NOT .collect(): row-at-a-time
    # py4j conversion of array cells was ~3 s for 10k x 64 floats —
    # the whole fit is sub-second through Arrow. Values and order are
    # identical (float32 -> float64 widening is exact; sort on the
    # unique id), so committed goldens are unchanged.
    pdf = sampled.select(id_col, vec_col).toPandas().sort_values(id_col)
    import numpy as np

    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    # squared distance via ||x||² + ||c||² − 2x·c: an (n, k) matrix from
    # one BLAS matmul — the broadcasted (x − c)² form materializes an
    # (n, k, dim) tensor, a memory cliff the 20× scale smoke hit
    # (~6.5 GB per iteration at 40k × 320 × 64)
    x2 = (x * x).sum(axis=1)
    for _ in range(max_iter):
        c2 = (cents * cents).sum(axis=1)
        d2 = x2[:, None] + c2[None, :] - 2.0 * (x @ cents.T)
        assign = d2.argmin(axis=1)
        new = np.array(
            [x[assign == j].mean(axis=0) if (assign == j).any() else cents[j] for j in range(len(cents))]
        )
        if np.array_equal(new, cents):
            break
        cents = new
    out = [(i, [float(v) for v in c]) for i, c in enumerate(cents)]
    cdf = vectors.sparkSession.createDataFrame(
        out, "list_id int, centroid array<double>"
    )
    # r16: the model was just built driver-side — remember the rows so
    # downstream _centroid_rows calls (assignment expression, probe
    # expression) don't pay a createDataFrame->collect round-trip EACH
    # (two ~0.5 s 32-task jobs at sf0.1 for an 8-row model table).
    # Within-query model memoization, not cross-run caching: a fresh
    # fit builds fresh rows (weak-keyed map — see _CENTROID_ROWS).
    _CENTROID_ROWS[cdf] = out
    return cdf


def _centroid_rows(centroids: DataFrame) -> list[tuple[int, list[float]]]:
    """Materialize the centroid table (bounded: n_lists rows — a model
    constant, not data). Sorted by list_id for a stable literal order.
    A frame built by :func:`fit_ivf_centroids_deterministic` carries
    its rows already (r16; r17: weak-keyed module map) — same values,
    no collect."""
    try:
        rows = _CENTROID_ROWS.get(centroids)
    except TypeError:  # unhashable/proxy frame — fall back to collect
        rows = None
    if rows is not None:
        return sorted(((i, list(c)) for i, c in rows), key=lambda t: t[0])
    return sorted(
        ((r["list_id"], list(r["centroid"])) for r in centroids.collect()), key=lambda t: t[0]
    )


def _sims_array(vec_col: str, cents: list[tuple[int, list[float]]]) -> Column:
    """cos(vec, cᵢ) for every centroid as ONE compact expression.

    Centroids are pre-normalized in Python (they're model constants, so
    the division by |cᵢ| folds away) and shipped as a single
    array-of-array literals: cos(v, cᵢ) = dot(v, ĉᵢ) / |v|. Two wins
    over building a separate dot/norm expression per centroid: the row
    norm |v| is evaluated once per row instead of once per centroid,
    and the expression tree is one `lit` per centroid instead of one
    per *element* — which dominated py4j plan construction and codegen
    time for realistic (n_lists × dim) sizes. Still a pure projection:
    no join, no shuffle."""
    import math

    normed = []
    for _, c in cents:
        n = math.sqrt(math.fsum(x * x for x in c))
        normed.append([float(x) / n for x in c])
    arr = F.array(*[F.lit(row) for row in normed])
    nrm = _norm(vec_col)
    return F.transform(
        arr,
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / nrm,
    )


def assign_lists(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach nearest-centroid list_id to every vector.

    Pure map pass: the similarity to each centroid is a literal-array
    expression, argmax = first index of the max (ties → lowest
    list_id, matching the previous window tie-break). No shuffle — the
    corpus never moves, which is the property that matters when
    'corpus' means 100 TB."""
    cents = _centroid_rows(centroids)
    ids = [lid for lid, _ in cents]
    sims = _sims_array(vec_col, cents)
    idx = F.array_position(sims, F.array_max(sims)).cast("int")  # 1-based, first max
    list_id = F.element_at(F.array(*[F.lit(i) for i in ids]), idx)
    return vectors.withColumn("list_id", list_id)


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
    Probe selection is a per-row top-n over the literal centroid sims
    (sort struct(-sim, list_id) ascending = sim desc, list_id asc — the
    previous window tie-break), then candidates come from ONE hash join
    on list_id against the broadcast probe set.
    """
    cents = _centroid_rows(centroids)
    sims = _sims_array(query_vec_col, cents)
    ranked = F.array_sort(
        F.zip_with(
            sims,
            F.array(*[F.lit(lid) for lid, _ in cents]),
            lambda s, lid: F.struct((-s).alias("neg"), lid.alias("list_id")),
        )
    )
    probes = (
        queries.withColumn("__probe", F.explode(F.slice(ranked, 1, n_probe)))
        .select(query_id_col, query_vec_col, F.col("__probe.list_id").alias("list_id"))
    )
    cand = indexed.join(F.broadcast(probes), "list_id").filter(F.col(id_col) != F.col(query_id_col))
    scored = cand.select(
        query_id_col, id_col, cosine_similarity(vec_col, query_vec_col).alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
