"""Product quantization (C3) — Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search": the classic memory-bounded
ANN missing piece next to IVF (coarse quantizer), LSH (hash buckets),
random projection (dim reduction) and int8 (scalar quantization).

The vector splits into ``m`` subvectors; each subspace gets its own
``k``-entry codebook (deterministic Lloyd's on a bounded content-
addressed sample — the same reproducibility posture as
``ann.fit_ivf_centroids_deterministic``); a vector stores as ``m``
small codes (m=8, k=16 → 4 bits/subspace = 4 bytes per 64-dim float32
vector, a 64× compression). Search is asymmetric distance computation
(ADC): per query, one (m × k) table of exact subspace distances; a
candidate's approximate distance is m table lookups — no float math
per candidate.

Scale shape: codebook fit is bounded by ``max_sample`` (model
constant); encoding is a map-only Arrow pass (BLAS argmin per batch);
search broadcasts the query distance tables, scores per partition with
numpy ``take``, keeps a local top-k, and merges ``partitions × k``
rows — the corpus never shuffles and never leaves its executors.

Determinism: content-addressed sample + seeded init + fixed iteration
order make codebooks layout-independent; encoding and ADC are pure
functions of (codebooks, vector) — committed-golden checkable. Recall
floors vs the exact scan are asserted in tests.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fit_pq_codebooks(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    max_sample: int = 100_000,
    max_iter: int = 8,
) -> np.ndarray:
    """(m, k, dim/m) codebooks from a deterministic bounded sample."""
    n = vectors.count()
    s = max(1, n // max_sample)
    sampled = (
        vectors
        if s == 1
        else vectors.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(s)) == 0)
    )
    pdf = sampled.select(id_col, vec_col).toPandas().sort_values(id_col)
    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cents = xs[rng.choice(len(xs), size=min(k, len(xs)), replace=False)]
        x2 = (xs * xs).sum(axis=1)
        for _ in range(max_iter):
            c2 = (cents * cents).sum(axis=1)
            d2 = x2[:, None] + c2[None, :] - 2.0 * (xs @ cents.T)
            assign = d2.argmin(axis=1)
            new = np.array(
                [
                    xs[assign == c].mean(axis=0) if (assign == c).any() else cents[c]
                    for c in range(len(cents))
                ]
            )
            if np.array_equal(new, cents):
                break
            cents = new
        books.append(cents)
    return np.stack(books)  # (m, k, sub)


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes): each vector's per-subspace nearest codebook entry.
    Map-only Arrow pass; codes ride as a small int array."""
    m, k, sub = codebooks.shape
    books = codebooks.copy()

    def run(batches):
        import pandas as pd

        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                c = books[j]
                d2 = (
                    (xs * xs).sum(axis=1)[:, None]
                    + (c * c).sum(axis=1)[None, :]
                    - 2.0 * (xs @ c.T)
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes.tolist())})

    return vectors.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, codes array<int>"
    )


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ADC top-k: (query_id, vec_id, adc_dist, rank), rank ascending by
    approximate squared L2 distance with an id tiebreak. Queries (and
    their m×k distance tables) broadcast inside the closure; each
    partition scores with ``take`` lookups and keeps its local top-k,
    the final exact rank runs over ≤ partitions × k × n_queries rows.
    Compose with :func:`pq_rerank` for the standard ADC-candidates +
    exact-re-rank pipeline."""
    m, kk, sub = codebooks.shape
    q_rows = queries.select(query_id_col, query_vec_col).collect()  # bounded query set
    q_tables = []
    for r in q_rows:
        qv = np.asarray(r[query_vec_col], dtype=np.float64)
        t = np.empty((m, kk))
        for j in range(m):
            diff = codebooks[j] - qv[j * sub : (j + 1) * sub][None, :]
            t[j] = (diff * diff).sum(axis=1)
        q_tables.append((int(r[query_id_col]), t))

    def run(batches):
        import heapq

        import pandas as pd

        heaps = {qid: [] for qid, _ in q_tables}
        for pdf in batches:
            codes = np.asarray(pdf["codes"].tolist(), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            for qid, t in q_tables:
                d = np.zeros(len(codes))
                for j in range(m):
                    d += t[j].take(codes[:, j])
                for dist, vid in zip(d, ids):
                    item = (-float(dist), -int(vid))
                    if len(heaps[qid]) < k:
                        heapq.heappush(heaps[qid], item)
                    else:
                        heapq.heappushpop(heaps[qid], item)
        out_q, out_v, out_d = [], [], []
        for qid, h in heaps.items():
            for nd, nv in h:
                out_q.append(qid)
                out_v.append(-nv)
                out_d.append(-nd)
        yield pd.DataFrame({query_id_col: out_q, id_col: out_v, "adc_dist": out_d})

    cand = encoded.mapInPandas(
        run, schema=f"{query_id_col} long, {id_col} long, adc_dist double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("adc_dist"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("adc_dist", 9).alias("adc_dist_r"),
            "rank",
        )
    )


def pq_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact re-rank of ADC candidates — the standard PQ deployment
    (ADC recalls a candidate pool cheaply; the true vectors of that
    POOL alone are read for exact distances). ``candidates`` is
    ``pq_topk(..., k=pool)`` output; the pool (queries × pool rows)
    broadcasts against the corpus, so the full vector column is touched
    only for candidate rows. Output: (query_id, vec_id, l2_dist_r,
    rank) by exact squared L2, id tiebreak."""
    cand = candidates.select(query_id_col, id_col)
    joined = vectors.select(id_col, vec_col).join(F.broadcast(cand), id_col).join(
        F.broadcast(queries.select(query_id_col, query_vec_col)), query_id_col
    )
    d2 = F.aggregate(
        F.zip_with(
            vec_col,
            query_vec_col,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("__d2"), F.col(id_col))
    return (
        joined.withColumn("__d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("__d2", 9).alias("l2_dist_r"), "rank")
    )


def _kmeans(x: np.ndarray, k: int, rng, max_iter: int) -> np.ndarray:
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    x2 = (x * x).sum(axis=1)
    for _ in range(max_iter):
        c2 = (cents * cents).sum(axis=1)
        d2 = x2[:, None] + c2[None, :] - 2.0 * (x @ cents.T)
        assign = d2.argmin(axis=1)
        new = np.array(
            [x[assign == c].mean(axis=0) if (assign == c).any() else cents[c] for c in range(len(cents))]
        )
        if np.array_equal(new, cents):
            break
        cents = new
    return cents


def fit_ivfpq(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 8,
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    max_sample: int = 100_000,
    max_iter: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """FAISS-style IVF-PQ model: (coarse centroids (n_lists, dim),
    residual codebooks (m, k, dim/m)) from one deterministic bounded
    sample — coarse L2 k-means first, then per-subspace k-means on the
    RESIDUALS x − c(list(x)) (residual quantization is what makes
    IVF-PQ beat flat PQ: residuals are centered and small)."""
    n = vectors.count()
    s = max(1, n // max_sample)
    sampled = (
        vectors if s == 1 else vectors.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(s)) == 0)
    )
    pdf = sampled.select(id_col, vec_col).toPandas().sort_values(id_col)
    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    rng = np.random.default_rng(seed)
    coarse = _kmeans(x, n_lists, rng, max_iter)
    d2 = (
        (x * x).sum(axis=1)[:, None]
        + (coarse * coarse).sum(axis=1)[None, :]
        - 2.0 * (x @ coarse.T)
    )
    res = x - coarse[d2.argmin(axis=1)]
    sub = dim // m
    books = np.stack(
        [_kmeans(res[:, j * sub : (j + 1) * sub], k, rng, max_iter) for j in range(m)]
    )
    return coarse, books


def ivfpq_encode(
    vectors: DataFrame,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, list_id, codes): coarse assignment + residual PQ codes in
    ONE map-only Arrow pass (both model arrays ride the closure)."""
    m, kk, sub = codebooks.shape

    def run(batches):
        import pandas as pd

        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                (x * x).sum(axis=1)[:, None]
                + (coarse * coarse).sum(axis=1)[None, :]
                - 2.0 * (x @ coarse.T)
            )
            lid = d2.argmin(axis=1)
            res = x - coarse[lid]
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                rs = res[:, j * sub : (j + 1) * sub]
                c = codebooks[j]
                dd = (
                    (rs * rs).sum(axis=1)[:, None]
                    + (c * c).sum(axis=1)[None, :]
                    - 2.0 * (rs @ c.T)
                )
                codes[:, j] = dd.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "list_id": lid.astype("int32"),
                    "codes": list(codes.tolist()),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, list_id int, codes array<int>"
    )


def ivfpq_topk(
    encoded: DataFrame,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-PQ ADC search: each query probes its ``n_probe`` nearest
    coarse lists and scores ONLY those rows via per-(query, list)
    residual distance tables (q − c_list vs the residual codebooks).
    The scan is one filtered Arrow pass (rows outside every probed
    list are skipped before any scoring); candidates merge as
    ``partitions × k`` heap survivors and rank exactly. Compose with
    :func:`pq_rerank` for the exact re-rank."""
    m, kk, sub = codebooks.shape
    q_rows = queries.select(query_id_col, query_vec_col).collect()  # bounded
    per_q: list[tuple[int, dict[int, np.ndarray]]] = []
    probed_lists: set[int] = set()
    for r in q_rows:
        qv = np.asarray(r[query_vec_col], dtype=np.float64)
        d2 = ((coarse - qv[None, :]) ** 2).sum(axis=1)
        lists = [int(v) for v in np.argsort(d2, kind="stable")[:n_probe]]
        probed_lists.update(lists)
        tables: dict[int, np.ndarray] = {}
        for lid in lists:
            rq = qv - coarse[lid]
            t = np.empty((m, kk))
            for j in range(m):
                diff = codebooks[j] - rq[j * sub : (j + 1) * sub][None, :]
                t[j] = (diff * diff).sum(axis=1)
            tables[lid] = t
        per_q.append((int(r[query_id_col]), tables))
    probed = sorted(probed_lists)

    def run(batches):
        import heapq

        import pandas as pd

        heaps = {qid: [] for qid, _ in per_q}
        for pdf in batches:
            codes = np.asarray(pdf["codes"].tolist(), dtype=np.int64)
            lids = pdf["list_id"].to_numpy()
            ids = pdf[id_col].to_numpy()
            for qid, tables in per_q:
                for lid, t in tables.items():
                    mask = lids == lid
                    if not mask.any():
                        continue
                    cc = codes[mask]
                    d = np.zeros(len(cc))
                    for j in range(m):
                        d += t[j].take(cc[:, j])
                    for dist, vid in zip(d, ids[mask]):
                        item = (-float(dist), -int(vid))
                        if len(heaps[qid]) < k:
                            heapq.heappush(heaps[qid], item)
                        else:
                            heapq.heappushpop(heaps[qid], item)
        out_q, out_v, out_d = [], [], []
        for qid, h in heaps.items():
            for nd, nv in h:
                out_q.append(qid)
                out_v.append(-nv)
                out_d.append(-nd)
        yield pd.DataFrame({query_id_col: out_q, id_col: out_v, "adc_dist": out_d})

    cand = encoded.filter(F.col("list_id").isin(probed)).mapInPandas(
        run, schema=f"{query_id_col} long, {id_col} long, adc_dist double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("adc_dist"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("adc_dist", 9).alias("adc_dist_r"), "rank")
    )
