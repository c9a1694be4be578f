"""Vector similarity search over an ``array<float>`` embedding column
(SURVEY.md C3; fixture: ``embeddings``).

Two tiers:
- :func:`cosine_topk` — brute-force exact top-k. All JVM-side
  (``zip_with`` + ``aggregate`` higher-order functions — no Python in
  the row path). Scale: O(N·Q) dot products; right answer for one-off
  queries and the ground-truth baseline for ANN recall tests. The query
  side is broadcast, so the scan stays embarrassingly parallel (no
  shuffle until the final top-k, which is TakeOrderedAndProject).
- :func:`lsh_topk` — approximate path via random-hyperplane signatures
  (SimHash-style buckets): candidates = bucket collisions on any of
  ``n_tables`` signatures, re-ranked exactly. Scale: the candidate join
  is a hash join on (table, signature) — at 100 TB this replaces the
  full cross product with per-bucket work; recall tunes via
  bits/tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double, sequential fold → deterministic."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force, broadcast
    queries). Output: (query_id, vec_id, cosine) with rank ≤ k,
    deterministic tiebreak on vec_id."""
    from pyspark.sql import Window

    q = F.broadcast(queries.select(query_id_col, query_vec_col))
    scored = (
        vectors.select(id_col, vec_col)
        .crossJoin(q)
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            cosine_similarity(vec_col, query_vec_col).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_signature(vec_col: str, planes: list[list[float]]) -> Column:
    """Pack sign(v·hᵢ) bits into a long — a JVM-side random-projection
    signature (shared by lsh_topk and simhash-style bucketing)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        h = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(vec_col, h) > 0).cast("long")
        sig = sig + (bit * F.lit(2**i).cast("long"))
    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    planes_tables: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: union over hash tables of per-bucket candidate
    joins, exact cosine re-rank of the deduped candidate set."""
    from pyspark.sql import Window

    sigs = []
    for t, planes in enumerate(planes_tables):
        v = vectors.select(
            F.col(id_col), F.col(vec_col), F.lit(t).alias("tbl"),
            hyperplane_signature(vec_col, planes).alias("sig"),
        )
        q = queries.select(
            F.col(query_id_col), F.col(query_vec_col), F.lit(t).alias("tbl"),
            hyperplane_signature(query_vec_col, planes).alias("sig"),
        )
        sigs.append((v, q))
    cand = None
    for v, q in sigs:
        c = v.join(F.broadcast(q), ["tbl", "sig"]).select(query_id_col, id_col, vec_col, query_vec_col)
        cand = c if cand is None else cand.unionAll(c)
    cand = cand.dropDuplicates([query_id_col, id_col]).filter(F.col(id_col) != F.col(query_id_col))
    scored = cand.select(query_id_col, id_col, cosine_similarity(vec_col, query_vec_col).alias("cosine"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
