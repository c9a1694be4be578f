"""Embedding quantization (C3 scale path #3: memory/bandwidth).

At 100 TB the embedding column IS the cost: float32×D per row for scan,
shuffle and cache. Symmetric int8 quantization cuts that 4× and turns
the dot product into exact integer arithmetic (SIMD-friendly in any
engine) — the standard first compression step in large-scale retrieval
(IVF lists are typically stored quantized; exact re-rank hits the
float column only for the short candidate list).

Everything here is exact-integer or IEEE-exact double math (divide,
floor, multiply) — no transcendentals — so the DuckDB oracles verify
the full quantize → score → top-k pipeline bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_scale(vec_col: Column | str) -> Column:
    """Per-vector symmetric scale: max|x| / 127 (double, exact ops)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.array_max(F.transform(c, lambda x: F.abs(x.cast("double")))) / F.lit(127.0)


def quantize_int8(vec_col: Column | str, scale: Column) -> Column:
    """x → round-half-up(x/scale) as int, clamped to [-127, 127].

    Rounding is ``floor(x/scale + 0.5)`` — floor is IEEE-exact, so the
    quantized codes are identical on every engine (banker's-rounding
    ``round()`` differs between engines; floor does not). An all-zero
    vector (scale 0) quantizes to zeros rather than dividing by zero."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    safe = F.when(scale == 0, F.lit(1.0)).otherwise(scale)
    q = F.transform(
        c,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x.cast("double") / safe + F.lit(0.5)).cast("int")),
        ),
    )
    return q


def dequantize(q_col: Column | str, scale: Column) -> Column:
    c = F.col(q_col) if isinstance(q_col, str) else q_col
    return F.transform(c, lambda q: q.cast("double") * scale)


def int8_dot(a: Column | str, b: Column | str) -> Column:
    """Exact integer dot product of two int8 code arrays (long)."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("long") * y.cast("long")))
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


def quantized_table(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach (scale, q) to every vector — the compressed storage form."""
    scale = quantize_scale(vec_col)
    return vectors.withColumn("q_scale", scale).withColumn(
        "q_codes", quantize_int8(vec_col, F.col("q_scale"))
    )


def int8_topk(
    quantized: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Top-k by EXACT integer dot product of int8 codes, scaled back to
    an approximate float score (`score ≈ cosine numerator`). Ranking
    ties break on id → fully deterministic. The query side (its codes +
    scale) is broadcast, so the corpus scan itself never shuffles.

    The top-k is a salted two-phase aggregate, NOT a window: a window
    partitioned by query_id would shuffle every scored (corpus × query)
    row into #queries partitions — with a handful of queries that is a
    handful of tasks doing ALL the sort work, the hot-partition shape
    that regressed the r4 bench 4.8×. Instead:

    1. local top-k per (query, salt(id)) — ``slice(array_sort(...), k)``
       over a groupBy whose key count is #queries × ``salt_buckets``,
       so the one unavoidable shuffle of scored rows is spread evenly
       and every task sorts only its own slice;
    2. global top-k per query over the surviving #salts × k rows — a
       trivially small second aggregate.

    Exact by algebra (an element of the global top-k is in the top-k of
    its salt bucket), deterministic for any salt assignment, and the
    sort key ``(-dot_i, id)`` reproduces the window's ordering
    including tie-breaks. Size ``salt_buckets`` so a bucket's share of
    one query's corpus fits an executor (default: 4× parallelism).
    Remaining 100 TB lever (documented, not needed here): for tiny
    query counts a map-side percentile_approx threshold can pre-prune
    the scored rows before this shuffle — but it re-scores or caches
    the corpus, only worth it when the shuffle dominates the dots.
    """
    if salt_buckets is None:
        salt_buckets = 4 * quantized.sparkSession.sparkContext.defaultParallelism
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col("q_codes").alias("__qq"),
            F.col("q_scale").alias("__qs"),
        )
    )
    scored = (
        quantized.select(id_col, "q_codes", "q_scale")
        .crossJoin(q)
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            int8_dot("q_codes", "__qq").alias("dot_i"),
            (F.col("q_scale") * F.col("__qs")).alias("__ss"),
        )
        .select(
            query_id_col, id_col, "dot_i", (F.col("dot_i").cast("double") * F.col("__ss")).alias("score")
        )
    )
    # struct sorts lexicographically; (-dot_i, id) is already a total
    # order (ids unique), so the payload fields never tie-break.
    item = F.struct(
        (-F.col("dot_i")).alias("__nd"),
        F.col(id_col).alias("__id"),
        F.col("dot_i").alias("dot_i"),
        F.col("score").alias("score"),
    )
    topk = lambda c: F.slice(F.array_sort(c), 1, int(k))  # noqa: E731
    local = (
        scored.withColumn("__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(salt_buckets))))
        .groupBy(query_id_col, "__salt")
        .agg(topk(F.collect_list(item)).alias("__top"))
    )
    merged = (
        local.select(query_id_col, F.explode("__top").alias("__e"))
        .groupBy(query_id_col)
        .agg(topk(F.collect_list("__e")).alias("__top"))
    )
    return merged.select(
        query_id_col, F.posexplode("__top").alias("__pos", "__e")
    ).select(
        query_id_col,
        F.col("__e.__id").alias(id_col),
        F.col("__e.dot_i").alias("dot_i"),
        F.col("__e.score").alias("score"),
        (F.col("__pos") + 1).alias("rank"),
    )
