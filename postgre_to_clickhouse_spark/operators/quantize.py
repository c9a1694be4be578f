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

from pyspark.sql import Column, DataFrame, Window
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
) -> DataFrame:
    """Top-k by EXACT integer dot product of int8 codes, scaled back to
    an approximate float score (`score ≈ cosine numerator`). Ranking
    ties break on id → fully deterministic. The query side (its codes +
    scale) is broadcast; the corpus scan never shuffles until the final
    per-query top-k."""
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
    w = Window.partitionBy(query_id_col).orderBy(F.col("dot_i").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
