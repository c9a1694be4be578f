"""Random-projection (Johnson-Lindenstrauss) dimensionality reduction
for embedding columns (SURVEY.md C3 scale path).

At 100 TB the embedding column dominates storage and every similarity
shuffle moves it; a seeded ±1 sign projection (Achlioptas, "Database-
friendly random projections") compresses d → k while approximately
preserving pairwise distances/cosines, so candidate generation (top-k,
LSH bucketing, clustering) runs on the short vectors and only the
re-rank touches the originals.

Scale shape: the sign matrix is a MODEL CONSTANT — (k × d) entries
derived from md5(seed:i:j), computed driver-side in Python and folded
into one array-of-arrays literal, exactly like the IVF centroids
(``operators/ann.py``). The projection is therefore a pure map-side
expression: no join, no shuffle, no Python row path, whole-stage
codegen. Determinism is content-addressed — any engine (the DuckDB
oracle included) rebuilds the identical matrix from the seed.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sign_matrix(out_dim: int, in_dim: int, seed: str = "rp-v1") -> list[list[float]]:
    """The deterministic ±1 projection matrix: entry (i, j) is +1 when
    the first hex char of md5("{seed}:{i}:{j}") is < '8' (an unbiased
    coin on a uniform nibble), else −1. Reproducible by any engine with
    md5 — the DuckDB oracle recomputes it in SQL."""
    return [
        [
            1.0 if hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[0] in "01234567" else -1.0
            for j in range(in_dim)
        ]
        for i in range(out_dim)
    ]


def project_expr(vec_col: str | Column, out_dim: int, in_dim: int, seed: str = "rp-v1") -> Column:
    """array<double> of length ``out_dim``: y_i = Σ_j s(i,j)·x_j.

    Unnormalized — the 1/√k JL scale factor is a global constant that
    cancels in cosine similarity, so it is omitted to keep the fold
    bit-reproducible with the oracle's list_sum. Sequential left fold
    per output dim (same evaluation order as the DuckDB oracle's
    ``list_sum(list_transform(list_zip(...)))``)."""
    m = sign_matrix(out_dim, in_dim, seed)
    if isinstance(vec_col, str):
        # r16: the whole matrix-fold as ONE SQL expression string — the
        # out_dim F.lit(list) py4j conversions plus the three
        # higher-order lambdas cost ~0.7 s of driver construction per
        # build; the parsed tree is the identical transform/aggregate/
        # zip_with chain with the same double literals and the same
        # left-fold order, so values are bit-equal (the batch-5
        # expr-string pattern).
        # the {x:.1f} rendering is exact ONLY because sign_matrix
        # returns exactly ±1.0 — guard it so a future generator change
        # (e.g. Gaussian entries) fails loudly instead of silently
        # rounding this branch to one decimal while the Column branch
        # below stays full-precision (r17, ADVICE r16)
        if any(x not in (1.0, -1.0) for row in m for x in row):
            raise AssertionError(
                "project_expr's SQL-string branch assumes a ±1.0 sign "
                "matrix; got non-sign entries — render with full "
                "precision (repr) before relaxing this"
            )
        rows = ", ".join(
            "array(" + ", ".join(f"{x:.1f}D" for x in row) + ")" for row in m
        )
        return F.expr(
            f"transform(array({rows}), s -> aggregate("
            f"zip_with(`{vec_col}`, s, (a, b) -> CAST(a AS DOUBLE) * b), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
        )
    vec = vec_col
    mat = F.array(*[F.lit(row) for row in m])
    return F.transform(
        mat,
        lambda s: F.aggregate(
            F.zip_with(vec, s, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_dim: int = 16,
    in_dim: int = 64,
    seed: str = "rp-v1",
) -> DataFrame:
    """(id, proj) with ``proj`` the projected array<double>. Pure
    projection — the plan has no exchange (gated in tests/test_plans.py)."""
    return df.select(F.col(id_col), project_expr(vec_col, out_dim, in_dim, seed).alias("proj"))
