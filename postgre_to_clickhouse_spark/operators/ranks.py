"""Distributed prefix sums over an ordered value domain — the shared
core of the rank-based statistics (mannWhitneyUTest, arrayAUC,
kolmogorovSmirnovTest) and any future cumulative-over-values operator.

A global cumulative needs a total order, but a single-partition window
over the value domain is the canonical 100 TB cliff. The two-phase
shape here avoids it: values hash into ORDERED range buckets (bounds
from one 1-row agg, broadcast), the requested sums prefix-cumulate
WITHIN each bucket (a partitioned window), and per-bucket totals — a
constant-bounded table (``n_buckets`` rows) — prefix-cumulate once and
broadcast back as offsets. The only unpartitioned window in the plan
runs over that constant-bounded bucket table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_prefix_sums(
    df: DataFrame,
    order_col: str,
    sum_cols: Sequence[str],
    n_buckets: int = 1024,
    prefix: str = "cum_",
) -> DataFrame:
    """For each row of ``df`` (one row per DISTINCT ``order_col``
    value), add ``{prefix}{c}`` = the inclusive prefix sum of ``c``
    over rows with ``order_col`` ≤ this row's value. ``df`` must hold
    numeric ``sum_cols`` and a numeric/orderable ``order_col`` whose
    rows are unique per value (reduce first — that reduction is what
    bounds this table by value cardinality, not fact rows)."""
    bounds = df.agg(
        F.min(order_col).alias("__lo"), F.max(order_col).alias("__hi")
    )
    step = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    b = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__bkt",
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor((F.col(order_col) - F.col("__lo")) / step).cast("int"),
            )
        ),
    )
    bt = b.groupBy("__bkt").agg(
        *[F.sum(c).alias(f"__b_{c}") for c in sum_cols]
    )
    wb = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bt.select(
        "__bkt",
        *[
            F.coalesce(F.sum(f"__b_{c}").over(wb), F.lit(0)).alias(f"__o_{c}")
            for c in sum_cols
        ],
    )
    win = Window.partitionBy("__bkt").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = b.join(F.broadcast(offsets), "__bkt")
    for c in sum_cols:
        out = out.withColumn(
            f"{prefix}{c}", F.col(f"__o_{c}") + F.sum(c).over(win)
        )
    return out.drop(
        "__bkt", "__lo", "__hi", *[f"__o_{c}" for c in sum_cols]
    )


def tie_averaged_ranks(
    df: DataFrame, value_col: str, count_col: str, n_buckets: int = 1024
) -> DataFrame:
    """Add ``avg_rank`` (exact half-integer, ties averaged — the
    mannWhitneyUTest / arrayAUC rank convention) to a per-distinct-
    value count table via :func:`bucketed_prefix_sums`."""
    cum = bucketed_prefix_sums(df, value_col, [count_col], n_buckets)
    return cum.withColumn(
        "rk", F.col(f"cum_{count_col}") - F.col(count_col) + 1
    ).withColumn("avg_rank", F.col("rk") + (F.col(count_col) - 1) / 2.0)
