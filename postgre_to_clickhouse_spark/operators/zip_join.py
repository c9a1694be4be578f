"""Positional (zip) join — the engine for ClickHouse ``PASTE JOIN``
(CH 23.11+: horizontal gluing of two result sets by row position;
reference terminal CH 24.3, `/root/reference/docker-compose.yml`).

CH's PASTE JOIN matches rows purely by their position in each input
stream, which is only meaningful when both inputs have a defined
order. This engine therefore requires an explicit ORDER for each side
and zips by GLOBAL ROW INDEX under that order — stricter than CH
(whose PASTE over unordered inputs is nondeterministic), never
silently wrong.

Scale shape: the global index is NOT a single-partition window. Each
side is range-partitioned on its order key and sorted within
partitions (the standard distributed sort), then numbered per
partition and shifted by broadcast per-partition count offsets — two
small shuffles plus a partition-count-sized broadcast, the same
banded-offsets trick as ``operators.ranks.bucketed_prefix_sums``. The
final zip is an equi-join on the index. Rows beyond the shorter side
drop (CH's min-length contract). Ties in the order key order
arbitrarily-but-consistently within one execution, exactly like any
distributed ORDER BY — use a unique key for full determinism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_index", "paste_join"]


def global_row_index(
    df: DataFrame,
    order_cols: Sequence[tuple[str, bool]],
    idx_col: str = "__row_idx",
) -> DataFrame:
    """Add a 1-based global row index under the total order given by
    ``order_cols`` ([(name, ascending)]), without a single-partition
    window: range-partition + sort-within, per-partition row_number,
    broadcast partition-count offsets."""
    if not order_cols:
        raise ValueError("global_row_index needs at least one order column")
    sort_exprs = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_cols
    ]
    d = (
        df.repartitionByRange(*sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumn("__pid", F.spark_partition_id())
    )
    w = Window.partitionBy("__pid").orderBy(*sort_exprs)
    numbered = d.withColumn("__rn", F.row_number().over(w))
    counts = d.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(wo), F.lit(0)).alias("__off"),
    )
    return (
        numbered.join(F.broadcast(offsets), "__pid")
        .withColumn(idx_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


def paste_join(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[tuple[str, bool]],
    right_order: Sequence[tuple[str, bool]],
) -> DataFrame:
    """Zip two frames row-by-row under their respective orders —
    ClickHouse ``PASTE JOIN`` with an explicit order requirement.
    Output columns = left's then right's (duplicate names refuse:
    CH would emit ambiguous columns; this engine won't). Length =
    min(len(left), len(right)) — CH's own contract."""
    dup = sorted(set(left.columns) & set(right.columns))
    if dup:
        raise ValueError(
            f"PASTE JOIN sides share column name(s) {dup} — alias them "
            "apart in the subqueries first"
        )
    li = global_row_index(left, left_order, "__paste_idx")
    ri = global_row_index(right, right_order, "__paste_idx")
    return (
        li.join(ri, "__paste_idx", "inner")
        .select(*left.columns, *right.columns)
    )
