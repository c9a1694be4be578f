"""Bounded-communication heavy hitters (ClickHouse ``topK`` parity).

ClickHouse's ``topK(k)`` aggregate runs the SpaceSaving sketch (Metwally
et al., "Efficient computation of frequent and top-k elements in data
streams") per thread and merges the summaries. The Spark-native
equivalent below keeps the same guarantee structure while staying
entirely JVM-side:

1. per-partition EXACT counts (Spark's partial hash aggregate — spills
   if a partition's distinct set is huge, so memory is already safe),
2. per-partition truncation to the ``capacity`` most frequent items,
   remembering the largest dropped count ``d_p`` (the Misra-Gries /
   SpaceSaving error term),
3. a merge whose shuffle volume is AT MOST ``P x capacity`` rows — the
   whole point at scale: the global heavy-hitter merge never moves the
   full vocabulary, only each partition's capped summary,
4. per-item bounds: ``lb = sum of counts where kept``;
   ``ub = lb + sum(d_p over partitions where the item was dropped)``
   (an item absent from partition p's summary occurred <= d_p times
   there). ``capacity >= per-partition distinct`` makes every d_p = 0
   and the result EXACT — the regime the oracle-graded query runs in.

Determinism: in the exact regime the output is layout-independent. In
the truncated regime the summaries (and therefore the bounds) depend on
partitioning — inherent to every mergeable heavy-hitter sketch; tests
pin the layout with an explicit repartition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def partition_summaries(
    items: DataFrame,
    item_col: str = "item",
    capacity: int = 4096,
    weight_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(kept, bounds): per-partition capped counts and error terms.

    ``kept``  — (pid, item, c): the <= capacity most frequent items of
    each partition with their exact in-partition counts.
    ``bounds`` — (pid, d): the largest dropped count per partition;
    partitions that dropped nothing produce no row (d treated as 0).
    ``weight_col`` switches the mass from row counts to an integer
    weight sum — ClickHouse ``topKWeighted``; every bound argument
    holds verbatim with "count" read as "weight mass".
    """
    sel = [F.col(item_col).alias("item")] + (
        [F.col(weight_col).alias("__w")] if weight_col else []
    )
    part = items.select(*sel).withColumn("pid", F.spark_partition_id())
    mass = F.sum("__w") if weight_col else F.count(F.lit(1))
    counts = part.groupBy("pid", "item").agg(mass.cast("long").alias("c"))
    w = Window.partitionBy("pid").orderBy(F.col("c").desc(), F.col("item").asc())
    ranked = counts.withColumn("__r", F.row_number().over(w))
    kept = ranked.filter(F.col("__r") <= capacity).drop("__r")
    bounds = (
        ranked.filter(F.col("__r") > capacity)
        .groupBy("pid")
        .agg(F.max("c").alias("d"))
    )
    return kept, bounds


def approx_topk(
    items: DataFrame,
    item_col: str = "item",
    k: int = 10,
    capacity: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Top-k items by frequency with SpaceSaving-style bounds.

    Output: (rank, item, lb, ub) — rank over (lb desc, item asc).
    ``lb <= true count <= ub`` always; ``lb == ub == true count`` when
    no partition truncated. The final candidate set is at most
    ``P x capacity`` rows, so the orderBy().limit() plans as
    TakeOrderedAndProject (per-partition heaps + k-row driver merge),
    and the rank window runs over k rows — nothing global ever sorts.
    """
    kept, bounds = partition_summaries(items, item_col, capacity, weight_col)
    total_d = bounds.agg(F.coalesce(F.sum("d"), F.lit(0)).alias("__D"))
    merged = (
        kept.join(bounds, "pid", "left")
        .groupBy("item")
        .agg(
            F.sum("c").cast("bigint").alias("lb"),
            # sum of error terms for partitions whose summary INCLUDED
            # the item — those partitions' counts are exact for it
            F.sum(F.coalesce(F.col("d"), F.lit(0))).alias("__present_d"),
        )
        .crossJoin(F.broadcast(total_d))
        .select(
            "item",
            "lb",
            (F.col("lb") + F.col("__D") - F.col("__present_d")).cast("bigint").alias("ub"),
        )
    )
    top = merged.orderBy(F.col("lb").desc(), F.col("item").asc()).limit(k)
    rw = Window.orderBy(F.col("lb").desc(), F.col("item").asc())
    return top.select(
        F.row_number().over(rw).cast("bigint").alias("rank"), "item", "lb", "ub"
    )


def tokens_of(df: DataFrame, text_col: str = "text") -> Column:
    """The battery's canonical tokenizer: lowercase [a-z0-9]+ runs —
    the SAME definition the DuckDB oracles use
    (``regexp_extract_all(lower(text), '[a-z0-9]+')``), so operator and
    oracle share one tokenizer even when text contains underscores or
    non-ASCII word characters."""
    return F.explode(
        F.filter(F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != "")
    )


def quantile_summaries(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    capacity: int = 65536,
) -> DataFrame:
    """Mergeable per-partition quantile summaries — the ClickHouse
    ``quantileState``/``quantileTDigest`` pattern with the same
    structure as :func:`partition_summaries`:

    1. per (partition, group): EXACT distinct-value weights (partial
       hash aggregate — already spill-safe),
    2. rank-preserving compaction to ≤ ``capacity`` rows per
       (partition, group): consecutive sorted values pool into
       ``ceil(m/capacity)``-wide buckets carrying (bucket max value,
       bucket mass) — the GK-style summary whose rank error per
       partition is at most one bucket's mass,
    3. the output (group, value, w) rows union-merge by concatenation
       (≤ P × capacity rows per group cross the wire, never the data).

    ``capacity ≥ per-(partition, group) distinct values`` makes the
    summary EXACT — the regime the oracle-graded query runs in; the
    truncated regime's rank-error bound is asserted in tests.
    """
    gcols = list(group_cols)
    part = (
        df.select(*gcols, F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("pid", F.spark_partition_id())
    )
    counts = part.groupBy("pid", *gcols, "v").agg(F.count(F.lit(1)).alias("w"))
    kw = Window.partitionBy("pid", *gcols).orderBy("v")
    m = Window.partitionBy("pid", *gcols)
    ranked = counts.select(
        *gcols,
        "v",
        "w",
        F.row_number().over(kw).alias("__r"),
        F.count(F.lit(1)).over(m).alias("__m"),
        F.col("pid"),
    )
    stride = F.ceil(F.col("__m") / F.lit(int(capacity))).cast("long")
    bucketed = ranked.withColumn("__b", F.floor((F.col("__r") - 1) / stride))
    return bucketed.groupBy("pid", *gcols, "__b").agg(
        F.max("v").alias("v"), F.sum("w").cast("long").alias("w")
    ).drop("pid", "__b")


def quantiles_from_summaries(
    summaries: DataFrame,
    qs: Sequence[float],
    group_cols: Sequence[str] = (),
    out_names: Sequence[str] | None = None,
) -> DataFrame:
    """Finalize merged summaries into quantiles per group: smallest
    summary value whose cumulative mass reaches q·W (the
    ``quantileExactWeighted`` rule — exact when the summaries are
    exact). The cumulative window runs over the BOUNDED summary rows
    (≤ P × capacity per group), not the data."""
    gcols = list(group_cols)
    names = list(out_names) if out_names else [f"q{int(q * 100)}" for q in qs]
    merged = summaries.groupBy(*gcols, "v").agg(F.sum("w").alias("w"))
    cw = (
        Window.partitionBy(*gcols).orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        if gcols
        else Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    )
    tw = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    cum = merged.select(
        *gcols,
        "v",
        F.sum("w").over(cw).alias("__cw"),
        F.sum("w").over(tw).alias("__tw"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("__cw").cast("double") >= F.lit(float(q)) * F.col("__tw").cast("double"),
                F.col("v"),
            )
        ).alias(n)
        for q, n in zip(qs, names)
    ]
    return cum.groupBy(*gcols).agg(*aggs)


def approx_topk_grouped(
    items: DataFrame,
    group_col: str,
    item_col: str = "item",
    k: int = 10,
    capacity: int = 4096,
) -> DataFrame:
    """Per-GROUP heavy hitters — ClickHouse ``topK(k)(item)`` used as a
    grouped aggregate (``GROUP BY lang``), same SpaceSaving bound
    structure as :func:`approx_topk`: per-partition exact counts,
    per-(partition, group) truncation to ``capacity`` rows remembering
    the largest dropped count, then a merge whose shuffle is bounded by
    partitions × groups × capacity. Output: (group, rank, item, lb, ub)
    with rank over (lb desc, item) within each group; exact when no
    (partition, group) truncated — the oracle-graded regime."""
    part = items.select(F.col(group_col).alias("g"), F.col(item_col).alias("item")).withColumn(
        "pid", F.spark_partition_id()
    )
    counts = part.groupBy("pid", "g", "item").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.partitionBy("pid", "g").orderBy(F.col("c").desc(), F.col("item").asc())
    ranked = counts.withColumn("__r", F.row_number().over(w))
    kept = ranked.filter(F.col("__r") <= capacity).drop("__r")
    bounds = (
        ranked.filter(F.col("__r") > capacity).groupBy("pid", "g").agg(F.max("c").alias("d"))
    )
    total_d = bounds.groupBy("g").agg(F.coalesce(F.sum("d"), F.lit(0)).alias("__D"))
    merged = (
        kept.join(bounds, ["pid", "g"], "left")
        .groupBy("g", "item")
        .agg(
            F.sum("c").cast("bigint").alias("lb"),
            F.sum(F.coalesce(F.col("d"), F.lit(0))).alias("__present_d"),
        )
        .join(total_d, "g", "left")
        .select(
            "g",
            "item",
            "lb",
            (F.col("lb") + F.coalesce(F.col("__D"), F.lit(0)) - F.col("__present_d"))
            .cast("bigint")
            .alias("ub"),
        )
    )
    rw = Window.partitionBy("g").orderBy(F.col("lb").desc(), F.col("item").asc())
    return (
        merged.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select(
            F.col("g").alias(group_col),
            F.col("rank").cast("bigint").alias("rank"),
            "item",
            "lb",
            "ub",
        )
    )
