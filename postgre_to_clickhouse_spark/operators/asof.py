"""As-of join (SURVEY.md B6) — latest dimension version at fact time.

Spark has no native ASOF JOIN (DuckDB/Pandas do). Two implementations:

- :func:`asof_join` — the scale path: union fact+dim rows tagged by
  side, one window pass per key ordered by (time, side, tiebreak)
  carrying the last-seen dim row forward as a single struct
  (``last(..., ignorenulls=True)``). ONE shuffle on the key, no
  range-join blowup, no per-key quadratic work — this is how you as-of
  join 100 TB of facts to a versioned dimension (the natural companion
  of the CDC ``latest`` view: facts joined to the dimension *as of*
  the fact's event time).
- :func:`asof_join_pandas` — semantic cross-check via
  ``pandas.merge_asof`` inside cogrouped ``applyInPandas``
  (Arrow-batched). Used in tests to validate the window formulation.

Tie semantics: a dim row at exactly fact time matches (``<=``); among
equal dim times the highest ``tiebreak`` wins — both deterministic.
The dim row is carried as one struct, so rows are never mixed even if
individual dim columns are null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_time: str,
    dim_time: str,
    dim_cols: list[str],
    on: str | None = None,
    on_left: str | None = None,
    on_right: str | None = None,
    tiebreak: str | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    strict: bool = False,
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each fact row: the nearest dim row within the same ``on``
    key — ``direction="backward"`` (default) takes the dim with max
    ``(dim_time, tiebreak)`` where ``dim_time <= fact_time``;
    ``"forward"`` the dim with min ``dim_time`` (highest ``tiebreak``
    among equals) where ``dim_time >= fact_time``. ``strict=True``
    excludes the equal-time match (ClickHouse ASOF's ``<`` / ``>``
    operators; default covers its ``<=`` / ``>=``). ``tolerance_us``
    nulls the match when |fact_time − dim_time| exceeds the bound in
    microseconds (pandas ``merge_asof(tolerance=...)`` semantics).
    Output = fact columns + ``dim_cols`` renamed with ``suffix`` (null
    when nothing matches). Key columns: ``on`` when both sides share
    the name, else ``on_left``/``on_right``.

    All variants keep the one-shuffle union+window shape: direction
    only flips the window's time ordering, strictness only flips which
    side sorts first at equal times, and tolerance is a post-window
    map-side filter on the carried dim time."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on_left, on_right = (on, on) if on is not None else (on_left, on_right)
    dstruct_t = dim.select(F.struct(*[F.col(c) for c in dim_cols]).alias("s")).schema[0].dataType
    fstruct_t = fact.select(F.struct(*fact.columns).alias("s")).schema[0].dataType

    # at equal __t the side ordered FIRST is visible to the other:
    # non-strict → dim first (equal-time dim matches), strict → fact first
    fact_side, dim_side = (1, 0) if not strict else (0, 1)
    f_tagged = fact.select(
        F.col(on_left).alias("__k"),
        F.col(fact_time).alias("__t"),
        F.lit(fact_side).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        F.struct(*fact.columns).alias("__fact"),
        F.lit(None).cast(dstruct_t).alias("__dim"),
    )
    tb = F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")
    d_tagged = dim.select(
        F.col(on_right).alias("__k"),
        F.col(dim_time).alias("__t"),
        F.lit(dim_side).alias("__side"),
        tb.alias("__tb"),
        F.lit(None).cast(fstruct_t).alias("__fact"),
        F.struct(*[F.col(c) for c in dim_cols]).alias("__dim"),
    )
    unioned = f_tagged.unionByName(d_tagged)
    t_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.col("__side"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dim_t = F.when(F.col("__side") == dim_side, F.col("__t"))
    carried = unioned.select(
        "__side",
        "__fact",
        F.col("__t").alias("__ft"),
        F.last("__dim", ignorenulls=True).over(w).alias("__c"),
        F.last(dim_t, ignorenulls=True).over(w).alias("__ct"),
    )
    out = carried.filter(F.col("__side") == fact_side)
    if tolerance_us is not None:
        gap = F.abs(F.unix_micros(F.col("__ft")) - F.unix_micros(F.col("__ct")))
        out = out.withColumn(
            "__c", F.when(gap <= F.lit(int(tolerance_us)), F.col("__c"))
        )
    return out.select(
        "__fact.*",
        *[F.col(f"__c.{c}").alias(f"{c}{suffix}") for c in dim_cols],
    )


def asof_join_pandas(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_time: str,
    dim_time: str,
    dim_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """merge_asof reference implementation (cogrouped applyInPandas).

    Arrow-batched; fine when each key's history fits an executor — the
    semantic oracle for :func:`asof_join` in tests. Note merge_asof
    resolves equal-time dim ties by taking the LAST sorted row, so we
    pre-sort dims by (time) with a stable sort after ordering by the
    natural row order — callers should dedup ties first if they need a
    specific tiebreak column.
    """
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    out_fields = [StructField(f.name, f.dataType, True) for f in fact.schema.fields] + [
        StructField(f"{c}{suffix}", dim.schema[c].dataType, True) for c in dim_cols
    ]
    out_schema = StructType(out_fields)
    dim_small = dim.select(*dict.fromkeys([on, dim_time, *dim_cols]))

    def merge(key, f_pdf, d_pdf):
        f_pdf = f_pdf.sort_values(fact_time, kind="mergesort")
        ren = {c: f"{c}{suffix}" for c in dim_cols}
        if d_pdf.empty:
            out = f_pdf.copy()
            for c in dim_cols:
                out[f"{c}{suffix}"] = None
            return out[[fld.name for fld in out_fields]]
        d_pdf = d_pdf.sort_values(dim_time, kind="mergesort").rename(columns=ren)
        right_time = ren.get(dim_time, dim_time)
        merged = pd.merge_asof(
            f_pdf, d_pdf, left_on=fact_time, right_on=right_time,
            direction="backward", suffixes=("", "__d"),
        )
        return merged[[fld.name for fld in out_fields]]

    return (
        fact.groupBy(on)
        .cogroup(dim_small.groupBy(on))
        .applyInPandas(lambda k, left, right: merge(k, left, right), schema=out_schema)
    )


def asof_join_nearest(
    fact: DataFrame,
    dim: DataFrame,
    fact_time: str,
    dim_time: str,
    dim_cols: list[str],
    on: str | None = None,
    on_left: str | None = None,
    on_right: str | None = None,
    tiebreak: str | None = None,
    suffix: str = "_asof",
    tolerance_us: int | None = None,
) -> DataFrame:
    """pandas ``merge_asof(direction="nearest")`` parity: each fact
    takes whichever of its backward (≤) and forward (≥) matches is
    closer in time, ties to the BACKWARD match (pandas' rule). Built
    as the two directional passes (each one shuffle) + a map-side
    pick — no new shuffle shape. ``tolerance_us`` bounds both sides."""
    on_left, on_right = (on, on) if on is not None else (on_left, on_right)
    kw = dict(
        fact_time=fact_time,
        dim_time=dim_time,
        on_left=on_left,
        on_right=on_right,
        tiebreak=tiebreak,
        tolerance_us=tolerance_us,
    )
    # carry each side's dim time so the pick can compare distances
    aug_cols = list(dict.fromkeys([dim_time, *dim_cols]))
    back = asof_join(fact, dim, dim_cols=aug_cols, suffix="__b", direction="backward", **kw)
    fwd = asof_join(back, dim, dim_cols=aug_cols, suffix="__f", direction="forward", **kw)
    ft = F.unix_micros(F.col(fact_time))
    bt = F.unix_micros(F.col(f"{dim_time}__b"))
    ftt = F.unix_micros(F.col(f"{dim_time}__f"))
    # pick backward when forward is null, or when backward exists and is
    # at least as close (pandas resolves exact ties backward)
    use_back = F.col(f"{dim_time}__b").isNotNull() & (
        F.col(f"{dim_time}__f").isNull() | ((ft - bt) <= (ftt - ft))
    )
    out = fwd
    for c in dim_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(use_back, F.col(f"{c}__b")).otherwise(F.col(f"{c}__f")),
        )
    drop = [f"{c}__b" for c in aug_cols] + [f"{c}__f" for c in aug_cols]
    return out.drop(*drop)
