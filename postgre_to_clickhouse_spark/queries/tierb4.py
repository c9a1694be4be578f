"""Tier B round-5 additions: ClickHouse aggregate-parity extras —
``quantileExactWeighted`` and the ``argMax``/``argMin`` family, both as
deterministic window/aggregate compositions with full SQL oracles.

Reference context: these are staples of the ClickHouse endpoint the
reference lands data in (`/root/reference/README.md:176-177`); Spark
has no built-in weighted exact quantile, so it is composed from a
cumulative-weight window — the textbook definition ClickHouse
implements natively.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.queries.registry import register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


@register(
    "weighted_quantile_events",
    oracle="""
    WITH w AS (
      SELECT event_type, value, user_id % 5 + 1 AS wt FROM events
    ),
    cum AS (
      SELECT event_type, value, wt,
             sum(wt) OVER (PARTITION BY event_type ORDER BY value, wt
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             sum(wt) OVER (PARTITION BY event_type) AS tw
      FROM w
    )
    SELECT event_type,
           min(CASE WHEN CAST(cw AS DOUBLE) >= 0.5 * CAST(tw AS DOUBLE)
                    THEN value END) AS wmedian,
           min(CASE WHEN CAST(cw AS DOUBLE) >= 0.9 * CAST(tw AS DOUBLE)
                    THEN value END) AS wp90
    FROM cum GROUP BY event_type
    """,
)
def weighted_quantile_events(spark, sf_dir):
    """ClickHouse ``quantileExactWeighted`` parity: the smallest value
    whose cumulative weight reaches q x total weight, per event type
    (weight = a deterministic per-row integer). One per-group window
    for the running weight + one aggregate — the exact-weighted
    definition, no sampling. Ordering ties broken by (value, wt) so the
    cumulative sums are identical across engines. At 100 TB the window
    sorts per group; for heavy groups switch to the two-pass histogram
    cut (bucket counts -> locate quantile bucket -> rescan bucket)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "value", (F.col("user_id") % 5 + 1).alias("wt")
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("value", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ev.select(
        "event_type",
        "value",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(Window.partitionBy("event_type")).alias("tw"),
    )
    pick = lambda q: F.min(  # noqa: E731 — tiny local combinator
        F.when(F.col("cw").cast("double") >= q * F.col("tw").cast("double"), F.col("value"))
    )
    return cum.groupBy("event_type").agg(
        pick(0.5).alias("wmedian"), pick(0.9).alias("wp90")
    )


@register(
    "argminmax_events",
    oracle="""
    WITH ranked AS (
      SELECT event_type, user_id, value, ts,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id DESC) AS rmax,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rmin
      FROM events
    )
    SELECT event_type,
           max(CASE WHEN rmax = 1 THEN user_id END) AS argmax_user,
           max(CASE WHEN rmax = 1 THEN value END) AS max_value,
           max(CASE WHEN rmin = 1 THEN user_id END) AS argmin_user,
           max(CASE WHEN rmin = 1 THEN value END) AS min_value
    FROM ranked GROUP BY event_type
    """,
)
def argminmax_events(spark, sf_dir):
    """ClickHouse ``argMax``/``argMin`` parity: the user attached to the
    extreme value per event type. ClickHouse leaves ties undefined; this
    engine fixes them by event_id so the answer is total and engine-
    checkable. Two rank windows + one aggregate; at scale the same
    result comes from a max_by on a (value, event_id) struct — a
    partial-aggregable shape with no window (the `latest` CDC operator
    is exactly that form); the window form here keeps the oracle
    trivially parallel."""
    ev = _t(spark, sf_dir, "events")
    wmax = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id").desc())
    wmin = Window.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    ranked = ev.select(
        "event_type",
        "user_id",
        "value",
        F.row_number().over(wmax).alias("rmax"),
        F.row_number().over(wmin).alias("rmin"),
    )
    return ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rmax") == 1, F.col("user_id"))).alias("argmax_user"),
        F.max(F.when(F.col("rmax") == 1, F.col("value"))).alias("max_value"),
        F.max(F.when(F.col("rmin") == 1, F.col("user_id"))).alias("argmin_user"),
        F.max(F.when(F.col("rmin") == 1, F.col("value"))).alias("min_value"),
    )
