"""Driver queries exercising the ClickHouse SELECT-dialect front end
(``postgre_to_clickhouse_spark.ch_select``) END-TO-END: the query text
below is the EXACT SQL a user of the reference's terminal ClickHouse
24.3 (`/root/reference/docker-compose.yml:157`) would type, compiled
to a Spark plan by the front end, and the DuckDB oracle recomputes the
semantics independently (including the keyed md5 SAMPLE band).
"""

from __future__ import annotations

from postgre_to_clickhouse_spark.queries.registry import register
from postgre_to_clickhouse_spark.queries.tierc8 import _horner_u

_HOURLY_CH = """
SELECT toStartOfHour(ts) AS hour,
       countIf(event_type = 'purchase') AS purchases,
       countIf(event_type = 'view') AS views,
       uniqExact(user_id) AS users
FROM events SAMPLE 0.5 OFFSET 0.25
PREWHERE event_type IN ('view', 'purchase', 'click')
WHERE toHour(ts) >= 6
GROUP BY hour WITH TOTALS
ORDER BY hour
"""


@register(
    "ch_dialect_hourly",
    oracle=f"""
    WITH s AS (
      SELECT * FROM events
      WHERE {_horner_u("sample-v1", "user_id")} >= 0.25
        AND {_horner_u("sample-v1", "user_id")} < 0.75
        AND event_type IN ('view', 'purchase', 'click')
        AND hour(ts) >= 6
    )
    SELECT date_trunc('hour', ts) AS hour,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
           COUNT(DISTINCT user_id) AS users
    FROM s
    GROUP BY GROUPING SETS ((date_trunc('hour', ts)), ())
    """,
)
def ch_dialect_hourly(spark, sf_dir):
    """r9, A22+: the CH-dialect front end run end-to-end on verbatim
    ClickHouse SQL — ``SAMPLE 0.5 OFFSET 0.25`` (keyed md5 band via
    :func:`operators.sampling.sample_consistent`), ``PREWHERE`` (an
    ordinary filter Catalyst pushes into the scan), ``countIf`` /
    ``uniqExact`` / ``toStartOfHour`` name mapping, and ``WITH
    TOTALS`` compiled to grouping sets ``((hour), ())`` — one extra
    all-groups row with a NULL key, exactly what the oracle's GROUPING
    SETS emits. Plan shape: one filtered scan + one partial-aggregable
    grouped agg (the Expand for the two grouping sets) — nothing the
    hand-written DataFrame version wouldn't produce."""
    from postgre_to_clickhouse_spark.ch_select import ChContext, ch_select

    ctx = ChContext.from_sf_dir(spark, sf_dir)
    return ch_select(spark, _HOURLY_CH, ctx)


_TOP_CH = """
SELECT user_id, event_id,
       multiIf(value >= 200, 'high', value >= 50, 'mid', 'low') AS band,
       round(value, 2) AS v
FROM events
PREWHERE value IS NOT NULL
ORDER BY v DESC, event_id
LIMIT 3 BY user_id
"""


@register(
    "ch_dialect_top_events",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id,
             CASE WHEN value >= 200 THEN 'high'
                  WHEN value >= 50 THEN 'mid' ELSE 'low' END AS band,
             ROUND(value, 2) AS v
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY v DESC, event_id) AS rn
      FROM s
    )
    SELECT user_id, event_id, band, v FROM r WHERE rn <= 3
    """,
)
def ch_dialect_top_events(spark, sf_dir):
    """r9, A22+: the CH ``LIMIT n BY key`` clause through the dialect
    front end — top-3 events per user by rounded value, verbatim CH
    text. The front end compiles LIMIT BY to a window band filter
    partitioned by the BY columns and ordered by the query's ORDER BY
    (refusing unordered LIMIT BY loudly — CH leaves that case
    nondeterministic), the same WindowGroupLimit-eligible shape as the
    native ``limit_by_user_events`` query. ``multiIf`` maps to a CASE
    chain; the (v DESC, event_id) order is total, so the kept row set
    is deterministic in both engines."""
    from postgre_to_clickhouse_spark.ch_select import ChContext, ch_select

    ctx = ChContext.from_sf_dir(spark, sf_dir)
    return ch_select(spark, _TOP_CH, ctx)
