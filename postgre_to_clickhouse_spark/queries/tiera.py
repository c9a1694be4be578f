"""Tier A — the reference's own CDC operator surface, exercised over the
driver's ``events`` stream table (the DuckDB oracle only sees the
pre-registered analytics tables, so the CDC semantics are expressed on
``events``; the reference-shaped `users` fixture pipeline is covered by
tests/test_cdc_pipeline.py goldens).

Mapping (SURVEY.md §2.1–2.3):
- A13–A17 (MV projection/alias/arithmetic/µs-truncation-cast/metadata)
  → ``cdc_mv_transform``: runs the *actual* ``us_to_timestamp`` operator
  on epoch-µs values derived from ``ts``.
- A19 (ReplacingMergeTree redelivery-dedup) → ``cdc_dedup_redelivery``:
  the engine's ``dedup_redelivery`` with (user_id, event_type) as sort
  key and (ts, event_id) arrival order.
- A20 (latest-wins / FINAL view) → ``cdc_latest_state``: the engine's
  ``latest`` per user_id versioned by (ts, event_id).
- A21 (full scan) → ``cdc_full_scan`` (projection-pruned scan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.cdc import dedup_redelivery, latest
from postgre_to_clickhouse_spark.cdc.transform import us_to_timestamp
from postgre_to_clickhouse_spark.queries.registry import register
from postgre_to_clickhouse_spark.session import configure


@register(
    "cdc_full_scan",
    oracle="SELECT event_id, user_id, event_type, ts, value FROM events",
)
def cdc_full_scan(spark, sf_dir):
    """A21: SELECT * verify scan (column-pruned to the stable columns)."""
    configure(spark)
    return catalog.load(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts", "value")


@register(
    "cdc_mv_transform",
    oracle="""
    SELECT event_id,
           user_id,
           upper(event_type) AS event_type_uc,
           epoch_us(ts) AS ts_us,
           date_trunc('second', ts) AS ts_sec,
           CAST(FLOOR(value * 100) AS INTEGER) AS value_cents
    FROM events
    """,
)
def cdc_mv_transform(spark, sf_dir):
    """A13–A17: projection + alias + scalar arithmetic + the µs→s
    truncating cast (CH ``toDateTime(x/1000000)`` parity,
    /root/reference/README.md:226) round-tripped through epoch-µs."""
    configure(spark)
    ev = catalog.load(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.col("user_id"),
        F.upper("event_type").alias("event_type_uc"),
        F.unix_micros("ts").alias("ts_us"),
        us_to_timestamp(F.unix_micros("ts")).alias("ts_sec"),
        F.floor(F.col("value") * 100).cast("int").alias("value_cents"),
    )


@register(
    "cdc_dedup_redelivery",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_dedup_redelivery(spark, sf_dir):
    """A19: deterministic first-arrival dedup per sort key."""
    configure(spark)
    ev = catalog.load(spark, sf_dir, "events")
    out = dedup_redelivery(ev, sort_key=("user_id", "event_type"), arrival_order=("ts", "event_id"))
    return out.select("event_id", "user_id", "event_type", "ts", "value")


@register(
    "cdc_latest_state",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           ts AS last_ts, value AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_latest_state(spark, sf_dir):
    """A20: latest-wins per entity — the FINAL/argMax view."""
    configure(spark)
    ev = catalog.load(spark, sf_dir, "events")
    out = latest(ev, entity_key=("user_id",), version_cols=("ts", "event_id"))
    return out.select(
        F.col("user_id"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("ts").alias("last_ts"),
        F.col("value").alias("last_value"),
    )
