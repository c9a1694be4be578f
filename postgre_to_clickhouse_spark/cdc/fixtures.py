"""Deterministic CDC event fixtures (FIXTURES.md §1.1).

Plays the role of PG→Debezium→Kafka (SURVEY.md §3.1 steps 1–6) for
self-contained tests: the reference's three seed rows
(``/root/reference/README.md:108-111``) plus the scenarios the §2.3
semantic note requires — updates (new versions), an exact redelivery
(same ``(user_id, updated_at)``, later offset), an out-of-order delivery
(later offset, *earlier* version), and a delete.

Literal event lists, zero randomness — golden expectations in the tests
are hand-computed from these.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from postgre_to_clickhouse_spark.cdc.schemas import KAFKA_CDC_RECORD

_UTC = dt.timezone.utc


def _us(y, mo, d, h=0, mi=0, s=0, us=0) -> int:
    return int(dt.datetime(y, mo, d, h, mi, s, us, tzinfo=_UTC).timestamp() * 1_000_000)


def _ts(y, mo, d, h=0, mi=0, s=0) -> dt.datetime:
    return dt.datetime(y, mo, d, h, mi, s, tzinfo=_UTC)


def _event(op, after, before=None, lsn=0, ts_ms=0):
    return {
        "before": before,
        "after": after,
        "source": {"db": "shop", "schema": "public", "table": "users", "lsn": lsn},
        "op": op,
        "ts_ms": ts_ms,
    }


def _row(user_id, username, account_type, updated_at, created_at):
    return {
        "user_id": user_id,
        "username": username,
        "account_type": account_type,
        "updated_at": updated_at,
        "created_at": created_at,
    }


# created_at for all seed rows; µs component present to pin truncation.
_CREATED = _us(2024, 3, 1, 10, 0, 0, 123_456)

# (envelope, kafka_timestamp, kafka_offset, kafka_partition)
_RECORDS = [
    # (a) three seed inserts — the reference's own demo data (README.md:108-111)
    (_event("c", _row(1, "john_doe", "Gold", _us(2024, 3, 1, 10, 0, 0, 123_456), _CREATED), lsn=100),
     _ts(2024, 3, 1, 10, 0, 1), 0, 0),
    (_event("c", _row(2, "jane_smith", "Silver", _us(2024, 3, 1, 10, 0, 5, 654_321), _CREATED), lsn=101),
     _ts(2024, 3, 1, 10, 0, 6), 1, 0),
    (_event("c", _row(3, "bob_wilson", "Bronze", _us(2024, 3, 1, 10, 0, 9), _CREATED), lsn=102),
     _ts(2024, 3, 1, 10, 0, 10), 2, 0),
    # (b) update: john Gold → Silver, new version
    (_event("u", _row(1, "john_doe", "Silver", _us(2024, 3, 2, 9, 0, 0, 999_999), _CREATED),
            before=_row(1, "john_doe", "Gold", _us(2024, 3, 1, 10, 0, 0, 123_456), _CREATED), lsn=200),
     _ts(2024, 3, 2, 9, 0, 1), 3, 0),
    # (c) exact redelivery of offset 3 (same user_id+updated_at, new offset)
    (_event("u", _row(1, "john_doe", "Silver", _us(2024, 3, 2, 9, 0, 0, 999_999), _CREATED),
            before=_row(1, "john_doe", "Gold", _us(2024, 3, 1, 10, 0, 0, 123_456), _CREATED), lsn=200),
     _ts(2024, 3, 2, 9, 0, 2), 4, 0),
    # (b2) update: jane Silver → Gold
    (_event("u", _row(2, "jane_smith", "Gold", _us(2024, 3, 3, 12, 30, 0), _CREATED),
            before=_row(2, "jane_smith", "Silver", _us(2024, 3, 1, 10, 0, 5, 654_321), _CREATED), lsn=201),
     _ts(2024, 3, 3, 12, 30, 1), 5, 0),
    # (d) out-of-order: a stale update for jane arrives later (earlier version)
    (_event("u", _row(2, "jane_smith", "Bronze", _us(2024, 3, 2, 8, 0, 0), _CREATED),
            before=_row(2, "jane_smith", "Silver", _us(2024, 3, 1, 10, 0, 5, 654_321), _CREATED), lsn=150),
     _ts(2024, 3, 3, 12, 31, 0), 6, 0),
    # (e) delete for bob — dropped by default unwrap (SMT default drops deletes)
    (_event("d", None,
            before=_row(3, "bob_wilson", "Bronze", _us(2024, 3, 1, 10, 0, 9), _CREATED), lsn=300),
     _ts(2024, 3, 4, 0, 0, 1), 7, 0),
]


def users_cdc_events(spark: SparkSession) -> DataFrame:
    """The fixture change stream as a typed DataFrame (KAFKA_CDC_RECORD)."""
    rows = [
        {"event": env, "kafka_timestamp": kts, "kafka_offset": off, "kafka_partition": part}
        for env, kts, off, part in _RECORDS
    ]
    return spark.createDataFrame(rows, schema=KAFKA_CDC_RECORD)


# Hand-computed goldens (user_id, username, account_type) for the two
# read semantics, post-pipeline:
GOLDEN_ALL_VERSIONS = {  # dedup_redelivery → one row per (user_id, updated_at)
    (1, "2024-03-01 10:00:00"): ("john_doe", "Gold"),
    (1, "2024-03-02 09:00:00"): ("john_doe", "Silver"),
    (2, "2024-03-01 10:00:05"): ("jane_smith", "Silver"),
    (2, "2024-03-02 08:00:00"): ("jane_smith", "Bronze"),
    (2, "2024-03-03 12:30:00"): ("jane_smith", "Gold"),
    (3, "2024-03-01 10:00:09"): ("bob_wilson", "Bronze"),
}
GOLDEN_LATEST = {  # latest() per user_id — max version wins despite arrival order
    1: ("john_doe", "Silver", "2024-03-02 09:00:00"),
    2: ("jane_smith", "Gold", "2024-03-03 12:30:00"),
    3: ("bob_wilson", "Bronze", "2024-03-01 10:00:09"),
}
