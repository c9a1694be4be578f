"""Custom stateful streaming operator (sessionization): batch twin
correctness golden + streaming mode equivalence on a drained stream."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.streaming.stateful import sessionize_batch, sessionize_stream


def _ev(spark):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # user 1: two sessions (gap 45 min > 30)
        (1, base), (1, base + dt.timedelta(minutes=10)), (1, base + dt.timedelta(minutes=20)),
        (1, base + dt.timedelta(minutes=65)), (1, base + dt.timedelta(minutes=70)),
        # user 2: one session
        (2, base), (2, base + dt.timedelta(minutes=29)),
        # user 3: single event
        (3, base + dt.timedelta(minutes=5)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


GOLDEN = {
    (1, "10:00", "10:20", 3),
    (1, "11:05", "11:10", 2),
    (2, "10:00", "10:29", 2),
    (3, "10:05", "10:05", 1),
}


def _norm(rows):
    return {
        (r.user_id, r.session_start.strftime("%H:%M"), r.session_end.strftime("%H:%M"), r.n_events)
        for r in rows
    }


def test_sessionize_batch_golden(spark):
    out = sessionize_batch(_ev(spark), gap_minutes=30)
    assert _norm(out.collect()) == GOLDEN


def test_sessionize_batch_order_insensitive(spark):
    out = sessionize_batch(_ev(spark).orderBy(F.rand(seed=7)), gap_minutes=30)
    assert _norm(out.collect()) == GOLDEN


def test_sessionize_stream_closes_on_data_path(spark, tmp_path):
    """Drive the stateful operator through a real two-file stream: the
    first file holds the early events, the second the late ones, so the
    gap-crossing event arrives in a later micro-batch and closes user
    1's first session via the data path. Open sessions stay in state
    (they close via event-time timeout as the watermark advances in a
    live stream — the availableNow drain ends before that)."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def _line(u, ts):
        return _json.dumps({"user_id": u, "ts": ts.strftime("%Y-%m-%dT%H:%M:%S.000Z")})

    early = [
        _line(1, base), _line(1, base + dt.timedelta(minutes=10)), _line(1, base + dt.timedelta(minutes=20)),
        _line(2, base), _line(2, base + dt.timedelta(minutes=29)),
        _line(3, base + dt.timedelta(minutes=5)),
    ]
    late = [_line(1, base + dt.timedelta(minutes=65)), _line(1, base + dt.timedelta(minutes=70))]
    import os as _os
    import time as _time

    (src / "00_early.json").write_text("\n".join(early) + "\n")
    (src / "01_late.json").write_text("\n".join(late) + "\n")
    # FileStreamSource orders by modification time — pin it so "early"
    # really arrives in the first micro-batch
    now = _time.time()
    _os.utime(src / "00_early.json", (now - 10, now - 10))
    _os.utime(src / "01_late.json", (now, now))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="0 seconds")
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _norm(spark.table("sess").collect())
    assert (1, "10:00", "10:20", 3) in got  # closed by the 11:05 event crossing the gap
    # nothing invented: every emitted session is one of the batch twin's
    assert got <= GOLDEN


def test_sessionize_stream_late_event_does_not_move_end_backwards(spark, tmp_path):
    """Out-of-order ACROSS micro-batches: a within-watermark event with
    ts < the open session's current end arrives in a later batch. The
    session must extend via min/max (end stays 10:20), matching
    sessionize_batch on the same event set — a backwards end would make
    the closing event split the session at the wrong boundary."""
    import json as _json
    import os as _os
    import time as _time

    src = tmp_path / "src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def _line(u, ts):
        return _json.dumps({"user_id": u, "ts": ts.strftime("%Y-%m-%dT%H:%M:%S.000Z")})

    batch1 = [_line(1, base), _line(1, base + dt.timedelta(minutes=20))]
    # 10:10 is LATE (earlier than the session's current end 10:20) but
    # within the 2 h watermark; 11:30 then crosses the 30-min gap and
    # closes the session on the data path.
    batch2 = [_line(1, base + dt.timedelta(minutes=10)), _line(1, base + dt.timedelta(minutes=90))]
    (src / "00_first.json").write_text("\n".join(batch1) + "\n")
    (src / "01_late.json").write_text("\n".join(batch2) + "\n")
    now = _time.time()
    _os.utime(src / "00_first.json", (now - 10, now - 10))
    _os.utime(src / "01_late.json", (now, now))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="2 hours")
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_late")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _norm(spark.table("sess_late").collect())
    all_events = spark.createDataFrame(
        [(1, base), (1, base + dt.timedelta(minutes=20)),
         (1, base + dt.timedelta(minutes=10)), (1, base + dt.timedelta(minutes=90))],
        "user_id long, ts timestamp",
    )
    batch_golden = _norm(sessionize_batch(all_events, gap_minutes=30).collect())
    assert (1, "10:00", "10:20", 3) in got  # end NOT moved backwards by the late 10:10
    assert got <= batch_golden  # every closed session matches the batch twin


def test_sessionize_batch_matches_stream_after_full_close(spark):
    """The batch twin IS the final state once every session closes —
    assert its totals are consistent (events conserved)."""
    out = sessionize_batch(_ev(spark), gap_minutes=30)
    assert out.agg(F.sum("n_events")).collect()[0][0] == 8


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_dedup_stream_ttl_constructs_and_plans(spark, tmp_path):
    """transformWithState needs google.protobuf on the Python workers
    (absent in this sandbox), so runtime is env-gated like the Kafka
    broker paths — but the operator must CONSTRUCT: analysis resolves
    the stateful processor, schemas, and ProcessingTime TTL mode."""
    import json

    from postgre_to_clickhouse_spark.streaming.stateful import dedup_stream_ttl

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        json.dumps({"user_id": 1, "updated_at": "2024-01-01T10:00:00.000Z", "kafka_offset": 0})
        + "\n"
    )
    stream = spark.readStream.schema("user_id long, updated_at timestamp, kafka_offset long").json(
        str(src)
    )
    out = dedup_stream_ttl(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["user_id", "updated_at", "kafka_offset"]
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "TransformWithStateInPySpark" in plan


def test_dedup_stream_ttl_first_delivered_wins(spark, tmp_path):
    """End-to-end drain (runs only where google.protobuf exists): exact
    redelivery collapsed to the min-offset row, versions kept."""
    import datetime as dt
    import json

    import pytest

    if not _protobuf_available():
        pytest.skip("google.protobuf unavailable — transformWithState runtime env-gated")

    from postgre_to_clickhouse_spark.streaming.stateful import dedup_stream_ttl

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = tmp_path / "src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def line(uid, minute, offset):
        ts = (base + dt.timedelta(minutes=minute)).strftime("%Y-%m-%dT%H:%M:%S.000Z")
        return json.dumps({"user_id": uid, "updated_at": ts, "kafka_offset": offset})

    rows = [line(1, 0, 0), line(1, 0, 1), line(1, 5, 2), line(2, 0, 3)]
    (src / "a.json").write_text("\n".join(rows) + "\n")
    stream = spark.readStream.schema("user_id long, updated_at timestamp, kafka_offset long").json(
        str(src)
    )
    q = (
        dedup_stream_ttl(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("tws_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.updated_at.minute, r.kafka_offset)
        for r in spark.table("tws_dedup").collect()
    )
    assert got == [(1, 0, 0), (1, 5, 2), (2, 0, 3)]
