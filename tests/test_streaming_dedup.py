"""A19's streaming-native form: dropDuplicatesWithinWatermark — the
bounded-state dedup for redelivered events inside the watermark horizon
(the engine's foreachBatch dedup covers cross-batch exactness; this is
the built-in for within-horizon duplicates)."""

from __future__ import annotations

import datetime as dt
import json


def test_drop_duplicates_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def line(uid, minute, offset):
        ts = (base + dt.timedelta(minutes=minute)).strftime("%Y-%m-%dT%H:%M:%S.000Z")
        return json.dumps({"user_id": uid, "updated_at": ts, "kafka_offset": offset})

    # offsets 0/1 are an exact redelivery pair (same user+version)
    rows = [line(1, 0, 0), line(1, 0, 1), line(1, 5, 2), line(2, 0, 3)]
    (src / "a.json").write_text("\n".join(rows) + "\n")

    stream = (
        spark.readStream.schema("user_id long, updated_at timestamp, kafka_offset long")
        .json(str(src))
        .withWatermark("updated_at", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "updated_at"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.user_id, r.updated_at.minute) for r in spark.table("dedup_stream").collect()}
    assert got == {(1, 0), (1, 5), (2, 0)}  # redelivery collapsed, versions kept


def test_drop_duplicates_within_watermark_native(spark, tmp_path):
    """A19 native path: Spark's dropDuplicatesWithinWatermark holds
    per-key state only until the watermark passes (bounded state — the
    RMT dedup posture without a custom operator). availableNow drain
    over redelivered events must equal batch distinct-by-key."""
    from pyspark.sql import functions as F

    from postgre_to_clickhouse_spark import catalog
    from tests.conftest import SF_SMALL

    ev = catalog.load(spark, SF_SMALL, "events").select("event_id", "ts", "event_type")
    src = str(tmp_path / "src")
    # redelivery: every event written twice (two files, same rows)
    ev.coalesce(1).write.json(src)
    ev.coalesce(1).write.mode("append").json(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string")
        .json(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory").queryName("ddww")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("ddww").count()
    assert got == ev.count()  # every duplicate dropped, every event kept
