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
