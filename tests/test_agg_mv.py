"""Incremental aggregate MV (sinks/agg_mv.py): stream-fold equals the
batch aggregate, replayed batches apply exactly once, compaction is a
pure re-layout even when its cleanup crashes."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.sinks.agg_mv import AggregateMV
from tests.conftest import SF_SMALL


def _events(spark):
    return catalog.load(spark, SF_SMALL, "events").select("event_id", "event_type", "value")


def _truth(ev):
    return {
        r.event_type: (
            round(r.s, 2),
            r.c,
            r.mn,
            r.mx,
        )
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
            F.count("value").alias("c"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }


def _got(mv, spark):
    return {
        r.event_type: (round(r.value_sum, 2), r.value_count, r.value_min, r.value_max)
        for r in mv.read_final(spark).collect()
    }


def test_stream_fold_equals_batch_aggregate(spark, tmp_path):
    ev = _events(spark)
    mv = AggregateMV(str(tmp_path / "mv"), keys=("event_type",), value_col="value")
    for i in range(3):  # three micro-batches partitioning the stream
        assert mv.apply_batch(ev.filter(F.col("event_id") % 3 == i), i)
    assert _got(mv, spark) == _truth(ev)
    # avg finalization = exact sum / count in double
    avgs = {r.event_type: r.value_avg for r in mv.read_final(spark).collect()}
    sums = {r.event_type: (r.value_sum, r.value_count) for r in mv.read_final(spark).collect()}
    for k, (s, c) in sums.items():
        assert avgs[k] == s / c


def test_replayed_batch_applies_exactly_once(spark, tmp_path):
    ev = _events(spark)
    mv = AggregateMV(str(tmp_path / "mv"), keys=("event_type",), value_col="value")
    b0 = ev.filter("event_id % 3 = 0")
    assert mv.apply_batch(b0, 0)
    before = _got(mv, spark)
    assert not mv.apply_batch(b0, 0)  # restart replays the same batch_id
    assert _got(mv, spark) == before


def test_compact_preserves_reads_and_survives_cleanup_crash(spark, tmp_path, monkeypatch):
    ev = _events(spark)
    mv = AggregateMV(str(tmp_path / "mv"), keys=("event_type",), value_col="value")
    for i in range(4):
        mv.apply_batch(ev.filter(F.col("event_id") % 4 == i), i)
    truth = _got(mv, spark)

    # crash AFTER the compacted part publishes, BEFORE inputs delete:
    # leftovers must be ignored by readers (no double counting)
    monkeypatch.setattr(shutil, "rmtree", lambda *a, **k: None)
    assert mv.compact(spark) == 4
    monkeypatch.undo()
    leftover_dirs = [p for p in (tmp_path / "mv" / "parts").iterdir()]
    assert len(leftover_dirs) == 5  # 4 inputs still on disk + 1 compacted
    assert _got(mv, spark) == truth

    # vacuum garbage-collects the ignored leftovers; reads unchanged
    removed = mv.vacuum()
    assert len(removed) == 4
    assert _got(mv, spark) == truth

    # an empty batch commits an empty part and changes nothing
    assert mv.apply_batch(ev.filter("event_id = -1"), 99)
    assert _got(mv, spark) == truth


def test_agg_mv_through_streaming_foreachbatch(spark, tmp_path):
    """A12: the MV folds a real file stream via foreachBatch; a restart
    on the same checkpoint replays nothing (no new parts), and a fresh
    checkpoint's redelivery is absorbed by batch-id idempotency only
    when ids align — here we assert the committed state equals batch."""
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.coalesce(3).write.json(src)
    mv = AggregateMV(str(tmp_path / "mv"), keys=("event_type",), value_col="value")

    def start(ckpt):
        return (
            spark.readStream.schema("event_id long, event_type string, value double")
            .json(src)
            .writeStream.foreachBatch(mv.sink())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start(str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert _got(mv, spark) == _truth(ev)
    n_parts = len(list((tmp_path / "mv" / "parts").iterdir()))

    # restart on the same checkpoint: nothing replays, no new parts
    q2 = start(str(tmp_path / "ckpt"))
    q2.awaitTermination()
    assert len(list((tmp_path / "mv" / "parts").iterdir())) == n_parts
    assert _got(mv, spark) == _truth(ev)

    # fresh checkpoint: same source re-delivers the same batch ids ->
    # apply_batch skips them all, state unchanged (exactly-once)
    q3 = start(str(tmp_path / "ckpt2"))
    q3.awaitTermination()
    assert _got(mv, spark) == _truth(ev)


def test_uniq_mv_exactly_once_replay_and_compaction(spark, tmp_path):
    """uniqState MV: batch-split + replayed batch + mid-stream
    compaction are all invisible — the finalized view equals the
    whole-table exact distinct (sparse-exact HLL regime at this
    cardinality)."""
    from postgre_to_clickhouse_spark.sinks.agg_mv import UniqMV

    rows = [(i % 7, (i * 13) % 50) for i in range(400)]
    df = spark.createDataFrame(rows, "grp int, uid int")
    mv = UniqMV(str(tmp_path / "mv"), keys=("grp",), value_col="uid")
    for b in range(4):
        assert mv.apply_batch(df.filter(F.col("uid") % 4 == b), b)
    assert not mv.apply_batch(df.filter(F.col("uid") % 4 == 1), 1)  # replay skips
    mv.compact(spark)
    assert mv.apply_batch(df.filter(F.col("uid") % 4 == 0), 99)  # post-compact batch (idempotent union)
    got = {r.grp: r.uniq_values for r in mv.read_final(spark).collect()}
    want = {
        r.grp: r.n
        for r in df.groupBy("grp").agg(F.countDistinct("uid").alias("n")).collect()
    }
    assert got == want


def test_quantile_mv_exactly_once_replay_and_compaction(spark, tmp_path):
    """quantileExactWeightedState MV: the value→count histogram state
    merges across batch splits, replays and compaction without
    perturbing a single quantile — finalized p50/p90/p99 equal the
    cumulative-weight rule computed directly over all rows."""
    from postgre_to_clickhouse_spark.sinks.agg_mv import QuantileMV

    rows = [(i % 3, float((i * 37) % 100) / 4.0) for i in range(400)]
    df = spark.createDataFrame(rows, "grp int, v double")
    mv = QuantileMV(str(tmp_path / "mv"), keys=("grp",), value_col="v")
    for b in range(4):
        assert mv.apply_batch(df.filter((F.col("v") * 4).cast("int") % 4 == b), b)
    assert not mv.apply_batch(df.filter((F.col("v") * 4).cast("int") % 4 == 1), 1)
    mv.compact(spark)
    got = {
        r.grp: (r.p50, r.p90, r.p99)
        for r in mv.read_final(spark).collect()
    }
    import numpy as np

    for g in {r[0] for r in rows}:
        vals = np.sort(np.array([v for gg, v in rows if gg == g]))
        w = len(vals)
        want = []
        for q in (0.5, 0.9, 0.99):
            cum = np.arange(1, w + 1, dtype=np.float64)
            want.append(float(vals[np.argmax(cum >= w * q)]))
        assert got[g] == tuple(want), (g, got[g], want)
    # post-compact batch still applies; duplicate VALUES merge weights
    assert mv.apply_batch(df.limit(50), 99)
    assert mv.read_states(spark).count() == 3


def test_topk_mv_exact_regime_and_truncated_bounds(spark, tmp_path):
    """topKState MV: in the exact regime (capacity >= per-batch
    distincts) the finalized top-k equals the true counts; in the
    truncated regime the SpaceSaving invariants hold — true count <=
    merged ub for kept items, and every item heavier than the error
    floor is PRESENT."""
    from collections import Counter

    from postgre_to_clickhouse_spark.sinks.agg_mv import TopKMV

    rows = [("g", f"i{(x * x) % 23}") for x in range(600)]
    rows += [("g", "i1")] * 250  # one unambiguous heavy hitter
    df = spark.createDataFrame(rows, "grp string, item string")

    # exact regime
    mv = TopKMV(str(tmp_path / "exact"), keys=("grp",), value_col="item",
                capacity=64)
    for b in range(3):
        assert mv.apply_batch(df.filter(F.length("item") % 3 == b), b)
    assert not mv.apply_batch(df.filter(F.length("item") % 3 == 0), 0)
    mv.compact(spark)
    got = [(r.rank, r.item, r.cnt) for r in
           mv.read_final(spark, k=5).orderBy("rank").collect()]
    true = Counter(i for _, i in rows)
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == [(i + 1, it, c) for i, (it, c) in enumerate(want)]
    assert all(r.err_floor == 0 for r in mv.read_final(spark).collect())

    # truncated regime: tiny capacity
    mvt = TopKMV(str(tmp_path / "trunc"), keys=("grp",), value_col="item",
                 capacity=4)
    for b in range(3):
        mvt.apply_batch(df.filter(F.length("item") % 3 == b), b)
    fin = mvt.read_final(spark, k=4).collect()
    floor = fin[0].err_floor
    kept = {r.item: r.cnt for r in fin}
    for item, ub in kept.items():
        assert true[item] <= ub, (item, true[item], ub)
    assert floor > 0  # truncation really happened
    # the unambiguous heavy hitter (count >> error floor) survives
    heaviest = max(true.items(), key=lambda kv: (kv[1], kv[0]))[0]
    assert true[heaviest] > floor and heaviest in kept, (floor, kept)
