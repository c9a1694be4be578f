"""Property-based tests (hypothesis): operator invariants under random
inputs — the semantics hold for ANY event stream, not just the goldens.

Strategy sizes are kept small (Spark round-trips per example are
expensive); deadline disabled for JVM warm-up jitter.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.cdc.dedup import dedup_redelivery, latest
from postgre_to_clickhouse_spark.operators.asof import asof_join
from postgre_to_clickhouse_spark.operators.range_join import band_join

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# (user_id, version, offset) event streams; duplicates and out-of-order
# arrivals included by construction
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),     # user_id
        st.integers(min_value=0, max_value=10),    # version
        st.integers(min_value=0, max_value=1000),  # offset (arrival order)
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[2],
)


@given(events=events_strategy)
@settings(**_SETTINGS)
def test_latest_is_argmax(spark, events):
    df = spark.createDataFrame(events, "user_id int, version int, kafka_offset int")
    got = {
        r.user_id: (r.version, r.kafka_offset)
        for r in latest(df, entity_key=("user_id",), version_cols=("version", "kafka_offset")).collect()
    }
    expect = {}
    for u, v, o in events:
        if u not in expect or (v, o) > expect[u]:
            expect[u] = (v, o)
    assert got == expect


@given(events=events_strategy)
@settings(**_SETTINGS)
def test_dedup_redelivery_keeps_first_arrival(spark, events):
    df = spark.createDataFrame(events, "user_id int, version int, kafka_offset int")
    got = {
        (r.user_id, r.version): r.kafka_offset
        for r in dedup_redelivery(df, sort_key=("user_id", "version"), arrival_order=("kafka_offset",)).collect()
    }
    expect = {}
    for u, v, o in events:
        k = (u, v)
        if k not in expect or o < expect[k]:
            expect[k] = o
    assert got == expect


@given(events=events_strategy)
@settings(**_SETTINGS)
def test_latest_insensitive_to_arrival_order(spark, events):
    df = spark.createDataFrame(events, "user_id int, version int, kafka_offset int")
    a = latest(df, ("user_id",), ("version", "kafka_offset")).collect()
    b = latest(df.orderBy(F.col("kafka_offset").desc()), ("user_id",), ("version", "kafka_offset")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@given(
    facts=st.lists(st.tuples(st.integers(1, 3), st.integers(0, 100)), min_size=1, max_size=15),
    dims=st.lists(st.tuples(st.integers(1, 3), st.integers(0, 100), st.integers(0, 999)),
                  min_size=0, max_size=15, unique_by=lambda t: (t[0], t[1])),
)
@settings(**_SETTINGS)
def test_asof_join_matches_naive(spark, facts, dims):
    base = dt.datetime(2024, 1, 1)
    f = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(facts)],
        "k int, t timestamp, fid int",
    )
    d = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=m), v) for k, m, v in dims],
        "k int, vt timestamp, val int",
    )
    got = {
        r.fid: r.val_asof
        for r in asof_join(f, d, on="k", fact_time="t", dim_time="vt", dim_cols=["val"]).collect()
    }
    expect = {}
    for i, (k, m) in enumerate(facts):
        cands = [(dm, v) for dk, dm, v in dims if dk == k and dm <= m]
        expect[i] = max(cands)[1] if cands else None
    assert got == expect


@given(
    lefts=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=10),
    rights=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=10),
    width=st.floats(0.5, 50, allow_nan=False),
)
@settings(**_SETTINGS)
def test_band_join_equals_naive_property(spark, lefts, rights, width):
    l = spark.createDataFrame([(i, v) for i, v in enumerate(lefts)], "lid int, lval double")
    r = spark.createDataFrame([(i, v) for i, v in enumerate(rights)], "rid int, rval double")
    banded = band_join(l, r, "lval", "rval", width=width).select("lid", "rid")
    got = sorted(map(tuple, banded.collect()))
    expect = sorted(
        (i, j) for i, lv in enumerate(lefts) for j, rv in enumerate(rights) if abs(lv - rv) <= width
    )
    assert got == expect
