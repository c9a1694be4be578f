"""CH CREATE-dialect front end (`ch_ddl.py`): the reference's three
verbatim DDL statements (README.md:163-230) parse into engine objects,
and replaying the CDC fixture through the parsed MV + target-table
conformance + the ReplacingMergeTree dedup key reproduces the golden."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog
from postgre_to_clickhouse_spark.ch_select import ChSqlError

# verbatim /root/reference/README.md:163-230
_USERS_DDL = """
CREATE TABLE shop.users
(
    user_id UInt32,
    username String,
    account_type String,
    updated_at DateTime,
    created_at DateTime,
    kafka_time Nullable(DateTime),
    kafka_offset UInt64
)
ENGINE = ReplacingMergeTree
ORDER BY (user_id, updated_at);
"""

_KAFKA_DDL = """
CREATE TABLE kafka_shop.kafka__users
(
    user_id UInt32,
    username String,
    account_type String,
    updated_at UInt64,
    created_at UInt64
)
ENGINE = Kafka
SETTINGS kafka_broker_list = 'broker:29092',
kafka_topic_list = 'shop.public.users',
kafka_group_name = 'clickhouse',
kafka_format = 'AvroConfluent',
format_avro_schema_registry_url='http://schema-registry:8081';
"""

_MV_DDL = """
CREATE MATERIALIZED VIEW kafka_shop.consumer__users TO shop.users
(
    user_id UInt32,
    username String,
    account_type String,
    updated_at DateTime,
    created_at DateTime,
    kafka_time Nullable(DateTime),
    kafka_offset UInt64
) AS
SELECT
    user_id,
    username,
    account_type,
    toDateTime(updated_at / 1000000) AS updated_at,
    toDateTime(created_at / 1000000) AS created_at,
    _timestamp AS kafka_time,
    _offset AS kafka_offset
FROM kafka_shop.kafka__users;
"""


@pytest.fixture()
def cat():
    c = ChDdlCatalog()
    c.execute("CREATE DATABASE shop;")
    c.execute("CREATE DATABASE kafka_shop;")
    c.execute(_USERS_DDL)
    c.execute(_KAFKA_DDL)
    c.execute(_MV_DDL)
    return c


def _sources(spark):
    from postgre_to_clickhouse_spark.cdc import unwrap
    from postgre_to_clickhouse_spark.cdc.fixtures import users_cdc_events

    return {
        "kafka__users": (
            unwrap(users_cdc_events(spark))
            .withColumnRenamed("kafka_timestamp", "_timestamp")
            .withColumnRenamed("kafka_offset", "_offset")
        )
    }


def test_parse_reference_ddl_verbatim(cat):
    assert cat.databases == ["shop", "kafka_shop"]
    users = cat.tables["users"]
    assert users.engine == "ReplacingMergeTree"
    assert users.dedup_key == ("user_id", "updated_at")
    # no version argument -> FINAL is arrival-order territory, refused
    assert users.final_spec is None
    assert [f.name for f in users.schema.fields] == [
        "user_id", "username", "account_type", "updated_at",
        "created_at", "kafka_time", "kafka_offset",
    ]
    types = {f.name: f.dataType for f in users.schema.fields}
    assert types["user_id"] == T.LongType()  # UInt32 widens
    assert types["updated_at"] == T.TimestampType()
    assert types["kafka_offset"] == T.LongType()
    nullables = {f.name: f.nullable for f in users.schema.fields}
    assert nullables["kafka_time"] and not nullables["updated_at"]

    kafka = cat.tables["kafka__users"]
    assert kafka.is_kafka_source
    assert kafka.settings["kafka_topic_list"] == "shop.public.users"
    assert kafka.settings["kafka_format"] == "AvroConfluent"
    assert kafka.settings["kafka_broker_list"] == "broker:29092"

    mv = cat.mvs["consumer__users"]
    assert mv.target == "users"
    assert mv.declared_cols == [f.name for f in users.schema.fields]


def test_mv_apply_conforms_and_reproduces_golden(spark, cat):
    """The full paste-the-README loop: parsed MV over the replayed CDC
    fixture, conformed to the parsed table schema, deduped on the
    parsed ReplacingMergeTree sort key == the golden final table."""
    from postgre_to_clickhouse_spark.cdc import dedup_redelivery
    from postgre_to_clickhouse_spark.cdc.fixtures import GOLDEN_ALL_VERSIONS

    out = cat.apply_mv(spark, "consumer__users", _sources(spark))
    users = cat.tables["users"]
    assert out.schema == users.schema or [
        (f.name, f.dataType) for f in out.schema.fields
    ] == [(f.name, f.dataType) for f in users.schema.fields]

    # the RMT ORDER BY key parsed from the DDL is exactly the key the
    # engine's redelivery-dedup operator collapses on
    assert users.dedup_key == ("user_id", "updated_at")
    got = dedup_redelivery(out).collect()
    as_map = {
        (r.user_id, r.updated_at.strftime("%Y-%m-%d %H:%M:%S")):
            (r.username, r.account_type)
        for r in got
    }
    assert as_map == GOLDEN_ALL_VERSIONS


def test_mv_apply_streaming(spark, cat, tmp_path):
    """apply_mv over a streaming source frame yields a streaming
    conformed result — the reference's continuous-MV behavior."""
    batch = _sources(spark)["kafka__users"]
    path = str(tmp_path / "src")
    batch.write.parquet(path)
    stream = spark.readStream.schema(batch.schema).parquet(path)
    out = cat.apply_mv(spark, "consumer__users", {"kafka__users": stream})
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("__ch_ddl_mv")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("__ch_ddl_mv")
    want = cat.apply_mv(spark, "consumer__users", _sources(spark))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_rmt_version_argument_enables_final(spark, cat):
    c = ChDdlCatalog()
    c.execute(
        "CREATE TABLE t (user_id UInt32, updated_at DateTime, v String) "
        "ENGINE = ReplacingMergeTree(updated_at) ORDER BY (user_id)"
    )
    assert c.tables["t"].final_spec == (("user_id",), ("updated_at",))


def test_rmt_version_inside_sort_key_keeps_full_key(spark, cat):
    # CH dedups on the FULL sorting key: when the version column is
    # itself part of ORDER BY, rows differing in it have distinct sort
    # keys and FINAL keeps them all — the entity key must be the whole
    # tuple, not (k,) (ADVICE r10: collapsing to one row per k was a
    # silent wrong-result divergence).
    c = ChDdlCatalog()
    c.execute(
        "CREATE TABLE t (user_id UInt32, updated_at DateTime, v String) "
        "ENGINE = ReplacingMergeTree(updated_at) ORDER BY (user_id, updated_at)"
    )
    assert c.tables["t"].final_spec == (
        ("user_id", "updated_at"), ("updated_at",))


def test_type_map_wrappers():
    c = ChDdlCatalog()
    c.execute(
        "CREATE TABLE w (a LowCardinality(String), b Array(Nullable(Float32)), "
        "c Decimal(18, 4), d DateTime64(3), e FixedString(16), f Enum8('x' = 1)) "
        "ENGINE = MergeTree ORDER BY (a)"
    )
    types = {f.name: f.dataType for f in c.tables["w"].schema.fields}
    assert types["a"] == T.StringType()
    assert types["b"] == T.ArrayType(T.FloatType(), True)
    assert types["c"] == T.DecimalType(18, 4)
    assert types["d"] == T.TimestampType()
    assert types["e"] == T.StringType()
    assert types["f"] == T.StringType()


@pytest.mark.parametrize(
    "bad, frag",
    [
        ("CREATE TABLE t (a UInt32) ENGINE = CollapsingMergeTree ORDER BY (a)",
         "unsupported engine"),
        # r13: CODEC is now parsed — but only the parenthesized form
        ("CREATE TABLE t (a UInt32 CODEC ZSTD) ENGINE = MergeTree ORDER BY (a)",
         "parenthesized"),
        ("CREATE TABLE t (a Foo) ENGINE = MergeTree ORDER BY (a)",
         "unsupported ClickHouse type"),
        ("CREATE TABLE t (a UInt32) ENGINE = MergeTree", "requires ORDER BY"),
        ("CREATE MATERIALIZED VIEW v AS SELECT 1 FROM t", "TO target"),
        ("CREATE VIEW v SELECT 1", "AS SELECT"),  # plain VIEW needs AS
        ("CREATE LIVE VIEW v AS SELECT 1", "unsupported CREATE"),
        ("RENAME TABLE t TO u", "undeclared table"),  # r14: RENAME parses
        ("RENAME t TO u", "RENAME TABLE a TO b"),
        ("ATTACH TABLE t", "only CREATE"),
    ],
)
def test_ddl_refusals(bad, frag):
    with pytest.raises(ChSqlError, match=frag):
        ChDdlCatalog().execute(bad)


def test_mv_declared_columns_must_match(spark):
    c = ChDdlCatalog()
    c.execute(
        "CREATE MATERIALIZED VIEW v TO t (a UInt32, b String) AS "
        "SELECT user_id AS a FROM src"
    )
    with pytest.raises(ChSqlError, match="declared"):
        c.apply_mv(spark, "v", _sources(spark) | {
            "src": _sources(spark)["kafka__users"]})


def test_kafka_source_stream_wiring(spark, cat):
    """source_stream maps the parsed Kafka SETTINGS to reader options;
    construction is gated (no spark-kafka jar / broker here) — the
    refusal paths and the option wiring are what the engine owns."""
    with pytest.raises(ChSqlError, match="not a parsed ENGINE = Kafka"):
        cat.source_stream(spark, "users")

    c2 = ChDdlCatalog()
    c2.execute(
        "CREATE TABLE k (a UInt32) ENGINE = Kafka "
        "SETTINGS kafka_topic_list = 't'"
    )
    with pytest.raises(ChSqlError, match="kafka_broker_list"):
        c2.source_stream(spark, "k")

    c3 = ChDdlCatalog()
    c3.execute(
        "CREATE TABLE k (a UInt32) ENGINE = Kafka "
        "SETTINGS kafka_broker_list = 'b:9092', kafka_topic_list = 't', "
        "kafka_format = 'JSONEachRow'"
    )
    with pytest.raises(ChSqlError, match="JSONEachRow"):
        c3.source_stream(spark, "k")

    # the reference's own Kafka table: correct settings reach the
    # reader; in this container the kafka data source is absent, so
    # Spark raises its data-source error at load()
    try:
        df = cat.source_stream(spark, "kafka__users")
        assert df.isStreaming  # pragma: no cover — only with the jar
    except Exception as e:
        assert "kafka" in str(e).lower()


# --- r11: ALTER unified into the catalog (VERDICT r10 #3) ------------

_PROVISION = """
CREATE DATABASE shop;
CREATE TABLE shop.user_events
(
    user_id UInt32,
    event_type String,
    value Float64,
    event_id UInt64
)
ENGINE = MergeTree
ORDER BY (user_id, event_id);
"""


def _ue_catalog(spark, tmp_path):
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(_PROVISION)
    rows = [
        (1, "click", 1.5, 10), (1, "view", 2.0, 11), (1, "click", 3.0, 12),
        (2, "view", 4.0, 20), (2, "purchase", 5.5, 21), (3, "click", 6.0, 30),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, value double, event_id long"
    )
    c.insert(spark, "user_events", df)
    return c


def test_catalog_executes_verbatim_alter_script(spark, tmp_path):
    """CREATE + ALTER + SELECT through ONE catalog: mutations, then a
    projection, then a CH SELECT over the stored table — the full
    provisioning script a CH user pastes, no seam."""
    c = _ue_catalog(spark, tmp_path)
    c.execute(
        "ALTER TABLE shop.user_events UPDATE value = value * 2 "
        "WHERE event_type = 'click';",
        spark=spark,
    )
    c.execute(
        "ALTER TABLE shop.user_events DELETE WHERE event_type = 'view';",
        spark=spark,
    )
    c.execute(
        "ALTER TABLE shop.user_events ADD PROJECTION by_type "
        "(SELECT user_id, event_type, count(), sum(value) AS value_sum "
        "GROUP BY user_id, event_type);",
        spark=spark,
    )
    got = sorted(
        map(tuple, c.query(
            spark,
            "SELECT user_id, event_type, sum(value) AS s, count() AS n "
            "FROM user_events GROUP BY user_id, event_type "
            "ORDER BY user_id, event_type",
        ).collect())
    )
    assert got == [
        (1, "click", 9.0, 2), (2, "purchase", 5.5, 1), (3, "click", 12.0, 1),
    ]
    # the projection serves the matching GROUP BY from merged partial
    # states (fallback=False: raise rather than silently scan rows)
    agg = {
        (r["user_id"], r["event_type"]): (r["value_sum"], r["n"])
        for r in c.storage_for("user_events")
        .read_agg(spark, "by_type", fallback=False).collect()
    }
    assert agg == {
        (1, "click"): (9.0, 2), (2, "purchase"): (5.5, 1),
        (3, "click"): (12.0, 1),
    }
    # DROP PROJECTION re-enables mutations (the CH drop/mutate/re-add loop)
    c.execute("ALTER TABLE shop.user_events DROP PROJECTION by_type",
              spark=spark)
    c.execute("ALTER TABLE shop.user_events DELETE WHERE user_id = 3",
              spark=spark)
    assert c.query(spark, "SELECT count() AS n FROM user_events").collect()[0]["n"] == 3


def test_catalog_alter_refusals(spark, tmp_path):
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(_PROVISION)
    with pytest.raises(ChSqlError, match="undeclared table"):
        c.execute("ALTER TABLE nope DELETE WHERE 1 = 1", spark=spark)
    with pytest.raises(ChSqlError, match="spark=spark"):
        c.execute("ALTER TABLE user_events DELETE WHERE 1 = 1")
    with pytest.raises(ChSqlError, match="unsupported ALTER"):
        c.execute("ALTER USER admin", spark=spark)
    with pytest.raises(ValueError, match="unsupported ALTER TABLE clause"):
        c.execute("ALTER TABLE user_events FREEZE", spark=spark)
    # no storage root -> loud, names the fix
    c2 = ChDdlCatalog()
    c2.execute(_PROVISION)
    with pytest.raises(ChSqlError, match="storage_root"):
        c2.execute("ALTER TABLE user_events DELETE WHERE 1 = 1", spark=spark)


# --- r11: DEFAULT columns + metadata-only ALTER ADD/DROP COLUMN -----

def test_create_with_default_fills_missing_insert_columns(spark, tmp_path):
    """`name Type DEFAULT expr` is inside the subset: an inserted block
    omitting the column materializes the default — including defaults
    referencing the block's OTHER columns (the CH rule)."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t (user_id UInt32, score Float64, "
        "tier String DEFAULT 'basic', "
        "double_score Float64 DEFAULT score * 2) "
        "ENGINE = MergeTree ORDER BY (user_id)"
    )
    assert c.tables["t"].defaults == {
        "tier": "'basic'", "double_score": "score * 2"}
    c.insert(spark, "t", spark.createDataFrame(
        [(1, 2.5), (2, 4.0)], "user_id long, score double"))
    got = sorted(map(tuple, c.query(
        spark, "SELECT user_id, score, tier, double_score FROM t"
    ).collect()))
    assert got == [(1, 2.5, "basic", 5.0), (2, 4.0, "basic", 8.0)]
    # supplied values win over the default
    c.insert(spark, "t", spark.createDataFrame(
        [(3, 1.0, "gold", 99.0)],
        "user_id long, score double, tier string, double_score double"),
        batch_id=1)
    got = dict(
        (r["user_id"], r["tier"])
        for r in c.query(spark, "SELECT user_id, tier FROM t").collect()
    )
    assert got == {1: "basic", 2: "basic", 3: "gold"}
    # a missing column WITHOUT a default still refuses
    with pytest.raises(ChSqlError, match="declared"):
        c.insert(spark, "t", spark.createDataFrame(
            [(4,)], "user_id long"), batch_id=2)
    # r13: CODEC parses as recorded metadata (round-trip tested in
    # test_create_with_codec_ttl_comment_round_trips)
    c2 = ChDdlCatalog()
    c2.execute("CREATE TABLE x (a UInt32 CODEC(Delta)) "
               "ENGINE = MergeTree ORDER BY (a)")
    assert c2.tables["x"].codecs == {"a": "Delta"}


def test_alter_add_column_is_metadata_only(spark, tmp_path):
    """ADD COLUMN with DEFAULT: no part rewrite — pre-ADD parts
    materialize the default at read, post-ADD parts keep stored values
    INCLUDING genuine NULLs (the case a merged-read + coalesce would
    corrupt)."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t (user_id UInt32, score Float64) "
        "ENGINE = MergeTree ORDER BY (user_id)"
    )
    c.insert(spark, "t", spark.createDataFrame(
        [(1, 2.5), (2, 4.0)], "user_id long, score double"))
    v_before = c.storage_for("t").current_version()
    c.execute("ALTER TABLE t ADD COLUMN tier Nullable(String) DEFAULT 'basic'")
    c.execute("ALTER TABLE t ADD COLUMN n_events UInt32 DEFAULT 0")
    # metadata-only: the storage snapshot did not move
    assert c.storage_for("t").current_version() == v_before
    c.insert(spark, "t", spark.createDataFrame(
        [(3, 1.0, None, 7), (4, 9.0, "gold", 2)],
        "user_id long, score double, tier string, n_events long"),
        batch_id=1)
    got = {
        r["user_id"]: (r["tier"], r["n_events"])
        for r in c.query(
            spark, "SELECT user_id, tier, n_events FROM t").collect()
    }
    assert got == {
        1: ("basic", 0), 2: ("basic", 0),   # pre-ADD parts: defaults
        3: (None, 7),                        # stored NULL survives
        4: ("gold", 2),
    }


def test_alter_add_column_without_default_fills_type_zero(spark, tmp_path):
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (user_id UInt32) ENGINE = MergeTree "
              "ORDER BY (user_id)")
    c.insert(spark, "t", spark.createDataFrame([(1,)], "user_id long"))
    c.execute("ALTER TABLE t ADD COLUMN cnt UInt32")
    c.execute("ALTER TABLE t ADD COLUMN label String")
    c.execute("ALTER TABLE t ADD COLUMN maybe Nullable(Float64)")
    r = c.query(spark, "SELECT user_id, cnt, label, maybe FROM t").collect()[0]
    assert (r["cnt"], r["label"], r["maybe"]) == (0, "", None)


def test_alter_drop_column_and_refusals(spark, tmp_path):
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t (user_id UInt32, score Float64, tag String) "
        "ENGINE = MergeTree ORDER BY (user_id)"
    )
    c.insert(spark, "t", spark.createDataFrame(
        [(1, 2.5, "a")], "user_id long, score double, tag string"))
    c.execute("ALTER TABLE t DROP COLUMN tag")
    out = c.query(spark, "SELECT * FROM t")
    assert out.columns == ["user_id", "score"]
    # inserts carrying the dropped column refuse (it is gone)
    with pytest.raises(ChSqlError, match="declared"):
        c.insert(spark, "t", spark.createDataFrame(
            [(2, 1.0, "b")], "user_id long, score double, tag string"),
            batch_id=1)
    with pytest.raises(ChSqlError, match="sorting key"):
        c.execute("ALTER TABLE t DROP COLUMN user_id")
    with pytest.raises(ChSqlError, match="no column"):
        c.execute("ALTER TABLE t DROP COLUMN nope")
    with pytest.raises(ChSqlError, match="already exists"):
        c.execute("ALTER TABLE t ADD COLUMN score Float64")
    # IF NOT EXISTS / IF EXISTS forms parse
    c.execute("ALTER TABLE t ADD COLUMN IF NOT EXISTS extra UInt32")
    c.execute("ALTER TABLE t DROP COLUMN IF EXISTS extra")
    assert [f.name for f in c.tables["t"].schema.fields] == [
        "user_id", "score"]


# --- r11: AggregatingMergeTree -State/-Merge MV pattern --------------

_AGG_MV_DDL = """
CREATE DATABASE shop;
CREATE TABLE shop.stats
(
    event_type String,
    n AggregateFunction(count),
    val AggregateFunction(sum, Float64),
    a AggregateFunction(avg, Float64),
    lo AggregateFunction(min, Float64),
    users AggregateFunction(uniq, UInt32)
)
ENGINE = AggregatingMergeTree
ORDER BY (event_type);
CREATE MATERIALIZED VIEW shop.mv_stats TO shop.stats AS
SELECT event_type,
       countState() AS n,
       sumState(value) AS val,
       avgState(value) AS a,
       minState(value) AS lo,
       uniqState(user_id) AS users
FROM src
GROUP BY event_type;
"""


def test_aggregating_merge_tree_mv_loop(spark, tmp_path):
    """The canonical CH AggregatingMergeTree pattern, verbatim: a
    -State MV folding a stream into state columns, parts inserted per
    batch WITHOUT cross-part dedup (states merge, not replace), and a
    -Merge SELECT answering from the states — equal to recomputing
    from all raw rows regardless of the batch split."""
    rows = [
        (1, "view", 2.0), (2, "view", 3.5), (1, "click", 1.0),
        (3, "view", 4.0), (2, "click", 2.5), (1, "view", 6.0),
    ]
    src = spark.createDataFrame(
        rows, "user_id long, event_type string, value double")
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(_AGG_MV_DDL)
    spec = c.tables["stats"]
    from pyspark.sql import types as T
    types = {f.name: f.dataType for f in spec.schema.fields}
    assert types["n"] == T.LongType()
    assert types["val"] == T.DecimalType(30, 6)
    assert types["users"] == T.BinaryType()
    assert types["a"].fieldNames() == ["s", "c"]

    for i, half in enumerate((src.filter("user_id <= 1"),
                              src.filter("user_id > 1"))):
        c.insert(spark, "stats",
                 c.apply_mv(spark, "mv_stats", {"src": half}), batch_id=i)
    got = {
        r["event_type"]: (r["n"], float(r["s"]), r["avg_v"], r["lo"], r["u"])
        for r in c.query(
            spark,
            "SELECT event_type, countMerge(n) AS n, "
            "toFloat64(sumMerge(val)) AS s, round(avgMerge(a), 6) AS avg_v, "
            "minMerge(lo) AS lo, uniqMerge(users) AS u "
            "FROM stats GROUP BY event_type",
        ).collect()
    }
    assert got == {
        "view": (4, 15.5, round(15.5 / 4, 6), 2.0, 3),
        "click": (2, 3.5, 1.75, 1.0, 2),
    }
    # the raw state table holds one state row per (part, key) — no
    # silent cross-part collapse
    assert c.query(spark, "SELECT count() AS c FROM stats").collect()[0]["c"] == 4


def test_aggregate_function_type_refusals():
    # quantile/topK joined the type map in r12 — argMax marks the
    # remaining boundary
    with pytest.raises(ChSqlError, match="outside the subset"):
        ChDdlCatalog().execute(
            "CREATE TABLE t (a AggregateFunction(argMax, Float64)) "
            "ENGINE = AggregatingMergeTree ORDER BY (a)")
    with pytest.raises(ChSqlError, match="needs a type"):
        ChDdlCatalog().execute(
            "CREATE TABLE t (a AggregateFunction(min)) "
            "ENGINE = AggregatingMergeTree ORDER BY (a)")


# --- r11: the full SQL-terminal surface ------------------------------

def test_insert_values_and_select_statements(spark, tmp_path):
    """Verbatim CH INSERT statements through the catalog: VALUES rows
    (subset column list — DEFAULT materializes), and INSERT ... SELECT
    compiled over the catalog's own stored tables (positional column
    match, the CH rule)."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t (user_id UInt32, score Float64, "
        "tier String DEFAULT 'basic') ENGINE = MergeTree ORDER BY (user_id)"
    )
    c.execute(
        "INSERT INTO t (user_id, score) VALUES (1, 2.5), (2, 4.0)",
        spark=spark,
    )
    c.execute(
        "INSERT INTO t VALUES (3, 1.0, 'gold')",
        spark=spark,
    )
    got = sorted(map(tuple, c.query(spark, "SELECT * FROM t").collect()))
    assert got == [(1, 2.5, "basic"), (2, 4.0, "basic"), (3, 1.0, "gold")]

    c.execute(
        "CREATE TABLE agg (tier String, total Float64) "
        "ENGINE = MergeTree ORDER BY (tier)"
    )
    c.execute(
        "INSERT INTO agg SELECT tier, round(toFloat64(sum("
        "toDecimal64(score, 2))), 2) AS s FROM t GROUP BY tier",
        spark=spark,
    )
    got = sorted(map(tuple, c.query(spark, "SELECT * FROM agg").collect()))
    assert got == [("basic", 6.5), ("gold", 1.0)]

    with pytest.raises(ChSqlError, match="not declared"):
        c.execute("INSERT INTO t (nope) VALUES (1)", spark=spark)
    with pytest.raises(ChSqlError, match="spark=spark"):
        c.execute("INSERT INTO t VALUES (1, 1.0, 'x')")


def test_truncate_and_drop_table(spark, tmp_path):
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (a UInt32) ENGINE = MergeTree ORDER BY (a)")
    c.execute("INSERT INTO t VALUES (1), (2)", spark=spark)
    assert c.query(spark, "SELECT count() AS n FROM t").collect()[0]["n"] == 2
    c.execute("TRUNCATE TABLE t", spark=spark)
    assert c.query(spark, "SELECT count() AS n FROM t").collect()[0]["n"] == 0
    # schema survives truncate; inserts keep working
    c.execute("INSERT INTO t VALUES (3)", spark=spark)
    assert c.query(spark, "SELECT count() AS n FROM t").collect()[0]["n"] == 1
    c.execute("DROP TABLE t")
    assert "t" not in c.tables
    c.execute("DROP TABLE IF EXISTS t")  # no-op, no raise
    with pytest.raises(ChSqlError, match="undeclared"):
        c.execute("DROP TABLE t")


def test_optimize_final_replacing_merge_tree(spark, tmp_path):
    """OPTIMIZE TABLE ... FINAL on an RMT(ver): the snapshot itself
    collapses to the latest row per sorting key; a version-less RMT
    refuses (arrival-order territory)."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE u (user_id UInt32, v String, updated_at DateTime) "
        "ENGINE = ReplacingMergeTree(updated_at) ORDER BY (user_id)"
    )
    c.execute(
        "INSERT INTO u VALUES "
        "(1, 'old', toDateTime('2024-03-01 10:00:00')), "
        "(2, 'only', toDateTime('2024-03-01 11:00:00'))",
        spark=spark,
    )
    c.execute(
        "INSERT INTO u VALUES (1, 'new', toDateTime('2024-03-02 10:00:00'))",
        spark=spark,
    )
    # before: all version rows are physically present
    assert c.query(spark, "SELECT count() AS n FROM u").collect()[0]["n"] == 3
    c.execute("OPTIMIZE TABLE u FINAL", spark=spark)
    got = sorted(map(tuple, c.query(
        spark, "SELECT user_id, v FROM u").collect()))
    assert got == [(1, "new"), (2, "only")]

    c.execute(
        "CREATE TABLE nv (a UInt32) ENGINE = ReplacingMergeTree "
        "ORDER BY (a)")
    c.execute("INSERT INTO nv VALUES (1)", spark=spark)
    with pytest.raises(ChSqlError, match="version argument"):
        c.execute("OPTIMIZE TABLE nv FINAL", spark=spark)


def test_optimize_final_folds_aggregate_states(spark, tmp_path):
    """OPTIMIZE FINAL on an AggregatingMergeTree folds every state
    column by its declared fn down to one row per key — and the folded
    states still -Merge to the same answers (closed under merge)."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(_AGG_MV_DDL)
    src = spark.createDataFrame(
        [(1, "view", 2.0), (2, "view", 3.5), (1, "click", 1.0),
         (3, "view", 4.0)],
        "user_id long, event_type string, value double")
    for i, pred in enumerate(("user_id <= 1", "user_id > 1")):
        c.insert(spark, "stats",
                 c.apply_mv(spark, "mv_stats", {"src": src.filter(pred)}),
                 batch_id=i)
    q = ("SELECT event_type, countMerge(n) AS n, "
         "toFloat64(sumMerge(val)) AS s, uniqMerge(users) AS u "
         "FROM stats GROUP BY event_type")
    before = sorted(map(tuple, c.query(spark, q).collect()))
    assert c.query(
        spark, "SELECT count() AS c FROM stats").collect()[0]["c"] == 3
    c.execute("OPTIMIZE TABLE stats FINAL", spark=spark)
    # one folded state row per key, same merged answers
    assert c.query(
        spark, "SELECT count() AS c FROM stats").collect()[0]["c"] == 2
    assert sorted(map(tuple, c.query(spark, q).collect())) == before


def test_summing_merge_tree_optimize_final(spark, tmp_path):
    """SummingMergeTree: OPTIMIZE FINAL folds equal-sort-key rows by
    summing the named (or all numeric non-key) columns; non-summed
    columns take the deterministic MIN instance of CH's any-value
    contract."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE s (k String, qty UInt32, amount Float64, "
        "note String) ENGINE = SummingMergeTree(qty, amount) "
        "ORDER BY (k)"
    )
    c.execute("INSERT INTO s VALUES ('a', 1, 1.5, 'x'), ('b', 2, 2.0, 'y')",
              spark=spark)
    c.execute("INSERT INTO s VALUES ('a', 10, 0.5, 'z')", spark=spark)
    c.execute("OPTIMIZE TABLE s FINAL", spark=spark)
    got = sorted(map(tuple, c.query(spark, "SELECT * FROM s").collect()))
    assert got == [("a", 11, 2.0, "x"), ("b", 2, 2.0, "y")]
    # default sum set = every numeric non-key column
    c.execute("CREATE TABLE s2 (k String, v UInt32) "
              "ENGINE = SummingMergeTree ORDER BY (k)")
    c.execute("INSERT INTO s2 VALUES ('a', 1), ('a', 2)", spark=spark)
    c.execute("OPTIMIZE TABLE s2 FINAL", spark=spark)
    assert sorted(map(tuple, c.query(spark, "SELECT * FROM s2").collect())) \
        == [("a", 3)]
    with pytest.raises(ChSqlError, match="numeric non-key"):
        c2 = ChDdlCatalog(storage_root=str(tmp_path / "bad"))
        c2.execute("CREATE TABLE b (k String, v String) "
                   "ENGINE = SummingMergeTree(v) ORDER BY (k)")
        c2.execute("INSERT INTO b VALUES ('a', 'x')", spark=spark)
        c2.execute("OPTIMIZE TABLE b FINAL", spark=spark)


def test_modify_and_materialize_ttl(spark, tmp_path):
    """MODIFY TTL records metadata only; MATERIALIZE TTL deletes
    expired rows through the manifest's transactional delete, with a
    pinnable clock for determinism."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t (k UInt32, ts DateTime) "
        "ENGINE = MergeTree ORDER BY (k)"
    )
    c.execute(
        "INSERT INTO t VALUES "
        "(1, toDateTime('2024-01-01 00:00:00')), "
        "(2, toDateTime('2024-03-01 00:00:00')), "
        "(3, toDateTime('2024-03-10 00:00:00'))",
        spark=spark,
    )
    v = c.storage_for("t").current_version()
    c.execute("ALTER TABLE t MODIFY TTL ts + INTERVAL 30 DAY", spark=spark)
    assert c.tables["t"].ttl == ("ts", 30, "DAY")
    assert c.storage_for("t").current_version() == v  # metadata-only
    c.materialize_ttl(spark, "t", now="2024-03-15 00:00:00")
    got = sorted(r["k"] for r in c.query(spark, "SELECT k FROM t").collect())
    assert got == [2, 3]  # row 1 expired (74 days old)
    with pytest.raises(ChSqlError, match="MODIFY TTL supports"):
        c.execute("ALTER TABLE t MODIFY TTL ts + INTERVAL 1 DAY "
                  "GROUP BY k", spark=spark)
    with pytest.raises(ChSqlError, match="no TTL rule"):
        c2 = ChDdlCatalog(storage_root=str(tmp_path / "n"))
        c2.execute("CREATE TABLE u (k UInt32, ts DateTime) "
                   "ENGINE = MergeTree ORDER BY (k)")
        c2.execute("ALTER TABLE u MATERIALIZE TTL", spark=spark)
    with pytest.raises(ChSqlError, match="Date/DateTime"):
        c.execute("ALTER TABLE t MODIFY TTL k + INTERVAL 1 DAY",
                  spark=spark)


def test_partition_by_feeds_zone_maps(spark, tmp_path):
    """PARTITION BY is captured, not dropped: the declared columns
    under the partition expression join the storage's zone-map stats,
    delivering the file pruning the clause exists for."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t (k UInt32, ts DateTime, v Float64) "
        "ENGINE = MergeTree PARTITION BY toYYYYMM(ts) ORDER BY (k)"
    )
    assert c.tables["t"].partition_src == ["ts"]
    assert c.storage_for("t").stats_cols == ("k", "ts")
    with pytest.raises(ChSqlError, match="no declared column"):
        ChDdlCatalog().execute(
            "CREATE TABLE b (k UInt32) ENGINE = MergeTree "
            "PARTITION BY toYYYYMM(nope) ORDER BY (k)")


def test_query_empty_declared_table(spark, tmp_path):
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE empty_t (a UInt32, s String) "
              "ENGINE = MergeTree ORDER BY (a)")
    out = c.query(spark, "SELECT a, s FROM empty_t")
    assert out.columns == ["a", "s"] and out.count() == 0


def test_show_create_table_round_trips(spark, tmp_path):
    """SHOW CREATE TABLE renders canonical DDL that REPARSES to an
    equivalent spec — schema, engine, sort key, defaults, TTL,
    AggregateFunction columns — the identity a wire client relies on
    when cloning a table."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE shop.t (user_id UInt32, v Nullable(String), "
        "score Float64 DEFAULT 0, tags Array(String), "
        "n AggregateFunction(count), s AggregateFunction(sum, Float64), "
        "u AggregateFunction(uniq, UInt32), "
        "ux AggregateFunction(uniqExact, UInt32)) "
        "ENGINE = AggregatingMergeTree ORDER BY (user_id)"
    )
    c.execute("CREATE TABLE d (k UInt32, ts DateTime) "
              "ENGINE = MergeTree ORDER BY (k)")
    c.execute("ALTER TABLE d MODIFY TTL ts + INTERVAL 30 DAY")
    for name in ("t", "d"):
        ddl = c.tables[name].show_create()
        c2 = ChDdlCatalog()
        c2.execute(ddl)
        a, b = c.tables[name], c2.tables[name]
        assert a.schema == b.schema, ddl
        assert (a.engine, a.order_by, a.defaults, a.agg_fns, a.ttl) == (
            b.engine, b.order_by, b.defaults, b.agg_fns, b.ttl), ddl
    # over the wire
    from postgre_to_clickhouse_spark.ch_http import serve_ch_http
    ep = serve_ch_http(spark, c)
    try:
        import urllib.request
        req = urllib.request.Request(
            ep.url, data=b"SHOW CREATE TABLE d", method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            body = r.read().decode()
        assert "ENGINE = MergeTree" in body and "TTL ts + INTERVAL 30 DAY" in body
    finally:
        ep.stop()


# --- r12: MATERIALIZED / ALIAS column clauses -------------------------


def test_materialized_and_alias_columns(spark, tmp_path):
    """MATERIALIZED computes at insert (stored), ALIAS at read (never
    stored), DEFAULT fills omitted block columns — and clause
    expressions are verbatim CH text (dialect-rewritten)."""
    import os

    from pyspark.sql import functions as F

    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t (id Int64, ts DateTime, v Float64, "
        "cents Int64 MATERIALIZED toInt64(floor(v * 100)), "
        "day DateTime ALIAS toStartOfDay(ts), "
        "lbl String DEFAULT 'x') "
        "ENGINE = MergeTree ORDER BY (id)"
    )
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1.25), (2, "2024-01-02 11:30:00", 2.5)],
        "id long, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    c.insert(spark, "t", df, batch_id=0)
    rows = {r["id"]: r for r in c.query(
        spark, "SELECT id, cents, day, lbl FROM t").collect()}
    assert rows[1]["cents"] == 125 and rows[2]["cents"] == 250
    assert rows[1]["day"].day == 1 and rows[2]["day"].day == 2
    assert rows[1]["lbl"] == "x"
    # ALIAS is physically absent from every part file
    data_dir = os.path.join(str(tmp_path), "t", "data")
    for f in os.listdir(data_dir):
        names = spark.read.parquet(os.path.join(data_dir, f)).schema.names
        assert "day" not in names
        assert "cents" in names  # MATERIALIZED is stored


def test_insert_into_expression_columns_refuses(spark, tmp_path):
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t (id Int64, v Float64, "
        "c2 Float64 MATERIALIZED v * 2, a2 Float64 ALIAS v * 3) "
        "ENGINE = MergeTree ORDER BY (id)"
    )
    df = spark.createDataFrame([(1, 1.0, 2.0)], "id long, v double, c2 double")
    with pytest.raises(ChSqlError, match="MATERIALIZED/ALIAS"):
        c.insert(spark, "t", df)
    df2 = spark.createDataFrame([(1, 1.0, 3.0)], "id long, v double, a2 double")
    with pytest.raises(ChSqlError, match="MATERIALIZED/ALIAS"):
        c.insert(spark, "t", df2)


def test_expression_column_ddl_refusals():
    # explicit type required (CH infers; this subset declares)
    with pytest.raises(ChSqlError, match="explicit column type"):
        ChDdlCatalog().execute(
            "CREATE TABLE t (id Int64, d ALIAS id * 2) "
            "ENGINE = MergeTree ORDER BY (id)")
    # state-folding engines refuse the combination
    with pytest.raises(ChSqlError, match="MergeTree and ReplacingMergeTree"):
        ChDdlCatalog().execute(
            "CREATE TABLE t (id Int64, n AggregateFunction(count), "
            "d Int64 ALIAS id * 2) "
            "ENGINE = AggregatingMergeTree ORDER BY (id)")
    # ALIAS cannot be a sorting key
    with pytest.raises(ChSqlError, match="ORDER BY"):
        ChDdlCatalog().execute(
            "CREATE TABLE t (id Int64, d Int64 ALIAS id * 2) "
            "ENGINE = MergeTree ORDER BY (d)")
    # at most one expression clause per column
    with pytest.raises(ChSqlError, match="at most one"):
        ChDdlCatalog().execute(
            "CREATE TABLE t (id Int64, d Int64 DEFAULT 1 ALIAS id) "
            "ENGINE = MergeTree ORDER BY (id)")
    # r13: CODEC now parses as recorded metadata
    c = ChDdlCatalog()
    c.execute("CREATE TABLE tc (id Int64 CODEC(ZSTD)) "
              "ENGINE = MergeTree ORDER BY (id)")
    assert c.tables["tc"].codecs == {"id": "ZSTD"}


def test_expression_columns_round_trip_show_create(spark, tmp_path):
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t (id Int64, ts DateTime, v Float64, "
        "cents Int64 MATERIALIZED toInt64(floor(v * 100)), "
        "day DateTime ALIAS toStartOfDay(ts)) "
        "ENGINE = MergeTree ORDER BY (id)"
    )
    text = c.execute("SHOW CREATE TABLE t", spark=spark).collect()[0][0]
    assert "MATERIALIZED" in text and "ALIAS" in text
    cat2 = ChDdlCatalog()
    cat2.execute(text.replace("CREATE TABLE t", "CREATE TABLE t2"))
    s1, s2 = c.tables["t"], cat2.tables["t2"]
    assert s2.schema == s1.schema
    assert s2.materialized == s1.materialized
    assert s2.aliases == s1.aliases


def test_alter_add_default_accepts_ch_expressions(spark, tmp_path):
    """r12: ALTER ADD COLUMN DEFAULT expressions run through the
    dialect rewriter too — CH names work, old parts materialize them
    at read."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (id Int64, v Float64) "
              "ENGINE = MergeTree ORDER BY (id)")
    c.insert(spark, "t",
             spark.createDataFrame([(1, 2.5)], "id long, v double"))
    c.execute("ALTER TABLE t ADD COLUMN c Int64 DEFAULT toInt64(v * 10)",
              spark=spark)
    r = c.query(spark, "SELECT id, c FROM t").collect()[0]
    assert r["c"] == 25


def test_alter_add_materialized_and_alias_columns(spark, tmp_path):
    """r12: ALTER TABLE ADD COLUMN accepts MATERIALIZED (old parts
    compute at read, new blocks at insert) and ALIAS (pure metadata —
    the table does not even count as evolved)."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (id Int64, v Float64) "
              "ENGINE = MergeTree ORDER BY (id)")
    c.insert(spark, "t",
             spark.createDataFrame([(1, 2.0)], "id long, v double"),
             batch_id=0)
    c.execute("ALTER TABLE t ADD COLUMN a2 Float64 ALIAS v * 3",
              spark=spark)
    assert not c.tables["t"].evolved  # ALIAS is pure metadata
    c.execute("ALTER TABLE t ADD COLUMN m2 Float64 MATERIALIZED v * 2",
              spark=spark)
    assert c.tables["t"].evolved
    c.insert(spark, "t",
             spark.createDataFrame([(2, 5.0)], "id long, v double"),
             batch_id=1)
    got = {r["id"]: (r["a2"], r["m2"]) for r in c.query(
        spark, "SELECT id, a2, m2 FROM t").collect()}
    assert got == {1: (6.0, 4.0), 2: (15.0, 10.0)}
    # DESCRIBE shows the kind/expression pair
    d = {r["name"]: (r["default_type"], r["default_expression"])
         for r in c.execute("DESCRIBE TABLE t", spark=spark).collect()}
    assert d["a2"] == ("ALIAS", "v * 3")
    assert d["m2"] == ("MATERIALIZED", "v * 2")
    # dropping the alias is metadata-only too
    c.execute("ALTER TABLE t DROP COLUMN a2", spark=spark)
    assert "a2" not in [f.name for f in c.tables["t"].schema.fields]


def test_rename_column_is_metadata_only(spark, tmp_path):
    """r12: RENAME COLUMN — no part rewrite; old parts resolve through
    the rename chain at read, new inserts use the new name, chained
    renames over mixed-age parts stay correct."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (id Int64, v Float64) "
              "ENGINE = MergeTree ORDER BY (id)")
    c.insert(spark, "t",
             spark.createDataFrame([(1, 1.5)], "id long, v double"),
             batch_id=0)
    v0 = c.storage_for("t").current_version()
    c.execute("ALTER TABLE t RENAME COLUMN v TO score")
    assert c.storage_for("t").current_version() == v0  # metadata-only
    c.insert(spark, "t",
             spark.createDataFrame([(2, 2.5)], "id long, score double"),
             batch_id=1)
    c.execute("ALTER TABLE t RENAME COLUMN score TO points")
    c.insert(spark, "t",
             spark.createDataFrame([(3, 3.5)], "id long, points double"),
             batch_id=2)
    got = {r["id"]: r["points"] for r in
           c.query(spark, "SELECT id, points FROM t").collect()}
    assert got == {1: 1.5, 2: 2.5, 3: 3.5}
    # SHOW CREATE renders the current name and round-trips
    text = c.execute("SHOW CREATE TABLE t", spark=spark).collect()[0][0]
    assert "points" in text and "score" not in text


def test_rename_column_refusals(spark, tmp_path):
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (id Int64, v Float64, "
              "v2 Float64 MATERIALIZED v * 2) "
              "ENGINE = MergeTree ORDER BY (id)")
    with pytest.raises(ChSqlError, match="sorting-key"):
        c.execute("ALTER TABLE t RENAME COLUMN id TO uid")
    with pytest.raises(ChSqlError, match="references it"):
        c.execute("ALTER TABLE t RENAME COLUMN v TO val")  # v2 uses v
    with pytest.raises(ChSqlError, match="already exists"):
        c.execute("ALTER TABLE t RENAME COLUMN v2 TO v")
    # mutations refuse after a rename, with the documented way out
    c.execute("ALTER TABLE t RENAME COLUMN v2 TO cents")
    c.insert(spark, "t",
             spark.createDataFrame([(1, 1.0)], "id long, v double"))
    with pytest.raises(ChSqlError, match="RENAME"):
        c.execute("ALTER TABLE t UPDATE v = v + 1 WHERE id = 1",
                  spark=spark)


def test_sample_by_in_create_enables_verbatim_sample(spark, tmp_path):
    """r12: a CREATE-declared SAMPLE BY key makes verbatim
    `SELECT ... SAMPLE f [OFFSET o]` work against catalog tables —
    deterministic, disjoint bands, CH's primary-key constraint
    enforced."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (user_id UInt32, v Float64) "
              "ENGINE = MergeTree ORDER BY (user_id) SAMPLE BY user_id")
    assert c.tables["t"].sample_by == "user_id"
    rows = [(i, float(i)) for i in range(200)]
    c.insert(spark, "t", spark.createDataFrame(
        rows, "user_id long, v double"))
    half = c.query(spark, "SELECT user_id FROM t SAMPLE 0.5")
    n = half.count()
    assert 0 < n < 200
    # deterministic and band-disjoint: SAMPLE 0.5 + the 0.5-offset
    # half partition the table
    other = c.query(spark, "SELECT user_id FROM t SAMPLE 0.5 OFFSET 0.5")
    a = {r["user_id"] for r in half.collect()}
    b = {r["user_id"] for r in other.collect()}
    assert a.isdisjoint(b) and len(a | b) == 200
    # SHOW CREATE renders and round-trips the clause
    text = c.execute("SHOW CREATE TABLE t", spark=spark).collect()[0][0]
    assert "SAMPLE BY user_id" in text
    c2 = ChDdlCatalog()
    c2.execute(text.replace("CREATE TABLE t", "CREATE TABLE t2"))
    assert c2.tables["t2"].sample_by == "user_id"
    # the CH constraint: the sampling column must be in the sort key
    with pytest.raises(ChSqlError, match="ORDER BY"):
        ChDdlCatalog().execute(
            "CREATE TABLE x (a UInt32, b UInt32) "
            "ENGINE = MergeTree ORDER BY (a) SAMPLE BY b")


def test_modify_column_type_is_declarative(spark, tmp_path):
    """r12: MODIFY COLUMN changes the declared type without rewriting
    parts — old parts keep their physical type and cast at read, new
    inserts conform to the new type, mixed-type part generations read
    in separate (name, type) groups."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (id Int64, v Int32) "
              "ENGINE = MergeTree ORDER BY (id)")
    c.insert(spark, "t",
             spark.createDataFrame([(1, 10)], "id long, v int"),
             batch_id=0)
    v0 = c.storage_for("t").current_version()
    c.execute("ALTER TABLE t MODIFY COLUMN v Float64")
    assert c.storage_for("t").current_version() == v0  # metadata-only
    c.insert(spark, "t",
             spark.createDataFrame([(2, 2.5)], "id long, v double"),
             batch_id=1)
    got = {r["id"]: r["v"] for r in
           c.query(spark, "SELECT id, v FROM t").collect()}
    assert got == {1: 10.0, 2: 2.5}
    types = dict(c.query(spark, "SELECT id, v FROM t").dtypes)
    assert types["v"] == "double"
    with pytest.raises(ChSqlError, match="identity"):
        c.execute("ALTER TABLE t MODIFY COLUMN id Int32")


def test_retired_physical_name_cannot_return(spark, tmp_path):
    """r13 (ADVICE): after RENAME COLUMN a TO x, the physical name `a`
    is RETIRED — old parts still carry its bytes, so a later
    RENAME b TO a or ADD COLUMN a would let read_conform silently
    serve the OLD column's data for the new one. Both refuse."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (id Int64, a Float64, b Float64) "
              "ENGINE = MergeTree ORDER BY (id)")
    c.insert(spark, "t",
             spark.createDataFrame([(1, 1.0, 2.0)],
                                   "id long, a double, b double"),
             batch_id=0)
    c.execute("ALTER TABLE t RENAME COLUMN a TO x")
    with pytest.raises(ChSqlError, match="retired"):
        c.execute("ALTER TABLE t RENAME COLUMN b TO a")
    with pytest.raises(ChSqlError, match="retired"):
        c.execute("ALTER TABLE t ADD COLUMN a Float64")
    # a genuinely fresh name is still fine
    c.execute("ALTER TABLE t RENAME COLUMN b TO c")
    got = c.query(spark, "SELECT id, x, c FROM t").collect()
    assert [(r["x"], r["c"]) for r in got] == [(1.0, 2.0)]


def test_modify_column_refuses_ttl_column(spark, tmp_path):
    """r13 (ADVICE): MODIFY COLUMN on the table-TTL column refuses —
    old parts' zone-map stats stay in the old physical type and the
    pruned MATERIALIZE TTL delete would compare them against the new
    declared type (mis-prune risk). Same contract RENAME enforces."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (d Date, v Float64) "
              "ENGINE = MergeTree ORDER BY (d) "
              "TTL d + INTERVAL 30 DAY")
    with pytest.raises(ChSqlError, match="TTL"):
        c.execute("ALTER TABLE t MODIFY COLUMN d DateTime")
    # non-TTL columns still modify fine
    c.execute("ALTER TABLE t MODIFY COLUMN v Float32")


def test_drop_column_refuses_dangling_expression(spark, tmp_path):
    """r13 (ADVICE): DROP COLUMN refuses when another column's
    DEFAULT/MATERIALIZED/ALIAS expression references it — otherwise
    the stored expression dangles and surfaces later as a raw Spark
    analysis error at insert/read instead of a loud ChSqlError."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (id Int64, v Float64, "
              "v2 Float64 MATERIALIZED v * 2, "
              "a Float64 ALIAS v + 1) "
              "ENGINE = MergeTree ORDER BY (id)")
    with pytest.raises(ChSqlError, match="references it"):
        c.execute("ALTER TABLE t DROP COLUMN v")
    # dropping the referencing columns first unblocks it
    c.execute("ALTER TABLE t DROP COLUMN v2", spark=spark)
    c.execute("ALTER TABLE t DROP COLUMN a", spark=spark)
    c.execute("ALTER TABLE t DROP COLUMN v", spark=spark)
    assert [f.name for f in c.tables["t"].schema.fields] == ["id"]


def test_headerless_csv_upload_with_expression_columns(spark, tmp_path):
    """r13 (ADVICE): a header-less FORMAT CSV body binds positionally
    to the user-insertable columns only — MATERIALIZED/ALIAS columns
    are excluded, mirroring the column-less VALUES contract."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (id Int64, v Float64, "
              "cents Float64 MATERIALIZED v * 100.0, "
              "twice Float64 ALIAS v * 2) "
              "ENGINE = MergeTree ORDER BY (id)")
    c.insert_csv_rows(spark, "t", ["1,1.5", "2,2.25"])
    got = {r["id"]: (r["v"], r["cents"], r["twice"]) for r in
           c.query(spark, "SELECT id, v, cents, twice FROM t").collect()}
    assert got == {1: (1.5, 150.0, 3.0), 2: (2.25, 225.0, 4.5)}


def test_system_gate_is_word_bounded(spark, tmp_path):
    """r13 (VERDICT): the lazy system.* build triggers only on a
    whole-word `tables`/`columns`/`parts` reference — a user table
    named `spare_parts` no longer builds the metadata frames."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE spare_parts (id Int64, n String) "
              "ENGINE = MergeTree ORDER BY (id)")
    c.insert(spark, "spare_parts",
             spark.createDataFrame([(1, "bolt")], "id long, n string"),
             batch_id=0)

    def boom(_spark):
        raise AssertionError("system frames built for a non-system query")

    orig = c._system_frames
    c._system_frames = boom
    try:
        rows = c.query(spark,
                       "SELECT id, n FROM spare_parts").collect()
        assert [(r["id"], r["n"]) for r in rows] == [(1, "bolt")]
    finally:
        c._system_frames = orig
    # whole-word reference still builds them
    parts = c.query(spark,
                    "SELECT table FROM system.parts").collect()
    assert {r["table"] for r in parts} == {"spare_parts"}


def test_create_with_codec_ttl_comment_round_trips(spark, tmp_path):
    """r13 (VERDICT r12 #4): the reference-style CREATE with COMMENT /
    CODEC / column-TTL clauses parses, records each as explicit
    metadata, and SHOW CREATE round-trips through the parser."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t ("
        "  id Int64 COMMENT 'primary id' CODEC(Delta, ZSTD(3)),"
        "  ts DateTime CODEC(DoubleDelta),"
        "  note Nullable(String) TTL ts + INTERVAL 30 DAY "
        "    COMMENT 'it''s transient',"
        "  v Float64 DEFAULT 0.0 CODEC(ZSTD(1))"
        ") ENGINE = MergeTree ORDER BY (id)"
    )
    spec = c.tables["t"]
    assert spec.codecs == {"id": "Delta, ZSTD(3)", "ts": "DoubleDelta",
                           "v": "ZSTD(1)"}
    assert spec.comments == {"id": "primary id", "note": "it's transient"}
    assert spec.column_ttl == {"note": ("ts", 30, "DAY")}
    text = c.execute("SHOW CREATE TABLE t", spark=spark).collect()[0][0]
    assert "CODEC(Delta, ZSTD(3))" in text
    assert "COMMENT 'it\\'s transient'" in text
    assert "TTL ts + INTERVAL 30 DAY" in text
    c2 = ChDdlCatalog()
    c2.execute(text.replace("CREATE TABLE t", "CREATE TABLE t2"))
    s2 = c2.tables["t2"]
    assert s2.codecs == spec.codecs
    assert s2.comments == spec.comments
    assert s2.column_ttl == spec.column_ttl
    # DESCRIBE surfaces all three (CH's full DESCRIBE column set)
    d = {r["name"]: (r["comment"], r["codec_expression"],
                     r["ttl_expression"])
         for r in c.execute("DESCRIBE TABLE t", spark=spark).collect()}
    assert d["id"] == ("primary id", "CODEC(Delta, ZSTD(3))", "")
    assert d["note"] == ("it's transient", "", "ts + INTERVAL 30 DAY")
    # system.columns carries comment + compression_codec
    rows = {r["name"]: (r["comment"], r["compression_codec"]) for r in
            c.query(spark,
                    "SELECT name, comment, compression_codec "
                    "FROM system.columns WHERE table = 't'").collect()}
    assert rows["id"] == ("primary id", "CODEC(Delta, ZSTD(3))")
    assert rows["v"] == ("", "CODEC(ZSTD(1))")


def test_column_ttl_materialize_resets_values(spark, tmp_path):
    """r13: MATERIALIZE TTL applies column TTLs — values whose TTL
    clock column is older than the cutoff reset to the column DEFAULT
    (or NULL), rows survive (the CH column-TTL contract, vs the
    row-dropping table TTL)."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t ("
        "  id Int64, ts DateTime,"
        "  note Nullable(String) TTL ts + INTERVAL 30 DAY,"
        "  score Float64 DEFAULT -1.0 TTL ts + INTERVAL 90 DAY"
        ") ENGINE = MergeTree ORDER BY (id)"
    )
    rows = [(1, "2024-01-01 00:00:00", "old", 1.5),
            (2, "2024-03-20 00:00:00", "mid", 2.5),
            (3, "2024-04-01 00:00:00", "new", 3.5)]
    df = spark.createDataFrame(
        rows, "id long, ts string, note string, score double"
    ).selectExpr("id", "CAST(ts AS TIMESTAMP) AS ts", "note", "score")
    c.insert(spark, "t", df)
    c.materialize_ttl(spark, "t", now="2024-04-10 00:00:00")
    got = {r["id"]: (r["note"], r["score"]) for r in
           c.query(spark, "SELECT id, note, score FROM t").collect()}
    # 30-day cutoff 2024-03-11: ids 1 (Jan) expire note; 90-day cutoff
    # 2024-01-11: id 1 expires score to its DEFAULT -1.0
    assert got == {1: (None, -1.0), 2: ("mid", 2.5), 3: ("new", 3.5)}
    assert len(got) == 3  # no rows dropped


def test_column_clause_refusals(spark, tmp_path):
    """r13: the column-clause contracts refuse loudly."""
    mk = lambda sql: ChDdlCatalog().execute(sql)  # noqa: E731
    with pytest.raises(ChSqlError, match="itself"):
        mk("CREATE TABLE x (ts DateTime TTL ts + INTERVAL 1 DAY, "
           "id Int64) ENGINE = MergeTree ORDER BY (id)")
    with pytest.raises(ChSqlError, match="identity"):
        mk("CREATE TABLE x (id Int64 TTL ts + INTERVAL 1 DAY, "
           "ts DateTime) ENGINE = MergeTree ORDER BY (id)")
    with pytest.raises(ChSqlError, match="Nullable"):
        mk("CREATE TABLE x (id Int64, ts DateTime, "
           "v Float64 TTL ts + INTERVAL 1 DAY) "
           "ENGINE = MergeTree ORDER BY (id)")
    with pytest.raises(ChSqlError, match="ALIAS"):
        mk("CREATE TABLE x (id Int64, a Float64 ALIAS id + 1 "
           "CODEC(ZSTD)) ENGINE = MergeTree ORDER BY (id)")
    with pytest.raises(ChSqlError, match="duplicate"):
        mk("CREATE TABLE x (id Int64 COMMENT 'a' COMMENT 'b') "
           "ENGINE = MergeTree ORDER BY (id)")
    with pytest.raises(ChSqlError, match="Date/DateTime"):
        mk("CREATE TABLE x (id Int64, n Nullable(String) "
           "TTL id + INTERVAL 1 DAY) ENGINE = MergeTree ORDER BY (id)")
    # maintenance contracts: the TTL clock column is load-bearing
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (id Int64, ts DateTime, "
              "note Nullable(String) TTL ts + INTERVAL 1 DAY) "
              "ENGINE = MergeTree ORDER BY (id)")
    with pytest.raises(ChSqlError, match="TTL"):
        c.execute("ALTER TABLE t RENAME COLUMN ts TO stamp")
    with pytest.raises(ChSqlError, match="TTL"):
        c.execute("ALTER TABLE t DROP COLUMN ts")
    with pytest.raises(ChSqlError, match="identity"):
        c.execute("ALTER TABLE t MODIFY COLUMN ts Date")
    # dropping the TTL'd column itself is fine and clears the rule
    c.execute("ALTER TABLE t DROP COLUMN note", spark=spark)
    assert c.tables["t"].column_ttl == {}


def test_add_column_with_clauses(spark, tmp_path):
    """r13: ALTER ADD COLUMN accepts the same COMMENT / CODEC /
    column-TTL clauses as CREATE, with the same validations, and the
    metadata surfaces through DESCRIBE + SHOW CREATE + MATERIALIZE."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE t (id Int64, ts DateTime) "
              "ENGINE = MergeTree ORDER BY (id)")
    c.insert(spark, "t", spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-03-20 00:00:00")],
        "id long, ts string"
    ).selectExpr("id", "CAST(ts AS TIMESTAMP) AS ts"), batch_id=0)
    c.execute("ALTER TABLE t ADD COLUMN note Nullable(String) "
              "TTL ts + INTERVAL 30 DAY COMMENT 'transient' "
              "CODEC(ZSTD(3))")
    spec = c.tables["t"]
    assert spec.column_ttl == {"note": ("ts", 30, "DAY")}
    assert spec.comments == {"note": "transient"}
    assert spec.codecs == {"note": "ZSTD(3)"}
    text = c.execute("SHOW CREATE TABLE t", spark=spark).collect()[0][0]
    assert "COMMENT 'transient'" in text and "CODEC(ZSTD(3))" in text
    # insert notes, then MATERIALIZE TTL NULLs the expired one
    c.insert(spark, "t", spark.createDataFrame(
        [(3, "2024-01-02 00:00:00", "old"),
         (4, "2024-04-01 00:00:00", "new")],
        "id long, ts string, note string"
    ).selectExpr("id", "CAST(ts AS TIMESTAMP) AS ts", "note"),
        batch_id=1)
    c.materialize_ttl(spark, "t", now="2024-04-10 00:00:00")
    got = {r["id"]: r["note"] for r in
           c.query(spark, "SELECT id, note FROM t").collect()}
    assert got == {1: None, 2: None, 3: None, 4: "new"}
    # validations hold for ADD too
    with pytest.raises(ChSqlError, match="Nullable"):
        c.execute("ALTER TABLE t ADD COLUMN v Float64 "
                  "TTL ts + INTERVAL 1 DAY")
    with pytest.raises(ChSqlError, match="ALIAS"):
        c.execute("ALTER TABLE t ADD COLUMN a Float64 ALIAS id * 2 "
                  "CODEC(ZSTD)")
    with pytest.raises(ChSqlError, match="Date/DateTime"):
        c.execute("ALTER TABLE t ADD COLUMN n2 Nullable(String) "
                  "TTL id + INTERVAL 1 DAY")


def test_create_table_as_select(spark, tmp_path):
    """r13: CTAS — CREATE TABLE ... ENGINE ... ORDER BY ... AS SELECT.
    Without a column list the schema is inferred from the SELECT (CH's
    behavior) and round-trips SHOW CREATE by construction; with one,
    the SELECT binds positionally like INSERT SELECT."""
    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute("CREATE TABLE src (id Int64, v Float64, s String) "
              "ENGINE = MergeTree ORDER BY (id)")
    c.execute("INSERT INTO src VALUES (1, 1.5, 'a'), (2, 2.5, 'b'), "
              "(3, 3.5, 'c')", spark=spark)
    # inferred schema
    c.execute("CREATE TABLE agg ENGINE = MergeTree ORDER BY (s) AS "
              "SELECT s, sum(v) AS total, count() AS n "
              "FROM src GROUP BY s", spark=spark)
    got = {r["s"]: (r["total"], r["n"]) for r in
           c.query(spark, "SELECT s, total, n FROM agg").collect()}
    assert got == {"a": (1.5, 1), "b": (2.5, 1), "c": (3.5, 1)}
    text = c.execute("SHOW CREATE TABLE agg", spark=spark).collect()[0][0]
    c2 = ChDdlCatalog()
    c2.execute(text.replace("CREATE TABLE agg", "CREATE TABLE agg2"))
    assert ([f.name for f in c2.tables["agg2"].schema.fields]
            == ["s", "total", "n"])
    # explicit column list binds positionally; expression columns fire
    c.execute("CREATE TABLE derived (id Int64, doubled Float64, "
              "lab String DEFAULT 'x', "
              "cents Float64 MATERIALIZED doubled * 100.0) "
              "ENGINE = MergeTree ORDER BY (id) AS "
              "SELECT id, v * 2, s FROM src", spark=spark)
    got2 = {r["id"]: (r["doubled"], r["lab"], r["cents"]) for r in
            c.query(spark,
                    "SELECT id, doubled, lab, cents FROM derived"
                    ).collect()}
    assert got2 == {1: (3.0, "a", 300.0), 2: (5.0, "b", 500.0),
                    3: (7.0, "c", 700.0)}
    # width mismatch refuses loudly
    with pytest.raises(ChSqlError, match="expected"):
        c.execute("CREATE TABLE w (a Int64, b Int64, c Int64) "
                  "ENGINE = MergeTree ORDER BY (a) AS "
                  "SELECT id FROM src", spark=spark)
    # the ORDER BY key must exist in the inferred schema
    with pytest.raises(ChSqlError):
        c.execute("CREATE TABLE bad ENGINE = MergeTree ORDER BY (nope) "
                  "AS SELECT id FROM src", spark=spark)


def test_refused_alter_add_leaves_no_phantom_state(spark, tmp_path):
    """r13 s3 (review): a REFUSED ALTER ADD COLUMN must mutate nothing
    — previously the DEFAULT/MATERIALIZED/ALIAS expression registered
    before the clause validations, so a plain retry of the same column
    silently inherited the refused clause."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog, ChSqlError

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE t (a Int64, y String) "
                "ENGINE = MergeTree ORDER BY a")
    with pytest.raises(ChSqlError, match="ALIAS is never stored"):
        cat.execute(
            "ALTER TABLE t ADD COLUMN x String ALIAS upper(y) CODEC(LZ4)")
    spec = cat.tables["t"]
    assert "x" not in spec.aliases and "x" not in spec.codecs
    assert "x" not in {f.name for f in spec.schema.fields}
    # the retry WITHOUT the refused clause declares a plain column
    cat.execute("ALTER TABLE t ADD COLUMN x String")
    spec = cat.tables["t"]
    assert "x" not in spec.aliases  # no phantom ALIAS inherited
    cat.execute("INSERT INTO t VALUES (1, 'a', 'stored')", spark=spark)
    rows = cat.query(spark, "SELECT a, x FROM t").collect()
    assert rows == [(1, "stored")]


def test_failed_ctas_leaves_no_table(spark, tmp_path):
    """r13 s3 (review): a refused/failed CTAS must not leave the table
    declared (CH's contract)."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog, ChSqlError

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE src (a Int64) ENGINE = MergeTree ORDER BY a")
    cat.execute("INSERT INTO src VALUES (1)", spark=spark)
    with pytest.raises(ChSqlError, match="Kafka"):
        cat.execute(
            "CREATE TABLE k (a Int64) ENGINE = Kafka "
            "SETTINGS kafka_broker_list = 'b:9092', "
            "kafka_topic_list = 't', kafka_group_name = 'g', "
            "kafka_format = 'AvroConfluent' AS SELECT a FROM src",
            spark=spark)
    assert "k" not in cat.tables
    # auto-generated expression names refuse with a CTAS message
    with pytest.raises(ChSqlError, match="alias each computed column"):
        cat.execute(
            "CREATE TABLE t2 ENGINE = MergeTree ORDER BY a "
            "AS SELECT a, a + 1 FROM src", spark=spark)
    assert "t2" not in cat.tables
    # duplicate output names refuse
    with pytest.raises(ChSqlError, match="duplicate result column"):
        cat.execute(
            "CREATE TABLE t3 ENGINE = MergeTree ORDER BY a "
            "AS SELECT a, a FROM src", spark=spark)
    assert "t3" not in cat.tables


def test_tsv_empty_line_is_a_row_for_single_string_column(spark, tmp_path):
    """r13 s3 (review): CH inserts an empty line as the empty-string
    row for a one-String-column table; the old empty-line filter
    silently dropped it."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog, ChSqlError

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE t (s String) ENGINE = MergeTree ORDER BY s")
    cat.insert_tsv_rows(spark, "t", ["a", "", "b"])
    got = sorted(r[0] for r in cat.query(spark, "SELECT s FROM t").collect())
    assert got == ["", "a", "b"]
    # for a wider table an empty line is a loud width error, like CH
    cat.execute("CREATE TABLE t2 (a String, b String) "
                "ENGINE = MergeTree ORDER BY a")
    with pytest.raises(ChSqlError, match="1 fields, expected 2"):
        cat.insert_tsv_rows(spark, "t2", ["x\ty", ""])


def test_tsv_with_names_and_types_upload(spark, tmp_path):
    """r13 s3 (review): TabSeparatedWithNamesAndTypes round-trips —
    the download format can be POSTed straight back (the types row is
    read and discarded; declared types rule)."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE t (id UInt32, v Float64) "
                "ENGINE = MergeTree ORDER BY id")
    cat.insert_tsv_rows(
        spark, "t",
        ["v\tid", "Float64\tUInt32", "2.5\t1", "3.5\t2"],
        with_names=True, with_types=True,
    )
    rows = cat.query(spark, "SELECT id, v FROM t ORDER BY id").collect()
    assert [tuple(r) for r in rows] == [(1, 2.5), (2, 3.5)]


def test_ctas_refuses_existing_table_and_preserves_it(spark, tmp_path):
    """r13 s3 (review 2): CTAS over an existing name refuses — and
    therefore a failed CTAS can never roll back a PRE-EXISTING table's
    registration."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog, ChSqlError

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE t (a Int64) ENGINE = MergeTree ORDER BY a")
    cat.execute("INSERT INTO t VALUES (7)", spark=spark)
    with pytest.raises(ChSqlError, match="already exists"):
        cat.execute("CREATE TABLE t ENGINE = MergeTree ORDER BY a "
                    "AS SELECT a FROM t", spark=spark)
    assert "t" in cat.tables
    assert [r[0] for r in cat.query(spark, "SELECT a FROM t").collect()] \
        == [7]


def test_csv_empty_line_is_a_row_for_single_string_column(spark, tmp_path):
    """r13 s3 (review 2): same contract as the TSV fix — CH inserts a
    blank CSV line as the empty-string row for a one-String-column
    table; a whitespace-only line is a legitimate value."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog, ChSqlError

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE t (s String) ENGINE = MergeTree ORDER BY s")
    cat.insert_csv_rows(spark, "t", ["a", "", " ", "b"])
    got = sorted(r[0] for r in cat.query(spark, "SELECT s FROM t").collect())
    assert got == ["", " ", "a", "b"]
    cat.execute("CREATE TABLE t2 (a String, b String) "
                "ENGINE = MergeTree ORDER BY a")
    # an INTERIOR blank line in a 2-column upload is a loud width
    # error like CH (a trailing one reads as the final newline)
    with pytest.raises(ChSqlError, match="1 fields, expected 2"):
        cat.insert_csv_rows(spark, "t2", ["x,y", "", "p,q"])


def test_show_databases_lists_declared_empty_database(spark, tmp_path):
    """r13 s3 (review 2): a database created via CREATE DATABASE lists
    immediately, before any table exists in it (BI clients enumerate
    databases first — a real CH server lists empty ones)."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE DATABASE shop")
    rows = cat.execute("SHOW DATABASES", spark=spark).collect()
    assert "shop" in {r[0] for r in rows}


def test_native_blocks_all_or_nothing_on_unbindable_block(spark, tmp_path):
    """r13 s3 (review 3): a later Native block that cannot bind (e.g.
    missing a non-DEFAULT column) aborts BEFORE any earlier block
    commits — the all-or-nothing upload contract."""
    from pyspark.sql import types as T

    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog, ChSqlError
    from postgre_to_clickhouse_spark.ch_native import serialize_native

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE t (a Int64, b Int64) "
                "ENGINE = MergeTree ORDER BY a")
    both = [T.StructField("a", T.LongType(), False),
            T.StructField("b", T.LongType(), False)]
    only_a = [T.StructField("a", T.LongType(), False)]
    payload = (serialize_native(both, [(1, 10), (2, 20)])
               + serialize_native(only_a, [(3,)]))
    with pytest.raises(ChSqlError):
        cat.insert_native_blocks(spark, "t", payload)
    assert cat.query(spark, "SELECT a FROM t").count() == 0


def test_ctas_if_not_exists_is_a_silent_noop(spark, tmp_path):
    """r13 s3 (review 3): CREATE TABLE IF NOT EXISTS ... AS SELECT
    over an existing table is CH's silent no-op (and the SELECT never
    runs) — idempotent provisioning scripts re-run cleanly."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE src (a Int64) ENGINE = MergeTree ORDER BY a")
    cat.execute("INSERT INTO src VALUES (1), (2)", spark=spark)
    stmt = ("CREATE TABLE IF NOT EXISTS summary ENGINE = MergeTree "
            "ORDER BY a AS SELECT a FROM src")
    cat.execute(stmt, spark=spark)
    cat.execute("INSERT INTO src VALUES (3)", spark=spark)
    cat.execute(stmt, spark=spark)  # second run: no-op, no error
    # summary still carries only the FIRST run's snapshot
    assert cat.query(spark, "SELECT a FROM summary").count() == 2


def test_explain_estimate_prunes_parts(spark, tmp_path):
    """r14 (VERDICT r13 boundary list): EXPLAIN ESTIMATE answers from
    the manifest's own part statistics — the range probe must prune to
    exactly the matching insert's files, and rows/marks must come from
    the surviving parquet footers."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE te (user_id UInt64, v String) "
                "ENGINE = MergeTree ORDER BY user_id", spark=spark)
    for base in (0, 100, 200, 300):
        vals = ", ".join(f"({base + i}, 'v{base + i}')" for i in range(50))
        cat.execute(f"INSERT INTO te VALUES {vals}", spark=spark)
    full = cat.execute("EXPLAIN ESTIMATE SELECT * FROM te",
                       spark=spark).collect()[0]
    assert (full["database"], full["table"]) == ("default", "te")
    assert full["rows"] == 200
    hit = cat.execute(
        "EXPLAIN ESTIMATE SELECT v FROM te "
        "WHERE user_id >= 200 AND user_id <= 220", spark=spark).collect()[0]
    assert hit["rows"] == 50  # only the third insert's zone maps match
    assert hit["parts"] < full["parts"]
    btw = cat.execute(
        "EXPLAIN ESTIMATE SELECT v FROM te "
        "WHERE user_id BETWEEN 200 AND 220", spark=spark).collect()[0]
    assert tuple(btw) == tuple(hit)  # BETWEEN's own AND must not split
    import pytest as _pytest

    from postgre_to_clickhouse_spark.ch_select import ChSqlError

    with _pytest.raises(ChSqlError, match="single-table"):
        cat.execute("EXPLAIN ESTIMATE SELECT * FROM te "
                    "JOIN te USING (user_id)", spark=spark)
    with _pytest.raises(ChSqlError, match="no FROM"):
        cat.execute("EXPLAIN ESTIMATE SELECT 1", spark=spark)


def test_estimate_probe_extraction():
    """The conjunct extractor: index-usable shapes become probes, the
    rest contribute nothing (conservative), BETWEEN survives the AND
    split, literal-first comparisons mirror their operator."""
    import datetime as dt

    from postgre_to_clickhouse_spark.ch_ddl import _estimate_probes

    w, e = _estimate_probes(
        "SELECT * FROM t WHERE user_id >= 10 AND user_id < 20 "
        "AND name = 'x' AND f(a) > 3 ORDER BY user_id")
    assert ("user_id", 10, None) in w and ("user_id", None, 20) in w
    assert ("name", "x", "x") in w and e == [("name", "x")]
    assert not any(c == "a" for c, *_ in w)  # f(a) is not index-usable
    w, e = _estimate_probes(
        "SELECT * FROM t WHERE ts BETWEEN toDateTime('2024-03-01 00:00:00')"
        " AND toDateTime('2024-03-02 00:00:00') AND v > 1")
    assert w[0] == ("ts", dt.datetime(2024, 3, 1), dt.datetime(2024, 3, 2))
    assert ("v", 1, None) in w
    w, e = _estimate_probes(
        "SELECT * FROM t WHERE user_id IN (3, 5, 7) AND 100 > user_id")
    assert ("user_id", 3, 7) in w and ("user_id", None, 100) in w
    assert _estimate_probes("SELECT * FROM t") == ([], [])


def test_create_view_expands_at_read(spark, tmp_path):
    """r14: plain CREATE VIEW — the ordinary CH View engine: a stored
    query expanded at read time (later inserts are visible), views on
    views compose, cycles refuse loudly, DROP VIEW/TABLE both work,
    and the introspection surface answers like a CH server."""
    import pytest as _pytest

    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog
    from postgre_to_clickhouse_spark.ch_select import ChSqlError

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE base (id UInt64, v Float64) "
                "ENGINE = MergeTree ORDER BY id", spark=spark)
    cat.execute("INSERT INTO base VALUES (1, 2.0), (2, 4.0)", spark=spark)
    cat.execute("CREATE VIEW doubled AS SELECT id, v * 2 AS v2 FROM base",
                spark=spark)
    got = cat.query(spark, "SELECT id, v2 FROM doubled ORDER BY id")
    assert [tuple(r) for r in got.collect()] == [(1, 4.0), (2, 8.0)]
    # NOT materialized: a later insert is visible through the view
    cat.execute("INSERT INTO base VALUES (3, 5.0)", spark=spark)
    assert cat.query(spark, "SELECT count() AS n FROM doubled") \
        .collect()[0]["n"] == 3
    # view over view
    cat.execute("CREATE VIEW big AS SELECT id FROM doubled WHERE v2 > 7",
                spark=spark)
    assert sorted(r["id"] for r in
                  cat.query(spark, "SELECT id FROM big").collect()) == [2, 3]
    # introspection
    names = [r["name"] for r in cat.execute("SHOW TABLES", spark=spark)
             .collect()]
    assert "doubled" in names and "base" in names
    stmt = cat.execute("SHOW CREATE VIEW doubled", spark=spark) \
        .collect()[0]["statement"]
    assert stmt.startswith("CREATE VIEW doubled AS SELECT")
    d = cat.execute("DESCRIBE doubled", spark=spark).collect()
    assert [(r["name"], r["type"]) for r in d] == [
        ("id", "bigint"), ("v2", "double")]
    assert cat.execute("EXISTS TABLE doubled", spark=spark) \
        .collect()[0]["result"] == 1
    eng = {r["name"]: r["engine"] for r in cat.query(
        spark, "SELECT name, engine FROM system.tables").collect()}
    assert eng["doubled"] == "View"
    # duplicate name refuses; IF NOT EXISTS is the silent no-op
    with _pytest.raises(ChSqlError, match="already exists"):
        cat.execute("CREATE VIEW doubled AS SELECT 1 AS x", spark=spark)
    cat.execute("CREATE VIEW IF NOT EXISTS doubled AS SELECT 1 AS x",
                spark=spark)
    assert cat.query(spark, "SELECT count() AS n FROM doubled") \
        .collect()[0]["n"] == 3  # original body kept
    # cycle refusal (mutual: rebuild 'doubled' to reference 'big')
    cat.execute("DROP VIEW doubled", spark=spark)
    cat.execute("CREATE VIEW doubled AS SELECT id, 0.0 AS v2 FROM big",
                spark=spark)
    with _pytest.raises(ChSqlError, match="cycle"):
        cat.query(spark, "SELECT * FROM big")
    # DROP guards
    with _pytest.raises(ChSqlError, match="not a view"):
        cat.execute("DROP VIEW base", spark=spark)
    cat.execute("DROP TABLE big", spark=spark)  # DROP TABLE works on views
    assert cat.execute("EXISTS TABLE big", spark=spark) \
        .collect()[0]["result"] == 0
    assert cat.execute("DROP VIEW IF EXISTS nope", spark=spark) is None


def test_rename_table_rekeys_storage(spark, tmp_path):
    """r14: RENAME TABLE — metadata-only re-key; data follows the
    handle, multi-pair renames (incl. a name SWAP through a temp) are
    validated all-pairs-first, and stale references fail loudly."""
    import pytest as _pytest

    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog
    from postgre_to_clickhouse_spark.ch_select import ChSqlError

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE a (id UInt64, v String) "
                "ENGINE = MergeTree ORDER BY id", spark=spark)
    cat.execute("INSERT INTO a VALUES (1, 'x'), (2, 'y')", spark=spark)
    cat.execute("RENAME TABLE a TO b", spark=spark)
    assert cat.query(spark, "SELECT count() AS n FROM b") \
        .collect()[0]["n"] == 2
    with _pytest.raises(ChSqlError, match="unknown table"):
        cat.query(spark, "SELECT count() AS n FROM a")
    # SHOW CREATE renders the new name
    stmt = cat.execute("SHOW CREATE TABLE b", spark=spark) \
        .collect()[0]["statement"]
    assert "CREATE TABLE b" in stmt
    # inserts keep working under the new name (seq re-keyed)
    cat.execute("INSERT INTO b VALUES (3, 'z')", spark=spark)
    assert cat.query(spark, "SELECT count() AS n FROM b") \
        .collect()[0]["n"] == 3
    # multi-pair: swap via temp, CH style
    cat.execute("CREATE TABLE c (id UInt64) ENGINE = MergeTree ORDER BY id",
                spark=spark)
    cat.execute("RENAME TABLE b TO tmp, c TO b, tmp TO c", spark=spark)
    assert cat.query(spark, "SELECT count() AS n FROM c") \
        .collect()[0]["n"] == 3
    # guards: target exists / source missing — and NOTHING mutates
    with _pytest.raises(ChSqlError, match="already exists"):
        cat.execute("RENAME TABLE b TO c", spark=spark)
    with _pytest.raises(ChSqlError, match="undeclared"):
        cat.execute("RENAME TABLE nope TO d", spark=spark)
    assert cat.query(spark, "SELECT count() AS n FROM c") \
        .collect()[0]["n"] == 3


def test_estimate_subquery_contributes_no_probes():
    """A subquery's WHERE must never prune the OUTER table's files —
    any statement with a subquery estimates conservatively."""
    from postgre_to_clickhouse_spark.ch_ddl import _estimate_probes

    w, e = _estimate_probes(
        "SELECT (SELECT max(x) FROM u WHERE x < 5) AS m FROM t")
    assert (w, e) == ([], [])
    w, e = _estimate_probes(
        "SELECT * FROM t WHERE id IN (SELECT id FROM u WHERE id > 3)")
    assert (w, e) == ([], [])


def test_view_self_name_alias_is_not_a_cycle(spark, tmp_path):
    """r15 (ADVICE r14 medium): a view whose own SELECT mentions its
    name as an output ALIAS or inside a string literal is NOT
    self-referencing — CH allows such views. Only a table-reference-
    position mention (FROM/JOIN) recurses."""
    import pytest as _pytest

    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog
    from postgre_to_clickhouse_spark.ch_select import ChSqlError

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE t (x UInt64) ENGINE = MergeTree ORDER BY x",
                spark=spark)
    cat.execute("INSERT INTO t VALUES (1), (2), (3)", spark=spark)
    # the ADVICE repro: output alias equals the view's own name
    cat.execute("CREATE VIEW totals AS SELECT sum(x) AS totals FROM t",
                spark=spark)
    got = cat.query(spark, "SELECT totals FROM totals").collect()
    assert [r["totals"] for r in got] == [6]
    # name inside a string literal is data, not a reference
    cat.execute("CREATE VIEW labeled AS "
                "SELECT 'labeled' AS tag, count() AS n FROM t",
                spark=spark)
    r = cat.query(spark, "SELECT tag, n FROM labeled").collect()[0]
    assert (r["tag"], r["n"]) == ("labeled", 3)
    # a REAL self-reference still refuses loudly
    cat.execute("CREATE VIEW selfy AS SELECT x FROM selfy", spark=spark)
    with _pytest.raises(ChSqlError, match="cycle"):
        cat.query(spark, "SELECT x FROM selfy")


def test_view_after_from_subquery_comma_expands(spark, tmp_path):
    """ADVICE r15: a view referenced as a comma continuation AFTER a
    parenthesized derived table in FROM position must still expand —
    the subquery suspends the FROM list only until its matching ')'.
    Unit-level: _table_refs sees through (nested) FROM subqueries."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog, _table_refs

    assert _table_refs(
        "SELECT * FROM (SELECT 1) t, myview") == {"myview"}
    assert _table_refs(
        "SELECT * FROM (SELECT x FROM (SELECT 1) u) t, v") == {"v"}
    assert _table_refs(
        "SELECT * FROM (SELECT x FROM inner_t) t, myview"
    ) == {"inner_t", "myview"}
    # r16 review: a scalar subquery in the SELECT list must not leave
    # in_from dangling — 'v' here is a select column, not a table
    assert _table_refs(
        "SELECT (SELECT max(x) FROM t) AS m, v FROM base"
    ) == {"t", "base"}

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE t (x UInt64) ENGINE = MergeTree ORDER BY x",
                spark=spark)
    cat.execute("INSERT INTO t VALUES (1), (2), (3)", spark=spark)
    cat.execute("CREATE VIEW sums AS SELECT sum(x) AS s FROM t",
                spark=spark)
    got = cat.query(
        spark,
        "SELECT d.k, sums.s FROM "
        "(SELECT number + 1 AS k FROM numbers(1)) d, sums",
    ).collect()
    assert [tuple(r) for r in got] == [(1, 6)]
    # plain comma list over base tables = CROSS JOIN + WHERE filtering
    got2 = cat.query(
        spark,
        "SELECT a.x AS ax, b.x AS bx FROM t AS a, t AS b "
        "WHERE a.x < b.x ORDER BY ax, bx",
    ).collect()
    assert [tuple(r) for r in got2] == [(1, 2), (1, 3), (2, 3)]


def test_explain_estimate_with_query_targets_top_level_from(spark, tmp_path):
    """r15 (ADVICE r14 low): EXPLAIN ESTIMATE must resolve the table
    the OUTER query reads — a WITH query whose first textual FROM is
    the CTE's inner table must not silently estimate the wrong table,
    and a top-level FROM over a subquery refuses loudly."""
    import pytest as _pytest

    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog
    from postgre_to_clickhouse_spark.ch_select import ChSqlError

    cat = ChDdlCatalog(storage_root=str(tmp_path))
    cat.execute("CREATE TABLE small (id UInt64) "
                "ENGINE = MergeTree ORDER BY id", spark=spark)
    cat.execute("CREATE TABLE big (id UInt64) "
                "ENGINE = MergeTree ORDER BY id", spark=spark)
    cat.execute("INSERT INTO small VALUES (1)", spark=spark)
    cat.execute("INSERT INTO big VALUES (1), (2), (3), (4)", spark=spark)
    # CTE reads `small`; the outer query reads `big` — the estimate
    # must describe BIG (depth-0 FROM), not the CTE's inner table
    got = cat.execute(
        "EXPLAIN ESTIMATE WITH s AS (SELECT id FROM small) "
        "SELECT * FROM big", spark=spark).collect()[0]
    assert (got["table"], got["rows"]) == ("big", 4)
    # outer query reading the CTE itself: loud unknown-table refusal,
    # never a wrong-table estimate
    with _pytest.raises(ChSqlError, match="unknown table"):
        cat.execute("EXPLAIN ESTIMATE WITH s AS (SELECT id FROM small) "
                    "SELECT * FROM s", spark=spark)
    # top-level FROM over a subquery: loud refusal naming the move
    with _pytest.raises(ChSqlError, match="subquery"):
        cat.execute("EXPLAIN ESTIMATE SELECT * FROM "
                    "(SELECT id FROM small)", spark=spark)
