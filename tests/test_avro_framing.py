"""Golden-byte tests for the Confluent Avro framing glue (SURVEY.md §4.3).

The reference ingests ``AvroConfluent``-framed Kafka values
(/root/reference/README.md:201-202): magic 0x0 + 4-byte BE schema id +
Avro binary. Framing is pure column arithmetic (jar-free); the Avro byte
decode itself needs the external spark-avro jar and is skipped when absent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from postgre_to_clickhouse_spark.cdc import avro as A


def _frame_df(spark, payloads):
    rows = [(bytearray(A.frame(p, sid)),) for p, sid in payloads]
    return spark.createDataFrame(rows, StructType([StructField("value", BinaryType())]))


def test_frame_roundtrip_golden_bytes():
    framed = A.frame(b"\x02\x06foo", 7)
    assert framed == b"\x00\x00\x00\x00\x07\x02\x06foo"
    assert framed[0] == 0 and len(framed) == A.HEADER_LEN + 5


def test_schema_id_and_payload_extraction(spark):
    df = _frame_df(spark, [(b"abc", 1), (b"\xff\x00\xff", 131074), (b"", 7)])
    out = df.select(A.schema_id_expr("value"), A.avro_payload("value").alias("p")).collect()
    assert [(r.schema_id, bytes(r.p)) for r in out] == [
        (1, b"abc"),
        (131074, b"\xff\x00\xff"),
        (7, b""),
    ]


def test_framing_is_jvm_side(spark):
    # The framing must stay in whole-stage codegen (no Python UDF at 100 TB).
    df = _frame_df(spark, [(b"abc", 1)]).select(A.schema_id_expr("value"))
    assert "BatchEvalPython" not in df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_decode_confluent_avro_gated(spark):
    try:
        from pyspark.sql.avro.functions import from_avro  # noqa: F401
    except ImportError:
        pytest.skip("spark-avro python shim unavailable")
    # Python shim imports fine on pip pyspark; the jar-backed call fails
    # lazily. Just assert our wrapper builds a Column without error.
    col = A.decode_confluent_avro("value", '{"type":"record","name":"r","fields":[]}')
    assert col is not None


def test_static_registry():
    reg = A.StaticSchemaRegistry({1: '{"type":"string"}'})
    assert reg.schema_by_id(1) == '{"type":"string"}'


# --------------------------------------------------------------------------
# Pure-Python Avro binary codec (cdc/avro_py.py) — the jar-free decode
# path, asserted on VALUES end-to-end, not just framing.
# --------------------------------------------------------------------------
def test_avro_py_golden_bytes():
    """Hand-computed spec bytes: zigzag varints + length-prefixed runs."""
    from postgre_to_clickhouse_spark.cdc import avro_py as AP

    assert AP.zigzag_varint(0) == b"\x00"
    assert AP.zigzag_varint(-1) == b"\x01"
    assert AP.zigzag_varint(1) == b"\x02"
    assert AP.zigzag_varint(-64) == b"\x7f"
    assert AP.zigzag_varint(64) == b"\x80\x01"
    schema = '{"type":"record","name":"r","fields":[{"name":"a","type":"int"},{"name":"s","type":["null","string"]}]}'
    enc = AP.encode_record({"a": 3, "s": "hi"}, schema)
    # a=3 → 0x06; union branch 1 → 0x02; len("hi")=2 → 0x04; "hi"
    assert enc == b"\x06\x02\x04hi"
    assert AP.decode_record(enc, schema) == {"a": 3, "s": "hi"}
    assert AP.decode_record(b"\x06\x00", schema) == {"a": 3, "s": None}


def test_avro_py_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from postgre_to_clickhouse_spark.cdc import avro_py as AP

    schema = """
    {"type":"record","name":"r","fields":[
      {"name":"i","type":"int"},
      {"name":"l","type":"long"},
      {"name":"d","type":"double"},
      {"name":"s","type":["null","string"]},
      {"name":"b","type":"boolean"},
      {"name":"arr","type":{"type":"array","items":"long"}},
      {"name":"m","type":{"type":"map","values":"string"}}
    ]}
    """

    @settings(max_examples=200, deadline=None)
    @given(
        i=st.integers(-(2**31), 2**31 - 1),
        ln=st.integers(-(2**63), 2**63 - 1),
        d=st.floats(allow_nan=False),
        s=st.none() | st.text(max_size=40),
        b=st.booleans(),
        arr=st.lists(st.integers(-(2**63), 2**63 - 1), max_size=8),
        m=st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=5),
    )
    def check(i, ln, d, s, b, arr, m):
        rec = {"i": i, "l": ln, "d": d, "s": s, "b": b, "arr": arr, "m": m}
        assert AP.decode_record(AP.encode_record(rec, schema), schema) == rec

    check()


def test_avro_py_end_to_end_confluent_decode(spark):
    """Full spine on real bytes: typed rows → avro-encode → Confluent
    frame → Spark binary column → Arrow-batched decode → values equal
    the source. This is the reference's AvroConfluent consumer behavior
    (README.md:201-202) executed, not just framed."""
    from postgre_to_clickhouse_spark.cdc import avro_py as AP
    from postgre_to_clickhouse_spark.cdc.schemas import USERS_AVRO_SCHEMA

    rows = [
        {"user_id": 1, "username": "alice", "account_type": "premium",
         "updated_at": 1700000000123456, "created_at": 1690000000000000},
        {"user_id": 2, "username": None, "account_type": "free",
         "updated_at": 1700000001000000, "created_at": 1690000001000000},
        {"user_id": 3, "username": "cindy", "account_type": None,
         "updated_at": 1700000002500000, "created_at": 1690000002000000},
    ]
    framed = [(bytearray(A.frame(AP.encode_record(r, USERS_AVRO_SCHEMA), 42)),) for r in rows]
    df = spark.createDataFrame(framed, StructType([StructField("value", BinaryType())]))

    # schema id survives the framing
    ids = [r.schema_id for r in df.select(A.schema_id_expr("value")).collect()]
    assert ids == [42, 42, 42]

    out = AP.decode_confluent_avro_arrow(df, USERS_AVRO_SCHEMA)
    got = sorted((r.asDict() for r in out.collect()), key=lambda r: r["user_id"])
    assert got == rows
    # Arrow path, not row-at-a-time Python
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "BatchEvalPython" not in plan


# -- schema evolution (round 4) ---------------------------------------------
USERS_V2_AVRO_SCHEMA = """
{
  "type": "record",
  "name": "Value",
  "namespace": "shop.public.users",
  "fields": [
    {"name": "user_id", "type": "long"},
    {"name": "username", "type": ["null", "string"], "default": null},
    {"name": "account_type", "type": ["null", "string"], "default": null},
    {"name": "updated_at", "type": "long"},
    {"name": "created_at", "type": "long"},
    {"name": "email", "type": ["null", "string"], "default": null}
  ]
}
"""


def test_evolving_decode_mixed_versions(spark):
    """A topic carrying v1 (5 fields, int user_id) and v2 (adds nullable
    email, widens user_id to long) records must decode under the v2
    reader in one pass: v1 rows get email=null and promoted ids, v2
    rows keep their values. Per-record schema-id dispatch."""
    from postgre_to_clickhouse_spark.cdc import avro as A
    from postgre_to_clickhouse_spark.cdc import avro_py as AP
    from postgre_to_clickhouse_spark.cdc.schemas import USERS_AVRO_SCHEMA

    v1_rows = [
        {"user_id": 1, "username": "ann", "account_type": "free", "updated_at": 10, "created_at": 1},
        {"user_id": 2, "username": "bob", "account_type": "pro", "updated_at": 20, "created_at": 2},
    ]
    v2_rows = [
        {"user_id": 3, "username": "cat", "account_type": "pro", "updated_at": 30,
         "created_at": 3, "email": "cat@example.org"},
        {"user_id": 4, "username": None, "account_type": None, "updated_at": 40,
         "created_at": 4, "email": None},
    ]
    framed = [(bytearray(A.frame(AP.encode_record(r, USERS_AVRO_SCHEMA), 1)),) for r in v1_rows]
    framed += [(bytearray(A.frame(AP.encode_record(r, USERS_V2_AVRO_SCHEMA), 2)),) for r in v2_rows]
    df = spark.createDataFrame(framed, "value binary")

    out = AP.decode_confluent_avro_arrow_evolving(
        df, {1: USERS_AVRO_SCHEMA, 2: USERS_V2_AVRO_SCHEMA}, USERS_V2_AVRO_SCHEMA
    )
    got = {r.user_id: (r.username, r.email) for r in out.collect()}
    assert got == {1: ("ann", None), 2: ("bob", None),
                   3: ("cat", "cat@example.org"), 4: (None, None)}
    assert dict(out.dtypes)["user_id"] == "bigint"  # int -> long promotion

    # FORWARD direction: old reader over new records drops the column
    back = AP.decode_confluent_avro_arrow_evolving(
        df, {1: USERS_AVRO_SCHEMA, 2: USERS_V2_AVRO_SCHEMA}, USERS_AVRO_SCHEMA
    )
    assert "email" not in back.columns and back.count() == 4
