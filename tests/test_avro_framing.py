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
