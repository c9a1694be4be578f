"""Schema catalog for the CDC pipeline (SURVEY.md §1.3, FIXTURES.md §1).

Every hop's schema is fixed and declared, as in the reference (PG DDL
``README.md:96-102``, Kafka-table DDL ``README.md:189-196``, final CH DDL
``README.md:166-177``). Spark has no unsigned ints, so CH ``UInt32`` →
IntegerType and ``UInt64`` → LongType (SURVEY.md §7.5.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The row payload as Debezium sees it (PG `users`, README.md:96-102).
# Timestamps travel as Avro timestamp-micros → epoch MICROSECONDS longs
# (README.md:194-195).
USER_ROW = T.StructType(
    [
        T.StructField("user_id", T.IntegerType(), False),
        T.StructField("username", T.StringType(), True),
        T.StructField("account_type", T.StringType(), True),
        T.StructField("updated_at", T.LongType(), False),
        T.StructField("created_at", T.LongType(), False),
    ]
)

# Full Debezium change-event envelope, pre-unwrap (README.md:142-143
# applies ExtractNewRecordState to flatten it; our engine keeps the
# envelope as a typed struct until its own unwrap operator runs).
DEBEZIUM_ENVELOPE = T.StructType(
    [
        T.StructField("before", USER_ROW, True),
        T.StructField("after", USER_ROW, True),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("db", T.StringType(), True),
                    T.StructField("schema", T.StringType(), True),
                    T.StructField("table", T.StringType(), True),
                    T.StructField("lsn", T.LongType(), True),
                ]
            ),
            True,
        ),
        T.StructField("op", T.StringType(), False),  # c/u/d/r
        T.StructField("ts_ms", T.LongType(), True),
    ]
)

# A Kafka record carrying the envelope, plus transport metadata the
# Kafka-engine table exposes as virtual columns (_timestamp/_offset,
# README.md:228-229).
KAFKA_CDC_RECORD = T.StructType(
    [
        T.StructField("event", DEBEZIUM_ENVELOPE, False),
        T.StructField("kafka_timestamp", T.TimestampType(), True),
        T.StructField("kafka_offset", T.LongType(), False),
        T.StructField("kafka_partition", T.IntegerType(), False),
    ]
)

# Final analytical table `shop.users` (README.md:166-177): DateTime is
# second-precision (µs truncated by toDateTime(x/1000000), README.md:226),
# kafka_time is Nullable (README.md:173).
USERS_FINAL = T.StructType(
    [
        T.StructField("user_id", T.IntegerType(), False),
        T.StructField("username", T.StringType(), True),
        T.StructField("account_type", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("kafka_time", T.TimestampType(), True),
        T.StructField("kafka_offset", T.LongType(), False),
    ]
)

# Avro schema (writer schema) for the unwrapped value, as the Confluent
# registry would store it — used by the Avro framing glue (§4.3).
USERS_AVRO_SCHEMA = """
{
  "type": "record",
  "name": "Value",
  "namespace": "shop.public.users",
  "fields": [
    {"name": "user_id", "type": "int"},
    {"name": "username", "type": ["null", "string"], "default": null},
    {"name": "account_type", "type": ["null", "string"], "default": null},
    {"name": "updated_at", "type": "long"},
    {"name": "created_at", "type": "long"}
  ]
}
"""
