"""Confluent-framed Avro glue + schema-registry client (SURVEY.md §4.3).

The reference's ingest format is ``AvroConfluent`` with a registry lookup
(``/root/reference/README.md:201-202``): every Kafka value is
``magic(0x0, 1B) + schemaId(4B big-endian) + avro-binary``. Spark's
``from_avro`` takes a plain schema and does not understand the framing,
so the framing is handled here with built-in column expressions (JVM-side,
codegen-friendly — no Python in the hot path) and only the Avro byte
decode itself delegates to ``from_avro``.

``from_avro`` needs the external spark-avro jar; availability is probed
lazily and a clear error raised if absent (tests skip). The framing
functions themselves are jar-free and unit-tested against hand-framed
golden bytes.
"""

from __future__ import annotations

import json
import struct
import urllib.request
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

MAGIC_BYTE = b"\x00"
HEADER_LEN = 5


def schema_id_expr(value_col: str = "value") -> Column:
    """Extract the 4-byte big-endian schema id from a framed Kafka value."""
    # substring is 1-indexed; bytes 2..5 are the id. conv() parses the hex.
    return F.conv(F.hex(F.substring(F.col(value_col), 2, 4)), 16, 10).cast("int").alias("schema_id")


def avro_payload(value_col: str = "value") -> Column:
    """Strip the 5-byte Confluent header, leaving raw Avro binary."""
    c = value_col
    return F.expr(f"substring({c}, {HEADER_LEN + 1}, length({c}) - {HEADER_LEN})")


def frame(avro_binary: bytes, schema_id_: int) -> bytes:
    """Python-side framing helper (fixture/producer path)."""
    return MAGIC_BYTE + struct.pack(">I", schema_id_) + avro_binary


def encode_confluent_avro(struct_col: Column, schema_json: str, schema_id_: int) -> Column:
    """Typed struct → Confluent-framed Avro bytes (A5, the producer path):
    to_avro payload prefixed with magic 0x0 + 4-byte BE schema id, all as
    JVM column expressions (concat on binary)."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise ImportError("pyspark.sql.avro requires the spark-avro jar on the classpath") from e
    header = bytes(MAGIC_BYTE) + struct.pack(">I", schema_id_)
    return F.concat(F.lit(bytearray(header)), to_avro(struct_col, schema_json))


def decode_confluent_avro(value_col: str, reader_schema_json: str) -> Column:
    """Framed Kafka value → typed struct column via spark-avro's from_avro.

    Raises ImportError with guidance when the spark-avro jar is missing
    (pip pyspark ships without it); callers in tests skip in that case.
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise ImportError("pyspark.sql.avro requires the spark-avro jar on the classpath") from e
    return from_avro(avro_payload(value_col), reader_schema_json, {"mode": "PERMISSIVE"})


class SchemaRegistryClient:
    """Minimal Confluent SR HTTP client (GET /schemas/ids/{id},
    /subjects/{s}/versions/latest — the endpoints the reference's stack
    uses, healthcheck at ``docker-compose.yml:102``), with an LRU cache so
    executors don't hammer the registry.
    """

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    @lru_cache(maxsize=1024)  # noqa: B019 — client instances are long-lived singletons
    def schema_by_id(self, schema_id_: int) -> str:
        with urllib.request.urlopen(f"{self.base_url}/schemas/ids/{schema_id_}") as r:
            return json.loads(r.read())["schema"]

    @lru_cache(maxsize=1024)  # noqa: B019
    def latest_schema(self, subject: str) -> tuple[int, str]:
        with urllib.request.urlopen(f"{self.base_url}/subjects/{subject}/versions/latest") as r:
            body = json.loads(r.read())
            return body["id"], body["schema"]


class StaticSchemaRegistry:
    """File/dict-backed stand-in for SR in fixture-driven tests."""

    def __init__(self, schemas: dict[int, str]):
        self._schemas = dict(schemas)

    def schema_by_id(self, schema_id_: int) -> str:
        return self._schemas[schema_id_]
