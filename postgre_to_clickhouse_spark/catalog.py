"""Table catalog over the driver's parquet fixtures.

The reference declares a fixed schema at every hop (PG DDL, Avro schema
in the registry, ClickHouse DDL — ``/root/reference/README.md:96-102,
167-175,189-196``; SURVEY.md §1.3). We mirror that stance: a fixed table
registry, explicit load, no runtime inference in the pipeline path
(parquet footers carry the schema; we validate expected columns).

At 100 TB these tables are date/key-partitioned parquet/lakehouse tables;
the loader keeps scans lazy so Catalyst pushes filters and prunes columns
down to the file scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Known-small dimensions that are always safe to broadcast regardless of
# scale factor (bounded cardinality by construction, like TPC-H).
BROADCAST_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Timestamp normalization. The fixture generator has shipped the same
    # logical column under several physical encodings across rounds:
    #   - TIMESTAMP(NANOS): with legacy nanosAsLong (session.configure) it
    #     surfaces as epoch-nanos LongType — convert with µs truncation,
    #     the same truncation DuckDB applies reading ns→µs.
    #   - naive TIMESTAMP(MICROS): Spark 4 reads it as TIMESTAMP_NTZ
    #     (inferTimestampNTZ) — functions like unix_micros/to_utc_timestamp
    #     require TIMESTAMP, so cast. Session tz is pinned to UTC
    #     (session.configure), making the cast a pure type-tag change that
    #     matches DuckDB's naive-as-UTC interpretation.
    # Normalizing here keeps every downstream operator engine-agnostic.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    casts = {}
    for field in df.schema.fields:
        if isinstance(field.dataType, LongType) and field.name in _NANO_TS_COLS.get(name, ()):
            casts[field.name] = F.timestamp_micros(F.expr(f"{field.name} div 1000"))
        elif isinstance(field.dataType, TimestampNTZType):
            casts[field.name] = F.col(field.name).cast("timestamp")
    if casts:
        df = df.withColumns(casts)
    return df


# Tables whose parquet files carry TIMESTAMP(NANOS) columns (physical
# int64 nanos). Fixed per TESTDATA.md's generator output.
_NANO_TS_COLS = {"events": ("ts",)}


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
