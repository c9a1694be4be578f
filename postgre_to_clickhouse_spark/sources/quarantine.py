"""Corrupt-record quarantine (robust ingest at 100 TB).

FAILFAST is right for declared-schema pipelines (fail loudly), but a
100 TB backfill over heterogeneous files needs the PERMISSIVE +
quarantine pattern: parse what parses, route what doesn't to a
quarantine sink with full fidelity for replay. This module is that
pattern as reusable operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean, quarantined) DataFrames from one pass setup.

    The schema is extended with the corrupt-record column; rows where it
    is non-null failed parsing and carry the raw line for replay.
    """
    full_schema = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark requires caching/materializing before filtering on the corrupt
    # column (it is populated at parse time, not re-derivable later).
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"), F.current_timestamp().alias("quarantined_at")
    )
    return clean, quarantined
