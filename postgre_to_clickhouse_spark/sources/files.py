"""File-format scans (SURVEY.md B1): parquet / CSV / JSON readers with
the engine's schema-first stance — explicit schemas in the pipeline
path (inference only in dev helpers), so malformed rows fail loudly and
scans stay single-pass (no inference pre-scan at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema-declared CSV scan. FAILFAST by default: bad rows are a
    pipeline bug, not something to silently null out (PERMISSIVE is
    opt-in for quarantine flows)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    return spark.read.schema(schema).option("mode", mode).json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink (A8 batch form). At 100 TB: partition by
    low-cardinality date/key columns so readers prune; never partition
    by high-cardinality keys (small-files explosion)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
