"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship analytics query on sf0.001 (smoke).
- ``queries()`` — every implemented operator from SURVEY.md §2 as a
  (spark, sf_dir) -> DataFrame callable.
- ``oracle_sql()`` — matching DuckDB SQL for each SQL-expressible query
  (driver compares row count + schema + order-insensitive value hash at
  sf0.01). Rows-only entries (LSH/sketches/heuristics) intentionally
  have no oracle; their accuracy is asserted against exact baselines in
  ``tests/``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:  # driver may invoke us from anywhere
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue per region — 6-way star join + exact-decimal agg
    (SURVEY.md §7.1.4; proves B1/B3/B7/B11 plus broadcast planning)."""
    from pyspark.sql import functions as F

    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.queries.registry import dsum
    from postgre_to_clickhouse_spark.session import configure

    configure(spark)
    sf_dir = "/root/testdata/sf0.001"
    t = {n: catalog.load(spark, sf_dir, n) for n in catalog.TABLES}
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            dsum(rev, scale=4).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("r_name"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from postgre_to_clickhouse_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from postgre_to_clickhouse_spark.queries import ORACLES

    return dict(ORACLES)
