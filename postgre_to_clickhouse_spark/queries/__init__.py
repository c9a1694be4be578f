"""Driver-facing query battery (SURVEY.md §2 inventory → `queries()`).

Importing this package populates the registry from the tier modules.
"""

from postgre_to_clickhouse_spark.queries.registry import ORACLES, QUERIES

# Populate registries (import order = presentation order).
from postgre_to_clickhouse_spark.queries import tiera  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierb  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierb2  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierb3  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tpch_extra  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tpch_suite  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc2  # noqa: E402,F401
from postgre_to_clickhouse_spark.queries import tierc3  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES"]
