"""Every oracle-backed query must match DuckDB bit-exactly at sf0.001
(the driver does the same at sf0.01 — this is the pre-flight)."""

from __future__ import annotations

import pytest

from postgre_to_clickhouse_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, name):
    problems = compare(spark, QUERIES[name], ORACLES[name], SF_ORACLE)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0 and len(df.columns) > 0
