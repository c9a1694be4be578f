"""Committed-golden oracle machinery (queries/goldens.py).

The main oracle gate (test_oracle_correctness) already compares each
golden-backed query against its committed parquet — these tests cover
the PRECONDITION that makes those goldens valid: the queries must be
layout-independent (same bits on any partitioning / parallelism), and
the golden install must be complete.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.queries import ORACLES
from postgre_to_clickhouse_spark.queries.goldens import GOLDEN_QUERIES
from tests.conftest import SF_ORACLE


def test_all_goldens_installed():
    missing = [n for n in GOLDEN_QUERIES if n not in ORACLES]
    assert not missing, f"golden files absent for {missing} — run tests/golden/generate.py"


def test_ivf_fit_is_layout_independent(spark):
    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.ann import fit_ivf_centroids_deterministic

    e = catalog.load(spark, SF_ORACLE, "embeddings")
    base = fit_ivf_centroids_deterministic(e, n_lists=8, seed=42).collect()
    shuffled = fit_ivf_centroids_deterministic(
        e.repartition(17, F.col("vec_id")), n_lists=8, seed=42
    ).collect()
    one_part = fit_ivf_centroids_deterministic(e.coalesce(1), n_lists=8, seed=42).collect()
    norm = lambda rows: sorted((r["list_id"], tuple(r["centroid"])) for r in rows)  # noqa: E731
    assert norm(base) == norm(shuffled) == norm(one_part)


def test_zscore_is_layout_independent(spark):
    from postgre_to_clickhouse_spark.queries import QUERIES

    a = QUERIES["pandas_udf_zscore"](spark, SF_ORACLE)
    b = QUERIES["pandas_udf_zscore"](spark, SF_ORACLE)
    b = b.sparkSession.createDataFrame(
        b.repartition(13).collect(), schema=b.schema
    )  # force a different physical layout for the second run
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b  # bit-exact incl. float z-scores


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden_guard_selects_exactly_one_arm(name):
    """The SF-guard construction must reference the events view so the
    wrong-SF arm yields zero rows (loud failure, never a silent pass)."""
    sql = ORACLES.get(name)
    if sql is None:
        pytest.skip("golden not installed")
    assert sql.count("read_parquet") == 2
    assert "(SELECT count(*) FROM events) = 1000" in sql
    assert "(SELECT count(*) FROM events) = 10000" in sql
