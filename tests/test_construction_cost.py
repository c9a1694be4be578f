"""Driver-side construction-cost regression gate (r17, VERDICT r16 #7).

The r16 batch-5 audit found SECONDS of per-run driver cost hiding in
DataFrame CONSTRUCTION: wide-but-regular expression families built one
py4j Column call at a time (~0.3-1 ms per java round-trip) — simhash's
64 per-bit aggregates were ~700 calls (1.6-2.9 s per build), the
unrolled cosine ~4·dim calls per use, the random-projection fold one
list conversion per output dim. All were rewritten as SQL expression
STRINGS (one parser round each, bit-identical plans — proven by
byte-identical before/after explain files in plans/r16/).

This gate keeps the pattern from silently returning: it counts the
py4j JAVA ROUND-TRIPS each known-wide build issues (deterministic —
machine load cannot flake it) and bounds them well below the
one-call-per-term pattern, plus a very generous wall-clock ceiling as
a safety net for pathologies the call count cannot see (e.g. a huge
literal converted element-by-element inside ONE call).
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

# Generous ceilings. Observed counts on Spark 4.1 are recorded next to
# each bound; the regression this guards (one py4j call per expression
# TERM: ~700 calls for simhash, ~4·dim for the cosine) sits 3-10x
# above every bound, while normal drift (a few extra calls per build
# from a Spark upgrade) stays far inside it.
WALL_CEILING_S = 5.0  # pre-fix builds measured 1.6-2.9 s; normal ~0.05


@contextmanager
def _java_calls():
    """Count py4j java-member round-trips issued inside the block."""
    import py4j.java_gateway as _jg

    box = {"n": 0}
    orig = _jg.JavaMember.__call__

    def counted(self, *a, **k):
        box["n"] += 1
        return orig(self, *a, **k)

    _jg.JavaMember.__call__ = counted
    try:
        yield box
    finally:
        _jg.JavaMember.__call__ = orig


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _gate(build, max_calls: int):
    t0 = time.perf_counter()
    with _java_calls() as calls:
        df = build()
        df.schema  # force analysis — part of every real build
    wall = time.perf_counter() - t0
    assert calls["n"] <= max_calls, (
        f"driver construction issued {calls['n']} py4j calls "
        f"(bound {max_calls}) — the one-call-per-term pattern is back; "
        "build wide expression families as SQL expr strings "
        "(see OPTIMIZATION_r16.md batch 5)"
    )
    assert wall <= WALL_CEILING_S, (
        f"driver construction took {wall:.2f}s (bound {WALL_CEILING_S}s)"
    )


@pytest.mark.usefixtures("spark")
class TestConstructionCost:
    def test_simhash_build(self, spark):
        from postgre_to_clickhouse_spark.operators.dedup import simhash

        _docs(spark)  # warm the reader outside the counter
        _gate(lambda: simhash(_docs(spark)), max_calls=300)

    def test_minhash_build(self, spark):
        from postgre_to_clickhouse_spark.operators.dedup import (
            minhash_signatures,
        )

        _gate(lambda: minhash_signatures(_docs(spark)), max_calls=300)

    def test_random_projection_build(self, spark):
        from postgre_to_clickhouse_spark.operators.projection import (
            project_expr,
        )

        _gate(
            lambda: _embs(spark).select(
                "vec_id",
                project_expr("embedding", 16, 64).alias("proj"),
            ),
            max_calls=150,
        )

    def test_unrolled_cosine_build(self, spark):
        from postgre_to_clickhouse_spark.operators.similarity import (
            _dot_unrolled,
            _norm_unrolled,
        )

        def build():
            e = _embs(spark).select(
                F.col("embedding").alias("a"), F.col("embedding").alias("b")
            )
            return e.select(
                (
                    _dot_unrolled("a", "b", 64)
                    / (_norm_unrolled("a", 64) * _norm_unrolled("b", 64))
                ).alias("cos")
            )

        _gate(build, max_calls=200)
