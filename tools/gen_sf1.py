#!/usr/bin/env python
"""One-time sf1.0 scaling corpus for the r13 spot-run (VERDICT r12 #3).

No network in the sandbox (DuckDB's tpch extension cannot download),
so sf1.0 is a DETERMINISTIC 10x replication of the driver's sf0.1
tables with key-shifting — each copy i shifts every key family by
i * 10^9, so copy i of orders joins copy i of customer etc.: join
fan-out per key is preserved and data volume is exactly 10x.
Dimensions (region/nation) stay single-copy like real TPC-H SFs.

documents is the subtle one: naive replication would give every doc
9 exact twins and blow the near-dup pair count up QUADRATICALLY —
the wrong workload for measuring dedup scaling. Instead copy i > 0
gets (a) its source suffixed (src1 -> src1z3): blocking keys stay
constant-sized and block count scales 10x, and (b) every word
suffixed with the copy tag (w -> wz3) — an injective per-copy word
renaming, so Jaccard/edit-distance WITHIN a copy is preserved
exactly (each copy carries the generator's original near-dup graph)
while cross-copy similarity collapses to ~0. Near-dup pairs per doc
stay constant; total pairs scale linearly, like a real 10x corpus.

Output: /tmp/sf1.0/<table>.parquet (directories; catalog.load reads
them like the driver's single files). Not used by any correctness
query — measurement only.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF1_DIR", "/tmp/sf1.0")
COPIES = 10
M = 10 ** 9  # key shift per copy — far above any sf0.1 key

SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    spark = get_spark("gen-sf1")
    os.makedirs(DST, exist_ok=True)
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{DST}/{t}.parquet")
        print(t, "dim copied")
    copies = spark.range(COPIES).toDF("__i")
    for t, keys in SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        out = df.crossJoin(copies)
        for k in keys:
            out = out.withColumn(k, F.col(k) + F.col("__i") * M)
        out.drop("__i").repartition(32).write.mode(
            "overwrite").parquet(f"{DST}/{t}.parquet")
        print(t, spark.read.parquet(f"{DST}/{t}.parquet").count())
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    out = d.crossJoin(copies)
    tag = F.concat(F.lit("z"), F.col("__i").cast("string"))
    out = (
        out.withColumn("doc_id", F.col("doc_id") + F.col("__i") * M)
        .withColumn(
            "source",
            F.when(F.col("__i") == 0, F.col("source"))
            .otherwise(F.concat(F.col("source"), tag)),
        )
        .withColumn(
            "text",
            F.when(F.col("__i") == 0, F.col("text")).otherwise(
                F.expr(
                    "regexp_replace(text, '([A-Za-z0-9]+)', "
                    "concat('$1z', cast(__i as string)))"
                )
            ),
        )
        .withColumn("n_chars", F.length("text"))
    )
    out.drop("__i").repartition(32).write.mode(
        "overwrite").parquet(f"{DST}/documents.parquet")
    print("documents", spark.read.parquet(f"{DST}/documents.parquet").count())


if __name__ == "__main__":
    main()
