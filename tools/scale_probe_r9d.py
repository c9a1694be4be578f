"""r9 session-3 scale probe: 5x/20x exponent row for rankCorr
(Spearman) — the doubled distributed prefix-sum rank plus the
Pearson-on-ranks moment pass.

Methodology matches tools/scale_probe_r9c.py: amplify sf0.1 events
N x with disjoint user ids AND per-copy value perturbation (so the
DISTINCT-value tables the rank core reduces to grow linearly too —
amplifying only rows would leave the rank stage trivially constant),
wall-clock the operator only, exponent = log(tB/tA)/log(B/A) after a
1x warm-up.

Usage: python tools/scale_probe_r9d.py [AMPLIFY ...]  (default: 5 20)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [5, 20]
    ns = [1] + ns
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.ranks import tie_averaged_ranks
    from postgre_to_clickhouse_spark.queries.registry import dsum
    from postgre_to_clickhouse_spark.session import get_spark

    spark = get_spark("scale-probe-r9d")
    spark.range(1).count()
    ev0 = catalog.load(spark, src, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    e_n = ev0.count()
    u_n = ev0.agg(F.max("user_id")).collect()[0][0] + 1
    out: dict = {}

    def rank_corr(ev):
        rx = tie_averaged_ranks(
            ev.groupBy("x").agg(F.count(F.lit(1)).alias("c")), "x", "c"
        ).select("x", F.col("avg_rank").alias("rx"))
        ry = tie_averaged_ranks(
            ev.groupBy("y").agg(F.count(F.lit(1)).alias("c")), "y", "c"
        ).select("y", F.col("avg_rank").alias("ry"))
        rows = ev.join(F.broadcast(rx), "x").join(F.broadcast(ry), "y")
        return rows.agg(
            F.count(F.lit(1)).alias("n"),
            dsum("rx", scale=2, precision=30).alias("sx"),
            dsum(F.col("rx") * F.col("ry"), scale=2, precision=30).alias("sxy"),
        ).collect()

    for n in ns:
        copies = spark.range(n).withColumnRenamed("id", "copy")
        # per-copy value/time perturbation keeps distinct-value growth
        # linear in the amplification (the honest regime for a rank op)
        ev = (
            ev0.crossJoin(F.broadcast(copies))
            .select(
                (F.col("user_id") + F.col("copy") * u_n).alias("user_id"),
                (F.col("value") + F.col("copy") * 1e-7).alias("x"),
                (F.unix_micros("ts") + F.col("copy")).alias("y"),
            )
            .localCheckpoint(eager=True)  # exclude amplification cost
        )
        rank_corr(ev)  # warm-up
        t0 = time.monotonic()
        rank_corr(ev)
        dt = time.monotonic() - t0
        out[n] = {"rows": e_n * n, "sec": round(dt, 3)}
        ev.unpersist()

    base = out[ns[0]]["sec"]
    for n in ns[1:]:
        out[n]["exponent"] = round(
            math.log(out[n]["sec"] / base) / math.log(n), 2
        )
    print(json.dumps({"rank_corr_spearman": out}))


if __name__ == "__main__":
    main()
