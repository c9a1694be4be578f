"""r9 session-2 scale probe: 5x/20x exponent rows for the operators
added this session — manifest mutations (update_where /
apply_ttl_rollup), aggregate-projection reads (read_agg), LTTB
downsampling, and the Mann-Whitney distributed prefix-sum rank.

Methodology matches tools/scale_smoke.py / scale_probe_r9.py: amplify
sf0.1 events N x with disjoint event/user ids (timestamps unchanged, so
time-sliced mutations keep their selectivity), wall-clock the OPERATOR
only (table builds excluded), exponent = log(tB/tA)/log(B/A), after a
1x warm-up pass.

Usage: python tools/scale_probe_r9c.py [AMPLIFY ...]  (default: 5 20)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [5, 20]
    ns = [1] + ns
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from postgre_to_clickhouse_spark.operators.lttb import lttb_downsample
    from postgre_to_clickhouse_spark.queries.registry import QUERIES
    from postgre_to_clickhouse_spark.session import get_spark
    from postgre_to_clickhouse_spark.sinks.manifest import ManifestTable

    spark = get_spark("scale-probe-r9c")
    spark.range(1).count()
    from postgre_to_clickhouse_spark import catalog

    ev0 = catalog.load(spark, src, "events")
    e_n = ev0.count()
    u_n = ev0.agg(F.max("user_id")).collect()[0][0] + 1
    out: dict[str, dict] = {}

    for n in ns:
        copies = spark.range(n).withColumnRenamed("id", "copy")
        ev = ev0.crossJoin(F.broadcast(copies)).select(
            (F.col("event_id") + F.col("copy") * e_n).alias("kafka_offset"),
            (F.col("user_id") + F.col("copy") * u_n).alias("user_id"),
            "event_type",
            "value",
            F.unix_micros("ts").alias("updated_at"),
        )
        lo, hi = ev.agg(F.min("updated_at"), F.max("updated_at")).collect()[0]
        bounds = [lo + ((hi - lo) * k) // 4 for k in range(5)]
        rec: dict = {"rows": e_n * n}

        def build(path, **kw):
            t = ManifestTable(path, key_col="user_id", n_buckets=8, **kw)
            ab = t.append_parts(
                sort_key=("user_id", "updated_at"), arrival=("kafka_offset",)
            )
            for b in range(4):
                up = F.col("updated_at")
                cond = (up >= bounds[b]) & (
                    (up < bounds[b + 1]) if b < 3 else (up <= bounds[4])
                )
                ab(ev.filter(cond), b)
            return t

        root = tempfile.mkdtemp(prefix="p2c_probe_r9c_")
        try:
            # -- update_where: first-quartile doubling, zone-map pruned
            t1 = build(os.path.join(root, "u"), stats_cols=("updated_at",))
            t0 = time.time()
            t1.update_where(
                spark,
                {"value": "value * 2"},
                f"updated_at < {bounds[1]}",
                where=[("updated_at", None, bounds[1] - 1)],
            )
            rec["update_where_s"] = round(time.time() - t0, 2)

            # -- apply_ttl_rollup: first half collapsed per (user, type)
            t2 = build(os.path.join(root, "r"), stats_cols=("updated_at",))
            t0 = time.time()
            t2.apply_ttl_rollup(
                spark,
                "updated_at",
                bounds[2],
                group_by=("user_id", "event_type"),
                set_exprs={
                    "value": "cast(sum(cast(value as decimal(18,2))) as double)"
                },
            )
            rec["ttl_rollup_s"] = round(time.time() - t0, 2)

            # -- read_agg over an aggregate projection (build excluded)
            t3 = build(os.path.join(root, "a"))
            t3.add_agg_projection(
                spark,
                "by_user_type",
                ("user_id", "event_type"),
                {"n": ("count", "*"), "v": ("sum", "value")},
            )
            t0 = time.time()
            t3.read_agg(spark, "by_user_type", fallback=False).count()
            rec["read_agg_s"] = round(time.time() - t0, 2)
        finally:
            shutil.rmtree(root, ignore_errors=True)

        # -- LTTB: 5 fixed series, N x points each (sequential per series)
        pts = ev.select(
            "event_type",
            F.col("updated_at").alias("ts_us"),
            "value",
            F.col("kafka_offset").alias("event_id"),
        )
        t0 = time.time()
        lttb_downsample(
            pts, "event_type", "ts_us", "value", "event_id", n_out=20
        ).count()
        rec["lttb_s"] = round(time.time() - t0, 2)

        out[f"{n}x"] = rec
        print(json.dumps({f"{n}x": rec}), flush=True)

    # -- mann_whitney on the raw (unamplified path) table via the query
    # registry, amplified by re-reading: value domain saturates, so the
    # rank table is ~constant and the scan dominates — probe it on the
    # largest N only via a temp parquet.
    import math

    for a, b in [(ns[1], ns[-1])]:
        for k in ("update_where_s", "ttl_rollup_s", "read_agg_s", "lttb_s"):
            ta, tb = out[f"{a}x"][k], out[f"{b}x"][k]
            if ta and tb:
                print(
                    json.dumps(
                        {
                            "op": k,
                            f"{a}x_s": ta,
                            f"{b}x_s": tb,
                            "exponent": round(
                                math.log(tb / ta) / math.log(b / a), 2
                            ),
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
