#!/usr/bin/env python
"""r16 optimization probe: per-JOB wall-time attribution for a named
registered query at $SPARK_GRAFT_SF_DIR (default sf0.1).

The lifecycle/iterative queries (manifest family, suffix doubling, MV
sinks) spend their time across MANY small Spark jobs, so a single
.explain() cannot attribute their wall — this probe runs the query
with the UI enabled and reads /api/v1 jobs afterwards, printing one
line per job (duration, #tasks, description/callsite) plus the
repeated-run warm timing the bench would record.

Usage: python tools/opt_probe_r16.py q1 [q2 ...] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    from postgre_to_clickhouse_spark.queries import QUERIES
    from postgre_to_clickhouse_spark.session import configure

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = configure(
        SparkSession.builder.appName("p2c-opt-probe")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
        .getOrCreate()
    )
    spark.range(1).count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    par = spark.sparkContext.defaultParallelism

    def _ident(batches):
        yield from batches

    spark.range(par).repartition(par).mapInPandas(_ident, schema="id long").count()

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    def jobs_after(min_job_id: int) -> list[dict]:
        with urllib.request.urlopen(f"{base}/jobs?status=succeeded") as r:
            js = json.load(r)
        with urllib.request.urlopen(f"{base}/jobs?status=failed") as r:
            js += json.load(r)
        return sorted(
            (j for j in js if j["jobId"] > min_job_id), key=lambda j: j["jobId"]
        )

    def last_job_id() -> int:
        with urllib.request.urlopen(f"{base}/jobs") as r:
            js = json.load(r)
        return max((j["jobId"] for j in js), default=-1)

    from bench import FORCE_EVAL  # same timed action as the bench

    for name in names:
        fn = QUERIES[name]
        for i in range(runs):
            mark = last_job_id()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_built = time.perf_counter()
            if name in FORCE_EVAL:
                df = df.filter(FORCE_EVAL[name])
            n = df.count()
            t1 = time.perf_counter()
            label = f"{name} run{i}"
            print(
                f"== {label}: total {t1 - t0:.3f}s "
                f"(build {t_built - t0:.3f}s, action {t1 - t_built:.3f}s, rows {n})"
            )
            if i == runs - 1:  # detail only for the warm run
                total_job = 0.0
                for j in jobs_after(mark):
                    dur = j.get("numTasks"), j.get("jobId")
                    from datetime import datetime

                    st = datetime.strptime(
                        j["submissionTime"], "%Y-%m-%dT%H:%M:%S.%fGMT"
                    )
                    ct = datetime.strptime(
                        j["completionTime"], "%Y-%m-%dT%H:%M:%S.%fGMT"
                    )
                    d = (ct - st).total_seconds()
                    total_job += d
                    desc = (j.get("description") or j.get("name") or "")[:110]
                    print(
                        f"   job {j['jobId']:>4} {d:7.3f}s tasks={j['numTasks']:>4} {desc}"
                    )
                print(f"   sum(job wall) = {total_job:.3f}s (gaps = driver/planning)")
    spark.stop()


if __name__ == "__main__":
    main()
