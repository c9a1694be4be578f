#!/usr/bin/env python
"""r15 sf0.1 -> sf1.0 spot-run for the WINDOW shapes (VERDICT r13 #3 /
r14 #4 — the two rows still missing from SCALE.md's exponent table):
the r13/r14 protocol verbatim — tools/gen_sf1.py corpus, bench-style
warm-up, cold + 2 warm per query per SF, exponent =
log10(t_sf1.0 / t_sf0.1) over warm minima, FORCE_EVAL no-op filters
so count() cannot prune the cardinality-neutral window projections."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgre_to_clickhouse_spark.queries import QUERIES
from postgre_to_clickhouse_spark.session import get_spark

FORCE = {
    "window_user_running_totals":
        "running_sum IS NOT NULL OR prev_value IS NOT NULL",
    "range_interval_window_events": "sum_1h IS NOT NULL OR n_1h >= 0",
}
NAMES = list(FORCE)
SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/sf1.0")]


def main() -> None:
    spark = get_spark("spot-r15")
    QUERIES["q1_pricing_summary"](spark, SFS[0][1]).count()  # warm-up
    res = {}
    for name in NAMES:
        for sf, d in SFS:
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, d)
                df = df.filter(FORCE[name])
                n = df.count()
                times.append(round(time.perf_counter() - t0, 3))
            res[(name, sf)] = (times, n)
            print(name, sf, "cold:", times[0], "warm:", times[1:],
                  "rows:", n, flush=True)
    import math

    for name in NAMES:
        t01 = min(res[(name, "0.1")][0][1:])
        t10 = min(res[(name, "1.0")][0][1:])
        exp = math.log10(t10 / t01)
        print(f"{name}: {t01} -> {t10}  ratio {t10/t01:.2f}  "
              f"exponent {exp:.2f}  rows {res[(name, '0.1')][1]} -> "
              f"{res[(name, '1.0')][1]}")


if __name__ == "__main__":
    main()
