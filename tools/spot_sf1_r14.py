#!/usr/bin/env python
"""r14 sf0.1 -> sf1.0 spot-run for the suffix-array shapes (the r13
protocol, tools/gen_sf1.py corpus): bench-style warm-up, cold + 2 warm
per query per SF, exponent = log10(t_sf1.0 / t_sf0.1) over warm
minima. FORCE_EVAL-style no-op filters keep count() from pruning the
cardinality-neutral final window (the r13 lesson)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgre_to_clickhouse_spark.queries import QUERIES
from postgre_to_clickhouse_spark.session import get_spark

FORCE = {"suffix_array_rank": "sa_rank >= 1",
         "suffix_lcp_rank": "sa_rank >= 1 AND lcp >= 0"}
NAMES = ["exact_substr_spans", "suffix_array_rank", "suffix_lcp_rank"]
SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/sf1.0")]


def main() -> None:
    spark = get_spark("spot-r14")
    QUERIES["q1_pricing_summary"](spark, SFS[0][1]).count()  # warm-up
    for name in NAMES:
        for sf, d in SFS:
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, d)
                if name in FORCE:
                    df = df.filter(FORCE[name])
                n = df.count()
                times.append(round(time.perf_counter() - t0, 2))
            print(f"{name} sf{sf}: rows={n} cold={times[0]} "
                  f"warm={times[1:]} warm_min={min(times[1:])}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
