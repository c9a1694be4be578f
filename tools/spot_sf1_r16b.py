#!/usr/bin/env python
"""r16 session-2 sf0.1 -> sf1.0 spot-run: exponent rows for
`zipf_law_fit` and `heaps_law_fit` (the session's two new data-plane
shapes — vocab groupBy + TakeOrdered/constant window + fold).
Protocol identical to tools/spot_sf1_r16.py (bench-style warm-up,
cold + 2 warm per SF, exponent over warm minima). collect() (1 row)
forces the full moment arithmetic — count() could let Catalyst prune
the OLS columns."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgre_to_clickhouse_spark.queries import QUERIES
from postgre_to_clickhouse_spark.session import get_spark

SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/sf1.0")]
NAMES = ["zipf_law_fit", "heaps_law_fit"]


def main() -> None:
    spark = get_spark("spot-r16b")
    QUERIES["q1_pricing_summary"](spark, SFS[0][1]).count()  # warm-up
    res = {}
    for name in NAMES:
        for sf, d in SFS:
            times, row = [], None
            for _ in range(3):
                t0 = time.perf_counter()
                row = QUERIES[name](spark, d).collect()[0]
                times.append(round(time.perf_counter() - t0, 3))
            res[(name, sf)] = (times, row)
            print(name, sf, "cold:", times[0], "warm:", times[1:],
                  "row:", row.asDict(), flush=True)
    for name in NAMES:
        t01 = min(res[(name, "0.1")][0][1:])
        t10 = min(res[(name, "1.0")][0][1:])
        print(f"{name}: {t01} -> {t10}  ratio {t10/t01:.2f}  "
              f"exponent {math.log10(t10/t01):.2f}")


if __name__ == "__main__":
    main()
