#!/usr/bin/env python
"""r16 session-2 sf0.1 -> sf1.0 spot-run: exponent row for
`zipf_law_fit` (the round's second new data-plane shape — vocab
groupBy + TakeOrdered + constant window/fold). Protocol identical to
tools/spot_sf1_r16.py (bench-style warm-up, cold + 2 warm per SF,
exponent over warm minima). collect() (1 row) forces the full moment
arithmetic — count() could let Catalyst prune the OLS columns."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgre_to_clickhouse_spark.queries import QUERIES
from postgre_to_clickhouse_spark.session import get_spark

SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/sf1.0")]


def main() -> None:
    spark = get_spark("spot-r16b")
    QUERIES["q1_pricing_summary"](spark, SFS[0][1]).count()  # warm-up
    res = {}
    for sf, d in SFS:
        times, row = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            row = QUERIES["zipf_law_fit"](spark, d).collect()[0]
            times.append(round(time.perf_counter() - t0, 3))
        res[sf] = (times, row)
        print("zipf_law_fit", sf, "cold:", times[0], "warm:", times[1:],
              "row:", row.asDict(), flush=True)
    t01 = min(res["0.1"][0][1:])
    t10 = min(res["1.0"][0][1:])
    print(f"zipf_law_fit: {t01} -> {t10}  ratio {t10/t01:.2f}  "
          f"exponent {math.log10(t10/t01):.2f}")


if __name__ == "__main__":
    main()
