#!/usr/bin/env python
"""r15 session-2 spot: the round's new heavy bench family
(quality_classifier_score) across the sf0.1 -> sf1.0 decade — same
protocol as tools/spot_sf1_r15.py (gen_sf1 corpus, warm-up, cold + 2
warm, exponent over warm minima, FORCE_EVAL no-op filter)."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgre_to_clickhouse_spark.queries import QUERIES
from postgre_to_clickhouse_spark.session import get_spark

FORCE = {"quality_classifier_score":
         "qclf_score_q IS NOT NULL OR qclf_keep >= 0"}
SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/sf1.0")]


def main() -> None:
    spark = get_spark("spot-r15b")
    QUERIES["q1_pricing_summary"](spark, SFS[0][1]).count()  # warm-up
    res = {}
    for name, force in FORCE.items():
        for sf, d in SFS:
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, d).filter(force)
                n = df.count()
                times.append(round(time.perf_counter() - t0, 3))
            res[(name, sf)] = (times, n)
            print(name, sf, "cold:", times[0], "warm:", times[1:],
                  "rows:", n, flush=True)
        t01 = min(res[(name, "0.1")][0][1:])
        t10 = min(res[(name, "1.0")][0][1:])
        print(f"{name}: {t01} -> {t10}  ratio {t10/t01:.2f}  "
              f"exponent {math.log10(t10/t01):.2f}  rows "
              f"{res[(name, '0.1')][1]} -> {res[(name, '1.0')][1]}")


if __name__ == "__main__":
    main()
