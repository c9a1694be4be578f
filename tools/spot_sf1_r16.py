#!/usr/bin/env python
"""r16 sf0.1 -> sf1.0 spot-run (VERDICT r15 #6 + the two new r16
shapes): exponent rows for `kn_bigram_nll` (the bigram-type model
build — ordered in writing), `quality_classifier_eval` (the held-out
variant), and the round's new compounds `kn_trigram_nll` (modified-KN
trigram chain) and `ccnet_pipeline_documents` (the end-to-end CCNet
composite). The r13..r15 protocol verbatim — tools/gen_sf1.py corpus
at /tmp/sf1.0, bench-style warm-up, cold + 2 warm per query per SF,
exponent = log10(t_sf1.0 / t_sf0.1) over warm minima. count() forces
the real plan for all four: the per-doc outputs need their joins, and
the 1-row eval needs its aggregate."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgre_to_clickhouse_spark.queries import QUERIES
from postgre_to_clickhouse_spark.session import get_spark

NAMES = [
    "kn_bigram_nll",
    "quality_classifier_eval",
    "kn_trigram_nll",
    "ccnet_pipeline_documents",
]
SFS = [("0.1", "/root/testdata/sf0.1"), ("1.0", "/tmp/sf1.0")]


def main() -> None:
    spark = get_spark("spot-r16")
    QUERIES["q1_pricing_summary"](spark, SFS[0][1]).count()  # warm-up
    res = {}
    for name in NAMES:
        for sf, d in SFS:
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                n = QUERIES[name](spark, d).count()
                times.append(round(time.perf_counter() - t0, 3))
            res[(name, sf)] = (times, n)
            print(name, sf, "cold:", times[0], "warm:", times[1:],
                  "rows:", n, flush=True)
    for name in NAMES:
        t01 = min(res[(name, "0.1")][0][1:])
        t10 = min(res[(name, "1.0")][0][1:])
        exp = math.log10(t10 / t01)
        print(f"{name}: {t01} -> {t10}  ratio {t10/t01:.2f}  "
              f"exponent {exp:.2f}  rows {res[(name, '0.1')][1]} -> "
              f"{res[(name, '1.0')][1]}")


if __name__ == "__main__":
    main()
