#!/usr/bin/env python
"""Generate the committed golden parquet files for the deterministic
rows-only query family (see ``queries/goldens.py``).

Run from the repo root after any INTENTIONAL change to these operators:

    python tests/golden/generate.py

Each golden is the exact Spark result at that SF, written as a single
parquet file. Regenerating on an unchanged repo must be a no-op
(byte-identical results) — the queries are seeded and layout-independent
by construction; ``tests/test_goldens.py`` asserts that reproducibility.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SFS = {"sf0_001": "/root/testdata/sf0.001", "sf0_01": "/root/testdata/sf0.01"}


def main() -> None:
    from postgre_to_clickhouse_spark.queries import QUERIES
    from postgre_to_clickhouse_spark.queries.goldens import GOLDEN_DIR, GOLDEN_QUERIES
    from postgre_to_clickhouse_spark.session import get_spark

    spark = get_spark("golden-gen")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    import duckdb

    for name in GOLDEN_QUERIES:
        for sf_tag, sf_dir in SFS.items():
            df = QUERIES[name](spark, sf_dir)
            dest = os.path.join(GOLDEN_DIR, f"{name}.{sf_tag}.parquet")
            if os.path.exists(dest):
                # value-identical regeneration is a no-op: parquet BYTES
                # vary with physical row order/chunking, values must not
                fresh = sorted(map(str, (tuple(r) for r in df.collect())))
                con = duckdb.connect()
                old_rows = con.execute(f"SELECT * FROM '{dest}'").fetchall()
                con.close()
                if fresh == sorted(map(str, old_rows)):
                    print(f"unchanged {dest}")
                    continue
            tmp = tempfile.mkdtemp(prefix=f"golden_{name}_")
            try:
                df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "out"))
                (part,) = glob.glob(os.path.join(tmp, "out", "part-*.parquet"))
                shutil.copyfile(part, dest)
                print(f"wrote {dest} ({df.count()} rows)")
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
