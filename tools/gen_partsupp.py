"""Synthesize the deterministic `partsupp` fixture the driver's test
data lacks (TESTDATA.md: no partsupp at any SF), so the four
partsupp-dependent TPC-H queries (Q2/Q11/Q16/Q20) can run SPEC-TRUE
instead of lineitem-adapted (VERDICT r5 #6).

Shape follows the TPC-H spec (§4.2.3): |partsupp| = 4 x |part|, and
for part p, the i-th supplier is

    ps_suppkey = ((p + i*(S/4 + (p-1)/S)) mod S) + 1      (i = 0..3)

which spreads each part's four suppliers across the supplier keyspace
exactly as dbgen does. ps_availqty / ps_supplycost are seeded integer
hashes (spec ranges [1,9999] and [1.00,1000.00]) — pure functions of
(p, i), so the fixture is bit-identical on every regeneration:

    python tools/gen_partsupp.py

writes tests/fixtures/partsupp.sf{0_001,0_01,0_1}.parquet (committed;
regeneration is only needed if the driver's part/supplier fixtures
change). Both engines read the SAME files: Spark via
`catalog.load_partsupp`, DuckDB via `read_parquet` with an SF guard.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")

SFS = {"sf0_001": "/root/testdata/sf0.001", "sf0_01": "/root/testdata/sf0.01", "sf0_1": "/root/testdata/sf0.1"}


def gen_one(sf_dir: str) -> pa.Table:
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"])
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey"])
    pkeys = sorted(part.column("p_partkey").to_pylist())
    s = len(supp)
    rows_pk, rows_sk, rows_aq, rows_sc = [], [], [], []
    for p in pkeys:
        # dbgen stride.  At tiny S the stride unit can hit 0 or S/2
        # (mod S), collapsing the four suppliers onto 1-2 keys and
        # violating partsupp's (ps_partkey, ps_suppkey) PK plus the
        # 4-distinct-suppliers-per-part property Q2/Q11/Q16/Q20 rest
        # on; fall back to a plain consecutive spread in that case.
        sks = [(p + i * (s // 4 + (p - 1) // s)) % s + 1 for i in range(4)]
        if len(set(sks)) != 4:
            sks = [(p - 1 + i) % s + 1 for i in range(4)]
        for i in range(4):
            rows_pk.append(p)
            rows_sk.append(sks[i])
            rows_aq.append((p * 7919 + i * 104729) % 9999 + 1)
            rows_sc.append(round(((p * 6101 + i * 9949) % 99900) / 100.0 + 1.0, 2))
    pairs = set(zip(rows_pk, rows_sk))
    if len(pairs) != len(rows_pk):
        raise AssertionError(
            f"partsupp PK violated: {len(rows_pk) - len(pairs)} duplicate "
            "(ps_partkey, ps_suppkey) pairs"
        )
    return pa.table(
        {
            "ps_partkey": pa.array(rows_pk, pa.int64()),
            "ps_suppkey": pa.array(rows_sk, pa.int64()),
            "ps_availqty": pa.array(rows_aq, pa.int32()),
            "ps_supplycost": pa.array(rows_sc, pa.float64()),
        }
    )


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for tag, sf_dir in SFS.items():
        t = gen_one(sf_dir)
        out = os.path.join(OUT_DIR, f"partsupp.{tag}.parquet")
        pq.write_table(t, out, compression="zstd")
        print(out, t.num_rows, "rows")


if __name__ == "__main__":
    main()
