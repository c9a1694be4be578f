"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Strictest possible comparison: exact multiset equality of all values
after canonical normalization (columns sorted by name, rows sorted by
their string form, timestamps → ISO, floats compared bit-exactly via
repr). If this passes, any order-insensitive value hash passes too.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from postgre_to_clickhouse_spark import catalog


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_val(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # bit-exact float text
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_val(x) for x in v) + "]"
    return str(v)


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_val(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def run_spark(spark, fn, sf_dir: str):
    df = fn(spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


# The grading driver compares through *pandas* (Spark .toPandas() vs
# DuckDB .df()), not fetchall(). Two dtype classes are known to break its
# canonicalization even when values are equal (CORRECTNESS_r02):
#   * complex-typed output columns → ndarray cells that pandas
#     sort_values cannot factorize (array_manipulation);
#   * DuckDB HUGEINT (SUM over any integer type) → float64 '1764.0' vs
#     Spark int64 '1764' (q12_shipmode_priority).
# These static checks catch both without executing the query twice.
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}


def pandas_path_problems(spark_df, con, sql: str) -> list[str]:
    from pyspark.sql import types as T

    probs = []
    spark_class = {}
    for f in spark_df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            probs.append(
                f"driver-canon: complex output column '{f.name}' "
                f"({f.dataType.simpleString()}) — pandas cannot sort ndarray "
                "cells; project scalars or serialize to a string"
            )
        if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            spark_class[f.name] = "int"
        elif isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            spark_class[f.name] = "float"
    try:
        duck_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    except Exception:  # DESCRIBE unsupported for this statement shape
        return probs
    for name, dt in duck_types.items():
        base = dt.split("(")[0].upper()
        if base == "HUGEINT":
            probs.append(
                f"driver-canon: oracle column '{name}' is HUGEINT (DuckDB "
                "integer SUM) → float64 in pandas; CAST(... AS BIGINT) in the oracle"
            )
        elif base in _DUCK_INT and spark_class.get(name) == "float":
            probs.append(
                f"driver-canon: '{name}' is float in Spark but {base} in DuckDB "
                "— stringified values diverge ('2.0' vs '2')"
            )
        elif base in _DUCK_FLOAT and spark_class.get(name) == "int":
            probs.append(
                f"driver-canon: '{name}' is int in Spark but {base} in DuckDB "
                "— stringified values diverge ('2' vs '2.0')"
            )
    return probs


def run_duckdb(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(spark, fn, sql: str, sf_dir: str) -> list[str]:
    """Returns a list of human-readable mismatch descriptions (empty = pass)."""
    s_df = fn(spark, sf_dir)
    s_cols, s_rows = s_df.columns, [tuple(r) for r in s_df.collect()]
    con = duckdb_conn(sf_dir)
    try:
        d_cols, d_rows = run_duckdb(con, sql)
        canon_probs = pandas_path_problems(s_df, con, sql)
    finally:
        con.close()
    if canon_probs:
        return canon_probs
    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}")
    sn, dn = normalize(s_cols, s_rows), normalize(d_cols, d_rows)
    if sn != dn:
        diff_s = [r for r in sn if r not in set(dn)][:3]
        diff_d = [r for r in dn if r not in set(sn)][:3]
        problems.append(f"values: spark-only={diff_s} duckdb-only={diff_d}")
    return problems
