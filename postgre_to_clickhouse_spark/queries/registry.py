"""Query registry + cross-engine determinism helpers.

The driver runs each registered query on Spark AND its oracle SQL on
DuckDB, then compares row count + schema + an order-insensitive value
hash. Floating point therefore has to be *bitwise identical* across
engines, not merely close. Rules used throughout the battery:

- Sums of doubles are order-dependent → cast each addend to an exact
  DECIMAL first (``dsum``), sum exactly, cast the exact result back to
  double. Ties in the decimal rounding of a double cannot occur (no
  double equals an odd multiple of 10^-k/2 — that requires a factor-5
  denominator, impossible for binary fractions), so the cast is
  deterministic and engine-independent.
- Averages = exact decimal sum cast to double, divided by the count in
  double arithmetic (identical operands → identical IEEE result).
- Comparisons/min/max/first-value on doubles are exact → fine as-is.
- Transcendentals (ln/exp/pow) are not correctly-rounded and may differ
  by 1 ulp between libm and the JVM → round results (~1e-10 flip risk)
  or avoid. ``sqrt`` and arithmetic are IEEE-exact → fine.
- Timestamps: everything runs in UTC (session + system + DuckDB).
- Every computed column is aliased identically in Spark and SQL (driver
  sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame query, with optional DuckDB
    oracle SQL (omit only for genuinely non-SQL-expressible operators —
    the driver then records a weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent, engine-exact sum of a double column.

    SQL mirror: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`` — the
    oracle side uses DECIMAL(30,s); per-value rounding and the exact sum
    are identical at any precision wide enough for the values, so only
    the Spark-side width matters for speed: precision ≤ 18 keeps Spark
    on the Long-backed compact Decimal (measured ~1.5× faster than the
    BigDecimal path at sf0.1). Overflow headroom: the sum type widens to
    DECIMAL(28,s) ≈ 1e26 — comfortable for 100 TB fact tables whose
    per-row values fit DECIMAL(18,s).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact-sum-based average. SQL mirror:
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(*)``."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale, precision) / F.count(F.lit(1))
