"""Skew mitigation (SURVEY.md §7.4 scale posture).

AQE's skew-join splitting handles join-side skew automatically; this
module covers the two cases AQE doesn't:

- :func:`salted_agg` — two-phase aggregation for heavily skewed GROUP BY
  keys: salt the key into ``n_salts`` subkeys (partial aggregate), then
  merge partials per real key. Works for any algebraic aggregate
  (sum/count/min/max expressed as merge of partials). At 100 TB a single
  hot key (e.g. one bot user with 10% of all events) otherwise pins one
  reducer.
- :func:`salted_broadcast_left` — explode a small skewed build side ×
  salt range so a salted probe side joins without a hot partition (for
  when the big side's hot keys are known or sampled).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 groups by (keys + salt) — hot keys
    spread over ``n_salts`` reducers; phase 2 merges partials per key
    (sum/count merge by sum; min/max by min/max). Results identical to
    a direct groupBy (exactness preserved for decimal inputs).
    """
    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PARTIAL = {"sum": F.sum, "count": lambda c: F.count(c), "min": F.min, "max": F.max}
    for fn in {fn for _, fn in aggs.values()}:
        if fn not in _MERGE:
            raise ValueError(f"salted_agg supports {sorted(_MERGE)}; got {fn!r}")

    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_PARTIAL[fn](F.col(src)).alias(f"__p_{out}") for out, (src, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](F.col(f"__p_{out}")).alias(out) for out, (src, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate ``small`` across the salt range,
    salt ``big`` per row, join on (keys + salt).

    For the case AQE's skew split can't fix and broadcast can't reach:
    ``small`` too large to broadcast AND hot keys in ``big``. Each hot
    key's rows spread over ``n_salts`` reducers instead of pinning one.
    Cost: ``small`` is shuffled ``n_salts``× — pick the smallest salt
    range that dissolves the hot partition. Only inner/left joins: the
    replicated build side makes right/full multiplicities wrong.
    Results are identical to the unsalted join (each big row meets each
    matching small row exactly once — in exactly one salt bucket).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left; got {how!r}")
    exploded = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int")
    )
    return salted.join(exploded, [*on, "__salt"], how).drop("__salt")


def salted_broadcast_left(
    small: DataFrame,
    n_salts: int,
    key: str,
) -> tuple[DataFrame, Column]:
    """Replicate the small side across the salt range. Returns the
    exploded DataFrame and the salt column expression the big/probe side
    must add (``big.withColumn("__salt", salt_col)``) before joining on
    (key, __salt)."""
    exploded = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    probe_salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    return exploded, probe_salt
