"""Funnel & retention analytics — ClickHouse parameterized-aggregate
parity (Tier B endpoint surface).

The reference provisions ClickHouse 24.3 as its terminal analytics
endpoint (`/root/reference/docker-compose.yml:156-167`), whose
signature event-analytics functions are ``windowFunnel`` and
``retention``. Both re-expressed Spark-first here:

- :func:`window_funnel` — max number of consecutive funnel steps a
  user completes with every step inside ``window_us`` of the chain's
  FIRST step and timestamps strictly increasing (ClickHouse
  ``windowFunnel(window)(ts, cond1, cond2, …)`` semantics, default
  mode). Chains may start at ANY step-1 event, so the operator
  evaluates the greedy extension for every step-1 timestamp and takes
  the best — greedy-earliest extension is optimal for a fixed start,
  making this exact, not heuristic.
- :func:`retention` — per-user boolean chain ``r_i = cond_1 AND
  cond_i`` aggregated to cohort counts (ClickHouse
  ``retention(cond1, …)`` semantics).

Shape: ONE groupBy(user) collecting per-step timestamp arrays, then
pure JVM higher-order expressions (``filter``/``transform``/
``array_min``/``array_max``) — no Python, no self-joins, no windows.
Per-user arrays are bounded by events-per-user within the analysis
horizon (at 100 TB: pre-filter the scan to the funnel's time range and
event types — predicate pushdown keeps the collected arrays small; a
corpus-wide unbounded horizon is a query bug, not an operator limit).
Only min/max run over the arrays, so collect_list's nondeterministic
order cannot affect results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _step_list(type_col: str, ts_us: Column, step: str) -> Column:
    # collect_list drops nulls: one array of step timestamps per user
    return F.collect_list(F.when(F.col(type_col) == step, ts_us))


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, funnel_level): deepest step chain completed within the
    window. Level 0 = no step-1 event."""
    ts_us = F.unix_micros(F.col(ts_col))
    agg = events.groupBy(user_col).agg(
        *[_step_list(type_col, ts_us, s).alias(f"__s{i}") for i, s in enumerate(steps)]
    )

    def _in_window(prev: Column, t1: Column):
        # single-arg lambda via closure (pyspark counts default args as
        # lambda parameters, so defaults can't carry the captures)
        return lambda x: (x > prev) & (x <= t1 + F.lit(window_us))

    def level_from(t1: Column) -> Column:
        # greedy-earliest extension from a fixed chain start t1
        lvl = F.lit(1)
        prev = t1
        for i in range(1, len(steps)):
            nxt = F.array_min(F.filter(F.col(f"__s{i}"), _in_window(prev, t1)))
            lvl = F.when(nxt.isNull(), lvl).otherwise(F.lit(i + 1))
            # once a level is missed the chain stops: make later filters
            # empty by propagating NULL (NULL comparisons are false)
            prev = nxt
        return lvl

    levels = F.transform(F.col("__s0"), level_from)
    funnel = F.coalesce(F.array_max(levels), F.lit(0))
    return agg.select(F.col(user_col), funnel.cast("int").alias("funnel_level"))


def retention(
    events: DataFrame,
    conds: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """One row of cohort counts: ``n_cond1`` users with a cond-1 event,
    and for each later cond ``n_cond1_and_i`` (ClickHouse retention:
    r_i = cond_1 AND cond_i)."""
    per_user = events.groupBy(user_col).agg(
        *[
            F.max(F.when(F.col(type_col) == c, F.lit(1)).otherwise(F.lit(0))).alias(
                f"__r{i}"
            )
            for i, c in enumerate(conds)
        ]
    )
    out = [F.sum("__r0").cast("bigint").alias("n_cond1")]
    for i in range(1, len(conds)):
        out.append(
            F.sum(F.col("__r0") * F.col(f"__r{i}")).cast("bigint").alias(f"n_cond1_and_{i + 1}")
        )
    return per_user.agg(*out)
