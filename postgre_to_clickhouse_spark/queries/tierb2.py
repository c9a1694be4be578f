"""Tier B extensions: as-of join (B6), banded range join (B5 scale
path), percentiles (B8), SQL-API queries (A22 surface: grouping sets,
EXISTS/scalar subqueries), and range-frame windows (B10)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.operators.asof import asof_join
from postgre_to_clickhouse_spark.operators.range_join import band_join
from postgre_to_clickhouse_spark.queries.registry import dsum, register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


@register(
    "asof_events_last_order",
    oracle="""
    WITH od AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                     ORDER BY o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1)
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS o_orderkey_asof, o.o_totalprice AS o_totalprice_asof
    FROM events e ASOF LEFT JOIN od o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_events_last_order(spark, sf_dir):
    """B6: each event joined to the user's most recent order at-or-before
    the event time — the engine's union+window as-of operator (one
    shuffle on the key; no range blowup). DuckDB's native ASOF JOIN is
    the oracle. Equal-date ties are resolved before the as-of (latest
    orderkey wins) since ASOF semantics on ties are engine-specific."""
    ev = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    # collapse same-(custkey, orderdate) ties deterministically first
    from postgre_to_clickhouse_spark.cdc import latest as latest_op

    o_dedup = latest_op(o, entity_key=("o_custkey", "o_orderdate"), version_cols=("o_orderkey",))
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        o_dedup,
        on_left="user_id",
        on_right="o_custkey",
        fact_time="ts",
        dim_time="o_orderdate",
        dim_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return out.select("event_id", "user_id", "ts", "o_orderkey_asof", "o_totalprice_asof")


@register(
    "band_join_acctbal",
    oracle="""
    SELECT s.s_suppkey, COUNT(*) AS n_close_customers
    FROM supplier s JOIN customer c ON abs(c.c_acctbal - s.s_acctbal) <= 50.0
    GROUP BY s.s_suppkey
    """,
)
def band_join_acctbal(spark, sf_dir):
    """B5 scale path: |Δacctbal| ≤ 50 via the banded equi-join rewrite —
    bucket-quantized hash join + exact filter instead of BNLJ."""
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    out = band_join(s, c, left_val="s_acctbal", right_val="c_acctbal", width=50.0)
    return out.groupBy("s_suppkey").agg(F.count(F.lit(1)).alias("n_close_customers"))


@register(
    "percentiles_quantity",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS median_qty,
           quantile_cont(l_quantity, 0.75) AS q75,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price_r
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentiles_quantity(spark, sf_dir):
    """B8: exact continuous percentiles (linear interpolation — matches
    quantile_cont; the price percentile is rounded to absorb lerp
    last-ulp differences). approx_percentile stays rows-only."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.50).alias("median_qty"),
        F.percentile("l_quantity", 0.75).alias("q75"),
        F.round(F.percentile("l_extendedprice", 0.9), 6).alias("p90_price_r"),
    )


@register(
    "grouping_sets_sql",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_sql(spark, sf_dir):
    """B9 via the SQL surface (A22): explicit GROUPING SETS through
    spark.sql over registered temp views."""
    configure(spark)
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "exists_subquery_sql",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
    """,
)
def exists_subquery_sql(spark, sf_dir):
    """B4 via SQL: correlated EXISTS / NOT EXISTS (Catalyst rewrites to
    semi/anti joins — asserted in the plan tests)."""
    configure(spark)
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
        """
    )


@register(
    "scalar_subquery_sql",
    oracle="""
    SELECT p_partkey, p_retailprice,
           round(p_retailprice - (SELECT avg(p_retailprice) FROM part), 6) AS price_vs_avg
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    """,
)
def scalar_subquery_sql(spark, sf_dir):
    """Scalar subquery (uncorrelated) — parts above mean retail price.
    avg is computed identically (single global sum/count in double) in
    both engines; rounded to absorb sum-order last-ulp drift."""
    configure(spark)
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_retailprice,
               round(p_retailprice - (SELECT avg(p_retailprice) FROM part), 6) AS price_vs_avg
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        """
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_within_10k,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_by_price
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """B10: RANGE frames (value-based windows) — peers by price band and
    a cumulative range frame (ties aggregated together, unlike ROWS)."""
    o = _t(spark, sf_dir, "orders")
    w_band = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-10000, 10000)
    w_cum = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w_band).alias("n_within_10k"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w_cum).cast("double").alias("cum_by_price"),
    )


@register(
    "asof_forward_next_order",
    oracle="""
    WITH od AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                     ORDER BY o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1)
    SELECT e.event_id, e.user_id, e.ts,
           arg_min(o.o_orderkey, o.o_orderdate) AS o_orderkey_next,
           arg_min(o.o_totalprice, o.o_orderdate) AS o_totalprice_next
    FROM events e LEFT JOIN od o
      ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
    GROUP BY e.event_id, e.user_id, e.ts
    """,
)
def asof_forward_next_order(spark, sf_dir):
    """B6, r6: FORWARD as-of — each event joined to the user's next
    order at-or-after the event time (the "what did this touchpoint
    convert into" join). Same one-shuffle union+window operator as the
    backward form with ``direction="forward"``; the oracle is an
    independent range-join + arg_min formulation (unique (custkey,
    orderdate) after the deterministic tie collapse, so both arg_mins
    pick the same row)."""
    ev = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    from postgre_to_clickhouse_spark.cdc import latest as latest_op

    o_dedup = latest_op(o, entity_key=("o_custkey", "o_orderdate"), version_cols=("o_orderkey",))
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        o_dedup,
        on_left="user_id",
        on_right="o_custkey",
        fact_time="ts",
        dim_time="o_orderdate",
        dim_cols=["o_orderkey", "o_totalprice"],
        direction="forward",
        suffix="_next",
    )
    return out.select("event_id", "user_id", "ts", "o_orderkey_next", "o_totalprice_next")


@register(
    "range_interval_window_events",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS sum_1h,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_1h
    FROM events WHERE value IS NOT NULL
    """,
)
def range_interval_window_events(spark, sf_dir):
    """r6, B10/B18: TIME-interval RANGE frame — each event's trailing
    one-hour sum/count per user (the sliding-window-over-event-time
    shape; the streaming twin is the watermarked sliding window). The
    DataFrame API's rangeBetween is numeric, so the frame orders by
    epoch microseconds with a ±3.6e9 µs bound — semantically identical
    to DuckDB's ``RANGE INTERVAL 1 HOUR PRECEDING`` (peer rows at equal
    ts aggregate together either way, which is why the output needs no
    tiebreak). Exact decimal sums; one shuffle on user_id."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("sum_1h"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
    )
