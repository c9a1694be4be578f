"""Tier B — the analytics surface the reference provisions via its
ClickHouse endpoint (SURVEY.md §2.5), exercised over the TPC-H-ish
fixtures. Every computed column follows the determinism rules in
``registry`` (exact decimal sums, aliased identically on both engines).

Scale notes are per-query docstrings; global posture: filters and
projections are declarative → Catalyst pushes them into the parquet
scan; small dims are broadcast; AQE handles skew/partition coalescing.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.queries.registry import davg, dsum, register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


# --------------------------------------------------------------------------
# B2 + B7 + B11 — scan, filter pushdown, grouped aggregation (TPC-H Q1 shape)
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """Pricing summary report. Scale: single hash-agg over the fact table;
    partial aggregation map-side shrinks the shuffle to #groups (≤6) —
    the canonical 100 TB-safe shape. Filter pushes to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, scale=4).alias("sum_disc_price"),
            dsum(charge, scale=6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# B3 + B7 + B11 — multi-join, agg, top-k (TPC-H Q3 shape)
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """Top-10 unshipped-revenue orders. Scale: customer filter prunes the
    build side before the join; the final LIMIT plans as
    TakeOrderedAndProject (no global sort materialization)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev, scale=4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# B3 — 6-way star join + agg (TPC-H Q5 shape). Also the flagship entry().
# --------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """Revenue from local suppliers per nation. Scale: region/nation are
    bounded-cardinality → explicit broadcast; supplier is broadcast by
    AQE when under threshold; the only large shuffle is lineitem⋈orders
    on orderkey (co-partitionable/bucketable at 100 TB)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(rev, scale=4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --------------------------------------------------------------------------
# B4 — semi / anti joins
# --------------------------------------------------------------------------
@register(
    "join_semi_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
)
def join_semi(spark, sf_dir):
    """LEFT SEMI join (IN/EXISTS rewrite). Scale: semi-join never
    multiplies rows; AQE broadcasts the deduped key side when small."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_pending",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def join_anti(spark, sf_dir):
    """LEFT ANTI join (NOT IN/NOT EXISTS rewrite, null-free keys)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# B3 — outer join preserving unmatched rows
# --------------------------------------------------------------------------
@register(
    "join_outer_order_counts",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(30,2))), 0) AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_outer(spark, sf_dir):
    """LEFT OUTER join + agg; zero-order customers kept with count 0."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# B5 — theta/range join
# --------------------------------------------------------------------------
@register(
    "join_range_acctbal_bands",
    oracle="""
    SELECT s.s_suppkey, COUNT(*) AS n_similar_customers
    FROM supplier s JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 100.0 AND s.s_acctbal + 100.0
    GROUP BY s.s_suppkey
    """,
)
def join_range(spark, sf_dir):
    """Non-equi band join (customers within ±100 of a supplier's balance).
    Scale: pure theta-join is BNLJ — broadcast the small side explicitly;
    at 100 TB the production path is the banded equi-join rewrite
    (operators.range_join.band_join) which turns it into a hash join on
    a quantized band key."""
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    c = _t(spark, sf_dir, "customer")
    cond = (c.c_acctbal >= s.s_acctbal - 100.0) & (c.c_acctbal <= s.s_acctbal + 100.0)
    return s.join(c, cond).groupBy("s_suppkey").agg(F.count(F.lit(1)).alias("n_similar_customers"))


# --------------------------------------------------------------------------
# B7 + B8 — aggregation family
# --------------------------------------------------------------------------
@register(
    "agg_events_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_events_stats(spark, sf_dir):
    """count / count-distinct / min / max / exact-sum / avg per group.
    Scale: count(distinct) expands to a two-phase agg (Catalyst);
    min/max/sum get map-side partials."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        dsum("value", scale=6).alias("sum_value"),
        davg("value", scale=6).alias("avg_value"),
    )


@register("agg_approx_distinct")  # no oracle: HLL sketches differ per engine
def agg_approx_distinct(spark, sf_dir):
    """B8: approx_count_distinct (HLL++). Rows-only driver check — the
    sketch estimate is engine-specific by design; accuracy is asserted
    against the exact count in tests/test_tierb_extra.py."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


# --------------------------------------------------------------------------
# B9 — rollup / cube / grouping sets
# --------------------------------------------------------------------------
@register(
    "rollup_revenue_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_revenue(spark, sf_dir):
    """ROLLUP with region→nation hierarchy (subtotals + grand total)."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(dsum("c_acctbal").alias("total_acctbal"), F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flags(spark, sf_dir):
    """CUBE over the two status dims (all 2^2 grouping sets)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"), dsum("l_quantity").alias("sum_qty")
    )


# --------------------------------------------------------------------------
# B10 — window functions
# --------------------------------------------------------------------------
@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_top3(spark, sf_dir):
    """Ranking window: per-customer top-3 orders. Scale: one shuffle on
    the partition key; sort is per-partition, never global."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_user_running_totals",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
           first_value(value) OVER w AS first_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_running(spark, sf_dir):
    """Analytic windows: lag/lead/first_value + an exact running sum
    (decimal accumulator → engine-exact)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(wsum).cast("double").alias("running_sum"),
        F.first("value").over(w).alias("first_val"),
    )


# --------------------------------------------------------------------------
# B11 — global top-k
# --------------------------------------------------------------------------
@register(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def topk_orders(spark, sf_dir):
    """ORDER BY + LIMIT → TakeOrderedAndProject: per-partition heaps, one
    k-row merge at the driver — no global sort at any scale."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


# --------------------------------------------------------------------------
# B12 — set operations
# --------------------------------------------------------------------------
@register(
    "setop_nation_presence",
    oracle="""
    SELECT 'both' AS tag, n FROM (
        SELECT DISTINCT c_nationkey AS n FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS n FROM supplier)
    UNION ALL
    SELECT 'customers_only' AS tag, n FROM (
        SELECT DISTINCT c_nationkey AS n FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS n FROM supplier)
    """,
)
def setop_nation_presence(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION ALL over nation-key domains."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n")).distinct()
    both = c.intersect(s).select(F.lit("both").alias("tag"), "n")
    cust_only = c.subtract(s).select(F.lit("customers_only").alias("tag"), "n")
    return both.unionAll(cust_only)


# --------------------------------------------------------------------------
# B13 — string functions
# --------------------------------------------------------------------------
@register(
    "string_funcs_part",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lc,
           upper(p_brand) AS brand_uc,
           substring(p_type, 1, 4) AS type_prefix,
           length(p_name) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           trim(p_name) AS name_trim,
           (p_name LIKE '%bolt%') AS is_bolt,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           replace(p_type, 'ECONOMY', 'ECO') AS type_short
    FROM part
    """,
)
def string_funcs(spark, sf_dir):
    """lower/upper/substring/length/concat/trim/LIKE/regexp/replace."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim("p_name").alias("name_trim"),
        F.col("p_name").like("%bolt%").alias("is_bolt"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
    )


# --------------------------------------------------------------------------
# B14 — date/time functions
# --------------------------------------------------------------------------
@register(
    "date_funcs_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           quarter(o_orderdate) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
           o_orderdate + INTERVAL 30 DAY AS due_date
    FROM orders
    """,
)
def date_funcs(spark, sf_dir):
    """to_date/extract/date_trunc/datediff/interval arithmetic (B14;
    includes the reference's toDateTime-family surface, README.md:226)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")).alias("days_since_95"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


# --------------------------------------------------------------------------
# B15 — math functions
# --------------------------------------------------------------------------
@register(
    "math_funcs_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           sqrt(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) % 7 AS DOUBLE) AS price_mod7,
           greatest(l_discount, l_tax) AS max_rate,
           CAST(sign(l_discount - l_tax) AS INTEGER) AS rate_sign
    FROM lineitem
    """,
)
def math_funcs(spark, sf_dir):
    """round/abs/ceil/floor/sqrt/mod/greatest/sign. sqrt is IEEE-exact;
    transcendentals (ln/exp/pow) are deliberately excluded from the
    oracle-checked set (1-ulp libm divergence) — covered rows-only."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_extendedprice").cast("decimal(18,2)") % 7).cast("double").alias("price_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.signum(F.col("l_discount") - F.col("l_tax")).cast("int").alias("rate_sign"),
    )


# --------------------------------------------------------------------------
# B16 — JSON functions (events.props is a JSON string)
# --------------------------------------------------------------------------
@register(
    "json_events_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
           (CAST(json_extract_string(props, '$.k') AS INTEGER) > 50) AS k_high
    FROM events
    """,
)
def json_events(spark, sf_dir):
    """JSONExtract* analogue over the props JSON column."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", k.alias("k_value"), (k > 50).alias("k_high"))


# --------------------------------------------------------------------------
# B17 — array functions (embeddings.embedding is array<float>)
# --------------------------------------------------------------------------
@register(
    "array_embedding_stats",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
)
def array_stats(spark, sf_dir):
    """size / element access / higher-order transform+aggregate / filter.
    All JVM-side (no Python) — the pattern the similarity ops build on."""
    e = _t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.col("embedding")[0].cast("double").alias("first_elem"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


# --------------------------------------------------------------------------
# B18 — time-bucketed (streaming-window-shaped) aggregation, batch form
# --------------------------------------------------------------------------
@register(
    "window_hourly_event_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_hourly(spark, sf_dir):
    """Tumbling 1-hour window aggregation via F.window — the exact query
    the streaming path runs with a watermark (tests cover that mode);
    window.start ≡ date_trunc('hour') for epoch-aligned tumbling."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", scale=6).alias("sum_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
