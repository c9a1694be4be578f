"""Round-9 Tier-B widening: the remaining ClickHouse analytics
aggregates with no row yet in PARITY.md — ``WITH TOTALS``,
``maxIntersections``/``maxIntersectionsPosition``, the statistical
test family (``welchTTest``, ``mannWhitneyUTest``, ``cramersV``), and
``exponentialMovingAverage`` — each as a full-SQL-oracle driver query.

Reference anchor: the reference's terminal is ClickHouse 24.3.3
(/root/reference/docker-compose.yml:157), whose SELECT surface ships
every one of these; the reference itself delegates all query execution
to that engine (README.md:216-243 runs plain SELECTs against it).

Cross-engine float rules follow queries/registry.py: exact-decimal
sums via dsum, fixed literal op order for double arithmetic (IEEE
multiply/divide/sqrt are correctly rounded, hence engine-identical),
6dp rounding only where a transcendental or engine-reassociable sum
would otherwise risk a last-ulp flip.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.queries.registry import dsum, register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


@register(
    "with_totals_status",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'TOTALS'
                ELSE o_orderstatus END AS status,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP(o_orderstatus)
    """,
)
def with_totals_status(spark, sf_dir):
    """r9, B9+: ClickHouse ``GROUP BY ... WITH TOTALS`` (an extra row
    aggregating across ALL groups, docs/sql-reference/statements/
    select/group-by#with-totals-modifier). Mapped to a single-column
    ``rollup`` — grouping sets {(status), ()} — which Catalyst executes
    as ONE scan with partial aggregation (an Expand + partial/final
    HashAggregate), not a groupBy-plus-global-agg union that would read
    the table twice. The totals row is keyed 'TOTALS' via the grouping
    indicator (CH emits it out-of-band in the wire format; a sentinel
    key is the DataFrame-shaped equivalent).

    Scale: identical plan shape to any grouped agg — partial aggs
    map-side, one shuffle on the grouping-set key."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus")
        .agg(
            dsum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("o_orderstatus").alias("_g"),
        )
        .select(
            F.when(F.col("_g") == 1, F.lit("TOTALS"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            "revenue",
            "n_orders",
        )
    )


@register(
    "max_intersections_users",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             MIN(ts) AS s, MAX(ts) AS e
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    pts AS (
      SELECT d, s AS point, 1 AS delta FROM iv
      UNION ALL
      SELECT d, e AS point, -1 AS delta FROM iv
    ),
    sweep AS (
      SELECT d, point, delta,
             SUM(delta) OVER (PARTITION BY d ORDER BY point, delta DESC
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM pts
    ),
    best AS (SELECT MAX(conc) AS mx FROM sweep)
    SELECT CAST(mx AS BIGINT) AS max_intersections,
           (SELECT MIN(point) FROM sweep, best WHERE conc = mx)
             AS position_ts
    FROM best
    """,
)
def max_intersections_users(spark, sf_dir):
    """r9, B21: ClickHouse ``maxIntersections(start, end)`` +
    ``maxIntersectionsPosition`` — peak concurrency over intervals and
    the first point where it is reached. Intervals here are per-user
    daily activity spans [min ts, max ts]; the classic sweep (+1 at
    start, -1 at end, running max) runs as a window over the REDUCED
    intervals table, never the fact table. Tie semantics are fixed
    deterministically: intervals are closed, and at an equal point
    starts are processed before ends (delta DESC), so touching
    intervals count as intersecting — within ClickHouse's admissible
    orderings, which sorts (point, delta) pairs the same way.

    Scale: the sweep needs a prefix sum over endpooints — partitioned
    by day (a per-user daily span cannot cross its day, so concurrency
    at any instant only involves that day's intervals), there is no
    single-partition window; per-day endpoint counts are bounded by
    users. The final max-of-maxes is a one-row agg."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    pts = iv.select("d", F.col("s").alias("point"), F.lit(1).alias("delta")).unionAll(
        iv.select("d", F.col("e").alias("point"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("d")
        .orderBy(F.col("point").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = pts.withColumn("conc", F.sum("delta").over(w))
    # One-pass argmax: max over (conc, -epoch) structs picks the highest
    # concurrency and, within it, the earliest point.
    best = sweep.agg(
        F.max(
            F.struct(
                F.col("conc").alias("conc"),
                (-F.unix_micros("point")).alias("np"),
            )
        ).alias("b")
    )
    return best.select(
        F.col("b.conc").alias("max_intersections"),
        F.timestamp_micros(-F.col("b.np")).alias("position_ts"),
    )


@register(
    "welch_ttest_values",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE)
               AS s2
      FROM events
      WHERE event_type IN ('view', 'purchase')
      GROUP BY event_type
    ),
    p AS (
      SELECT
        MAX(CASE WHEN event_type = 'view' THEN n END) AS n1,
        MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
        MAX(CASE WHEN event_type = 'view' THEN s1 END) AS a1,
        MAX(CASE WHEN event_type = 'purchase' THEN s1 END) AS a2,
        MAX(CASE WHEN event_type = 'view' THEN s2 END) AS q1,
        MAX(CASE WHEN event_type = 'purchase' THEN s2 END) AS q2
      FROM g
    ),
    m AS (
      SELECT n1, n2,
             a1 / n1 AS m1, a2 / n2 AS m2,
             (q1 - (a1 / n1) * a1) / (n1 - 1) AS v1,
             (q2 - (a2 / n2) * a2) / (n2 - 1) AS v2
      FROM p
    )
    SELECT n1, n2,
           ROUND(m1 - m2, 6) AS mean_diff,
           ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND(((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)) /
                 ((v1 / n1) * (v1 / n1) / (n1 - 1) +
                  (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS dof
    FROM m
    """,
)
def welch_ttest_values(spark, sf_dir):
    """r9, B21: ClickHouse ``welchTTest(value, group)`` — the unequal-
    variance two-sample t statistic with Welch–Satterthwaite degrees of
    freedom, comparing 'view' vs 'purchase' event values. Group moments
    come from ONE partial-aggregable pass (count, exact-decimal Σx and
    Σx²); the statistic is pure scalar arithmetic on the two-row result
    pivoted to one row. Σx² uses the double product x*x cast to decimal
    — the product's IEEE rounding is identical in both engines, the sum
    is then exact and order-free. t and dof round at 6dp (POWER is
    transcendental-class per the registry rule; every other op is
    correctly-rounded IEEE in a fixed literal order).

    Scale: one scan + one 2-row shuffle; nothing else moves."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", scale=6).alias("s1"),
        dsum(F.col("value") * F.col("value"), scale=6).alias("s2"),
    )

    def pick(col, et):
        return F.max(F.when(F.col("event_type") == et, F.col(col)))

    p = g.agg(
        pick("n", "view").alias("n1"),
        pick("n", "purchase").alias("n2"),
        pick("s1", "view").alias("a1"),
        pick("s1", "purchase").alias("a2"),
        pick("s2", "view").alias("q1"),
        pick("s2", "purchase").alias("q2"),
    )
    m1 = F.col("a1") / F.col("n1")
    m2 = F.col("a2") / F.col("n2")
    v1 = (F.col("q1") - m1 * F.col("a1")) / (F.col("n1") - 1)
    v2 = (F.col("q2") - m2 * F.col("a2")) / (F.col("n2") - 1)
    se2 = v1 / F.col("n1") + v2 / F.col("n2")
    w1 = v1 / F.col("n1")
    w2 = v2 / F.col("n2")
    return p.select(
        "n1",
        "n2",
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round((m1 - m2) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            (se2 * se2)
            / (w1 * w1 / (F.col("n1") - 1) + w2 * w2 / (F.col("n2") - 1)),
            6,
        ).alias("dof"),
    )


@register(
    "mann_whitney_values",
    oracle="""
    WITH s AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('view', 'purchase')
    ),
    r AS (
      SELECT event_type, value,
             RANK() OVER (ORDER BY value) AS rk,
             COUNT(*) OVER (PARTITION BY value) AS c
      FROM s
    ),
    agg AS (
      SELECT
        SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n1,
        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2,
        SUM(CASE WHEN event_type = 'view'
                 THEN rk + (c - 1) / 2.0 ELSE 0 END) AS r1
      FROM r
    ),
    ties AS (
      SELECT CAST(SUM(CAST(c AS DOUBLE) * c * c - c) AS DOUBLE) AS tsum,
             COUNT(*) + 0 AS n_distinct
      FROM (SELECT value, COUNT(*) AS c FROM s GROUP BY value)
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           r1 - n1 * (n1 + 1) / 2.0 AS u1,
           n1 * CAST(n2 AS DOUBLE) - (r1 - n1 * (n1 + 1) / 2.0) AS u2,
           ROUND(((r1 - n1 * (n1 + 1) / 2.0) - n1 * CAST(n2 AS DOUBLE) / 2.0)
                 / SQRT(n1 * CAST(n2 AS DOUBLE) / 12.0 *
                        ((n1 + n2 + 1) - tsum /
                         (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))), 6)
             AS z_stat
    FROM agg, ties
    """,
)
def mann_whitney_values(spark, sf_dir):
    """r9, B21: ClickHouse ``mannWhitneyUTest(value, group)`` — the
    rank-sum U statistic with average ranks for ties and the
    tie-corrected normal approximation z. Average ranks are exact
    half-integers (rank + (tie_count-1)/2), so their sum is exact in
    double and order-free — no decimal detour needed. U1/U2 stay
    exact; only z (one sqrt) rounds at 6dp.

    Scale: the global rank is computed from the DISTINCT-value table
    via a two-phase distributed prefix sum (the global_rank pattern,
    operators/sampling.py:316): values hash into ordered range buckets,
    tie counts prefix-sum WITHIN each bucket (a partitioned window),
    and per-bucket offsets — a constant-bounded 1024-row table — add
    back broadcast. No single-partition window touches anything
    value-cardinality- or row-sized; ranks then hash-join back to rows,
    and the fact table is never globally sorted. The oracle uses the
    textbook RANK() OVER () formulation; both produce the same exact
    half-integer ranks."""
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select("event_type", "value")
    )
    from postgre_to_clickhouse_spark.operators.ranks import tie_averaged_ranks

    vc = ev.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    ranked = tie_averaged_ranks(vc, "value", "c")
    rows = ev.join(F.broadcast(ranked.select("value", "avg_rank")), "value")
    agg = rows.agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n2"
        ),
        F.sum(
            F.when(F.col("event_type") == "view", F.col("avg_rank")).otherwise(
                F.lit(0.0)
            )
        ).alias("r1"),
    )
    ties = vc.agg(
        F.sum(F.col("c").cast("double") * F.col("c") * F.col("c") - F.col("c"))
        .cast("double")
        .alias("tsum")
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0)
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nn = F.col("n1") + F.col("n2")
    var = (
        F.col("n1") * n2d / F.lit(12.0)
        * ((nn + 1) - F.col("tsum") / (nn.cast("double") * (nn - 1)))
    )
    return agg.crossJoin(ties).select(
        "n1",
        "n2",
        u1.alias("u1"),
        (F.col("n1") * n2d - u1).alias("u2"),
        F.round((u1 - F.col("n1") * n2d / F.lit(2.0)) / F.sqrt(var), 6).alias(
            "z_stat"
        ),
    )


@register(
    "cramers_v_association",
    oracle="""
    WITH cell AS (
      SELECT event_type AS a, dayofweek(ts) AS b, COUNT(*) AS o
      FROM events GROUP BY event_type, dayofweek(ts)
    ),
    rt AS (SELECT a, SUM(o) AS ra FROM cell GROUP BY a),
    ct AS (SELECT b, SUM(o) AS cb FROM cell GROUP BY b),
    n AS (SELECT SUM(o) AS n FROM cell),
    terms AS (
      SELECT CAST((o - CAST(ra AS DOUBLE) * cb / n)
                  * (o - CAST(ra AS DOUBLE) * cb / n)
                  / (CAST(ra AS DOUBLE) * cb / n) AS DECIMAL(30,8)) AS term
      FROM cell JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN n
    ),
    chi AS (SELECT CAST(SUM(term) AS DOUBLE) AS chi2 FROM terms),
    dims AS (
      SELECT (SELECT COUNT(*) FROM rt) AS r, (SELECT COUNT(*) FROM ct) AS c
    )
    SELECT CAST(n.n AS BIGINT) AS n, dims.r AS r, dims.c AS c,
           ROUND(chi.chi2, 6) AS chi2,
           ROUND(SQRT(chi.chi2 / (n.n * (CASE WHEN dims.r < dims.c
                 THEN dims.r ELSE dims.c END - 1))), 6) AS cramers_v
    FROM chi, n, dims
    """,
)
def cramers_v_association(spark, sf_dir):
    """r9, B21: ClickHouse ``cramersV(a, b)`` — association strength
    between two categoricals (event_type × day-of-week) from the χ²
    contingency statistic. The contingency table (r×c cells, 35 here)
    is one partial-aggregable groupBy; marginals are aggregates OF THE
    CELLS (the fact table is scanned once); χ² terms are doubles in a
    fixed literal order, cast to decimal so their SUM is order-free,
    and the final χ²/V round at 6dp (POWER per the registry rule).

    Scale: everything after the one fact scan operates on the
    category-bounded cell table; marginal joins broadcast."""
    ev = _t(spark, sf_dir, "events")
    # Spark dayofweek == DuckDB dayofweek+1 (Spark: Sun=1, DuckDB: Sun=0).
    cell = ev.groupBy(
        F.col("event_type").alias("a"),
        (F.dayofweek("ts") - 1).alias("b"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = cell.groupBy("a").agg(F.sum("o").alias("ra"))
    ct = cell.groupBy("b").agg(F.sum("o").alias("cb"))
    n = cell.agg(F.sum("o").alias("n"))
    e = F.col("ra").cast("double") * F.col("cb") / F.col("n")
    terms = (
        cell.join(F.broadcast(rt), "a")
        .join(F.broadcast(ct), "b")
        .crossJoin(F.broadcast(n))
        .select(
            ((F.col("o") - e) * (F.col("o") - e)).alias("_num"),
            e.alias("_e"),
        )
        .select((F.col("_num") / F.col("_e")).cast("decimal(30,8)").alias("term"))
    )
    chi = terms.agg(F.sum("term").cast("double").alias("chi2"))
    dims = rt.agg(F.count(F.lit(1)).alias("r")).crossJoin(
        ct.agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        chi.crossJoin(n)
        .crossJoin(dims)
        .select(
            "n",
            "r",
            "c",
            F.round("chi2", 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n") * (F.least("r", "c") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
    )


@register(
    "ema_user_values",
    oracle="""
    WITH RECURSIVE ord AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    cnt AS (SELECT user_id, COUNT(*) AS n_events FROM ord GROUP BY user_id),
    rec AS (
      SELECT user_id, rn, value AS ema FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn, (r.ema + o.value) * 0.5
      FROM rec r JOIN ord o ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT r.user_id, r.ema AS ema_value, c.n_events
    FROM rec r
    JOIN cnt c ON c.user_id = r.user_id AND r.rn = c.n_events
    """,
)
def ema_user_values(spark, sf_dir):
    """r9, B21: ClickHouse ``exponentialMovingAverage`` — the
    exponentially-decayed running mean, as the per-user final EMA of
    event values in (ts, event_id) order with decay α = 1/2:
    ema₁ = x₁, emaₖ = (emaₖ₋₁ + xₖ)·0.5. The fold is bit-exact across
    engines with NO rounding: (a+b) rounds identically under IEEE in
    both, and ·0.5 is an exact exponent decrement — so replicating the
    op order (oracle: a recursive CTE walking rn) reproduces every
    intermediate bit. α = 1/2 is the halving decay ClickHouse's
    x-seconds-halflife form reduces to at unit spacing.

    Scale: one groupBy(user); the fold runs JVM-side via the aggregate
    higher-order function over the per-user array (bounded by per-user
    activity, the same bound every funnel operator here relies on) —
    no Python, no window, no recursion in the engine."""
    ev = _t(spark, sf_dir, "events")
    vals = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    return (
        ev.groupBy("user_id")
        .agg(vals.alias("vals"))
        .select(
            "user_id",
            F.expr(
                "aggregate(slice(vals, 2, size(vals) - 1), vals[0],"
                " (acc, x) -> (acc + x) * 0.5d)"
            ).alias("ema_value"),
            F.size("vals").alias("n_events"),
        )
    )


@register(
    "interval_length_sum_users",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
      FROM events
      GROUP BY user_id, CAST(ts AS DATE), event_type
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS isl
      FROM marked
    ),
    merged AS (
      SELECT user_id, isl, MAX(e) - MIN(s) AS len
      FROM islands GROUP BY user_id, isl
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(len) AS BIGINT) AS union_us
    FROM merged GROUP BY user_id
    """,
)
def interval_length_sum_users(spark, sf_dir):
    """r9, B21: ClickHouse ``intervalLengthSum(start, end)`` — total
    length of the UNION of intervals (overlaps counted once). Intervals
    here are per-(user, day, event_type) activity spans, which overlap
    heavily within a user's day across event types; the union length is
    the user's distinct active time. Classic island merge: an interval
    opens a new island iff its start exceeds the running max end of
    everything before it (window per user, ordered (s, e)); islands
    then reduce to max(e)-min(s). Everything is exact integer epoch-µs.

    Scale: the sweep windows are PARTITIONED per user over the reduced
    intervals table (bounded by user × day × type, not events); the
    fact table is scanned once into that reduction."""
    ev = _t(spark, sf_dir, "events")
    mu = F.unix_micros("ts")
    iv = ev.groupBy(
        "user_id", F.to_date("ts").alias("d"), "event_type"
    ).agg(F.min(mu).alias("s"), F.max(mu).alias("e"))
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(w_prev), 1).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = marked.withColumn("isl", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "isl").agg(
        (F.max("e") - F.min("s")).alias("len")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("len").cast("bigint").alias("union_us"),
    )


@register(
    "lttb_downsample_events",
    oracle="""
    WITH RECURSIVE p AS (
      SELECT event_type AS serie, epoch_us(ts) AS xl, value AS v,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY epoch_us(ts), event_id) - 1 AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    bkt AS (
      SELECT serie, xl, v, i, CAST(((i - 1) * 18) // (n - 2) AS INT) AS b
      FROM p WHERE i >= 1 AND i <= n - 2
    ),
    lastp AS (SELECT serie, xl, v FROM p WHERE i = n - 1),
    avgs AS (
      SELECT serie, b,
             CAST(SUM(xl) AS DOUBLE) / COUNT(*) AS ax,
             CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / COUNT(*) AS ay
      FROM bkt GROUP BY serie, b
    ),
    nxt AS (
      SELECT serie, b - 1 AS b, ax AS nx, ay AS ny FROM avgs WHERE b >= 1
      UNION ALL
      SELECT serie, 17 AS b, CAST(xl AS DOUBLE) AS nx, v AS ny FROM lastp
    ),
    rec AS (
      SELECT serie, 0 AS step, xl AS sx, v AS sy FROM p WHERE i = 0
      UNION ALL
      SELECT q.serie, q.step + 1, q.pick['xl'], q.pick['v']
      FROM (
        SELECT r.serie, r.step,
          (SELECT {'xl': c.xl, 'v': c.v}
           FROM bkt c JOIN nxt t ON t.serie = c.serie AND t.b = c.b
           WHERE c.serie = r.serie AND c.b = r.step
           ORDER BY abs((CAST(r.sx AS DOUBLE) - t.nx) * (c.v - r.sy)
                      - (CAST(r.sx AS DOUBLE) - CAST(c.xl AS DOUBLE))
                        * (t.ny - r.sy)) DESC,
                    c.i ASC
           LIMIT 1) AS pick
        FROM rec r WHERE r.step < 18
      ) q
    )
    SELECT serie, CAST(step AS INT) AS pos, sx AS ts_us, sy AS value
    FROM rec
    UNION ALL
    SELECT serie, 19 AS pos, xl AS ts_us, v AS value FROM lastp
    """,
)
def lttb_downsample_events(spark, sf_dir):
    """r9, B21: ClickHouse ``largestTriangleThreeBuckets(20)(ts,
    value)`` — per-event-type time series downsampled to 20 points
    that preserve visual extrema (:mod:`operators.lttb`). The greedy
    walk is sequential per series, so the engine runs one Arrow
    ``applyInPandas`` per series (series parallelize; per-series work
    is a few vector ops per bucket); the DuckDB oracle replays the
    IDENTICAL walk as a recursive CTE — same integer bucket formula,
    same exact-sum bucket averages, same literal float op order for
    the triangle areas, lowest-index tie-break — so both engines
    select the same points bit-for-bit and the output is raw input
    (ts, value) pairs, no rounding anywhere.

    Scale: series fan out across executors; per-series state is the
    series' points (the per-entity bound every sequential operator
    here rides). A series too long for one task would shard by coarse
    time windows with per-window LTTB — the standard tiling."""
    from postgre_to_clickhouse_spark.operators.lttb import lttb_downsample

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "event_id",
    )
    return lttb_downsample(
        ev, "event_type", "ts_us", "value", "event_id", n_out=20
    )


@register(
    "sequence_next_node_events",
    oracle="""
    WITH ord AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    cnt AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
    m AS (
      SELECT user_id, MIN(rn) AS rn0 FROM ord
      WHERE event_type = 'view' AND e2 = 'click'
      GROUP BY user_id
    )
    SELECT c.user_id,
           (SELECT o.e3 FROM ord o JOIN m ON m.user_id = o.user_id
            WHERE o.user_id = c.user_id AND o.rn = m.rn0) AS next_event,
           c.n_events
    FROM cnt c
    """,
)
def sequence_next_node_events(spark, sf_dir):
    """r9, B21: ClickHouse ``sequenceNextNode('forward', 'first_match')
    (ts, event, base, 'view', 'click')`` — journey attribution: for
    each user, the event IMMEDIATELY AFTER the first consecutive
    view→click pair in the user's (ts, event_id)-ordered stream (NULL
    when there is no pair, or the pair ends the stream). Unlike
    sequenceMatch, the chain here is CONSECUTIVE — that is the
    operator's defining semantics and why it needs its own
    implementation next to the subsequence-DP funnel family
    (operators/funnel.py). One groupBy collects the per-user ordered
    event array; a JVM higher-order filter over candidate positions
    finds the first chain start, all inside codegen — no join, no
    window, no Python.

    Scale: per-user arrays (the sessionize/funnel bound); one shuffle.
    The oracle takes the textbook window-lead formulation instead —
    structurally different, same answer."""
    ev = _t(spark, sf_dir, "events")
    evs = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
        lambda s: s["event_type"],
    )
    return (
        ev.groupBy("user_id")
        .agg(evs.alias("evs"))
        .select(
            "user_id",
            F.expr(
                "try_element_at(evs, try_add(try_element_at("
                " filter(sequence(1, greatest(size(evs) - 1, 1)),"
                "        i -> evs[i - 1] = 'view' AND i < size(evs)"
                "             AND evs[i] = 'click'), 1), 2))"
            ).alias("next_event"),
            F.size("evs").alias("n_events"),
        )
    )


def _sql_spread(e: str) -> str:
    """DuckDB mirror of operators/geo._spread16 (Morton bit spread)."""
    for sh, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        e = f"(({e} | ({e} << {sh})) & {m})"
    return e


_GH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_CHARS = " || ".join(
    f"substring('{_GH_ALPHA}', CAST((c >> {25 - 5 * (k + 1)}) & 31 AS INT) + 1, 1)"
    for k in range(5)
)

_GEOHASH_ORACLE = f"""
    WITH pt AS (
      SELECT user_id,
             ((user_id * 73 % 160) - 80 + 0.5) + (event_id % 7) * 0.03 AS lat,
             ((user_id * 37 % 360) - 180 + 0.5) + (event_id % 11) * 0.03 AS lon
      FROM events
    ),
    q AS (
      SELECT user_id,
             CAST(LEAST(8191, FLOOR((lon + 180.0) / 360.0 * 8192.0))
                  AS BIGINT) AS lonq,
             CAST(LEAST(4095, FLOOR((lat + 90.0) / 180.0 * 4096.0))
                  AS BIGINT) AS latq
      FROM pt
    ),
    code AS (
      SELECT user_id, lonq, latq,
             ({_sql_spread('lonq')} | ({_sql_spread('latq')} << 1)) AS c
      FROM q
    ),
    cell AS (SELECT user_id, lonq, latq, {_GH_CHARS} AS gh FROM code)
    SELECT gh,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           (CAST(MIN(lonq) AS DOUBLE) + 0.5) * 360.0 / 8192.0 - 180.0
             AS lon_c,
           (CAST(MIN(latq) AS DOUBLE) + 0.5) * 180.0 / 4096.0 - 90.0
             AS lat_c
    FROM cell GROUP BY gh
"""


@register("geohash_cells_events", oracle=_GEOHASH_ORACLE)
def geohash_cells_events(spark, sf_dir):
    """r9, B27+: ClickHouse ``geohashEncode``/``geohashDecode``
    (operators/geo.py — pure bit arithmetic, no library, whole-stage
    codegen) driving the classic SPATIAL BUCKETING shape: events get
    deterministic synthesized coordinates (same integer-derived recipe
    as geo_funcs), bucket by precision-5 geohash cell, aggregate per
    cell, and decode each cell key back to its center. The oracle
    re-derives the Morton interleave and base32 digits with the SAME
    mask-shift cascade in SQL, and computes centers directly from the
    quantized indices — so Spark's decode(encode(x)) must agree with
    the oracle's closed-form center bit-for-bit, proving encode and
    decode are exact inverses through the group-by.

    Scale: the cell id is a map-only scan column; bucketing is plain
    hash aggregation — the geo-join analog of MinHash banding (equal
    cell = candidate neighbors), no distance join anywhere."""
    from postgre_to_clickhouse_spark.operators.geo import (
        geohash_decode,
        geohash_encode,
    )

    ev = _t(spark, sf_dir, "events")
    lat = ((F.col("user_id") * 73) % 160 - 80 + F.lit(0.5)) + (
        F.col("event_id") % 7
    ) * F.lit(0.03)
    lon = ((F.col("user_id") * 37) % 360 - 180 + F.lit(0.5)) + (
        F.col("event_id") % 11
    ) * F.lit(0.03)
    pts = ev.select(
        "user_id", geohash_encode(lon, lat, precision=5).alias("gh")
    )
    agg = pts.groupBy("gh").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    dlon, dlat = geohash_decode(F.col("gh"), precision=5)
    return agg.select(
        "gh", "n_events", "n_users", dlon.alias("lon_c"), dlat.alias("lat_c")
    )


@register(
    "geohashes_in_box_probe",
    oracle="""
    WITH pt AS (
      SELECT event_type,
             ((user_id * 73 % 160) - 80 + 0.5) + (event_id % 7) * 0.03 AS lat,
             ((user_id * 37 % 360) - 180 + 0.5) + (event_id % 11) * 0.03 AS lon
      FROM events
    ),
    q AS (
      SELECT event_type,
             CAST(LEAST(31, FLOOR((lon + 180.0) / 360.0 * 32.0)) AS BIGINT)
               AS lonq,
             CAST(LEAST(31, FLOOR((lat + 90.0) / 180.0 * 32.0)) AS BIGINT)
               AS latq
      FROM pt
    ),
    box AS (
      SELECT event_type,
             MIN(lonq) AS lo1, MAX(lonq) AS lo2,
             MIN(latq) AS la1, MAX(latq) AS la2,
             COUNT(*) AS n_events
      FROM q GROUP BY event_type
    )
    SELECT b.event_type,
           CAST((b.lo2 - b.lo1 + 1) * (b.la2 - b.la1 + 1) AS BIGINT)
             AS n_cells,
           CAST(b.n_events AS BIGINT) AS n_events,
           CAST((SELECT COUNT(*) FROM q
                 WHERE q.event_type = b.event_type
                   AND q.lonq BETWEEN b.lo1 AND b.lo2
                   AND q.latq BETWEEN b.la1 AND b.la2) AS BIGINT)
             AS n_inside
    FROM box b
    """,
)
def geohashes_in_box_probe(spark, sf_dir):
    """r9, B27+: ClickHouse ``geohashesInBox`` — the covering-cell set
    of a bounding box, the spatial PARTITION-PRUNING primitive (probe
    a geohash-bucketed table with the covering set instead of scanning
    the world). Per event type: the bounding box of its synthesized
    points, the precision-2 covering cells, and the count of events
    whose own cell is MEMBER of that set — which must equal the
    type's event count (a covering set that misses any cell of the box
    breaks n_inside; one that over-covers breaks n_cells). The oracle
    works entirely in quantized-index arithmetic: box cell count is
    closed-form (lon cells × lat cells), membership is a range check —
    so the Spark side's generate-then-array_contains must reproduce
    the same geometry exactly.

    Scale: the covering set is computed once per box (group row) and
    broadcast; membership is a map-side array probe — no distance
    join, no explode of the cell array against the fact table."""
    from postgre_to_clickhouse_spark.operators.geo import (
        geohash_encode,
        geohashes_in_box,
    )

    ev = _t(spark, sf_dir, "events")
    lat = ((F.col("user_id") * 73) % 160 - 80 + F.lit(0.5)) + (
        F.col("event_id") % 7
    ) * F.lit(0.03)
    lon = ((F.col("user_id") * 37) % 360 - 180 + F.lit(0.5)) + (
        F.col("event_id") % 11
    ) * F.lit(0.03)
    pts = ev.select(
        "event_type",
        lon.alias("lon"),
        lat.alias("lat"),
        geohash_encode(lon, lat, precision=2).alias("gh"),
    )
    box = pts.groupBy("event_type").agg(
        F.min("lon").alias("lon1"),
        F.max("lon").alias("lon2"),
        F.min("lat").alias("lat1"),
        F.max("lat").alias("lat2"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    boxed = box.select(
        "event_type",
        "n_events",
        geohashes_in_box(
            F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"),
            precision=2,
        ).alias("cells"),
    )
    inside = (
        pts.join(F.broadcast(boxed.select("event_type", "cells")), "event_type")
        .where(F.array_contains("cells", F.col("gh")))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inside"))
    )
    return (
        boxed.join(inside, "event_type")
        .select(
            "event_type",
            F.size("cells").cast("bigint").alias("n_cells"),
            "n_events",
            "n_inside",
        )
    )


@register(
    "ks_test_values",
    oracle="""
    WITH s AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('view', 'purchase')
    ),
    vc AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
      FROM s GROUP BY value
    ),
    cum AS (
      SELECT value,
             SUM(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS f1,
             SUM(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS f2
      FROM vc
    ),
    n AS (
      SELECT SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2
      FROM s
    )
    SELECT CAST(n.n1 AS BIGINT) AS n1,
           CAST(n.n2 AS BIGINT) AS n2,
           CAST(MAX(ABS(cum.f1 * n.n2 - cum.f2 * n.n1)) AS BIGINT)
             AS d_num,
           CAST(MAX(ABS(cum.f1 * n.n2 - cum.f2 * n.n1)) AS DOUBLE)
             / (CAST(n.n1 AS DOUBLE) * n.n2) AS d_stat
    FROM cum, n
    GROUP BY n.n1, n.n2
    """,
)
def ks_test_values(spark, sf_dir):
    """r9, B33+: ClickHouse ``kolmogorovSmirnovTest(value, group)`` —
    the two-sample KS D statistic, computed EXACTLY: D = max over v of
    |F̂₁(v) − F̂₂(v)|, and with F̂ᵢ = cᵢ/nᵢ the max is taken over the
    INTEGER cross-product |c₁·n₂ − c₂·n₁| (no float comparison can
    misorder candidates), divided once at the end (one deterministic
    IEEE division). Cumulative counts ride the same two-phase
    distributed prefix sum as the Mann-Whitney ranks: per-value counts
    bucket by range, prefix-sum within buckets, constant-bounded
    bucket offsets broadcast back — no single-partition window over
    anything value- or row-sized.

    Scale: one fact scan to per-value counts; everything after is
    bounded by value cardinality."""
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select("event_type", "value")
    )
    from postgre_to_clickhouse_spark.operators.ranks import bucketed_prefix_sums

    vc = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "c2"
        ),
    )
    cum = (
        bucketed_prefix_sums(vc, "value", ["c1", "c2"])
        .withColumnRenamed("cum_c1", "f1")
        .withColumnRenamed("cum_c2", "f2")
    )
    n = ev.agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n2"
        ),
    )
    return (
        cum.crossJoin(F.broadcast(n))
        .agg(
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
            F.max(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")))
            .cast("bigint")
            .alias("d_num"),
            (
                F.max(
                    F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
                ).cast("double")
                / (F.first("n1").cast("double") * F.first("n2"))
            ).alias("d_stat"),
        )
    )


@register(
    "student_ttest_values",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE)
               AS s2
      FROM events
      WHERE event_type IN ('view', 'purchase')
      GROUP BY event_type
    ),
    p AS (
      SELECT
        MAX(CASE WHEN event_type = 'view' THEN n END) AS n1,
        MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
        MAX(CASE WHEN event_type = 'view' THEN s1 END) AS a1,
        MAX(CASE WHEN event_type = 'purchase' THEN s1 END) AS a2,
        MAX(CASE WHEN event_type = 'view' THEN s2 END) AS q1,
        MAX(CASE WHEN event_type = 'purchase' THEN s2 END) AS q2
      FROM g
    ),
    m AS (
      SELECT n1, n2,
             a1 / n1 AS m1, a2 / n2 AS m2,
             ((q1 - (a1 / n1) * a1) + (q2 - (a2 / n2) * a2))
               / (n1 + n2 - 2) AS sp2
      FROM p
    )
    SELECT n1, n2,
           CAST(n1 + n2 - 2 AS BIGINT) AS dof,
           ROUND(m1 - m2, 6) AS mean_diff,
           ROUND((m1 - m2) /
                 SQRT(sp2 * (1.0 / n1 + 1.0 / n2)), 6) AS t_stat
    FROM m
    """,
)
def student_ttest_values(spark, sf_dir):
    """r9, B33+: ClickHouse ``studentTTest(value, group)`` — the
    POOLED-variance two-sample t (CH ships it next to welchTTest; the
    equal-variance assumption changes the denominator and gives an
    integer dof n₁+n₂−2). Same one-pass exact-decimal moment
    collection as welch_ttest_values; the pooled variance adds the two
    corrected sums of squares in a fixed literal order before one
    division, so only the final 6dp round guards the sqrt."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", scale=6).alias("s1"),
        dsum(F.col("value") * F.col("value"), scale=6).alias("s2"),
    )

    def pick(col, et):
        return F.max(F.when(F.col("event_type") == et, F.col(col)))

    p = g.agg(
        pick("n", "view").alias("n1"),
        pick("n", "purchase").alias("n2"),
        pick("s1", "view").alias("a1"),
        pick("s1", "purchase").alias("a2"),
        pick("s2", "view").alias("q1"),
        pick("s2", "purchase").alias("q2"),
    )
    m1 = F.col("a1") / F.col("n1")
    m2 = F.col("a2") / F.col("n2")
    sp2 = (
        (F.col("q1") - m1 * F.col("a1")) + (F.col("q2") - m2 * F.col("a2"))
    ) / (F.col("n1") + F.col("n2") - 2)
    return p.select(
        "n1",
        "n2",
        (F.col("n1") + F.col("n2") - 2).cast("bigint").alias("dof"),
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round(
            (m1 - m2)
            / F.sqrt(sp2 * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))),
            6,
        ).alias("t_stat"),
    )


@register(
    "agg_weighted_map_funcs",
    oracle="""
    WITH w AS (
      SELECT event_type, value,
             (event_id % 5) + 1 AS wt,
             (event_id % 3) AS k
    FROM events
    ),
    km AS (
      SELECT event_type, k,
             MIN(CAST(value AS DECIMAL(18,2))) AS mn,
             MAX(CAST(value AS DECIMAL(18,2))) AS mx
      FROM w GROUP BY event_type, k
    ),
    maps AS (
      SELECT event_type,
             string_agg(CAST(k AS VARCHAR) || ':' || CAST(mn AS VARCHAR),
                        ',' ORDER BY k) AS min_map,
             string_agg(CAST(k AS VARCHAR) || ':' || CAST(mx AS VARCHAR),
                        ',' ORDER BY k) AS max_map
      FROM km GROUP BY event_type
    ),
    aw AS (
      SELECT event_type,
             CAST(SUM(CAST(value * wt AS DECIMAL(30,6))) AS DOUBLE)
               / CAST(SUM(wt) AS DOUBLE) AS avg_weighted
      FROM w GROUP BY event_type
    )
    SELECT maps.event_type, aw.avg_weighted, maps.min_map, maps.max_map
    FROM maps JOIN aw ON aw.event_type = maps.event_type
    """,
)
def agg_weighted_map_funcs(spark, sf_dir):
    """r9, B21: the remaining small ClickHouse aggregate trio —
    ``avgWeighted(x, w)`` (exact-decimal Σx·w over exact Σw, one
    deterministic division) and ``minMap``/``maxMap`` (keyed min/max
    merged across rows, emitted as the same canonical sorted k:v text
    the sumMap query uses). Weights and keys derive from event_id so
    both engines see identical integers. One partial-aggregable
    groupBy per map + one for the weighted average.

    Scale: map keys are category-bounded; everything partial-aggs
    map-side."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "value",
        ((F.col("event_id") % 5) + 1).alias("wt"),
        (F.col("event_id") % 3).alias("k"),
    )
    km = ev.groupBy("event_type", "k").agg(
        F.min(F.col("value").cast("decimal(18,2)")).alias("mn"),
        F.max(F.col("value").cast("decimal(18,2)")).alias("mx"),
    )
    maps = km.groupBy("event_type").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.struct("k", "mn"))),
                lambda s: F.concat_ws(
                    ":", s["k"].cast("string"), s["mn"].cast("string")
                ),
            ),
        ).alias("min_map"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.struct("k", "mx"))),
                lambda s: F.concat_ws(
                    ":", s["k"].cast("string"), s["mx"].cast("string")
                ),
            ),
        ).alias("max_map"),
    )
    aw = ev.groupBy("event_type").agg(
        (
            F.sum((F.col("value") * F.col("wt")).cast("decimal(30,6)")).cast(
                "double"
            )
            / F.sum("wt").cast("double")
        ).alias("avg_weighted")
    )
    return maps.join(aw, "event_type").select(
        "event_type", "avg_weighted", "min_map", "max_map"
    )


@register(
    "sequence_next_node_backward",
    oracle="""
    WITH ord AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lag(event_type, 1) OVER w AS e0,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    cnt AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
    m AS (
      SELECT user_id, MAX(rn) AS rn0 FROM ord
      WHERE event_type = 'view' AND e2 = 'click'
      GROUP BY user_id
    )
    SELECT c.user_id,
           (SELECT o.e0 FROM ord o JOIN m ON m.user_id = o.user_id
            WHERE o.user_id = c.user_id AND o.rn = m.rn0) AS prev_event,
           c.n_events
    FROM cnt c
    """,
)
def sequence_next_node_backward(spark, sf_dir):
    """r9, B21: ``sequenceNextNode('backward', 'last_match')`` — the
    event immediately BEFORE the LAST consecutive view→click pair per
    user (NULL when no pair exists or the pair opens the stream),
    completing the direction/base surface next to the forward/
    first_match variant. Same one-groupBy higher-order shape: the
    position filter keeps every chain start, ``element_at(..., -1)``
    takes the last, and the node before it comes from the same
    collected array.

    Scale: identical to sequence_next_node_events — per-user arrays,
    one shuffle, no Python."""
    ev = _t(spark, sf_dir, "events")
    evs = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
        lambda s: s["event_type"],
    )
    return (
        ev.groupBy("user_id")
        .agg(evs.alias("evs"))
        .select(
            "user_id",
            F.expr(
                "try_element_at(evs, nullif(try_subtract(try_element_at("
                " filter(sequence(1, greatest(size(evs) - 1, 1)),"
                "        i -> evs[i - 1] = 'view' AND i < size(evs)"
                "             AND evs[i] = 'click'), -1), 1), 0))"
            ).alias("prev_event"),
            F.size("evs").alias("n_events"),
        )
    )


@register(
    "auc_purchase_score",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             value AS score
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    r AS (
      SELECT y,
             RANK() OVER (ORDER BY score) AS rk,
             COUNT(*) OVER (PARTITION BY score) AS c
      FROM s
    ),
    agg AS (
      SELECT SUM(y) AS np,
             SUM(1 - y) AS nn,
             SUM(CASE WHEN y = 1 THEN rk + (c - 1) / 2.0 ELSE 0 END) AS rp
      FROM r
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           (rp - np * (np + 1) / 2.0) / (CAST(np AS DOUBLE) * nn) AS auc
    FROM agg
    """,
)
def auc_purchase_score(spark, sf_dir):
    """r9, B33+: ClickHouse ``arrayAUC(scores, labels)`` — the ROC AUC
    of `value` as a score for purchase-vs-view, via the exact rank
    identity AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋) with tie-averaged
    ranks. Ranks are exact half-integers from the same two-phase
    distributed prefix sum the Mann-Whitney test uses (AUC is
    literally U/(n₊·n₋) — one extra deterministic division), so the
    result is bit-exact with no rounding.

    Scale: distinct-value-bounded rank table, broadcast back; one
    fact scan."""
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
            F.col("value").alias("score"),
        )
    )
    from postgre_to_clickhouse_spark.operators.ranks import tie_averaged_ranks

    vc = ev.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    ranked = tie_averaged_ranks(vc, "score", "c")
    rows = ev.join(F.broadcast(ranked.select("score", "avg_rank")), "score")
    agg = rows.agg(
        F.sum("y").alias("np"),
        F.sum(1 - F.col("y")).alias("nn"),
        F.sum(F.when(F.col("y") == 1, F.col("avg_rank")).otherwise(0.0)).alias(
            "rp"
        ),
    )
    return agg.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        (
            (F.col("rp") - F.col("np") * (F.col("np") + 1) / F.lit(2.0))
            / (F.col("np").cast("double") * F.col("nn"))
        ).alias("auc"),
    )


@register(
    "tukey_outliers_events",
    oracle="""
    WITH c AS (
      SELECT event_type, value AS v, COUNT(*) AS w
      FROM events GROUP BY event_type, value
    ),
    cum AS (
      SELECT event_type, v,
             SUM(w) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY event_type) AS tw
      FROM c
    ),
    qs AS (
      SELECT event_type,
             MIN(CASE WHEN CAST(cw AS DOUBLE) >= CAST(tw AS DOUBLE) * 0.25
                      THEN v END) AS q1,
             MIN(CASE WHEN CAST(cw AS DOUBLE) >= CAST(tw AS DOUBLE) * 0.75
                      THEN v END) AS q3
      FROM cum GROUP BY event_type
    ),
    f AS (
      SELECT event_type, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo,
             q3 + 1.5 * (q3 - q1) AS hi
      FROM qs
    )
    SELECT f.event_type, f.q1, f.q3,
           CAST(COUNT(CASE WHEN e.value < f.lo OR e.value > f.hi
                           THEN 1 END) AS BIGINT) AS n_outliers,
           MAX(CASE WHEN e.value < f.lo OR e.value > f.hi
                    THEN e.value END) AS max_outlier
    FROM events e JOIN f ON f.event_type = e.event_type
    GROUP BY f.event_type, f.q1, f.q3
    """,
)
def tukey_outliers_events(spark, sf_dir):
    """r9, B21: ClickHouse ``seriesOutliersDetectTukey`` (time-series
    function set of the 24.x line) — per-series Tukey fences: values
    outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR] flagged as outliers.
    Quartiles use the quantileExactWeighted rule over per-(type,
    value) counts (selection returns RAW input values), the fences are
    fixed-order double arithmetic, and the flag count + extreme
    outlier come from one broadcast-join pass — every number exact, no
    rounding.

    Scale: quantile machinery is value-cardinality-bounded per type
    (partitioned windows, never partitionless); the fences broadcast
    back to one fact scan."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type", F.col("value").alias("v")).agg(
        F.count(F.lit(1)).alias("w")
    )
    win = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("event_type")
    cum = c.withColumn("cw", F.sum("w").over(win)).withColumn(
        "tw", F.sum("w").over(tot)
    )
    pick = lambda q: F.min(  # noqa: E731 — smallest v reaching q·W
        F.when(
            F.col("cw").cast("double") >= F.col("tw").cast("double") * F.lit(q),
            F.col("v"),
        )
    )
    qs = cum.groupBy("event_type").agg(
        pick(0.25).alias("q1"), pick(0.75).alias("q3")
    )
    f = qs.select(
        "event_type",
        "q1",
        "q3",
        (F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    out_cond = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        ev.join(F.broadcast(f), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count(F.when(out_cond, 1)).cast("bigint").alias("n_outliers"),
            F.max(F.when(out_cond, F.col("value"))).alias("max_outlier"),
        )
    )


_SPARKBAR_CHARS = "▁▂▃▄▅▆▇█"


@register(
    "sparkbar_hourly_events",
    oracle="""
    WITH hours AS (SELECT unnest(range(24)) AS h),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT event_type, h FROM types CROSS JOIN hours),
    c AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS h, COUNT(*) AS n
      FROM events GROUP BY event_type, EXTRACT(hour FROM ts)
    ),
    filled AS (
      SELECT g.event_type, g.h, COALESCE(c.n, 0) AS n
      FROM grid g LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h
    ),
    mx AS (SELECT event_type, MAX(n) AS mx FROM filled GROUP BY event_type)
    SELECT f.event_type,
           string_agg(
             CASE WHEN f.n = 0 THEN ' '
                  ELSE substring('▁▂▃▄▅▆▇█',
                                 CAST((8 * f.n + m.mx - 1) // m.mx AS INT), 1)
             END, '' ORDER BY f.h) AS bar,
           CAST(SUM(f.n) AS BIGINT) AS n_events,
           CAST(MAX(f.n) AS BIGINT) AS peak
    FROM filled f JOIN mx m ON m.event_type = f.event_type
    GROUP BY f.event_type
    """,
)
def sparkbar_hourly_events(spark, sf_dir):
    """r9, B21: ClickHouse ``sparkbar(buckets)(x, y)`` — the inline
    unicode activity bar (per-type hourly profile over a dense 24-slot
    grid). Levels are pure integer arithmetic — ``ceil(8·n/max)`` via
    ``(8n + max − 1) // max`` — over exact counts, so both engines pick
    identical block characters; empty slots render as a space.
    Rendering is a JVM higher-order transform over a per-type 24-slot
    map (one groupBy; the dense grid needs no join on the Spark side).

    Scale: per-group state is the fixed 24-slot histogram; one
    partial-aggregable pass."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type", F.hour("ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per = c.groupBy("event_type").agg(
        F.map_from_entries(F.collect_list(F.struct("h", "n"))).alias("m"),
        F.max("n").alias("mx"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    bar = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(23)),
            lambda h: F.when(
                F.coalesce(F.element_at("m", h), F.lit(0)) == 0, F.lit(" ")
            ).otherwise(
                F.substring(
                    F.lit(_SPARKBAR_CHARS),
                    (
                        (F.lit(8) * F.element_at("m", h) + F.col("mx") - 1)
                        / F.col("mx")
                    ).cast("int"),
                    1,
                )
            ),
        ),
    )
    return per.select(
        "event_type",
        bar.alias("bar"),
        "n_events",
        F.col("mx").cast("bigint").alias("peak"),
    )
