"""Round-9 session-3 Tier-B widening: the regression/correlation
corner of ClickHouse's aggregate surface — ``rankCorr`` (Spearman),
``simpleLinearRegression``, ``boundingRatio``, ``deltaSum``/
``deltaSumTimestamp``, and the two contingency-table coefficients next
to cramersV (``contingency``, ``theilsU``) — each as a full-SQL-oracle
driver query.

Reference anchor: the reference's terminal is ClickHouse 24.3.3
(/root/reference/docker-compose.yml:157), whose SELECT surface ships
every one of these; the reference itself delegates all query execution
to that engine (README.md:216-243 runs plain SELECTs against it).

Cross-engine float rules follow queries/registry.py: exact-decimal
sums via dsum, fixed literal op order for double arithmetic, 6dp
rounding only where a transcendental (ln) or final sqrt/division sits.
Rank-based moments exploit that tie-averaged ranks are exact
half-integers: their pairwise products are quarter-integers, so
scale-2 decimal sums are EXACT and order-free in both engines.
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
    "rank_corr_spearman",
    oracle="""
    WITH s AS (
      SELECT value AS x, epoch_us(ts) AS y FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    r AS (
      SELECT
        RANK() OVER (ORDER BY x)
          + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
        RANK() OVER (ORDER BY y)
          + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
      FROM s
    ),
    a AS (
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(rx AS DECIMAL(30,2))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(ry AS DECIMAL(30,2))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(rx * rx AS DECIMAL(30,2))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(ry * ry AS DECIMAL(30,2))) AS DOUBLE) AS syy,
        CAST(SUM(CAST(rx * ry AS DECIMAL(30,2))) AS DOUBLE) AS sxy
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS rank_corr
    FROM a
    """,
)
def rank_corr_spearman(spark, sf_dir):
    """r9, B33: ClickHouse ``rankCorr(x, y)`` — Spearman's rank
    correlation between event value and event time (the monotone-trend
    detector Pearson misses), with the standard tie-averaged ranks.

    Both rank vectors come from the DISTINCT-value tables via the
    two-phase distributed prefix sum (operators/ranks.py — range
    buckets + broadcast offsets; the only unpartitioned window runs
    over the constant-bounded bucket table), then hash-join back to
    rows. Ranks are exact half-integers, so every moment (Σr, Σr²,
    Σrxry — quarter-integer addends) is EXACT via scale-2 decimal sums
    and order-free; only the final Pearson-on-ranks division+sqrt
    rounds (6dp). The oracle uses the textbook RANK() OVER ()
    formulation — identical exact ranks, identical exact moments.

    Scale: two reduced-table rank computations + two broadcast joins +
    one partial-aggregable moment pass; the fact table is never
    globally sorted. Rank-moment headroom: Σr² ≤ n³ needs the decimal
    sum's ~1e36 span, i.e. exact through n ≈ 1e12 rows — beyond that,
    rankCorr wants a sampled estimate anyway (CH's own is exact-rank
    too and hits the same wall in memory far earlier)."""
    from postgre_to_clickhouse_spark.operators.ranks import tie_averaged_ranks

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(F.col("value").alias("x"), F.unix_micros("ts").alias("y"))
    )
    rx = tie_averaged_ranks(
        ev.groupBy("x").agg(F.count(F.lit(1)).alias("c")), "x", "c"
    ).select("x", F.col("avg_rank").alias("rx"))
    ry = tie_averaged_ranks(
        ev.groupBy("y").agg(F.count(F.lit(1)).alias("c")), "y", "c"
    ).select("y", F.col("avg_rank").alias("ry"))
    rows = ev.join(F.broadcast(rx), "x").join(F.broadcast(ry), "y")
    a = rows.agg(
        F.count(F.lit(1)).alias("n"),
        dsum("rx", scale=2, precision=30).alias("sx"),
        dsum("ry", scale=2, precision=30).alias("sy"),
        dsum(F.col("rx") * F.col("rx"), scale=2, precision=30).alias("sxx"),
        dsum(F.col("ry") * F.col("ry"), scale=2, precision=30).alias("syy"),
        dsum(F.col("rx") * F.col("ry"), scale=2, precision=30).alias("sxy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return a.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(num / den, 6).alias("rank_corr"),
    )


@register(
    "simple_linreg_events",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(hour(ts) AS DOUBLE) AS x, value AS y
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    a AS (
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(y AS DECIMAL(30,6))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(x * x AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(x * y AS DECIMAL(30,6))) AS DOUBLE) AS sxy
      FROM s GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept
    FROM a
    """,
)
def simple_linreg_events(spark, sf_dir):
    """r9, B33: ClickHouse ``simpleLinearRegression(x, y)`` — ordinary
    least squares returning (slope, intercept), here fitting event
    value against hour-of-day per event type (the diurnal-trend probe).

    One partial-aggregable pass collects the four moments; x is an
    integer hour so Σx/Σx² are exact, and the y-moments go through
    scale-6 decimal sums (the x·y product's IEEE rounding is identical
    in both engines, the sum is then exact and order-free). slope and
    intercept are scalar arithmetic in a FIXED literal order — the
    intercept re-derives slope from the same subexpression text rather
    than referencing a computed column, so both engines evaluate the
    identical operand tree — rounded at 6dp (one division each).

    Scale: identical plan to any grouped agg — map-side partials, one
    shuffle keyed by the handful of event types."""
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            F.hour("ts").cast("double").alias("x"),
            F.col("value").alias("y"),
        )
    )
    a = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("x", scale=6, precision=30).alias("sx"),
        dsum("y", scale=6, precision=30).alias("sy"),
        dsum(F.col("x") * F.col("x"), scale=6, precision=30).alias("sxx"),
        dsum(F.col("x") * F.col("y"), scale=6, precision=30).alias("sxy"),
    )
    n = F.col("n")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return a.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("intercept"),
    )


@register(
    "bounding_ratio_users",
    oracle="""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS x, value AS y FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    f AS (
      SELECT user_id, x, y,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY x, y) AS rf,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY x DESC, y DESC) AS rl
      FROM s
    ),
    ends AS (
      SELECT user_id,
             MAX(CASE WHEN rf = 1 THEN x END) AS x0,
             MAX(CASE WHEN rf = 1 THEN y END) AS y0,
             MAX(CASE WHEN rl = 1 THEN x END) AS x1,
             MAX(CASE WHEN rl = 1 THEN y END) AS y1,
             COUNT(*) AS n
      FROM f GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n,
           CASE WHEN x1 = x0 THEN NULL
                ELSE ROUND((y1 - y0) / ((x1 - x0) / 3600000000.0), 6)
           END AS bounding_ratio
    FROM ends
    """,
)
def bounding_ratio_users(spark, sf_dir):
    """r9, B33: ClickHouse ``boundingRatio(x, y)`` — the slope of the
    chord between the leftmost and rightmost points, per user over
    (event time, value): the net drift rate bookending a user's
    activity. CH leaves the y at tied extreme x unspecified; both
    sides here fix it deterministically as the (x, y)-lexicographic
    extreme, via ONE struct-min/struct-max aggregate pass (no window,
    no sort — Spark orders structs field-wise, matching the oracle's
    ROW_NUMBER tiebreak). Single-point users yield NULL (x1 = x0).

    The subtraction and division on identical double operands are
    correctly-rounded IEEE (identical in both engines); the ratio is
    expressed per hour (x scaled by the exact literal 3.6e9 µs) and
    rounds at 6dp. Scale: one partial-aggregable groupBy on user_id —
    min/max structs combine map-side."""
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.unix_micros("ts").alias("x"), F.col("value").alias("y"))
    )
    ends = ev.groupBy("user_id").agg(
        F.min(F.struct("x", "y")).alias("lo"),
        F.max(F.struct("x", "y")).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    x0, y0 = F.col("lo.x"), F.col("lo.y")
    x1, y1 = F.col("hi.x"), F.col("hi.y")
    return ends.select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        F.when(x1 == x0, F.lit(None).cast("double"))
        .otherwise(F.round((y1 - y0) / ((x1 - x0) / F.lit(3600000000.0)), 6))
        .alias("bounding_ratio"),
    )


@register(
    "delta_sum_users",
    oracle="""
    WITH o AS (
      SELECT user_id, value,
             LAG(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    )
    SELECT user_id,
           CAST(SUM(CAST(CASE WHEN prev IS NOT NULL AND value > prev
                              THEN value - prev ELSE 0 END
                         AS DECIMAL(30,6))) AS DOUBLE) AS delta_sum,
           COUNT(*) AS n_events
    FROM o GROUP BY user_id
    """,
)
def delta_sum_users(spark, sf_dir):
    """r9, B33: ClickHouse ``deltaSumTimestamp(value, ts)`` — the sum
    of POSITIVE consecutive deltas in timestamp order, per user (the
    counter-increase total that survives resets — CH's idiom for
    monotone-counter metrics). CH's plain ``deltaSum`` depends on
    engine-internal block order; the Timestamp variant pins the order,
    and (ts, event_id) makes it total here, so both engines walk the
    identical sequence. Each delta is one IEEE subtraction of
    identical operands (engine-identical); the positive deltas then
    sum EXACTLY via scale-6 decimals, so the result is order-free.

    Scale: one window partitioned by user (hash-shuffled, no
    single-partition window) + one partial-aggregable groupBy."""
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "value", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.withColumn("prev", F.lag("value").over(w))
    delta = F.when(
        F.col("prev").isNotNull() & (F.col("value") > F.col("prev")),
        F.col("value") - F.col("prev"),
    ).otherwise(F.lit(0.0))
    return o.groupBy("user_id").agg(
        dsum(delta, scale=6, precision=30).alias("delta_sum"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "contingency_theils_u",
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
    ha AS (
      SELECT -SUM(CAST(ra AS DOUBLE) / n * LN(CAST(ra AS DOUBLE) / n))
               AS h_a
      FROM rt CROSS JOIN n
    ),
    hab AS (
      SELECT -SUM(CAST(o AS DOUBLE) / n * LN(CAST(o AS DOUBLE) / cb))
               AS h_a_given_b
      FROM cell JOIN ct USING (b) CROSS JOIN n
    )
    SELECT CAST(n.n AS BIGINT) AS n,
           ROUND(SQRT(chi.chi2 / (chi.chi2 + n.n)), 6) AS contingency_coef,
           ROUND((ha.h_a - hab.h_a_given_b) / ha.h_a, 6) AS theils_u
    FROM chi, n, ha, hab
    """,
)
def contingency_theils_u(spark, sf_dir):
    """r9, B33: ClickHouse ``contingency(a, b)`` and ``theilsU(a, b)``
    — the two remaining contingency-table association coefficients
    next to cramersV, over the same event_type × day-of-week cells.
    Pearson's contingency coefficient is sqrt(χ²/(χ²+n)); Theil's U is
    the uncertainty coefficient (H(a) − H(a|b)) / H(a) — how much of
    the event-type entropy the weekday explains, asymmetric by
    definition (U(a|b) here, CH's argument order).

    χ² terms are doubles in a fixed literal order cast to decimal so
    their sum is order-free (the cramersV treatment); the entropy sums
    run over the category-bounded marginal/cell tables (≤ 7 and ≤ 35
    addends) with ln on identical double operands, rounded at 6dp per
    the registry's transcendental rule. Scale: ONE fact-table scan
    builds the 35-cell table; everything downstream is
    category-bounded with broadcast marginal joins."""
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
    pa = F.col("ra").cast("double") / F.col("n")
    ha = rt.crossJoin(F.broadcast(n)).agg((-F.sum(pa * F.log(pa))).alias("h_a"))
    po = F.col("o").cast("double") / F.col("n")
    hab = (
        cell.join(F.broadcast(ct), "b")
        .crossJoin(F.broadcast(n))
        .agg(
            (
                -F.sum(po * F.log(F.col("o").cast("double") / F.col("cb")))
            ).alias("h_a_given_b")
        )
    )
    return (
        chi.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hab))
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.round(F.sqrt(F.col("chi2") / (F.col("chi2") + F.col("n"))), 6).alias(
                "contingency_coef"
            ),
            F.round(
                (F.col("h_a") - F.col("h_a_given_b")) / F.col("h_a"), 6
            ).alias("theils_u"),
        )
    )


@register(
    "categorical_iv_weekday",
    oracle="""
    WITH cell AS (
      SELECT dayofweek(ts) AS b,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n1,
             COUNT(CASE WHEN event_type != 'purchase' THEN 1 END) AS n0
      FROM events GROUP BY dayofweek(ts)
    ),
    tot AS (SELECT SUM(n1) AS t1, SUM(n0) AS t0 FROM cell)
    SELECT b, CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           ROUND(LN((CAST(n1 AS DOUBLE) / t1) / (CAST(n0 AS DOUBLE) / t0)),
                 6) AS woe,
           ROUND((CAST(n1 AS DOUBLE) / t1 - CAST(n0 AS DOUBLE) / t0)
                 * LN((CAST(n1 AS DOUBLE) / t1) / (CAST(n0 AS DOUBLE) / t0)),
                 6) AS iv_term
    FROM cell CROSS JOIN tot
    WHERE n0 > 0 AND n1 > 0
    """,
)
def categorical_iv_weekday(spark, sf_dir):
    """r9, B33: ClickHouse ``categoricalInformationValue(cat, tag)`` —
    the weight-of-evidence / information-value decomposition credit
    scoring uses, here scoring how predictive the weekday is of a
    purchase (tag = event_type == 'purchase'). Emitted per category:
    WOE = ln((n1/t1)/(n0/t0)) and its IV contribution
    (n1/t1 − n0/t0)·WOE; the total IV is the sum of the emitted terms
    (left to the caller — per-category rows are the richer surface).
    Categories where either class is empty are excluded in both
    engines (WOE is undefined there — CH returns 0; this engine
    surfaces the defined rows only, the stricter contract).

    One fact scan collapses to the 7-cell class-count table; the class
    totals aggregate THE CELLS (broadcast back); ln on identical
    double operands rounds at 6dp per the registry's transcendental
    rule. Scale: identical to any grouped agg + broadcast."""
    ev = _t(spark, sf_dir, "events")
    is1 = (F.col("event_type") == "purchase").cast("int")
    cell = ev.groupBy((F.dayofweek("ts") - 1).alias("b")).agg(
        F.sum(is1).alias("n1"),
        F.sum(1 - is1).alias("n0"),
    )
    tot = cell.agg(F.sum("n1").alias("t1"), F.sum("n0").alias("t0"))
    p1 = F.col("n1").cast("double") / F.col("t1")
    p0 = F.col("n0").cast("double") / F.col("t0")
    woe = F.log(p1 / p0)
    return (
        cell.crossJoin(F.broadcast(tot))
        .where((F.col("n0") > 0) & (F.col("n1") > 0))
        .select(
            "b",
            F.col("n0").cast("bigint").alias("n0"),
            F.col("n1").cast("bigint").alias("n1"),
            F.round(woe, 6).alias("woe"),
            F.round((p1 - p0) * woe, 6).alias("iv_term"),
        )
    )


@register(
    "series_period_events",
    oracle="""
    WITH bounds AS (
      SELECT epoch_us(date_trunc('hour', MIN(ts))) // 3600000000 AS h0,
             epoch_us(date_trunc('hour', MAX(ts))) // 3600000000 AS h1
      FROM events
    ),
    grid AS (
      SELECT UNNEST(generate_series(h0, h1)) AS h FROM bounds
    ),
    cnt AS (
      SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
             COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    series AS (
      SELECT g.h - b.h0 AS i, COALESCE(cnt.c, 0) AS c
      FROM grid g CROSS JOIN bounds b LEFT JOIN cnt ON cnt.h = g.h
    ),
    periods AS (SELECT UNNEST(generate_series(2, 48)) AS t),
    phased AS (
      SELECT t, i % t AS phase, SUM(c) AS cp, COUNT(*) AS np
      FROM series CROSS JOIN periods GROUP BY t, i % t
    ),
    tots AS (SELECT SUM(c) AS ctot, COUNT(*) AS n FROM series),
    scored AS (
      SELECT t,
             CAST(SUM(CAST(CAST(cp * cp AS DOUBLE) / np
                           AS DECIMAL(30,8))) AS DOUBLE)
               - CAST(ctot AS DOUBLE) * ctot / n AS score
      FROM phased CROSS JOIN tots GROUP BY t, ctot, n
    )
    SELECT CAST(t AS BIGINT) AS period, ROUND(score, 6) AS score
    FROM scored ORDER BY score DESC, t ASC LIMIT 1
    """,
)
def series_period_events(spark, sf_dir):
    """r9, B21: ClickHouse ``seriesPeriodDetectFFT`` parity — dominant
    period of the hourly event-count series, detected by EXACT
    phase-folding ANOVA instead of an FFT: for each candidate period T
    (2..48 h), fold the dense hourly grid to phases i mod T and score
    the between-phase sum of squares Σ cp²/np − C²/N (cp, np integer
    phase sums/sizes). The argmax over T is the dominant period — the
    same quantity the FFT periodogram peaks at for grid-aligned
    periods, chosen here because the folding scorer is EXACTLY
    portable across engines (integer cp² with one division per phase,
    decimal-cast order-free sum) while FFT butterflies accumulate
    engine-specific rounding. Deliberate-substitution note: a true
    FFT path belongs in an Arrow mapInPandas stage when off-grid
    periods matter; the reference's terminal 24.3 added the series*
    family as experimental.

    Shape: dense grid from one bounds agg (the timeseries_gap_fill
    pattern), counts groupBy, a 47-way candidate explode of the
    REDUCED per-(T, phase) table — fact rows are touched once; the
    scored table is 47 rows. Ties break to the smaller T in both
    engines (struct max on (score, -T))."""
    ev = _t(spark, sf_dir, "events")
    hour_i = (F.unix_micros(F.date_trunc("HOUR", F.col("ts"))) / F.lit(3600000000)).cast(
        "bigint"
    )
    cnt = ev.groupBy(hour_i.alias("h")).agg(F.count(F.lit(1)).alias("c"))
    bounds = ev.agg(
        F.min(hour_i).alias("h0"), F.max(hour_i).alias("h1")
    )
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1")).alias("h"), "h0"
    )
    series = (
        grid.join(cnt, "h", "left")
        .select(
            (F.col("h") - F.col("h0")).alias("i"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    phased = (
        series.select(
            F.explode(F.sequence(F.lit(2), F.lit(48))).alias("t"), "i", "c"
        )
        .groupBy("t", (F.col("i") % F.col("t")).alias("phase"))
        .agg(F.sum("c").alias("cp"), F.count(F.lit(1)).alias("np"))
    )
    tots = series.agg(
        F.sum("c").alias("ctot"), F.count(F.lit(1)).alias("n")
    )
    scored = (
        phased.crossJoin(F.broadcast(tots))
        .groupBy("t", "ctot", "n")
        .agg(
            F.sum(
                ((F.col("cp") * F.col("cp")).cast("double") / F.col("np"))
                .cast("decimal(30,8)")
            )
            .cast("double")
            .alias("ss")
        )
        .select(
            "t",
            (
                F.col("ss")
                - F.col("ctot").cast("double") * F.col("ctot") / F.col("n")
            ).alias("score"),
        )
    )
    best = scored.agg(
        F.max(F.struct(F.col("score").alias("score"), (-F.col("t")).alias("nt"))).alias("b")
    )
    return best.select(
        (-F.col("b.nt")).cast("bigint").alias("period"),
        F.round(F.col("b.score"), 6).alias("score"),
    )
