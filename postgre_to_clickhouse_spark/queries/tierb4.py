"""Tier B round-5 additions: ClickHouse aggregate-parity extras —
``quantileExactWeighted`` and the ``argMax``/``argMin`` family, both as
deterministic window/aggregate compositions with full SQL oracles.

Reference context: these are staples of the ClickHouse endpoint the
reference lands data in (`/root/reference/README.md:176-177`); Spark
has no built-in weighted exact quantile, so it is composed from a
cumulative-weight window — the textbook definition ClickHouse
implements natively.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.queries.registry import register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


@register(
    "weighted_quantile_events",
    oracle="""
    WITH w AS (
      SELECT event_type, value, user_id % 5 + 1 AS wt FROM events
    ),
    cum AS (
      SELECT event_type, value, wt,
             sum(wt) OVER (PARTITION BY event_type ORDER BY value, wt
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             sum(wt) OVER (PARTITION BY event_type) AS tw
      FROM w
    )
    SELECT event_type,
           min(CASE WHEN CAST(cw AS DOUBLE) >= 0.5 * CAST(tw AS DOUBLE)
                    THEN value END) AS wmedian,
           min(CASE WHEN CAST(cw AS DOUBLE) >= 0.9 * CAST(tw AS DOUBLE)
                    THEN value END) AS wp90
    FROM cum GROUP BY event_type
    """,
)
def weighted_quantile_events(spark, sf_dir):
    """ClickHouse ``quantileExactWeighted`` parity: the smallest value
    whose cumulative weight reaches q x total weight, per event type
    (weight = a deterministic per-row integer). One per-group window
    for the running weight + one aggregate — the exact-weighted
    definition, no sampling. Ordering ties broken by (value, wt) so the
    cumulative sums are identical across engines. At 100 TB the window
    sorts per group; for heavy groups switch to the two-pass histogram
    cut (bucket counts -> locate quantile bucket -> rescan bucket)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "value", (F.col("user_id") % 5 + 1).alias("wt")
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("value", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ev.select(
        "event_type",
        "value",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(Window.partitionBy("event_type")).alias("tw"),
    )
    pick = lambda q: F.min(  # noqa: E731 — tiny local combinator
        F.when(F.col("cw").cast("double") >= q * F.col("tw").cast("double"), F.col("value"))
    )
    return cum.groupBy("event_type").agg(
        pick(0.5).alias("wmedian"), pick(0.9).alias("wp90")
    )


@register(
    "argminmax_events",
    oracle="""
    WITH ranked AS (
      SELECT event_type, user_id, value, ts,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id DESC) AS rmax,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rmin
      FROM events
    )
    SELECT event_type,
           max(CASE WHEN rmax = 1 THEN user_id END) AS argmax_user,
           max(CASE WHEN rmax = 1 THEN value END) AS max_value,
           max(CASE WHEN rmin = 1 THEN user_id END) AS argmin_user,
           max(CASE WHEN rmin = 1 THEN value END) AS min_value
    FROM ranked GROUP BY event_type
    """,
)
def argminmax_events(spark, sf_dir):
    """ClickHouse ``argMax``/``argMin`` parity: the user attached to the
    extreme value per event type. ClickHouse leaves ties undefined; this
    engine fixes them by event_id so the answer is total and engine-
    checkable. Two rank windows + one aggregate; at scale the same
    result comes from a max_by on a (value, event_id) struct — a
    partial-aggregable shape with no window (the `latest` CDC operator
    is exactly that form); the window form here keeps the oracle
    trivially parallel."""
    ev = _t(spark, sf_dir, "events")
    wmax = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id").desc())
    wmin = Window.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    ranked = ev.select(
        "event_type",
        "user_id",
        "value",
        F.row_number().over(wmax).alias("rmax"),
        F.row_number().over(wmin).alias("rmin"),
    )
    return ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rmax") == 1, F.col("user_id"))).alias("argmax_user"),
        F.max(F.when(F.col("rmax") == 1, F.col("value"))).alias("max_value"),
        F.max(F.when(F.col("rmin") == 1, F.col("user_id"))).alias("argmin_user"),
        F.max(F.when(F.col("rmin") == 1, F.col("value"))).alias("min_value"),
    )


@register(
    "timeseries_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT min(date_trunc('hour', ts)) AS lo, max(date_trunc('hour', ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds),
                                      INTERVAL 1 HOUR)) AS h
      ) g
    )
    SELECT g.event_type, CAST(g.h AS TIMESTAMP) AS hour_ts,
           CAST(coalesce(hy.n, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN hourly hy ON g.event_type = hy.event_type AND g.h = hy.h
    """,
)
def timeseries_gap_fill(spark, sf_dir):
    """ClickHouse ``ORDER BY ... WITH FILL`` parity: a dense hourly
    series per event type over the table's [min, max] hour range, empty
    hours filled with zero — dashboards break on sparse series, so the
    endpoint engine fills the grid. The calendar is a one-row
    min/max aggregate exploded into a sequence (rows = hours x types,
    data-independent), cross-joined with the distinct type list and
    left-joined against the real hourly rollup — the fact table is
    touched once. At 100 TB partition pruning bounds the scan by the
    dashboard's time window, and the grid stays tiny regardless."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(
        F.min(F.date_trunc("hour", "ts")).alias("lo"),
        F.max(F.date_trunc("hour", "ts")).alias("hi"),
    )
    grid_hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(grid_hours))
    return grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        F.col("h").alias("hour_ts"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
    )


@register(
    "uniq_merge_rollup",
    oracle="""
    SELECT event_type AS scope,
           CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS scope, CAST(count(DISTINCT user_id) AS BIGINT)
    FROM events
    """,
)
def uniq_merge_rollup(spark, sf_dir):
    """ClickHouse ``uniqState``/``uniqMerge`` (AggregatingMergeTree)
    parity on Spark's Datasketches HLL: per-type sketches built ONCE,
    and the corpus-wide distinct computed by MERGING those states —
    never rescanning the fact table. That is the materialized-view
    pattern the endpoint engine runs: store uniqState per partition
    key, uniqMerge at query time for any rollup.

    Sketch updates are commutative/idempotent (per-register max), so
    the result is layout-independent; at the fixtures' cardinality the
    Datasketches HLL sits in its exact sparse regime, making the full
    SQL oracle an equality check (the approximate regime's 3%% bound
    and merge==whole determinism are pytest-gated at 100k ids)."""
    ev = _t(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    per = sk.select(
        F.col("event_type").alias("scope"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("uniq_users"),
    )
    total = sk.agg(F.hll_union_agg("sk").alias("u")).select(
        F.lit("__all__").alias("scope"),
        F.hll_sketch_estimate("u").cast("bigint").alias("uniq_users"),
    )
    return per.unionByName(total)


@register(
    "approx_topk_weighted_tokens",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS tok,
             d.doc_id % 7 + 1 AS wt
      FROM documents d
    ),
    c AS (SELECT tok, CAST(sum(wt) AS BIGINT) AS mass FROM toks GROUP BY tok),
    r AS (
      SELECT CAST(row_number() OVER (ORDER BY mass DESC, tok) AS BIGINT) AS rank,
             tok, mass
      FROM c
    )
    SELECT rank, tok, mass AS mass_lb, mass AS mass_ub FROM r WHERE rank <= 15
    """,
)
def approx_topk_weighted_tokens(spark, sf_dir):
    """ClickHouse ``topKWeighted`` parity: heaviest tokens by a per-row
    integer weight (doc_id-derived here; bytes/tokens/importance in a
    real pipeline) through the same bounded-communication summary merge
    as ``approx_topk_tokens`` — mass instead of count, identical
    [lb, ub] guarantee structure, exact regime for the SQL oracle."""
    from postgre_to_clickhouse_spark.operators.sketch import approx_topk, tokens_of

    d = _t(spark, sf_dir, "documents")
    toks = d.select(tokens_of(d).alias("item"), (F.col("doc_id") % 7 + 1).alias("wt"))
    out = approx_topk(toks, "item", k=15, capacity=4096, weight_col="wt")
    return out.select(
        "rank",
        F.col("item").alias("tok"),
        F.col("lb").alias("mass_lb"),
        F.col("ub").alias("mass_ub"),
    )


@register(
    "cohort_retention_matrix",
    oracle="""
    WITH a AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
      FROM events
    ),
    f AS (SELECT user_id, MIN(d) AS cohort_day FROM a GROUP BY user_id)
    SELECT f.cohort_day,
           COUNT(DISTINCT f.user_id) AS cohort_users,
           COUNT(DISTINCT CASE WHEN a.d = f.cohort_day + INTERVAL 1 DAY
                 THEN a.user_id END) AS retained_d1,
           COUNT(DISTINCT CASE WHEN a.d = f.cohort_day + INTERVAL 7 DAY
                 THEN a.user_id END) AS retained_d7
    FROM f JOIN a USING (user_id)
    GROUP BY f.cohort_day
    """,
)
def cohort_retention_matrix(spark, sf_dir):
    """r6, B21: the cohort-retention MATRIX (day-N retention per
    acquisition cohort) — the workload ClickHouse's ``retention``
    aggregate exists for, here as the full per-cohort table instead of
    one global row. Users cohort by first active day; retained_dN
    counts distinct users active exactly N days later.

    Scale shape: the raw table reduces to distinct (user, day) pairs
    FIRST (shuffle on user_id; days-per-user is bounded), the cohort
    day is a groupBy on the same key (co-partitioned join back), and
    the final matrix groupBy touches one row per (user, active-day) —
    never raw events twice."""
    ev = _t(spark, sf_dir, "events")
    a = ev.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct()
    f = a.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    j = a.join(f, "user_id")
    day = lambda n: F.col("cohort_day") + F.expr(f"INTERVAL {n} DAY")  # noqa: E731
    return j.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("cohort_users"),
        F.countDistinct(F.when(F.col("d") == day(1), F.col("user_id"))).alias("retained_d1"),
        F.countDistinct(F.when(F.col("d") == day(7), F.col("user_id"))).alias("retained_d7"),
    )


@register(
    "group_array_events",
    oracle="""
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS event_seq,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def group_array_events(spark, sf_dir):
    """r6, B20: ClickHouse ``groupArray`` + ``arrayStringConcat`` — the
    per-entity ordered event sequence (the input shape for journey
    mining / markov-chain session analysis). Collected with a total
    (ts, event_id) order so the sequence is deterministic, emitted as a
    string both engines agree on byte-for-byte.

    Scale: one groupBy on user_id; per-user arrays are bounded by
    per-entity activity (the same bound every sessionize/funnel
    operator here already relies on), and nothing global sorts."""
    ev = _t(spark, sf_dir, "events")
    seq = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
        lambda s: s["event_type"],
    )
    return ev.groupBy("user_id").agg(
        F.concat_ws(">", seq).alias("event_seq"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "quantile_sketch_events",
    oracle="""
    WITH c AS (
      SELECT event_type, value, COUNT(*) AS w
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, value
    ),
    cum AS (
      SELECT event_type, value,
             SUM(w) OVER (PARTITION BY event_type ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY event_type) AS tw
      FROM c
    )
    SELECT event_type,
           MIN(CASE WHEN CAST(cw AS DOUBLE) >= 0.5 * CAST(tw AS DOUBLE)
                    THEN value END) AS q50,
           MIN(CASE WHEN CAST(cw AS DOUBLE) >= 0.9 * CAST(tw AS DOUBLE)
                    THEN value END) AS q90,
           MIN(CASE WHEN CAST(cw AS DOUBLE) >= 0.99 * CAST(tw AS DOUBLE)
                    THEN value END) AS q99
    FROM cum GROUP BY event_type
    """,
)
def quantile_sketch_events(spark, sf_dir):
    """r6, B20: mergeable quantile STATES (the ClickHouse
    ``quantileState``/``quantileTDigest`` pattern, completing the
    mergeable-state family next to uniqState-HLL and topK-SpaceSaving):
    per-partition rank-preserving summaries built independently, merged
    by concatenation (≤ partitions × capacity rows ever move), then
    finalized with the quantileExactWeighted rule. At fixture scale
    every partition's distinct set fits the capacity, so the summary is
    EXACT and the oracle recomputes the same quantiles from raw events;
    the truncated regime's rank-error bound is pytest-asserted
    (tests/test_operators.py)."""
    from postgre_to_clickhouse_spark.operators.sketch import (
        quantile_summaries,
        quantiles_from_summaries,
    )

    ev = _t(spark, sf_dir, "events")
    s = quantile_summaries(ev, "value", group_cols=("event_type",))
    return quantiles_from_summaries(
        s, [0.5, 0.9, 0.99], group_cols=("event_type",), out_names=["q50", "q90", "q99"]
    )


@register(
    "array_cumsum_diff_compact",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             list(CAST(round(value * 100) AS BIGINT) ORDER BY ts, event_id) AS l
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id,
           array_to_string(list_transform(range(1, len(l) + 1),
             i -> list_sum(l[1:i])), ',') AS cumsum_csv,
           array_to_string(list_transform(range(1, len(l) + 1),
             i -> CASE WHEN i = 1 THEN 0 ELSE l[i] - l[i-1] END), ',')
             AS diff_csv,
           array_to_string(list_transform(
             list_filter(range(1, len(l) + 1),
                         i -> i = 1 OR l[i] != l[i-1]),
             i -> l[i]), ',') AS compact_csv
    FROM seq
    """,
)
def array_cumsum_diff_compact(spark, sf_dir):
    """r6, B17/B20: ClickHouse ``arrayCumSum`` / ``arrayDifference`` /
    ``arrayCompact`` over each user's purchase-amount sequence
    (amounts as exact integer cents via a half-up decimal cast, so
    every array op is integer-exact). One groupBy builds the ordered
    sequence; the three array transforms are per-row JVM higher-order
    functions; results emit as CSV strings so the driver's pandas
    canonicalization never sees array cells. Differences follow the
    ClickHouse convention (first element 0)."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    seq = (
        ev.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts", "event_id", cents.alias("v")))),
                lambda s: s["v"],
            ).alias("l")
        )
    )
    idx = F.sequence(F.lit(1), F.size("l"))
    cumsum = F.transform(idx, lambda i: F.aggregate(
        F.slice("l", 1, i), F.lit(0).cast("bigint"), lambda a, x: a + x
    ))
    diff = F.transform(idx, lambda i: F.when(i == 1, F.lit(0).cast("bigint")).otherwise(
        F.element_at("l", i) - F.element_at("l", i - 1)
    ))
    compact = F.transform(
        F.filter(idx, lambda i: (i == 1) | (F.element_at("l", i) != F.element_at("l", i - 1))),
        lambda i: F.element_at("l", i),
    )
    return seq.select(
        "user_id",
        F.concat_ws(",", cumsum).alias("cumsum_csv"),
        F.concat_ws(",", diff).alias("diff_csv"),
        F.concat_ws(",", compact).alias("compact_csv"),
    )


@register(
    "moving_agg_events",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, value,
             row_number() OVER w AS rn,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum5,
             CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS w_n,
             CAST(value AS DECIMAL(18,2))
               - lag(CAST(value AS DECIMAL(18,2))) OVER w AS delta
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, mov_sum5,
           mov_sum5 / w_n AS mov_avg5,
           CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE CAST(0.00 AS DECIMAL(18,2)) END)
                OVER (PARTITION BY user_id ORDER BY rn
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS delta_sum
    FROM o
    """,
)
def moving_agg_events(spark, sf_dir):
    """r6, B10/B21: ClickHouse ``groupArrayMovingSum``/``MovingAvg``
    (5-row window) and ``deltaSum`` (running sum of POSITIVE steps of
    the time-ordered series) per user — all in one window pass over
    (ts, event_id) order. Sums are exact decimals so frame-order and
    segment-tree evaluation differences between engines cannot perturb
    a bit; the avg divides the exact sum by the frame count in double.

    Scale: one shuffle on user_id; every window is per-user (bounded
    partitions), nothing global."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dec = F.col("value").cast("decimal(18,2)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w5 = w.rowsBetween(-4, 0)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    delta = dec - F.lag(dec).over(w)
    pos_delta = F.when(delta > 0, delta).otherwise(F.lit("0.00").cast("decimal(18,2)"))
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec).over(w5).cast("double").alias("mov_sum5"),
        (F.sum(dec).over(w5).cast("double") / F.count(F.lit(1)).over(w5)).alias("mov_avg5"),
        F.sum(pos_delta).over(wcum).cast("double").alias("delta_sum"),
    )


@register(
    "entropy_user_event_types",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    t AS (SELECT user_id, sum(n) AS total FROM c GROUP BY user_id)
    SELECT c.user_id,
           CAST((SELECT count(*) FROM c c2 WHERE c2.user_id = c.user_id) AS BIGINT)
             AS n_types,
           round(-sum((CAST(n AS DOUBLE) / t.total)
                      * ln(CAST(n AS DOUBLE) / t.total) / ln(2)), 6) AS entropy_r
    FROM c JOIN t USING (user_id)
    GROUP BY c.user_id, t.total
    """,
)
def entropy_user_event_types(spark, sf_dir):
    """r6, B21: ClickHouse ``entropy()`` aggregate — Shannon entropy
    (bits) of each user's event-type distribution, the
    behavioral-diversity signal (bots cluster near 0). Two-phase
    shape: (user, type) counts collapse map-side, the per-user reduce
    touches one row per distinct type. ln is computed on identical
    double operands in both engines and rounded to 6dp (the registry's
    transcendental rule)."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).cast("bigint").alias("n_types")
    )
    p = F.col("n").cast("double") / F.col("total").cast("double")
    return (
        c.join(t, "user_id")
        .groupBy("user_id", "n_types")
        .agg(F.round(-F.sum(p * F.log(p) / F.log(F.lit(2.0))), 6).alias("entropy_r"))
        .select("user_id", "n_types", "entropy_r")
    )


@register(
    "agg_combinators_events",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, value, ts,
             first_value(value) OVER w AS first_v,
             last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS purchase_cnt,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2)))
             FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE) AS purchase_sum,
           CAST(LEAST(count(DISTINCT event_type), 4) AS BIGINT) AS types_upto_3,
           CAST(max(last_v) - max(first_v) AS DOUBLE)
             / (epoch_us(max(ts)) - epoch_us(min(ts)) + 1) AS bounding_ratio
    FROM o
    GROUP BY user_id
    """,
)
def agg_combinators_events(spark, sf_dir):
    """r6, B21: ClickHouse aggregate-combinator parity in one pass —
    ``countIf``/``sumIf`` (conditional aggregates; the sum stays exact
    decimal), ``uniqUpTo(3)`` (distinct count capped at N+1 — the
    bounded-state cardinality guard), and ``boundingRatio`` (Δvalue/Δt
    between the first and last event by (ts, event_id) order, +1 µs so
    single-event users divide exactly instead of by zero). One groupBy,
    all JVM expressions, every branch engine-exact."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    is_p = F.col("event_type") == "purchase"
    dec = F.col("value").cast("decimal(18,2)")
    okey = F.struct("ts", "event_id")
    us = F.unix_micros
    return ev.groupBy("user_id").agg(
        F.count(F.when(is_p, 1)).cast("bigint").alias("purchase_cnt"),
        F.coalesce(F.sum(F.when(is_p, dec)), F.lit("0").cast("decimal(18,2)"))
        .cast("double")
        .alias("purchase_sum"),
        F.least(F.countDistinct("event_type"), F.lit(4)).cast("bigint").alias("types_upto_3"),
        (
            (F.max_by("value", okey) - F.min_by("value", okey)).cast("double")
            / (us(F.max("ts")) - us(F.min("ts")) + 1)
        ).alias("bounding_ratio"),
    )


@register(
    "timeseries_forward_fill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT CAST(min(date_trunc('hour', ts)) AS TIMESTAMP) AS lo,
             CAST(max(date_trunc('hour', ts)) AS TIMESTAMP) AS hi
      FROM events
    ),
    grid AS (
      SELECT t.event_type, CAST(g.h AS TIMESTAMP) AS h
      FROM (SELECT DISTINCT event_type FROM events) t, (
        SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds),
                                      INTERVAL 1 HOUR)) AS h) g
    )
    SELECT g.event_type, g.h AS hour_ts,
           last_value(hourly.v IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           CAST(hourly.v IS NULL AS BOOLEAN) AS was_filled
    FROM grid g LEFT JOIN hourly
      ON hourly.event_type = g.event_type AND hourly.h = g.h
    """,
)
def timeseries_forward_fill(spark, sf_dir):
    """r6, B20: gap filling by LAST-OBSERVATION-CARRIED-FORWARD (the
    fill-forward mode of ClickHouse ``WITH FILL`` / TSDB ``locf``,
    complementing `timeseries_gap_fill`'s zero-fill): the dense per-type
    hourly grid takes each empty hour's value from the most recent
    observed hour (null before the first observation). One fact scan;
    the fill window runs over the grid (types × hours — data-
    independent), not the facts."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"))
    )
    bounds = ev.agg(
        F.min(F.date_trunc("hour", "ts")).alias("lo"),
        F.max(F.date_trunc("hour", "ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = grid.join(hourly, ["event_type", "h"], "left")
    return j.select(
        "event_type",
        F.col("h").alias("hour_ts"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNull().alias("was_filled"),
    )


@register(
    "dau_wau_stickiness",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM daily)
    SELECT days.d AS day_ts,
           CAST(count(DISTINCT CASE WHEN daily.d = days.d
                 THEN daily.user_id END) AS BIGINT) AS dau,
           CAST(count(DISTINCT daily.user_id) AS BIGINT) AS wau,
           round(CAST(count(DISTINCT CASE WHEN daily.d = days.d
                   THEN daily.user_id END) AS DOUBLE)
                 / count(DISTINCT daily.user_id), 6) AS stickiness_r
    FROM days JOIN daily
      ON daily.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    """,
)
def dau_wau_stickiness(spark, sf_dir):
    """r6, B21: DAU/WAU stickiness — per day, distinct actives that day
    over distinct actives in the trailing 7 days (the engagement ratio
    every product-analytics ClickHouse deployment computes). The fact
    table reduces to distinct (day, user) FIRST (days-per-user
    bounded), then a 7-day band join against the day grid counts both
    cardinalities in one aggregation. At 100 TB the trailing-window
    distinct becomes mergeable HLL states per day unioned over the
    window (`uniq_merge_rollup`'s mechanism) instead of the exact
    band join — documented trade, exact here."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    days = daily.select("d").distinct().withColumnRenamed("d", "day_ts")
    j = days.join(
        daily,
        (F.col("d") >= F.col("day_ts") - F.expr("INTERVAL 6 DAY"))
        & (F.col("d") <= F.col("day_ts")),
    )
    return j.groupBy("day_ts").agg(
        F.countDistinct(F.when(F.col("d") == F.col("day_ts"), F.col("user_id")))
        .cast("bigint")
        .alias("dau"),
        F.countDistinct("user_id").cast("bigint").alias("wau"),
        F.round(
            F.countDistinct(
                F.when(F.col("d") == F.col("day_ts"), F.col("user_id"))
            ).cast("double")
            / F.countDistinct("user_id"),
            6,
        ).alias("stickiness_r"),
    )


@register(
    "time_to_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.first_view, p.first_purchase,
           epoch_us(p.first_purchase) - epoch_us(v.first_view) AS delta_us
    FROM v JOIN p USING (user_id)
    """,
)
def time_to_conversion(spark, sf_dir):
    """r6, B21: conversion-lag attribution — each user's first view and
    the first purchase AT-or-after it, with the integer-µs lag (the
    input to every time-to-convert funnel distribution). Two bounded
    aggregations on the same user key (co-partitioned join, no
    re-shuffle of facts beyond the per-user reduce); deltas are exact
    integers."""
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("first_view")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(p, "user_id")
        .select(
            "user_id",
            "first_view",
            "first_purchase",
            (F.unix_micros("first_purchase") - F.unix_micros("first_view")).alias("delta_us"),
        )
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, count(*) AS n FROM o
      WHERE to_type IS NOT NULL GROUP BY from_type, to_type
    ),
    t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY from_type)
    SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
           round(CAST(c.n AS DOUBLE) / t.tot, 6) AS p_r
    FROM c JOIN t USING (from_type)
    """,
)
def event_transition_matrix(spark, sf_dir):
    """r6, B21: first-order Markov transition matrix over user event
    timelines — what ClickHouse's ``sequenceNextNode`` family answers
    ("after a view, what happens next, how often"). One lead() window
    per user (bounded partitions) then two vocabulary-bounded
    aggregations; probabilities are counts over exact totals, rounded
    per the transcendental-free registry rule (pure division of
    identical operands)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = o.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        c.join(t, "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("p_r"),
        )
    )


@register(
    "limit_by_user_events",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, event_id, ts, event_type,
           CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn BETWEEN 2 AND 3
    """,
)
def limit_by_user_events(spark, sf_dir):
    """r7, B11 extension: ClickHouse ``LIMIT n OFFSET m BY key`` — the
    per-group limit CLAUSE (here: events 2..3 per user in (ts,
    event_id) order, i.e. ``LIMIT 2 OFFSET 1 BY user_id``). The plain
    top-n-per-group (`window_top3_orders_per_customer`) is subsumed;
    the OFFSET flavor is what that query does NOT cover. Spark shape:
    one row_number window filtered to the (offset, offset+n] band —
    Spark 4's WindowGroupLimit pushes the rank filter into a PARTIAL
    per-partition top-(m+n) before the shuffle, so the exchange carries
    at most m+n rows per (partition, user), not the whole event
    history. Deterministic total order (ts, event_id)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    n, off = 2, 1
    return (
        ev.select(
            "user_id", "event_id", "ts", "event_type",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter((F.col("rn") > off) & (F.col("rn") <= off + n))
    )


@register(
    "timeseries_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT CAST(min(date_trunc('hour', ts)) AS TIMESTAMP) AS lo,
             CAST(max(date_trunc('hour', ts)) AS TIMESTAMP) AS hi
      FROM events
    ),
    grid AS (
      SELECT t.event_type, CAST(g.h AS TIMESTAMP) AS h
      FROM (SELECT DISTINCT event_type FROM events) t, (
        SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds),
                                      INTERVAL 1 HOUR)) AS h) g
    ),
    ctx AS (
      SELECT g.event_type, g.h, hourly.v,
             last_value(hourly.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN hourly.v IS NOT NULL THEN g.h END
                        IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             first_value(hourly.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN hourly.v IS NOT NULL THEN g.h END
                         IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM grid g LEFT JOIN hourly
        ON hourly.event_type = g.event_type AND hourly.h = g.h
    )
    SELECT event_type, h AS hour_ts,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                  pv + (nv - pv) * (CAST(date_diff('hour', ph, h) AS DOUBLE)
                                    / CAST(date_diff('hour', ph, nh) AS DOUBLE))
                ELSE NULL END AS v_interp,
           CAST(v IS NULL AS BOOLEAN) AS was_filled
    FROM ctx
    """,
)
def timeseries_interpolate(spark, sf_dir):
    """r7, B20 completion: ClickHouse ``ORDER BY ... WITH FILL
    INTERPOLATE`` — LINEAR interpolation between observed points on the
    dense hourly grid (zero-fill and locf modes are
    `timeseries_gap_fill` / `timeseries_forward_fill`; this is the
    third fill mode). Empty hours take
    ``prev + (next-prev) * Δh_prev/Δh_span``; hours before the first or
    after the last observation stay NULL. Float determinism: the
    bracketing values are exact decimal-sum doubles, the hour offsets
    are exact integers cast to double, and BOTH engines evaluate the
    identical expression tree of IEEE-correctly-rounded ops (+,-,*,/)
    in the same order — no transcendental, so the results are
    bit-identical. Same scale shape as forward-fill: one fact scan; the
    interpolation windows run over the data-independent types × hours
    grid."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"))
    )
    bounds = ev.agg(
        F.min(F.date_trunc("hour", "ts")).alias("lo"),
        F.max(F.date_trunc("hour", "ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    wb = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    j = grid.join(hourly, ["event_type", "h"], "left")
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    pv = F.last("v", ignorenulls=True).over(wb)
    ph = F.last(obs_h, ignorenulls=True).over(wb)
    nv = F.first("v", ignorenulls=True).over(wf)
    nh = F.first(obs_h, ignorenulls=True).over(wf)
    hour_diff = lambda a, b: ((F.unix_micros(a) - F.unix_micros(b)) / F.lit(3600000000)).cast("long")
    interp = pv + (nv - pv) * (
        hour_diff(F.col("h"), ph).cast("double") / hour_diff(nh, ph).cast("double")
    )
    return j.select(
        "event_type",
        F.col("h").alias("hour_ts"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(pv.isNotNull() & nv.isNotNull(), interp)
        .alias("v_interp"),
        F.col("v").isNull().alias("was_filled"),
    )
