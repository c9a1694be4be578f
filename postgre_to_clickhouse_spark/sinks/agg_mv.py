"""Incremental aggregate materialized view — ClickHouse
AggregatingMergeTree / SummingMergeTree parity.

The reference's users wire ClickHouse materialized views to fold a
stream into pre-aggregated tables; the engine stores PARTIAL aggregate
STATE per part and merges states at read (or during background
merges), so ingest cost is O(batch groups), never O(history). This
module is the Spark-native equivalent on a plain filesystem:

- each micro-batch reduces to one partial-state row per group it
  touches — (exact decimal sum, count, min, max) is a mergeable state
  for the sum/count/avg/min/max family (associative + commutative, so
  batch boundaries can never leak into final results),
- states land as an immutable part directory named by ``batch_id`` and
  become visible only via an atomic rename — a replayed batch sees its
  directory already committed and SKIPS, which upgrades foreachBatch's
  at-least-once delivery to exactly-once state (the same
  deterministic-batch-id trick the upsert sinks use),
- ``read_final`` merges all committed parts and finalizes
  (avg = exact sum / count); ``compact`` folds the accumulated parts
  into one without changing any read result.

Scale: the part log grows with batches x touched-groups, independent
of fact-table size; compaction bounds read fan-in. A 100 TB stream
with a 1e6-group key space stores megabytes of state.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PARTS = "parts"


class AggregateMV:
    """Keyed sum/count/min/max/avg view over a value column."""

    # r16: a subclass whose _partial/_merge needs runtime JOIN planning
    # keeps AQE for that action; join-free shapes run under
    # session.micro_shape (see apply_batch/compact). After the
    # NULL-skipping fold removed TopK's partial join, only its _merge
    # (the items⋈group-total join) still wants AQE.
    _adaptive_partial = False
    _adaptive_merge = False

    def __init__(self, path: str, keys: tuple[str, ...], value_col: str, scale: int = 2):
        self.path = path
        self.keys = list(keys)
        self.value_col = value_col
        self.scale = scale
        os.makedirs(os.path.join(path, _PARTS), exist_ok=True)

    # -- state algebra -------------------------------------------------------
    def _partial(self, df: DataFrame) -> DataFrame:
        """One mergeable state row per group in ``df``. The sum state is
        an exact DECIMAL so merge order can never perturb the result."""
        v = F.col(self.value_col)
        # the sum state is pinned to decimal(30, scale): Spark widens
        # sums per level (18->28->38), and PARQUET encodes <=18-digit
        # decimals as INT64 but wider ones as FIXED_LEN_BYTE_ARRAY — a
        # part log mixing raw and compacted parts would mix physical
        # types and fail the multi-file read. One fixed state type keeps
        # every part bit-compatible; 30 digits is ~1e28 of headroom.
        state_t = f"decimal(30,{self.scale})"
        # values cast straight to the 30-digit state type: a narrower
        # per-value cast (18 digits) would turn any input over ~1e16
        # into NULL with ANSI off — silently excluded from the sum while
        # still counted, corrupting sum and avg with no error.
        return df.groupBy(*self.keys).agg(
            F.sum(v.cast(state_t)).cast(state_t).alias("s_sum"),
            F.count(v).alias("s_cnt"),
            F.min(v).alias("s_min"),
            F.max(v).alias("s_max"),
        )

    def _merge(self, states: DataFrame) -> DataFrame:
        return states.groupBy(*self.keys).agg(
            F.sum("s_sum").cast(f"decimal(30,{self.scale})").alias("s_sum"),
            F.sum("s_cnt").alias("s_cnt"),
            F.min("s_min").alias("s_min"),
            F.max("s_max").alias("s_max"),
        )

    # -- write path ----------------------------------------------------------
    def _part_dir(self, batch_id: int | str) -> str:
        return os.path.join(self.path, _PARTS, f"b{batch_id}")

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """foreachBatch body. Returns False when the batch was already
        committed (replay after a crash/restart) — state is NOT applied
        twice, which is what makes the at-least-once source exactly-once
        in the view."""
        final_dir = self._part_dir(batch_id)
        if os.path.exists(final_dir):
            return False
        staging = os.path.join(self.path, f"_staging.{uuid.uuid4().hex[:12]}")
        try:
            # r16: plain session.no_aqe regressed here (AQE's 1-2
            # coalesced reduce tasks beat 32 fixed ones: topk_mv 3.2 ->
            # 5.9 s at sf0.1), but micro_shape — AQE off AND the width
            # pinned to a cluster-derived handful — beats both for the
            # JOIN-FREE partials: one planning round per append instead
            # of one per exchange, with a task count matched to the
            # batch-group-bounded state bytes (alternating A/B warm
            # minima: quantile 2.57 vs 3.29, agg 1.84 vs 1.96, uniq
            # 1.32 vs 1.44). _adaptive_partial opts a join-bearing
            # partial out: when TopK's partial carried the kept⋈dropped
            # join, micro_shape regressed its closing record 3.76 ->
            # 4.35 s while the join-free MVs improved; the fold below
            # (one-aggregation kept/dropped) removed that join, and the
            # A/B re-ran in TopK's favor before re-enabling.
            write = lambda: (  # noqa: E731 - two-branch write body
                self._partial(batch_df)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(staging)
            )
            if self._adaptive_partial:
                write()
            else:
                from postgre_to_clickhouse_spark.session import micro_shape

                with micro_shape(batch_df.sparkSession):
                    write()
            os.replace(staging, final_dir)  # atomic publish
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        return True

    def sink(self):
        def _apply(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id)

        return _apply

    # -- read path -----------------------------------------------------------
    def _committed_parts(self) -> list[str]:
        """Committed part dirs, excluding any input a compacted part
        replaces — so a crash between publishing a compaction and
        cleaning up its inputs can never double count."""
        import json

        root = os.path.join(self.path, _PARTS)
        dirs = sorted(d for d in os.listdir(root) if d.startswith("b"))
        replaced: set[str] = set()
        for d in dirs:
            rj = os.path.join(root, d, "_replaces.json")
            if os.path.exists(rj):
                with open(rj) as f:
                    replaced.update(json.load(f))
        return [os.path.join(root, d) for d in dirs if d not in replaced]

    def read_states(self, spark: SparkSession) -> DataFrame:
        parts = self._committed_parts()
        if not parts:
            raise FileNotFoundError(f"aggregate MV at {self.path} has no committed parts")
        return self._merge(spark.read.parquet(*parts))

    def read_final(self, spark: SparkSession) -> DataFrame:
        """Finalized view: sum/count/min/max/avg per group. The exact
        decimal sum is surfaced as double; avg divides the exact sum by
        the count in double arithmetic (deterministic IEEE)."""
        m = self.read_states(spark)
        return m.select(
            *self.keys,
            F.col("s_sum").cast("double").alias("value_sum"),
            F.col("s_cnt").alias("value_count"),
            F.col("s_min").alias("value_min"),
            F.col("s_max").alias("value_max"),
            (F.col("s_sum").cast("double") / F.col("s_cnt")).alias("value_avg"),
        )

    # -- maintenance ---------------------------------------------------------
    def compact(self, spark: SparkSession) -> int:
        """Fold all committed parts into one (the background merge an
        AggregatingMergeTree runs). Associativity makes this a pure
        re-layout: reads before and after are identical. Returns the
        number of parts folded."""
        import json

        parts = self._committed_parts()
        if len(parts) <= 1:
            return len(parts)
        merged = self._merge(spark.read.parquet(*parts))
        staging = os.path.join(self.path, f"_staging.{uuid.uuid4().hex[:12]}")
        if self._adaptive_merge:  # join-bearing merge keeps AQE
            merged.coalesce(1).write.mode("overwrite").parquet(staging)
        else:
            from postgre_to_clickhouse_spark.session import micro_shape

            with micro_shape(spark):  # same batch-bounded shape as apply_batch
                merged.coalesce(1).write.mode("overwrite").parquet(staging)
        # The folded part carries the list of inputs it replaces
        # (underscore-prefixed so Spark's reader ignores it); readers
        # exclude replaced inputs, so the single atomic rename below is
        # the whole commit — a crash before it changes nothing, a crash
        # after it (before cleanup) leaves inputs that readers already
        # ignore. Deleting the inputs is pure garbage collection.
        with open(os.path.join(staging, "_replaces.json"), "w") as f:
            json.dump([os.path.basename(p) for p in parts], f)
        compacted = os.path.join(self.path, _PARTS, f"b{uuid.uuid4().hex[:8]}.compact")
        os.replace(staging, compacted)
        for p in parts:
            shutil.rmtree(p, ignore_errors=True)
        return len(parts)

    def vacuum(self) -> list[str]:
        """Garbage-collect part dirs a compaction replaced but a crash
        left on disk. Readers already ignore them; this just reclaims
        space."""
        import json

        root = os.path.join(self.path, _PARTS)
        replaced: set[str] = set()
        for d in os.listdir(root):
            rj = os.path.join(root, d, "_replaces.json")
            if os.path.exists(rj):
                with open(rj) as f:
                    replaced.update(json.load(f))
        removed = []
        for d in sorted(replaced):
            p = os.path.join(root, d)
            if os.path.exists(p):
                shutil.rmtree(p)
                removed.append(d)
        return removed


class UniqMV(AggregateMV):
    """ClickHouse ``uniqState``/``uniqMerge`` materialized view — THE
    canonical AggregatingMergeTree pattern (store a distinct-count
    STATE per group, merge states at read): the partial state is a
    Datasketches HLL sketch (Spark-native ``hll_sketch_agg``, binary
    column in the part files), merge is ``hll_union_agg`` (per-register
    max — commutative, associative, idempotent, so replayed batches and
    compactions can never perturb the estimate), finalize is
    ``hll_sketch_estimate``. Inherits the whole part-log protocol
    (batch-id-addressed atomic parts → exactly-once state, crash-safe
    replaces-tombstone compaction, vacuum) unchanged.

    At 100 TB the view stores ``groups × 2^lg_k`` bytes of registers —
    megabytes — while answering per-group AND rolled-up distinct counts
    without ever rescanning facts (union the group states for any
    coarser rollup, `uniq_merge_rollup`'s mechanism)."""

    def __init__(self, path: str, keys: tuple[str, ...], value_col: str, lg_k: int = 12):
        super().__init__(path, keys, value_col)
        self.lg_k = lg_k

    def _partial(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.keys).agg(
            F.hll_sketch_agg(self.value_col, F.lit(self.lg_k)).alias("s_hll")
        )

    def _merge(self, states: DataFrame) -> DataFrame:
        return states.groupBy(*self.keys).agg(F.hll_union_agg("s_hll").alias("s_hll"))

    def read_final(self, spark: SparkSession) -> DataFrame:
        """Finalized view: distinct-count estimate per group (exact in
        the sketch's sparse regime — below ~2^lg_k·0.75 distincts)."""
        return self.read_states(spark).select(
            *self.keys,
            F.hll_sketch_estimate("s_hll").cast("bigint").alias("uniq_values"),
        )


class QuantileMV(AggregateMV):
    """ClickHouse ``quantileExactWeightedState``/``-Merge``
    materialized view. CH's exact-weighted quantile STATE is literally
    a value→count histogram (a hash map in the AggregateFunction
    column); here it is a sorted ``array<struct<v, w>>`` per group —
    the same information, parquet-friendly. Merge re-sums counts per
    value (commutative, associative, idempotent per the part-log's
    exactly-once batches), finalize applies the
    ``quantileExactWeighted`` rule: the smallest value whose cumulative
    weight reaches q·W. Every output is a RAW input value — no
    interpolation, no floats to drift — so the view is bit-identical
    to recomputing the quantile from all facts.

    State size per group is bounded by the group's VALUE CARDINALITY
    (ClickHouse's quantileExactWeighted carries the same bound; a
    truly unbounded domain takes the GK summaries of
    operators/sketch.py instead). Ingest stays O(batch groups ×
    batch-distinct values), never O(history)."""

    def _partial(self, df: DataFrame) -> DataFrame:
        c = df.groupBy(*self.keys, self.value_col).agg(
            F.count(F.lit(1)).alias("w")
        )
        return c.groupBy(*self.keys).agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(self.value_col).cast("double").alias("v"),
                        F.col("w").alias("w"),
                    )
                )
            ).alias("s_q")
        )

    def _merge(self, states: DataFrame) -> DataFrame:
        flat = states.select(*self.keys, F.explode("s_q").alias("e")).select(
            *self.keys, F.col("e.v").alias("v"), F.col("e.w").alias("w")
        )
        c = flat.groupBy(*self.keys, "v").agg(F.sum("w").alias("w"))
        return c.groupBy(*self.keys).agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("v"), F.col("w")))
            ).alias("s_q")
        )

    def read_final(
        self, spark: SparkSession, qs: tuple[float, ...] = (0.5, 0.9, 0.99)
    ) -> DataFrame:
        """Quantiles per group: for each q, the smallest value whose
        cumulative weight reaches q·W — computed with JVM higher-order
        functions over the (bounded) state array, no window, no
        explode at read time."""
        m = self.read_states(spark)
        total = F.aggregate("s_q", F.lit(0).cast("long"), lambda a, x: a + x["w"])
        cols = [F.col(k) for k in self.keys]
        m = m.withColumn("_tw", total)
        for q in qs:
            # running-sum scan: first element where cum >= q * W
            pick = F.expr(
                f"""
                aggregate(
                  s_q,
                  named_struct('cum', cast(0 as long), 'val',
                               cast(null as double)),
                  (acc, x) -> IF(
                    acc.val IS NOT NULL, acc,
                    IF(cast(acc.cum + x.w as double) >= _tw * {q!r}d,
                       named_struct('cum', acc.cum + x.w, 'val', x.v),
                       named_struct('cum', acc.cum + x.w,
                                    'val', cast(null as double)))),
                  acc -> acc.val)
                """
            )
            cols.append(pick.alias(f"p{int(round(q * 100))}"))
        return m.select(*cols)


class TopKMV(AggregateMV):
    """ClickHouse ``topKState``/``topKMerge`` materialized view — the
    SpaceSaving heavy-hitter state as the fourth mergeable family next
    to the sum/count MV, the HLL uniq MV and the quantile histogram.

    State per group = one capped summary: the ≤ ``capacity`` heaviest
    items with UPPER-BOUND counts plus an error floor ``d`` (the
    largest mass the summary may have dropped; 0 in the exact regime).
    Merging n summaries uses the standard conservative composition:
    with D = Σ dᵢ, an item's merged upper bound is
    ``D + Σ_{summaries containing it} (ubᵢ − dᵢ)`` (a summary that
    missed the item can have seen at most dᵢ of its mass), the result
    re-caps to ``capacity`` and the new floor is
    ``max(D, largest evicted ub)``. Invariants (property-tested):
    true count ≤ merged ub for every kept item, and any item with true
    count > the floor is PRESENT — the heavy-hitter guarantee. With
    per-batch distinct items ≤ capacity every d is 0 and the view is
    EXACT — the regime the oracle-graded query runs in.

    Scale: state is groups × capacity rows regardless of history;
    ingest is one partial-agg + per-group top-capacity per batch."""

    _adaptive_merge = True  # _merge's items⋈group-total join wants AQE

    def __init__(self, path: str, keys: tuple[str, ...], value_col: str, capacity: int = 4096):
        super().__init__(path, keys, value_col)
        self.capacity = capacity

    def _partial(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        counts = df.groupBy(*self.keys, self.value_col).agg(
            F.count(F.lit(1)).cast("long").alias("ub")
        )
        w = Window.partitionBy(*self.keys).orderBy(
            F.col("ub").desc(), F.col(self.value_col).asc()
        )
        ranked = counts.withColumn("__r", F.row_number().over(w))
        # r16: kept list and dropped floor in ONE aggregation — aggregate
        # functions skip NULLs, so the conditional struct/ub collapse the
        # old kept/dropped split (two groupBys + a left join) into a
        # single pass with bit-identical state: same kept set (sort_array
        # normalizes), same max-dropped floor, 0 when nothing dropped.
        kept_item = F.when(
            F.col("__r") <= self.capacity,
            F.struct(
                F.col(self.value_col).cast("string").alias("item"),
                F.col("ub").alias("ub"),
            ),
        )
        dropped_ub = F.when(F.col("__r") > self.capacity, F.col("ub"))
        return ranked.groupBy(*self.keys).agg(
            F.sort_array(F.collect_list(kept_item)).alias("s_tk"),
            F.coalesce(F.max(dropped_ub), F.lit(0)).cast("long").alias("s_d"),
        )

    def _merge(self, states: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        gd = states.groupBy(*self.keys).agg(F.sum("s_d").alias("__D"))
        items = states.select(
            *self.keys, F.col("s_d"), F.explode("s_tk").alias("e")
        ).select(
            *self.keys,
            F.col("e.item").alias("item"),
            (F.col("e.ub") - F.col("s_d")).alias("adj"),
        )
        merged = (
            items.groupBy(*self.keys, "item")
            .agg(F.sum("adj").alias("adj"))
            .join(gd, list(self.keys))
            .select(
                *self.keys,
                "item",
                (F.col("__D") + F.col("adj")).alias("ub"),
                "__D",  # group-constant; rides to the final agg so the
                # old kept⋈gd re-join is unnecessary (r16)
            )
        )
        w = Window.partitionBy(*self.keys).orderBy(
            F.col("ub").desc(), F.col("item").asc()
        )
        ranked = merged.withColumn("__r", F.row_number().over(w))
        # r16: kept list, eviction floor and __D in ONE aggregation (the
        # same NULL-skipping fold as _partial) — deletes two groupBys and
        # two joins per merge with bit-identical state.
        kept_item = F.when(
            F.col("__r") <= self.capacity, F.struct(F.col("item"), F.col("ub"))
        )
        evicted_ub = F.when(F.col("__r") > self.capacity, F.col("ub"))
        return ranked.groupBy(*self.keys).agg(
            F.sort_array(F.collect_list(kept_item)).alias("s_tk"),
            F.greatest(
                F.max("__D"), F.coalesce(F.max(evicted_ub), F.lit(0))
            )
            .cast("long")
            .alias("s_d"),
        )

    def read_final(self, spark: SparkSession, k: int = 10) -> DataFrame:
        """Per-group top-k by upper-bound mass (ub desc, item asc — the
        deterministic tie), with the state's error floor attached."""
        from pyspark.sql import Window

        m = self.read_states(spark)
        flat = m.select(
            *self.keys, F.col("s_d").alias("err_floor"), F.explode("s_tk").alias("e")
        ).select(
            *self.keys,
            "err_floor",
            F.col("e.item").alias("item"),
            F.col("e.ub").alias("cnt"),
        )
        w = Window.partitionBy(*self.keys).orderBy(
            F.col("cnt").desc(), F.col("item").asc()
        )
        return (
            flat.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(*self.keys, F.col("rank").cast("bigint"), "item", "cnt",
                    "err_floor")
        )
