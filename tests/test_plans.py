"""Physical-plan quality gates (the 100 TB posture, SURVEY.md §4):
filters push to the parquet scan, projections prune columns, small dims
broadcast, top-k avoids global sort, and NO registered query ever drops
to a row-at-a-time Python UDF."""

from __future__ import annotations

import pytest

from postgre_to_clickhouse_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMALL)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_schema_pruned(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # only the 7 needed columns reach the scan — not all 11
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q5_broadcasts_small_dims(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan  # nation/region explicitly hinted


def test_topk_plans_take_ordered(spark):
    plan = _plan(spark, "topk_orders_by_price")
    assert "TakeOrderedAndProject" in plan  # no global sort materialization


def test_exists_subquery_becomes_semi_join(spark):
    plan = _plan(spark, "exists_subquery_sql")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_partial_aggregation_before_shuffle(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # HashAggregate appears twice: partial (map-side) + final
    assert plan.count("HashAggregate") >= 2


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_python_row_udf_in_any_query(spark, name):
    """Python in the row path kills throughput at scale — every operator
    must stay JVM-side (Arrow/pandas paths show as ArrowEvalPython /
    FlatMapGroupsInPandas, which are the sanctioned exceptions)."""
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"


# Oracle-backed queries whose POINT is the Arrow-batched Python path —
# B19's sanctioned pandas demo, the C5 codec pipeline, and the C12
# BLAS-backed semantic dedup (per-cluster matmul is the sanctioned
# escape hatch for brute-force group scoring, like block_knn).
# Everything else in the oracle set must stay 100% JVM.
_SANCTIONED_ARROW = {
    "pandas_udf_zscore",
    "multimodal_image_stats",
    "semdedup_prune",
    # r9: LTTB's greedy walk is inherently sequential per series
    # (selection i depends on selection i-1) — the sanctioned shape is
    # ONE Arrow grouped-map stage, asserted by
    # test_lttb_is_arrow_grouped_map.
    "lttb_downsample_events",
}


def test_oracle_queries_have_no_python_at_all(spark):
    """The driver-graded oracle set must be 100% JVM (not even Arrow),
    except the two operators that exist to exercise the Arrow path."""
    for name in sorted(set(ORACLES) - _SANCTIONED_ARROW):
        plan = _plan(spark, name)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
            assert marker not in plan, f"{name} contains {marker}"


def test_salted_agg_splits_hot_key(spark):
    """The skew-salted aggregation must shuffle on (key, __salt) in
    phase 1 — that partitioning is WHAT dissolves the hot key — and run
    two aggregate phases (partial+final × salt/merge)."""
    import re

    plan = _plan(spark, "skew_salted_agg_events")
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("__salt" in p for p in parts), f"no salted exchange in plan: {parts}"
    assert plan.count("HashAggregate") >= 4  # partial+final for both phases


def test_ivf_assignment_is_shuffle_free(spark):
    """assign_lists must stay a pure map pass (centroids folded in as
    literals): no Exchange, no join, no window sort in the plan."""
    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.ann import assign_lists, fit_ivf_centroids

    e = catalog.load(spark, SF_SMALL, "embeddings")
    cents = fit_ivf_centroids(e, n_lists=4, seed=42)
    indexed = assign_lists(e, cents)
    plan = indexed._sc._jvm.PythonSQLUtils.explainString(indexed._jdf.queryExecution(), "formatted")
    for marker in ("Exchange", "Join", "Window"):
        assert marker not in plan, f"assign_lists plan contains {marker}"


def test_minhash_single_scan(spark):
    """The LSH bucket-grouped pair generation computes the shingle →
    minhash pipeline exactly once (the self-join formulation planned it
    twice and broadcast the full signature table)."""
    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.dedup import minhash_near_dup

    d = catalog.load(spark, SF_SMALL, "documents")
    out = minhash_near_dup(d, num_hashes=32, bands=8)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    # formatted mode prints each node once in the tree and once in the
    # detail section — count detail headers "(N) Scan parquet"
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_decontaminate_single_corpus_exchange(spark):
    """The decontamination probe must be a broadcast join (eval grams
    are tiny vs the corpus) with exactly ONE corpus-proportional
    exchange: the token shuffle on doc_id that assembles grams — which
    downstream reuses for the pair aggregation (partitioning on doc_id
    satisfies the (doc_id, eval_id) grouping). Everything else must be
    eval-sized; nothing may sort-merge."""
    import re

    plan = _plan(spark, "decontaminate_eval_overlap")
    assert "SortMergeJoin" not in plan
    ops = re.findall(r"^\(\d+\) (\w+)", plan, re.M)  # numbered detail entries, once per node
    assert ops.count("BroadcastHashJoin") == 2  # gram probe + eval-size attach
    assert ops.count("Exchange") <= 3, f"unexpected shuffles: {ops}"
    corpus_exchanges = [
        ln for ln in plan.splitlines() if "hashpartitioning(doc_id" in ln
    ]
    assert len(corpus_exchanges) == 1, corpus_exchanges


def test_random_projection_is_pure_map(spark):
    """The JL projection folds its sign matrix into literals — the plan
    must contain NO exchange at all (a pure projection over the scan)."""
    plan = _plan(spark, "embedding_random_projection")
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_block_knn_k1_has_partial_aggregate_no_window(spark):
    """k=1 block k-NN must plan as partial+final hash aggregate (map-side
    combine collapses pairs to one row per vector before the exchange),
    with NO window/sort over the pair set."""
    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.similarity import block_knn
    from tests.conftest import SF_SMALL

    e = catalog.load(spark, SF_SMALL, "embeddings")
    df = block_knn(e, "label", "vec_id", "embedding", k=1, arrow=False)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Window" not in plan
    # struct-max buffers aren't hash-aggregable, so Spark plans
    # SortAggregate — what matters is that it appears TWICE (partial +
    # final): the pair set collapses map-side before the exchange
    assert plan.count("SortAggregate") >= 2


# -- round-4 operator plan shapes -------------------------------------------
def test_bm25_broadcasts_query_terms(spark):
    """The corpus-side postings must probe a BROADCAST query-term set —
    a shuffled join here would re-shuffle the corpus per query batch."""
    plan = _plan(spark, "bm25_topk")
    assert "BroadcastHashJoin" in plan


def test_semdedup_plan_is_two_arrow_stages_no_join(spark):
    """SemDedup's arrow path: BLAS assignment (MapInPandas) + per-cluster
    prune (FlatMapGroupsInPandas), ONE exchange on list_id, and no join
    anywhere — the rejoin shape it replaced evaluated assignment twice."""
    plan = _plan(spark, "semdedup_prune")
    assert "MapInPandas" in plan and "FlatMapGroupsInPandas" in plan
    for marker in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert marker not in plan, f"semdedup plan contains {marker}"


def test_funnel_plan_single_aggregation_no_join(spark):
    """windowFunnel = one groupBy collecting per-step arrays + JVM
    higher-order exprs: no join, no window sort, no Python."""
    plan = _plan(spark, "funnel_view_click_purchase")
    for marker in ("SortMergeJoin", "BroadcastHashJoin", "Window", "EvalPython"):
        assert marker not in plan, f"funnel plan contains {marker}"


def test_histogram_bounds_broadcast(spark):
    """Histogram bounds are a scalar row broadcast into a map pass —
    the bucket computation must not shuffle the fact table twice."""
    plan = _plan(spark, "histogram_event_values")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# -- round-5 operator plan shapes -------------------------------------------
def test_int8_topk_salted_two_phase_no_window(spark):
    """int8 top-k must NOT plan a window partitioned by query_id (all
    scored corpus×query rows would shuffle into #queries hot
    partitions — the r4 bench regression). The salted two-phase shape:
    no Window anywhere, and the first exchange of scored rows is keyed
    by (query_id, __salt) so the sort work spreads evenly."""
    plan = _plan(spark, "vector_int8_topk")
    assert "Window" not in plan
    assert "__salt" in plan, "salted local top-k key missing from plan"


def test_funnel_strict_modes_single_aggregation_no_join(spark):
    """All four windowFunnel modes compute from ONE groupBy (per-step
    arrays + one sorted struct array) — no join, no window, no Python."""
    plan = _plan(spark, "funnel_strict_modes")
    for marker in ("SortMergeJoin", "BroadcastHashJoin", "Window", "EvalPython"):
        assert marker not in plan, f"funnel_strict_modes plan contains {marker}"


def test_sequence_match_single_aggregation_no_join(spark):
    """The guarded sequenceMatch DP is higher-order expressions over
    per-step arrays from ONE groupBy — no join, no window, no Python."""
    plan = _plan(spark, "sequence_match_3step")
    for marker in ("SortMergeJoin", "BroadcastHashJoin", "Window", "EvalPython"):
        assert marker not in plan, f"sequence_match plan contains {marker}"


def test_approx_topk_takes_ordered_no_global_sort(spark):
    """The heavy-hitter merge must end in TakeOrderedAndProject (per-
    partition heaps), never a global Sort over the candidate set."""
    plan = _plan(spark, "approx_topk_tokens")
    assert "TakeOrderedAndProject" in plan


def test_dup_span_no_cartesian(spark):
    """Gram-dup detection is hash-join shaped — a nested-loop or
    cartesian here would be the quadratic all-pairs formulation."""
    plan = _plan(spark, "dup_span_coverage")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_summap_two_phase_aggregation(spark):
    """(user,type) partial sums must combine map-side before the user-
    level map assembly (shuffle carries groups, not fact rows)."""
    plan = _plan(spark, "summap_event_values")
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") >= 3


def test_global_rank_queries_have_no_single_partition_exchange(spark):
    """r6: `shuffle_training_order` and `interleave_datasets_order` use
    operators.sampling.global_rank (range-partitioned sort + broadcast
    offsets) — an unpartitioned Window plans as `Exchange
    SinglePartition` + Sort, moving the whole table to ONE task (the
    canonical 100 TB cliff). No single-partition exchange may appear
    anywhere in these plans (the broadcast offset join is a
    BroadcastExchange, which is fine and asserted distinct here)."""
    for name in ("shuffle_training_order", "interleave_datasets_order"):
        plan = _plan(spark, name)
        assert "SinglePartition" not in plan, f"{name} plans a single-partition exchange"
        # global_rank pins its ranked layout with localCheckpoint; the
        # final plan therefore reads the materialized RDD (and the
        # offset join builds a broadcast, not a shuffle)
        assert "ExistingRDD" in plan, f"{name} is not reading the pinned ranked layout"
        assert "BroadcastHashJoin" in plan, f"{name} lost the broadcast offset join"


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """r6: the 100 TB co-location story — two tables bucketed (and
    sorted) by the join key join WITHOUT a shuffle exchange: each
    bucket pair joins locally (Spark's bucketed SortMergeJoin). This is
    the `repartition`/bucketing advice in SCALE.md made executable: at
    scale you pre-bucket the big fact tables once and every subsequent
    co-keyed join skips both exchanges."""
    from postgre_to_clickhouse_spark import catalog
    from tests.conftest import SF_SMALL

    # (warehouse dir is a static conf — tables land in the session's
    # default warehouse and are dropped in the finally)
    from pyspark.sql import functions as F

    o = catalog.load(spark, SF_SMALL, "orders")
    li = catalog.load(spark, SF_SMALL, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable("b_lineitem"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try:
        # fixture tables are broadcast-small; the point here is the
        # SHUFFLE-free sort-merge over buckets, so disable broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        ).select("o_orderkey", "l_quantity")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        # no shuffle on either side: bucket layout satisfies the join's
        # distribution requirement (broadcast would also hide the point,
        # so check the join really is sort-merge over the buckets)
        assert "SortMergeJoin" in plan, plan[:800]
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        # and the result is right
        expect = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).count()
        assert j.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ngram_search_map_only(spark):
    """r7: ngramSearch is a pure map over the scan — the needle's
    trigrams are literals, so the shared-gram count must not shuffle,
    join, or window (the r6 form exploded doc trigrams and joined the
    broadcast needle set)."""
    plan = _plan(spark, "ngram_search_documents")
    for marker in ("Exchange", "Join", "Window", "Generate"):
        assert marker not in plan, f"ngram_search plan contains {marker}"


def test_dictget_no_join_no_pre_agg_exchange(spark):
    """dictGet is a scan-local map probe, never a join: the customer
    scan must reach the aggregation with no Join operator anywhere in
    the plan and at most the single groupBy exchange."""
    import re

    plan = _plan(spark, "dictget_customer_enrich")
    assert "Join" not in plan, "dictionary lookup degraded into a join"
    ops = re.findall(r"^\(\d+\) (\w+)", plan, re.M)  # once per node
    assert ops.count("Exchange") <= 1, f"more than the final-agg exchange: {ops}"


def test_limit_by_uses_window_group_limit(spark):
    """LIMIT n OFFSET m BY must pre-truncate per partition before the
    shuffle (Spark 4 WindowGroupLimit), not sort whole groups."""
    plan = _plan(spark, "limit_by_user_events")
    assert "WindowGroupLimit" in plan


def test_gopher_ngram_map_only(spark):
    """n-grams never cross documents: the Gopher repetition pass must
    be a zero-exchange scan (sorted-run fold), not an explode+groupBy
    shuffle of every token."""
    import re

    plan = _plan(spark, "gopher_ngram_repetition")
    ops = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    assert ops.count("Exchange") == 0, f"unexpected shuffle: {ops}"
    assert "Join" not in plan


def test_no_registered_query_collects_unbounded_frames():
    """r8 (VERDICT r7 #1): no registered query may materialize a
    table-proportional frame on the driver. Source audit over every
    query module: ``.toPandas()`` is banned outright, and ``.collect()``
    may appear ONLY in the sanctioned 1-row-bounds form (a global
    ``.agg(...)`` with no grouping, indexed ``[0]`` on the same line).
    Lifecycle queries that must outlive their tempdir tables pin results
    with ``localCheckpoint(eager=True)`` (tierc3._pin) — materialized on
    the executors, never round-tripped through the driver."""
    import pathlib
    import re

    import postgre_to_clickhouse_spark.queries as qpkg

    qdir = pathlib.Path(qpkg.__file__).parent
    offenders = []
    for path in sorted(qdir.glob("*.py")):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if ".toPandas()" in line:
                offenders.append(f"{path.name}:{i} toPandas")
            if ".collect()" in line:
                sanctioned = re.search(r"\.agg\(.*\)\.collect\(\)\[0\]", line)
                if not sanctioned:
                    offenders.append(f"{path.name}:{i} collect: {line.strip()}")
    assert not offenders, "driver-side materialization outside the 1-row-agg form: " + "; ".join(offenders)


def test_lifecycle_queries_return_executor_pinned_results(spark):
    """The four tierc3 lifecycle queries (tempdir-backed MV/manifest
    ingest) must return localCheckpoint-pinned frames: the final plan
    scans the materialized RDD (ExistingRDD), proving no driver
    round-trip and independence from the deleted temp files."""
    for name in (
        "agg_mv_incremental",
        "manifest_evolution_read",
        "manifest_zonemap_read",
        "uniq_mv_incremental",
        # r9 session 2 lifecycle additions — same contract
        "manifest_bloom_read",
        "manifest_projection_read",
        "manifest_update_read",
        "manifest_ttl_rollup_read",
        "manifest_agg_projection_read",
        "quantile_mv_incremental",
        "topk_mv_incremental",
    ):
        plan = _plan(spark, name)
        assert "ExistingRDD" in plan, f"{name} result is not executor-pinned"
        # and the pinned result is still readable (temp dirs already gone)
        assert QUERIES[name](spark, SF_SMALL).count() > 0


def test_ema_fold_is_jvm_side_single_shuffle(spark):
    """ema_user_values: the per-user EMA fold must run as a JVM
    higher-order `aggregate` inside the grouped projection — no Python
    eval, no window, no join; the only exchange is the groupBy."""
    plan = _plan(spark, "ema_user_values")
    for marker in ("EvalPython", "ArrowEval", "Window", "Join"):
        assert marker not in plan, marker
    assert plan.count("Exchange (") <= 1, plan.count("Exchange (")


def test_sequence_next_node_no_join_no_python(spark):
    """sequence_next_node_events: consecutive-chain matching is a
    higher-order position filter over the collected array — same
    contract as the funnel family."""
    plan = _plan(spark, "sequence_next_node_events")
    for marker in ("EvalPython", "Join", "Window"):
        assert marker not in plan, marker


def test_lttb_is_arrow_grouped_map(spark):
    """lttb_downsample_events: the sequential walk must be ONE Arrow
    grouped-map stage (series fan out), never row-Python."""
    plan = _plan(spark, "lttb_downsample_events")
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange (") <= 1, plan.count("Exchange (")


def test_mann_whitney_rank_join_broadcasts(spark):
    """mann_whitney_values: the rank table joins back to rows as a
    BROADCAST (the distinct-value table is the small side); the row
    table itself is never globally sorted (no partitionless sort of
    the fact table — the only unpartitioned window runs over the
    constant-bounded 1024-row bucket-offset table)."""
    plan = _plan(spark, "mann_whitney_values")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ch_subquery_semi_join_and_scalar_pushdown(spark):
    """The dialect front end's IN (SELECT ...) must plan as a broadcast
    left-semi join, and the scalar-subquery threshold must reach the
    parquet scan as a pushed filter — zero front-end runtime."""
    plan = _plan(spark, "ch_dialect_subquery")
    assert "BroadcastHashJoin LeftSemi" in plan
    assert "GreaterThan(value,ScalarSubquery" in plan


def test_ch_window_collapses_to_one_window_operator(spark):
    """ch_dialect_window's three window functions share one
    (partition, order) spec — they must collapse into ONE Window
    operator over ONE exchange, not re-sort per function."""
    import re

    plan = _plan(spark, "ch_dialect_window")
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_ch_numbers_is_a_range_leaf(spark):
    """numbers(N) must plan as Spark's Range leaf — a generated
    sequence, zero scan, parallelizable."""
    from postgre_to_clickhouse_spark.ch_select import ChContext, ch_select

    df = ch_select(
        spark, "SELECT count() AS n FROM numbers(1000000) "
        "WHERE number % 7 = 0", ChContext({}),
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Range" in plan and "Scan" not in plan.replace("Range", "")
    assert "HashAggregate" in plan


def test_ch_grouped_fill_bounds_are_partial_aggregable(spark):
    """`ORDER BY g, f WITH FILL` builds its per-group grid from a
    two-phase (partial) aggregate over the result — the grid is bounds
    rows, never a collect; the fill anti-join carries no forced
    broadcast hint (AQE decides)."""
    import re

    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.ch_select import ChContext, ch_select
    from tests.conftest import SF_SMALL

    ev = catalog.load(spark, SF_SMALL, "events")
    df = ch_select(
        spark,
        "SELECT user_id, toHour(ts) AS h, count() AS n FROM events "
        "WHERE user_id <= 5 GROUP BY user_id, h "
        "ORDER BY user_id, h WITH FILL FROM 0 TO 24",
        ChContext({"events": ev}),
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    # per-group bounds: partial_min/partial_max over the grouped result
    assert re.search(r"partial_min|partial_max|partial_count", plan)
    # the grid side explodes a sequence, not a collected list
    assert "Generate explode" in plan or "Generate" in plan
    assert "LeftAnti" in plan


def test_ch_state_merge_is_single_aggregate_pair(spark):
    """r12: a quantileMerge/topKMerge SELECT over a states frame plans
    as ONE aggregate (partial + final over one exchange) — the merge
    expressions are plain aggregate projections, never a window, an
    explode, or a second shuffle."""
    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.ch_select import ChContext, ch_select
    from tests.conftest import SF_SMALL

    ev = catalog.load(spark, SF_SMALL, "events")
    df = ch_select(
        spark,
        "SELECT event_type, quantileMerge(0.5)(s) AS p50, "
        "topKMerge(2)(t) AS top2 FROM ("
        "  SELECT event_type, user_id % 3 AS b, "
        "         quantileState(value) AS s, "
        "         topKState(9)(toString(user_id % 5)) AS t"
        "  FROM events GROUP BY event_type, b"
        ") GROUP BY event_type",
        ChContext({"events": ev}),
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Window" not in plan and "Generate" not in plan
    # exactly two aggregation levels: states, then merge — each a
    # partial+final pair around ONE exchange (ObjectHashAggregate
    # carries collect_list); "(N) Exchange" counts physical nodes once
    import re

    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert 1 <= n_exchanges <= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ch_alias_read_is_metadata_only_projection(spark, tmp_path):
    """r12: reading an ALIAS column adds a Project over the scan —
    no join, no shuffle, no extra pass; the part files are untouched
    (the column is computed in the read plan)."""
    from postgre_to_clickhouse_spark.ch_ddl import ChDdlCatalog

    c = ChDdlCatalog(storage_root=str(tmp_path))
    c.execute(
        "CREATE TABLE t (id Int64, v Float64, "
        "v2 Float64 ALIAS v * 2) ENGINE = MergeTree ORDER BY (id)")
    c.insert(spark, "t", spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], "id long, v double"))
    df = c.query(spark, "SELECT id, v2 FROM t")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan and "Join" not in plan
    assert "Project" in plan
    assert sorted(map(tuple, df.collect())) == [(1, 3.0), (2, 5.0)]


def test_dsir_scoring_is_map_only_with_takeordered(spark):
    """r13: DSIR's scoring+selection plan — the fitted model is a
    plan-embedded literal array (element_at per gram), so after the
    two B-bounded model-fit aggregations the SELECTION query has NO
    exchange except TakeOrdered's own limit machinery: no join, no
    window, no generate, no Python."""
    import re

    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.dsir import dsir_select
    from tests.conftest import SF_SMALL

    d = catalog.load(spark, SF_SMALL, "documents")
    out = dsir_select(d, d.limit(20), k=10, n_buckets=128)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan and "Generate" not in plan
    assert "Join" not in plan  # the model is a literal, not a join
    assert "Python" not in plan and "ArrowEval" not in plan
    assert not re.findall(r"\(\d+\) Exchange", plan), plan


def test_pack_sequences_is_single_shard_exchange(spark):
    """r13 s3: concat-and-chunk packing = ONE exchange (hash by the
    content-addressed shard) feeding a shard-local window prefix sum;
    the block-span arithmetic is map-side. No join, no Python, no
    second shuffle."""
    import re

    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.packing import pack_sequences
    from postgre_to_clickhouse_spark.operators.text import token_count
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    d = catalog.load(spark, SF_SMALL, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n"))
    out = pack_sequences(d, "doc_id", "n", capacity=256, n_shards=8)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan
    assert "hashpartitioning(pack_shard" in plan, plan
    assert "Join" not in plan and "Python" not in plan, plan


def test_pack_bins_nosplit_is_one_arrow_stage_per_shard(spark):
    """r13 s3: no-split first-fit = one exchange by shard into ONE
    Arrow grouped-map stage (FlatMapGroupsInPandas) — the sequential
    first-fit runs once per shard, nothing else shuffles."""
    import re

    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.packing import pack_bins_nosplit
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    d = catalog.load(spark, SF_SMALL, "documents").select(
        "doc_id", (F.length("text") % 200 + 1).cast("long").alias("n"))
    out = pack_bins_nosplit(d, "doc_id", "n", capacity=256, n_shards=8)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "FlatMapGroupsInPandas" in plan, plan
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan
    assert "Join" not in plan, plan


def test_limit_with_ties_has_no_window(spark):
    """r13 s3 (review): LIMIT n WITH TIES compiles WITHOUT a global
    window — TakeOrdered finds the n-th key, a 1-row broadcast filters
    ties — so no single-partition pass over the pre-limit result."""
    from postgre_to_clickhouse_spark.ch_select import ChContext, ch_select

    df = spark.range(100).selectExpr("id % 7 AS k", "id AS v")
    out = ch_select(
        spark, "SELECT k, v FROM t ORDER BY k LIMIT 3 WITH TIES",
        ChContext({"t": df}))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_qclf_scoring_is_map_only(spark):
    """r15: the quality classifier's SCORING plan — the fitted model
    (weights + bias) is a plan-embedded literal array, so after the
    model-sized fit aggregation the corpus-wide scoring pass has NO
    exchange, no join, no window, no Python: embarrassingly parallel
    at any scale."""
    import re

    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.quality_clf import (
        quality_classifier_select,
    )
    from tests.conftest import SF_SMALL

    d = catalog.load(spark, SF_SMALL, "documents")
    out = quality_classifier_select(
        d, d.limit(20), d.limit(40).exceptAll(d.limit(20)),
        n_buckets=128)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "Join" not in plan, plan        # the model is a literal
    assert "Window" not in plan and "Generate" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
    assert not re.findall(r"\(\d+\) Exchange", plan), plan


def test_zipf_fit_is_takeordered_with_partial_agg(spark):
    """r16 s2: the Zipf fit's top-1000 cut must be TakeOrdered (no
    global sort materialization), the vocab aggregate must have its
    map-side partial, and the only window runs AFTER the 1000-row
    cut (constant-bounded — never over the full vocabulary)."""
    plan = _plan(spark, "zipf_law_fit")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final vocab agg
    assert plan.count("row_number") == 1
    # the window must CONSUME TakeOrdered's output (parent prints
    # above child in the formatted tree) — a regression windowing the
    # full vocabulary and limiting afterwards would flip this order
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_source_overlap_assembles_from_one_checkpoint(spark):
    """r16 s2: the overlap matrix runs its corpus pipeline exactly
    ONCE — eagerly, into a localCheckpoint of the <= C(n,2)+n count
    rows — so the returned plan must be pure assembly: a checkpoint
    scan plus broadcast joins, with NO parquet rescan (the gram-keyed
    self-join formulation re-planned the whole shingle pipeline per
    side — probed: zero ReusedExchange — and read the corpus from
    parquet in this very plan)."""
    plan = _plan(spark, "source_ngram_overlap_matrix")
    assert "Scan ExistingRDD" in plan          # the checkpointed counts
    assert "documents.parquet" not in plan     # corpus never re-read
    assert plan.count(") BroadcastHashJoin") == 2  # totals attach twice


def test_heaps_fit_explodes_once_with_partial_aggs(spark):
    """r16 s2: Heaps' fit must not explode tokens for the bucket
    token COUNTS (per-doc size() feeds them; only the term min-bucket
    branch explodes — exactly one Generate in the plan) and must keep
    the aggregates' map-side partials."""
    plan = _plan(spark, "heaps_law_fit")
    assert plan.count(") Generate") == 1
    assert plan.count("HashAggregate") >= 8  # partial+final per branch
