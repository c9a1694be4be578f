"""Operator-level semantics tests: as-of join goldens + cross-impl
equivalence, band-join vs naive theta join, LSH recall vs brute force,
minhash candidate quality vs exact Jaccard, lang-id accuracy."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.operators.asof import asof_join, asof_join_pandas
from postgre_to_clickhouse_spark.operators.range_join import band_join
from tests.conftest import SF_SMALL


def _ts(d):
    return dt.datetime(2024, 1, d)


@pytest.fixture(scope="module")
def asof_fixture(spark):
    fact = spark.createDataFrame(
        [(1, _ts(5), "f1"), (1, _ts(10), "f2"), (1, _ts(2), "f0"), (2, _ts(7), "g1"), (3, _ts(4), "h1")],
        "k int, t timestamp, fval string",
    )
    dim = spark.createDataFrame(
        [
            (1, _ts(1), 100), (1, _ts(5), 150), (1, _ts(8), 180),  # interleaved versions
            (2, _ts(9), 900),  # only AFTER the fact → null match
        ],
        "k int, vt timestamp, price int",
    )
    return fact, dim


def test_asof_join_golden(spark, asof_fixture):
    fact, dim = asof_fixture
    out = asof_join(fact, dim, on="k", fact_time="t", dim_time="vt", dim_cols=["vt", "price"])
    got = {r.fval: (r.price_asof, r.vt_asof and r.vt_asof.day) for r in out.collect()}
    assert got == {
        "f0": (100, 1),   # t=2 → version@1
        "f1": (150, 5),   # t=5 → version@5 (<= matches at equal time)
        "f2": (180, 8),   # t=10 → version@8
        "g1": (None, None),  # dim version only at t=9 > 7
        "h1": (None, None),  # no dim rows for key 3
    }


def test_asof_join_equal_time_tiebreak(spark):
    fact = spark.createDataFrame([(1, _ts(5), "f")], "k int, t timestamp, fval string")
    dim = spark.createDataFrame(
        [(1, _ts(5), 10, 1), (1, _ts(5), 20, 2), (1, _ts(3), 5, 3)],
        "k int, vt timestamp, price int, ver int",
    )
    out = asof_join(fact, dim, on="k", fact_time="t", dim_time="vt", dim_cols=["price"], tiebreak="ver")
    assert out.collect()[0].price_asof == 20  # highest tiebreak among equal times


def test_asof_join_matches_pandas_reference(spark, asof_fixture):
    fact, dim = asof_fixture
    a = asof_join(fact, dim, on="k", fact_time="t", dim_time="vt", dim_cols=["price"])
    b = asof_join_pandas(fact, dim, on="k", fact_time="t", dim_time="vt", dim_cols=["price"])
    assert sorted((r.fval, r.price_asof) for r in a.collect()) == sorted(
        (r.fval, r.price_asof) for r in b.collect()
    )


def test_band_join_equals_naive_theta(spark):
    s = catalog.load(spark, SF_SMALL, "supplier")
    c = catalog.load(spark, SF_SMALL, "customer")
    banded = band_join(s, c, "s_acctbal", "c_acctbal", width=75.0).select("s_suppkey", "c_custkey")
    naive = s.join(c, F.abs(F.col("c_acctbal") - F.col("s_acctbal")) <= 75.0).select("s_suppkey", "c_custkey")
    assert sorted(map(tuple, banded.collect())) == sorted(map(tuple, naive.collect()))


def test_lsh_recall_vs_brute_force(spark):
    from postgre_to_clickhouse_spark.queries import QUERIES

    exact = {
        (r.query_id, r.vec_id)
        for r in QUERIES["vector_cosine_topk"](spark, SF_SMALL).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in QUERIES["vector_lsh_topk"](spark, SF_SMALL).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall {recall} too low"  # 8 tables × 4 bits on 500 vecs


def test_minhash_candidates_have_high_jaccard(spark):
    """Banded MinHash candidates (≥2 bands of 8×4) should be enriched in
    genuinely similar pairs relative to random pairs."""
    from postgre_to_clickhouse_spark.operators.dedup import minhash_near_dup, ngram_jaccard_pairs

    d = catalog.load(spark, SF_SMALL, "documents")
    cand = minhash_near_dup(d, num_hashes=32, bands=8)
    strong = cand.filter(F.col("n_bands_matched") >= 2).select("id_a", "id_b")
    if strong.count() == 0:
        pytest.skip("no strong candidates at this SF")
    jac = ngram_jaccard_pairs(d, strong, n=3)
    avg_cand = jac.agg(F.avg("jaccard")).collect()[0][0]
    assert avg_cand > 0.2, f"candidate avg jaccard {avg_cand}"


def test_simhash_similar_docs_close(spark):
    from postgre_to_clickhouse_spark.operators.dedup import hamming64, simhash

    d = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "the quick brown fox jumps over the lazy dog near the river shore"),
            (3, "completely different content about spark query engines and parquet files"),
        ],
        "doc_id long, text string",
    )
    sig = simhash(d)
    a, b, c = [r.simhash for r in sig.orderBy("doc_id").collect()]
    near = spark.range(1).select(hamming64(F.lit(a), F.lit(b)).alias("h")).collect()[0].h
    far = spark.range(1).select(hamming64(F.lit(a), F.lit(c)).alias("h")).collect()[0].h
    assert near < far, f"simhash near={near} far={far}"


def test_lang_id_accuracy_on_labels(spark):
    from postgre_to_clickhouse_spark.operators.text import lang_id

    d = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is big", "en"),
            (2, "le chat et la maison des amis est grande", "fr"),
            (3, "el gato y la casa de los amigos es una maravilla", "es"),
            (4, "der hund und die katze das haus ist groß", "de"),
            (5, "这是一个中文文档的例子", "zh"),
        ],
        "doc_id long, text string, lang string",
    )
    out = lang_id(d)
    got = {r.doc_id: r.pred_lang for r in out.collect()}
    assert got == {1: "en", 2: "fr", 3: "es", 4: "de", 5: "zh"}


def test_exact_dedup_synthetic_duplicates(spark):
    from postgre_to_clickhouse_spark.operators.dedup import exact_dedup

    d = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other"), (4, "same text")],
        "doc_id long, text string",
    )
    out = exact_dedup(d, content_cols=("text",), order_col="doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_ivf_recall_vs_brute_force(spark):
    """IVF (n_probe=3 of 8 lists) must recover ≥0.5 of the exact cosine
    top-10 — guards centroid-fit regressions (init mode, sampling)."""
    from postgre_to_clickhouse_spark.queries import QUERIES

    exact = {
        (r.query_id, r.vec_id)
        for r in QUERIES["vector_cosine_topk"](spark, SF_SMALL).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in QUERIES["vector_ivf_topk"](spark, SF_SMALL).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall} too low"


def test_connected_components_hand_graph(spark):
    """Chain 1-2-3-4 (multi-hop propagation), triangle 10-11-12 (cycle),
    pair 20-21: components must be the min reachable id, found only
    after >1 propagation round for the chain."""
    from postgre_to_clickhouse_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (21, 20)],
        "src long, dst long",
    )
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_paths_agree(spark):
    """The driver union-find fast path and the distributed pointer-
    jumping loop must converge to the identical fixpoint on a random
    graph (the fast path is an execution strategy, not a semantics
    change)."""
    import random

    from postgre_to_clickhouse_spark.operators.graph import connected_components

    rng = random.Random(7)
    pairs = [(rng.randrange(300), rng.randrange(300)) for _ in range(250)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    fast = {r.node: r.comp for r in connected_components(edges).collect()}
    dist = {
        r.node: r.comp
        for r in connected_components(edges, small_graph_edges=0).collect()
    }
    assert fast == dist and fast


def test_block_knn_salting_preserves_pairs_and_parallelism(spark):
    """The salted self-join must produce exactly the same neighbor set as
    the straightforward blocked join (no pair lost or duplicated by the
    salt replication), and the physical join keys must include the salt
    column so the heavy dot-product stage isn't bounded by the number of
    distinct blocks."""
    from postgre_to_clickhouse_spark.operators.similarity import (
        block_knn,
        cosine_similarity,
    )

    e = catalog.load(spark, SF_SMALL, "embeddings")
    salted = block_knn(e, block_col="label", id_col="vec_id", vec_col="embedding", k=2)
    jvm = block_knn(
        e, block_col="label", id_col="vec_id", vec_col="embedding", k=2, arrow=False
    )

    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("la"), F.col("embedding").alias("ea")
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("lb"), F.col("embedding").alias("eb")
    )
    from pyspark.sql import Window

    naive = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("id_a") != F.col("id_b")))
        .select("id_a", "id_b", cosine_similarity("ea", "eb").alias("cosine"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b"))
            ),
        )
        .filter(F.col("rank") <= 2)
    )
    expect = sorted((r.id_a, r.id_b, r.rank) for r in naive.collect())
    assert sorted((r.id_a, r.id_b, r.rank) for r in salted.collect()) == expect
    assert sorted((r.id_a, r.id_b, r.rank) for r in jvm.collect()) == expect

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, "salt column missing from physical plan"


def test_random_projection_recall_vs_brute_force(spark):
    """RP is a CANDIDATE-GENERATION stage: over-retrieve top-(10·k) in
    the 32-dim projected space, re-rank exactly, and the true top-k
    must be substantially recovered. (Direct top-k in projected space
    is NOT the contract — the synthetic embeddings have near-uniform
    neighbor gaps, which is exactly the regime where you re-rank.)
    Exactness of the projection itself is oracle-checked separately."""
    from postgre_to_clickhouse_spark.operators.projection import random_projection
    from postgre_to_clickhouse_spark.operators.similarity import cosine_topk

    e = catalog.load(spark, SF_SMALL, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(e, queries, k=10).select("query_id", "vec_id").collect()
    }
    ep = random_projection(e, out_dim=32).withColumnRenamed("proj", "embedding")
    qp = random_projection(queries, vec_col="query_vec", id_col="query_id", out_dim=32).select(
        "query_id", F.col("proj").alias("query_vec")
    )
    candidates = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(ep, qp, k=100).select("query_id", "vec_id").collect()
    }
    recall = len(exact & candidates) / len(exact)
    assert recall >= 0.6, f"RP candidate recall {recall} too low"


def test_block_knn_k1_agg_path_matches_window_path(spark):
    """The k=1 max(struct) aggregation must return exactly the window
    formulation's rank-1 rows (including the cosine-tie id_b tiebreak)."""
    from postgre_to_clickhouse_spark.operators.similarity import block_knn

    e = catalog.load(spark, SF_SMALL, "embeddings")
    k1 = {
        (r.id_a, r.id_b)
        for r in block_knn(e, "label", "vec_id", "embedding", k=1, arrow=False).collect()
    }
    via_k2 = {
        (r.id_a, r.id_b)
        for r in block_knn(e, "label", "vec_id", "embedding", k=2, arrow=False)
        .filter(F.col("rank") == 1)
        .collect()
    }
    assert k1 == via_k2


def test_window_funnel_chain_start_enumeration(spark):
    """A later step-1 event can reach deeper than the earliest one: the
    operator must enumerate chain starts (ClickHouse windowFunnel
    semantics), not greedily pick the first step-1 event. Timestamps
    must be strictly increasing and within the window of the START."""
    from pyspark.sql import functions as F

    from postgre_to_clickhouse_spark.operators.funnel import retention, window_funnel

    rows = [
        # user 1: A@0, B@100s (outside 10s window of A@0), A@95s, B@99s
        # -> wait B@99s > A@95s and within 10s => level 2 via the LATER A
        (1, 0, "A"), (1, 95, "A"), (1, 99, "B"), (1, 100, "B"),
        # user 2: full chain A@0 B@3 C@7 inside 10s
        (2, 0, "A"), (2, 3, "B"), (2, 7, "C"),
        # user 3: B before A only -> level 1 (strictly increasing)
        (3, 5, "A"), (3, 2, "B"),
        # user 4: no A at all -> level 0
        (4, 1, "B"), (4, 2, "C"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, sec long, event_type string").select(
        "user_id", F.timestamp_seconds(F.col("sec")).alias("ts"), "event_type"
    )
    got = {
        r.user_id: r.funnel_level
        for r in window_funnel(ev, ["A", "B", "C"], window_us=10_000_000).collect()
    }
    assert got == {1: 2, 2: 3, 3: 1, 4: 0}

    ret = retention(ev, ["A", "B", "C"]).collect()[0]
    # retention is presence-based (no ordering): user 3's B-before-A
    # still counts for cond1 AND cond2
    assert (ret.n_cond1, ret.n_cond1_and_2, ret.n_cond1_and_3) == (3, 3, 1)


def test_parse_sequence_pattern_surface():
    """r7: the sequenceMatch pattern compiler — alternation sets,
    guard intersection, negation binding, and loud rejection of the
    unsupported/invalid forms."""
    import pytest

    from postgre_to_clickhouse_spark.operators.funnel import parse_sequence_pattern

    conds = ["a", "b", "c", "d"]
    steps, guards, negs, anys = parse_sequence_pattern(
        "(?1)(?t>10)(?t<=100)(?2|?3).*(?!4)(?1)", conds
    )
    assert steps == [("a",), ("b", "c"), ("a",)]
    # >10s and <=100s intersect into one (lo, hi) µs guard
    assert guards == [(10_000_001, 100_000_000), (0, None)]
    assert negs == [None, ("d",)]
    assert anys == [None, None]  # '.*' is the unconstrained default

    # r8: '.' = exactly-one-visible-event; runs accumulate
    steps, guards, negs, anys = parse_sequence_pattern("(?1).(?2)..(?3)", conds)
    assert steps == [("a",), ("b",), ("c",)]
    assert anys == [1, 2]

    with pytest.raises(ValueError):  # guard before any condition
        parse_sequence_pattern("(?t<=5)(?1)(?2)", conds)
    with pytest.raises(ValueError):  # dot before any condition
        parse_sequence_pattern(".(?1)(?2)", conds)
    with pytest.raises(ValueError):  # out-of-range condition index
        parse_sequence_pattern("(?1)(?9)", conds)
    with pytest.raises(ValueError):  # fewer than two condition steps
        parse_sequence_pattern("(?1)", conds)
    with pytest.raises(ValueError):  # garbage token
        parse_sequence_pattern("(?1)(?x)(?2)", conds)
    # r8 ADVICE fix: trailing guard/negation/dot tokens bind to nothing
    with pytest.raises(ValueError):
        parse_sequence_pattern("(?1)(?2)(?t<=5)", conds)
    with pytest.raises(ValueError):
        parse_sequence_pattern("(?1)(?2)(?!3)", conds)
    with pytest.raises(ValueError):
        parse_sequence_pattern("(?1)(?2).", conds)
    # mixing '.' and '.*' between one pair is ambiguous — both orders
    with pytest.raises(ValueError):
        parse_sequence_pattern("(?1).*.(?2)", conds)
    with pytest.raises(ValueError):
        parse_sequence_pattern("(?1)..*(?2)", conds)


def test_sequence_match_negation_open_interval_and_path_revival(spark):
    """The negation interval is OPEN (a banned event AT the matched
    timestamp does not interrupt), and the DP must keep alternative
    middle matches alive when one path is poisoned."""
    from pyspark.sql import functions as F

    from postgre_to_clickhouse_spark.operators.funnel import sequence_match_pattern

    rows = [
        # u1: a@0 b@10 e... banned d@10 AT the match ts -> still matches
        (1, 0, "a"), (1, 10, "b"), (1, 10, "d"), (1, 20, "e"),
        # u2: a@0 b@10 d@15 e@20 -> d strictly between kills the only path
        (2, 0, "a"), (2, 10, "b"), (2, 15, "d"), (2, 20, "e"),
        # u3: a@0 b@10 d@15 c@17 e@20 -> b-path dead, c-path alive
        (3, 0, "a"), (3, 10, "b"), (3, 15, "d"), (3, 17, "c"), (3, 20, "e"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, sec long, event_type string").select(
        "user_id", F.timestamp_seconds(F.col("sec")).alias("ts"), "event_type"
    )
    got = {
        r.user_id: r.matched
        for r in sequence_match_pattern(
            ev, "(?1)(?2|?3)(?!4)(?5)", ["a", "b", "c", "d", "e"]
        ).collect()
    }
    assert got == {1: True, 2: False, 3: True}


# -- incremental MinHash (r5) ----------------------------------------------
def test_minhash_incremental_finds_cross_side_dup_only(spark):
    from postgre_to_clickhouse_spark.operators.dedup import (
        minhash_incremental_candidates,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    batch = spark.createDataFrame(
        [(100, base), (101, "completely different text about spark shuffles and parquet"),
         (102, base + " extra")],  # near-dup of 100 but SAME side
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, "unrelated corpus document mentioning clickhouse merges")],
        ["doc_id", "text"],
    )
    pairs = {(r.new_id, r.corpus_id) for r in minhash_incremental_candidates(batch, corpus).collect()}
    assert (100, 1) in pairs          # exact dup across sides
    assert (102, 1) in pairs          # near-dup across sides
    assert all(c in (1, 2) for _, c in pairs)  # corpus ids only on the right
    assert (100, 102) not in pairs and (102, 100) not in pairs  # within-batch excluded
    assert not any(n == 101 for n, _ in pairs)


# -- HLL uniqState/uniqMerge (r5) ------------------------------------------
def test_hll_union_of_parts_equals_sketch_of_whole(spark):
    """Mergeability determinism: uniqMerge over per-part states gives
    the SAME estimate as one sketch over the whole — the property the
    AggregatingMergeTree pattern rests on — and the approximate regime
    stays within 3% of truth at 100k distinct ids."""
    from pyspark.sql import functions as F

    df = spark.range(300_000).select((F.col("id") % 100_000).alias("v"),
                                     (F.col("id") % 7).alias("part"))
    parts = df.groupBy("part").agg(F.hll_sketch_agg("v").alias("sk"))
    merged = parts.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")).collect()[0].e
    whole = df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("e")).collect()[0].e
    assert merged == whole  # state merge is exact, not approximate-on-approximate
    assert abs(merged - 100_000) / 100_000 < 0.03


def test_asof_join_forward_and_strict(spark, asof_fixture):
    """r6 direction/strict variants: forward = nearest dim AT-or-AFTER
    the fact; strict excludes the equal-time match (ClickHouse ASOF
    </> operators)."""
    fact, dim = asof_fixture
    fwd = asof_join(
        fact, dim, on="k", fact_time="t", dim_time="vt",
        dim_cols=["vt", "price"], direction="forward",
    )
    got = {r.fval: (r.price_asof, r.vt_asof and r.vt_asof.day) for r in fwd.collect()}
    assert got == {
        "f0": (150, 5),     # t=2 → next version @5
        "f1": (150, 5),     # t=5 → >= matches at equal time
        "f2": (None, None),  # t=10 → nothing after
        "g1": (900, 9),     # t=7 → version @9
        "h1": (None, None),
    }
    strict_b = asof_join(
        fact, dim, on="k", fact_time="t", dim_time="vt",
        dim_cols=["price"], strict=True,
    )
    got_b = {r.fval: r.price_asof for r in strict_b.collect()}
    assert got_b["f1"] == 100  # t=5: equal-time dim @5 EXCLUDED → @1
    strict_f = asof_join(
        fact, dim, on="k", fact_time="t", dim_time="vt",
        dim_cols=["price"], direction="forward", strict=True,
    )
    got_f = {r.fval: r.price_asof for r in strict_f.collect()}
    assert got_f["f1"] == 180  # t=5: equal-time dim @5 EXCLUDED → @8


def test_asof_join_tolerance(spark, asof_fixture):
    """tolerance_us nulls matches farther than the bound — pandas
    merge_asof(tolerance=...) is the cross-check."""
    import pandas as pd

    fact, dim = asof_fixture
    tol_us = 2 * 24 * 3600 * 1_000_000  # 2 days
    a = asof_join(
        fact, dim, on="k", fact_time="t", dim_time="vt",
        dim_cols=["price"], tolerance_us=tol_us,
    )
    f_pdf = fact.toPandas().sort_values("t", kind="mergesort")
    d_pdf = dim.toPandas().sort_values("vt", kind="mergesort")
    ref = pd.merge_asof(
        f_pdf, d_pdf, left_on="t", right_on="vt", by="k",
        tolerance=pd.Timedelta(days=2),
    )
    want = {r.fval: (None if pd.isna(r.price) else int(r.price)) for r in ref.itertuples()}
    got = {r.fval: r.price_asof for r in a.collect()}
    assert got == want


def test_quantile_summaries_exact_regime_and_error_bound(spark):
    """r6 mergeable quantile states: capacity >= per-partition distinct
    → exact; truncated regime stays within the per-partition bucket-
    mass rank bound (P buckets of mass ceil(m/capacity))."""
    from pyspark.sql import functions as F

    from postgre_to_clickhouse_spark.operators.sketch import (
        quantile_summaries,
        quantiles_from_summaries,
    )

    n = 10_000
    df = spark.range(n).select(F.col("id").cast("double").alias("v")).repartition(4)
    # exact regime
    s = quantile_summaries(df, "v", capacity=65536)
    out = quantiles_from_summaries(s, [0.5, 0.9], out_names=["q50", "q90"]).collect()[0]
    assert out.q50 == 4999.0 and out.q90 == 8999.0  # smallest v with cw >= q*n
    # truncated regime: 4 partitions x ~2500 distinct, capacity 100
    s2 = quantile_summaries(df, "v", capacity=100)
    assert s2.count() <= 4 * 100
    out2 = quantiles_from_summaries(s2, [0.5], out_names=["q50"]).collect()[0]
    # rank error <= sum of one bucket mass per partition = 4 * ceil(2500/100)
    bound = 4 * 25
    assert abs(out2.q50 - 4999.0) <= bound


def test_sequence_count_clickhouse_semantics(spark):
    """r6 sequenceCount: single-pointer greedy — chains do NOT
    interleave (ClickHouse restarts the search after a match), so
    [1,1,2,2,3,3] counts ONE chain, not two."""
    import datetime as dt

    from postgre_to_clickhouse_spark.operators.funnel import sequence_count

    def ev(uid, i, t):
        return (uid, dt.datetime(2024, 1, 1, 0, 0, i), t)

    rows = (
        [ev(1, i, t) for i, t in enumerate(["view", "view", "click", "click", "purchase", "purchase"])]
        + [ev(2, i, t) for i, t in enumerate(["view", "click", "purchase", "view", "click", "purchase"])]
        + [ev(3, i, t) for i, t in enumerate(["click", "purchase", "view"])]
        + [ev(4, i, t) for i, t in enumerate(["view", "other", "click", "other", "purchase"])]
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: r.n_matches for r in sequence_count(df, ["view", "click", "purchase"]).collect()}
    assert got == {1: 1, 2: 2, 3: 0, 4: 1}


def test_asof_join_nearest_matches_pandas(spark, asof_fixture):
    """r6 nearest direction: cross-checked against
    pandas merge_asof(direction='nearest')."""
    import pandas as pd

    from postgre_to_clickhouse_spark.operators.asof import asof_join_nearest

    fact, dim = asof_fixture
    got = {
        r.fval: r.price_asof
        for r in asof_join_nearest(
            fact, dim, on="k", fact_time="t", dim_time="vt", dim_cols=["price"]
        ).collect()
    }
    f_pdf = fact.toPandas().sort_values("t", kind="mergesort")
    d_pdf = dim.toPandas().sort_values("vt", kind="mergesort")
    ref = pd.merge_asof(
        f_pdf, d_pdf, left_on="t", right_on="vt", by="k", direction="nearest"
    )
    want = {r.fval: (None if pd.isna(r.price) else int(r.price)) for r in ref.itertuples()}
    assert got == want


class TestDictionary:
    def test_from_df_guard_and_lookups(self, spark):
        from postgre_to_clickhouse_spark.operators.dictionary import Dictionary
        import pytest as _pytest
        from pyspark.sql import functions as F

        dim = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, grp int"
        )
        d = Dictionary.from_df(dim, "k", ["name", "grp"])
        facts = spark.createDataFrame([(1,), (3,), (9,)], "k long")
        rows = {
            r["k"]: (r["nm"], r["nm_d"], r["has"])
            for r in facts.select(
                "k",
                d.get("name", "k").alias("nm"),
                d.get_or_default("name", "k", "?").alias("nm_d"),
                d.has("k").alias("has"),
            ).collect()
        }
        assert rows[1] == ("a", "a", True)
        assert rows[3] == ("c", "c", True)
        assert rows[9] == (None, "?", False)  # dictGetOrNull / OrDefault / Has
        with _pytest.raises(ValueError, match="max_rows"):
            Dictionary.from_df(dim, "k", ["name"], max_rows=2)


def test_remove_dup_spans_matches_coverage_union(spark):
    """removed_tokens must equal dup_span_coverage's covered_tokens on
    every document — the two operators share one definition of the
    duplicated-span union."""
    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.spans import (
        dup_span_coverage,
        remove_duplicated_spans,
    )
    from tests.conftest import SF_SMALL

    d = catalog.load(spark, SF_SMALL, "documents")
    cov = {r.doc_id: r.covered_tokens for r in dup_span_coverage(d).collect()}
    rem = {r.doc_id: r.removed_tokens for r in remove_duplicated_spans(d).collect()}
    assert set(cov) == set(rem)
    diff = {k: (cov[k], rem[k]) for k in cov if cov[k] != rem[k]}
    assert not diff, diff
