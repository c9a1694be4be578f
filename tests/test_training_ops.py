"""Round-2 training-data operators: deterministic splits/sampling,
text cleaning/PII masking/repetition, int8 quantization."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.operators import sampling as SM
from postgre_to_clickhouse_spark.operators import text_clean as TC
from postgre_to_clickhouse_spark.operators import quantize as Q
from tests.conftest import SF_SMALL


def _docs(spark):
    return catalog.load(spark, SF_SMALL, "documents")


# -- splits ----------------------------------------------------------------
def test_split_is_layout_and_membership_independent(spark):
    d = _docs(spark)
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    base = {r.doc_id: r.split for r in SM.deterministic_split(d, "doc_id", w).collect()}
    # different physical layout → identical assignment
    shuffled = {
        r.doc_id: r.split
        for r in SM.deterministic_split(d.repartition(17).orderBy(F.rand(3)), "doc_id", w).collect()
    }
    assert base == shuffled
    # subset of rows → existing rows keep their split (content-addressed)
    half = {r.doc_id: r.split for r in SM.deterministic_split(d.filter("doc_id % 2 = 0"), "doc_id", w).collect()}
    assert all(base[k] == v for k, v in half.items())


def test_split_proportions_and_totality(spark):
    d = _docs(spark)
    out = SM.deterministic_split(d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == d.count()
    assert counts["train"] > 400  # ~450 of 500
    assert set(counts) == {"train", "val", "test"}


def test_split_seed_changes_assignment(spark):
    d = _docs(spark)
    w = {"a": 0.5, "b": 0.5}
    s1 = {r.doc_id: r.split for r in SM.deterministic_split(d, "doc_id", w, seed="s1").collect()}
    s2 = {r.doc_id: r.split for r in SM.deterministic_split(d, "doc_id", w, seed="s2").collect()}
    assert s1 != s2  # a fresh seed redraws


# -- stratified sampling ---------------------------------------------------
def test_stratified_sample_exact_counts_and_determinism(spark):
    d = _docs(spark)
    out = SM.stratified_sample(d, ["lang"], n_per_stratum=20, id_col="doc_id")
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(per[lang] == min(20, full[lang]) for lang in full)
    again = SM.stratified_sample(d.repartition(7), ["lang"], n_per_stratum=20, id_col="doc_id")
    assert sorted(r.doc_id for r in out.collect()) == sorted(r.doc_id for r in again.collect())


def test_sample_fraction_composes_disjointly(spark):
    d = _docs(spark)
    a = set(r.doc_id for r in SM.sample_fraction(d, "doc_id", 0.3).collect())
    b = set(r.doc_id for r in SM.sample_fraction(d, "doc_id", 0.7).collect())
    assert a <= b  # nested thresholds nest exactly
    assert 0.15 < len(a) / d.count() < 0.45


def test_sample_consistent_ch_sample_clause_laws(spark):
    """r9 (VERDICT r8 #4): the SAMPLE clause's documented laws —
    (a) superset consistency: sample(0.1) ⊆ sample(0.2) at one offset;
    (b) OFFSET bands at f=0.25 partition the keys exactly (disjoint,
    exhaustive); (c) keyed all-or-none: a key's rows never split
    across a band boundary; (d) invalid args refuse loudly."""
    import pytest

    ev = catalog.load(spark, SF_SMALL, "events")

    def users(frac, off):
        return {
            r.user_id
            for r in SM.sample_consistent(ev, frac, "user_id", offset=off)
            .select("user_id").distinct().collect()
        }

    assert users(0.1, 0.0) <= users(0.2, 0.0) <= users(0.4, 0.0)  # (a)
    bands = [users(0.25, o) for o in (0.0, 0.25, 0.5, 0.75)]
    all_users = {r.user_id for r in ev.select("user_id").distinct().collect()}
    assert set().union(*bands) == all_users  # (b) exhaustive
    for i in range(4):
        for j in range(i + 1, 4):
            assert not bands[i] & bands[j]  # (b) disjoint
    # (c) row counts per band sum to the table (no row lost or doubled)
    n = sum(
        SM.sample_consistent(ev, 0.25, "user_id", offset=o).count()
        for o in (0.0, 0.25, 0.5, 0.75)
    )
    assert n == ev.count()
    # wraparound band covers exactly its complement's complement
    wrap = users(0.3, 0.9)  # [0.9, 1) ∪ [0, 0.2)
    assert wrap == (users(0.1, 0.9) | users(0.2, 0.0))
    with pytest.raises(ValueError):
        SM.sample_consistent(ev, 1.5, "user_id")
    with pytest.raises(ValueError):
        SM.sample_consistent(ev, 0.5, "user_id", offset=1.0)


# -- text cleaning ---------------------------------------------------------
def test_clean_text_golden(spark):
    rows = [
        (1, "<p>Hello &amp; welcome</p> mail me at bob.smith+x@corp.example.org now"),
        (2, "server at 192.168.0.1 said\x07 hi   \t there"),
        (3, "plain text stays"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {r.id: r.c for r in df.select("id", TC.clean_text("t").alias("c")).collect()}
    assert out[1] == "Hello & welcome mail me at <EMAIL> now"
    assert out[2] == "server at <IP> said hi there"
    assert out[3] == "plain text stays"


def test_repetition_stats_golden(spark):
    df = spark.createDataFrame(
        [(1, "a b\na b\nc d"), (2, "x y\nz w")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in TC.repetition_stats(df).collect()}
    assert out[1].n_lines == 3 and out[1].n_distinct_lines == 2
    assert abs(out[1].dup_line_ratio - 1 / 3) < 1e-12
    assert out[1].max_line_chars == 3
    assert out[2].dup_line_ratio == 0.0 and out[2].dup_word_ratio == 0.0


# -- int8 quantization -----------------------------------------------------
def test_quantize_roundtrip_error_bound(spark):
    e = catalog.load(spark, SF_SMALL, "embeddings")
    qt = Q.quantized_table(e)
    err = qt.select(
        F.max(
            F.array_max(
                F.zip_with(
                    "embedding",
                    "q_codes",
                    lambda x, q: F.abs(x.cast("double") - q.cast("double") * F.col("q_scale")),
                )
            )
            / F.col("q_scale")
        ).alias("worst_ratio"),
        F.min(F.array_min("q_codes")).alias("lo"),
        F.max(F.array_max("q_codes")).alias("hi"),
    ).collect()[0]
    assert err.worst_ratio <= 0.5 + 1e-9  # half-ulp of the int8 grid
    assert -127 <= err.lo and err.hi <= 127


def test_int8_topk_recall_vs_exact(spark):
    from postgre_to_clickhouse_spark.operators.similarity import cosine_topk

    e = catalog.load(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id) for r in cosine_topk(e, q, k=10).collect()
    }
    qt = Q.quantized_table(e)
    qq = qt.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "q_codes", "q_scale")
    approx = {(r.query_id, r.vec_id) for r in Q.int8_topk(qt, qq, k=10).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"int8 recall {recall}"


# -- skew-safe per-stratum cap ---------------------------------------------
def test_capped_per_stratum_matches_single_window(spark):
    """The salted two-phase top-k must return EXACTLY the single-window
    rows — including on a deliberately skewed stratum mix and for any
    bucket count."""
    d = _docs(spark)
    # skew: collapse 80% of rows into one hot stratum
    skewed = d.withColumn(
        "dom", F.when(F.col("doc_id") % 5 != 4, F.lit("hot.example")).otherwise(F.col("source"))
    )
    want = {
        r.doc_id
        for r in SM.stratified_sample(skewed, ["dom"], 25, "doc_id", seed="cap-v1").collect()
    }
    for buckets in (1, 4, 16):
        got = {
            r.doc_id
            for r in SM.capped_per_stratum_skewsafe(
                skewed, "dom", 25, "doc_id", seed="cap-v1", salt_buckets=buckets
            ).collect()
        }
        assert got == want


def test_capped_per_stratum_small_strata_untouched(spark):
    d = _docs(spark).filter(F.col("doc_id") < 40)
    out = SM.capped_per_stratum_skewsafe(d, "source", 1000, "doc_id")
    assert out.count() == d.count()


# -- incremental corpus dedup ----------------------------------------------
def test_dedup_against_corpus_drops_seen_and_within_batch(spark):
    from postgre_to_clickhouse_spark.operators.dedup import dedup_against_corpus

    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["doc_id", "text"]
    )
    newb = spark.createDataFrame(
        [(10, "alpha"),   # already in corpus -> dropped
         (11, "gamma"),   # fresh
         (12, "gamma"),   # duplicate within batch -> 11 survives
         (13, "delta")],
        ["doc_id", "text"],
    )
    out = dedup_against_corpus(newb, corpus, content_cols=("text",), order_col="doc_id")
    assert {r.doc_id for r in out.collect()} == {11, 13}


def test_dedup_against_corpus_idempotent(spark):
    """Re-ingesting an already-deduped batch against corpus ∪ batch
    yields nothing — the day-N+1 no-op."""
    from postgre_to_clickhouse_spark.operators.dedup import dedup_against_corpus

    d = _docs(spark)
    newb = d.filter(F.col("doc_id") % 5 == 4)
    corpus = d  # batch already ingested
    assert dedup_against_corpus(newb, corpus, ("text",), "doc_id").count() == 0


# -- SemDedup (round 4) ----------------------------------------------------
def test_semdedup_prunes_known_duplicates(spark):
    """Two near-identical vectors land in one cluster; the higher id is
    shadowed. Orthogonal vectors survive."""
    from postgre_to_clickhouse_spark.operators.semdedup import semdedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 1 -> pruned
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.is_kept for r in semdedup(df, n_lists=2, threshold=0.95).collect()}
    assert out[2] is False
    assert out[1] and out[3] and out[4]


def test_semdedup_deterministic_across_layouts(spark):
    """Same corpus at different partitioning -> identical prune set
    (required for the committed-golden oracle)."""
    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.semdedup import semdedup

    e = catalog.load(spark, "/root/testdata/sf0.001", "embeddings")
    a = sorted(map(tuple, semdedup(e).collect()))
    b = sorted(map(tuple, semdedup(e.repartition(7)).collect()))
    assert a == b and len(a) == e.count()


# -- BM25 (round 4) --------------------------------------------------------
def test_bm25_ranks_shared_rare_term_highest(spark):
    """A query sharing a RARE term with one doc must rank that doc above
    docs sharing only common terms (idf dominates)."""
    from postgre_to_clickhouse_spark.operators.retrieval import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the slow brown dog"),
            (3, "the zzyzx protocol"),      # rare term zzyzx
            (4, "the the the the"),
        ],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame([(100, "zzyzx brown")], ["query_id", "text"])
    got = {r.doc_id: r.score for r in bm25_scores(docs, q).collect()}
    assert got[3] == max(got.values())  # rare-term doc wins
    # doc 4 shares no query term -> absent from candidates entirely
    assert set(got) == {1, 2, 3}


def test_semdedup_arrow_jvm_paths_agree(spark):
    """The BLAS group scorer and the JVM self-join fold must produce the
    same prune set (threshold decisions differ only if a pair sits
    within float-rounding of tau, which the fixtures don't)."""
    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.semdedup import semdedup

    e = catalog.load(spark, "/root/testdata/sf0.001", "embeddings")
    a = sorted(map(tuple, semdedup(e, arrow=True).collect()))
    j = sorted(map(tuple, semdedup(e, arrow=False).collect()))
    assert a == j


# -- token-budget sampling (round 4) ---------------------------------------
def test_token_budget_sample_prefix_and_bound(spark):
    """Kept rows per stratum must be exactly the md5-order prefix whose
    inclusive running token count fits the budget: order-prefix closed
    (no kept row after a dropped one in hash order) and bounded."""
    d = _docs(spark)
    out = SM.token_budget_sample(d, ["lang"], budget_tokens=3000)
    rows = out.select("lang", "cum_tokens", "n_tokens").collect()
    assert rows, "budget too small for any doc?"
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        assert max(r.cum_tokens for r in rs) <= 3000
        # cum of the kept set is contiguous: sorted cums == running sum
        cums = sorted(r.cum_tokens for r in rs)
        toks = [r.n_tokens for r in sorted(rs, key=lambda x: x.cum_tokens)]
        run = 0
        for c, t in zip(cums, toks):
            run += t
            assert c == run, f"{lang}: gap in prefix (kept set not hash-order closed)"


# -- cross-doc duplicated spans (r5) ---------------------------------------
def test_dup_span_coverage_union_not_double_counted(spark):
    from postgre_to_clickhouse_spark.operators.spans import dup_span_coverage

    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"  # 10 tokens -> 3 dup 8-grams
    rows = [
        (1, shared + " a1 a2 a3 a4 a5"),       # 15 tokens, 10 covered
        (2, "b1 b2 b3 b4 b5 " + shared),       # 15 tokens, 10 covered
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),     # unique -> coverage 0
        (4, "short doc"),                       # < n tokens -> no grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dup_span_coverage(df, n=8).collect()}
    assert set(out) == {1, 2, 3, 4}
    # 3 overlapping grams cover the union [0,9] / [5,14]: 10 tokens, not 24
    assert out[1].dup_grams == 3 and out[1].covered_tokens == 10
    assert out[2].dup_grams == 3 and out[2].covered_tokens == 10
    assert abs(out[1].coverage - 10 / 15) < 1e-15
    assert out[3].covered_tokens == 0 and out[3].coverage == 0.0
    assert out[4].n_tokens == 2 and out[4].covered_tokens == 0


def test_dup_span_within_doc_repeat_is_not_cross_doc(spark):
    from postgre_to_clickhouse_spark.operators.spans import dup_span_coverage

    rep = " ".join(["r1 r2 r3 r4 r5 r6 r7 r8"] * 2)  # same 8-gram twice, ONE doc
    df = spark.createDataFrame(
        [(1, rep), (2, "x1 x2 x3 x4 x5 x6 x7 x8 x9")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in dup_span_coverage(df, n=8).collect()}
    # min_docs counts DISTINCT docs -> within-doc repetition alone is not a dup
    assert out[1].covered_tokens == 0 and out[2].covered_tokens == 0


def test_dup_span_disjoint_islands_sum(spark):
    from postgre_to_clickhouse_spark.operators.spans import dup_span_coverage

    s1 = "a1 a2 a3 a4 a5 a6 a7 a8"
    s2 = "b1 b2 b3 b4 b5 b6 b7 b8"
    rows = [
        (1, s1 + " gap1 gap2 " + s2),  # two disjoint shared islands: 8 + 8
        (2, s1 + " zz " + "q1 q2 q3 q4 q5 q6 q7"),
        (3, s2 + " yy"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dup_span_coverage(df, n=8).collect()}
    assert out[1].covered_tokens == 16 and out[1].dup_grams == 2


# -- heavy-hitter sketch (r5) ----------------------------------------------
def test_approx_topk_exact_regime_matches_groupby(spark):
    from postgre_to_clickhouse_spark.operators.sketch import approx_topk

    d = _docs(spark)
    toks = d.select(
        F.explode(F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "")).alias("item")
    )
    truth = {
        r.item: r.cnt
        for r in toks.groupBy("item").agg(F.count("*").alias("cnt")).collect()
    }
    out = approx_topk(toks, "item", k=10, capacity=100_000).collect()
    assert len(out) == 10
    expected = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    for row, (tok, cnt) in zip(out, expected):
        assert (row.item, row.lb, row.ub) == (tok, cnt, cnt)


def test_approx_topk_truncated_bounds_contain_truth(spark):
    from pyspark.sql import Row
    from postgre_to_clickhouse_spark.operators.sketch import approx_topk

    # Zipf-ish: item_i appears (50 - i) times, 40 items, capacity 8 << 40
    rows = [Row(item=f"t{i:02d}") for i in range(40) for _ in range(50 - i)]
    df = spark.createDataFrame(rows).repartition(4, "item")
    truth = {f"t{i:02d}": 50 - i for i in range(40)}
    out = approx_topk(df, "item", k=15, capacity=8).collect()
    assert len(out) == 15
    for r in out:
        assert r.lb <= truth[r.item] <= r.ub, (r.item, r.lb, truth[r.item], r.ub)
    # heavy head must survive truncation: top-5 true items present
    got = {r.item for r in out}
    assert {f"t{i:02d}" for i in range(5)} <= got


# -- target-weight mixture + semantic decontamination (r5) ------------------
def test_mixture_sample_hits_target_proportions(spark):
    d = _docs(spark)
    w = {"en": 0.30, "zh": 0.25, "es": 0.20, "de": 0.15, "fr": 0.10}
    out = SM.mixture_sample(d, "lang", "doc_id", w)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = sum(got.values())
    # binding stratum (smallest n/w) kept whole; others near target share
    counts = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    binding = min(counts, key=lambda s: counts[s] / w[s])
    assert got[binding] == counts[binding]
    for s, ws in w.items():
        assert abs(got[s] / total - ws) < 0.08, (s, got[s] / total, ws)


def test_mixture_sample_is_layout_independent_and_drops_unweighted(spark):
    d = _docs(spark)
    w = {"en": 0.5, "de": 0.5}  # zh/es/fr unweighted -> dropped
    base = sorted(r.doc_id for r in SM.mixture_sample(d, "lang", "doc_id", w).collect())
    shuf = sorted(
        r.doc_id
        for r in SM.mixture_sample(d.repartition(13).orderBy(F.rand(7)), "lang", "doc_id", w).collect()
    )
    assert base == shuf and base
    langs = {r.lang for r in SM.mixture_sample(d, "lang", "doc_id", w).select("lang").distinct().collect()}
    assert langs <= {"en", "de"}


def test_semantic_decontaminate_flags_planted_dup(spark):
    from postgre_to_clickhouse_spark.operators.similarity import semantic_decontaminate

    vecs = catalog.load(spark, SF_SMALL, "embeddings")
    # plant the eval set as exact copies of corpus vectors 1..3
    ev = vecs.filter("vec_id IN (1,2,3)").select(F.col("embedding").alias("ev_vec"))
    out = semantic_decontaminate(vecs, ev, threshold=0.999999)
    flagged = {r.vec_id for r in out.filter("contaminated").collect()}
    assert {1, 2, 3} <= flagged  # identical vectors: cosine == 1
    assert out.count() == vecs.count()  # audit frame keeps every row


def test_interleave_prefixes_track_target_mixture(spark):
    """Stride scheduling: every reasonable epoch prefix holds each
    language in ~target proportion (the property exhaust-one-source
    interleaving lacks), and each language's internal order is the
    content-addressed hash order (monotone positions)."""
    from postgre_to_clickhouse_spark.queries.registry import QUERIES

    out = QUERIES["interleave_datasets_order"](spark, "/root/testdata/sf0.01").collect()
    rows = sorted(out, key=lambda r: r.interleave_pos)
    w = {"en": 0.30, "zh": 0.25, "es": 0.20, "de": 0.15, "fr": 0.10}
    # binding source caps the usable epoch; prefixes up to ~50% of it
    for frac in (0.2, 0.5):
        n = int(len(rows) * frac)
        prefix = rows[:n]
        for lang, ws in w.items():
            got = sum(1 for r in prefix if r.lang == lang) / n
            assert abs(got - ws) < 0.07, (frac, lang, got, ws)
    # per-language positions strictly increase in hash order
    import hashlib

    for lang in w:
        seq = [r.doc_id for r in rows if r.lang == lang]
        keyed = sorted(seq, key=lambda i: (hashlib.md5(f"il1:{i}".encode()).hexdigest(), i))
        assert seq == keyed


def test_bpe_train_and_encode(spark):
    """r6 BPE: merges learn the frequent pair first (deterministic
    tie-break), encoding applies them greedily by rank, unseen words
    fall back to characters."""
    from postgre_to_clickhouse_spark.operators.bpe import (
        _encode_word,
        bpe_encode,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "aa ab aa aa"), (2, "aa ab bb"), (3, "aa aa")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=2)
    # 'aa' x6 makes both (a,a) and (a,</w>) count 6; the deterministic
    # tie-break takes the lexicographically smaller ('<' < 'a'), then
    # round two merges the dominant (a, a</w>)
    assert merges[0] == ("a", "</w>")
    assert merges[1] == ("a", "a</w>")
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word("aa", ranks) == ["aa</w>"]
    assert _encode_word("ab", ranks) == ["a", "b", "</w>"]
    assert _encode_word("zq", ranks) == ["z", "q", "</w>"]  # unseen -> chars
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    assert out[3].n_bpe_tokens == 2 and out[3].first_tokens == "aa</w> aa</w>"
    assert out[1].n_word_types == 2


def test_bpe_train_layout_independent(spark):
    """Same merges from any partitioning (exact aggregated counts)."""
    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.bpe import bpe_train
    from tests.conftest import SF_SMALL

    d = catalog.load(spark, SF_SMALL, "documents")
    m1 = bpe_train(d, num_merges=50)
    m2 = bpe_train(d.repartition(13), num_merges=50)
    assert m1 == m2


def test_pq_recall_and_layout_independence(spark):
    """r6 PQ: codebooks/codes identical from any partitioning, and ADC
    top-10 recalls most of the exact L2 top-10 (m=8, k=16 on 64-dim)."""
    import numpy as np

    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.pq import (
        fit_pq_codebooks,
        pq_encode,
        pq_topk,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    e = catalog.load(spark, SF_SMALL, "embeddings")
    b1 = fit_pq_codebooks(e, m=8, k=16)
    b2 = fit_pq_codebooks(e.repartition(7), m=8, k=16)
    assert np.array_equal(b1, b2)
    enc = pq_encode(e, b1)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    from postgre_to_clickhouse_spark.operators.pq import pq_rerank

    pool = pq_topk(enc, b1, q, k=64)
    got = pq_rerank(pool, e, q, k=10)
    approx = {}
    for r in got.collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    # exact L2 top-10 per query (numpy reference)
    pdf = e.select("vec_id", "embedding").toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    recalls = []
    for r in q.collect():
        qv = np.asarray(r.query_vec, dtype=np.float64)
        d = ((x - qv[None, :]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))
        exact = set(ids[order[:10]].tolist())
        recalls.append(len(exact & approx[r.query_id]) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.7, recalls  # ADC pool + exact re-rank
    # (the fixture embeddings are near-random — PQ's structural worst case;
    # clustered real embeddings recall far higher at the same pool)


def test_bpe_encode_null_and_empty_text(spark):
    from postgre_to_clickhouse_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([(1, ""), (2, None), (3, "ok")], "doc_id long, text string")
    out = {r.doc_id: r for r in bpe_encode(df, []).collect()}
    assert out[1].n_bpe_tokens == 0 and out[2].n_bpe_tokens == 0
    assert out[2].first_tokens == "" and out[3].n_bpe_tokens == 3  # o,k,</w>


def test_ivfpq_recall_and_layout_independence(spark):
    """r6 IVF-PQ: model identical from any partitioning; probing 3 of 8
    residual-coded lists with exact re-rank recalls most of the exact
    top-10 (floor reflects the near-random fixture embeddings — the
    structural worst case for both IVF and PQ)."""
    import numpy as np

    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.operators.pq import (
        fit_ivfpq,
        ivfpq_encode,
        ivfpq_topk,
        pq_rerank,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    e = catalog.load(spark, SF_SMALL, "embeddings")
    c1, b1 = fit_ivfpq(e, n_lists=8, m=8, k=16)
    c2, b2 = fit_ivfpq(e.repartition(9), n_lists=8, m=8, k=16)
    assert np.array_equal(c1, c2) and np.array_equal(b1, b2)
    enc = ivfpq_encode(e, c1, b1)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = pq_rerank(ivfpq_topk(enc, c1, b1, q, k=64, n_probe=3), e, q, k=10)
    approx = {}
    for r in got.collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    pdf = e.select("vec_id", "embedding").toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    recalls = []
    for r in q.collect():
        qv = np.asarray(r.query_vec, dtype=np.float64)
        d = ((x - qv[None, :]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))
        exact = set(ids[order[:10]].tolist())
        recalls.append(len(exact & approx[r.query_id]) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.35, recalls  # 3/8 lists probed


def test_lttb_properties(spark):
    """LTTB (operators/lttb.py): endpoints always kept, one point per
    bucket, short series pass through whole, result is layout- and
    input-order-independent, and a spike is preserved where a uniform
    stride would drop it."""
    import numpy as np
    from pyspark.sql import functions as F

    from postgre_to_clickhouse_spark.operators.lttb import lttb_downsample

    n = 300
    rows = []
    for i in range(n):
        v = 10.0 + (i % 7) * 0.25
        if i == 137:
            v = 500.0  # spike between stride points
        rows.append(("s", 1_700_000_000_000_000 + i * 60_000_000, v, i))
    df = spark.createDataFrame(rows, "serie string, x long, v double, i long")
    out = lttb_downsample(df, "serie", "x", "v", "i", n_out=20)
    got = sorted(map(tuple, out.collect()), key=lambda t: t[1])
    assert len(got) == 20
    assert got[0][2] == rows[0][1] and got[-1][2] == rows[-1][1]  # endpoints
    assert [g[1] for g in got] == list(range(20))
    assert any(g[3] == 500.0 for g in got), "spike lost"
    # strictly increasing ts across selections (one per bucket, ordered)
    ts = [g[2] for g in got]
    assert ts == sorted(ts) and len(set(ts)) == 20

    # layout/order independence: shuffled input, more partitions
    df2 = df.orderBy(F.rand(7)).repartition(13)
    got2 = sorted(map(tuple, lttb_downsample(
        df2, "serie", "x", "v", "i", n_out=20).collect()), key=lambda t: t[1])
    assert got2 == got

    # short series: all points, in order
    short = spark.createDataFrame(
        [("t", 100 + k, float(k), k) for k in range(7)],
        "serie string, x long, v double, i long",
    )
    outs = sorted(map(tuple, lttb_downsample(
        short, "serie", "x", "v", "i", n_out=20).collect()), key=lambda t: t[1])
    assert [o[2] for o in outs] == [100 + k for k in range(7)]

    import pytest
    with pytest.raises(ValueError, match="n_out"):
        lttb_downsample(df, "serie", "x", "v", "i", n_out=2)

    # y_scale=None -> plain float mean (standard LTTB; ADVICE r9): same
    # invariants, and on 2-decimal inputs the cent-quantized default
    # selects the identical points (a 2-decimal double * 100 is never
    # half-way, so rint(y*100)/100 is lossless)
    got3 = sorted(map(tuple, lttb_downsample(
        df, "serie", "x", "v", "i", n_out=20, y_scale=None).collect()),
        key=lambda t: t[1])
    assert len(got3) == 20 and any(g[3] == 500.0 for g in got3)
    assert got3 == got
    with pytest.raises(ValueError, match="y_scale"):
        lttb_downsample(df, "serie", "x", "v", "i", n_out=20, y_scale=0)


def test_interval_length_sum_matches_bruteforce(spark):
    """interval_length_sum_users' island merge vs a brute-force µs
    membership count on adversarial overlap patterns."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    iv = [  # (user, start, end): nested, chained, disjoint, touching
        (1, 0, 100), (1, 10, 20), (1, 90, 150), (1, 200, 210),
        (2, 5, 5), (2, 5, 7), (2, 7, 9), (2, 20, 30),
        (3, 0, 1000),
    ]
    df = spark.createDataFrame(iv, "user_id int, s long, e long")
    w_prev = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, -1)
    w_run = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    marked = df.withColumn(
        "ni", F.when(F.col("s") > F.max("e").over(w_prev), 1).otherwise(0))
    merged = (
        marked.withColumn("isl", F.sum("ni").over(w_run))
        .groupBy("user_id", "isl")
        .agg((F.max("e") - F.min("s")).alias("len"))
        .groupBy("user_id")
        .agg(F.sum("len").alias("union_len"))
    )
    got = {r.user_id: r.union_len for r in merged.collect()}
    want = {}
    for u in {t[0] for t in iv}:
        pts = set()
        for uu, s, e in iv:
            if uu == u:
                pts.update(range(s, e))
        want[u] = len(pts)
    assert got == want, (got, want)


def test_geohash_matches_textbook_and_roundtrips(spark):
    """operators/geo.py vs the textbook bisection geohash across
    precisions (incl. odd — lon gets the extra bit) and edge
    coordinates; decode returns the cell center (re-encodes to the
    same cell)."""
    from pyspark.sql import functions as F

    from postgre_to_clickhouse_spark.operators.geo import (
        geohash_decode,
        geohash_encode,
    )

    def ref(lon, lat, p):
        alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
        bits, out, even, ch = 0, "", True, 0
        while len(out) < p:
            r, v = (lon_r, lon) if even else (lat_r, lat)
            mid = (r[0] + r[1]) / 2
            if v >= mid:
                ch |= (16, 8, 4, 2, 1)[bits]
                r[0] = mid
            else:
                r[1] = mid
            even = not even
            if bits < 4:
                bits += 1
            else:
                out += alpha[ch]
                bits, ch = 0, 0
        return out

    cases = [(-5.6, 42.6), (13.361389, 38.115556), (0.0, 0.0),
             (-179.9, -89.9), (179.9, 89.9), (2.3522, 48.8566),
             (180.0, 90.0)]  # boundary clamps into the last cell
    df = spark.createDataFrame(cases, "lon double, lat double")
    for p in (3, 4, 5, 6):
        enc = df.select(
            "lon", "lat", geohash_encode(F.col("lon"), F.col("lat"), p).alias("gh")
        )
        dl, dlat = geohash_decode(F.col("gh"), p)
        rows = enc.select("lon", "lat", "gh",
                          geohash_encode(dl, dlat, p).alias("gh2")).collect()
        for r in rows:
            if r.lon < 180.0 and r.lat < 90.0:  # ref doesn't clamp
                assert r.gh == ref(r.lon, r.lat, p), (p, r.lon, r.lat)
            assert r.gh2 == r.gh, (p, r.gh)  # center stays in its cell

    import pytest
    with pytest.raises(ValueError):
        geohash_encode(F.col("lon"), F.col("lat"), 0)
    with pytest.raises(NotImplementedError):
        geohash_encode(F.col("lon"), F.col("lat"), 7)


def test_geohashes_in_box_covers_exactly(spark):
    """geohashesInBox: every point in the box encodes to a member cell,
    the set size is the closed-form grid product, and an inverted box
    is empty."""
    from pyspark.sql import functions as F

    from postgre_to_clickhouse_spark.operators.geo import (
        geohash_encode,
        geohashes_in_box,
    )

    df = spark.createDataFrame(
        [(-10.0, 20.0, -5.0, 30.0)], "lon1 double, lon2 double, lat1 double, lat2 double"
    )
    cells = df.select(
        geohashes_in_box(
            F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"), 3
        ).alias("c")
    ).collect()[0].c
    # closed-form grid: p=3 -> lon 8 bits (256 cells/360deg), lat 7 (128/180)
    import math
    lo1 = min(255, math.floor((-10.0 + 180) / 360 * 256))
    lo2 = min(255, math.floor((20.0 + 180) / 360 * 256))
    la1 = min(127, math.floor((-5.0 + 90) / 180 * 128))
    la2 = min(127, math.floor((30.0 + 90) / 180 * 128))
    assert len(cells) == (lo2 - lo1 + 1) * (la2 - la1 + 1)
    assert len(set(cells)) == len(cells)
    # every interior sample point's hash is a member
    pts = [(-10.0 + i * 1.7, -5.0 + i * 1.9) for i in range(18)]
    pdf = spark.createDataFrame(
        [p for p in pts if p[0] <= 20 and p[1] <= 30], "lon double, lat double"
    )
    got = pdf.select(geohash_encode(F.col("lon"), F.col("lat"), 3).alias("g")).collect()
    assert all(r.g in set(cells) for r in got)
    # inverted box -> empty
    empty = df.select(
        geohashes_in_box(F.col("lon2"), F.col("lat1"), F.col("lon1"), F.col("lat2"), 3)
        .alias("c")
    ).collect()[0].c
    assert empty == []


def test_bucketed_prefix_sums_degenerate_and_exact(spark):
    """operators/ranks.py: the two-phase prefix sum equals a direct
    cumulative, including the all-equal-values (single bucket) branch
    and multi-column sums."""
    from pyspark.sql import functions as F

    from postgre_to_clickhouse_spark.operators.ranks import (
        bucketed_prefix_sums,
        tie_averaged_ranks,
    )

    rows = [(float(v % 13) * 0.5, v % 3 + 1, (v * v) % 5) for v in range(200)]
    df = (
        spark.createDataFrame(rows, "v double, a long, b long")
        .groupBy("v")
        .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    )
    got = {
        r.v: (r.cum_a, r.cum_b)
        for r in bucketed_prefix_sums(df, "v", ["a", "b"], n_buckets=8).collect()
    }
    acc_a = acc_b = 0
    for v, a, b in sorted(
        (r.v, r.a, r.b) for r in df.collect()
    ):
        acc_a += a
        acc_b += b
        assert got[v] == (acc_a, acc_b), v
    # degenerate: one distinct value -> hi == lo branch
    one = spark.createDataFrame([(7.0, 5)], "v double, c long")
    r = tie_averaged_ranks(one, "v", "c").collect()[0]
    assert (r.rk, r.avg_rank) == (1, 3.0)


def test_dsir_layout_independence_and_semantics(spark):
    """r13: DSIR selection (operators/dsir.py) is content-addressed —
    repartitioning the corpus cannot change the model, the weights, or
    the selected set — and it actually RESAMPLES toward the target:
    docs sharing the target's vocabulary carry higher importance
    weights than disjoint-vocabulary docs."""
    from postgre_to_clickhouse_spark.operators.dsir import (
        dsir_bucket_counts,
        dsir_select,
    )

    rows = [(i, "alpha beta gamma delta alpha beta") for i in range(10)]
    rows += [(i, "zulu yankee xray whiskey victor uniform")
             for i in range(10, 20)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    target = d.filter(F.col("doc_id") < 3)  # alpha-vocabulary docs

    sel = dsir_select(d, target, k=8, n_buckets=256)
    got = {r["doc_id"]: r["dsir_logw_q"] for r in sel.collect()}
    assert len(got) == 8
    # weights separate the vocabularies: every alpha doc outweighs
    # every zulu doc (identical texts share identical weights)
    w = {r["doc_id"]: r["dsir_logw_q"]
         for r in dsir_select(d, target, k=20, n_buckets=256).collect()}
    alpha_w = {w[i] for i in range(10)}
    zulu_w = {w[i] for i in range(10, 20)}
    assert len(alpha_w) == 1 and len(zulu_w) == 1
    assert alpha_w.pop() > zulu_w.pop()
    # layout independence: 1-partition vs 16-partition identical
    sel_a = sorted(map(tuple, dsir_select(
        d.coalesce(1), target.coalesce(1), k=8, n_buckets=256).collect()))
    sel_b = sorted(map(tuple, dsir_select(
        d.repartition(16), target.repartition(16), k=8,
        n_buckets=256).collect()))
    assert sel_a == sel_b == sorted(map(tuple, sel.collect()))
    # the model is B-bounded: counts vector length == n_buckets,
    # total mass == total gram occurrences (unigrams + bigrams)
    counts = dsir_bucket_counts(d, n_buckets=256)
    assert len(counts) == 256
    assert sum(counts) == 20 * (6 + 5)
    # empty text scores 0 (no grams), never errors
    e = spark.createDataFrame([(99, "")], "doc_id long, text string")
    r = dsir_select(e.union(d), target, k=30, n_buckets=256) \
        .filter(F.col("doc_id") == 99).collect()
    assert len(r) == 1 and r[0]["dsir_logw_q"] == 0


# -- sequence packing (r13, operators/packing.py) ---------------------------
def test_pack_sequences_covers_stream_exactly(spark):
    """Per shard: offsets are a gapless 0-based concatenation (each
    doc starts where the previous ended) and the last block index is
    ceil(total/capacity) - 1 — the concat-and-chunk contract."""
    from postgre_to_clickhouse_spark.operators import packing as PK
    from postgre_to_clickhouse_spark.operators.text import token_count

    d = _docs(spark).select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n"))
    out = PK.pack_sequences(d, "doc_id", "n", capacity=256, n_shards=4)
    rows = out.collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.pack_shard, []).append(r)
    assert set(by_shard) <= {0, 1, 2, 3}
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        at = 0
        for r in rs:
            assert r.pack_offset == at
            assert r.pack_block_first == at // 256
            assert r.pack_block_last == (at + r.n - 1) // 256
            assert r.pack_n_blocks == r.pack_block_last - r.pack_block_first + 1
            at += r.n
        total = at
        assert rs[-1].pack_block_last == (total - 1) // 256
    stats = {r.pack_shard: r for r in
             PK.pack_shard_stats(out, "n", 256).collect()}
    for shard, rs in by_shard.items():
        total = sum(r.n for r in rs)
        s = stats[shard]
        assert s.n_docs == len(rs) and s.n_tokens == total
        assert s.n_blocks == -(-total // 256)
        assert abs(s.fill_ratio - total / (s.n_blocks * 256)) < 1e-12


def test_pack_sequences_layout_independent(spark):
    from postgre_to_clickhouse_spark.operators import packing as PK
    from postgre_to_clickhouse_spark.operators.text import token_count

    d = _docs(spark).select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n"))
    base = sorted(map(tuple, PK.pack_sequences(
        d, "doc_id", "n", 256, 4).collect()))
    moved = sorted(map(tuple, PK.pack_sequences(
        d.repartition(13).orderBy(F.rand(7)), "doc_id", "n",
        256, 4).collect()))
    assert base == moved


def test_pack_bins_nosplit_first_fit(spark):
    """No-split first-fit: every bin fits the capacity, no document
    splits, and the placement equals a local reference first-fit over
    the same deterministic order."""
    from postgre_to_clickhouse_spark.operators import packing as PK

    d = _docs(spark).select(
        "doc_id", (F.length("text") % 200 + 1).cast("long").alias("n"))
    out = PK.pack_bins_nosplit(d, "doc_id", "n", capacity=256, n_shards=4)
    rows = out.collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.pack_shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        # reference first-fit
        remaining, want = [], []
        for r in rs:
            for b, space in enumerate(remaining):
                if r.n <= space:
                    remaining[b] = space - r.n
                    want.append(b)
                    break
            else:
                remaining.append(256 - r.n)
                want.append(len(remaining) - 1)
        assert [r.pack_bin for r in rs] == want
        # capacity respected
        fill: dict[int, int] = {}
        for r in rs:
            fill[r.pack_bin] = fill.get(r.pack_bin, 0) + r.n
        assert all(v <= 256 for v in fill.values())
    # layout independence
    moved = sorted(map(tuple, PK.pack_bins_nosplit(
        d.repartition(9).orderBy(F.rand(5)), "doc_id", "n",
        256, 4).collect()))
    assert sorted(map(tuple, rows)) == moved


def test_pack_bins_nosplit_oversize_refuses(spark):
    import pytest as _pytest

    from postgre_to_clickhouse_spark.operators import packing as PK

    d = spark.createDataFrame([(1, 10), (2, 500)], "doc_id long, n long")
    with _pytest.raises(Exception, match="exceeds the no-split capacity"):
        PK.pack_bins_nosplit(d, "doc_id", "n", capacity=256,
                             n_shards=2).collect()


def test_quality_classifier_semantics_and_layout_independence(spark):
    """r15 (VERDICT r14 #3): the CCNet/fastText-style classifier
    (operators/quality_clf.py) — the NB-log-odds fit separates the
    vocabularies it was trained on, the bias carries the document
    prior, scoring is content-addressed (layout cannot change the
    model or a single score), and degenerate inputs behave."""
    import math

    import pytest as _pytest

    from postgre_to_clickhouse_spark.operators.quality_clf import (
        fit_quality_classifier,
        quality_classifier_select,
        score_quality,
    )

    rows = [(i, "alpha beta gamma delta alpha beta", True)
            for i in range(10)]
    rows += [(i, "zulu yankee xray whiskey victor uniform", False)
             for i in range(10, 20)]
    labeled = spark.createDataFrame(
        rows, "doc_id long, text string, label boolean")

    w, bias = fit_quality_classifier(labeled, n_buckets=256)
    assert len(w) == 256
    # balanced classes -> zero prior
    assert bias == 0
    # a doc made of positive vocabulary scores > 0, negative < 0,
    # and identical texts score identically regardless of layout
    scored = score_quality(
        labeled.select("doc_id", "text"), w, bias, n_buckets=256)
    got = {r["doc_id"]: (r["qclf_score_q"], r["qclf_keep"])
           for r in scored.collect()}
    assert all(got[i][0] > 0 and got[i][1] == 1 for i in range(10))
    assert all(got[i][0] < 0 and got[i][1] == 0 for i in range(10, 20))
    assert len({got[i] for i in range(10)}) == 1
    re_got = {r["doc_id"]: (r["qclf_score_q"], r["qclf_keep"])
              for r in score_quality(
                  labeled.select("doc_id", "text").repartition(16),
                  w, bias, n_buckets=256).collect()}
    assert re_got == got
    # refit on a different layout -> identical model
    w2, bias2 = fit_quality_classifier(
        labeled.repartition(16), n_buckets=256)
    assert (w2, bias2) == (w, bias)
    # imbalanced prior: 10 pos vs 5 neg -> bias = round(ln 2 * 1e6)
    _, bias3 = fit_quality_classifier(
        labeled.filter((F.col("label")) | (F.col("doc_id") < 15)),
        n_buckets=256)
    assert bias3 == round(math.log(2.0) * 1e6)
    # empty text scores exactly the bias (no grams), never errors
    empty = spark.createDataFrame([(99, "")], "doc_id long, text string")
    r = score_quality(empty, w, bias, n_buckets=256).collect()[0]
    assert r["qclf_score_q"] == bias
    # single-class training refuses loudly
    with _pytest.raises(ValueError, match="BOTH classes"):
        fit_quality_classifier(labeled.filter("label"), n_buckets=256)
    # ADVICE r15 (single-pass fit): a NULL-text document still counts
    # toward the class prior — the sentinel row rides coalesce()
    with_null = labeled.unionByName(spark.createDataFrame(
        [(98, None, False)], "doc_id long, text string, label boolean"))
    _, bias4 = fit_quality_classifier(with_null, n_buckets=256)
    assert bias4 == round(math.log(10.0 / 11.0) * 1e6)
    # end-to-end convenience wrapper agrees with the manual path
    e2e = quality_classifier_select(
        labeled.select("doc_id", "text"),
        labeled.filter("label").select("doc_id", "text"),
        labeled.filter("NOT label").select("doc_id", "text"),
        n_buckets=256,
    )
    assert {r["doc_id"]: (r["qclf_score_q"], r["qclf_keep"])
            for r in e2e.collect()} == got


def test_kneser_ney_bigram_model_properties(spark):
    """r15 s2: the interpolated-KN bigram model (operators/kn_lm.py)
    — per-context probabilities sum to EXACTLY the discounted mass +
    backoff mass = 1 over seen continuations' model rows plus the
    unseen remainder, scores are layout-independent, continuation
    counts (not frequencies) drive the backoff, and degenerate docs
    drop out."""
    import math

    from postgre_to_clickhouse_spark.operators.kn_lm import (
        _bigram_pairs,
        kn_bigram_model,
        kneser_ney_bigram_scores,
    )

    rows = [
        (0, "san francisco san francisco san diego"),
        (1, "new york new york new jersey"),
        (2, "san francisco new york"),
        (3, "one"),       # 1 token -> no bigrams -> drops out
        (4, ""),          # empty -> drops out
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = _bigram_pairs(df, "text", "doc_id")
    model, nbi = kn_bigram_model(pairs, discount=0.75)
    m = {(r["a"], r["b"]): r for r in model.collect()}
    assert nbi == len(m)
    # reconstruct P(b|a) from the quantized lp and check the full
    # conditional sums to 1: sum over SEEN b of P + unseen mass
    # (D*n1a/ca * sum of Pcont over unseen b) = 1
    by_a = {}
    for (a, b), r in m.items():
        by_a.setdefault(a, []).append(r)
    n1b_all = {}
    for (a, b), r in m.items():
        n1b_all[b] = r["n1b"]
    for a, rows_a in by_a.items():
        ca, n1a = rows_a[0]["ca"], rows_a[0]["n1a"]
        seen_b = {r["b"] for r in rows_a}
        p_seen = sum(math.exp(-r["lp_q"] / 1e6) for r in rows_a)
        pcont_unseen = sum(
            n1b_all[b] / nbi for b in n1b_all if b not in seen_b
        )
        total = p_seen + (0.75 * n1a / ca) * pcont_unseen
        assert abs(total - 1.0) < 1e-4, (a, total)
    # KN's continuation insight: 'francisco' only ever follows 'san'
    # (novelty 1) while 'new' opens several contexts — Pcont ranks by
    # left-context DIVERSITY, not raw frequency
    assert n1b_all["york"] > n1b_all["francisco"] - 1  # both well-defined
    # scores: exact integers, layout-independent, degenerate docs out
    s1 = {r["doc_id"]: (r["n_bigrams"], r["kn_nll_q"])
          for r in kneser_ney_bigram_scores(df).collect()}
    s2 = {r["doc_id"]: (r["n_bigrams"], r["kn_nll_q"])
          for r in kneser_ney_bigram_scores(df.repartition(16)).collect()}
    assert s1 == s2
    assert set(s1) == {0, 1, 2}
    assert s1[0][0] == 5 and s1[1][0] == 5 and s1[2][0] == 3
    assert all(isinstance(v[1], int) for v in s1.values())
    # ADVICE r15: the discount must satisfy 0 < D < 1 — anything else
    # can drive P to 0/negative for singleton bigrams and ln() to
    # NaN/Inf; refuse loudly instead of quantizing garbage
    import pytest as _pytest

    for bad in (0.0, 1.0, 1.5, -0.5):
        with _pytest.raises(ValueError, match="0 < D < 1"):
            kn_bigram_model(pairs, discount=bad)


def test_kn_modified_trigram_model_properties(spark):
    """r16 (VERDICT r15 #3): the MODIFIED-KN trigram chain
    (operators/kn_lm.py) — Chen & Goodman's three-discount estimator
    at both n-gram levels (KenLM's estimator at order 3). The per-
    context probability mass sums to EXACTLY 1 over the closed
    continuation vocabulary (seen trigram rows + the backoff mass
    through the adjusted-count bigram chain), scores are layout-
    independent exact integers, the discounts come from the
    count-of-counts closed form, and degenerate corpora refuse
    loudly like KenLM does."""
    import math
    import random

    import pytest as _pytest

    from postgre_to_clickhouse_spark.operators.kn_lm import (
        _trigram_triples,
        kn_modified_discounts,
        kn_modified_trigram_model,
        kn_modified_trigram_scores,
    )

    rng = random.Random(7)
    # Zipf draws over a 30-word vocab: both count-of-counts tables
    # get n1..n4 > 0 AND in-range discounts (checked empirically —
    # tiny vocabularies make counts cluster and push D2 negative)
    vocab = [f"w{i}" for i in range(30)]
    weights = [1.0 / (k + 1) for k in range(30)]
    rows = [
        (i, " ".join(rng.choices(vocab, weights=weights, k=20)))
        for i in range(80)
    ]
    rows += [(97, "one two"), (98, "one"), (99, "")]  # <3 tokens: out
    df = spark.createDataFrame(rows, "doc_id long, text string")
    triples = _trigram_triples(df, "text", "doc_id")
    model, stats = kn_modified_trigram_model(triples)
    # the fitted discounts ARE the closed form of the count-of-counts
    assert stats["t_discounts"] == kn_modified_discounts(*stats["coc3"])
    assert stats["b_discounts"] == kn_modified_discounts(*stats["coc2"])
    t1, t2, t3 = stats["t_discounts"]
    b1, b2, b3 = stats["b_discounts"]
    big_u = stats["U"]
    m = model.collect()
    # rebuild the chain's tables from the model rows (every adjusted
    # (b,c) pair and every continuation token appears in >=1 row)
    a2 = {(r["b"], r["c"]): r["ac"] for r in m}
    bstat = {r["b"]: (r["bctx"], r["g1"], r["g2"], r["g3"]) for r in m}
    u = {r["c"]: r["u"] for r in m}
    assert sum(u.values()) == big_u  # unigram continuation closes

    def dt(x):
        return t1 if x == 1 else t2 if x == 2 else t3

    def db(x):
        return b1 if x == 1 else b2 if x == 2 else b3

    def pbg(b, c):
        bctx, g1, g2, g3 = bstat[b]
        ac = a2.get((b, c), 0)
        disc = max(ac - db(ac), 0.0) / bctx if ac else 0.0
        gamma2 = (b1 * g1 + b2 * g2 + b3 * g3) / bctx
        return disc + gamma2 * (u[c] / big_u)

    by_ctx = {}
    for r in m:
        by_ctx.setdefault((r["a"], r["b"]), []).append(r)
    for (a, b), rows_ab in by_ctx.items():
        ctx, f1, f2, f3 = (rows_ab[0][k] for k in
                           ("ctx", "f1", "f2", "f3"))
        gamma3 = (t1 * f1 + t2 * f2 + t3 * f3) / ctx
        seen = {r["c"] for r in rows_ab}
        p_seen = sum(math.exp(-r["lp_q"] / 1e6) for r in rows_ab)
        p_unseen = gamma3 * sum(pbg(b, c) for c in u if c not in seen)
        assert abs(p_seen + p_unseen - 1.0) < 1e-4, (a, b)
    # per-doc scores: exact ints, layout-independent, <3-token docs out
    s1 = {r["doc_id"]: (r["n_trigrams"], r["kn3_nll_q"])
          for r in kn_modified_trigram_scores(df).collect()}
    s2 = {r["doc_id"]: (r["n_trigrams"], r["kn3_nll_q"])
          for r in kn_modified_trigram_scores(
              df.repartition(16)).collect()}
    assert s1 == s2
    assert set(s1) == set(range(80))
    assert all(v[0] == 18 and isinstance(v[1], int) for v in s1.values())
    # degenerate corpus (every trigram unique -> n2 = 0) refuses like
    # KenLM ("could not calculate discounts")
    tiny = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="count-of-counts"):
        kn_modified_trigram_model(_trigram_triples(tiny, "text", "doc_id"))
    with _pytest.raises(ValueError, match="count-of-counts"):
        kn_modified_discounts(5, 0, 1, 1)
    # KenLM's --discount_fallback: the level falls back WHOLE to
    # (0.5, 1.0, 1.5) — undefined AND out-of-range cases both
    from postgre_to_clickhouse_spark.operators.kn_lm import (
        KN_FALLBACK_DISCOUNTS,
    )

    assert kn_modified_discounts(
        5, 0, 1, 1, fallback=KN_FALLBACK_DISCOUNTS
    ) == (0.5, 1.0, 1.5)
    assert kn_modified_discounts(
        207, 121, 354, 700, fallback=KN_FALLBACK_DISCOUNTS
    ) == (0.5, 1.0, 1.5)  # the sf0.1 trigram table: D2 < 0 closed-form
    with _pytest.raises(ValueError, match="outside their"):
        kn_modified_discounts(207, 121, 354, 700)
    # a valid table ignores the fallback
    assert kn_modified_discounts(
        *stats["coc3"], fallback=KN_FALLBACK_DISCOUNTS
    ) == stats["t_discounts"]
    # r16 review: a corpus with ZERO n-grams at this order reaches the
    # LOUD refusal (not a TypeError on None counts), and the fallback
    # path yields an empty (not crashed) model
    no_tri = spark.createDataFrame(
        [(0, "one two"), (1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="count-of-counts"):
        kn_modified_trigram_model(
            _trigram_triples(no_tri, "text", "doc_id"))
    m0, st0 = kn_modified_trigram_model(
        _trigram_triples(no_tri, "text", "doc_id"),
        discount_fallback=True)
    assert st0["t_discounts"] == (0.5, 1.0, 1.5) and m0.count() == 0
    # fallback model still sums to 1 per context (discounts in range):
    # the degenerate single-doc corpus now fits instead of refusing
    m2, st2 = kn_modified_trigram_model(
        _trigram_triples(tiny, "text", "doc_id"), discount_fallback=True)
    assert st2["t_discounts"] == (0.5, 1.0, 1.5)
    rows2 = m2.collect()
    u2 = {r["c"]: r["u"] for r in rows2}
    big_u2 = st2["U"]
    for r in rows2:  # every context has exactly 1 continuation here
        gamma3 = 0.5 * r["f1"] / r["ctx"]
        p_seen = math.exp(-r["lp_q"] / 1e6)
        others = sum(
            (0.5 * r["g1"] / r["bctx"]) * (u2[c] / big_u2)
            for c in u2 if c != r["c"]
        )
        # unseen-after-(a,b) mass: every other c backs off twice
        assert abs(p_seen + gamma3 * others - 1.0) < 1e-4


def test_min_k_nll_scores_properties(spark):
    """r16: Min-K% prob (arXiv:2310.16789) — the top-k selection takes
    exactly the k least-probable (highest-NLL) tokens, k = max(1,
    ceil(0.2 n)), sums are exact integers, the mean is their division,
    and layout cannot change a single row."""
    import math

    from postgre_to_clickhouse_spark.operators.text import (
        min_k_nll_scores,
    )

    rows = [
        (0, "common common common common rare"),   # 5 toks -> k=1
        (1, "common rare common"),                 # 3 toks -> k=1
        (2, "common " * 10 + "rare epsilon"),      # 12 toks -> k=3
        (3, ""),                                   # no tokens: drops
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in min_k_nll_scores(df).collect()}
    assert set(got) == {0, 1, 2}
    # corpus: common x16, rare x3, epsilon x1; total 20
    total = 20

    def q(c):
        return round(-math.log(c / total) * 1e6)

    # doc0: k = ceil(1.0) = 1 -> the single 'rare' token
    assert (got[0]["n_tokens"], got[0]["k_tokens"]) == (5, 1)
    assert got[0]["mink_nll_q"] == q(3)
    # doc1: k = ceil(0.6) = 1 -> 'rare'
    assert (got[1]["n_tokens"], got[1]["k_tokens"]) == (3, 1)
    assert got[1]["mink_nll_q"] == q(3)
    # doc2: k = ceil(2.4) = 3 -> epsilon + rare + one 'common'
    assert (got[2]["n_tokens"], got[2]["k_tokens"]) == (12, 3)
    assert got[2]["mink_nll_q"] == q(1) + q(3) + q(16)
    assert got[2]["mink_mean_nll"] == got[2]["mink_nll_q"] / 3
    # a memorized-looking doc (all high-probability tokens) scores
    # LOWER than an outlier-bearing one — the paper's signal direction
    assert got[0]["mink_mean_nll"] > q(16)
    # layout independence
    re_got = {r["doc_id"]: r.asDict()
              for r in min_k_nll_scores(df.repartition(16)).collect()}
    assert re_got == got


def test_zipf_fit_recovers_power_law(spark):
    """r16 s2: Zipf rank-frequency fit — on a corpus whose term
    frequencies are an EXACT power law c(r) = round(1000·r^-1), the
    OLS over (ln r, ln c) must recover slope ≈ -1 with r² ≈ 1; on a
    uniform-frequency corpus the slope is ≈ 0. Layout (partitioning)
    cannot change any output value (integer-moment exactness)."""
    from postgre_to_clickhouse_spark.operators.text import zipf_fit

    rows = []
    for r in range(1, 51):
        c = max(1, round(1000.0 / r))
        rows.append((r, (f"term{r:03d} " * c).strip()))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    got = zipf_fit(df, text_col="text", top_n=1000).collect()[0]
    assert got["n_terms"] == 50
    assert abs(got["zipf_slope"] + 1.0) < 0.05
    assert got["zipf_r2"] > 0.99
    # layout independence: exact same row under a different partitioning
    got2 = zipf_fit(df.repartition(16), text_col="text",
                    top_n=1000).collect()[0]
    assert got.asDict() == got2.asDict()

    flat = spark.createDataFrame(
        [(r, (f"w{r:03d} " * 20).strip()) for r in range(1, 31)],
        ["doc_id", "text"],
    )
    gotf = zipf_fit(flat, text_col="text", top_n=1000).collect()[0]
    assert abs(gotf["zipf_slope"]) < 1e-9
    assert gotf["zipf_r2"] is None  # constant counts: unfittable, NULL


def test_heaps_fit_recovers_growth_exponents(spark):
    """r16 s2: Heaps'-law fit — on a corpus where every document
    introduces only fresh terms, V = N exactly so beta = 1 and
    r² = 1; on a single-term corpus V is constant so beta = 0.
    Layout (partitioning) cannot change any output value."""
    from postgre_to_clickhouse_spark.operators.text import heaps_fit

    fresh = spark.createDataFrame(
        [(d, " ".join(f"w{d:03d}x{i}" for i in range(10)))
         for d in range(1, 65)],
        ["doc_id", "text"],
    )
    got = heaps_fit(fresh, n_buckets=64).collect()[0]
    assert got["n_points"] == 64
    assert abs(got["heaps_beta"] - 1.0) < 1e-9
    assert abs(got["heaps_r2"] - 1.0) < 1e-9
    got2 = heaps_fit(fresh.repartition(16), n_buckets=64).collect()[0]
    assert got.asDict() == got2.asDict()

    closed = spark.createDataFrame(
        [(d, "same " * 10) for d in range(1, 65)], ["doc_id", "text"]
    )
    gotc = heaps_fit(closed, n_buckets=64).collect()[0]
    assert abs(gotc["heaps_beta"]) < 1e-9  # V constant at 1


def test_tokenizer_fertility_consistency(spark):
    """r16 s2: tokenizer fertility — per-language invariants on the
    fixture corpus: every word is at least one BPE token (fertility
    >= 1), at 30 merges the fixture vocabulary is genuinely subword
    (fertility > 1), the ratios are the exact divisions of their
    integer columns, and chars/token is positive and at most the
    chars/word bound."""
    from postgre_to_clickhouse_spark.queries import QUERIES

    rows = QUERIES["tokenizer_fertility_by_lang"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows, "no language rows"
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_words"] > 0
        assert r["fertility"] == r["n_bpe_tokens"] / r["n_words"]
        assert r["fertility"] > 1.0  # genuinely subword at 30 merges
        assert r["chars_per_token"] == r["n_chars"] / r["n_bpe_tokens"]
        assert 0 < r["chars_per_token"] <= r["n_chars"] / r["n_words"]


def test_source_overlap_matrix_exact(spark):
    """r16 s2: cross-source overlap matrix — on a constructed corpus
    with known distinct-5-gram sets, every count and Jaccard is
    exact, zero-overlap pairs are absent, src_a < src_b, and layout
    cannot change a row."""
    from postgre_to_clickhouse_spark.operators.dedup import (
        source_overlap_matrix,
    )

    w = [f"w{i}" for i in range(12)]
    # srcA: tokens w0..w7  -> grams at positions 0..3  (4 distinct)
    # srcB: tokens w2..w9  -> grams at positions 2..5  (4 distinct,
    #        shares positions 2..3 with A -> 2 common)
    # srcC: tokens w20.. distinct -> no overlap with anyone
    rows = [
        (1, "srcA", " ".join(w[0:8])),
        (2, "srcB", " ".join(w[2:10])),
        (3, "srcC", " ".join(f"z{i}" for i in range(8))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {(r["src_a"], r["src_b"]): r.asDict()
           for r in source_overlap_matrix(df, n=5).collect()}
    assert set(got) == {("srcA", "srcB")}
    r = got[("srcA", "srcB")]
    assert (r["grams_a"], r["grams_b"], r["n_common"]) == (4, 4, 2)
    assert r["jaccard"] == 2 / 6
    got2 = {(r["src_a"], r["src_b"]): r.asDict()
            for r in source_overlap_matrix(df.repartition(16),
                                           n=5).collect()}
    assert got == got2
