"""Property-based tests (hypothesis): operator invariants under random
inputs — the semantics hold for ANY event stream, not just the goldens.

Strategy sizes are kept small (Spark round-trips per example are
expensive); deadline disabled for JVM warm-up jitter.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.cdc.dedup import dedup_redelivery, latest
from postgre_to_clickhouse_spark.operators.asof import asof_join
from postgre_to_clickhouse_spark.operators.range_join import band_join

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# (user_id, version, offset) event streams; duplicates and out-of-order
# arrivals included by construction
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),     # user_id
        st.integers(min_value=0, max_value=10),    # version
        st.integers(min_value=0, max_value=1000),  # offset (arrival order)
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[2],
)


@given(events=events_strategy)
@settings(**_SETTINGS)
def test_latest_is_argmax(spark, events):
    df = spark.createDataFrame(events, "user_id int, version int, kafka_offset int")
    got = {
        r.user_id: (r.version, r.kafka_offset)
        for r in latest(df, entity_key=("user_id",), version_cols=("version", "kafka_offset")).collect()
    }
    expect = {}
    for u, v, o in events:
        if u not in expect or (v, o) > expect[u]:
            expect[u] = (v, o)
    assert got == expect


@given(events=events_strategy)
@settings(**_SETTINGS)
def test_dedup_redelivery_keeps_first_arrival(spark, events):
    df = spark.createDataFrame(events, "user_id int, version int, kafka_offset int")
    got = {
        (r.user_id, r.version): r.kafka_offset
        for r in dedup_redelivery(df, sort_key=("user_id", "version"), arrival_order=("kafka_offset",)).collect()
    }
    expect = {}
    for u, v, o in events:
        k = (u, v)
        if k not in expect or o < expect[k]:
            expect[k] = o
    assert got == expect


@given(events=events_strategy)
@settings(**_SETTINGS)
def test_latest_insensitive_to_arrival_order(spark, events):
    df = spark.createDataFrame(events, "user_id int, version int, kafka_offset int")
    a = latest(df, ("user_id",), ("version", "kafka_offset")).collect()
    b = latest(df.orderBy(F.col("kafka_offset").desc()), ("user_id",), ("version", "kafka_offset")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@given(
    facts=st.lists(st.tuples(st.integers(1, 3), st.integers(0, 100)), min_size=1, max_size=15),
    dims=st.lists(st.tuples(st.integers(1, 3), st.integers(0, 100), st.integers(0, 999)),
                  min_size=0, max_size=15, unique_by=lambda t: (t[0], t[1])),
)
@settings(**_SETTINGS)
def test_asof_join_matches_naive(spark, facts, dims):
    base = dt.datetime(2024, 1, 1)
    f = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(facts)],
        "k int, t timestamp, fid int",
    )
    d = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=m), v) for k, m, v in dims],
        "k int, vt timestamp, val int",
    )
    got = {
        r.fid: r.val_asof
        for r in asof_join(f, d, on="k", fact_time="t", dim_time="vt", dim_cols=["val"]).collect()
    }
    expect = {}
    for i, (k, m) in enumerate(facts):
        cands = [(dm, v) for dk, dm, v in dims if dk == k and dm <= m]
        expect[i] = max(cands)[1] if cands else None
    assert got == expect


@given(
    lefts=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=10),
    rights=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=10),
    width=st.floats(0.5, 50, allow_nan=False),
)
@settings(**_SETTINGS)
def test_band_join_equals_naive_property(spark, lefts, rights, width):
    l = spark.createDataFrame([(i, v) for i, v in enumerate(lefts)], "lid int, lval double")
    r = spark.createDataFrame([(i, v) for i, v in enumerate(rights)], "rid int, rval double")
    banded = band_join(l, r, "lval", "rval", width=width).select("lid", "rid")
    got = sorted(map(tuple, banded.collect()))
    expect = sorted(
        (i, j) for i, lv in enumerate(lefts) for j, rv in enumerate(rights) if abs(lv - rv) <= width
    )
    assert got == expect


# -- windowFunnel (round 4) -------------------------------------------------
funnel_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # user_id
        st.integers(min_value=0, max_value=40),     # second
        st.sampled_from(["A", "B", "C", "X"]),      # event type (X = noise)
    ),
    min_size=1,
    max_size=25,
)


def _funnel_ref(rows, steps, window_s, mode="default"):
    """Per-mode brute-force reference, structurally independent of the
    Spark expression encoding:

    - default / strict_increase: per-step timestamp SETS, greedy-earliest
      extension per chain start (optimal — the window is anchored to the
      start), max over starts;
    - strict_dedup / strict_order: a plain-Python scan over the
      (ts, step)-sorted event list per chain start with the mode's
      interrupt rule — same semantics the fold expression must encode.
    """
    sidx = {s: i for i, s in enumerate(steps)}
    out = {}
    for u in {r[0] for r in rows}:
        if mode in ("default", "strict_increase"):
            per_step = [
                sorted(s for (uu, s, t) in rows if uu == u and t == step) for step in steps
            ]
            best = 0 if not per_step[0] else 1
            for t1 in per_step[0]:
                lvl, prev = 1, t1
                for i in range(1, len(steps)):
                    if mode == "strict_increase":
                        nxt = [x for x in per_step[i] if x > prev and x <= t1 + window_s]
                    else:
                        nxt = [x for x in per_step[i] if x >= prev and x <= t1 + window_s]
                    if not nxt:
                        break
                    prev = min(nxt)
                    lvl = i + 1
                best = max(best, lvl)
            out[u] = best
            continue
        arr = sorted((s, sidx.get(t, -1)) for (uu, s, t) in rows if uu == u)
        best = 0
        for i, (t1, s1) in enumerate(arr):
            if s1 != 0:
                continue
            lvl = 1
            for t, s in arr[i + 1 :]:
                if t > t1 + window_s:
                    break
                if s == lvl:
                    lvl += 1
                elif mode == "strict_dedup" and 0 <= s < lvl:
                    break
                elif mode == "strict_order":
                    break
            best = max(best, lvl)
        out[u] = best
    return out


@given(events=funnel_events_strategy)
@settings(**_SETTINGS)
def test_window_funnel_all_modes_match_bruteforce(spark, events):
    from postgre_to_clickhouse_spark.operators.funnel import MODES, window_funnel_modes

    df = spark.createDataFrame(events, "user_id long, sec long, event_type string").select(
        "user_id", F.timestamp_seconds(F.col("sec")).alias("ts"), "event_type"
    )
    rows = window_funnel_modes(
        df, ["A", "B", "C"], window_us=10_000_000, modes=MODES
    ).collect()
    for mode in MODES:
        got = {r["user_id"]: r[f"funnel_{mode}"] for r in rows}
        assert got == _funnel_ref(events, ["A", "B", "C"], 10, mode), mode


def _seq_match_ref(rows, steps, guards, window_s=None):
    """Brute force: enumerate every index-increasing chain over the
    per-user (ts, type)-sorted events (exponential, fine at test size)."""
    import itertools

    out = {}
    for u in {r[0] for r in rows}:

        def ok(chain):
            for i, (lo, hi) in enumerate(guards):
                gap = chain[i + 1] - chain[i]
                if gap < (lo or 0) or (hi is not None and gap > hi):
                    return False
            return True

        cands = [sorted(s for (uu, s, t) in rows if uu == u and t == st) for st in steps]
        matched = any(
            all(c[i + 1] >= c[i] for i in range(len(c) - 1)) and ok(c)
            for c in itertools.product(*cands)
        )
        out[u] = matched
    return out


@given(events=funnel_events_strategy)
@settings(**_SETTINGS)
def test_sequence_match_guards_match_bruteforce(spark, events):
    from postgre_to_clickhouse_spark.operators.funnel import sequence_match

    guards = [(0, 5), (2, None)]
    df = spark.createDataFrame(events, "user_id long, sec long, event_type string").select(
        "user_id", F.timestamp_seconds(F.col("sec")).alias("ts"), "event_type"
    )
    got = {
        r.user_id: r.matched
        for r in sequence_match(
            df, ["A", "B", "C"], guards=[(0, 5_000_000), (2_000_000, None)]
        ).collect()
    }
    assert got == _seq_match_ref(events, ["A", "B", "C"], guards)


def _seq_match_ref_ext(rows, step_sets, guards, not_between, any_between=None, universe=None):
    """Brute force for the r7/r8 alternation/negation/exactly-k
    extensions: enumerate every tuple over the per-step candidate
    timestamp sets (a step's candidates = events whose type is IN the
    step's alternation set), require non-decreasing order + guards +
    for each banned set no banned-type event STRICTLY between the
    adjacent chain timestamps + where ``any_between[i] = k``, EXACTLY
    k universe-visible events (counted with multiplicity) strictly
    between the adjacent chain timestamps."""
    import itertools

    any_between = any_between or [None] * len(guards)
    out = {}
    for u in {r[0] for r in rows}:
        cands = [
            sorted(s for (uu, s, t) in rows if uu == u and t in sset)
            for sset in step_sets
        ]
        banned_ts = [
            sorted(s for (uu, s, t) in rows if uu == u and nb and t in nb)
            for nb in not_between
        ]
        visible_ts = sorted(
            s for (uu, s, t) in rows if uu == u and t in (universe or ())
        )

        def ok(c):
            for i, (lo, hi) in enumerate(guards):
                gap = c[i + 1] - c[i]
                if gap < (lo or 0) or (hi is not None and gap > hi):
                    return False
            for i, zs in enumerate(banned_ts):
                if any(c[i] < z < c[i + 1] for z in zs):
                    return False
            for i, k in enumerate(any_between):
                if k is not None and sum(
                    1 for z in visible_ts if c[i] < z < c[i + 1]
                ) != k:
                    return False
            return True

        out[u] = any(
            all(c[i + 1] >= c[i] for i in range(len(c) - 1)) and ok(c)
            for c in itertools.product(*cands)
        )
    return out


@given(events=funnel_events_strategy)
@settings(**_SETTINGS)
def test_sequence_match_alternation_negation_match_bruteforce(spark, events):
    """r7 (VERDICT r6 #4): pattern (?1)(?t<=5)(?2|?3)(?!4)(?1) — an A,
    then a B OR C within 5 s, then another A with no X strictly between
    the middle match and the final A — against an exhaustive
    chain-enumeration reference."""
    from postgre_to_clickhouse_spark.operators.funnel import sequence_match_pattern

    df = spark.createDataFrame(events, "user_id long, sec long, event_type string").select(
        "user_id", F.timestamp_seconds(F.col("sec")).alias("ts"), "event_type"
    )
    got = {
        r.user_id: r.matched
        for r in sequence_match_pattern(
            df, "(?1)(?t<=5)(?2|?3)(?!4)(?1)", ["A", "B", "C", "X"]
        ).collect()
    }
    ref = _seq_match_ref_ext(
        events,
        [{"A"}, {"B", "C"}, {"A"}],
        [(0, 5), (0, None)],
        [None, {"X"}],
    )
    assert got == ref


@given(events=funnel_events_strategy)
@settings(**_SETTINGS)
def test_sequence_match_dot_match_bruteforce(spark, events):
    """r8 (VERDICT r7 #6): pattern (?1).(?2)..(?3) — an A, then EXACTLY
    one condition-visible event strictly between it and a B, then
    EXACTLY two between the B and a C — against the exhaustive
    chain-enumeration reference. The visibility universe is the conds
    list (A, B, C, X), so noise X events count toward the dots —
    ClickHouse's only-described-events-participate model."""
    from postgre_to_clickhouse_spark.operators.funnel import sequence_match_pattern

    df = spark.createDataFrame(events, "user_id long, sec long, event_type string").select(
        "user_id", F.timestamp_seconds(F.col("sec")).alias("ts"), "event_type"
    )
    got = {
        r.user_id: r.matched
        for r in sequence_match_pattern(
            df, "(?1).(?2)..(?3)", ["A", "B", "C", "X"]
        ).collect()
    }
    ref = _seq_match_ref_ext(
        events,
        [{"A"}, {"B"}, {"C"}],
        [(0, None), (0, None)],
        [None, None],
        any_between=[1, 2],
        universe={"A", "B", "C", "X"},
    )
    assert got == ref


# -- BM25 (round 4) ---------------------------------------------------------
docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.lists(st.sampled_from("alpha beta gamma delta".split()), min_size=1, max_size=6),
    ),
    min_size=2,
    max_size=8,
    unique_by=lambda t: t[0],
)


@given(docs=docs_strategy)
@settings(**_SETTINGS)
def test_bm25_matches_reference(spark, docs):
    """Scores must equal the straight per-(query, doc) loop over the
    textbook formula (raw odds-ratio idf variant) to float tolerance —
    the exact-decimal sum only canonicalizes ordering, it must not
    change the value beyond rounding at scale 9."""
    import math

    from postgre_to_clickhouse_spark.operators.retrieval import B, K1, bm25_scores

    rows = [(i, " ".join(words)) for i, words in docs]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame([rows[0]], "query_id long, text string")
    got = {r.doc_id: r.score for r in bm25_scores(d, q).collect()}

    n = len(rows)
    toks = {i: words for i, words in docs}
    avgdl = sum(len(w) for w in toks.values()) / n
    dfreq: dict[str, int] = {}
    for words in toks.values():
        for t in set(words):
            dfreq[t] = dfreq.get(t, 0) + 1
    qterms = set(toks[docs[0][0]])
    for i, words in docs:
        score = 0.0
        for t in qterms:
            tf = words.count(t)
            if tf == 0:
                continue
            idf = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            score += idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * len(words) / avgdl))
        if score > 0.0:
            assert i in got
            assert math.isclose(got[i], score, rel_tol=1e-7, abs_tol=1e-7), (i, got[i], score)


# -- r5: duplicated-span coverage vs brute force ---------------------------
corpus_strategy = st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=20),
    min_size=2,
    max_size=6,
)


def _brute_coverage(docs: list[list[str]], n: int) -> dict[int, tuple[int, int]]:
    """(dup_grams, covered) per doc by literal enumeration."""
    grams: dict[tuple, set[int]] = {}
    for i, toks in enumerate(docs):
        for p in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[p : p + n]), set()).add(i)
    out = {}
    for i, toks in enumerate(docs):
        hits = [
            p for p in range(len(toks) - n + 1) if len(grams[tuple(toks[p : p + n])]) >= 2
        ]
        covered = set()
        for p in hits:
            covered.update(range(p, p + n))
        out[i] = (len(hits), len(covered))
    return out


@given(docs=corpus_strategy)
@settings(**_SETTINGS)
def test_dup_span_coverage_matches_brute_force(spark, docs):
    from postgre_to_clickhouse_spark.operators.spans import dup_span_coverage

    n = 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.dup_grams, r.covered_tokens) for r in dup_span_coverage(df, n=n).collect()}
    want = _brute_coverage(docs, n)
    assert got == want


# -- r5: heavy-hitter sketch bounds under random truncation ----------------
@given(
    items=st.lists(st.sampled_from([f"i{j}" for j in range(12)]), min_size=1, max_size=80),
    capacity=st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_approx_topk_bounds_always_contain_truth(spark, items, capacity):
    from collections import Counter

    from postgre_to_clickhouse_spark.operators.sketch import approx_topk

    truth = Counter(items)
    df = spark.createDataFrame([(x,) for x in items], ["item"]).repartition(3, "item")
    out = approx_topk(df, "item", k=12, capacity=capacity).collect()
    for r in out:
        assert r.lb <= truth[r.item] <= r.ub, (r.item, r.lb, truth[r.item], r.ub)
    # the true max item is never displaced below rank len(out)
    top_true = max(truth.values())
    assert any(truth[r.item] == top_true for r in out)


def test_edit_distance_pairs_match_bruteforce(spark):
    """r7: PassJoin candidate generation (pigeonhole segments +
    position-bounded probes) + bag prefilter + threshold-banded verify
    must return EXACTLY the all-pairs result — including empty/short
    strings (empty segments), heavy mutation clusters, and cross-block
    isolation. Fixed-seed mutation corpus, pure-Python DP reference."""
    import itertools
    import random

    from postgre_to_clickhouse_spark.operators.dedup import edit_distance_pairs

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, d[0] = d[0], i
            for j in range(1, len(b) + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return d[len(b)]

    rng = random.Random(7)
    vocab = "spark scan fast table value join agg row col".split()
    rows = []
    for i in range(120):
        t = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8)))
        if i % 3 == 0 and rows:  # mutate an earlier string -> true near pairs
            t = list(rows[rng.randrange(len(rows))][2])
            for _ in range(rng.randint(0, 6)):
                if not t:
                    break
                op, pos = rng.choice("ids"), rng.randrange(len(t))
                if op == "i":
                    t.insert(pos, rng.choice("abcxyz "))
                elif op == "d":
                    t.pop(pos)
                else:
                    t[pos] = rng.choice("abcxyz ")
            t = "".join(t)
        rows.append((i, f"s{i % 3}", t[:40]))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r.id_a, r.id_b, r.edit_dist) for r in edit_distance_pairs(df, "text").collect()}
    exp = {
        (min(i1, i2), max(i1, i2), lev(t1, t2))
        for (i1, s1, t1), (i2, s2, t2) in itertools.combinations(rows, 2)
        if s1 == s2 and lev(t1, t2) <= 5
    }
    assert got == exp


# --- r7-late operators ------------------------------------------------------

docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "x"]),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=8,
)


@given(docs=docs_strategy)
@settings(**_SETTINGS)
def test_line_dedup_keep_first_each_line_survives_exactly_once(spark, docs):
    """Keep-first global line dedup: every DISTINCT line survives in
    exactly one place corpus-wide — its first (doc_id, idx) occurrence
    — and per-doc counts reconcile."""
    from postgre_to_clickhouse_spark.operators.text_clean import line_dedup_keep_first

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in line_dedup_keep_first(df).collect()}

    # Python reference
    first: dict[str, tuple[int, int]] = {}
    for i, lines in enumerate(docs):
        for x, ln in enumerate(lines):
            first.setdefault(ln, (i, x))
    for i, lines in enumerate(docs):
        kept = [ln for x, ln in enumerate(lines) if first[ln] == (i, x)]
        r = out[i]
        assert r.n_lines == len(lines)
        assert r.kept_lines == len(kept)
        assert r.removed_lines == len(lines) - len(kept)
        assert r.cleaned_text == " | ".join(kept)
    total_kept = sum(out[i].kept_lines for i in out)
    assert total_kept == len(first)  # each distinct line exactly once


@given(
    tokens=st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=3, max_size=12
    )
)
@settings(**_SETTINGS)
def test_sorted_run_stats_matches_counter_reference(spark, tokens):
    """The sorted-run fold equals the Counter-based definition: max
    (count, gram) lexicographically, and Σ (count−1)·len over repeated
    grams."""
    from collections import Counter

    from postgre_to_clickhouse_spark.operators.text_clean import sorted_run_stats

    grams = [f"{a} {b}" for a, b in zip(tokens, tokens[1:])]
    df = spark.createDataFrame([(grams,)], "g array<string>")
    r = df.select(sorted_run_stats(F.col("g")).alias("r")).collect()[0].r
    c = Counter(grams)
    best_c, best_g = max((n, g) for g, n in c.items())
    dup = sum((n - 1) * len(g) for g, n in c.items() if n > 1)
    assert (r.best_c, r.best_g, r.dup_chars) == (best_c, best_g, dup)


@given(
    scheme=st.sampled_from(["https", "HTTPS", "HtTpS", "http", "HTTP"]),
    host=st.sampled_from(["EN.Example.COM", "api.test.ORG"]),
    path=st.sampled_from(["/a/b", "/a/b/", "/x", ""]),
    params=st.lists(
        st.sampled_from(["b=2", "a=1", "utm_source=x", "utm_b=z", "c=3"]),
        max_size=4,
        unique=True,
    ),
    frag=st.sampled_from(["", "#frag", "#a?b=1"]),
)
@settings(**_SETTINGS)
def test_canonicalize_url_idempotent_and_order_insensitive(spark, scheme, host, path, params, frag):
    """canon(canon(u)) == canon(u), permuting query params yields the
    same canonical form, and the SCHEME is matched case-insensitively
    (r8 ADVICE fix: 'HTTPS://Host/…' must unify with its lowercase
    twin — RFC 3986 scheme/host case-insensitivity)."""
    from postgre_to_clickhouse_spark.operators.text_clean import canonicalize_url

    q = ("?" + "&".join(params)) if params else ""
    u1 = f"{scheme}://{host}{path}{q}{frag}"
    u2 = f"{scheme}://{host}{path}" + (("?" + "&".join(reversed(params))) if params else "") + frag
    u3 = f"{scheme.lower()}://{host.lower()}{path}{q}{frag}"  # pre-canonicalized scheme+host
    df = spark.createDataFrame([(u1, u2, u3)], "u1 string, u2 string, u3 string")
    row = df.select(
        canonicalize_url(F.col("u1")).alias("c1"),
        canonicalize_url(F.col("u2")).alias("c2"),
        canonicalize_url(F.col("u3")).alias("c3"),
        canonicalize_url(canonicalize_url(F.col("u1"))).alias("cc"),
    ).collect()[0]
    assert row.c1 == row.c2  # param order irrelevant
    assert row.cc == row.c1  # idempotent
    assert row.c1 == row.c3  # scheme/host case never splits a dup group
    assert row.c1.startswith(f"{scheme.lower()}://{host.lower()}")


# --- r12: quantile/topK -State/-Merge invariants ----------------------

qtk_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),     # group
        st.integers(min_value=-50, max_value=50),  # value (int-valued
        #   doubles: exact across engines, ties common by design)
        st.integers(min_value=0, max_value=2),     # partition assignment
    ),
    min_size=1,
    max_size=40,
)


def _exact_q(vals, q):
    vals = sorted(vals)
    cum, w = 0, len(vals)
    for v in vals:
        cum += 1
        if cum >= q * w:
            return v


@given(rows=qtk_strategy, q=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]))
@settings(**_SETTINGS)
def test_quantile_state_merge_split_invariant(spark, rows, q):
    """Merging partial quantile states over ANY partition of the input
    equals the exact weighted quantile of the whole input — the
    mergeable-state contract (every output is a raw input value)."""
    from postgre_to_clickhouse_spark.ch_select import (
        _q_merge_sql, _q_state_sql)

    df = spark.createDataFrame(
        [(g, float(v), p) for g, v, p in rows], "g int, x double, p int")
    states = df.groupBy("g", "p").agg(F.expr(_q_state_sql("x")).alias("s"))
    got = {
        r["g"]: r["qv"]
        for r in states.groupBy("g").agg(
            F.expr(_q_merge_sql("s", repr(q))).alias("qv")).collect()
    }
    by_g = {}
    for g, v, _p in rows:
        by_g.setdefault(g, []).append(float(v))
    for g, vals in by_g.items():
        assert got[g] == _exact_q(vals, q), (g, sorted(vals), q, got[g])


@given(rows=qtk_strategy, k=st.sampled_from([1, 2, 4]))
@settings(**_SETTINGS)
def test_topk_merge_heavy_hitter_invariants(spark, rows, k):
    """Merged topK states keep the guarantees at ANY capacity/split:
    every kept item's upper bound >= its true count, and every item
    with true count > the merged error floor is present (so with
    distinct <= k the result is exactly the true top-k)."""
    from collections import Counter

    from postgre_to_clickhouse_spark.ch_select import (
        _topk_merge_core, _topk_state_sql)

    df = spark.createDataFrame(
        [(g, str(v % 7), p) for g, v, p in rows], "g int, it string, p int")
    states = df.groupBy("g", "p").agg(
        F.expr(_topk_state_sql("it", k)).alias("s"))
    fin = ("named_struct('items', transform(hs, e -> named_struct("
           "'item', e.item, 'ub', e.ub)), 'floor', t.dd)")
    merged = {
        r["g"]: r["m"]
        for r in states.groupBy("g").agg(
            F.expr(_topk_merge_core("s", k, fin)).alias("m")).collect()
    }
    truth = {}
    for g, v, _p in rows:
        truth.setdefault(g, Counter())[str(v % 7)] += 1
    for g, c in truth.items():
        kept = {e["item"]: e["ub"] for e in merged[g]["items"]}
        floor = merged[g]["floor"]
        for it, ub in kept.items():
            assert ub >= c[it], (g, it, ub, c[it])
        for it, n in c.items():
            if n > floor:
                # the heavy-hitter guarantee: present, or outweighed
                # by >= k items each at least as heavy
                heavier = sum(1 for x in c.values() if x >= n)
                assert it in kept or heavier > k, (g, it, n, floor, kept)
        if len(c) <= k:
            want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
            top = sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))
            assert [i for i, _ in top[:len(want)]] == [i for i, _ in want]


# r13: PASTE JOIN property — the distributed global-row-index zip is
# EXACTLY the zip of the two python-sorted sequences, for any inputs,
# any lengths, any partitioning. Unique keys by construction (the
# documented determinism requirement).
paste_strategy = st.tuples(
    st.lists(st.integers(min_value=-1000, max_value=1000),
             min_size=1, max_size=25, unique=True),
    st.lists(st.integers(min_value=-1000, max_value=1000),
             min_size=1, max_size=25, unique=True),
    st.booleans(),  # left ascending?
    st.booleans(),  # right ascending?
    st.integers(min_value=1, max_value=7),  # partition count
)


@given(args=paste_strategy)
@settings(**_SETTINGS)
def test_paste_join_matches_python_zip(spark, args):
    from postgre_to_clickhouse_spark.operators.zip_join import paste_join

    left_vals, right_vals, lasc, rasc, nparts = args
    ldf = spark.createDataFrame(
        [(v,) for v in left_vals], "a long").repartition(nparts)
    rdf = spark.createDataFrame(
        [(v,) for v in right_vals], "b long").repartition(nparts)
    got = sorted(
        map(tuple, paste_join(
            ldf, rdf, [("a", lasc)], [("b", rasc)]).collect())
    )
    ls = sorted(left_vals, reverse=not lasc)
    rs = sorted(right_vals, reverse=not rasc)
    assert got == sorted(zip(ls, rs))
