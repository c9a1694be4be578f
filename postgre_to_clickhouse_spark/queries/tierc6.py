"""Tier C continued (round 4): lexical retrieval (BM25) and semantic
dedup (SemDedup). Registered AFTER the driver's 50-slot window — the
window already covers each operator class; these are pytest-oracle-gated
and bench-visible.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.operators import retrieval as R
from postgre_to_clickhouse_spark.queries.registry import register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


# The identical contribution text runs on both engines (see
# operators/retrieval.py for the determinism argument); only the
# decimal width differs (30 vs 18 — same per-value rounding, both
# exact; see queries/registry.py::dsum).
_BM25_ORACLE = f"""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{R.TOKEN_RE}') AS t FROM documents
    ),
    lens AS (SELECT doc_id, len(t) AS __dl FROM tk),
    st AS (
      SELECT count(*) AS __n,
             CAST(SUM(__dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS __avgdl
      FROM lens
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM tk)
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    q AS (
      SELECT DISTINCT doc_id AS query_id, term
      FROM (SELECT doc_id, unnest(t) AS term FROM tk WHERE doc_id < 5)
    ),
    scored AS (
      SELECT q.query_id, t.doc_id,
             CAST(SUM(CAST({R._contrib_sql(n="s.__n", dl="l.__dl", avgdl="s.__avgdl")}
               AS DECIMAL(30,9))) AS DOUBLE) AS score
      FROM tf t
      JOIN dfreq d USING (term)
      JOIN lens l ON t.doc_id = l.doc_id
      JOIN q ON q.term = t.term
      CROSS JOIN st s
      WHERE t.doc_id <> q.query_id
      GROUP BY q.query_id, t.doc_id
    )
    SELECT query_id, doc_id, score, rank FROM (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= 10
"""


@register("bm25_topk", oracle=_BM25_ORACLE)
def bm25_topk(spark, sf_dir):
    """Lexical retrieval: BM25 top-10 per query (queries = documents
    with doc_id < 5, self excluded). Inverted-index shape — postings
    shuffled once, query terms broadcast; full cross-engine value-hash
    via exact-decimal score sums and the raw odds-ratio idf (see
    operators/retrieval.py)."""
    d = _t(spark, sf_dir, "documents")
    queries = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    scored = R.bm25_scores(d, queries).filter(F.col("doc_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "score", "rank")
    )


@register(
    "shuffle_training_order",
    oracle="""
    SELECT doc_id,
           row_number() OVER (
             ORDER BY md5('epoch1:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS shuffle_pos
    FROM documents
    """,
)
def shuffle_training_order(spark, sf_dir):
    """Deterministic global shuffle for training order: position = rank
    of md5(seed:id). Content-addressed like the split/sampling family
    (operators/sampling.py) — the permutation is reproducible on any
    engine or cluster layout, and a new seed per epoch is a new
    permutation with no state carried. Positions come from
    :func:`operators.sampling.global_rank` (r6): the range-partitioned
    sort + broadcast-offset shape, parallel at any scale — never a
    single-partition Window."""
    from postgre_to_clickhouse_spark.operators.sampling import global_rank

    d = _t(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string")))
    keyed = d.select("doc_id", key.alias("__k"))
    ranked = global_rank(keyed, ["__k", "doc_id"], out_col="__pos")
    return ranked.select("doc_id", F.col("__pos").cast("long").alias("shuffle_pos"))


@register(
    "multimodal_video_frames",
    oracle="""
    SELECT d.doc_id,
           CAST(f.i AS INTEGER) AS frame_idx,
           192 AS n_px,
           CAST(SUM(((d.doc_id * 7 + t.j) % 256 + f.i) % 256) AS BIGINT) AS px_sum,
           CAST(MIN(CASE WHEN t.j = 0
             THEN ((d.doc_id * 7 + ((8 - (f.i % 8)) % 8) * 24) % 256 + f.i) % 256
           END) AS INTEGER) AS first_px
    FROM documents d, range(4) f(i), range(192) t(j)
    GROUP BY d.doc_id, f.i
    """,
)
def multimodal_video_frames(spark, sf_dir):
    """C5 video path end-to-end on REAL bytes: BMP-encode a closed-form
    image per document, decode it, and emit integer-exact stats for 4
    uniformly-sampled frames (frame i = row-roll by i, +i mod 256 —
    same synthesis as operators.multimodal.sample_video_frames, whose
    feature variant stands in for a pyav decode). ``first_px`` moves
    with the roll, so the oracle catches a wrong shift direction."""
    from postgre_to_clickhouse_spark.operators.multimodal import (
        media_from_ids,
        video_frame_stats,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    media = media_from_ids(d, id_col="doc_id", height=8, width=8)
    return video_frame_stats(media, n_frames=4)


@register(
    "token_budget_per_lang",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens,
             md5('budget-v1:' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 5000
    """,
)
def token_budget_per_lang(spark, sf_dir):
    """Mixture sampling by TOKEN budget: per language, keep a
    content-addressed random sample while the running token count stays
    ≤ 5000 — the "N tokens of lang X" draw a pretraining mixture
    actually specifies (operators/sampling.py::token_budget_sample)."""
    from postgre_to_clickhouse_spark.operators.sampling import token_budget_sample

    d = _t(spark, sf_dir, "documents")
    return token_budget_sample(d, ["lang"], budget_tokens=5000).select(
        "doc_id", "lang", "n_tokens", "cum_tokens"
    )


_FUNNEL_W = 6 * 3600 * 1_000_000  # 6 h in µs


@register(
    "funnel_view_click_purchase",
    oracle=f"""
    WITH base AS (
      SELECT user_id,
        list(epoch_us(ts)) FILTER (WHERE event_type='view') AS s0,
        list(epoch_us(ts)) FILTER (WHERE event_type='click') AS s1,
        list(epoch_us(ts)) FILTER (WHERE event_type='purchase') AS s2
      FROM events GROUP BY user_id)
    SELECT user_id,
      CAST(COALESCE(list_max(list_transform(s0, t1 -> (
        CASE WHEN list_min(list_filter(s1, x -> x >= t1 AND x <= t1 + {_FUNNEL_W})) IS NULL THEN 1
             WHEN list_min(list_filter(s2, x -> x >= list_min(list_filter(s1, x2 -> x2 >= t1 AND x2 <= t1 + {_FUNNEL_W}))
                                             AND x <= t1 + {_FUNNEL_W})) IS NULL THEN 2
             ELSE 3 END))), 0) AS INTEGER) AS funnel_level
    FROM base
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """ClickHouse ``windowFunnel`` parity (default mode): deepest
    view→click→purchase chain per user within 6 h of the chain's first
    view; an equal-timestamp event may extend the chain (ClickHouse
    default walks time-sorted events and only checks the window against
    the chain start — strictly-increasing is the ``strict_increase``
    mode, covered by ``funnel_strict_modes``). Chains may start at any
    view event (operators/funnel.py — exact, chain-start enumeration +
    greedy extension, all JVM higher-order expressions after one
    groupBy)."""
    from postgre_to_clickhouse_spark.operators.funnel import window_funnel

    ev = _t(spark, sf_dir, "events")
    return window_funnel(ev, ["view", "click", "purchase"], window_us=_FUNNEL_W)


@register(
    "retention_view_cohorts",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
        max(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS r0,
        max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS r1,
        max(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS r2
      FROM events GROUP BY user_id)
    SELECT CAST(SUM(r0) AS BIGINT) AS n_cond1,
           CAST(SUM(r0 * r1) AS BIGINT) AS n_cond1_and_2,
           CAST(SUM(r0 * r2) AS BIGINT) AS n_cond1_and_3
    FROM per_user
    """,
)
def retention_view_cohorts(spark, sf_dir):
    """ClickHouse ``retention`` parity: cohort counts — users with a
    view event, and of those, users who also purchased / signed up
    (r_i = cond_1 AND cond_i)."""
    from postgre_to_clickhouse_spark.operators.funnel import retention

    ev = _t(spark, sf_dir, "events")
    return retention(ev, ["view", "purchase", "signup"])


@register(
    "sequence_match_view_purchase",
    oracle=f"""
    WITH hit AS (
      SELECT DISTINCT a.user_id
      FROM events a JOIN events b ON a.user_id = b.user_id
      WHERE a.event_type = 'view' AND b.event_type = 'purchase'
        AND epoch_us(b.ts) >= epoch_us(a.ts)
        AND epoch_us(b.ts) <= epoch_us(a.ts) + {_FUNNEL_W}
    )
    SELECT u.user_id, (h.user_id IS NOT NULL) AS matched
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN hit h USING (user_id)
    """,
)
def sequence_match_view_purchase(spark, sf_dir):
    """ClickHouse ``sequenceMatch('(?1)(?t<=W)(?2)')`` parity: did a
    purchase follow a view within the window, per user (equal-timestamp
    follows count, matching windowFunnel default-mode time semantics).
    Implemented as the 2-step funnel (level ≥ 2); the oracle is an
    INDEPENDENT join-based formulation, so the funnel machinery is
    cross-checked against a structurally different computation."""
    from postgre_to_clickhouse_spark.operators.funnel import window_funnel

    ev = _t(spark, sf_dir, "events")
    out = window_funnel(ev, ["view", "purchase"], window_us=_FUNNEL_W)
    return out.select("user_id", (F.col("funnel_level") >= 2).alias("matched"))


# bucket arithmetic as ONE shared SQL text: evaluation order (and thus
# float bits) is identical on both engines. Degenerate input (min ==
# max) is guarded — the width would be 0 and (value-__lo)/0 = NaN, which
# Spark's non-ANSI cast folds to bucket 0 while DuckDB errors; with the
# CASE both engines agree on bucket 0 for every row.
_HIST_BUCKET = (
    "LEAST(CAST(FLOOR((value - __lo) / "
    "(CASE WHEN __hi = __lo THEN 1.0 ELSE (__hi - __lo) / 16.0 END)"
    ") AS INTEGER), 15)"
)


@register(
    "histogram_event_values",
    oracle=f"""
    WITH b AS (SELECT min(value) AS __lo, max(value) AS __hi FROM events)
    SELECT {_HIST_BUCKET} AS bucket, CAST(count(*) AS BIGINT) AS n
    FROM events, b
    GROUP BY bucket
    """,
)
def histogram_event_values(spark, sf_dir):
    """ClickHouse ``histogram`` parity: equal-width 16-bucket histogram
    of events.value with data-derived bounds. Bounds come from one
    global agg broadcast as a scalar row (same pattern as BM25 stats);
    bucketing is a map pass; one count shuffle on the 16 buckets."""
    ev = _t(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("__lo"), F.max("value").alias("__hi"))
    return (
        ev.crossJoin(F.broadcast(b))
        .select(F.expr(_HIST_BUCKET).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register("semdedup_prune")  # golden oracle installed by goldens.py
def semdedup_prune(spark, sf_dir):
    """SemDedup (arXiv:2303.09540) over the embeddings table: k-means
    clusters bound the pairwise work, earlier-id shadowing keeps one
    representative per semantic-duplicate group. Deterministic
    (layout-independent centroid fit + sequential-fold cosine) ⇒
    committed-golden oracle."""
    from postgre_to_clickhouse_spark.operators.semdedup import semdedup

    e = _t(spark, sf_dir, "embeddings")
    return semdedup(e, n_lists=16, threshold=0.9).select(
        "vec_id", "cluster_id", "is_kept"
    )


# The DuckDB mirror of the strict-mode fold: one accumulator struct
# carries (lvl, t1, dead) plus null (t, s) slots so list_reduce can
# run over a uniformly-typed list (init prepended to the mapped
# events). The interrupt branch is the only difference between the two
# strict modes. IMPORTANT: the fold runs at the TOP level of a SELECT
# over an unnested (one row per chain start) relation — DuckDB 1.0's
# vectorized evaluation of list_reduce NESTED inside a list_transform
# lambda returns batch-dependent wrong results (correct on a 2-row
# slice, wrong over the full table), reproduced and worked around in
# round 5.
def _fold_sql(interrupt_branch: str) -> str:
    return f"""(list_reduce(
         list_prepend({{'lvl': 1, 't1': t1, 'dead': false, 't': CAST(NULL AS BIGINT), 's': CAST(NULL AS INTEGER)}},
           list_transform(rest, e -> {{'lvl': CAST(NULL AS INTEGER), 't1': CAST(NULL AS BIGINT), 'dead': CAST(NULL AS BOOLEAN), 't': e.t, 's': e.s}})),
         (acc, e) -> CASE
            WHEN acc.dead THEN acc
            WHEN e.t > acc.t1 + {_FUNNEL_W} THEN {{'lvl': acc.lvl, 't1': acc.t1, 'dead': true, 't': acc.t, 's': acc.s}}
            WHEN e.s = acc.lvl THEN {{'lvl': acc.lvl + 1, 't1': acc.t1, 'dead': false, 't': acc.t, 's': acc.s}}
            {interrupt_branch}
            ELSE acc END
      )).lvl"""


def _greedy_sql(cmp: str) -> str:
    return f"""COALESCE(list_max(list_transform(s0, t1 -> (
        CASE WHEN list_min(list_filter(s1, x -> x {cmp} t1 AND x <= t1 + {_FUNNEL_W})) IS NULL THEN 1
             WHEN list_min(list_filter(s2, x -> x {cmp} list_min(list_filter(s1, x2 -> x2 {cmp} t1 AND x2 <= t1 + {_FUNNEL_W}))
                                             AND x <= t1 + {_FUNNEL_W})) IS NULL THEN 2
             ELSE 3 END))), 0)"""


@register(
    "funnel_strict_modes",
    oracle=f"""
    WITH base AS (
      SELECT user_id,
        list_sort(list(struct_pack(t := epoch_us(ts),
          s := CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 WHEN 'purchase' THEN 2 ELSE -1 END))) AS ev,
        list(epoch_us(ts)) FILTER (WHERE event_type='view') AS s0,
        list(epoch_us(ts)) FILTER (WHERE event_type='click') AS s1,
        list(epoch_us(ts)) FILTER (WHERE event_type='purchase') AS s2
      FROM events GROUP BY user_id),
    starts AS (
      SELECT user_id, ev[u.i].t AS t1, list_slice(ev, u.i + 1, len(ev)) AS rest
      FROM base, unnest(range(1, len(ev)+1)) AS u(i)
      WHERE ev[u.i].s = 0),
    folded AS (
      SELECT user_id,
        MAX({_fold_sql("WHEN e.s >= 0 AND e.s < acc.lvl THEN {'lvl': acc.lvl, 't1': acc.t1, 'dead': true, 't': acc.t, 's': acc.s}")}) AS dd,
        MAX({_fold_sql("WHEN true THEN {'lvl': acc.lvl, 't1': acc.t1, 'dead': true, 't': acc.t, 's': acc.s}")}) AS oo
      FROM starts GROUP BY user_id)
    SELECT b.user_id,
      CAST({_greedy_sql('>=')} AS INTEGER) AS funnel_default,
      CAST({_greedy_sql('>')} AS INTEGER) AS funnel_strict_increase,
      CAST(COALESCE(f.dd, 0) AS INTEGER) AS funnel_strict_dedup,
      CAST(COALESCE(f.oo, 0) AS INTEGER) AS funnel_strict_order
    FROM base b LEFT JOIN folded f USING (user_id)
    """,
)
def funnel_strict_modes(spark, sf_dir):
    """All four ClickHouse ``windowFunnel`` modes in ONE pass (r5 —
    closes the r4 gap where only the default chain comparison existed):
    ``default`` (equal-ts extends), ``strict_increase`` (ts strictly
    increasing), ``strict_dedup`` (a repeat of an already-matched
    condition interrupts), ``strict_order`` (ANY intervening event
    interrupts). One groupBy collects the per-step arrays plus one
    (ts, step)-sorted struct array; the strict modes fold over it with
    an (lvl, prev, dead) accumulator — all JVM higher-order
    expressions, no joins/windows/Python. The oracle mirrors the fold
    with DuckDB ``list_reduce`` — an independent lambda engine — so
    the interrupt rules are cross-checked expression by expression."""
    from postgre_to_clickhouse_spark.operators.funnel import MODES, window_funnel_modes

    ev = _t(spark, sf_dir, "events")
    return window_funnel_modes(
        ev, ["view", "click", "purchase"], window_us=_FUNNEL_W, modes=MODES
    )


_SEQ_GUARD = 3600 * 1_000_000  # 1 h in µs: the (?t<=3600) between view and click


@register(
    "sequence_match_3step",
    oracle=f"""
    WITH hit AS (
      SELECT DISTINCT a.user_id
      FROM events a
      JOIN events b ON a.user_id = b.user_id
      JOIN events c ON a.user_id = c.user_id
      WHERE a.event_type = 'view' AND b.event_type = 'click' AND c.event_type = 'purchase'
        AND epoch_us(b.ts) >= epoch_us(a.ts)
        AND epoch_us(b.ts) <= epoch_us(a.ts) + {_SEQ_GUARD}
        AND epoch_us(c.ts) >= epoch_us(b.ts)
    )
    SELECT u.user_id, (h.user_id IS NOT NULL) AS matched
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN hit h USING (user_id)
    """,
)
def sequence_match_3step(spark, sf_dir):
    """ClickHouse ``sequenceMatch('(?1)(?t<=3600)(?2)(?3)')`` parity
    (r5 — the general guarded pattern the r4 query lacked): a view,
    then a click within 1 h OF THAT VIEW, then a purchase any time
    later. Greedy chaining is wrong under pair guards (choosing the
    earliest click can strand a later view whose guard window actually
    reaches a click), so the operator runs the feasible-set DP
    (operators/funnel.py::sequence_match). The oracle is an INDEPENDENT
    3-way join — a structurally different computation that agrees
    exactly because both sides use the same deterministic >= time
    semantics."""
    from postgre_to_clickhouse_spark.operators.funnel import sequence_match

    ev = _t(spark, sf_dir, "events")
    return sequence_match(
        ev,
        ["view", "click", "purchase"],
        guards=[(0, _SEQ_GUARD), (0, None)],
    )


@register(
    "sequence_match_negation",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS t FROM events
    ),
    hit AS (
      SELECT DISTINCT a.user_id
      FROM e a
      JOIN e b ON a.user_id = b.user_id
      JOIN e c ON a.user_id = c.user_id
      WHERE a.event_type = 'signup'
        AND b.event_type IN ('click', 'view')
        AND c.event_type = 'purchase'
        AND b.t >= a.t AND b.t <= a.t + {_SEQ_GUARD}
        AND c.t >= b.t
        AND NOT EXISTS (
          SELECT 1 FROM e z
          WHERE z.user_id = a.user_id AND z.event_type = 'error'
            AND z.t > b.t AND z.t < c.t
        )
    )
    SELECT u.user_id, (h.user_id IS NOT NULL) AS matched
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN hit h USING (user_id)
    """,
)
def sequence_match_negation(spark, sf_dir):
    """r7 (VERDICT r6 #4): ``sequenceMatch`` with ALTERNATION and
    NEGATION — the funnel family's last documented semantic gap
    (PARITY.md B21 caveat). Pattern
    ``(?1)(?t<=3600)(?2|?3)(?!4)(?5)`` over conditions (signup, click,
    view, error, purchase): a signup, then a click OR view within 1 h
    of it, then a purchase any time later with NO error event strictly
    between the middle match and the purchase. Compiled by
    ``parse_sequence_pattern`` and run through the feasible-set DP —
    alternation widens a step's candidate array (isin collect),
    negation is a pairwise open-interval predicate inside the same
    ``exists``, so the DP recurrence stays exact (a match via click
    can be error-poisoned while the view path survives — the DP keeps
    both alive; see test_funnel.py). The oracle is an INDEPENDENT
    3-way join + NOT EXISTS (per VERDICT r6: join/CTE oracles for
    state machines, never ``list_reduce``)."""
    from postgre_to_clickhouse_spark.operators.funnel import sequence_match_pattern

    ev = _t(spark, sf_dir, "events")
    return sequence_match_pattern(
        ev,
        "(?1)(?t<=3600)(?2|?3)(?!4)(?5)",
        ["signup", "click", "view", "error", "purchase"],
    )


@register(
    "sequence_match_dot",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS t FROM events
      WHERE event_type IN ('signup', 'purchase')
    ),
    hit AS (
      SELECT DISTINCT a.user_id
      FROM e a
      JOIN e b ON a.user_id = b.user_id
      WHERE a.event_type = 'signup'
        AND b.event_type = 'purchase'
        AND b.t >= a.t AND b.t <= a.t + {2 * _SEQ_GUARD}
        AND (SELECT count(*) FROM e z
             WHERE z.user_id = a.user_id AND z.t > a.t AND z.t < b.t) = 1
    )
    SELECT u.user_id, (h.user_id IS NOT NULL) AS matched
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN hit h USING (user_id)
    """,
)
def sequence_match_dot(spark, sf_dir):
    """r8 (VERDICT r7 #6): the ``.`` token — EXACTLY one visible event
    strictly between two matched conditions — closing the last
    sequenceMatch syntax gap (PARITY.md B21). Pattern
    ``(?1)(?t<=7200).(?2)`` over conditions (signup, purchase): a
    signup, then a purchase within 2 h with exactly ONE
    condition-visible event (another signup or purchase — ClickHouse's
    model, where rows matching no condition never enter the pattern
    sequence) strictly between them. The dot slots into the
    feasible-set DP as a pairwise (y, x) count predicate inside the
    same ``exists`` — extension validity still depends only on the
    prefix's last element, so the recurrence stays exact. Oracle: an
    INDEPENDENT self-join + correlated strict-between count (join/CTE
    oracles for state machines, never ``list_reduce``); brute-force
    cross-check in test_properties.py."""
    from postgre_to_clickhouse_spark.operators.funnel import sequence_match_pattern

    ev = _t(spark, sf_dir, "events")
    return sequence_match_pattern(
        ev, "(?1)(?t<=7200).(?2)", ["signup", "purchase"]
    )


@register(
    "multimodal_video_gif",
    oracle="""
    SELECT d.doc_id,
           CAST(f.i AS INTEGER) AS frame_idx,
           64 AS n_px,
           CAST(SUM(((d.doc_id * 7 + t.j) % 256 + f.i) % 256) AS BIGINT) AS px_sum,
           CAST(MIN(CASE WHEN t.j = 0
             THEN ((d.doc_id * 7 + (f.i % 8) * 8) % 256 + f.i) % 256
           END) AS INTEGER) AS first_px
    FROM documents d, range(4) f(i), range(64) t(j)
    GROUP BY d.doc_id, f.i
    """,
)
def multimodal_video_gif(spark, sf_dir):
    """C5, r6: the video path through a REAL animation container —
    4 closed-form grayscale frames per document packed into GIF89a
    (dependency-free LZW codec, operators/gif.py), decoded back, and
    reduced to integer-exact per-frame stats. GIF is lossless, so the
    SQL oracle recomputes every stat from the frame formula; px_sum is
    roll-invariant while first_px moves with the roll (a wrong shift
    direction or frame order flips it). Payload bytes cross Arrow once
    per stage, exactly like the image path."""
    from postgre_to_clickhouse_spark.operators.multimodal import (
        gif_frame_stats,
        gif_from_ids,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    media = gif_from_ids(d, id_col="doc_id", n_frames=4)
    return gif_frame_stats(media, id_col="doc_id")


@register(
    "sequence_count_funnel",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT user_id, s,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, s) AS i
      FROM (
        SELECT user_id, ts,
               CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                               WHEN 'purchase' THEN 3 END AS s
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase'))
    ),
    n AS (SELECT user_id, max(i) AS mx FROM e GROUP BY user_id),
    walk AS (
      SELECT user_id, 0 AS i, 0 AS p, 0 AS c FROM n
      UNION ALL
      SELECT w.user_id, w.i + 1,
             CASE WHEN e.s = w.p + 1 AND e.s < 3 THEN w.p + 1
                  WHEN e.s = 3 AND w.p = 2 THEN 0
                  ELSE w.p END,
             CASE WHEN e.s = 3 AND w.p = 2 THEN w.c + 1 ELSE w.c END
      FROM walk w JOIN e ON e.user_id = w.user_id AND e.i = w.i + 1
    )
    SELECT w.user_id, CAST(w.c AS BIGINT) AS n_matches
    FROM walk w JOIN n ON n.user_id = w.user_id AND w.i = n.mx
    """,
)
def sequence_count_funnel(spark, sf_dir):
    """r6, B21: ClickHouse ``sequenceCount`` — non-overlapping
    view→click→purchase chains per user, single-pointer greedy exactly
    as ClickHouse scans ("starts searching for the next chain after
    the current chain is matched"). The oracle walks the same state
    machine as a recursive CTE (one step per event — an INDEPENDENT
    sequential replay, the CC-oracle pattern). list_reduce was
    rejected for this oracle: DuckDB 1.0 returns row-misaligned
    results for per-row folds at some cardinalities (verified — values
    swapped between users 7/14 at sf0.001 vs a Python replay, with
    both list- and scalar-typed accumulators). Ties at equal
    timestamps break on step index in both engines."""
    from postgre_to_clickhouse_spark.operators.funnel import sequence_count

    ev = _t(spark, sf_dir, "events")
    return sequence_count(ev, ["view", "click", "purchase"])
