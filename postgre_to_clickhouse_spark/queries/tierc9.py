"""Tier C round 14: EXACT suffix-array ExactSubstr (VERDICT r13
"What's missing" #3 — the one public dedup primitive previously
shipped only as the 8-gram approximation in ``operators/spans.py``).

Driver-gated queries over ``operators/suffix_array.py`` (plus one
retrieval-training mining op over ``operators/similarity.py``):

- ``exact_substr_spans`` — exact Lee et al. 2022 duplicated-span
  detection over the whole documents corpus (char-level L = 40,
  >= 2 occurrences anywhere). The DuckDB oracle recomputes the spans
  from first principles (substr gram explosion + HAVING count >= 2 +
  gaps-and-islands merge), so the filter-verify stages are checked
  against literal string equality.
- ``suffix_array_rank`` — the exact per-document suffix array itself
  on a deterministic subset, checked against DuckDB's literal
  ORDER BY-the-suffix ranking (binary collation both sides; the
  corpus is ASCII).
- ``suffix_lcp_rank`` — the LCP array alongside it (SA+LCP, the
  complete primitive).
- ``hard_negative_mining`` — per-query top-5 cross-class cosine
  neighbors with false-negative denoising (session 2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.operators import suffix_array as SA
from postgre_to_clickhouse_spark.queries.registry import register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


@register(
    "exact_substr_spans",
    oracle="""
    WITH pos AS (
      SELECT doc_id, unnest(generate_series(1, length(text) - 39)) AS p, text
      FROM documents
    ),
    grams AS (SELECT doc_id, p, substr(text, p, 40) AS g FROM pos),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    hits AS (SELECT doc_id, p AS s, p + 39 AS e FROM grams JOIN dup USING (g)),
    pe AS (SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_e
           FROM hits),
    isl AS (SELECT doc_id, s, e,
             sum(CASE WHEN s > coalesce(prev_e, -2) + 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS k
            FROM pe)
    SELECT doc_id, min(s) AS span_start, max(e) AS span_end
    FROM isl GROUP BY doc_id, k
    """,
)
def exact_substr_spans(spark, sf_dir):
    """EXACT ExactSubstr (Lee et al. 2022): merged character spans
    covered by any 40-char substring occurring >= 2 times anywhere in
    the corpus — within- and cross-document, exactly the semantics of
    the paper's concatenated-corpus suffix array. Filter-then-verify,
    both stages exact: duplicated seed-window flags at every stride-w
    offset are a PROVEN necessary condition (per-doc window leads, no
    self-joins), and candidates verify by grouping their LITERAL
    L-grams — so unlike the MinHash/SimHash families and the shipped
    8-gram span approximation, the result carries zero
    collision/granularity error at any corpus size. Scale shape: one
    hashed seed groupBy + one per-doc window pass over character
    positions; the L-fold gram blowup applies only to candidates
    (the Zipf head), never the corpus — and never all-pairs."""
    d = _t(spark, sf_dir, "documents")
    return SA.exact_substr_spans(
        d, min_len=40, min_count=2, text_col="text", id_col="doc_id"
    )


@register(
    "suffix_array_rank",
    oracle="""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 = 3),
    s AS (SELECT doc_id, unnest(generate_series(1, length(text))) AS pos, text
          FROM d),
    suf AS (SELECT doc_id, pos, substr(text, pos) AS sfx FROM s)
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY doc_id ORDER BY sfx) AS sa_rank
    FROM suf
    """,
)
def suffix_array_rank(spark, sf_dir):
    """The exact distributed suffix array itself (Manber–Myers prefix
    doubling, Flick & Aluru SC'15 shape): for every position of every
    document in a deterministic 1-in-11 subset, the 1-based rank of
    its suffix in the document's lexicographic suffix order. The
    oracle sorts the literal suffix strings — any rank error anywhere
    breaks the hash match. Doubling stops early once every (doc, rank)
    is unique (order decided inside the window); each round is one
    co-partitioned self-join + one banded dense rank — no
    single-partition stage at any width."""
    d = _t(spark, sf_dir, "documents").filter("doc_id % 11 = 3")
    return SA.suffix_array(d, text_col="text", id_col="doc_id")


@register(
    "suffix_lcp_rank",
    oracle="""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 = 3),
    s AS (SELECT doc_id, unnest(generate_series(1, length(text))) AS pos, text
          FROM d),
    suf AS (SELECT doc_id, pos, substr(text, pos) AS sfx FROM s),
    ranked AS (SELECT doc_id, pos, sfx,
               row_number() OVER (PARTITION BY doc_id ORDER BY sfx)
                 AS sa_rank FROM suf),
    pairs AS (SELECT doc_id, pos, sa_rank, sfx,
              lag(sfx) OVER (PARTITION BY doc_id ORDER BY sa_rank) AS prev
              FROM ranked)
    SELECT doc_id, pos, sa_rank,
           CASE WHEN prev IS NULL THEN 0
                ELSE len(list_filter(
                       generate_series(1, least(length(sfx), length(prev))),
                       i -> substr(sfx, 1, i) = substr(prev, 1, i)))
           END AS lcp
    FROM pairs
    """,
)
def suffix_lcp_rank(spark, sf_dir):
    """The LCP array alongside the suffix array — the complete SA+LCP
    primitive of the distributed construction literature (Flick &
    Aluru SC'15 build both together) and of ExactSubstr-style
    maximal-repeat mining: for each suffix, the exact common-prefix
    length with its predecessor in the document's suffix order. The
    construction's early stop PROVES every lcp below the final window
    width, so the whole LCP array resolves in one bounded map fold
    (the default; the literature's level-descent over the kept
    doubling ranks ships as method='descent' for concatenated-corpus
    regimes) — the oracle recomputes every lcp from the literal
    sorted suffixes, so a single off-by-one anywhere breaks the hash
    match."""
    d = _t(spark, sf_dir, "documents").filter("doc_id % 11 = 3")
    return SA.suffix_array_with_lcp(d, text_col="text", id_col="doc_id")


@register(
    "hard_negative_mining",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec,
                      label AS query_label
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, e.vec_id,
             list_sum(list_transform(list_zip(e.embedding, q.query_vec),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(e.embedding,
                              x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(q.query_vec,
                              x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
             AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id AND e.label <> q.query_label
    )
    SELECT query_id, vec_id, round(cosine, 9) AS cosine_r, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rank
      FROM scored WHERE cosine <= 0.95
    ) WHERE rank <= 5
    """,
)
def hard_negative_mining(spark, sf_dir):
    """Hard-negative mining for retrieval training (the dense-passage
    pipeline step: per training query, the top-5 MOST similar corpus
    vectors of a DIFFERENT relevance class, with suspected false
    negatives — cross-class cosine > 0.95, i.e. mislabeled
    near-duplicates — denoised away first, RocketQA-style). Exact
    brute-force baseline: broadcast query side, scoring fused into the
    corpus scan, per-query window top-k — the ANN variants (IVF/PQ)
    must reproduce exactly this set at high recall. Oracle recomputes
    every cosine with the identical sequential double fold."""
    from postgre_to_clickhouse_spark.operators.similarity import (
        mine_hard_negatives,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    out = mine_hard_negatives(e, q, k=5, dup_ceiling=0.95)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 9).alias("cosine_r"), "rank"
    )


@register(
    "exact_substr_trim",
    oracle="""
    WITH pos AS (
      SELECT doc_id, unnest(generate_series(1, length(text) - 39)) AS p, text
      FROM documents
    ),
    grams AS (SELECT doc_id, p, substr(text, p, 40) AS g FROM pos),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    hits AS (SELECT doc_id, p AS s, p + 39 AS e FROM grams JOIN dup USING (g)),
    pe AS (SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_e
           FROM hits),
    isl AS (SELECT doc_id, s, e,
             sum(CASE WHEN s > coalesce(prev_e, -2) + 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS k
            FROM pe),
    spans AS (SELECT doc_id, min(s) AS ss, max(e) AS se
              FROM isl GROUP BY doc_id, k),
    segs AS (
      SELECT doc_id,
             coalesce(lag(se) OVER (PARTITION BY doc_id ORDER BY ss), 0) + 1
               AS ks,
             ss - 1 AS ke
      FROM spans
      UNION ALL
      SELECT s.doc_id, max(s.se) + 1, length(d.text)
      FROM spans s JOIN documents d USING (doc_id)
      GROUP BY s.doc_id, length(d.text)
    ),
    agg AS (
      SELECT s2.doc_id,
             string_agg(substr(d.text, s2.ks, s2.ke - s2.ks + 1),
                        '' ORDER BY s2.ks) AS ct
      FROM segs s2 JOIN documents d USING (doc_id)
      WHERE s2.ke >= s2.ks
      GROUP BY s2.doc_id
    ),
    stat AS (
      SELECT doc_id, count(*) AS n_spans, sum(se - ss + 1) AS removed
      FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id, length(d.text) AS n_chars,
           CAST(coalesce(st.removed, 0) AS BIGINT) AS removed_chars,
           CAST(coalesce(st.n_spans, 0) AS BIGINT) AS n_spans,
           CASE WHEN st.doc_id IS NULL THEN d.text
                ELSE coalesce(a.ct, '') END AS cleaned_text
    FROM documents d
    LEFT JOIN stat st USING (doc_id)
    LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
)
def exact_substr_trim(spark, sf_dir):
    """The REMOVAL half of exact ExactSubstr (Lee et al. cut every
    character covered by a duplicated span — all occurrences, their
    released tool's behavior): the cleaned corpus plus per-document
    accounting. Detection is the exact filter-verify pass; the cut is
    one per-document fold over the sorted span list after a single
    co-keyed join (map-side — no extra shuffle beyond detection). The
    oracle rebuilds every cleaned string from complement segments in
    SQL, so a single off-by-one character anywhere breaks the hash."""
    d = _t(spark, sf_dir, "documents")
    return SA.exact_substr_trim(
        d, min_len=40, min_count=2, text_col="text", id_col="doc_id"
    )


@register(
    "longest_repeat_documents",
    oracle="""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 = 3),
    s AS (SELECT doc_id, unnest(generate_series(1, length(text))) AS pos, text
          FROM d),
    suf AS (SELECT doc_id, pos, substr(text, pos) AS sfx FROM s),
    ranked AS (SELECT doc_id, pos, sfx,
               row_number() OVER (PARTITION BY doc_id ORDER BY sfx)
                 AS sa_rank FROM suf),
    pairs AS (SELECT doc_id, pos, sfx,
              lag(sfx) OVER (PARTITION BY doc_id ORDER BY sa_rank) AS prev
              FROM ranked),
    lcps AS (
      SELECT doc_id, pos,
             CASE WHEN prev IS NULL THEN 0
                  ELSE len(list_filter(
                         generate_series(1,
                           least(length(sfx), length(prev))),
                         i -> substr(sfx, 1, i) = substr(prev, 1, i)))
             END AS lcp
      FROM pairs
    ),
    mx AS (SELECT doc_id, max(lcp) AS lrs_len FROM lcps GROUP BY doc_id),
    best AS (
      SELECT l.doc_id, m.lrs_len, min(l.pos) AS lrs_pos
      FROM lcps l JOIN mx m ON l.doc_id = m.doc_id AND l.lcp = m.lrs_len
      GROUP BY l.doc_id, m.lrs_len
    )
    SELECT d.doc_id,
           CAST(best.lrs_len AS BIGINT) AS lrs_len,
           CASE WHEN best.lrs_len > 0
                THEN substr(d.text, best.lrs_pos, best.lrs_len)
                ELSE '' END AS lrs
    FROM d JOIN best ON d.doc_id = best.doc_id
    ORDER BY d.doc_id
    """,
)
def longest_repeat_documents(spark, sf_dir):
    """r15: the LONGEST REPEATED SUBSTRING per document — the classic
    consumption of the SA+LCP pair (the maximum LCP over adjacent
    suffixes in suffix order IS the longest substring occurring at
    least twice in the document; Gusfield 1997 §7.12). Answers
    (doc_id, lrs_len, lrs) with the deterministic tie-break "smallest
    starting position among the maximal repeats" so the literal
    substring is well-defined. Documents with no repeated character
    answer lrs_len = 0 and the empty string. The DuckDB oracle
    recomputes everything from literally sorted suffixes, so the
    whole construction — doubling ranks, LCPs, the argmax, the
    extracted string — is hash-gated end to end.

    Scale: one groupBy(struct-max) over the SA+LCP rows (partial
    aggregation; the per-doc winner is a 1-row-per-doc frame) + one
    co-keyed join back to the text. No new heavy machinery beyond
    the suffix construction itself (bench-exempt as a skeleton
    sibling of suffix_lcp_rank, per bench.py's exemption table)."""
    d = _t(spark, sf_dir, "documents").filter("doc_id % 11 = 3")
    lcps = SA.suffix_array_with_lcp(d, text_col="text", id_col="doc_id")
    best = (
        lcps.groupBy("doc_id")
        .agg(
            F.max(
                F.struct(
                    F.col("lcp").alias("lcp"),
                    (-F.col("pos")).alias("np"),
                    F.col("pos").alias("pos"),
                )
            ).alias("b")
        )
        .select(
            "doc_id",
            F.col("b.lcp").alias("lrs_len"),
            F.col("b.pos").alias("lrs_pos"),
        )
    )
    out = best.join(d.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.col("lrs_len").cast("bigint").alias("lrs_len"),
        F.when(
            F.col("lrs_len") > 0,
            F.expr("substring(text, cast(lrs_pos as int), "
                   "cast(lrs_len as int))"),
        ).otherwise(F.lit("")).alias("lrs"),
    )
    return out  # gate hashes order-independently; skip the global sort
