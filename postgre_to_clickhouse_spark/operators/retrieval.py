"""BM25 full-text retrieval over an inverted index (training-data /
analytics tier: reference-free document search, the lexical complement
to the vector paths in ``operators/similarity`` / ``operators/ann``).

Shape (the classic distributed inverted-index pipeline):

1. tokenize each document ONCE (``regexp_extract_all`` — JVM, fused
   into the scan) and carry the document length alongside;
2. term frequencies = one shuffle on (doc, term);
3. document frequencies = one shuffle on term (the postings "index");
4. queries tokenize to a tiny (query_id, term) set that BROADCASTS —
   scoring touches only the postings of query terms, the corpus never
   re-shuffles for the query set;
5. per-(query, doc) score = exact-decimal sum of per-term
   contributions, then a per-query top-k window over the (small)
   candidate set.

At 100 TB the scale levers are the standard IR ones: persist stages 2-3
as a bucketed-by-term table (the index is built once, probed per query
batch), and prune stopword postings by an idf floor before the probe
join. Neither changes the semantics below.

Determinism (full DuckDB oracle, no goldens): the BM25 idf is used in
its raw odds-ratio form ``(N - df + 0.5)/(df + 0.5)`` — a monotone
PER-TERM transform of the usual ``ln`` idf that keeps every arithmetic
step an IEEE-exact operation (+ - * /), so identical operand sequences
produce bit-identical doubles on Spark and DuckDB (``ln`` is not
correctly rounded cross-engine; see queries/registry.py). Per-term
contributions are summed with the exact-decimal ``dsum`` convention,
making the score independent of summation order.

NOTE on ranking semantics: because the per-term transform is applied
BEFORE the sum, multi-term query scores are a BM25 *variant*, not a
monotone transform of Robertson/ln-idf BM25 — rankings can differ from
a standard implementation on multi-term queries (single-term rankings
are identical). This is the deliberate trade for a bit-exact
cross-engine oracle; a production deployment wanting textbook scores
computes ``ln`` idf on one engine and accepts tolerance-based checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

# BM25 constants, precomputed in Python and embedded via repr() in BOTH
# the Spark expression and the DuckDB oracle — repr round-trips doubles
# exactly, so "k1 + 1" is the same double on both engines even though
# 1.2 + 1.0 is not the same double as the literal 2.2.
K1 = 1.2
B = 0.75
K1P1 = K1 + 1.0
ONE_MINUS_B = 1.0 - B


def _contrib_sql(
    n: str = "__n",
    df: str = "df",
    tf: str = "tf",
    dl: str = "__dl",
    avgdl: str = "__avgdl",
) -> str:
    """The per-(term, doc) BM25 contribution as SQL text, valid verbatim
    on Spark and DuckDB. Column references are parameters so an oracle
    can qualify them with its own table aliases (``df="d.df"``) instead
    of string-replacing the shared text — a rename inside the formula
    can then never silently qualify the wrong column."""
    return (
        f"((CAST({n} - {df} AS DOUBLE) + 0.5) / (CAST({df} AS DOUBLE) + 0.5))"
        f" * ((CAST({tf} AS DOUBLE) * {K1P1!r})"
        f" / (CAST({tf} AS DOUBLE) + {K1!r}"
        f" * ({ONE_MINUS_B!r} + {B!r} * CAST({dl} AS DOUBLE) / {avgdl})))"
    )


def tokenize(text_col: str) -> F.Column:
    """Lowercased word tokens (same convention as decontamination)."""
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, doc_id, score) for every document sharing at least one
    term with the query. ``queries`` = (query_id, text)."""
    # imported here, not at module level: queries.registry lives under
    # the queries package whose __init__ imports the module registering
    # bm25 — a top-level import would be circular
    from postgre_to_clickhouse_spark.queries.registry import dsum

    # r16: measured and deliberately NOT spread_small_input'd — the
    # plain tokenize+explode is cheap enough that the extra round-robin
    # shuffle cost more than the parallelism bought (A/B at sf0.1:
    # 1.95 s with vs 1.6 s without).
    toks = docs.select(id_col, tokenize(text_col).alias("__tk"))
    lens = toks.select(id_col, F.size("__tk").alias("__dl"))
    # global stats: one scalar row, broadcast into the scoring join
    stats = lens.agg(
        F.count(F.lit(1)).alias("__n"),
        F.expr("CAST(SUM(__dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)").alias("__avgdl"),
    )
    tf = (
        toks.select(id_col, F.size("__tk").alias("__dl"), F.explode("__tk").alias("term"))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        query_id_col, F.explode(tokenize(text_col)).alias("term")
    ).distinct()
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(query_id_col, id_col)
        # precision 28 (not dsum's compact-decimal default 18): the
        # per-term contribution ≈ 2.2·(N−df)/(df+0.5) needs integer
        # digits ∝ corpus size — 9 digits overflow (→ NULL under
        # non-ANSI casts, silently dropping terms) past ~5e8 docs,
        # while 19 digits cover any corpus this module's 100 TB framing
        # contemplates. Worth the BigDecimal path on this one agg.
        .agg(dsum(F.expr(_contrib_sql()), scale=9, precision=28).alias("score"))
    )
    return scored
