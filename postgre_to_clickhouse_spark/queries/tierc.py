"""Tier C — training-data-pipeline operators over ``documents`` /
``embeddings`` (SURVEY.md §2.6, BASELINE.json north star). SQL-expressible
ops carry a DuckDB oracle; LSH/sketch ops are rows-only (engine-specific
hashes) with accuracy asserted against exact baselines in tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.operators import dedup as D
from postgre_to_clickhouse_spark.operators import similarity as S
from postgre_to_clickhouse_spark.operators import text as X
from postgre_to_clickhouse_spark.queries.registry import register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


# --------------------------------------------------------------------------
# C1 — exact dedup
# --------------------------------------------------------------------------
@register(
    "dedup_exact_documents",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact_documents(spark, sf_dir):
    """Exact content dedup: one survivor (lowest doc_id) per sha256(text).
    Scale: shuffles a 32-byte digest, never the document bodies."""
    d = _t(spark, sf_dir, "documents")
    return D.exact_dedup(d, content_cols=("text",), order_col="doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


# --------------------------------------------------------------------------
# C4 — text quality stats
# --------------------------------------------------------------------------
@register(
    "text_quality_stats",
    oracle="""
    SELECT doc_id,
           length(text) AS q_chars,
           len(regexp_extract_all(text, '\\w+')) AS q_words,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS q_tokens,
           CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
             / greatest(length(text), 1) AS q_punct_ratio,
           CAST(len(regexp_extract_all(' ' || lower(text) || ' ', ' (the|and|of|to|is|a|in) ')) AS DOUBLE)
             / greatest(len(regexp_extract_all(text, '\\w+')), 1) AS q_stopword_ratio
    FROM documents
    """,
)
def text_quality_stats(spark, sf_dir):
    """Per-doc quality metrics (C4): char/word/BPE-ish-token counts,
    punctuation + stopword ratios. Pure regexp built-ins → codegen."""
    d = _t(spark, sf_dir, "documents")
    return X.quality_stats(d).select(
        "doc_id", "q_chars", "q_words", "q_tokens", "q_punct_ratio", "q_stopword_ratio"
    )


@register(
    "text_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS fp_md5,
           sha256(lower(trim(text))) AS fp_sha256,
           md5(substring(lower(trim(text)), 1, 128)) AS fp_prefix128
    FROM documents
    """,
)
def text_fingerprints(spark, sf_dir):
    """Document fingerprinting (C4): md5/sha256 content digests + a
    128-char prefix digest for chunked comparison."""
    d = _t(spark, sf_dir, "documents")
    return X.fingerprint(d).select("doc_id", "fp_md5", "fp_sha256", "fp_prefix128")


def _lang_id_oracle() -> str:
    """DuckDB twin of :func:`operators.text.lang_id`, generated from the
    same ``_LANG_MARKERS`` table so the two can never drift. Both engines
    count non-overlapping leftmost regex matches (Java regex / RE2 agree
    on plain alternation), and the argmax tie-break is the identical
    (score, -index, lang) struct ordering."""
    structs = []
    for i, (lang, words) in enumerate(sorted(X._LANG_MARKERS.items())):
        if not words:
            continue
        pat = " (" + "|".join(words) + ") "
        structs.append(
            f"{{'score': len(regexp_extract_all(' ' || lower(text) || ' ', '{pat}')), "
            f"'nb': {-i}, 'lang': '{lang}'}}"
        )
    arr = "[" + ", ".join(structs) + "]"
    return f"""
    SELECT doc_id, lang,
           CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
                WHEN best.score > 0 THEN best.lang
                ELSE 'und' END AS pred_lang
    FROM (SELECT doc_id, lang, text, list_reverse_sort({arr})[1] AS best FROM documents)
    """


@register("text_lang_id", oracle=_lang_id_oracle())
def text_lang_id(spark, sf_dir):
    """Language ID heuristic (C4): CJK script detection + stopword argmax.
    Oracle-exact: the DuckDB twin is generated from the same marker table
    (see :func:`_lang_id_oracle`); tests additionally assert agreement
    with the `lang` label where markers exist."""
    d = _t(spark, sf_dir, "documents")
    return X.lang_id(d).select("doc_id", "lang", "pred_lang")


# --------------------------------------------------------------------------
# C3 — vector similarity search
# --------------------------------------------------------------------------
@register(
    "vector_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             list_sum(list_transform(list_zip(e.embedding, q.query_vec),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(q.query_vec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
             AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, round(cosine, 9) AS cosine_r, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def vector_cosine_topk(spark, sf_dir):
    """Exact brute-force cosine top-10 for 5 query vectors (C3 baseline).
    JVM higher-order functions; queries broadcast; final top-k is a
    window on the small scored set."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.cosine_topk(e, q, k=10)
    return out.select("query_id", "vec_id", F.round("cosine", 9).alias("cosine_r"), "rank")


@register("vector_lsh_topk")  # approximate — rows-only; recall asserted in tests
def vector_lsh_topk(spark, sf_dir):
    """Approximate ANN via random-hyperplane LSH buckets + exact re-rank
    (the 100 TB scale path for C3). Deterministic planes (seeded)."""
    import random

    rnd = random.Random(42)
    # 8 tables × 4 hyperplanes: collision prob per table (1-θ/π)^4 — tuned
    # for the fixture's moderate-cosine neighbors (recall ≥ 0.5 asserted
    # in tests); at scale, bits/tables trade candidate volume vs recall.
    planes_tables = [[[rnd.gauss(0, 1) for _ in range(64)] for _ in range(4)] for _ in range(8)]
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.lsh_topk(e, q, planes_tables, k=10).select("query_id", "vec_id", "cosine", "rank")


# --------------------------------------------------------------------------
# C2 — fuzzy / near-duplicate detection
# --------------------------------------------------------------------------
@register("minhash_near_dup_candidates")  # hash-family-specific — rows-only
def minhash_near_dup_candidates(spark, sf_dir):
    """Banded MinHash LSH candidate pairs over documents (C2). xxhash64
    minhash family, 32 hashes × 8 bands. Verified against exact n-gram
    Jaccard in tests (precision of candidates)."""
    d = _t(spark, sf_dir, "documents")
    return D.minhash_near_dup(d, num_hashes=32, bands=8).orderBy("id_a", "id_b")


@register("simhash_signatures")  # xxhash64-based — rows-only
def simhash_signatures(spark, sf_dir):
    """64-bit SimHash signature per document (C2), JVM-side explode+agg."""
    d = _t(spark, sf_dir, "documents")
    return D.simhash(d).orderBy("doc_id")


@register(
    "ngram_jaccard_same_source",
    oracle="""
    WITH sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 1) + 1),
               i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + 2), ' ')
             )) AS grams
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(a.grams || b.grams)), 9) AS jaccard_r
    FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    """,
)
def ngram_jaccard_same_source(spark, sf_dir):
    """Exact 3-gram Jaccard for all same-source document pairs (C2
    verification stage). Blocked self-join (source = LSH-bucket stand-in,
    keeps pairs bounded at scale)."""
    d = _t(spark, sf_dir, "documents")
    pairs = (
        d.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"))
        .join(d.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src_b")),
              F.col("src_a") == F.col("src_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    out = D.ngram_jaccard_pairs(d, pairs, n=3)
    return out.select("id_a", "id_b", F.round("jaccard", 9).alias("jaccard_r"))
