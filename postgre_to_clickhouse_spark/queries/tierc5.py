"""Tier C continued (round 2): deterministic splits & sampling, text
cleaning / PII masking / repetition filters, int8 embedding
quantization, and the end-to-end dedup canonicalization pipeline.

All registered AFTER the driver window (the window already has one green
row per operator class) — these are pytest-oracle-gated and bench-visible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.operators import sampling as SM
from postgre_to_clickhouse_spark.operators import text_clean as TC
from postgre_to_clickhouse_spark.queries.registry import register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


def _horner_u(seed: str, id_expr: str) -> str:
    """DuckDB twin of sampling.split_hash: rebuild the first 8 md5 hex
    chars as an integer via Horner (DuckDB has no conv()); exact-integer
    then one double divide — bit-identical to Spark's conv()/divide."""
    h = f"md5('{seed}' || ':' || CAST({id_expr} AS VARCHAR))"
    expr = "0"
    for i in range(1, 9):
        expr = f"(({expr}) * 16 + (strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1))"
    return f"(CAST({expr} AS DOUBLE) / 4294967296.0)"


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_horner_u("split-v1", "doc_id")} < 0.9 THEN 'train'
                WHEN {_horner_u("split-v1", "doc_id")} < 0.95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_train_val_test(spark, sf_dir):
    """Content-addressed 90/5/5 split: the same doc lands in the same
    split on every run, any cluster size, any engine (the oracle
    recomputes the md5-derived assignment exactly). Map-only — fuses
    into the scan; no shuffle at any scale."""
    d = _t(spark, sf_dir, "documents")
    out = SM.deterministic_split(
        d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, seed="split-v1"
    )
    return out.select("doc_id", "split")


@register(
    "stratified_sample_documents",
    oracle=f"""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {_horner_u("sample-v1", "doc_id")}, doc_id) AS rk
      FROM documents
    ) WHERE rk <= 20
    """,
)
def stratified_sample_documents(spark, sf_dir):
    """Deterministic stratified sample: exactly min(20, |stratum|) docs
    per language, chosen by seeded content-hash order — reproducible
    'randomness' any engine can recompute. One shuffle (per-stratum
    rank)."""
    d = _t(spark, sf_dir, "documents")
    out = SM.stratified_sample(d, ["lang"], n_per_stratum=20, id_col="doc_id", seed="sample-v1")
    return out.select("doc_id", "lang", "source")


# Deterministic synthetic dirt so the cleaning operators do real work on
# the fixture corpus (its text is already clean): tags + an email + an ip
# derived from doc_id. The oracle constructs the identical dirty string.
_DIRTY_SPARK = lambda: F.concat(  # noqa: E731
    F.lit("<p class='x'>"),
    F.col("text"),
    F.lit("</p> <script>var x=1;</script> contact: user"),
    F.col("doc_id").cast("string"),
    F.lit("@example.com from 10.0.0."),
    (F.col("doc_id") % 256).cast("string"),
)
_DIRTY_SQL = (
    "'<p class=''x''>' || text || '</p> <script>var x=1;</script> contact: user' "
    "|| CAST(doc_id AS VARCHAR) || '@example.com from 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)"
)


@register(
    "text_clean_documents",
    oracle=f"""
    WITH dirty AS (SELECT doc_id, {_DIRTY_SQL} AS t FROM documents)
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '<[^>]+>', ' ', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b', '<IP>', 'g'),
             '\\s+', ' ', 'g')) AS clean,
           len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
           len(regexp_extract_all(t, '<[^>]+>')) AS n_tags
    FROM dirty
    """,
)
def text_clean_documents(spark, sf_dir):
    """C4 cleaning pass on deterministically-dirtied fixture text:
    HTML strip → control-char removal → PII masking (email, IPv4) →
    whitespace normalization, plus found-PII counts. Pure regexp
    built-ins (RE2 ∩ Java subset so the oracle runs the same patterns);
    fuses into the scan — cleaning at 100 TB is bandwidth-bound."""
    d = _t(spark, sf_dir, "documents").select("doc_id", _DIRTY_SPARK().alias("t"))
    return d.select(
        "doc_id",
        TC.clean_text("t").alias("clean"),
        F.regexp_count("t", F.lit(TC.EMAIL_RE)).alias("n_emails"),
        F.regexp_count("t", F.lit(TC.HTML_TAG_RE)).alias("n_tags"),
    )


@register(
    "text_repetition_stats",
    oracle="""
    WITH lined AS (
      SELECT doc_id, regexp_replace(text, ' (batch|join) ', chr(10), 'g') AS t
      FROM documents
    ),
    split_ AS (
      SELECT doc_id, string_split(t, chr(10)) AS lines,
             list_filter(string_split(regexp_replace(lower(t), '[^a-z0-9]+', ' ', 'g'), ' '),
                         w -> w <> '') AS words
      FROM lined
    )
    SELECT doc_id,
           len(lines) AS n_lines,
           len(list_distinct(lines)) AS n_distinct_lines,
           CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
             / greatest(len(lines), 1) AS dup_line_ratio,
           list_max(list_transform(lines, x -> length(x))) AS max_line_chars,
           CAST(len(words) - len(list_distinct(words)) AS DOUBLE)
             / greatest(len(words), 1) AS dup_word_ratio
    FROM split_
    """,
)
def text_repetition_stats(spark, sf_dir):
    """Gopher/C4-style repetition signals over a deterministically
    line-broken version of the fixture text (the corpus is single-line,
    so ' batch '/' join ' become newlines first — both engines apply the
    identical rewrite). Duplicate-line and duplicate-word mass are THE
    boilerplate detectors a pretraining filter runs; all higher-order
    array expressions, no shuffle."""
    from postgre_to_clickhouse_spark.operators.text_clean import repetition_stats

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_replace("text", r" (batch|join) ", "\n").alias("t")
    )
    out = repetition_stats(d, text_col="t")
    return out.select(
        "doc_id", "n_lines", "n_distinct_lines", "dup_line_ratio", "max_line_chars", "dup_word_ratio"
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS q_scale
      FROM embeddings
    )
    SELECT vec_id, q_scale,
           array_to_string(list_transform(embedding, x -> CAST(greatest(-127, least(127,
               floor(CAST(x AS DOUBLE) / (CASE WHEN q_scale = 0 THEN 1.0 ELSE q_scale END) + 0.5)
           )) AS INTEGER)), ',') AS q_codes_csv,
           list_max(list_transform(list_zip(embedding,
             list_transform(embedding, x -> CAST(greatest(-127, least(127,
                 floor(CAST(x AS DOUBLE) / (CASE WHEN q_scale = 0 THEN 1.0 ELSE q_scale END) + 0.5)
             )) AS INTEGER))),
             p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * q_scale))) AS max_abs_err
    FROM s
    """,
)
def embedding_quantize_int8(spark, sf_dir):
    """C3 compression: symmetric per-vector int8 quantization (4× less
    scan/shuffle/cache bandwidth at 100 TB) with the exact per-vector
    reconstruction-error bound. floor-based rounding and plain IEEE
    arithmetic only, so the oracle reproduces every code and error
    bit-for-bit. Codes are emitted as a CSV string (ints format
    identically in both engines) because the driver's pandas
    canonicalization cannot sort array-valued cells."""
    from postgre_to_clickhouse_spark.operators.quantize import quantized_table

    e = _t(spark, sf_dir, "embeddings")
    qt = quantized_table(e)
    err = F.array_max(
        F.zip_with(
            "embedding",
            "q_codes",
            lambda x, q: F.abs(x.cast("double") - q.cast("double") * F.col("q_scale")),
        )
    )
    codes_csv = F.array_join(F.transform("q_codes", lambda q: q.cast("string")), ",")
    return qt.select(
        "vec_id", "q_scale", codes_csv.alias("q_codes_csv"), err.alias("max_abs_err")
    )


@register(
    "vector_int8_topk",
    oracle="""
    WITH qt AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS q_scale,
             list_transform(embedding, x -> CAST(greatest(-127, least(127,
                 floor(CAST(x AS DOUBLE) /
                   (CASE WHEN list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) / 127.0 = 0
                         THEN 1.0
                         ELSE list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) / 127.0 END)
                 + 0.5))) AS INTEGER)) AS q_codes
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             CAST(list_sum(list_transform(list_zip(c.q_codes, q.q_codes),
                  p -> CAST(p[1] AS BIGINT) * CAST(p[2] AS BIGINT))) AS BIGINT) AS dot_i
      FROM qt c JOIN qt q ON q.vec_id < 5 AND c.vec_id <> q.vec_id
    )
    SELECT query_id, vec_id, dot_i, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot_i DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def vector_int8_topk(spark, sf_dir):
    """C3 quantized search: top-10 per query by EXACT integer dot product
    over int8 codes — the memory-bandwidth-bound scan shape (4× smaller
    than float32; the float column is only touched by an exact re-rank
    stage when needed). Integer scoring ⇒ full SQL oracle, no goldens."""
    from postgre_to_clickhouse_spark.operators.quantize import int8_topk, quantized_table

    e = _t(spark, sf_dir, "embeddings")
    qt = quantized_table(e)
    queries = qt.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "q_codes", "q_scale"
    )
    out = int8_topk(qt, queries, k=10)
    return out.select("query_id", "vec_id", "dot_i", "rank")


@register("dedup_pipeline_canonical")  # golden oracle installed by goldens.py
def dedup_pipeline_canonical(spark, sf_dir):
    """The END-TO-END near-dup pipeline a pretraining corpus runs:
    MinHash-LSH candidates → exact n-gram-Jaccard verification (≥ 0.5)
    → connected-components closure → canonical survivor = min doc_id
    per cluster. Every stage is the scale-shaped operator (bucketed LSH,
    pair-bounded verify, iterative CC with constant plan depth); the
    composition is seeded-deterministic ⇒ committed-golden oracle."""
    from postgre_to_clickhouse_spark.operators.dedup import minhash_near_dup, ngram_jaccard_pairs
    from postgre_to_clickhouse_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    cand = minhash_near_dup(d, num_hashes=32, bands=8)
    verified = ngram_jaccard_pairs(d, cand.select("id_a", "id_b"), n=3).filter(
        F.col("jaccard") >= 0.5
    )
    comps = connected_components(verified, "id_a", "id_b")
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("component_id"),
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    ).orderBy("doc_id")


@register(
    "decontaminate_eval_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 2, 1) + 1),
               i -> array_to_string(list_slice(tk, i, i + 2), ' ')))) AS g
      FROM toks
    ),
    eg AS (SELECT doc_id AS eval_id, g FROM grams WHERE doc_id % 25 = 0),
    sizes AS (SELECT eval_id, count(*) AS eval_grams FROM eg GROUP BY eval_id),
    hits AS (
      SELECT c.doc_id, e.eval_id, count(*) AS n_overlap
      FROM grams c JOIN eg e USING (g)
      WHERE c.doc_id <> e.eval_id
      GROUP BY c.doc_id, e.eval_id
    )
    SELECT h.doc_id, h.eval_id, h.n_overlap, s.eval_grams,
           round(CAST(h.n_overlap AS DOUBLE) / s.eval_grams, 9) AS eval_frac_r
    FROM hits h JOIN sizes s USING (eval_id)
    """,
)
def decontaminate_eval_overlap(spark, sf_dir):
    """Eval-set decontamination (training-pipeline hygiene): 3-gram
    overlap of every corpus document against a held-out "benchmark"
    subset (doc_id % 25 = 0 stands in for the eval suite; self-pairs
    excluded). Corpus grams probe a BROADCAST eval gram set — the
    corpus never shuffles (see
    :func:`operators.dedup.ngram_overlap_contamination`)."""
    from postgre_to_clickhouse_spark.operators.dedup import ngram_overlap_contamination

    d = _t(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    out = ngram_overlap_contamination(d, ev, n=3).filter(F.col("doc_id") != F.col("eval_id"))
    return out.select(
        "doc_id", "eval_id", "n_overlap", "eval_grams", F.round("eval_frac", 9).alias("eval_frac_r")
    )


@register(
    "lm_unigram_nll",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ),
    counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT count(*) AS total FROM toks)
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(avg(-ln(CAST(c.c AS DOUBLE) / (SELECT total FROM tot))), 6) AS mean_nll_r
    FROM toks t JOIN counts c USING (tok)
    GROUP BY t.doc_id
    """,
)
def lm_unigram_nll(spark, sf_dir):
    """Unigram-LM perplexity quality signal (CCNet-style): each doc's
    mean −ln p(token) under the corpus's own unigram distribution.
    High scorers are far from the corpus distribution → candidates for
    quality filtering. See
    :func:`operators.text.unigram_lm_scores` for the scale shape."""
    from postgre_to_clickhouse_spark.operators.text import unigram_lm_scores

    d = _t(spark, sf_dir, "documents")
    out = unigram_lm_scores(d)
    return out.select("doc_id", "n_tokens", F.round("mean_nll", 6).alias("mean_nll_r"))


@register(
    "mix_rebalance_lang",
    oracle=f"""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS target FROM c),
    f AS (SELECT lang, CAST((SELECT target FROM m) AS DOUBLE) / n AS keep_frac FROM c)
    SELECT d.doc_id, d.lang FROM documents d JOIN f USING (lang)
    WHERE {_horner_u("mix-v1", "d.doc_id")} < f.keep_frac
    """,
)
def mix_rebalance_lang(spark, sf_dir):
    """Data-mixing rebalance: flatten the skewed language mix to the
    smallest language's size by deterministic content-addressed
    downsampling (:func:`operators.sampling.rebalance_mix`) — every
    surviving row is recomputable by the oracle, so the mix step of the
    pipeline is fully engine-checkable."""
    d = _t(spark, sf_dir, "documents")
    out = SM.rebalance_mix(d, "lang", "doc_id", seed="mix-v1")
    return out.select("doc_id", "lang")


@register(
    "dedup_incremental_batch",
    oracle="""
    WITH newb AS (SELECT * FROM documents WHERE doc_id % 5 = 4),
    corpus AS (SELECT * FROM documents WHERE doc_id % 5 <> 4),
    within AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        FROM newb
      ) WHERE rn = 1
    )
    SELECT w.doc_id, w.lang, w.source FROM within w
    WHERE NOT EXISTS (
      SELECT 1 FROM corpus c WHERE sha256(c.text) = sha256(w.text)
    )
    """,
)
def dedup_incremental_batch(spark, sf_dir):
    """Incremental ingestion dedup (the continuous form of C1): today's
    batch (doc_id % 5 = 4 stands in for the new crawl) deduped within
    itself AND anti-joined on content digest against the standing
    corpus (the other 80%). See
    :func:`operators.dedup.dedup_against_corpus` — digests shuffle,
    content never does."""
    from postgre_to_clickhouse_spark.operators.dedup import dedup_against_corpus

    d = _t(spark, sf_dir, "documents")
    newb = d.filter(F.col("doc_id") % 5 == 4)
    corpus = d.filter(F.col("doc_id") % 5 != 4)
    out = dedup_against_corpus(newb, corpus, content_cols=("text",), order_col="doc_id")
    return out.select("doc_id", "lang", "source")


@register(
    "cap_per_source_skewsafe",
    oracle=f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_horner_u("cap-v1", "doc_id")}, doc_id) AS rk
      FROM documents
    ) WHERE rk <= 25
    """,
)
def cap_per_source_skewsafe(spark, sf_dir):
    """Crawl-style per-domain cap: at most 25 deterministic survivors
    per source, via the two-phase exact skew-safe top-k
    (:func:`operators.sampling.capped_per_stratum_skewsafe`) — the
    oracle is the plain single-window formulation, proving the salted
    two-phase plan computes EXACTLY the same rows."""
    d = _t(spark, sf_dir, "documents")
    out = SM.capped_per_stratum_skewsafe(d, "source", cap=25, id_col="doc_id", seed="cap-v1")
    return out.select("doc_id", "source")


@register(
    "embedding_random_projection",
    oracle="""
    WITH m AS (
      SELECT i, list_transform(range(64), j ->
               CASE WHEN strpos('01234567',
                      substring(md5('rp-v1:' || i || ':' || j), 1, 1)) > 0
                    THEN 1.0 ELSE -1.0 END) AS s
      FROM range(16) t(i)
    )
    SELECT e.vec_id, CAST(m.i AS INT) AS out_i,
           round(list_sum(list_transform(list_zip(e.embedding, m.s),
                 p -> CAST(p[1] AS DOUBLE) * p[2])), 9) AS y_r
    FROM embeddings e, m
    """,
)
def embedding_random_projection(spark, sf_dir):
    """C3 scale path: 64 → 16 Johnson-Lindenstrauss ±1 sign projection
    with the seeded matrix folded into literal expressions — a pure
    map, zero exchanges (plan-gated). The oracle REBUILDS the matrix
    from md5(seed:i:j) in SQL, proving the projection is a
    content-addressed model constant, not engine state. Output exploded
    to (vec_id, out_i, y) for scalar value-hash comparison."""
    from postgre_to_clickhouse_spark.operators.projection import random_projection

    e = _t(spark, sf_dir, "embeddings")
    out = random_projection(e, "embedding", "vec_id", out_dim=16, in_dim=64, seed="rp-v1")
    return out.select(
        "vec_id", F.posexplode("proj").alias("out_i", "__y")
    ).select("vec_id", "out_i", F.round("__y", 9).alias("y_r"))


@register(
    "lm_bigram_nll",
    oracle="""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM documents
    ),
    pairs AS (
      SELECT doc_id, p[1] AS a, p[2] AS b
      FROM (SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM tk)
    ),
    cab AS (SELECT a, b, count(*) AS cab FROM pairs GROUP BY a, b),
    ca AS (SELECT a, sum(cab) AS ca FROM cab GROUP BY a),
    v AS (SELECT count(DISTINCT tok) AS v
          FROM (SELECT unnest(l) AS tok FROM tk))
    SELECT p.doc_id,
           count(*) AS n_bigrams,
           round(avg(-ln((CAST(cab.cab AS DOUBLE) + 0.5) /
                         (CAST(ca.ca AS DOUBLE) + 0.5 * (SELECT v FROM v)))), 6)
             AS mean_nll_r
    FROM pairs p JOIN cab USING (a, b) JOIN ca USING (a)
    GROUP BY p.doc_id
    """,
)
def lm_bigram_nll(spark, sf_dir):
    """C4, r6: add-0.5-smoothed BIGRAM LM perplexity — the Markov-order
    companion to `lm_unigram_nll` (word-salad scores high even with a
    normal unigram mix; templated text scores low). Bigrams are built
    by zipping each token array with its own tail (pure map, no
    position window); see :func:`operators.text.bigram_lm_scores`."""
    from postgre_to_clickhouse_spark.operators.text import bigram_lm_scores

    d = _t(spark, sf_dir, "documents")
    out = bigram_lm_scores(d)
    return out.select("doc_id", "n_bigrams", F.round("mean_nll", 6).alias("mean_nll_r"))


@register(
    "gopher_ngram_repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(regexp_replace(lower(text),
                         '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '') AS words
      FROM documents
    ),
    tot AS (
      SELECT doc_id, length(array_to_string(words, ' ')) AS total_chars
      FROM w WHERE len(words) >= 3
    ),
    g2 AS (
      SELECT doc_id,
             unnest(list_transform(range(len(words) - 1),
                    i -> words[i + 1] || ' ' || words[i + 2])) AS gram
      FROM w WHERE len(words) >= 3
    ),
    c2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY doc_id, gram),
    top2 AS (
      SELECT doc_id, max(struct_pack(c := c, g := gram)) AS t
      FROM c2 GROUP BY doc_id
    ),
    g3 AS (
      SELECT doc_id,
             unnest(list_transform(range(len(words) - 2),
                    i -> words[i + 1] || ' ' || words[i + 2] || ' '
                         || words[i + 3])) AS gram
      FROM w WHERE len(words) >= 3
    ),
    c3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY doc_id, gram),
    dup3 AS (
      SELECT doc_id,
             SUM(CASE WHEN c > 1 THEN (c - 1) * length(gram) ELSE 0 END)
               AS dup_chars
      FROM c3 GROUP BY doc_id
    )
    SELECT tot.doc_id,
           top2.t.g AS top_bigram,
           CAST(top2.t.c AS BIGINT) AS top_bigram_count,
           CAST(top2.t.c * length(top2.t.g) AS DOUBLE)
             / greatest(tot.total_chars, 1) AS top_bigram_char_frac,
           CAST(coalesce(dup3.dup_chars, 0) AS DOUBLE)
             / greatest(tot.total_chars, 1) AS dup_trigram_char_frac
    FROM tot JOIN top2 USING (doc_id) LEFT JOIN dup3 USING (doc_id)
    """,
)
def gopher_ngram_repetition(spark, sf_dir):
    """r7, C4: the Gopher n-gram REPETITION rules (Rae et al. 2021,
    table A1) that `text_repetition_stats` does not cover — (a) the
    fraction of characters attributable to the single most frequent
    word 2-gram (count × gram length over total word chars; rule
    family "top n-gram char fraction"), and (b) the fraction of
    characters in DUPLICATED 3-grams, counted as (count−1) × gram
    length — the standard non-overlap-corrected approximation of
    Gopher's "dup n-gram char fraction". Ties for the top bigram break
    deterministically to the lexicographically LARGEST gram via a
    (count, gram) struct max — identical comparison semantics in both
    engines on this ASCII corpus. Docs with < 3 words are excluded
    (no 3-gram, degenerate 2-gram stats).

    Scale shape: an n-gram never crosses a document, so this is a pure
    per-doc computation — the MAP-ONLY sorted-run fold
    (`text_clean.sorted_run_stats`: array_sort + one `aggregate` HOF
    per n) computes each doc's gram mode and duplicate mass with ZERO
    exchanges (plan-gated). The explode → groupBy(doc, gram)
    formulation — which shuffles every token twice through two
    gram-keyed aggregations plus re-join — measured 23.8 s vs 7.5 s
    at 5× sf0.1 for identical results; the oracle still uses it (DuckDB
    unnest/GROUP BY), keeping the two engines structurally
    independent."""
    from postgre_to_clickhouse_spark.operators.text_clean import sorted_run_stats

    d = _t(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "), " "),
        lambda w: w != "",
    )
    base = d.select("doc_id", words.alias("ws")).filter(F.size("ws") >= 3)
    grams2 = F.zip_with(
        F.slice("ws", 1, F.size("ws") - 1),
        F.slice("ws", 2, F.size("ws") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # 3-gram = the 2-gram starting at i joined with the word at i+2
    grams3 = F.zip_with(
        F.slice(grams2, 1, F.size("ws") - 2),
        F.slice("ws", 3, F.size("ws") - 2),
        lambda a, c: F.concat_ws(" ", a, c),
    )
    stats = base.select(
        "doc_id",
        F.length(F.array_join("ws", " ")).alias("total_chars"),
        sorted_run_stats(grams2).alias("r2"),
        sorted_run_stats(grams3).alias("r3"),
    )
    tot = F.greatest("total_chars", F.lit(1)).cast("double")
    return stats.select(
        "doc_id",
        F.col("r2.best_g").alias("top_bigram"),
        F.col("r2.best_c").cast("bigint").alias("top_bigram_count"),
        ((F.col("r2.best_c") * F.length("r2.best_g")).cast("double") / tot).alias(
            "top_bigram_char_frac"
        ),
        (F.col("r3.dup_chars").cast("double") / tot).alias("dup_trigram_char_frac"),
    )
