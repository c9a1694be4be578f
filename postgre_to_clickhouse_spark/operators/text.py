"""Text analysis for training-data pipelines (SURVEY.md C4) — language
ID, quality scoring, token counting, fingerprinting. All JVM-side
built-ins (regexp/length/md5) — zero Python in the row path, so these
fuse into the scan under whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# heuristic language ID. Deliberately small + deterministic.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "una", "es"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": [],  # CJK detected by script, not stopwords
}

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (a simplification of the GPT-2 split pattern that both Java regex and
# RE2 interpret identically).
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """Whitespace-robust token count via the BPE-ish regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(pattern))


def word_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"\w+"))


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: lengths, word/token counts, punct and
    stopword ratios, mean word length. Deterministic double arithmetic."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = word_count(t)
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    n_stop = F.regexp_count(F.concat(F.lit(" "), F.lower(t), F.lit(" ")), F.lit(r" (the|and|of|to|is|a|in) "))
    total_word_chars = n_chars - F.regexp_count(t, F.lit(r"[\W]"))
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        token_count(t).alias("q_tokens"),
        (n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")).alias("q_punct_ratio"),
        (n_stop.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")).alias("q_stopword_ratio"),
        (total_word_chars.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")).alias("q_mean_word_len"),
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Heuristic language ID: CJK by script; otherwise argmax of per-lang
    stopword hit counts (deterministic tie-break by language code)."""
    t = F.lower(F.col(text_col))
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    scores = []
    for i, (lang, words) in enumerate(sorted(_LANG_MARKERS.items())):
        if not words:
            continue
        pat = " (" + "|".join(words) + ") "
        scores.append(
            F.struct(
                F.regexp_count(padded, F.lit(pat)).alias("score"),
                F.lit(-i).alias("nb"),  # ties → earliest language code wins
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    cjk = F.regexp_count(F.col(text_col), F.lit(r"[一-鿿]"))
    pred = (
        F.when(cjk > 0, F.lit("zh"))
        .when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(F.lit("und"))
    )
    return df.withColumn(out_col, pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 + sha256 of the normalized text, and a
    prefix fingerprint for rolling/chunked comparison."""
    norm = F.lower(F.trim(F.col(text_col)))
    return df.select(
        "*",
        F.md5(norm).alias("fp_md5"),
        F.sha2(norm, 256).alias("fp_sha256"),
        F.md5(F.substring(norm, 1, 128)).alias("fp_prefix128"),
    )


def min_k_nll_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_frac: float = 0.2,
) -> DataFrame:
    """Min-K% prob (Shi et al. 2023, "Detecting Pretraining Data from
    Large Language Models", arXiv:2310.16789): per document, the mean
    negative log-likelihood of its k% LEAST-probable tokens under an
    LM — the published membership/contamination signal (a document
    the model has memorized has no low-probability outlier tokens, so
    its Min-K% score is anomalously low). Here the LM is the corpus
    unigram model (:func:`unigram_lm_scores`), the engine-checkable
    stand-in with the same mechanics as the paper's.

    Output: (id, n_tokens, k_tokens, mink_nll_q, mink_mean_nll) —
    k = max(1, ceil(k_frac·n)), mink_nll_q the EXACT integer
    micro-nat sum of the top-k per-token NLLs (per-TYPE quantization,
    order-independent; ties in the sort cannot change a sum of
    integers), mink_mean_nll the bit-exact integer-ratio division.

    Scale shape: vocabulary counts are one groupBy on the token
    (Zipf-bounded); the per-document state is the document's OWN
    token list (bounded by document length, the same bound every
    per-doc text op carries) sorted once; nothing data-proportional
    reaches the driver."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.lower(text_col), r"[^a-z0-9]+"),
                           lambda t: t != "")).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__c"))
    total = counts.agg(F.sum("__c").alias("__total"))
    lp = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .withColumn("lp_q", F.expr(
            "CAST(round(-ln(CAST(__c AS DOUBLE) / CAST(__total AS "
            "DOUBLE)) * 1e6) AS BIGINT)"))
    )
    per = lp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sort_array(F.collect_list("lp_q"), asc=False).alias("__ls"),
    )
    k = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil(F.col("n_tokens") * F.lit(k_frac)).cast("bigint"),
    )
    per = per.withColumn("k_tokens", k)
    s = F.aggregate(
        F.slice("__ls", F.lit(1), F.col("k_tokens").cast("int")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return per.select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "k_tokens",
        s.cast("bigint").alias("mink_nll_q"),
        (s.cast("double") / F.col("k_tokens").cast("double"))
        .alias("mink_mean_nll"),
    )


def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean negative log-likelihood under a unigram LM fit
    on the corpus itself — the CCNet-style perplexity quality signal
    (docs far from the corpus distribution score high = suspicious).

    Output: (id, n_tokens, mean_nll) where
    mean_nll = avg over tokens of −ln(count(tok) / total_tokens).

    Shape: tokens exploded once; vocabulary counts are one groupBy on
    the token (Zipf-bounded key space); the corpus total is a single
    scalar broadcast (one row — never data-proportional); token→count
    attach is a hash join on the token, and the per-doc reduce is one
    groupBy on the id. At 100 TB the vocab count table after min-count
    pruning fits in memory, so the attach join can broadcast and the
    only corpus shuffles left are the vocab count and the per-doc
    reduce.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != "")).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__c"))
    total = counts.agg(F.sum("__c").alias("__total"))
    scored = toks.join(counts, "tok").crossJoin(F.broadcast(total))
    nll = -F.log(F.col("__c").cast("double") / F.col("__total").cast("double"))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg(nll).alias("mean_nll"),
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Per-document mean NLL under an add-k-smoothed BIGRAM LM fit on
    the corpus itself — one Markov order up from
    :func:`unigram_lm_scores` (repetitive/templated text scores LOW,
    shuffled-word salad scores HIGH even when its unigram mix looks
    normal — the complementary quality signal).

    mean_nll = avg over bigrams of −ln[(C(a,b) + k) / (C(a·) + k·V)]
    where C(a·) counts token a as a CONTEXT and V is the vocabulary.

    Shape: bigrams come from zipping each token array with its own
    tail — a pure map, NO window over positions; bigram counts are one
    groupBy on the (Zipf-bounded) pair space; context counts reduce
    FROM the bigram table (never rescan); V is a one-row broadcast.
    Docs with fewer than two tokens have no bigrams and drop out.
    """
    # r16: measured and deliberately NOT spread_small_input'd — the
    # three ~0.65 s single-task explode maps looked like the KN-scorer
    # shape, but two alternating same-session A/Bs came out a WASH
    # (first favored spread by ~0.1 s, second favored no-spread by
    # ~0.3 s): the bigram explode is light enough that the extra text
    # exchange buys back what the parallelism saves.
    toks = F.filter(F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != "")
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.0").alias("a"), F.col("bg.1").alias("b"))
    bg_counts = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("__cab"))
    ctx_counts = bg_counts.groupBy("a").agg(F.sum("__cab").alias("__ca"))
    vocab = df.select(F.explode(toks).alias("t")).agg(
        F.countDistinct("t").alias("__v")
    )
    scored = (
        pairs.join(bg_counts, ["a", "b"])
        .join(ctx_counts, "a")
        .crossJoin(F.broadcast(vocab))
    )
    p = (F.col("__cab").cast("double") + F.lit(float(k))) / (
        F.col("__ca").cast("double") + F.lit(float(k)) * F.col("__v").cast("double")
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg(-F.log(p)).alias("mean_nll"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf rank-frequency fit (Zipf 1949; Piantadosi 2014's review is
    the modern treatment): OLS of ln(frequency) on ln(rank) over the
    corpus's ``top_n`` most frequent terms. A natural-language corpus
    sits near slope -1 with r² ≈ 1; boilerplate-heavy or
    template-generated text bends the curve, so the (slope, r²) pair is
    the standard one-look corpus-health audit a pretraining pipeline
    runs next to its quality filters.

    Output: ONE row — (n_terms, zipf_slope, zipf_intercept, zipf_r2),
    intercept in ln-count units.

    Exactness: ln(rank) and ln(count) are quantized to integer
    micro-nats (the repo's per-TYPE discipline), so the five OLS
    moments are EXACT integer sums (order-independent; bounded by
    top_n·(ln 1000·1e6)·(ln N·1e6) ≪ 2⁶³); the closing slope /
    intercept / r² arithmetic runs on DOUBLE casts of those integers
    in a fixed literal order, so any engine recomputes them
    bit-for-bit.

    Scale shape: term counting is the vocabulary aggregate
    (Heaps-bounded, map-side partials); the top-n cut is TakeOrdered
    (per-partition heaps, no global sort); the rank window and the
    moment fold run on ≤ top_n rows — a constant. Nothing
    data-proportional reaches the driver or a single partition.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.explode(
            F.filter(F.split(F.lower(text_col), r"[^a-z0-9]+"),
                     lambda t: t != "")
        ).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    top = tf.orderBy(F.col("c").desc(), "term").limit(int(top_n))
    # row_number over the ≤ top_n-row cut (constant-bounded window;
    # the tie-break by term makes the total order strict, so the cut
    # IS the rank ≤ top_n set).
    ranked = top.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), "term"))
        .alias("r"),
    )
    q = ranked.select(
        F.expr("CAST(round(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT)")
        .alias("xq"),
        F.expr("CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)")
        .alias("yq"),
    )
    return _ols_loglog(q, "n_terms", "zipf_slope", "zipf_intercept",
                       "zipf_r2")


def _ols_loglog(
    q: DataFrame,
    n_alias: str,
    slope_alias: str,
    intercept_alias: str,
    r2_alias: str,
) -> DataFrame:
    """Shared log-log OLS closer for the corpus-law fits: ``q`` carries
    integer micro-nat columns (xq, yq); the five moments are EXACT
    integer sums, and slope/intercept/r² run on DOUBLE casts of those
    integers in a fixed literal order (the `simple_linreg_events`
    discipline), so any engine recomputes them bit-for-bit. Intercept
    is rescaled back to ln units (÷1e6)."""
    a = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").cast("double").alias("sx"),
        F.sum("yq").cast("double").alias("sy"),
        F.sum(F.col("xq") * F.col("xq")).cast("double").alias("sxx"),
        F.sum(F.col("xq") * F.col("yq")).cast("double").alias("sxy"),
        F.sum(F.col("yq") * F.col("yq")).cast("double").alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / den
    # den/dy are Cauchy-Schwarz-nonnegative; > 0 guards the degenerate
    # corpora (n <= 1, or constant x/y) under ANSI division — NULL is
    # the honest answer for an unfittable line. Lazy CASE branches, so
    # the guarded division never executes when 0.
    return a.select(
        n.cast("bigint").alias(n_alias),
        F.when(den > F.lit(0.0), F.round(slope, 6)).alias(slope_alias),
        F.when(
            den > F.lit(0.0),
            F.round((F.col("sy") - slope * F.col("sx")) / n / F.lit(1e6), 6),
        ).alias(intercept_alias),
        F.when(den * dy > F.lit(0.0), F.round((num * num) / (den * dy), 6))
        .alias(r2_alias),
    )


def heaps_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Heaps'-law fit (Heaps 1978; Herdan 1960): OLS of ln(vocabulary
    size) on ln(tokens seen) over ``n_buckets`` cumulative corpus
    prefixes in ``id_col`` order — the vocabulary-GROWTH exponent β
    (V ≈ K·N^β, ~0.4-0.6 for natural language). The companion audit
    to :func:`zipf_fit`: a template-generated or closed-vocabulary
    corpus flattens toward β = 0, while scrapes polluted with random
    identifiers push β toward 1. Together the pair is the standard
    two-number corpus-health readout.

    Output: ONE row — (n_points, heaps_beta, heaps_intercept,
    heaps_r2), intercept in ln units.

    Mechanics: documents are ranged into ``n_buckets`` by integer
    arithmetic on the id span (monotone in id, so a term's first
    bucket = bucket of its min id); per-bucket token totals and
    first-occurrence counts are ordinary map-side-combinable groupBys;
    the cumulative (N_b, V_b) prefix sums and the fit run on
    ≤ n_buckets rows — a constant. Same integer micro-nat / fixed
    literal-order discipline as :func:`zipf_fit` via the shared
    closer.

    Scale shape: the tokenization runs ONCE per purpose — per-doc
    token COUNTS feed the bucket totals without exploding (size of
    the filtered split), and the explode feeds only the term
    min-bucket aggregate (vocab-bounded, Heaps-bounded by this very
    law); the bucket counts shuffle n_buckets keys and the window is
    constant-bounded. Bucketing is by id VALUE range — width =
    span DIV n_buckets + 1 (division before any multiply, so a full
    64-bit id span cannot overflow; the last bucket index stays
    < n_buckets by construction) — which assumes ids spread roughly
    evenly across their span (true for dense ids; at 100 TB with
    sparse ids, pre-rank or hash-bucket the ids first). NULL ids are
    dropped (the two engines order NULL buckets differently, and a
    document with no id has no position in the corpus order)."""
    from pyspark.sql import Window

    b = int(n_buckets)
    docs = df.filter(F.col(id_col).isNotNull())
    bounds = docs.agg(
        F.min(F.col(id_col).cast("bigint")).alias("lo"),
        F.max(F.col(id_col).cast("bigint")).alias("hi"),
    )
    bkt = F.expr(
        f"CAST((__d - lo) DIV ((hi - lo) DIV {b} + 1) AS BIGINT)"
    )
    toks = docs.select(
        F.col(id_col).cast("bigint").alias("__d"),
        F.explode(
            F.filter(F.split(F.lower(text_col), r"[^a-z0-9]+"),
                     lambda t: t != "")
        ).alias("term"),
    )
    tok_b = (
        docs.select(
            F.col(id_col).cast("bigint").alias("__d"),
            F.size(
                F.filter(F.split(F.lower(text_col), r"[^a-z0-9]+"),
                         lambda t: t != "")
            ).alias("__nt"),
        )
        .crossJoin(F.broadcast(bounds))
        .groupBy(bkt.alias("bkt"))
        .agg(F.sum("__nt").alias("ntok"))
        .filter(F.col("ntok") > 0)
    )
    new_b = (
        toks.crossJoin(F.broadcast(bounds))
        .groupBy("term").agg(F.min(bkt).alias("bkt"))
        .groupBy("bkt").agg(F.count(F.lit(1)).alias("nnew"))
    )
    # constant-bounded window: ≤ n_buckets rows after the groupBys.
    w = Window.orderBy("bkt")
    cum = tok_b.join(new_b, "bkt", "left").select(
        F.sum("ntok").over(w).alias("n_cum"),
        F.sum(F.coalesce(F.col("nnew"), F.lit(0))).over(w).alias("v_cum"),
    )
    q = cum.filter((F.col("n_cum") > 0) & (F.col("v_cum") > 0)).select(
        F.expr("CAST(round(ln(CAST(n_cum AS DOUBLE)) * 1e6) AS BIGINT)")
        .alias("xq"),
        F.expr("CAST(round(ln(CAST(v_cum AS DOUBLE)) * 1e6) AS BIGINT)")
        .alias("yq"),
    )
    return _ols_loglog(q, "n_points", "heaps_beta", "heaps_intercept",
                       "heaps_r2")
