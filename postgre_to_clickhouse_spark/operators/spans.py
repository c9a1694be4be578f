"""Cross-document duplicated-span detection (ExactSubstr-style).

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) remove exact substrings of >= 50 tokens that occur in more
than one training document. The exact suffix-array construction is a
single-machine algorithm; the standard distributed approximation works
at n-gram granularity:

1. explode each document into positioned n-grams (one scan),
2. find grams that occur in >= ``min_docs`` DISTINCT documents
   (one groupBy on the gram),
3. map each duplicated gram occurrence back to its token interval
   ``[pos, pos + n - 1]`` and take the per-document UNION of intervals
   (the classic gaps-and-islands running-max window — overlapping
   grams from one long shared span must not be double counted),
4. report per-document coverage = |union| / n_tokens; a downstream
   filter or trimmer drops documents past a coverage threshold.

Scale shape (100 TB): the only corpus-sized shuffles carry (gram,
doc_id, pos) rows — bounded-width keys, never document bodies. The
distinct-doc count per gram is a two-phase aggregate; the join back to
occurrences is a hash join on the gram key. At cluster scale the gram
string would be replaced by ``xxhash64(gram)`` to shrink the shuffle
payload ~10x (the oracle comparison here keeps the text key so DuckDB
can reproduce it without a seeded hash implementation); duplicated
grams follow a Zipf tail, so the dup-gram side of the join is a small
fraction of the corpus and AQE picks a broadcast when it fits. The
interval-union window sorts per document — partition = doc, bounded by
document length, no global sort.

Everything is integer arithmetic plus one final exact IEEE division,
so results are bitwise reproducible across engines and reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def positioned_grams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry, pos, gram) rows for every FULL n-token gram.

    Same lead-window formulation as ``dedup.shingle_rows`` (no per-gram
    array slicing); unlike the MinHash path, the token position is kept
    because the coverage union needs intervals; tokenizer is the
    repo-wide unified ``[^a-z0-9]+`` split (r7 — matches the DuckDB
    oracles' ``[a-z0-9]+`` extraction on ANY corpus, not just
    underscore-free ASCII), and partial grams at
    the tail are dropped (they are sub-spans of the last full gram).
    ``carry`` names extra per-document columns to pass through (r16 s2
    — the source-overlap audit needs the gram stream keyed by source
    without a second doc-keyed join).
    """
    # r16: measured and deliberately NOT spread_small_input'd — the
    # per-id lead window shuffles right after the explode anyway, so
    # the extra round-robin shuffle cost more than the parallel
    # explode bought (A/B with the bench's forced evaluation at sf0.1:
    # dup_span_coverage 1.04 s without vs 1.69 s with).
    toks = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.posexplode(
            F.filter(F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    return (
        toks.select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            F.col("pos"),
            F.concat_ws(" ", *leads).alias("g"),
            F.lead("tok", n - 1).over(w).isNotNull().alias("__full"),
        )
        .filter("__full")
        .drop("__full")
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens) using the same tokenizer as the gram stage."""
    toks = F.filter(F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != "")
    return df.select(F.col(id_col), F.size(toks).cast("bigint").alias("n_tokens"))


def dup_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document coverage by n-gram spans shared with other docs.

    Output: (id, n_tokens, dup_grams, covered_tokens, coverage) —
    every document appears (coverage 0 when nothing is shared), so the
    result composes as a left-side quality signal like the other text
    scores.
    """
    grams = positioned_grams(df, text_col, id_col, n)
    # Grams occurring in >= min_docs distinct documents. countDistinct
    # is the exact two-phase expand aggregate; the gram key space after
    # the >=2-docs filter is the Zipf head — small relative to corpus.
    dup = (
        grams.groupBy("g")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("g")
    )
    # Occurrence intervals of duplicated grams: [pos, pos + n - 1].
    hits = grams.join(dup, "g").select(
        F.col(id_col),
        F.col("pos").alias("s"),
        (F.col("pos") + F.lit(n - 1)).alias("e"),
    )
    # Gaps-and-islands union length: per doc ordered by start, each
    # interval contributes the part past max(previous ends, s - 1).
    # (doc, pos) is unique -> total order, engine-independent.
    w = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max("e").over(w)
    contrib = F.greatest(
        F.col("e") - F.greatest(F.coalesce(prev_end, F.lit(-1)), F.col("s") - 1),
        F.lit(0),
    )
    per_doc = (
        hits.select(F.col(id_col), contrib.alias("__c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dup_grams"),
            F.sum("__c").cast("bigint").alias("covered_tokens"),
        )
    )
    ntok = token_counts(df, text_col, id_col)
    out = ntok.join(per_doc, id_col, "left")
    covered = F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("bigint")
    return out.select(
        F.col(id_col),
        "n_tokens",
        F.coalesce(F.col("dup_grams"), F.lit(0)).cast("bigint").alias("dup_grams"),
        covered.alias("covered_tokens"),
        # single IEEE division of exact integers -> deterministic
        (covered.cast("double") / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")).alias(
            "coverage"
        ),
    )


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """ExactSubstr REMOVAL (the second half of Lee et al. 2022 —
    :func:`dup_span_coverage` measures, this trims): tokens covered by
    any n-gram occurring in >= ``min_docs`` distinct documents are CUT
    from the document; output is the cleaned token stream.

    Output: (id, n_tokens, kept_tokens, removed_tokens, cleaned_text)
    where ``removed_tokens`` equals the coverage union length (the
    gaps-and-islands ``covered_tokens``) by construction — asserted as
    a cross-operator property test.

    Scale shape: identical to the coverage pass (the only
    corpus-proportional shuffles carry (gram, id, pos) rows and the
    interval list joins back on the id key, co-partitioned with the
    token arrays); the final cut is a per-row higher-order filter,
    O(tokens × intervals) inside the scan stage. Tokenizer:
    ``[^a-z0-9]+`` (the repo-wide unified split)."""
    toks_arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda t: t != ""
    )
    base = df.select(F.col(id_col), toks_arr.alias("__t"))
    toks = base.select(
        F.col(id_col), F.posexplode("__t").alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    grams = (
        toks.select(
            F.col(id_col),
            "pos",
            F.concat_ws(" ", *leads).alias("g"),
            F.lead("tok", n - 1).over(w).isNotNull().alias("__full"),
        )
        .filter("__full")
        .drop("__full")
    )
    dup = (
        grams.groupBy("g")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("g")
    )
    hits = grams.join(dup, "g").select(
        F.col(id_col), F.col("pos").alias("s"), (F.col("pos") + n - 1).alias("e")
    )
    # MERGE overlapping/adjacent intervals per doc BEFORE the cut
    # (gaps-and-islands, the same running-max trick as the coverage
    # union): a heavily-duplicated doc has ~n_tokens raw intervals but
    # only a handful of merged islands, so the per-token exists() scan
    # below stays O(tokens × islands), not O(tokens × grams) —
    # measured 21.6 s → islands-merged form at 5× sf0.1 on the
    # amplified corpus whose 2% fully-duplicated slice made raw
    # intervals span whole documents.
    wprev = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wpre = Window.partitionBy(id_col).orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = hits.select(
        F.col(id_col),
        "s",
        "e",
        F.sum(
            F.when(
                F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-2)) + 1, 1
            ).otherwise(0)
        )
        .over(wpre)
        .alias("__isl"),
    )
    ivs = (
        islands.groupBy(id_col, "__isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("s", "e")).alias("__iv"))
    )
    joined = base.join(ivs, id_col, "left").select(
        F.col(id_col),
        "__t",
        F.coalesce("__iv", F.array().cast("array<struct<s:int,e:int>>")).alias("__iv"),
    )
    kept = F.filter(
        F.transform("__t", lambda x, i: F.struct(i.alias("p"), x.alias("tok"))),
        lambda st: ~F.exists(
            "__iv",
            lambda iv: (st.getField("p") >= iv.getField("s"))
            & (st.getField("p") <= iv.getField("e")),
        ),
    )
    kept_toks = F.transform(kept, lambda st: st.getField("tok"))
    return joined.select(
        F.col(id_col),
        F.size("__t").cast("bigint").alias("n_tokens"),
        F.size(kept_toks).cast("bigint").alias("kept_tokens"),
        (F.size("__t") - F.size(kept_toks)).cast("bigint").alias("removed_tokens"),
        F.array_join(kept_toks, " ").alias("cleaned_text"),
    )
