"""Text cleaning & repetition filters (training-data pipeline, C4).

The standard pretraining cleanup stages between raw crawl and
tokenization: HTML stripping, entity unescape, control-char removal,
whitespace normalization, PII masking, and repetition metrics (the
Gopher/C4-style quality signals — documents dominated by repeated lines
are boilerplate). All pure JVM ``regexp_replace``/``split``/higher-order
expressions — they fuse into the scan under whole-stage codegen, so at
100 TB cleaning is bandwidth-bound, not CPU/Python-bound.

Regexes stay inside the RE2 ∩ Java-regex common subset (no backrefs, no
lookaround) so the DuckDB oracles run the IDENTICAL pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HTML_TAG_RE = r"<[^>]+>"
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_html(col: Column | str) -> Column:
    """Drop tags, unescape the common entities. (A real crawl pipeline
    puts a proper parser behind the same column contract; tag-strip +
    entity table is the standard cheap first pass.)"""
    t = F.regexp_replace(_c(col), HTML_TAG_RE, " ")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return t


def remove_control_chars(col: Column | str) -> Column:
    return F.regexp_replace(_c(col), CONTROL_RE, "")


def normalize_whitespace(col: Column | str) -> Column:
    return F.trim(F.regexp_replace(_c(col), r"\s+", " "))


def mask_pii(col: Column | str) -> Column:
    """Replace emails and IPv4s with typed placeholder tokens."""
    t = F.regexp_replace(_c(col), EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(t, IPV4_RE, "<IP>")


def clean_text(col: Column | str) -> Column:
    """The composed standard pass: strip → de-control → mask → normalize."""
    return normalize_whitespace(mask_pii(remove_control_chars(strip_html(col))))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Line-level repetition signals (boilerplate detectors):

    - ``n_lines`` / ``n_distinct_lines`` and the duplicate-line ratio —
      the Gopher rule rejects docs whose mass is repeated lines;
    - ``max_line_chars`` — single-line walls of text (minified JS);
    - ``dup_word_ratio`` — fraction of word occurrences beyond each
      word's first (whole-doc lexical repetition).

    All higher-order array expressions over one split — no shuffle, no
    Python; runs inside the scan stage.
    """
    t = _c(text_col)
    lines = F.split(t, r"\n")
    words = F.filter(F.split(F.lower(t), r"[^a-z0-9]+"), lambda w: w != "")
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    n_words = F.size(words)
    n_distinct_words = F.size(F.array_distinct(words))
    return df.select(
        "*",
        n_lines.alias("n_lines"),
        n_distinct.alias("n_distinct_lines"),
        (
            (n_lines - n_distinct).cast("double") / F.greatest(n_lines, F.lit(1)).cast("double")
        ).alias("dup_line_ratio"),
        F.array_max(F.transform(lines, F.length)).alias("max_line_chars"),
        (
            (n_words - n_distinct_words).cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
        ).alias("dup_word_ratio"),
    )


def canonicalize_url(col: Column | str, strip_prefixes: tuple[str, ...] = ("utm_",)) -> Column:
    """URL canonicalization for crawl dedup (the normalize-before-hash
    step every WET/WARC pipeline runs; CH exposes the pieces as
    ``cutFragment``/``cutURLParameter``): drop the fragment, lowercase
    scheme+host (path stays case-sensitive per RFC 3986), strip
    tracking parameters by prefix, SORT the surviving query params
    (order-insensitive equality), and trim trailing slashes. Pure
    regexp/split/higher-order ops — fuses into the scan."""
    u = F.regexp_replace(_c(col), r"#.*$", "")
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    q = F.regexp_extract(u, r"\?(.*)$", 1)
    # scheme matching is case-INSENSITIVE (RFC 3986 §3.1: scheme and
    # host compare case-insensitively) — 'HTTPS://Host/x' must unify
    # with 'https://host/x', so the extraction regex carries (?i) and
    # the lowercase covers whatever case the input used (r8 ADVICE fix:
    # a case-sensitive ^https? left the scheme+host inside the path)
    hostpart = F.lower(F.regexp_extract(base, r"(?i)^(https?://[^/]*)", 1))
    path = F.regexp_replace(F.regexp_replace(base, r"(?i)^https?://[^/]*", ""), r"/+$", "")
    keep = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~_startswith_any(p, strip_prefixes),
    )
    canon_q = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        hostpart, path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )


def _startswith_any(p: Column, prefixes: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for pre in prefixes:
        cond = cond | p.startswith(pre)
    return cond


def sorted_run_stats(grams: Column) -> Column:
    """Per-document n-gram repetition statistics WITHOUT a shuffle:
    ``struct(best_c, best_g, dup_chars)`` where (best_c, best_g) is the
    (count, gram) lexicographic MAX over gram frequencies (ties → the
    lexicographically largest gram, matching a (count, gram) struct-max
    over a grouped count) and ``dup_chars`` = Σ (count−1)·len(gram)
    over grams occurring more than once.

    An n-gram never crosses a document, so the frequency table of one
    doc is a purely local object — sorting the gram array and folding
    over equal-gram RUNS (O(n log n) + O(n) per doc, single
    ``aggregate`` higher-order expression) computes mode and duplicate
    mass with zero data movement. The explode → groupBy(doc, gram)
    formulation shuffles every token twice and measured 23.8 s vs
    7.5 s at 5× sf0.1 for identical results."""
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("bc"),
        F.lit("").alias("bg"),
        zero.alias("dup"),
    )

    def _close(acc):
        """(bc, bg, dup) after folding the open run into the bests."""
        run, prev = acc.getField("run"), acc.getField("prev")
        bc, bg, dup = acc.getField("bc"), acc.getField("bg"), acc.getField("dup")
        better = (run > bc) | ((run == bc) & (prev > bg))
        return (
            F.when(better, run).otherwise(bc),
            F.when(better, prev).otherwise(bg),
            F.when(run > 1, dup + (run - 1) * F.length(prev).cast("long")).otherwise(dup),
        )

    def merge(acc, g):
        same = acc.getField("prev").eqNullSafe(g)
        nbc, nbg, ndup = _close(acc)
        return F.when(
            same,
            F.struct(
                g.alias("prev"),
                (acc.getField("run") + 1).alias("run"),
                acc.getField("bc").alias("bc"),
                acc.getField("bg").alias("bg"),
                acc.getField("dup").alias("dup"),
            ),
        ).otherwise(
            F.struct(
                g.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                nbc.alias("bc"),
                nbg.alias("bg"),
                ndup.alias("dup"),
            )
        )

    def finish(acc):
        bc, bg, dup = _close(acc)
        return F.struct(bc.alias("best_c"), bg.alias("best_g"), dup.alias("dup_chars"))

    return F.aggregate(F.array_sort(grams), init, merge, finish)


def line_dedup_keep_first(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style global paragraph dedup (Wenzek et al. 2020 dedup
    CommonCrawl at the PARAGRAPH level before anything else): every
    repeated line/paragraph in the corpus keeps exactly its FIRST
    occurrence — ordered by (id, position) — and every other occurrence
    is dropped, including repeats inside one document.

    Output: (id, n_lines, kept_lines, removed_lines, cleaned_text)
    with ``cleaned_text`` = surviving lines in original order joined by
    ``" | "`` (a separator the driver canon handles as a scalar cell).

    Scale shape: two bounded-width shuffles — occurrences keyed by the
    line (the keep-first argmin is one partial-aggregable ``min(struct
    (id, idx))``), then reassembly keyed by the id. At 100 TB the line
    key becomes ``xxhash64(line)`` to shrink the exchange ~10×; the
    text key is kept here so the DuckDB oracle can reproduce the join
    without a seeded hash (same note as :mod:`operators.spans`)."""
    occ = df.select(
        F.col(id_col),
        F.posexplode(F.split(_c(text_col), sep)).alias("idx", "line"),
    )
    keep = occ.groupBy("line").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.struct(F.col(id_col).alias("i"), F.col("idx").alias("x"))).alias("__k"),
    )
    marked = occ.join(keep, "line").select(
        F.col(id_col),
        "idx",
        "line",
        (
            (F.col("__cnt") == 1)
            | ((F.col("__k.i") == F.col(id_col)) & (F.col("__k.x") == F.col("idx")))
        ).alias("__keep"),
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.count(F.when(F.col("__keep"), 1)).cast("bigint").alias("kept_lines"),
        F.count(F.when(~F.col("__keep"), 1)).cast("bigint").alias("removed_lines"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep"), F.struct("idx", "line"))
                    )
                ),
                lambda st: st.getField("line"),
            ),
            " | ",
        ).alias("cleaned_text"),
    )
    return per_doc
