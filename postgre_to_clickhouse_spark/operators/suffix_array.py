"""EXACT distributed suffix arrays + ExactSubstr duplicated-span
detection — the exact form of what ``operators/spans.py`` ships as the
8-gram approximation.

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) define ExactSubstr dedup: any substring of at least L units
that occurs more than once in the corpus is a duplicated span, and
covered positions are removed. Their released tool builds ONE suffix
array over the concatenated corpus on a single machine; the published
distributed construction of the same object is prefix doubling
(Manber & Myers 1990; Flick & Aluru, "Parallel distributed memory
construction of suffix and LCP arrays", SC'15 run exactly these
doubling rounds over MPI). This module is the Spark re-expression:

- state is a DataFrame of ``(doc, pos, rank)`` rows, one per character,
  where ``rank`` orders the suffix prefixes of the current window
  width ``w`` (rank equality <=> the two width-``w`` windows are equal
  character-for-character, truncated at document end);
- one doubling round widens ``w`` to ``2w`` with a co-partitioned
  self-join on ``(doc, pos + w)`` followed by a distributed dense rank
  over the ``(rank, shifted rank)`` pair (``sampling.global_dense_rank``
  — range-partitioned sort + banded offsets, NO single-partition
  Window anywhere);
- ``ceil(log2(n))`` rounds yield the exact suffix array; ``floor(
  log2(L))`` rounds + one overlapped-window pairing yield exact
  L-gram equality classes (the sparse-table trick: the length-L prefix
  is the OVERLAP of two width-2^j windows at ``pos`` and
  ``pos + L - 2^j``), which is all ExactSubstr needs.

Why doubling instead of materializing length-L substrings: exploding
L-character grams multiplies the corpus L-fold on the shuffle wire
(L = 50..1000 in the paper's regimes); doubling rounds shuffle
fixed-width ``(doc, pos, rank, rank2)`` rows ``log2(L)`` times —
at L = 1000 that is ~10 passes of 24-byte rows versus a 1000x blowup,
and each round's shuffle key is the same ``(doc, pos)`` layout, so a
real cluster co-partitions round over round. Per-round
``localCheckpoint`` truncates the iterative lineage (the same guard
every iterative operator in this repo uses — pointer-jumping closure,
PQ k-means).

Exactness: every rank is an exact dense rank of exact window
comparisons — no hashing anywhere in the detection path, so (unlike
the MinHash/SimHash families) the output carries no collision
probability at any corpus size. The pytest coverage cross-checks both
entry points against brute-force Python on hypothesis-generated
corpora; the driver oracle recomputes spans from first principles in
DuckDB (substr gram explosion + HAVING count >= 2 + island merge).

Scale notes (100 TB): rounds are O(log L) corpus-wide sorts — the
documented cost of distributed SA construction; there is no stage
whose memory or driver footprint scales with corpus size (the banded
rank's driver data is one row per partition). Positions are 1-based
(``substr`` convention) so oracles read naturally.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.operators.sampling import global_dense_rank

__all__ = [
    "char_ranks",
    "window_ranks",
    "suffix_array",
    "exact_substr_spans",
]


def char_ranks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    base: int = 1,
) -> tuple[DataFrame, int]:
    """Seed rank rows ``(id, pos, r)``, one per character, ``pos``
    1-based: ``r`` is the exact dense rank of the width-``base``
    truncated window ``substring(text, pos, base)`` (base = 1 ranks
    single characters). String order here is Spark's string
    comparison; for ASCII — the engine's corpora after the usual
    canonicalization — that equals UTF-8 byte order, i.e. the binary
    collation DuckDB sorts with. Seeding at base 8 replaces the first
    three doubling rounds with ONE ranked pass over 8-byte keys.
    Returns ``(ranks, base_window)``."""
    w = max(1, base)
    pos = df.select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        F.explode(
            F.when(
                F.length(text_col) > 0,
                F.sequence(F.lit(1), F.length(text_col)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
    ).select(
        id_col,
        F.col("pos").cast("bigint").alias("pos"),
        F.expr(f"substring(__t, pos, {w})").alias("__g"),
    )
    ranked = global_dense_rank(pos, ["__g"], out_col="r")
    return ranked.select(id_col, "pos", "r"), w


def _advance(cur: DataFrame, id_col: str, w: int) -> DataFrame:
    """One doubling round: window ``w`` -> ``2w``. The pair key is
    (rank at pos, rank at pos+w, -1 past document end — the sentinel
    below every real rank implements the shorter-suffix-sorts-first
    prefix rule)."""
    shifted = cur.select(
        F.col(id_col),
        (F.col("pos") - F.lit(w)).alias("pos"),
        F.col("r").alias("__r2"),
    )
    paired = (
        cur.join(shifted, [id_col, "pos"], "left")
        .select(
            F.col(id_col),
            "pos",
            F.col("r").alias("__k1"),
            F.coalesce("__r2", F.lit(-1)).alias("__k2"),
        )
    )
    return (
        global_dense_rank(paired, ["__k1", "__k2"], out_col="r")
        .select(id_col, "pos", "r")
    )


def window_ranks(
    df: DataFrame,
    min_window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, int]:
    """Rank rows for the LARGEST power-of-two window w <= ``min_window``
    (floor, not ceiling: callers overlap two width-w windows at
    ``pos`` and ``pos + L - w`` for exact arbitrary-L equality — see
    :func:`exact_substr_spans`). Returns ``(ranks, w)``."""
    seed = 1
    while seed * 2 <= min(min_window, 8):
        seed *= 2
    cur, w = char_ranks(df, text_col, id_col, base=seed)
    while w * 2 <= min_window:
        cur = _advance(cur, id_col, w)
        w *= 2
    return cur, w


def suffix_array(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-document suffix array: (id, pos, sa_rank) where
    ``sa_rank`` is the 1-based position of suffix ``text[pos:]`` in the
    lexicographic order of all suffixes of that document.

    Doubling stops EARLY once every (doc, rank) pair is unique — from
    that window on, within-document order is fully decided (two
    suffixes with equal window-w ranks share their first w characters;
    distinct ranks mean the order is already determined inside the
    window). The cap ceil(log2(max doc length)) guarantees termination
    because two distinct suffixes of one document can never be equal
    strings. Cross-document rank ties are irrelevant to the
    per-document order and do not delay the stop."""
    cur, w = char_ranks(df, text_col, id_col, base=8)
    max_len = df.select(
        F.max(F.length(text_col)).alias("m")
    ).collect()[0]["m"] or 0
    rounds = max(1, math.ceil(math.log2(max(2, max_len))))
    for _ in range(rounds):
        n_all, n_distinct = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(id_col, "r").alias("d"),
        ).collect()[0]
        if n_all == n_distinct:
            break
        cur = _advance(cur, id_col, w)
        w *= 2
    sa = Window.partitionBy(id_col).orderBy("r", "pos")
    return cur.select(
        F.col(id_col),
        "pos",
        F.row_number().over(sa).cast("bigint").alias("sa_rank"),
    )


def _sentinel() -> F.Column:
    """Label below every real class label (document ids are
    non-negative) — the past-document-end marker."""
    return F.struct(
        F.lit(-1).cast("bigint").alias("a"),
        F.lit(-1).cast("bigint").alias("b"),
    )


def _class_label(id_col: str) -> F.Column:
    """Canonical label of an equality class: the MINIMUM (doc, pos)
    struct over the class — globally unique, deterministic under any
    partitioning (unlike monotonically_increasing_id) and exact
    (unlike a hash, which collides with certainty at 100 TB gram
    counts)."""
    return F.min(F.struct(
        F.col(id_col).cast("bigint").alias("a"),
        F.col("pos").cast("bigint").alias("b"),
    )).alias("__lab")


def window_classes(
    df: DataFrame,
    min_window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    base: int = 8,
) -> tuple[DataFrame, int]:
    """Equality-class labels (id, pos, l) for the LARGEST power-of-two
    window w <= ``min_window``: two positions carry the same ``l`` iff
    their width-min(w, chars-remaining) windows are equal strings of
    equal length. ORDER-FREE sibling of :func:`window_ranks` — when
    only window EQUALITY matters (duplicate detection), each doubling
    round is a plain groupBy + join back (two co-partitioned shuffles,
    no range sort, no Arrow pass, no lineage checkpoint), and the
    seed window of width min(``base``, w) is built in ONE round by
    grouping the literal substring (an 8-char key shuffles 8 bytes per
    position once — far cheaper than three doubling rounds).

    Exactness induction: seed labels group equal truncated substrings;
    a width-2w pair (label at pos, label at pos+w, sentinel past the
    document end) is equal iff both halves are equal, so FULL-window
    label equality is exact string equality at every width (truncated
    windows only arise within ``w`` of a document's end and are never
    used as detection keys — the caller filters to full-length
    starts)."""
    w = 1
    while w * 2 <= min(min_window, base):
        w *= 2
    pos = df.select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        F.explode(
            F.when(
                F.length(text_col) > 0,
                F.sequence(F.lit(1), F.length(text_col)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
    ).select(
        id_col,
        F.col("pos").cast("bigint").alias("pos"),
        F.expr(f"substring(__t, pos, {w})").alias("__g"),
    )
    lab0 = pos.groupBy("__g").agg(_class_label(id_col))
    cur = pos.join(lab0, "__g").select(id_col, "pos", F.col("__lab").alias("l"))
    while w * 2 <= min_window:
        # each round self-joins cur — pin it, or the iterative lineage
        # recomputes every earlier round once per branch (2^rounds
        # blowup; the same guard as every iterative operator here)
        cur = cur.localCheckpoint()
        shifted = cur.select(
            F.col(id_col),
            (F.col("pos") - F.lit(w)).alias("pos"),
            F.col("l").alias("__l2"),
        )
        paired = cur.join(shifted, [id_col, "pos"], "left").select(
            id_col,
            "pos",
            F.col("l").alias("__l1"),
            F.coalesce("__l2", _sentinel()).alias("__l2"),
        )
        lab = paired.groupBy("__l1", "__l2").agg(_class_label(id_col))
        cur = paired.join(lab, ["__l1", "__l2"]).select(
            id_col, "pos", F.col("__lab").alias("l")
        )
        w *= 2
    return cur, w


def exact_substr_spans(
    df: DataFrame,
    min_len: int = 40,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT ExactSubstr span detection: (id, span_start, span_end)
    rows — the merged (1-based, inclusive) character intervals covered
    by some substring of length >= ``min_len`` that occurs at least
    ``min_count`` times across the whole corpus (within-document
    repeats count, as in Lee et al.'s single concatenated corpus).

    Detection key: with w the largest power of two <= L, the length-L
    window at ``pos`` equals another iff BOTH width-w window classes
    at ``pos`` and at ``pos + L - w`` match (overlapped sparse-table
    windows — exact for any L without materializing L-grams). A
    position starts a duplicated L-gram iff its key group has >=
    ``min_count`` members; island-merging the [pos, pos+L-1] intervals
    per document yields maximal duplicated spans. One groupBy on the
    two-label key + one join back — the same Zipf-head shape as the
    approximate spans operator, but with exact semantics."""
    if min_len < 2:
        raise ValueError("min_len must be >= 2")
    ranks, w = window_classes(df, min_len, text_col, id_col)
    off = min_len - w
    lens = df.select(F.col(id_col), F.length(text_col).alias("__len"))
    starts = (
        ranks.join(lens, id_col)
        .filter(F.col("pos") <= F.col("__len") - min_len + 1)
        .select(id_col, "pos", F.col("l").alias("__k1"))
    )
    if off:
        second = ranks.select(
            F.col(id_col),
            (F.col("pos") - F.lit(off)).alias("pos"),
            F.col("l").alias("__k2"),
        )
        # inner join is total on starts: pos + off <= len - w + 1 holds
        # for every start position, so the second window always exists
        keyed = starts.join(second, [id_col, "pos"])
    else:
        keyed = starts.select(id_col, "pos", "__k1",
                              F.col("__k1").alias("__k2"))
    dup = (
        keyed.groupBy("__k1", "__k2")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select("__k1", "__k2")
    )
    hits = keyed.join(dup, ["__k1", "__k2"]).select(
        F.col(id_col),
        F.col("pos").alias("s"),
        (F.col("pos") + F.lit(min_len - 1)).alias("e"),
    )
    # gaps-and-islands merge, the spans.py pattern: per-doc ordered by
    # start (unique per doc -> total order), new island when s opens a
    # gap past the running max end; adjacent intervals merge.
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
                F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-2)) + 1,
                1,
            ).otherwise(0)
        ).over(wpre).alias("__isl"),
    )
    return (
        islands.groupBy(id_col, "__isl")
        .agg(
            F.min("s").cast("bigint").alias("span_start"),
            F.max("e").cast("bigint").alias("span_end"),
        )
        .drop("__isl")
    )
