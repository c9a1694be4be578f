"""Deduplication family for training-data pipelines (SURVEY.md C1/C2).

- :func:`exact_dedup` — content-hash groupBy, deterministic survivor.
- :func:`minhash_near_dup` — shingle → MinHash → banded LSH → bucket
  join, the classic near-dup pipeline, built from JVM expressions
  (xxhash64-based minhash, no Python row path).
- :func:`simhash` — 64-bit SimHash over tokens, again JVM-side: explode
  tokens, per-bit weighted sums, sign-pack.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard over candidate
  pairs (verification stage after LSH, or standalone on small sets).

Scale posture: every step is explode/groupBy/join — shuffles on
bounded-size keys (shingle hashes, band signatures), never a cross
product. The LSH band join is the 100 TB path: candidate pairs ∝ true
near-dups, not N².
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """One survivor per distinct content (lowest ``order_col`` wins).

    Hash-groupBy shape: at scale this shuffles on a digest of the
    content, not the content itself.
    """
    digest = F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]), 256)
    w = Window.partitionBy(digest).orderBy(F.col(order_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def shingles(text_col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingle array (lowercased, \\w+ tokens), JVM-side.

    Array form — convenient for per-row use; the exploded
    :func:`shingle_rows` form is ~3× faster when the grams feed a
    groupBy/join anyway (no per-row array materialization).
    """
    toks = F.split(F.lower(text_col if isinstance(text_col, Column) else F.col(text_col)), r"\W+")
    toks = F.filter(toks, lambda t: t != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def shingle_rows(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, gram) rows via posexplode + lead windows — no array
    slicing/allocation per gram (measured 1.5 s vs 4.4 s for the
    signature stage at sf0.1). Semantics identical to :func:`shingles`:
    full n-token grams, plus the single partial gram for docs shorter
    than n (concat_ws skips the null leads at pos 0)."""
    # r16: measured and deliberately NOT spread_small_input'd — the
    # next op is the per-id lead window (a shuffle either way), so
    # spreading only parallelizes a ~0.3 s scan-stage explode at the
    # cost of a whole extra shuffle (A/B at sf0.1: minhash candidates
    # 1.4 s without vs 1.8+ s with).
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.filter(F.split(F.lower(text_col), r"\W+"), lambda t: t != "")).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    g = toks.select(
        F.col(id_col),
        F.concat_ws(" ", *leads).alias("g"),
        F.lead("tok", n - 1).over(w).isNotNull().alias("__full"),
        F.col("pos"),
    )
    return g.filter(F.col("__full") | (F.col("pos") == 0)).select(id_col, "g")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
    grams: DataFrame | None = None,
) -> DataFrame:
    """num_hashes independent min-hashes per document.

    hᵢ(s) = xxhash64(s, seedᵢ) — a seeded JVM hash family, no Python.
    Shape matters at scale: explode the (distinct) shingle set ONCE and
    take 32 mins in a single groupBy — each shingle is tokenized and
    hashed exactly once. (The naive per-column formulation re-derives
    the shingle array per hash function: 32× the regex work — measured
    280 s vs ~2 s at sf0.1.) Documents with no tokens yield no rows.

    ``grams`` — optional precomputed (id, g) rows from
    :func:`shingle_rows` with the same ``n_shingle``; pass a persisted
    frame when a downstream stage (e.g. Jaccard verification) needs the
    same grams, so the corpus is tokenized once, not per stage.
    """
    # NO .distinct(): min(hash(g)) over a multiset equals min over the
    # set, so deduping grams first would only add an exchange — and
    # without it the groupBy reuses shingle_rows' window partitioning
    # (hashpartitioning on the id), leaving ONE corpus-proportional
    # exchange in the whole signature stage.
    sh_rows = grams if grams is not None else shingle_rows(df, text_col, id_col, n_shingle)
    # r16: aggregates as SQL expression strings (one parser round each)
    # — the int literal seed column parses to the same IntegerType
    # literal F.lit produced, so hashes are bit-identical; only the
    # ~4·num_hashes py4j construction calls go away (the simhash
    # rewrite's measured pattern).
    return sh_rows.groupBy(id_col).agg(
        *[F.expr(f"min(xxhash64(g, {seed + i})) AS mh{i}") for i in range(num_hashes)]
    )


def minhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Returns (id_a, id_b, n_bands_matched) with id_a < id_b. Documents
    sharing ≥1 band signature are candidates; rows/band = num_hashes//bands
    sets the similarity threshold (~(1/bands)^(1/rows)).
    """
    rows_per_band = num_hashes // bands
    base = minhash_signatures(df, text_col, id_col, n_shingle, num_hashes, seed)

    # band signature = hash of its rows_per_band minhashes
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = base.select(id_col, *band_cols)
    # explode to (band_idx, band_sig, id), then collect each LSH bucket
    # and emit pairs from WITHIN it. A self-join formulation plans the
    # shingle→minhash pipeline twice (the broadcast side can't reuse
    # the shuffle exchange) and broadcasts the full signature table —
    # data-proportional, dead at 100 TB. This shape computes signatures
    # once and shuffles only (bucket_key, id); bucket sizes are the
    # near-dup cluster sizes, small by construction (giant buckets mean
    # exact dups, which exact_dedup removes upstream).
    kv = banded.select(
        id_col,
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("b"), F.col(f"band{b}").alias("sig")) for b in range(bands)])
        ).alias("e"),
    ).select(id_col, F.col("e.b").alias("b"), F.col("e.sig").alias("sig"))
    buckets = kv.groupBy("b", "sig").agg(F.collect_list(id_col).alias("ids")).filter(F.size("ids") > 1)
    pair_arr = F.filter(
        F.flatten(
            F.transform(
                "ids",
                lambda x: F.transform("ids", lambda y: F.struct(x.alias("id_a"), y.alias("id_b"))),
            )
        ),
        lambda p: p["id_a"] < p["id_b"],
    )
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands_matched"))
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document, fully JVM-side.

    tokens → xxhash64 → per-bit ±1 sums → sign bits packed to a long.
    Implemented with explode + groupBy (one shuffle on id); near-dup
    detection = hamming distance on the signature (see
    :func:`hamming64`).
    """
    # r16: measured and deliberately NOT spread_small_input'd — same
    # reading as shingle_rows (the groupBy shuffles anyway; A/B 1.85 s
    # without vs 2.4+ s with at sf0.1).
    toks = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.lower(F.col(text_col)), r"\W+"), lambda t: t != "")).alias("tok"),
    ).select(id_col, F.xxhash64("tok").alias("h"))

    # r16: the 64 per-bit aggregates and the 64-term signature fold are
    # built as SQL expression STRINGS (one parser round each) instead of
    # ~700 py4j Column calls — construction of this frame dropped
    # 1.6-2.9 s -> 0.2-0.4 s with bit-identical signatures (the parsed
    # tree is the same arithmetic; a DRIVER-side cost, not a plan
    # change). Bit 63 is the sign bit: 1<<63 overflows a long literal
    # in SQL exactly as in py4j, so it rides in as the casted min-long.
    def _bitlit(i: int) -> str:
        return f"{1 << i}L" if i < 63 else "CAST(-9223372036854775808 AS BIGINT)"

    # bit i contribution: +1 if set, -1 otherwise
    agg = toks.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(CASE WHEN (h & {_bitlit(i)}) != 0 THEN 1 ELSE -1 END) AS s{i}"
            )
            for i in range(bits)
        ]
    )
    terms = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {_bitlit(i)} ELSE 0L END)" for i in range(bits)
    )
    return agg.select(F.col(id_col), F.expr(f"({terms}) AS simhash"))


def hamming64(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.bit_count(a.bitwiseXOR(b))


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for candidate (id_a, id_b) pairs.

    Scalable formulation: explode each doc's distinct gram set once,
    hash-join grams between the two sides of the candidate pairs, and
    count shared grams per pair; |A∪B| = |A|+|B|−|A∩B| from per-doc
    cardinalities. No arrays ship through the pair join and the work is
    Σ shared-gram matches, not Σ pairs × gram-set size. (The per-pair
    ``array_intersect`` version measured ~45 s at sf0.1 vs ~3 s for
    this shape — and it degrades quadratically with doc length.)
    """
    grams = shingle_rows(df, text_col, id_col, n).distinct()
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))

    ga = grams.select(F.col(id_col).alias("id_a"), F.col("g"))
    gb = grams.select(F.col(id_col).alias("id_b"), F.col("g"))
    pair_grams = candidate_pairs.join(ga, "id_a").join(gb, ["id_b", "g"])
    inter = pair_grams.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter"))

    # candidates with zero shared grams keep jaccard 0 via left join
    out = (
        candidate_pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb")), "id_b")
    )
    jac = F.col("n_inter").cast("double") / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double")
    return out.select("id_a", "id_b", jac.alias("jaccard"))


def ngram_overlap_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
    eval_id_col: str = "eval_id",
    n: int = 8,
) -> DataFrame:
    """Eval-set decontamination: which corpus documents share word
    n-grams with a benchmark/eval document, and how much of that eval
    document they cover. The standard pre-training hygiene pass
    (13-gram overlap in GPT-3/PaLM writeups; ``n`` is a knob because
    fixture documents are short).

    Output: (doc_id, eval_id, n_overlap, eval_grams, eval_frac) — one
    row per (corpus doc, eval doc) pair sharing ≥1 distinct n-gram;
    ``eval_frac`` = fraction of the eval doc's distinct grams found in
    the corpus doc. Callers threshold (e.g. drop ``eval_frac > 0.5``).

    Scale shape: corpus grams come from :func:`shingle_rows` (codegen'd
    posexplode + lead windows — one token-level exchange on the doc id;
    the per-gram ``shingles``/``array_distinct`` array path was measured
    20× slower at 100k docs because higher-order slices are interpreted
    and ``array_distinct`` on strings is quadratic per row) and WITHOUT
    per-doc dedup: distinctness is enforced by ``countDistinct`` AFTER
    the broadcast probe, where rows are gram COLLISIONS (≈ contaminated
    pairs), not corpus volume. Eval suites are MBs against a 100 TB
    corpus, so the probe side broadcasts and the corpus-proportional
    exchanges are exactly one token shuffle — every other exchange is
    collision- or eval-sized. Plan-gated in ``tests/test_plans.py``.
    """
    cg = shingle_rows(corpus, text_col, id_col, n)
    eg = shingle_rows(eval_df, eval_text_col, eval_id_col, n).distinct()
    sizes = eg.groupBy(eval_id_col).agg(F.count(F.lit(1)).alias("eval_grams"))
    hits = (
        cg.join(F.broadcast(eg), "g")
        .groupBy(id_col, eval_id_col)
        .agg(F.countDistinct("g").alias("n_overlap"))
    )
    return hits.join(F.broadcast(sizes), eval_id_col).select(
        id_col,
        eval_id_col,
        "n_overlap",
        "eval_grams",
        (F.col("n_overlap").cast("double") / F.col("eval_grams").cast("double")).alias("eval_frac"),
    )


def dedup_against_corpus(
    new_batch: DataFrame,
    corpus: DataFrame,
    content_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Incremental ingestion dedup: survivors of ``new_batch`` whose
    content digest appears neither in the already-ingested ``corpus``
    nor earlier (by ``order_col``) in the batch itself.

    This is the continuous form of :func:`exact_dedup` — a training
    corpus is never rebuilt from scratch, so day-N ingestion dedups the
    day's crawl against the standing corpus. Shape: the within-batch
    pass is the usual digest-window; the corpus probe is a LEFT ANTI
    join on the 32-byte digest — both sides shuffle digests only, never
    content, and at 100 TB the corpus side prunes to its digest column
    (column-pruned scan of a digest manifest, not a re-read of text).
    """

    digest = F.sha2(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]), 256
    )
    fresh = exact_dedup(new_batch, content_cols, order_col).withColumn("__d", digest)
    seen = corpus.select(digest.alias("__d"))
    return fresh.join(seen, "__d", "left_anti").drop("__d")


def minhash_incremental_candidates(
    new_batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidates of a NEW ingest batch against the standing
    corpus — the continuous form of :func:`minhash_near_dup`, pairing
    with :func:`dedup_against_corpus` the way LSH pairs with exact
    digests.

    Returns (new_id, corpus_id, n_bands_matched): every corpus document
    sharing >= 1 band signature with a batch document. Within-batch
    pairs are the existing :func:`minhash_near_dup` on the batch alone.

    Scale shape: the corpus side here recomputes signatures for
    checkability, but in production the (id, band, sig) table is the
    PERSISTED state of the standing corpus — appended as batches are
    admitted, never recomputed — so a batch costs
    O(batch shingles + matched buckets): the batch's band keys hash-join
    against the corpus band table (bucketed on (band, sig) so the probe
    is shuffle-free on the corpus side), and nothing corpus-sized moves.
    MinHash signatures are order/layout-independent, which is what makes
    the persisted-state form equal to the recompute form row-for-row.
    """
    def _banded_kv(df: DataFrame, out_id: str) -> DataFrame:
        rows_per_band = num_hashes // bands
        base = minhash_signatures(df, text_col, id_col, n_shingle, num_hashes, seed)
        band_cols = [
            F.xxhash64(
                *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias(f"band{b}")
            for b in range(bands)
        ]
        banded = base.select(id_col, *band_cols)
        return banded.select(
            F.col(id_col).alias(out_id),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("b"), F.col(f"band{b}").alias("sig"))
                        for b in range(bands)
                    ]
                )
            ).alias("e"),
        ).select(out_id, F.col("e.b").alias("b"), F.col("e.sig").alias("sig"))

    kv_new = _banded_kv(new_batch, "new_id")
    kv_corp = _banded_kv(corpus, "corpus_id")
    return (
        kv_new.join(kv_corp, ["b", "sig"])
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_bands_matched"))
    )


# -- exact edit-distance pair join (r7) -------------------------------------
#
# PassJoin-style partition/probe candidate generation (Li, Deng, Feng,
# "PASS-JOIN: a partition-based method for similarity joins", 2011 —
# public algorithm): partition every string into tau+1 segments; if
# lev(a, b) <= tau then by pigeonhole at least one of b's segments is
# untouched by the optimal alignment and therefore appears EXACTLY in
# a, at a start position p whose shift s = p - start_j satisfies
# |s| + |delta - s| <= tau (edits before the segment >= |s|, edits
# after >= |delta - s|, delta = len(a) - len(b)). Candidate generation
# is an EQUALITY join on (block, target-length, slot, content) — cost
# O(N * tau^2 * (tau+1)) probe keys, never O(sum block^2) pairwise —
# and every candidate is verified with the exact threshold-banded DP,
# so the result is identical to the all-pairs form.


def edit_distance_pairs(
    df: DataFrame,
    text_col: Column | str,
    id_col: str = "doc_id",
    block_col: str = "source",
    max_dist: int = 5,
) -> DataFrame:
    """All (id_a < id_b) pairs within ``block_col`` whose ``text_col``
    values are within Levenshtein distance ``max_dist``, with
    PassJoin candidate generation + bag-of-chars prefilter +
    threshold-banded exact verify. Output: (id_a, id_b, edit_dist)."""
    tau = int(max_dist)
    m = tau + 1
    text = text_col if isinstance(text_col, Column) else F.col(text_col)

    # r16: the probe side fans every row out to ~tau^2*(tau+1) segment
    # triples and the index side to m segments — both evaluated in the
    # SCAN stage, which on a single-file input is ONE task doing all
    # the substring fan-out. Spread first (identity at real scale).
    from postgre_to_clickhouse_spark.operators.sampling import spread_small_input

    df = spread_small_input(df)

    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    hist = F.transform(
        F.array(*[F.lit(c) for c in alphabet]),
        lambda c: F.length(F.col("__txt")) - F.length(F.replace(F.col("__txt"), c, F.lit(""))),
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(block_col).alias("__blk"),
        text.alias("__txt"),
    ).select("__id", "__blk", "__txt", F.length("__txt").alias("__len"), hist.alias("__hist"))

    def seg_len(length: Column, j: Column) -> Column:
        b, k = (length / m).cast("int"), length % m
        return b + F.when(j >= m - k, 1).otherwise(0)

    def seg_start(length: Column, j: Column) -> Column:
        b, k = (length / m).cast("int"), length % m
        return j * b + F.greatest(j - (m - k), F.lit(0))

    # index side: each string's m segments
    js = F.sequence(F.lit(0), F.lit(m - 1))
    idx = base.select(
        F.col("__id").alias("__id_b"),
        "__blk",
        F.col("__len").alias("__lb"),
        F.explode(
            F.transform(
                js,
                lambda j: F.struct(
                    j.alias("j"),
                    F.substring(
                        F.col("__txt"), seg_start(F.col("__len"), j) + 1, seg_len(F.col("__len"), j)
                    ).alias("seg"),
                ),
            )
        ).alias("__s"),
    ).select("__id_b", "__blk", "__lb", F.col("__s.j").alias("__j"), F.col("__s.seg").alias("__seg"))

    # probe side: for every target length lb in [len-tau, len] and
    # slot j, substrings at shifts s with |s| + |delta - s| <= tau.
    # ONE-DIRECTIONAL (r12): only the longer-or-equal string probes —
    # the pigeonhole argument is length-agnostic (one of the SHORTER
    # string's tau+1 segments survives into the longer one), so
    # probing lb <= la keeps every qualifying pair reachable while
    # halving the probe explode and the candidate-join volume; the
    # r11 form probed [la-tau, la+tau] and generated each pair from
    # both sides only for the (id_a < id_b) filter to drop half.
    # Pair order is normalized with least/greatest instead.
    la = F.col("__len")

    def probe_triples() -> Column:
        lbs = F.sequence(F.greatest(la - tau, F.lit(0)), la)
        return F.flatten(
            F.transform(
                lbs,
                lambda lb: F.flatten(
                    F.transform(
                        js,
                        lambda j: F.filter(
                            F.transform(
                                F.sequence(F.lit(-tau), F.lit(tau)),
                                lambda s: F.struct(
                                    lb.alias("lb"),
                                    j.alias("j"),
                                    (seg_start(lb, j) + s).alias("p"),
                                    seg_len(lb, j).alias("sl"),
                                    s.alias("s"),
                                ),
                            ),
                            lambda t: (
                                (F.abs(t["s"]) + F.abs((la - t["lb"]) - t["s"]) <= tau)
                                & (t["p"] >= 0)
                                & (t["p"] + t["sl"] <= la)
                            ),
                        ),
                    )
                ),
            )
        )

    probe = base.select(
        F.col("__id").alias("__id_a"),
        "__blk",
        F.explode(probe_triples()).alias("__t"),
        F.col("__txt").alias("__txt_a"),
    ).select(
        "__id_a",
        "__blk",
        F.col("__t.lb").alias("__lb"),
        F.col("__t.j").alias("__j"),
        F.substring("__txt_a", F.col("__t.p") + 1, F.col("__t.sl")).alias("__seg"),
    )

    # shuffle-hash, never broadcast: both sides are explode-amplified
    # (probe ~tau^2*(tau+1) keys/row, index m segments/row) and
    # Catalyst's size estimate under explode is unreliable — a
    # mis-chosen broadcast of the probe side OOMs the driver. The
    # hash side is the smaller index slice per partition.
    cands = (
        probe.join(idx.hint("shuffle_hash"), ["__blk", "__lb", "__j", "__seg"])
        .filter(F.col("__id_a") != F.col("__id_b"))
        .select(
            F.least("__id_a", "__id_b").alias("__id_a"),
            F.greatest("__id_a", "__id_b").alias("__id_b"),
        )
        .distinct()
    )

    va = base.select(
        F.col("__id").alias("__id_a"),
        F.col("__txt").alias("__ta"),
        F.col("__hist").alias("__ha"),
    )
    vb = base.select(
        F.col("__id").alias("__id_b"),
        F.col("__txt").alias("__tb"),
        F.col("__hist").alias("__hb"),
    )

    def bag_over(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: F.greatest(u - v, F.lit(0))),
            F.lit(0),
            lambda acc, v: acc + v,
        )

    bag = F.greatest(
        bag_over(F.col("__ha"), F.col("__hb")), bag_over(F.col("__hb"), F.col("__ha"))
    )
    dist = F.levenshtein("__ta", "__tb", tau)
    return (
        cands.join(va, "__id_a")
        .join(vb, "__id_b")
        .filter((bag <= tau) & (dist >= 0))
        .select(
            F.col("__id_a").alias("id_a"),
            F.col("__id_b").alias("id_b"),
            dist.cast("bigint").alias("edit_dist"),
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    n: int = 5,
) -> DataFrame:
    """Cross-SLICE n-gram contamination matrix (Dodge et al. 2021,
    arXiv:2104.08758 measured exactly this inside C4): for every pair
    of values of ``source_col``, the count of distinct word n-grams
    both slices contain and the exact Jaccard over their
    distinct-gram sets. The between-slices companion to
    :func:`ngram_overlap_contamination` (corpus vs eval suite):
    per-source mixture weights silently double-count data when
    sources overlap.

    Output: (src_a, src_b, grams_a, grams_b, n_common, jaccard), one
    row per source pair sharing ≥ 1 gram, src_a < src_b. Counts are
    exact integers; jaccard is one IEEE division of exact BIGINTs
    (|a∪b| = |a|+|b|-|a∩b|), bit-identical on any engine.

    Scale shape: grams come from ``spans.positioned_grams`` (codegen'd
    posexplode + lead windows — the per-gram array-slice path was
    measured 20× slower; see :func:`ngram_overlap_contamination`),
    then ONE per-gram ``array_sort(collect_set(source))`` aggregate
    bounded by the source count. Each set explodes into singleton
    items (per-source distinct-gram totals) and ordered pairs
    (co-occurrence) inside the SAME aggregate — a gram self-join
    would recompute the whole shingle pipeline per side (probed: zero
    ReusedExchange in the executed plan; three formulations measured
    in SCALE.md, this one 0.11 decade exponent vs the self-join's
    0.44). The ≤ C(n_sources,2)+n_sources count rows materialize once
    via localCheckpoint before the broadcast assembly."""
    from postgre_to_clickhouse_spark.operators.spans import positioned_grams

    sets = (
        positioned_grams(df, text_col=text_col, id_col=id_col, n=n,
                         carry=(source_col,))
        .select(F.col(source_col).alias("__src"), F.col("g").alias("gram"))
        .groupBy("gram")
        .agg(F.array_sort(F.collect_set("__src")).alias("ss"))
    )
    items = F.concat(
        F.transform(
            F.col("ss"),
            lambda s: F.struct(
                s.alias("src_a"),
                F.lit(None).cast("string").alias("src_b"),
            ),
        ),
        F.flatten(
            F.transform(
                F.col("ss"),
                lambda a, i: F.transform(
                    # size-i-1 >= 0 for every i the outer transform
                    # produces (i = size-1 gives a length-0 slice)
                    F.slice(F.col("ss"), i + 2, F.size(F.col("ss")) - i - 1),
                    lambda b: F.struct(a.alias("src_a"), b.alias("src_b")),
                ),
            )
        ),
    )
    counts = (
        sets.select(F.explode(items).alias("p"))
        .groupBy(
            F.col("p.src_a").alias("src_a"),
            F.col("p.src_b").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .localCheckpoint()
    )
    tot = counts.filter(F.col("src_b").isNull()).select(
        F.col("src_a").alias("s"), F.col("n_common").alias("n_grams")
    )
    pairs = counts.filter(F.col("src_b").isNotNull())
    ta = tot.select(F.col("s").alias("src_a"),
                    F.col("n_grams").alias("grams_a"))
    tb = tot.select(F.col("s").alias("src_b"),
                    F.col("n_grams").alias("grams_b"))
    out = pairs.join(F.broadcast(ta), "src_a").join(F.broadcast(tb), "src_b")
    return out.select(
        "src_a",
        "src_b",
        F.col("grams_a").cast("bigint").alias("grams_a"),
        F.col("grams_b").cast("bigint").alias("grams_b"),
        F.col("n_common").cast("bigint").alias("n_common"),
        (
            F.col("n_common").cast("double")
            / (F.col("grams_a") + F.col("grams_b") - F.col("n_common"))
            .cast("double")
        ).alias("jaccard"),
    )
