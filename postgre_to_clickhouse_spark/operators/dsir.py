"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed n-gram
feature distribution looks like a TARGET corpus, by importance
weighting in the hashed feature space and Gumbel top-k resampling.

The public recipe, re-expressed Spark-first:

1. **Features**: unigrams + word bigrams, hashed into ``n_buckets``
   buckets (the paper's hashed n-gram generative model). The hash is
   the repo's content-addressed md5 construction (first 8 hex chars →
   integer), so the same gram lands in the same bucket on any cluster
   layout, any engine — and the DuckDB oracle can recompute it.
2. **Bag-of-buckets models**: add-1-smoothed bucket probabilities for
   the target (p) and raw (q) corpora. Both count vectors are
   B-bounded (the model, not the data), so they collect to the driver
   and fold into ONE literal array expression — scoring is a pure map,
   zero shuffles over the corpus.
3. **Importance weight**: log w(x) = Σ_grams [ln p(b) − ln q(b)],
   QUANTIZED per bucket to integer micro-nats
   (``round(... * 1e6) :: bigint``). Integer per-doc sums are
   order-independent and exact — the cross-engine float discipline
   (`queries/registry.py`): only the per-BUCKET constant touches libm,
   and a 1-ulp ln() difference dies in the rounding except on razor
   .5 boundaries.
4. **Gumbel top-k resampling**: key = logw_q + Gumbel_q where the
   Gumbel noise is content-addressed from the doc id (u = (h + 0.5) /
   2^32 → g = −ln(−ln u), same micro-nat quantization) — the paper's
   sampling-without-replacement trick with a deterministic,
   layout-independent noise source. Top-k by (key DESC, doc_id) is
   Spark's TakeOrdered — per-partition heaps, no global sort
   materialization.

Scale shape (100 TB posture): two map-side-combinable groupBys over a
B-bounded key space fit the models (the ONLY shuffles, each bounded by
``n_buckets`` post-combine); scoring + noise + selection are map-only
against plan-embedded literal weights; top-k never materializes a
global sort. Nothing data-proportional ever reaches the driver — the
two collected count vectors are model-sized (≤ B rows each).

Reference parity anchor: the reference repo has no data-curation
surface (config-only CDC pipeline); this operator is part of the
LLM-training-data tier the build mandate adds on top (SURVEY.md §2
Tier C).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hashed_gram_buckets", "dsir_bucket_counts", "dsir_select"]

_HASH_SPACE = 2 ** 32


def hashed_gram_buckets(
    text_col: str | Column,
    n_buckets: int = 1024,
    seed: str = "dsir-v1",
) -> Column:
    """``array<bigint>`` of hashed-gram bucket ids for one document:
    unigrams + word bigrams (``a_b``), each md5-hashed with the seed
    and reduced mod ``n_buckets``. Pure column expression — no UDF,
    no shuffle; identical construction in the DuckDB oracle."""
    toks = F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != ""
    )
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1), F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams,
        lambda g: F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + ":"), g)), 1, 8),
            16, 10,
        ).cast("long") % n_buckets,
    )


def dsir_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    seed: str = "dsir-v1",
) -> list[int]:
    """The corpus's hashed-gram bucket count vector, as a plain
    B-length python list. ONE map-side-combinable groupBy on a key
    space of at most ``n_buckets`` values — the collect is bounded by
    the MODEL size, never the data."""
    rows = (
        df.select(
            F.explode(hashed_gram_buckets(text_col, n_buckets, seed))
            .alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    out = [0] * n_buckets
    for r in rows:
        out[r["b"]] = r["c"]
    return out


def _quantized_log_weights(
    target_counts: list[int], raw_counts: list[int]
) -> list[int]:
    """Per-bucket integer micro-nat weights:
    round((ln p(b) − ln q(b)) · 1e6) with add-1 smoothing. Driver-side
    python over B entries — model-sized, engine-independent arithmetic
    (ln on a double ratio of exact integers, same expression the
    oracle's SQL evaluates)."""
    b = len(raw_counts)
    tt = sum(target_counts) + b
    tr = sum(raw_counts) + b

    def _half_away(x: float) -> int:
        # HALF_UP like Spark round() / DuckDB round() — python round()
        # is banker's and would diverge on exact .5 boundaries
        return int(math.floor(x + 0.5)) if x >= 0 \
            else -int(math.floor(-x + 0.5))

    return [
        _half_away(
            (math.log((target_counts[i] + 1.0) / tt)
             - math.log((raw_counts[i] + 1.0) / tr)) * 1e6
        )
        for i in range(b)
    ]


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    seed: str = "dsir-v1",
    gumbel_seed: str = "dsir-gumbel-v1",
) -> DataFrame:
    """Select ``k`` documents from ``raw`` by DSIR importance
    resampling toward ``target``'s hashed n-gram distribution.

    Returns (id_col, dsir_logw_q, dsir_key_q) for the selected rows —
    the quantized log importance weight and the Gumbel-perturbed
    selection key (both integer micro-nats, so the result hashes
    identically on any engine/layout).
    """
    # r16: both distributions' bucket counts in ONE action (a tagged
    # union of the two model-bounded groupBys — they were two driver
    # round-trips over the same machinery; counts unchanged). The md5
    # gram hashing is a HEAVY map (1.12 s single-task on the 1-split
    # fixture), so both sides spread first — identity at real scale
    # (the KN-scorer pattern; the groupBy it feeds is model-bounded,
    # not corpus-bounded, so no corpus shuffle is added).
    from postgre_to_clickhouse_spark.operators.sampling import spread_small_input

    rows = (
        spread_small_input(target.select(text_col))
        .select(
            F.lit(0).alias("__side"),
            F.explode(hashed_gram_buckets(text_col, n_buckets, seed)).alias("b"),
        )
        .unionByName(
            spread_small_input(raw.select(text_col)).select(
                F.lit(1).alias("__side"),
                F.explode(hashed_gram_buckets(text_col, n_buckets, seed)).alias("b"),
            )
        )
        .groupBy("__side", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    tgt_counts, raw_counts = [0] * n_buckets, [0] * n_buckets
    for r in rows:
        (tgt_counts if r["__side"] == 0 else raw_counts)[r["b"]] = r["c"]
    lw = _quantized_log_weights(tgt_counts, raw_counts)

    buckets = hashed_gram_buckets(text_col, n_buckets, seed)
    # the whole model rides the plan as ONE literal array — scoring is
    # a map (element_at is 1-indexed)
    lw_arr = F.lit(lw)
    score = F.aggregate(
        buckets,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(lw_arr, (b + 1).cast("int")),
    )
    # content-addressed Gumbel noise: u in (0, 1) from md5(doc id),
    # offset by half an ulp of the 32-bit hash space so u is never 0/1
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(gumbel_seed + ":"),
                           F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(_HASH_SPACE))
    gumbel_q = F.round(-F.log(-F.log(u)) * 1e6).cast("long")
    scored = raw.select(
        F.col(id_col),
        score.alias("dsir_logw_q"),
        (score + gumbel_q).alias("dsir_key_q"),
    )
    # TakeOrdered: per-partition heaps of size k, no global sort
    return scored.orderBy(
        F.col("dsir_key_q").desc(), F.col(id_col)
    ).limit(k)
