"""Model-based quality scoring — a CCNet/fastText-style linear text
classifier, trained AND applied distributed (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", arXiv:1911.00359; Joulin et al. 2017, "Bag of Tricks for
Efficient Text Classification", arXiv:1607.01759).

CCNet's quality stage scores every document with a linear
bag-of-ngrams classifier (fastText) trained to separate a high-quality
corpus (Wikipedia) from raw crawl, then keeps/buckets documents by the
score. The public recipe re-expressed Spark-first:

1. **Features**: the repo's content-addressed hashed unigram+bigram
   buckets (:func:`operators.dsir.hashed_gram_buckets` — md5 first 8
   hex → int, mod ``n_buckets``), exactly fastText's hashing-trick
   feature space. Pure column expression, no UDF, and the DuckDB
   oracle can recompute it.
2. **Fit from aggregated sufficient statistics**: the classifier is
   the closed-form generative fit of the logistic model — multinomial
   Naive Bayes log-odds (the classic NB/logistic duality; NB weights
   are what fastText converges to under the generative objective):
   ``w_b = ln((pos_b + 1)/(Σpos + B)) − ln((neg_b + 1)/(Σneg + B))``
   with a document-prior bias ``ln(n_pos) − ln(n_neg)``. The ONLY
   corpus-wide work is one map-side-combinable groupBy over a
   ``(label, bucket)`` key space bounded by ``2·n_buckets`` plus a
   2-row label-count aggregate — both collect MODEL-sized results,
   never data-sized. No iterative optimization → the fit is exactly
   reproducible from counts, so a SQL oracle recomputes the whole
   model closed-form.
3. **Quantized integer scores**: per-bucket weights and the bias are
   quantized to integer micro-nats (``round(x · 1e6)``, HALF_UP), so
   the per-document score is an order-independent exact integer sum —
   the cross-engine float discipline (`queries/registry.py`): libm
   touches only the per-BUCKET constant, a 1-ulp ``ln`` divergence
   dies in the rounding except on razor .5 boundaries.
4. **Scoring is map-only**: the fitted weight vector rides the plan
   as ONE literal array; ``score = bias + Σ_grams w[bucket]`` is an
   ``aggregate`` fold over the gram array, ``keep = score > 0`` the
   decision. Zero exchanges, zero joins, zero Python in the scoring
   plan (plan-gated like DSIR's, tests/test_plans.py).

Scale shape (100 TB posture): the fit shuffles only the 2B-bounded
(label, bucket) counts (map-side combine makes the exchange
model-sized); scoring is embarrassingly parallel against the
plan-embedded literal weights. Nothing data-proportional reaches the
driver. This is the same proven shape as DSIR (`operators/dsir.py`) —
the difference is the MODEL: per-class conditionals + a prior bias =
a trained keep/drop classifier, vs DSIR's importance ratio for
resampling.

Reference parity anchor: the reference repo (config-only CDC pipeline)
has no data-curation surface; this operator is part of the
LLM-training-data tier the build mandate adds (SURVEY.md §2 Tier C4;
VERDICT r13 #6 / r14 #3 — the one major public curation stage the
engine lacked end-to-end).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.operators.dsir import hashed_gram_buckets

__all__ = [
    "fit_quality_classifier",
    "score_quality",
    "quality_classifier_select",
]


def _half_away(x: float) -> int:
    """HALF_UP like Spark round() / DuckDB round() — python round()
    is banker's and would diverge on exact .5 boundaries."""
    return int(math.floor(x + 0.5)) if x >= 0 \
        else -int(math.floor(-x + 0.5))


def fit_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 1024,
    seed: str = "qclf-v1",
) -> tuple[list[int], int]:
    """Fit the NB-log-odds linear classifier from a labeled frame
    (``label_col`` truthy = high-quality / positive class).

    Returns ``(weights_q, bias_q)``: the dense ``n_buckets``-length
    integer micro-nat weight vector (UNSEEN buckets get the add-1
    smoothed weight, not 0 — a scored document may contain grams the
    training set never produced) and the integer micro-nat document
    prior ``round((ln n_pos − ln n_neg) · 1e6)``.

    Distributed cost: ONE map-side-combinable groupBy over a key
    space of at most ``2 · (n_buckets + 1)`` values — the single
    collect is bounded by the MODEL, never the data. The per-class
    document counts ride the SAME aggregation as a sentinel bucket
    (-1, one per document), so the whole fit is ONE Spark action over
    ONE evaluation of ``labeled`` — a non-deterministic input
    (sample()/limit() without cache) can never hand the bias counts
    from a different evaluation than the bucket counts (ADVICE r15).
    """
    y = F.when(F.col(label_col).cast("boolean"), 1).otherwise(0)
    rows = (
        labeled.select(
            y.alias("y"),
            F.explode(
                F.concat(
                    # coalesce: a NULL text has no grams but is still
                    # a document — it must reach the sentinel count
                    F.coalesce(
                        hashed_gram_buckets(text_col, n_buckets, seed),
                        F.array().cast("array<bigint>"),
                    ),
                    F.array(F.lit(-1)),  # one doc-count sentinel/row
                )
            ).alias("b"),
        )
        .groupBy("y", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    pos = [0] * n_buckets
    neg = [0] * n_buckets
    n_pos = n_neg = 0
    for r in rows:
        if r["b"] == -1:
            if r["y"]:
                n_pos = r["c"]
            else:
                n_neg = r["c"]
        else:
            (pos if r["y"] else neg)[r["b"]] = r["c"]
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            "fit_quality_classifier needs BOTH classes in the labeled "
            f"frame (got n_pos={n_pos}, n_neg={n_neg})"
        )
    tp = sum(pos) + n_buckets
    tn = sum(neg) + n_buckets
    weights_q = [
        _half_away(
            (math.log((pos[b] + 1.0) / tp)
             - math.log((neg[b] + 1.0) / tn)) * 1e6
        )
        for b in range(n_buckets)
    ]
    bias_q = _half_away((math.log(n_pos) - math.log(n_neg)) * 1e6)
    return weights_q, bias_q


def score_quality(
    df: DataFrame,
    weights_q: list[int],
    bias_q: int,
    text_col: str = "text",
    n_buckets: int = 1024,
    seed: str = "qclf-v1",
    score_col: str = "qclf_score_q",
    keep_col: str = "qclf_keep",
) -> DataFrame:
    """Append the quantized classifier score and the keep decision.

    MAP-ONLY: the whole model is one plan-embedded literal array;
    the score is an integer ``aggregate`` fold over the gram-bucket
    array (element_at is 1-indexed); ``keep = score > 0`` (the NB
    decision boundary — posterior odds above the prior-adjusted 1)."""
    if len(weights_q) != n_buckets:
        raise ValueError(
            f"weights_q has {len(weights_q)} entries, expected "
            f"{n_buckets}"
        )
    buckets = hashed_gram_buckets(text_col, n_buckets, seed)
    w_arr = F.lit(weights_q)
    score = F.aggregate(
        buckets,
        F.lit(int(bias_q)).cast("long"),
        lambda acc, b: acc + F.element_at(w_arr, (b + 1).cast("int")),
    )
    return df.withColumn(score_col, score).withColumn(
        keep_col, (F.col(score_col) > 0).cast("int")
    )


def quality_classifier_select(
    raw: DataFrame,
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    seed: str = "qclf-v1",
) -> DataFrame:
    """End-to-end CCNet-style quality stage: fit on the labeled
    positive/negative corpora, score EVERY raw document map-only.
    Returns ``raw`` plus (qclf_score_q, qclf_keep)."""
    labeled = (
        positive.select(F.col(text_col), F.lit(True).alias("label"))
        .unionByName(
            negative.select(F.col(text_col), F.lit(False).alias("label"))
        )
    )
    weights_q, bias_q = fit_quality_classifier(
        labeled, text_col, "label", n_buckets, seed)
    return score_quality(raw, weights_q, bias_q, text_col,
                         n_buckets, seed)
