"""Interpolated Kneser-Ney bigram language model — the PUBLISHED
smoothing behind CCNet-grade n-gram LM quality scoring (Kneser & Ney
1995; Chen & Goodman 1999's interpolated form with one absolute
discount; KenLM — the scorer CCNet itself ships — implements the
modified-KN generalization of exactly this estimator).

The engine already scores with add-k unigram/bigram LMs
(`operators/text.py`); this module adds the real thing:

    P(b | a) = max(C(a,b) - D, 0) / C(a.)
             + (D * N1+(a.) / C(a.)) * Pcont(b)
    Pcont(b) = N1+(.b) / N1+(..)

where C(a,b) is the bigram count, C(a.) the context total, N1+(a.)
the number of DISTINCT continuations of a, N1+(.b) the number of
distinct left-contexts of b (the continuation count - KN's insight:
"how novel is b?" not "how frequent is b?"), N1+(..) the number of
distinct bigram types, and D the absolute discount (0.75, Chen &
Goodman's canonical default).

Cross-engine exactness: every count is an exact integer from a
groupBy; the per-bigram log-probability quantizes to integer
micro-nats (round(-ln P * 1e6), HALF_UP) with the probability
expression written in ONE canonical textual form evaluated
identically by Spark and the DuckDB oracle — per-document scores are
then order-independent exact integer sums (the repo's float
discipline: libm touches only the per-TYPE constant, a 1-ulp ln
divergence dies in the rounding except on razor .5 boundaries).

Scale shape (100 TB): bigram counts are ONE map-side-combinable
groupBy over the Zipf-bounded pair space; context totals, continuation
counts and the distinct-type total all reduce FROM the bigram-type
table (never rescanning the corpus); N1+(..) is a single scalar; the
score attach is a hash join on the pair key and the per-doc reduce one
groupBy on the id. Nothing data-proportional reaches the driver except
that one scalar.

Reference parity anchor: the reference repo (config-only CDC pipeline)
has no curation surface; this is Tier-C4 growth (SURVEY.md §2), the
LM-scoring stage of the CCNet pipeline (arXiv:1911.00359 §4.3) whose
classifier stage landed as `operators/quality_clf.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kneser_ney_bigram_scores", "kn_bigram_model"]

# ONE canonical textual form of the interpolated-KN probability —
# evaluated verbatim by Spark (F.expr) and mirrored verbatim in the
# DuckDB oracle so both engines run the identical double-op sequence.
# {d} = discount literal, {nbi} = the N1+(..) scalar (SQL subquery or
# Spark literal).
KN_LOGPROB_Q_EXPR = (
    "CAST(round(-ln("
    "(greatest(CAST(cab AS DOUBLE) - {d}, 0.0) / CAST(ca AS DOUBLE))"
    " + (({d} * CAST(n1a AS DOUBLE) / CAST(ca AS DOUBLE))"
    " * (CAST(n1b AS DOUBLE) / CAST({nbi} AS DOUBLE)))"
    ") * 1e6) AS BIGINT)"
)


def _bigram_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, a, b) per bigram OCCURRENCE — tokens zipped with their own
    tail, a pure map (the `bigram_lm_scores` construction)."""
    toks = F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != ""
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.0").alias("a"), F.col("bg.1").alias("b"))


def kn_bigram_model(
    pairs: DataFrame, discount: float = 0.75
) -> tuple[DataFrame, int]:
    """Fit the interpolated-KN bigram model from an occurrence table
    ``(.., a, b)``. Returns ``(model, n_bigram_types)`` where model =
    (a, b, cab, ca, n1a, n1b, lp_q) — one row per bigram TYPE with its
    quantized micro-nat log-probability.

    All statistics reduce from the bigram-TYPE table: context totals
    C(a.) and continuation fan-outs N1+(a.) in one groupBy(a),
    left-context counts N1+(.b) in one groupBy(b), N1+(..) as a single
    scalar."""
    # ADVICE r15: D outside (0, 1) can drive the interpolated
    # probability to 0 or negative for singleton bigrams in
    # single-continuation contexts — ln() then yields NaN/-inf and
    # lp_q silently becomes garbage. Refuse loudly; the estimator is
    # only defined for an absolute discount strictly inside (0, 1).
    if not (0.0 < discount < 1.0):
        raise ValueError(
            f"Kneser-Ney absolute discount must satisfy 0 < D < 1, "
            f"got {discount!r}"
        )
    cab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    cab = cab.localCheckpoint(eager=True)  # 3 consumers + a count
    ca = cab.groupBy("a").agg(
        F.sum("cab").alias("ca"), F.count(F.lit(1)).alias("n1a")
    )
    n1b = cab.groupBy("b").agg(F.count(F.lit(1)).alias("n1b"))
    nbi = cab.count()
    model = (
        cab.join(ca, "a")
        .join(n1b, "b")
        .withColumn(
            "lp_q",
            F.expr(KN_LOGPROB_Q_EXPR.format(d=repr(discount), nbi=nbi)),
        )
    )
    return model, nbi


def kneser_ney_bigram_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document interpolated-KN bigram NLL over a model fit on the
    corpus itself (the CCNet self-scoring regime: documents far from
    the corpus distribution score high).

    Output: (id, n_bigrams, kn_nll_q) — the bigram count and the EXACT
    integer micro-nat sum of per-bigram negative log-probabilities.
    Docs with fewer than two tokens have no bigrams and drop out (the
    `bigram_lm_scores` contract). Every scored bigram is in the model
    by construction, so the attach join is total."""
    pairs = _bigram_pairs(df, text_col, id_col)
    model, _nbi = kn_bigram_model(pairs, discount)
    scored = pairs.join(model.select("a", "b", "lp_q"), ["a", "b"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp_q").cast("bigint").alias("kn_nll_q"),
    )
