"""Tier C round 15: model-based quality scoring (VERDICT r13 #6 /
r14 #3 — twice-ordered, the one major public LLM-data-curation stage
the engine lacked end-to-end).

``quality_classifier_score`` runs the full CCNet/fastText-style
pipeline distributed: fit a hashed-bag-of-ngrams linear classifier
(NB log-odds — the closed-form generative fit of the logistic model,
computable from aggregated sufficient statistics) on labeled
high/low-quality document slices, then score EVERY document map-only
with the weight vector as a plan-embedded literal. The DuckDB oracle
recomputes the ENTIRE model closed-form — hash, per-class counts,
smoothed weights, document-prior bias, per-doc integer score, keep
decision — value-for-value from the raw parquet.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.queries.registry import register
from postgre_to_clickhouse_spark.queries.tierc8 import _horner_int
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


_QCLF_POS = ("src0", "src1")
_QCLF_NEG = ("src2", "src3")


def _qclf_oracle() -> str:
    """The whole classifier, closed-form in DuckDB: same md5 bucket
    hash, same add-1-smoothed per-class log-odds quantized to integer
    micro-nats, same document-prior bias, same integer score fold.
    Buckets unseen in training still get the SMOOTHED weight (the lw
    CTE spans every bucket any document produces, with per-class
    counts coalesced to 0), matching the dense python-side vector."""
    pos = ", ".join(f"'{s}'" for s in _QCLF_POS)
    neg = ", ".join(f"'{s}'" for s in _QCLF_NEG)
    return f"""
    WITH w AS (
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, source, unnest(list_concat(toks,
            CASE WHEN len(toks) >= 2
                 THEN list_transform(range(len(toks) - 1),
                      i -> toks[i + 1] || '_' || toks[i + 2])
                 ELSE CAST([] AS VARCHAR[]) END)) AS gram
      FROM w
    ),
    b AS (
      SELECT doc_id, source, ({_horner_int("qclf-v1", "gram")}) % 1024 AS b
      FROM g
    ),
    posc AS (SELECT b, count(*) AS c FROM b
             WHERE source IN ({pos}) GROUP BY b),
    negc AS (SELECT b, count(*) AS c FROM b
             WHERE source IN ({neg}) GROUP BY b),
    tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM posc) AS tp,
                   (SELECT coalesce(sum(c), 0) FROM negc) AS tn,
                   (SELECT count(*) FROM documents
                    WHERE source IN ({pos})) AS np,
                   (SELECT count(*) FROM documents
                    WHERE source IN ({neg})) AS nn),
    lw AS (
      SELECT bb.b,
             CAST(round((ln((coalesce(posc.c, 0) + 1.0)
                             / (tot.tp + 1024.0))
                       - ln((coalesce(negc.c, 0) + 1.0)
                             / (tot.tn + 1024.0))) * 1e6)
                  AS BIGINT) AS wq
      FROM (SELECT DISTINCT b FROM b) bb
      LEFT JOIN posc ON bb.b = posc.b
      LEFT JOIN negc ON bb.b = negc.b, tot
    ),
    bias AS (
      SELECT CAST(round((ln(CAST(np AS DOUBLE))
                       - ln(CAST(nn AS DOUBLE))) * 1e6) AS BIGINT) AS bq
      FROM tot
    ),
    sc AS (
      SELECT b.doc_id, SUM(lw.wq) AS s
      FROM b JOIN lw ON b.b = lw.b
      GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(sc.s, 0) + bias.bq AS BIGINT) AS qclf_score_q,
           CAST(CASE WHEN coalesce(sc.s, 0) + bias.bq > 0
                THEN 1 ELSE 0 END AS INT) AS qclf_keep
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id, bias
    ORDER BY d.doc_id
    """


@register("quality_classifier_score", oracle=_qclf_oracle())
def quality_classifier_score(spark, sf_dir):
    """r15 (VERDICT r13 #6 / r14 #3): CCNet/fastText-style
    model-based quality scoring, trained AND applied distributed
    (arXiv:1911.00359 §4.4; arXiv:1607.01759). Positive class =
    documents from sources {src0, src1} (the high-quality proxy
    corpus — CCNet's Wikipedia role), negative = {src2, src3} (the
    raw-crawl role); features are the repo's content-addressed
    unigram+bigram md5 buckets (1024); the fit is the closed-form
    NB-log-odds generative solution of the logistic model from ONE
    (label, bucket)-bounded groupBy; weights and the document-prior
    bias quantize to integer micro-nats so every per-doc score is an
    order-independent exact integer; EVERY document then scores
    map-only with the model as a plan-embedded literal array, and
    keep = score > 0. The DuckDB oracle recomputes the entire model
    closed-form, value-for-value.

    Scale (see operators/quality_clf.py): the fit's only shuffle is
    map-side-combined and ≤ 2·1024 keys post-combine; scoring has
    ZERO exchanges/joins/Python (plan-gated,
    tests/test_plans.py::test_qclf_scoring_is_map_only)."""
    from postgre_to_clickhouse_spark.operators.quality_clf import (
        quality_classifier_select,
    )

    d = _t(spark, sf_dir, "documents")
    out = quality_classifier_select(
        d,
        d.filter(F.col("source").isin(*_QCLF_POS)),
        d.filter(F.col("source").isin(*_QCLF_NEG)),
        n_buckets=1024,
        seed="qclf-v1",
    )
    # no orderBy: the correctness gate hashes order-independently, and
    # a global sort would add the plan's only exchange
    return out.select(
        "doc_id",
        F.col("qclf_score_q").cast("bigint").alias("qclf_score_q"),
        F.col("qclf_keep").cast("int").alias("qclf_keep"),
    )


_QCLF_EVAL_POS = ("src4", "src5")
_QCLF_EVAL_NEG = ("src6", "src7")


def _qclf_eval_oracle() -> str:
    """Same closed-form model as :func:`_qclf_oracle`, then the
    held-out confusion matrix and the derived metrics as exact
    integer ratios (IEEE double division of exact bigints — identical
    bits on any engine; zero denominators answer NULL identically)."""
    pos = ", ".join(f"'{s}'" for s in _QCLF_POS)
    neg = ", ".join(f"'{s}'" for s in _QCLF_NEG)
    epos = ", ".join(f"'{s}'" for s in _QCLF_EVAL_POS)
    eneg = ", ".join(f"'{s}'" for s in _QCLF_EVAL_NEG)
    return f"""
    WITH w AS (
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, source, unnest(list_concat(toks,
            CASE WHEN len(toks) >= 2
                 THEN list_transform(range(len(toks) - 1),
                      i -> toks[i + 1] || '_' || toks[i + 2])
                 ELSE CAST([] AS VARCHAR[]) END)) AS gram
      FROM w
    ),
    b AS (
      SELECT doc_id, source, ({_horner_int("qclf-v1", "gram")}) % 1024 AS b
      FROM g
    ),
    posc AS (SELECT b, count(*) AS c FROM b
             WHERE source IN ({pos}) GROUP BY b),
    negc AS (SELECT b, count(*) AS c FROM b
             WHERE source IN ({neg}) GROUP BY b),
    tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM posc) AS tp_,
                   (SELECT coalesce(sum(c), 0) FROM negc) AS tn_,
                   (SELECT count(*) FROM documents
                    WHERE source IN ({pos})) AS np,
                   (SELECT count(*) FROM documents
                    WHERE source IN ({neg})) AS nn),
    lw AS (
      SELECT bb.b,
             CAST(round((ln((coalesce(posc.c, 0) + 1.0)
                             / (tot.tp_ + 1024.0))
                       - ln((coalesce(negc.c, 0) + 1.0)
                             / (tot.tn_ + 1024.0))) * 1e6)
                  AS BIGINT) AS wq
      FROM (SELECT DISTINCT b FROM b) bb
      LEFT JOIN posc ON bb.b = posc.b
      LEFT JOIN negc ON bb.b = negc.b, tot
    ),
    bias AS (
      SELECT CAST(round((ln(CAST(np AS DOUBLE))
                       - ln(CAST(nn AS DOUBLE))) * 1e6) AS BIGINT) AS bq
      FROM tot
    ),
    sc AS (
      SELECT b.doc_id, SUM(lw.wq) AS s
      FROM b JOIN lw ON b.b = lw.b
      WHERE b.source IN ({epos}, {eneg})
      GROUP BY b.doc_id
    ),
    pred AS (
      SELECT d.doc_id,
             CASE WHEN d.source IN ({epos}) THEN 1 ELSE 0 END AS y,
             CASE WHEN coalesce(sc.s, 0) + bias.bq > 0
                  THEN 1 ELSE 0 END AS yhat
      FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id, bias
      WHERE d.source IN ({epos}, {eneg})
    ),
    cm AS (
      SELECT CAST(sum(y * yhat) AS BIGINT) AS tp,
             CAST(sum((1 - y) * yhat) AS BIGINT) AS fp,
             CAST(sum(y * (1 - yhat)) AS BIGINT) AS fn,
             CAST(sum((1 - y) * (1 - yhat)) AS BIGINT) AS tn
      FROM pred
    )
    SELECT tp, fp, fn, tn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision_,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall_,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN 2.0 * tp / (2 * tp + fp + fn) END AS f1,
           CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy
    FROM cm
    """


@register("quality_classifier_eval", oracle=_qclf_eval_oracle())
def quality_classifier_eval(spark, sf_dir):
    """r15 companion to ``quality_classifier_score``: the HELD-OUT
    evaluation every deployed quality classifier ships with — train
    on {src0,src1} vs {src2,src3}, predict on the disjoint labeled
    slices {src4,src5} (positive truth) vs {src6,src7} (negative
    truth), and answer the confusion matrix plus precision / recall /
    F1 / accuracy in ONE row. Counts are exact integers; the derived
    metrics are IEEE divisions of those integers, so the row hashes
    identically on any engine; empty denominators answer NULL the
    same way on both sides. (On this synthetic corpus the sources
    share a generator, so the measured metrics hover near chance —
    the deliverable is the exact distributed evaluation, not the
    number.)

    Scale: the fit is the classifier's own bounded groupBy; scoring
    the eval slice is map-only against the literal weights; the
    confusion matrix is one 4-integer aggregate. Nothing
    data-proportional reaches the driver."""
    from postgre_to_clickhouse_spark.operators.quality_clf import (
        quality_classifier_select,
    )

    d = _t(spark, sf_dir, "documents")
    eval_df = d.filter(
        F.col("source").isin(*(_QCLF_EVAL_POS + _QCLF_EVAL_NEG)))
    scored = quality_classifier_select(
        eval_df,
        d.filter(F.col("source").isin(*_QCLF_POS)),
        d.filter(F.col("source").isin(*_QCLF_NEG)),
        n_buckets=1024,
        seed="qclf-v1",
    ).select(
        F.when(F.col("source").isin(*_QCLF_EVAL_POS), 1)
        .otherwise(0).alias("y"),
        F.col("qclf_keep").alias("yhat"),
    )
    cm = scored.agg(
        F.sum(F.col("y") * F.col("yhat")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("yhat")).cast("bigint").alias("fp"),
        F.sum(F.col("y") * (1 - F.col("yhat"))).cast("bigint").alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("yhat")))
        .cast("bigint").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        tp, fp, fn, tn,
        F.when(tp + fp > 0, tp.cast("double") / (tp + fp))
        .alias("precision_"),
        F.when(tp + fn > 0, tp.cast("double") / (tp + fn))
        .alias("recall_"),
        F.when(2 * tp + fp + fn > 0,
               F.lit(2.0) * tp / (2 * tp + fp + fn)).alias("f1"),
        ((tp + tn).cast("double") / (tp + fp + fn + tn)).alias("accuracy"),
    )


@register(
    "kn_bigram_nll",
    oracle="""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, p[1] AS a, p[2] AS b
      FROM (SELECT doc_id,
                   unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
            FROM tk)
    ),
    cab AS (SELECT a, b, count(*) AS cab FROM pairs GROUP BY a, b),
    ca AS (SELECT a, sum(cab) AS ca, count(*) AS n1a FROM cab GROUP BY a),
    n1bt AS (SELECT b, count(*) AS n1b FROM cab GROUP BY b),
    model AS (
      SELECT cab.a, cab.b,
             CAST(round(-ln(
               (greatest(CAST(cab AS DOUBLE) - 0.75, 0.0)
                / CAST(ca AS DOUBLE))
               + ((0.75 * CAST(n1a AS DOUBLE) / CAST(ca AS DOUBLE))
                  * (CAST(n1b AS DOUBLE)
                     / CAST((SELECT count(*) FROM cab) AS DOUBLE)))
             ) * 1e6) AS BIGINT) AS lp_q
      FROM cab JOIN ca USING (a) JOIN n1bt USING (b)
    )
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(m.lp_q) AS BIGINT) AS kn_nll_q
    FROM pairs p JOIN model m ON p.a = m.a AND p.b = m.b
    GROUP BY p.doc_id
    """,
)
def kn_bigram_nll(spark, sf_dir):
    """r15 s2, C4 growth: interpolated KNESER-NEY bigram LM scoring
    (Kneser & Ney 1995; Chen & Goodman 1999, D = 0.75) — the published
    smoothing behind the KenLM scorer CCNet actually ships, completing
    the LM-scoring family next to the add-k unigram/bigram baselines.
    The model fits on the corpus itself (continuation counts N1+(.b),
    context fan-outs N1+(a.), one absolute discount) and every
    per-bigram log-probability quantizes to integer micro-nats from
    ONE canonical expression text evaluated verbatim by BOTH engines
    (operators/kn_lm.py::KN_LOGPROB_Q_EXPR), so each document's score
    is an order-independent exact integer sum. The DuckDB oracle
    recomputes the entire model — counts, continuation statistics,
    discounted probabilities — from the raw parquet.

    Scale (see operators/kn_lm.py): bigram counts are one map-side-
    combinable groupBy over the Zipf-bounded pair space; every other
    statistic reduces from the TYPE table; the only driver value is
    the one N1+(..) scalar; the attach is a hash join and the per-doc
    reduce one groupBy."""
    from postgre_to_clickhouse_spark.operators.kn_lm import (
        kneser_ney_bigram_scores,
    )

    d = _t(spark, sf_dir, "documents")
    return kneser_ney_bigram_scores(
        d, text_col="text", id_col="doc_id", discount=0.75
    ).select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        "kn_nll_q",
    )


def _qclf_auc_oracle() -> str:
    """The classifier model (same CTEs), held-out scores, then the
    exact rank-identity AUC with tie-averaged ranks — the
    `auc_purchase_score` oracle shape over the classifier's integer
    scores."""
    pos = ", ".join(f"'{s}'" for s in _QCLF_POS)
    neg = ", ".join(f"'{s}'" for s in _QCLF_NEG)
    epos = ", ".join(f"'{s}'" for s in _QCLF_EVAL_POS)
    eneg = ", ".join(f"'{s}'" for s in _QCLF_EVAL_NEG)
    return f"""
    WITH w AS (
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, source, unnest(list_concat(toks,
            CASE WHEN len(toks) >= 2
                 THEN list_transform(range(len(toks) - 1),
                      i -> toks[i + 1] || '_' || toks[i + 2])
                 ELSE CAST([] AS VARCHAR[]) END)) AS gram
      FROM w
    ),
    b AS (
      SELECT doc_id, source, ({_horner_int("qclf-v1", "gram")}) % 1024 AS b
      FROM g
    ),
    posc AS (SELECT b, count(*) AS c FROM b
             WHERE source IN ({pos}) GROUP BY b),
    negc AS (SELECT b, count(*) AS c FROM b
             WHERE source IN ({neg}) GROUP BY b),
    tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM posc) AS tp_,
                   (SELECT coalesce(sum(c), 0) FROM negc) AS tn_,
                   (SELECT count(*) FROM documents
                    WHERE source IN ({pos})) AS np_,
                   (SELECT count(*) FROM documents
                    WHERE source IN ({neg})) AS nn_),
    lw AS (
      SELECT bb.b,
             CAST(round((ln((coalesce(posc.c, 0) + 1.0)
                             / (tot.tp_ + 1024.0))
                       - ln((coalesce(negc.c, 0) + 1.0)
                             / (tot.tn_ + 1024.0))) * 1e6)
                  AS BIGINT) AS wq
      FROM (SELECT DISTINCT b FROM b) bb
      LEFT JOIN posc ON bb.b = posc.b
      LEFT JOIN negc ON bb.b = negc.b, tot
    ),
    bias AS (
      SELECT CAST(round((ln(CAST(np_ AS DOUBLE))
                       - ln(CAST(nn_ AS DOUBLE))) * 1e6) AS BIGINT) AS bq
      FROM tot
    ),
    sc AS (
      SELECT b.doc_id, SUM(lw.wq) AS s
      FROM b JOIN lw ON b.b = lw.b
      WHERE b.source IN ({epos}, {eneg})
      GROUP BY b.doc_id
    ),
    scored AS (
      SELECT CASE WHEN d.source IN ({epos}) THEN 1 ELSE 0 END AS y,
             coalesce(sc.s, 0) + bias.bq AS score
      FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id, bias
      WHERE d.source IN ({epos}, {eneg})
    ),
    r AS (
      SELECT y,
             RANK() OVER (ORDER BY score) AS rk,
             COUNT(*) OVER (PARTITION BY score) AS c
      FROM scored
    ),
    agg AS (
      SELECT SUM(y) AS np,
             SUM(1 - y) AS nn,
             SUM(CASE WHEN y = 1 THEN rk + (c - 1) / 2.0 ELSE 0 END) AS rp
      FROM r
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           (rp - np * (np + 1) / 2.0) / (CAST(np AS DOUBLE) * nn) AS auc
    FROM agg
    """


@register("quality_classifier_auc", oracle=_qclf_auc_oracle())
def quality_classifier_auc(spark, sf_dir):
    """r15 s2: the THRESHOLD-FREE companion to
    ``quality_classifier_eval`` — the ROC AUC of the classifier's
    integer score over the held-out labeled slices, via the exact
    rank identity AUC = (R+ − n+(n+1)/2) / (n+ · n−) with
    tie-averaged ranks (the `auc_purchase_score` / CH ``arrayAUC``
    machinery, `operators/ranks.py`). Scores are exact integers, tie
    ranks exact half-integers, so the AUC is one bit-exact division.

    Scale: the fit is bounded as before; ranks come from the
    distinct-score-bounded two-phase prefix sum; one scan of the
    held-out slice."""
    from postgre_to_clickhouse_spark.operators.quality_clf import (
        quality_classifier_select,
    )
    from postgre_to_clickhouse_spark.operators.ranks import (
        tie_averaged_ranks,
    )

    d = _t(spark, sf_dir, "documents")
    eval_df = d.filter(
        F.col("source").isin(*(_QCLF_EVAL_POS + _QCLF_EVAL_NEG)))
    scored = quality_classifier_select(
        eval_df,
        d.filter(F.col("source").isin(*_QCLF_POS)),
        d.filter(F.col("source").isin(*_QCLF_NEG)),
        n_buckets=1024,
        seed="qclf-v1",
    ).select(
        F.when(F.col("source").isin(*_QCLF_EVAL_POS), 1)
        .otherwise(0).alias("y"),
        F.col("qclf_score_q").alias("score"),
    )
    vc = scored.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    ranked = tie_averaged_ranks(vc, "score", "c")
    rows = scored.join(F.broadcast(ranked.select("score", "avg_rank")),
                       "score")
    agg = rows.agg(
        F.sum("y").alias("np"),
        F.sum(1 - F.col("y")).alias("nn"),
        F.sum(F.when(F.col("y") == 1, F.col("avg_rank"))
              .otherwise(0.0)).alias("rp"),
    )
    return agg.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        (
            (F.col("rp") - F.col("np") * (F.col("np") + 1) / F.lit(2.0))
            / (F.col("np").cast("double") * F.col("nn"))
        ).alias("auc"),
    )
