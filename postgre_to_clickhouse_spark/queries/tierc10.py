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
    # r16: spreading the raw side before the map-only scoring pass was
    # A/B-measured a WASH (OFF 2.17-2.46 s vs ON 2.26-2.65 s warm,
    # alternating same-session): the 1.07 s single-task score map is
    # bought back by the text exchange + extra stage it costs. Left
    # unspread; the zero-exchange scoring plan gate stays literal.
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


def _lang_structs(col: str) -> str:
    """The lang-id argmax struct list over an arbitrary text column —
    generated from the SAME ``_LANG_MARKERS`` table as the operator
    (the `_lang_id_oracle` construction, parameterized)."""
    from postgre_to_clickhouse_spark.operators import text as X

    structs = []
    for i, (lang, words) in enumerate(sorted(X._LANG_MARKERS.items())):
        if not words:
            continue
        pat = " (" + "|".join(words) + ") "
        structs.append(
            f"{{'score': len(regexp_extract_all(' ' || lower({col}) "
            f"|| ' ', '{pat}')), 'nb': {-i}, 'lang': '{lang}'}}"
        )
    return "[" + ", ".join(structs) + "]"


def _ccnet_oracle() -> str:
    """The WHOLE CCNet pipeline closed-form in DuckDB: global
    paragraph keep-first dedup (the `line_dedup_corpus` CTEs), lang-id
    argmax over the CLEANED text (the `_lang_id_oracle` construction),
    unigram-LM perplexity + per-predicted-language ntile(3) buckets
    over the cleaned text (the `ccnet_perplexity_buckets` CTEs), and
    the NB-log-odds classifier fit on the RAW labeled slices scoring
    the cleaned text (the `_qclf_oracle` CTEs) — composed exactly as
    the Spark pipeline composes the operators.

    The lw bucket span is raw grams UNION cleaned-text grams:
    paragraph dedup manufactures NEW line-boundary bigrams whose
    buckets may appear in NO raw document, and the dense python-side
    vector scores those with the smoothed weight too (surfaced at
    sf0.01 — sf0.001 has no such bucket). NB: the registry collapses
    this SQL to one line, so no `--` comments in the text."""
    pos = ", ".join(f"'{s}'" for s in _QCLF_POS)
    neg = ", ".join(f"'{s}'" for s in _QCLF_NEG)
    return f"""
    WITH lined AS (
      SELECT doc_id,
             regexp_replace(text, ' (batch|join) ', chr(10), 'g') AS t
      FROM documents
    ),
    occ AS (
      SELECT doc_id, i - 1 AS idx, l[i] AS line
      FROM (SELECT doc_id, string_split(t, chr(10)) AS l FROM lined),
           LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i)
    ),
    keepf AS (
      SELECT line, count(*) AS cnt,
             min(struct_pack(i := doc_id, x := idx)) AS kk
      FROM occ GROUP BY line
    ),
    marked AS (
      SELECT o.doc_id, o.idx, o.line,
             (k.cnt = 1 OR (k.kk.i = o.doc_id AND k.kk.x = o.idx)) AS kp
      FROM occ o JOIN keepf k USING (line)
    ),
    cleaned AS (
      SELECT doc_id,
             CAST(count(CASE WHEN kp THEN 1 END) AS BIGINT) AS kept_lines,
             CAST(count(CASE WHEN NOT kp THEN 1 END) AS BIGINT)
               AS removed_lines,
             coalesce(array_to_string(list(line ORDER BY idx)
                      FILTER (WHERE kp), ' | '), '') AS ct
      FROM marked GROUP BY doc_id
    ),
    li AS (
      SELECT doc_id, kept_lines, removed_lines, ct,
             CASE WHEN len(regexp_extract_all(ct, '[一-鿿]')) > 0
                    THEN 'zh'
                  WHEN best.score > 0 THEN best.lang
                  ELSE 'und' END AS pred_lang
      FROM (SELECT *, list_reverse_sort({_lang_structs("ct")})[1] AS best
            FROM cleaned)
    ),
    ctoks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(ct), '[a-z0-9]+'))
             AS tok
      FROM li
    ),
    vcounts AS (SELECT tok, count(*) AS c FROM ctoks GROUP BY tok),
    vtot AS (SELECT count(*) AS total FROM ctoks),
    nll AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(round(-ln(CAST(c.c AS DOUBLE)
                  / CAST((SELECT total FROM vtot) AS DOUBLE)) * 1e6)
                  AS BIGINT)) AS BIGINT) AS nll_q
      FROM ctoks t JOIN vcounts c USING (tok) GROUP BY t.doc_id
    ),
    tw AS (
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ),
    tg AS (
      SELECT doc_id, source, unnest(list_concat(toks,
            CASE WHEN len(toks) >= 2
                 THEN list_transform(range(len(toks) - 1),
                      i -> toks[i + 1] || '_' || toks[i + 2])
                 ELSE CAST([] AS VARCHAR[]) END)) AS gram
      FROM tw
    ),
    tb AS (
      SELECT doc_id, source, ({_horner_int("qclf-v1", "gram")}) % 1024
             AS b
      FROM tg
    ),
    posc AS (SELECT b, count(*) AS c FROM tb
             WHERE source IN ({pos}) GROUP BY b),
    negc AS (SELECT b, count(*) AS c FROM tb
             WHERE source IN ({neg}) GROUP BY b),
    ctot AS (SELECT (SELECT coalesce(sum(c), 0) FROM posc) AS tp_,
                    (SELECT coalesce(sum(c), 0) FROM negc) AS tn_,
                    (SELECT count(*) FROM documents
                     WHERE source IN ({pos})) AS np_,
                    (SELECT count(*) FROM documents
                     WHERE source IN ({neg})) AS nn_),
    cg AS (
      SELECT doc_id, unnest(list_concat(toks,
            CASE WHEN len(toks) >= 2
                 THEN list_transform(range(len(toks) - 1),
                      i -> toks[i + 1] || '_' || toks[i + 2])
                 ELSE CAST([] AS VARCHAR[]) END)) AS gram
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(ct), '[a-z0-9]+') AS toks
            FROM li)
    ),
    cb AS (SELECT doc_id, ({_horner_int("qclf-v1", "gram")}) % 1024 AS b
           FROM cg),
    lw AS (
      SELECT bb.b,
             CAST(round((ln((coalesce(posc.c, 0) + 1.0)
                             / (ctot.tp_ + 1024.0))
                       - ln((coalesce(negc.c, 0) + 1.0)
                             / (ctot.tn_ + 1024.0))) * 1e6)
                  AS BIGINT) AS wq
      FROM (SELECT b FROM tb UNION SELECT b FROM cb) bb
      LEFT JOIN posc ON bb.b = posc.b
      LEFT JOIN negc ON bb.b = negc.b, ctot
    ),
    bias AS (
      SELECT CAST(round((ln(CAST(np_ AS DOUBLE))
                       - ln(CAST(nn_ AS DOUBLE))) * 1e6) AS BIGINT) AS bq
      FROM ctot
    ),
    sc AS (SELECT cb.doc_id, SUM(lw.wq) AS s
           FROM cb JOIN lw ON cb.b = lw.b GROUP BY cb.doc_id),
    assembled AS (
      SELECT li.doc_id, li.pred_lang, li.kept_lines, li.removed_lines,
             nll.n_tokens, nll.nll_q,
             CASE ntile(3) OVER (PARTITION BY li.pred_lang
                                 ORDER BY CAST(nll.nll_q AS DOUBLE)
                                          / CAST(nll.n_tokens AS DOUBLE),
                                          li.doc_id)
               WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
             END AS ppl_bucket,
             CAST(coalesce(sc.s, 0) + bias.bq AS BIGINT) AS qclf_score_q,
             CAST(CASE WHEN coalesce(sc.s, 0) + bias.bq > 0
                  THEN 1 ELSE 0 END AS INT) AS qclf_keep
      FROM li JOIN nll USING (doc_id)
           LEFT JOIN sc USING (doc_id), bias
    )
    SELECT doc_id, pred_lang, kept_lines, removed_lines, n_tokens,
           nll_q, ppl_bucket, qclf_score_q, qclf_keep,
           CAST(CASE WHEN ppl_bucket <> 'tail' AND qclf_keep = 1
                THEN 1 ELSE 0 END AS INT) AS ccnet_keep
    FROM assembled
    """


@register("ccnet_pipeline_documents", oracle=_ccnet_oracle())
def ccnet_pipeline_documents(spark, sf_dir):
    """r16 (VERDICT r15 #2): the FULL CCNet pipeline composed
    end-to-end (Wenzek et al. 2020, arXiv:1911.00359 Fig. 1 — dedup →
    lang-id → LM bucketing → classifier filter) as ONE driver query,
    the Tier-C analogue of `cdc_wire_terminal_pipeline`: the proof the
    stages INTEROPERATE, not just exist.

    1. **Paragraph dedup** — global keep-first line dedup
       (`text_clean.line_dedup_keep_first`, the `line_dedup_corpus`
       machinery incl. its deterministic line-break rewrite).
    2. **Lang-id** — the stopword-argmax heuristic over the CLEANED
       text (`text.lang_id`).
    3. **LM bucketing** — unigram-LM NLL over the cleaned text with
       the repo's integer micro-nat discipline (per-TOKEN-TYPE
       quantized −ln p, per-doc EXACT integer sums — a float avg()
       here is summation-order-dependent and flaked a driver sim at a
       round-6 boundary before this quantization), then ntile(3) per
       PREDICTED language ordered by the bit-exact integer-ratio mean
       → head/middle/tail (`ccnet_perplexity_buckets` mechanics; docs
       whose cleaned text has no tokens drop out, CCNet drops empty
       docs too).
    4. **Classifier filter** — the NB-log-odds quality classifier fit
       on the RAW labeled slices ({src0,src1} vs {src2,src3}),
       scoring the cleaned text map-only (`quality_clf`).

    ``ccnet_keep`` = not-tail AND classifier-keep — the paper's
    "head+middle, classifier-positive" retention rule. The DuckDB
    oracle recomputes every stage closed-form over the same parquet.

    Scale: no new shape — each stage is the already-measured operator
    (dedup: two bounded-width shuffles; lang-id/classifier scoring:
    map-only; LM: vocab-bounded shuffles; bucketing: one per-language
    window, two-pass percentile cut at 100 TB per the
    `ccnet_perplexity_buckets` note); the composite chains them
    without adding exchanges between stages beyond the per-doc joins
    on doc_id."""
    from pyspark.sql import Window

    from postgre_to_clickhouse_spark.operators import text as X
    from postgre_to_clickhouse_spark.operators.quality_clf import (
        quality_classifier_select,
    )
    from postgre_to_clickhouse_spark.operators.text_clean import (
        line_dedup_keep_first,
    )

    d = _t(spark, sf_dir, "documents")
    # r16: a head spread was A/B-measured at 3.15-3.84 s vs 2.60-3.31 s
    # WITHOUT it (alternating, same session) — the head maps are cheap
    # per row and the line-dedup shuffle re-distributes right after, so
    # the extra exchange only costs (the batch-3 spread rule).
    lined = d.select(
        "doc_id",
        F.regexp_replace("text", r" (batch|join) ", "\n").alias("t"),
    )
    cleaned = line_dedup_keep_first(lined, text_col="t",
                                    id_col="doc_id").select(
        "doc_id", "kept_lines", "removed_lines", "cleaned_text")
    li = X.lang_id(cleaned, text_col="cleaned_text")
    # unigram LM with per-token-TYPE integer micro-nat quantization
    # (the `unigram_lm_scores` construction, sums exact — see class
    # docstring): one canonical expression text on both engines
    toks = li.select(
        "doc_id",
        F.explode(F.filter(
            F.split(F.lower("cleaned_text"), r"[^a-z0-9]+"),
            lambda t: t != "")).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    lm = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .withColumn("lp_q", F.expr(
            "CAST(round(-ln(CAST(c AS DOUBLE) / CAST(total AS DOUBLE))"
            " * 1e6) AS BIGINT)"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.sum("lp_q").cast("bigint").alias("nll_q"))
    )
    scored = quality_classifier_select(
        li,
        d.filter(F.col("source").isin(*_QCLF_POS))
        .select(F.col("text").alias("cleaned_text")),
        d.filter(F.col("source").isin(*_QCLF_NEG))
        .select(F.col("text").alias("cleaned_text")),
        text_col="cleaned_text",
        n_buckets=1024,
        seed="qclf-v1",
    )
    j = scored.join(lm.select("doc_id", "n_tokens", "nll_q"), "doc_id")
    mean = (F.col("nll_q").cast("double")
            / F.col("n_tokens").cast("double"))
    w = Window.partitionBy("pred_lang").orderBy(
        mean.asc(), F.col("doc_id").asc())
    bucket = F.element_at(
        F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
        F.ntile(3).over(w))
    out = j.select(
        "doc_id",
        "pred_lang",
        F.col("kept_lines").cast("bigint").alias("kept_lines"),
        F.col("removed_lines").cast("bigint").alias("removed_lines"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "nll_q",
        bucket.alias("ppl_bucket"),
        F.col("qclf_score_q").cast("bigint").alias("qclf_score_q"),
        F.col("qclf_keep").cast("int").alias("qclf_keep"),
    )
    return out.withColumn(
        "ccnet_keep",
        ((F.col("ppl_bucket") != "tail") & (F.col("qclf_keep") == 1))
        .cast("int"),
    )


def _kn3_oracle() -> str:
    """The ENTIRE modified-KN trigram estimator, closed-form in
    DuckDB: trigram/adjusted-count tables, count-of-counts, the Chen
    & Goodman three-discount closed form at both levels (the same
    left-associated op sequence the python fit runs, so the doubles
    are bit-equal), and the per-type log-probability from the SAME
    canonical expression text the Spark plan evaluates
    (operators/kn_lm.py::KN_MOD_LOGPROB_Q_EXPR, formatted here with
    column references instead of literals — identical arithmetic
    structure, identical values)."""
    from postgre_to_clickhouse_spark.operators.kn_lm import (
        KN_MOD_LOGPROB_Q_EXPR,
    )

    lp = KN_MOD_LOGPROB_Q_EXPR.format(
        t1="td.t1", t2="td.t2", t3="td.t3",
        b1="bd.b1", b2="bd.b2", b3="bd.b3", U="uu.nbt",
    )
    return f"""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
      FROM documents
    ),
    tri AS (
      SELECT doc_id, p[1] AS a, p[2] AS b, p[3] AS c
      FROM (SELECT doc_id,
                   unnest(list_zip(l[1:len(l)-2], l[2:len(l)-1],
                                   l[3:len(l)])) AS p
            FROM tk)
    ),
    t3 AS (SELECT a, b, c, count(*) AS c3 FROM tri GROUP BY a, b, c),
    coc3 AS (SELECT
        sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS n1,
        sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS n2,
        sum(CASE WHEN c3 = 3 THEN 1 ELSE 0 END) AS n3,
        sum(CASE WHEN c3 = 4 THEN 1 ELSE 0 END) AS n4 FROM t3),
    tdy AS (SELECT CASE WHEN n1 > 0 THEN CAST(n1 AS DOUBLE)
                   / CAST(n1 + 2 * n2 AS DOUBLE) END AS y,
                   n1, n2, n3, n4 FROM coc3),
    tdc AS (SELECT
        CASE WHEN n1 > 0 AND n2 > 0 AND n3 > 0 THEN
          1.0 - 2.0 * y * (CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE))
        END AS c1,
        CASE WHEN n1 > 0 AND n2 > 0 AND n3 > 0 THEN
          2.0 - 3.0 * y * (CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE))
        END AS c2,
        CASE WHEN n1 > 0 AND n2 > 0 AND n3 > 0 THEN
          3.0 - 4.0 * y * (CAST(n4 AS DOUBLE) / CAST(n3 AS DOUBLE))
        END AS c3
      FROM tdy),
    td AS (SELECT
        CASE WHEN c1 >= 0.0 AND c1 <= 1.0 AND c2 >= 0.0 AND c2 <= 2.0
                  AND c3 >= 0.0 AND c3 <= 3.0
             THEN c1 ELSE 0.5 END AS t1,
        CASE WHEN c1 >= 0.0 AND c1 <= 1.0 AND c2 >= 0.0 AND c2 <= 2.0
                  AND c3 >= 0.0 AND c3 <= 3.0
             THEN c2 ELSE 1.0 END AS t2,
        CASE WHEN c1 >= 0.0 AND c1 <= 1.0 AND c2 >= 0.0 AND c2 <= 2.0
                  AND c3 >= 0.0 AND c3 <= 3.0
             THEN c3 ELSE 1.5 END AS t3
      FROM tdc),
    ctx2 AS (SELECT a, b, sum(c3) AS ctx,
        sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS f1,
        sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS f2,
        sum(CASE WHEN c3 >= 3 THEN 1 ELSE 0 END) AS f3
      FROM t3 GROUP BY a, b),
    a2 AS (SELECT b, c, count(*) AS ac FROM t3 GROUP BY b, c),
    coc2 AS (SELECT
        sum(CASE WHEN ac = 1 THEN 1 ELSE 0 END) AS n1,
        sum(CASE WHEN ac = 2 THEN 1 ELSE 0 END) AS n2,
        sum(CASE WHEN ac = 3 THEN 1 ELSE 0 END) AS n3,
        sum(CASE WHEN ac = 4 THEN 1 ELSE 0 END) AS n4 FROM a2),
    bdy AS (SELECT CASE WHEN n1 > 0 THEN CAST(n1 AS DOUBLE)
                   / CAST(n1 + 2 * n2 AS DOUBLE) END AS y,
                   n1, n2, n3, n4 FROM coc2),
    bdc AS (SELECT
        CASE WHEN n1 > 0 AND n2 > 0 AND n3 > 0 THEN
          1.0 - 2.0 * y * (CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE))
        END AS c1,
        CASE WHEN n1 > 0 AND n2 > 0 AND n3 > 0 THEN
          2.0 - 3.0 * y * (CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE))
        END AS c2,
        CASE WHEN n1 > 0 AND n2 > 0 AND n3 > 0 THEN
          3.0 - 4.0 * y * (CAST(n4 AS DOUBLE) / CAST(n3 AS DOUBLE))
        END AS c3
      FROM bdy),
    bd AS (SELECT
        CASE WHEN c1 >= 0.0 AND c1 <= 1.0 AND c2 >= 0.0 AND c2 <= 2.0
                  AND c3 >= 0.0 AND c3 <= 3.0
             THEN c1 ELSE 0.5 END AS b1,
        CASE WHEN c1 >= 0.0 AND c1 <= 1.0 AND c2 >= 0.0 AND c2 <= 2.0
                  AND c3 >= 0.0 AND c3 <= 3.0
             THEN c2 ELSE 1.0 END AS b2,
        CASE WHEN c1 >= 0.0 AND c1 <= 1.0 AND c2 >= 0.0 AND c2 <= 2.0
                  AND c3 >= 0.0 AND c3 <= 3.0
             THEN c3 ELSE 1.5 END AS b3
      FROM bdc),
    bctx AS (SELECT b, sum(ac) AS bctx,
        sum(CASE WHEN ac = 1 THEN 1 ELSE 0 END) AS g1,
        sum(CASE WHEN ac = 2 THEN 1 ELSE 0 END) AS g2,
        sum(CASE WHEN ac >= 3 THEN 1 ELSE 0 END) AS g3
      FROM a2 GROUP BY b),
    u1 AS (SELECT c, count(*) AS u FROM a2 GROUP BY c),
    uu AS (SELECT count(*) AS nbt FROM a2),
    model AS (
      SELECT t3.a, t3.b, t3.c, {lp} AS lp_q
      FROM t3 JOIN ctx2 USING (a, b) JOIN a2 USING (b, c)
           JOIN bctx USING (b) JOIN u1 USING (c), td, bd, uu
    )
    SELECT tri.doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(m.lp_q) AS BIGINT) AS kn3_nll_q
    FROM tri JOIN model m
      ON tri.a = m.a AND tri.b = m.b AND tri.c = m.c
    GROUP BY tri.doc_id
    """


@register("kn_trigram_nll", oracle=_kn3_oracle())
def kn_trigram_nll(spark, sf_dir):
    """r16 (VERDICT r15 #3): MODIFIED Kneser-Ney, trigram order — the
    Chen & Goodman (1999) three-discount estimator (D1/D2/D3+ from the
    count-of-counts closed form) applied at BOTH n-gram levels with
    continuation (adjusted) counts at the middle order: exactly
    KenLM's estimator (the scorer CCNet ships, arXiv:1911.00359 §4.3)
    restricted to order 3 over a closed continuation vocabulary.
    Every per-trigram log-probability quantizes to integer micro-nats
    from ONE canonical expression text evaluated by BOTH engines
    (operators/kn_lm.py::KN_MOD_LOGPROB_Q_EXPR), with the discounts
    computed by the identical left-associated double sequence (python
    fit / DuckDB CTE), so each document's NLL is an order-independent
    exact integer sum. The oracle recomputes the WHOLE estimator from
    the raw parquet — including the per-level FALLBACK: when a level's
    count-of-counts makes the closed form undefined or out-of-range
    (the repetitive sf0.1 synthetic corpus collapses the singleton
    tail and does exactly this), the level falls back to KenLM's
    documented --discount_fallback defaults (0.5/1.0/1.5), mirrored
    by the same validity CASE in both engines.

    Scale (see operators/kn_lm.py): trigram counts are one map-side-
    combinable groupBy over the Zipf-bounded triple space; all other
    statistics reduce from TYPE tables; the driver sees two 4-integer
    count-of-counts rows and one scalar; the attach is a hash join
    and the per-doc reduce one groupBy."""
    from postgre_to_clickhouse_spark.operators.kn_lm import (
        kn_modified_trigram_scores,
    )

    d = _t(spark, sf_dir, "documents")
    return kn_modified_trigram_scores(
        d, text_col="text", id_col="doc_id", discount_fallback=True
    ).select(
        "doc_id",
        F.col("n_trigrams").cast("bigint").alias("n_trigrams"),
        "kn3_nll_q",
    )


@register(
    "min_k_prob_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ),
    counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT count(*) AS total FROM toks),
    lp AS (
      SELECT t.doc_id,
             CAST(round(-ln(CAST(c.c AS DOUBLE)
                  / CAST((SELECT total FROM tot) AS DOUBLE)) * 1e6)
                  AS BIGINT) AS lp_q
      FROM toks t JOIN counts c USING (tok)
    ),
    per AS (
      SELECT doc_id, count(*) AS n_tokens,
             list_sort(list(lp_q), 'DESC') AS ls
      FROM lp GROUP BY doc_id
    ),
    kk AS (
      SELECT doc_id, n_tokens,
             greatest(CAST(1 AS BIGINT),
                      CAST(ceil(CAST(n_tokens AS DOUBLE) * 0.2)
                           AS BIGINT)) AS k_tokens,
             ls
      FROM per
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           k_tokens,
           CAST(list_aggregate(ls[1:k_tokens], 'sum') AS BIGINT)
             AS mink_nll_q,
           CAST(list_aggregate(ls[1:k_tokens], 'sum') AS DOUBLE)
             / CAST(k_tokens AS DOUBLE) AS mink_mean_nll
    FROM kk
    """,
)
def min_k_prob_documents(spark, sf_dir):
    """r16, C4 growth: MIN-K% PROB (Shi et al. 2023, "Detecting
    Pretraining Data from Large Language Models", arXiv:2310.16789) —
    per document, the mean NLL of its 20% least-probable tokens under
    the corpus LM: the published membership-inference /
    contamination-audit signal (a memorized document has no
    low-probability outlier tokens, so its Min-K% score is
    anomalously low). The LM is the corpus unigram model with the
    repo's per-TYPE integer micro-nat quantization, so the top-k sum
    is an exact order-independent integer (sort ties cannot change an
    integer sum) and the mean is one bit-exact division; k's ceil
    runs on DOUBLE in both engines (DuckDB would otherwise evaluate
    0.2 as DECIMAL and round the 5-multiple boundaries differently).

    Scale (see operators/text.py::min_k_nll_scores): vocab-bounded
    shuffles; per-doc state = the document's own token list, the
    bound every per-doc text op carries."""
    from postgre_to_clickhouse_spark.operators.text import (
        min_k_nll_scores,
    )

    d = _t(spark, sf_dir, "documents")
    return min_k_nll_scores(d, text_col="text", id_col="doc_id",
                            k_frac=0.2)


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


@register(
    "zipf_law_fit",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ),
    tf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    top_ AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r
      FROM tf
    ),
    q AS (
      SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS xq,
             CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS yq
      FROM top_ WHERE r <= 1000
    ),
    a AS (
      SELECT count(*) AS n,
             CAST(sum(xq) AS DOUBLE) AS sx,
             CAST(sum(yq) AS DOUBLE) AS sy,
             CAST(sum(xq * xq) AS DOUBLE) AS sxx,
             CAST(sum(xq * yq) AS DOUBLE) AS sxy,
             CAST(sum(yq * yq) AS DOUBLE) AS syy
      FROM q
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           CASE WHEN (n * sxx - sx * sx) > 0 THEN
             ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           END AS zipf_slope,
           CASE WHEN (n * sxx - sx * sx) > 0 THEN
             ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                   / n / 1e6, 6)
           END AS zipf_intercept,
           CASE WHEN ((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0 THEN
             ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                   / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           END AS zipf_r2
    FROM a
    """,
)
def zipf_law_fit(spark, sf_dir):
    """r16 s2, C4 growth: ZIPF RANK-FREQUENCY FIT (Zipf 1949) — OLS of
    ln(term frequency) on ln(rank) over the corpus's top-1000 terms,
    returning (n_terms, slope, intercept, r²). The one-look
    corpus-health audit: natural text sits near slope -1 / r² ≈ 1,
    while boilerplate- or template-dominated corpora bend the line —
    the cheap companion signal to the Gopher/C4 per-document filters
    (a per-CORPUS statistic, where everything else in the tier is
    per-document).

    Cross-engine exactness: both engines quantize ln(rank)/ln(count)
    to integer micro-nats, so the five OLS moments are exact integer
    sums; slope/intercept/r² re-derive every subexpression in the
    same literal operand order on DOUBLE casts (the
    `simple_linreg_events` discipline), so the division is the only
    inexact step and runs on identical operands.

    Scale (see operators/text.py::zipf_fit): vocab agg with map-side
    partials, TakeOrdered top-1000, constant-size window + fold."""
    from postgre_to_clickhouse_spark.operators.text import zipf_fit

    d = _t(spark, sf_dir, "documents")
    return zipf_fit(d, text_col="text", top_n=1000)


@register(
    "heaps_law_fit",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(doc_id) AS BIGINT) AS lo,
             CAST(max(doc_id) AS BIGINT) AS hi
      FROM documents WHERE doc_id IS NOT NULL
    ),
    toks AS (
      SELECT CAST(doc_id AS BIGINT) AS d,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents WHERE doc_id IS NOT NULL
    ),
    tb AS (
      SELECT t.term,
             CAST((t.d - b.lo) // ((b.hi - b.lo) // 64 + 1) AS BIGINT)
               AS bkt
      FROM toks t, bounds b
    ),
    tok_b AS (SELECT bkt, count(*) AS ntok FROM tb GROUP BY bkt),
    new_b AS (
      SELECT bkt, count(*) AS nnew FROM (
        SELECT term, min(bkt) AS bkt FROM tb GROUP BY term
      ) GROUP BY bkt
    ),
    cum AS (
      SELECT SUM(tok_b.ntok) OVER (ORDER BY tok_b.bkt) AS n_cum,
             SUM(coalesce(new_b.nnew, 0)) OVER (ORDER BY tok_b.bkt)
               AS v_cum
      FROM tok_b LEFT JOIN new_b ON tok_b.bkt = new_b.bkt
    ),
    q AS (
      SELECT CAST(round(ln(CAST(n_cum AS DOUBLE)) * 1e6) AS BIGINT)
               AS xq,
             CAST(round(ln(CAST(v_cum AS DOUBLE)) * 1e6) AS BIGINT)
               AS yq
      FROM cum WHERE n_cum > 0 AND v_cum > 0
    ),
    a AS (
      SELECT count(*) AS n,
             CAST(sum(xq) AS DOUBLE) AS sx,
             CAST(sum(yq) AS DOUBLE) AS sy,
             CAST(sum(xq * xq) AS DOUBLE) AS sxx,
             CAST(sum(xq * yq) AS DOUBLE) AS sxy,
             CAST(sum(yq * yq) AS DOUBLE) AS syy
      FROM q
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           CASE WHEN (n * sxx - sx * sx) > 0 THEN
             ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           END AS heaps_beta,
           CASE WHEN (n * sxx - sx * sx) > 0 THEN
             ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                   / n / 1e6, 6)
           END AS heaps_intercept,
           CASE WHEN ((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0 THEN
             ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                   / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           END AS heaps_r2
    FROM a
    """,
)
def heaps_law_fit(spark, sf_dir):
    """r16 s2, C4 growth: HEAPS'-LAW FIT (Heaps 1978; Herdan 1960) —
    OLS of ln(cumulative vocabulary) on ln(cumulative tokens) over 64
    ranged corpus prefixes, returning (n_points, β, intercept, r²).
    The vocabulary-GROWTH exponent is the companion number to
    `zipf_law_fit`'s rank-frequency slope: natural text grows V ≈
    K·N^β with β ≈ 0.4-0.6; a closed-vocabulary/template corpus
    flattens to β ≈ 0 and an identifier-polluted scrape pushes β
    toward 1. Together they are the standard two-number corpus-health
    readout a pretraining pipeline runs beside its per-document
    filters.

    Cross-engine exactness: the prefix points are exact integer
    (token, vocab) counts; both engines quantize their lns to integer
    micro-nats and close the fit with the shared fixed-literal-order
    OLS (the `simple_linreg_events` discipline), Cauchy-Schwarz
    guards returning NULL on unfittable corpora.

    Scale (see operators/text.py::heaps_fit): the only
    data-proportional exchanges are the vocab-bounded term min-bucket
    aggregate and the 64-key token counts; prefix sums + fit run on a
    constant ≤ 64 rows."""
    from postgre_to_clickhouse_spark.operators.text import heaps_fit

    d = _t(spark, sf_dir, "documents")
    return heaps_fit(d, text_col="text", id_col="doc_id", n_buckets=64)


@register("tokenizer_fertility_by_lang")  # golden oracle (queries/goldens.py)
def tokenizer_fertility_by_lang(spark, sf_dir):
    """r16 s2, C4 growth: TOKENIZER FERTILITY per language (Ács 2019;
    Rust et al. 2021, "How Good is Your Tokenizer?") — subword tokens
    per word, the standard audit of how well a trained tokenizer fits
    each language slice of a corpus (fertility ≈ 1 = near-word-level;
    high fertility = the language is over-fragmented and will consume
    disproportionate sequence length at training time), with
    chars-per-token as the companion compression number.

    Composes the repo's REAL distributed BPE (train 30 merges on the
    corpus — deliberately FEWER than `bpe_tokenize_documents`'s 200,
    which fully merges the fixture's small vocabulary and would make
    every fertility exactly 1.0; at 30 the encoding is genuinely
    subword and the per-language numbers spread — Arrow-batched
    greedy encode) with exact per-doc word/char counts (single-regex JVM built-ins), then per-language exact
    integer sums and one guarded double division each. Deterministic
    end-to-end, so the exact output is committed-golden-checked like
    the other non-SQL-expressible operators.

    Scope note (review pass): both the word counter and the BPE
    share the repo-wide ``[a-z0-9]+`` tokenizer, so a language slice
    written in a NON-Latin script (real CJK/Cyrillic text rather
    than this fixture's romanized ASCII) counts zero words and zero
    tokens and answers NULL fertility — the guarded-division NULL is
    the loud signal that the audit needs a script-aware tokenizer
    for that slice, not a silently wrong ratio.

    Scale: BPE train = distributed word-frequency count + bounded
    driver merge loop; encode = one Arrow crossing; the rest is a
    doc-keyed join and a languages-bounded groupBy."""
    from postgre_to_clickhouse_spark.operators.bpe import bpe_encode, bpe_train

    d = _t(spark, sf_dir, "documents")
    merges = bpe_train(d, num_merges=30)
    enc = bpe_encode(d, merges).select("doc_id", "n_bpe_tokens")
    base = d.select(
        "doc_id",
        "lang",
        F.regexp_count(F.lower("text"), F.lit(r"[a-z0-9]+"))
        .alias("__w"),
        F.length(F.regexp_replace(F.lower("text"), r"[^a-z0-9]+", ""))
        .alias("__c"),
    )
    agg = base.join(enc, "doc_id").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__w").cast("bigint").alias("n_words"),
        F.sum("__c").cast("bigint").alias("n_chars"),
        F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
    )
    return agg.select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_words",
        "n_chars",
        "n_bpe_tokens",
        F.when(
            F.col("n_words") > 0,
            F.col("n_bpe_tokens").cast("double")
            / F.col("n_words").cast("double"),
        ).alias("fertility"),
        F.when(
            F.col("n_bpe_tokens") > 0,
            F.col("n_chars").cast("double")
            / F.col("n_bpe_tokens").cast("double"),
        ).alias("chars_per_token"),
    )


@register(
    "source_ngram_overlap_matrix",
    oracle="""
    WITH g0 AS (
      SELECT source,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(regexp_extract_all(lower(text),
                                     '[a-z0-9]+')) - 4, 0) + 1),
               i -> array_to_string(list_slice(
                      regexp_extract_all(lower(text), '[a-z0-9]+'),
                      i, i + 4), ' ')
             ))) AS gram
      FROM documents
    ),
    gs AS (SELECT DISTINCT source, gram FROM g0),
    tot AS (SELECT source, count(*) AS n_grams FROM gs GROUP BY source),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             count(*) AS n_common
      FROM gs a JOIN gs b ON a.gram = b.gram AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT p.src_a, p.src_b,
           CAST(ta.n_grams AS BIGINT) AS grams_a,
           CAST(tb.n_grams AS BIGINT) AS grams_b,
           CAST(p.n_common AS BIGINT) AS n_common,
           CAST(p.n_common AS DOUBLE)
             / CAST(ta.n_grams + tb.n_grams - p.n_common AS DOUBLE)
             AS jaccard
    FROM pairs p
    JOIN tot ta ON p.src_a = ta.source
    JOIN tot tb ON p.src_b = tb.source
    """,
)
def source_ngram_overlap_matrix(spark, sf_dir):
    """r16 s2, C4 growth: CROSS-SOURCE N-GRAM CONTAMINATION MATRIX
    (the slice-leakage audit of Dodge et al. 2021, arXiv:2104.08758,
    which measured exactly this overlap inside C4) — for every pair of
    corpus sources, the count of distinct 5-gram shingles they share
    and the exact Jaccard over their distinct-shingle sets. The
    between-SLICES companion to `decontaminate_eval_overlap` (corpus
    vs eval suite) and `ngram_jaccard_same_source` (doc vs doc):
    training mixtures are weighted per source, so undisclosed overlap
    BETWEEN sources silently double-counts data and leaks one slice's
    held-out split into another's training split.

    Cross-engine exactness: distinct-shingle counts are exact
    integers; the Jaccard is one IEEE division of exact BIGINTs
    (|a∪b| = |a|+|b|-|a∩b|), bit-identical on any engine. Pairs with
    ZERO shared shingles are absent in both engines (inner join on
    the shingle).

    Scale (see operators/dedup.py::source_overlap_matrix): lead-window
    shingles into ONE per-gram source-set aggregate (set size bounded
    by the source count — 20 here, a catalog constant); totals and
    pair counts explode from the same sets in one pass, and the
    ≤ C(n,2)+n count rows checkpoint once before the broadcast
    assembly. Nothing data-proportional reaches the driver."""
    from postgre_to_clickhouse_spark.operators.dedup import (
        source_overlap_matrix,
    )

    d = _t(spark, sf_dir, "documents")
    return source_overlap_matrix(d, text_col="text", id_col="doc_id",
                                 source_col="source", n=5)
