"""Tier C continued: IVF ANN, embedding-cosine near-dup, TF-IDF top
terms, and the sanctioned pandas-UDF demo (B19)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.queries.registry import register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


@register("vector_ivf_topk")  # learned index — golden-parquet oracle (see goldens.py)
def vector_ivf_topk(spark, sf_dir):
    """C3 scale path #2: IVF (k-means cells, probe nearest n_probe,
    exact rerank). Layout-independent deterministic fit
    (:func:`fit_ivf_centroids_deterministic`) so the result is
    bit-reproducible on any cluster size — checked against a committed
    golden parquet."""
    from postgre_to_clickhouse_spark.operators.ann import (
        assign_lists,
        fit_ivf_centroids_deterministic,
        ivf_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    cents = fit_ivf_centroids_deterministic(e, n_lists=8, seed=42)
    indexed = assign_lists(e, cents)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_topk(indexed, cents, q, k=10, n_probe=3).select("query_id", "vec_id", "cosine", "rank")


@register(
    "embedding_near_dup_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(
             list_sum(list_transform(range(1, len(a.embedding)+1),
                      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
           9) AS cosine_r
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, len(a.embedding)+1),
                   i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
          > 0.95
    """,
)
def embedding_near_dup_pairs(spark, sf_dir):
    """C2 embedding-cosine near-dup: pairs with cosine > 0.95, blocked by
    label (the blocking key stands in for an LSH bucket at scale —
    bounded pair count, never N²). JVM higher-order fns only — the
    oracle checks cosine values, so the dot stays the bit-exact
    sequential fold; the salted pair generation
    (:func:`operators.similarity.salted_block_pairs`) only fixes
    parallelism, not math. r6 profiling note: the unrolled
    ``element_at`` cosine (a win for the broadcast-probe shapes in
    ``semantic_decontaminate``) was measured 3-4× SLOWER than this
    fold in the self-join pair shape at sf0.1 (A/B in SCALE.md), so
    the fold stays; the r5→r5 +13% bench delta was run noise."""
    from postgre_to_clickhouse_spark.operators.similarity import _dot, salted_block_pairs

    e = _t(spark, sf_dir, "embeddings")
    pairs = salted_block_pairs(e, "label", "vec_id", "embedding").filter(
        F.col("id_a") < F.col("id_b")
    )
    cos = _dot("__ea", "__eb") / (F.col("__na") * F.col("__nb"))
    return pairs.select("id_a", "id_b", cos.alias("__c")).filter(F.col("__c") > 0.95).select(
        "id_a", "id_b", F.round("__c", 9).alias("cosine_r")
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term
      FROM documents
    ),
    tf AS (
      SELECT d.doc_id, t.term,
             len(list_filter(regexp_extract_all(lower(d.text), '[a-z0-9]+'), x -> x = t.term)) AS tf
      FROM documents d JOIN toks t ON d.doc_id = t.doc_id
    ),
    df_ AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df,
           round(tf * ln((SELECT n_docs FROM n) / df), 6) AS tfidf_r
    FROM (
      SELECT tf.doc_id, tf.term, tf.tf, df_.df,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * ln((SELECT n_docs FROM n) / df_.df) DESC,
                                         tf.term) AS rn
      FROM tf JOIN df_ USING (term)
    ) WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """C4: top-3 TF-IDF terms per document — explode/groupBy term counts,
    document frequency join, windowed top-k. ln() is computed on
    identical double operands in both engines and rounded to 6dp.
    Scale: two shuffles (term counts, doc top-k); df table is tiny and
    broadcast."""
    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()
    toks = d.select("doc_id", F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
        "__s", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("__s").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", F.round("__s", 6).alias("tfidf_r"))
    )


@register(
    "sessionize_events",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sid AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS s
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM sid GROUP BY user_id, s
    """,
)
def sessionize_events(spark, sf_dir):
    """Sessionization batch twin over events (30-min gap) — identical
    semantics to the streaming applyInPandasWithState operator (tested
    equivalent); one shuffle on user_id, µs-exact gap arithmetic."""
    from postgre_to_clickhouse_spark.streaming.stateful import sessionize_batch

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return sessionize_batch(ev, gap_minutes=30)


@register(
    "session_window_native",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sid AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS s
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end_padded,
           count(*) AS n_events
    FROM sid GROUP BY user_id, s
    """,
)
def session_window_native(spark, sf_dir):
    """B18: Spark's NATIVE session_window (gap-based grouping built into
    the engine; the streaming form takes a watermark). Spark defines the
    window end as last-event + gap, hence the padded alias; otherwise
    identical sessions to the custom operator (oracle = same lag/cumsum
    construction)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end_padded"),
            "n_events",
        )
    )


@register(
    "dedup_components_knn",
    oracle="""
    WITH RECURSIVE wn AS (
      SELECT vec_id, label, embedding,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (a.nrm * b.nrm) AS c
      FROM wn a JOIN wn b ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    nn AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
               row_number() OVER (PARTITION BY id_a ORDER BY c DESC, id_b) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    und AS (SELECT id_a AS u, id_b AS v FROM nn UNION SELECT id_b, id_a FROM nn),
    reach(n, m) AS (
      SELECT u, u FROM und
      UNION
      SELECT r.n, e.v FROM reach r JOIN und e ON r.m = e.u
    )
    SELECT n AS vec_id, min(m) AS component_id FROM reach GROUP BY n
    """,
)
def dedup_components_knn(spark, sf_dir):
    """Dedup-cluster resolution (C2 closure stage): build the 1-NN
    cosine graph within each label block, then resolve components with
    the iterative min-label-propagation operator
    (:mod:`operators.graph`). Oracle = DuckDB recursive-CTE transitive
    closure over the identical edge set — the converged fixpoint is
    schedule-independent, so a distributed iterative algorithm gets a
    full value-hash check. Component id = min vec_id reachable."""
    from postgre_to_clickhouse_spark.operators.graph import connected_components
    from postgre_to_clickhouse_spark.operators.similarity import block_knn

    e = _t(spark, sf_dir, "embeddings")
    nn = block_knn(
        e, block_col="label", id_col="vec_id", vec_col="embedding", k=1, dim=64
    ).select("id_a", "id_b")
    return connected_components(nn, "id_a", "id_b").select(
        F.col("node").alias("vec_id"), F.col("comp").alias("component_id")
    )


@register("pandas_udf_zscore")  # B19 demo — Arrow path, rows-only by design
def pandas_udf_zscore(spark, sf_dir):
    """B19: grouped-map pandas UDF (Arrow-batched) — per-event-type
    z-score of value. The sanctioned Python escape hatch, used only
    where JVM expressions genuinely can't express the op (here it can —
    this entry exists to exercise/benchmark the Arrow path; see plan
    test exempting non-oracle queries)."""
    ev = _t(spark, sf_dir, "events")

    def zscore(pdf):
        # sort before reducing: float sums are order-dependent, and the
        # row order a group arrives in depends on the shuffle — sorting
        # by the key makes the result bit-identical on any cluster
        # layout (required for the committed-golden oracle).
        pdf = pdf.sort_values("event_id").reset_index(drop=True)
        m, s = pdf["value"].mean(), pdf["value"].std(ddof=0) or 1.0
        pdf["z"] = (pdf["value"] - m) / s
        return pdf[["event_id", "event_type", "value", "z"]]

    return ev.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, value double, z double"
    )


@register("vector_pq_topk")  # golden oracle (queries/goldens.py)
def vector_pq_topk(spark, sf_dir):
    """C3, r6: product-quantization ANN (Jégou 2011) — m=8 subspace
    codebooks of k=16 entries (4 bytes per 64-dim vector, fit on a
    deterministic content-addressed sample), ADC search with broadcast
    per-query distance tables, per-partition top-k heaps, and a
    bounded-candidate exact rank, then exact re-rank of the 64-candidate ADC pool (the standard PQ deployment). Deterministic end-to-end →
    committed-golden oracle; recall floor vs the exact scan asserted in
    tests/test_training_ops.py."""
    from postgre_to_clickhouse_spark.operators.pq import (
        fit_pq_codebooks,
        pq_encode,
        pq_rerank,
        pq_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    books = fit_pq_codebooks(e, m=8, k=16, seed=42)
    enc = pq_encode(e, books)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pool = pq_topk(enc, books, q, k=64)
    return pq_rerank(pool, e, q, k=10)


@register("vector_ivfpq_topk")  # golden oracle (queries/goldens.py)
def vector_ivfpq_topk(spark, sf_dir):
    """C3, r6: IVF-PQ — the FAISS-style composition: coarse L2 lists
    restrict each query's scan to n_probe=3 of 8 inverted lists, ADC
    over RESIDUAL product codes scores only those rows, and the
    64-candidate pool re-ranks exactly. One deterministic bounded-
    sample fit, one map-only encode pass, one filtered Arrow scan —
    the corpus never shuffles. Golden-checked; recall floor + layout
    independence in tests."""
    from postgre_to_clickhouse_spark.operators.pq import (
        fit_ivfpq,
        ivfpq_encode,
        ivfpq_topk,
        pq_rerank,
    )

    e = _t(spark, sf_dir, "embeddings")
    coarse, books = fit_ivfpq(e, n_lists=8, m=8, k=16, seed=42)
    enc = ivfpq_encode(e, coarse, books)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pool = ivfpq_topk(enc, coarse, books, q, k=64, n_probe=3)
    return pq_rerank(pool, e, q, k=10)
