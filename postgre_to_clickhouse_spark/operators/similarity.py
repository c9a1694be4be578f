"""Vector similarity search over an ``array<float>`` embedding column
(SURVEY.md C3; fixture: ``embeddings``).

Two tiers:
- :func:`cosine_topk` — brute-force exact top-k. All JVM-side
  (``zip_with`` + ``aggregate`` higher-order functions — no Python in
  the row path). Scale: O(N·Q) dot products; right answer for one-off
  queries and the ground-truth baseline for ANN recall tests. The query
  side is broadcast, so the scan stays embarrassingly parallel (no
  shuffle until the final top-k, which is TakeOrderedAndProject).
- :func:`lsh_topk` — approximate path via random-hyperplane signatures
  (SimHash-style buckets): candidates = bucket collisions on any of
  ``n_tables`` signatures, re-ranked exactly. Scale: the candidate join
  is a hash join on (table, signature) — at 100 TB this replaces the
  full cross product with per-bucket work; recall tunes via
  bits/tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double, sequential fold → deterministic."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def _dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Σ aᵢ·bᵢ unrolled over a statically-known dimension.

    Bit-identical to :func:`_dot` (left-to-right addition, double), but
    expressed as a flat arithmetic expression over ``element_at`` calls
    — which whole-stage codegen compiles, whereas higher-order
    ``zip_with``/``aggregate`` lambdas are interpreted per element with
    boxing. ~5-10× faster in dot-product-bound stages; use whenever the
    embedding dimension is known (it always is in a real pipeline)."""
    # r16: for NAME inputs the flat sum is built as ONE SQL expression
    # string (a single parser round) instead of ~4·dim py4j Column
    # calls — the parsed tree is the identical left-associated chain of
    # CAST/multiply/add nodes, so values are bit-equal; only the
    # DRIVER-side construction cost changes (measured with simhash's
    # analogous rewrite: 1.6-2.9 s -> 0.2-0.4 s per build).
    if isinstance(a, str) and isinstance(b, str):
        t = " + ".join(
            f"(CAST(element_at(`{a}`, {i}) AS DOUBLE)"
            f" * CAST(element_at(`{b}`, {i}) AS DOUBLE))"
            for i in range(1, dim + 1)
        )
        return F.expr(t)
    acc = F.element_at(a, 1).cast("double") * F.element_at(b, 1).cast("double")
    for i in range(2, dim + 1):
        acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
    return acc


def _norm_unrolled(a: Column | str, dim: int) -> Column:
    if isinstance(a, str):  # r16: same single-parse construction as _dot_unrolled
        t = " + ".join(
            f"(CAST(element_at(`{a}`, {i}) AS DOUBLE)"
            f" * CAST(element_at(`{a}`, {i}) AS DOUBLE))"
            for i in range(1, dim + 1)
        )
        return F.expr(f"sqrt({t})")
    x = F.element_at(a, 1).cast("double")
    acc = x * x
    for i in range(2, dim + 1):
        x = F.element_at(a, i).cast("double")
        acc = acc + x * x
    return F.sqrt(acc)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force, broadcast
    queries). Output: (query_id, vec_id, cosine) with rank ≤ k,
    deterministic tiebreak on vec_id."""
    from pyspark.sql import Window

    q = F.broadcast(queries.select(query_id_col, query_vec_col))
    scored = (
        vectors.select(id_col, vec_col)
        .crossJoin(q)
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            cosine_similarity(vec_col, query_vec_col).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def mine_hard_negatives(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dup_ceiling: float = 0.95,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    query_label_col: str = "query_label",
) -> DataFrame:
    """Hard-negative mining for retrieval training (r14): per query,
    the top-``k`` HIGHEST-cosine corpus vectors that are NOT relevant
    — different ``label`` (the relevance class) — and NOT suspected
    false negatives (cosine > ``dup_ceiling`` means the pair is a
    near-duplicate mislabeled across classes; dense-retrieval pipelines
    drop these before training, the RocketQA-style denoising step).
    Output: (query_id, vec_id, cosine, rank), rank 1 = hardest.

    Scale shape: identical to :func:`cosine_topk` — the query side is
    broadcast, scoring fuses into the corpus scan, and the top-k is a
    per-query window over the scored set (at real scale the scored set
    is pre-pruned by an ANN index; this is the exact baseline the ANN
    variant must reproduce)."""
    q = F.broadcast(
        queries.select(query_id_col, query_vec_col, query_label_col)
    )
    from pyspark.sql import Window

    scored = (
        vectors.select(id_col, vec_col, label_col)
        .crossJoin(q)
        .filter(F.col(id_col) != F.col(query_id_col))
        .filter(F.col(label_col) != F.col(query_label_col))
        .select(
            query_id_col,
            id_col,
            cosine_similarity(vec_col, query_vec_col).alias("cosine"),
        )
        .filter(F.col("cosine") <= dup_ceiling)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def block_knn(
    vectors: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
    salt_buckets: int = 16,
    partitions: int | None = None,
    dim: int | None = None,
    arrow: bool = True,
) -> DataFrame:
    """Exact k-NN by cosine *within each block* (brute force per block),
    with the self-join SALTED so parallelism is ``blocks × salt_buckets``
    instead of being bounded by the number of distinct block keys.

    Why salting matters here: a blocked self-join shuffles on the block
    key, so a corpus with few blocks (10 languages, 5 sources, …) runs
    the O(B²) dot-product work on that many tasks no matter how many
    executors exist. The left side gets ``salt = xxhash64(id) % S`` and
    the right side is replicated S times, joining on (block, salt) —
    every ordered pair still appears exactly once (for the one salt that
    matches the left id's hash), but the heavy projection now spreads
    across S× more tasks. Same trick as :mod:`operators.skew`, applied
    to a self-join. The dot product stays the sequential-fold JVM
    expression, so scores are bit-identical to the unsalted plan.

    Both sides are explicitly ``repartition(P, block, salt)``-ed before
    the join: AQE sizes post-shuffle partitions by *input* bytes, and a
    blocked self-join's input is tiny relative to its O(B²/S) fan-out,
    so bytes-based coalescing would collapse the heavy dot-product
    stage back onto a handful of tasks. A user-specified partition
    count is exempt from AQE coalescing, and because it hash-partitions
    on the exact join keys the join reuses it (no extra exchange).

    Output: (id_a, id_b, cosine) with rank ≤ k per id_a, deterministic
    tiebreak on id_b. Reference behavior: block-local candidate
    generation as in dedup clustering pipelines.

    ``arrow=True`` (default) scores each (block, salt) group with ONE
    numpy matmul inside a cogrouped ``applyInPandas`` — the A-chunk of
    the salt against the whole block. This is the sanctioned Arrow
    escape hatch: a brute-force block scorer is pure BLAS, and the JVM
    expression alternatives are interpreted either way (higher-order
    ``aggregate`` lambdas by design; the unrolled ``element_at`` sum
    because a 128-term expression falls out of whole-stage codegen).
    Measured ~5× faster at sf0.1; the ``arrow=False`` JVM path is kept
    for environments without Python workers and as the equivalence
    check in tests.
    """
    from pyspark.sql import Window

    if arrow:
        return _block_knn_arrow(vectors, block_col, id_col, vec_col, int(k), int(salt_buckets))
    nrm = (lambda c: _norm_unrolled(c, dim)) if dim else _norm
    dot = (lambda x, y: _dot_unrolled(x, y, dim)) if dim else _dot
    pairs = salted_block_pairs(
        vectors, block_col, id_col, vec_col, salt_buckets, partitions, norm_fn=nrm
    )
    scored = pairs.filter(F.col("id_a") != F.col("id_b")).select(
        "id_a",
        "id_b",
        (dot("__ea", "__eb") / (F.col("__na") * F.col("__nb"))).alias("cosine"),
    )
    from pyspark.sql.types import NumericType

    if k == 1 and isinstance(scored.schema["id_b"].dataType, NumericType):
        # 1-NN (the dedup-graph case): max(struct) instead of a window.
        # A window shuffles EVERY scored pair to sort per id_a; the
        # group-by gets a map-side partial aggregate (SortAggregate —
        # struct buffers aren't hash-mutable — but partial all the
        # same), and because the left side of the salted join is
        # partitioned by its own (block, salt(id_a)), all of an id_a's
        # pairs sit in one partition — the exchange carries exactly one
        # row per vector, not one per pair. Tiebreak matches the
        # window's (cosine DESC, id_b ASC): struct comparison takes the
        # max cosine, then the max of -id_b = the min id_b.
        best = scored.groupBy("id_a").agg(
            F.max(F.struct(F.col("cosine"), (-F.col("id_b")).alias("__nb"))).alias("__m")
        )
        return best.select(
            "id_a",
            (-F.col("__m.__nb")).alias("id_b"),
            F.col("__m.cosine").alias("cosine"),
            F.lit(1).alias("rank"),
        )
    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def salted_block_pairs(
    vectors: DataFrame,
    block_col: str,
    id_col: str,
    vec_col: str,
    salt_buckets: int = 16,
    partitions: int | None = None,
    norm_fn=None,
) -> DataFrame:
    """All ordered within-block pairs via the salted self-join (see
    :func:`block_knn` for why), with the embeddings and their
    precomputed norms carried through: (id_a, id_b, __ea, __eb, __na,
    __nb). Callers filter (``id_a != id_b`` for neighbor search,
    ``id_a < id_b`` for unordered pair output) and score. Norms use
    :func:`_norm` unless a bit-compatible variant is passed."""
    if partitions is None:
        partitions = vectors.sparkSession.sparkContext.defaultParallelism
    if norm_fn is None:
        norm_fn = _norm
    s = F.lit(int(salt_buckets))
    a = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col).alias("__blk"),
        F.col(vec_col).alias("__ea"),
        norm_fn(vec_col).alias("__na"),
        F.pmod(F.xxhash64(F.col(id_col)), s).alias("__salt"),
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col).alias("__blk"),
        F.col(vec_col).alias("__eb"),
        norm_fn(vec_col).alias("__nb"),
        F.explode(F.sequence(F.lit(0).cast("long"), s.cast("long") - 1)).alias("__salt"),
    )
    a = a.repartition(partitions, "__blk", "__salt")
    b = b.repartition(partitions, "__blk", "__salt")
    return a.join(b, ["__blk", "__salt"])


def _block_knn_arrow(
    vectors: DataFrame,
    block_col: str,
    id_col: str,
    vec_col: str,
    k: int,
    salt_buckets: int,
) -> DataFrame:
    """Arrow path of :func:`block_knn`: cogroup the salted A-chunks with
    the full block on (block, salt) and score each group with one numpy
    matmul. Group count = blocks × salt_buckets, so parallelism is
    independent of the number of distinct blocks; each group moves
    (|A|/S + |B|) rows over Arrow, and the O(|A|·|B|/S) float work runs
    in BLAS instead of per-element expression evaluation."""
    import pandas as pd

    s = F.lit(int(salt_buckets))
    a = vectors.select(
        F.col(id_col).cast("long").alias("id_a"),
        F.col(block_col).alias("__blk"),
        F.col(vec_col).alias("__ea"),
        F.pmod(F.xxhash64(F.col(id_col)), s).alias("__salt"),
    )
    b = vectors.select(
        F.col(id_col).cast("long").alias("id_b"),
        F.col(block_col).alias("__blk"),
        F.col(vec_col).alias("__eb"),
        F.explode(F.sequence(F.lit(0).cast("long"), s.cast("long") - 1)).alias("__salt"),
    )

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if left.empty or right.empty:
            return pd.DataFrame(
                {
                    "id_a": np.array([], dtype=np.int64),
                    "id_b": np.array([], dtype=np.int64),
                    "cosine": np.array([], dtype=np.float64),
                    "rank": np.array([], dtype=np.int32),
                }
            )
        A = np.vstack(left["__ea"].to_numpy()).astype(np.float64)
        B = np.vstack(right["__eb"].to_numpy()).astype(np.float64)
        ids_a = left["id_a"].to_numpy()
        ids_b = right["id_b"].to_numpy()
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        sims = A @ B.T
        oa, ob, oc, orank = [], [], [], []
        for i in range(len(ids_a)):
            row = sims[i]
            # ascending id_b as the tiebreak for equal cosine
            order = np.lexsort((ids_b, -row))
            taken = 0
            for j in order:
                if ids_b[j] == ids_a[i]:
                    continue
                taken += 1
                oa.append(ids_a[i])
                ob.append(ids_b[j])
                oc.append(row[j])
                orank.append(taken)
                if taken >= k:
                    break
        return pd.DataFrame(
            {
                "id_a": np.asarray(oa, dtype=np.int64),
                "id_b": np.asarray(ob, dtype=np.int64),
                "cosine": np.asarray(oc, dtype=np.float64),
                "rank": np.asarray(orank, dtype=np.int32),
            }
        )

    return (
        a.groupBy("__blk", "__salt")
        .cogroup(b.groupBy("__blk", "__salt"))
        .applyInPandas(score, schema="id_a long, id_b long, cosine double, rank int")
    )


def hyperplane_signature(vec_col: str, planes: list[list[float]]) -> Column:
    """Pack sign(v·hᵢ) bits into a long — a JVM-side random-projection
    signature (shared by lsh_topk and simhash-style bucketing)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        h = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(vec_col, h) > 0).cast("long")
        sig = sig + (bit * F.lit(2**i).cast("long"))
    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    planes_tables: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: union over hash tables of per-bucket candidate
    joins, exact cosine re-rank of the deduped candidate set."""
    from pyspark.sql import Window

    sigs = []
    for t, planes in enumerate(planes_tables):
        v = vectors.select(
            F.col(id_col), F.col(vec_col), F.lit(t).alias("tbl"),
            hyperplane_signature(vec_col, planes).alias("sig"),
        )
        q = queries.select(
            F.col(query_id_col), F.col(query_vec_col), F.lit(t).alias("tbl"),
            hyperplane_signature(query_vec_col, planes).alias("sig"),
        )
        sigs.append((v, q))
    cand = None
    for v, q in sigs:
        c = v.join(F.broadcast(q), ["tbl", "sig"]).select(query_id_col, id_col, vec_col, query_vec_col)
        cand = c if cand is None else cand.unionAll(c)
    cand = cand.dropDuplicates([query_id_col, id_col]).filter(F.col(id_col) != F.col(query_id_col))
    scored = cand.select(query_id_col, id_col, cosine_similarity(vec_col, query_vec_col).alias("cosine"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_vec_col: str = "ev_vec",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-space decontamination: flag corpus rows whose cosine to
    ANY eval-set vector reaches ``threshold`` — the semantic complement
    of the n-gram overlap check (``dedup.ngram_overlap_contamination``),
    catching paraphrased test-set leakage that token overlap misses.

    Output: one row per corpus vector — (id, max_eval_cosine,
    contaminated). Keeping the full frame (rather than survivors only)
    lets the caller audit near-misses before choosing the threshold.

    Shape: eval suites are small (thousands) — the eval side BROADCASTS
    and each corpus partition scores locally; the per-id max collapses
    map-side (each corpus id lives in one partition), so the only
    exchange carries one row per corpus vector. Corpus never reshuffles,
    mirroring the n-gram decontamination plan. Pass ``dim`` when the
    embedding width is known (it always is in a real pipeline) to use
    the unrolled codegen dot product — bit-identical to the fold form,
    measured 5.2 s -> 3.7 s on 1.6M cosines (A/B'd: hoisting the norms
    into a pre-join projection was SLOWER than inlining, 5.5 s — the
    fused whole-stage-codegen expression wins). Parallelism of the
    scoring stage follows the probe side's input splits — thousands at
    warehouse scale; repartition first if the corpus arrives in a
    handful of files.
    """
    if dim:
        cos = _dot_unrolled(vec_col, eval_vec_col, dim) / (
            _norm_unrolled(vec_col, dim) * _norm_unrolled(eval_vec_col, dim)
        )
    else:
        cos = cosine_similarity(vec_col, eval_vec_col)
    ev = F.broadcast(eval_set.select(eval_vec_col))
    return (
        corpus.select(id_col, vec_col)
        .crossJoin(ev)
        .groupBy(id_col)
        .agg(F.max(cos).alias("max_eval_cosine"))
        .select(
            id_col,
            "max_eval_cosine",
            (F.col("max_eval_cosine") >= F.lit(threshold)).alias("contaminated"),
        )
    )
