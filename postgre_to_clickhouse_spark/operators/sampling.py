"""Deterministic sampling & dataset splitting (training-data pipeline).

A pretraining pipeline needs REPRODUCIBLE randomness: the same document
must land in the same train/val/test split on every run, on any cluster
size, from any engine — otherwise eval sets leak into training between
pipeline versions. ``rand()`` fails all of that (per-task RNG), and
``df.sample`` is partition-dependent. These operators derive all
randomness from a cryptographic hash of (seed, row id):

- content-addressed → rerunning, re-partitioning, or re-ordering the
  input cannot move a row between splits;
- engine-portable → md5 exists everywhere (the DuckDB oracles recompute
  the exact assignment), so a Spark pipeline and a warehouse SQL job
  agree row-for-row;
- shuffle-free → assignment is a map-only projection; stratified
  sampling adds exactly one shuffle (the per-stratum rank).

At 100 TB: split assignment fuses into the scan (no shuffle, no state);
stratified sampling shuffles only (strata, hash) pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 8 hex chars → 32-bit space; plenty of resolution for per-myriad splits
_HASH_SPACE = 16**8


def split_hash(id_col: Column | str, seed: str) -> Column:
    """Deterministic uniform [0, 1) double from (seed, id) via md5.

    First 8 hex chars → int → /16^8. Identical in DuckDB:
    ``CAST(from_hex(substring(md5(seed || CAST(id AS VARCHAR)), 1, 8)) AS ...``
    — the oracle uses the same conv-from-hex construction.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(float(_HASH_SPACE))


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights.

    Content-addressed: moving to a bigger cluster, adding rows, or
    re-running cannot reassign an existing row (each row's fate depends
    only on (seed, its id)). Changing ``seed`` draws a fresh assignment.
    """
    total = sum(weights.values())
    if not weights or abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    u = split_hash(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        expr = F.when(u < acc, name) if expr is None else expr.when(u < acc, name)
    expr = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    id_col: str,
    seed: str = "sample-v1",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministically.

    Rows are ranked inside each stratum by the content hash (a seeded
    uniform order) with the id as tiebreak — a reproducible 'random'
    sample that any engine reproduces bit-for-bit. One shuffle (the
    per-stratum window); at 100 TB pre-aggregation isn't needed because
    the window ranks within hash partitions without a global sort.
    """
    u = split_hash(id_col, seed).alias("__u")
    w = Window.partitionBy(*strata_cols).orderBy(F.col("__u"), F.col(id_col))
    return (
        df.withColumn("__u", u)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__u", "__rk")
    )


def sample_fraction(
    df: DataFrame, id_col: str, fraction: float, seed: str = "sample-v1"
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows (content-addressed
    Bernoulli — the scalable path: map-only, no shuffle, stable under
    re-partitioning, union of disjoint fractions composes exactly)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(split_hash(id_col, seed) < F.lit(fraction))


def sample_consistent(
    df: DataFrame,
    fraction: float,
    key_col: str,
    offset: float = 0.0,
    seed: str = "sample-v1",
) -> DataFrame:
    """ClickHouse ``SAMPLE f [OFFSET o]`` parity (r9, VERDICT r8 #4) —
    the keyed-consistent-hash sampling clause the reference's terminal
    engine exposes on any ``SAMPLE BY`` table: keep rows whose sample
    key hashes into the band ``[o, o+f)`` of the unit interval
    (wrapping at 1), so

    - **keyed**: every row of a given key is kept or dropped TOGETHER
      (sample users, not events — aggregates per entity stay unbiased);
    - **consistent**: ``sample(f1) ⊆ sample(f2)`` for ``f1 ≤ f2`` at
      the same offset — growing the sample never invalidates cached
      results (CH's documented SAMPLE property);
    - **partitionable**: bands ``OFFSET 0/0.25/0.5/0.75`` at f=0.25
      split the keys into 4 disjoint, exhaustive shards — the
      distributed-processing idiom CH documents for OFFSET.

    The hash is the engine-portable md5 construction
    (:func:`split_hash`), so a DuckDB/warehouse job recomputes the
    exact member set (the oracle does). NULL keys hash to NULL and are
    excluded in every engine — the CH behavior for a NULL sample key.
    Map-only: fuses into the scan; at 100 TB the sample IS the
    predicate pushdown, no shuffle, no state."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if not 0.0 <= offset < 1.0:
        raise ValueError("offset must be in [0, 1)")
    u = split_hash(key_col, seed)
    lo, hi = offset, offset + fraction
    cond = (u >= F.lit(lo)) & (u < F.lit(hi))
    if hi > 1.0:  # band wraps past 1
        cond = (u >= F.lit(lo)) | (u < F.lit(hi - 1.0))
    return df.filter(cond)


def rebalance_mix(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    seed: str = "mix-v1",
) -> DataFrame:
    """Data-mixing rebalance: deterministically downsample every stratum
    to the size of the SMALLEST one, flattening a skewed source/language
    mix to uniform (in expectation) — the "mixture weights" step of a
    training-data pipeline, done as a filter instead of a sampler so it
    is reproducible and engine-checkable.

    Per stratum s: keep_frac(s) = min_count / count(s); a row survives
    iff its content-addressed uniform (:func:`split_hash`) is below its
    stratum's keep_frac. Same row set on any cluster size, any re-run,
    any engine (the DuckDB oracle recomputes the md5 assignment).

    Shape: one count aggregation on the stratum key, the min as a
    one-row broadcast, per-stratum fractions as a broadcast join back
    onto the data (strata counts are tiny — a handful of sources or
    languages), then a map-side filter. The corpus itself never
    shuffles.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    m = counts.agg(F.min("__n").alias("__target"))
    fracs = counts.crossJoin(F.broadcast(m)).select(
        stratum_col,
        (F.col("__target").cast("double") / F.col("__n").cast("double")).alias("__keep_frac"),
    )
    u = split_hash(id_col, seed)
    return (
        df.join(F.broadcast(fracs), stratum_col)
        .filter(u < F.col("__keep_frac"))
        .drop("__keep_frac")
    )


def capped_per_stratum_skewsafe(
    df: DataFrame,
    stratum_col: str,
    cap: int,
    id_col: str,
    seed: str = "cap-v1",
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact deterministic per-stratum cap (crawl-style "at most ``cap``
    documents per domain") that survives a hot stratum.

    Semantics are identical to :func:`stratified_sample` on a single
    stratum column — keep the ``cap`` rows with the smallest
    (content-hash, id) per stratum — but the single-window formulation
    puts an entire stratum in one task, and at 100 TB one domain can be
    10% of the corpus. Two-phase exact top-k instead:

    1. Salt by ``xxhash64(id) % salt_buckets`` and take the local
       top-``cap`` within each (stratum, salt) — bounded partitions,
       no hot key.
    2. The survivors (≤ ``salt_buckets × cap`` rows per stratum — a
       constant, not data-proportional) go through the exact top-
       ``cap`` window on the stratum alone.

    Every row of the true global top-``cap`` is in its bucket's local
    top-``cap``, so phase 2 sees all of them: the result is EXACTLY the
    single-window answer (same rows on any cluster, any bucket count),
    just never materializing a data-proportional stratum partition.
    """
    u = split_hash(id_col, seed).alias("__u")
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(salt_buckets)))
    w1 = Window.partitionBy(stratum_col, "__salt").orderBy(F.col("__u"), F.col(id_col))
    w2 = Window.partitionBy(stratum_col).orderBy(F.col("__u"), F.col(id_col))
    return (
        df.withColumn("__u", u)
        .withColumn("__salt", salt)
        .withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= cap)
        .withColumn("__rk2", F.row_number().over(w2))
        .filter(F.col("__rk2") <= cap)
        .drop("__u", "__salt", "__rk", "__rk2")
    )


def token_budget_sample(
    df: DataFrame,
    strata_cols: list[str],
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "budget-v1",
) -> DataFrame:
    """Per-stratum sample up to a TOKEN budget (not a row count) — how
    pretraining mixtures are actually drawn: "200B tokens of lang=X".

    Rows are ordered by md5(seed:id) within the stratum (the same
    content-addressed randomness as every sampler here, so membership
    is engine/layout-independent) and kept while the inclusive running
    token count stays ≤ ``budget_tokens``. Output carries ``n_tokens``
    and ``cum_tokens`` for auditability.

    Scale: the running sum is a per-stratum sequential window. Strata
    (languages, sources) are few and the window carries only (key,
    n_tokens) — at 100 TB either accept one task per stratum after the
    window shuffle, or split the budget across k salted sub-strata
    (budget/k each) for a bounded approximation; the exact form here is
    the oracle-checkable contract.
    """
    key = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    ntok = F.size(
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    ).cast("bigint")
    w = (
        Window.partitionBy(*strata_cols)
        .orderBy(key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_tokens", ntok)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= F.lit(int(budget_tokens)))
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weights: dict[str, float],
    seed: str = "mixw-v1",
) -> DataFrame:
    """Target-weight mixture sampling — the general form of
    :func:`rebalance_mix` (which is the uniform-weights special case).

    Given target mixture proportions w_s, the largest corpus satisfying
    them without upsampling is N = min_s count_s / w_s; each stratum
    keeps w_s * N / count_s of its rows (in expectation), selected by
    the content-addressed :func:`split_hash` filter so the surviving
    set is identical on any cluster, rerun, or engine. Strata absent
    from ``weights`` are dropped (weight 0).

    This is how training mixtures are actually specified (fixed domain
    weights decided offline — the output of a DoReMi/UniMax-style
    study), rather than "flatten to the minimum".

    Shape: one count aggregate on the stratum key, the weight table and
    the scalar N broadcast, then a map-side filter — the corpus never
    shuffles.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())], [stratum_col, "__w"]
    )
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    j = counts.join(F.broadcast(wdf), stratum_col)
    nmax = j.agg(F.min(F.col("__n").cast("double") / F.col("__w")).alias("__nmax"))
    fracs = j.crossJoin(F.broadcast(nmax)).select(
        stratum_col,
        F.least(
            F.lit(1.0),
            F.col("__w") * F.col("__nmax") / F.col("__n").cast("double"),
        ).alias("__keep_frac"),
    )
    u = split_hash(id_col, seed)
    return (
        df.join(F.broadcast(fracs), stratum_col)
        .filter(u < F.col("__keep_frac"))
        .drop("__keep_frac")
    )


def compute_parallelism(df: DataFrame) -> int:
    """Partition width for a COMPUTE-heavy stage over ``df``: the
    input's own partition count, floored at the cluster's core count.

    The default input-following width is right when per-row work is
    scan-shaped (the bytes predict the cost), but per-CHARACTER
    operators (suffix doubling, candidate verifies) put orders of
    magnitude more CPU behind each input byte — on a small or
    single-file input the scan yields 1-3 splits and the whole stage
    serializes onto as many cores. Flooring at ``defaultParallelism``
    is scale-adaptive: at cluster scale inputs arrive many-split and
    the floor never binds (r16 optimization, measured in
    OPTIMIZATION_r16.md).

    DRIVER COST NOTE (r17, ADVICE r16): ``df.rdd.getNumPartitions()``
    physically plans the whole subtree — call this on cheap frames
    (scans, checkpointed frames), not per loop round on a join tree;
    iterative callers should derive the width once and pass it through
    (see :func:`spread_small_input`'s ``with_width`` and
    :func:`global_dense_rank`'s ``min_partitions``)."""
    sc = df.sparkSession.sparkContext
    return max(sc.defaultParallelism, df.rdd.getNumPartitions())


def spread_small_input(df: DataFrame, with_width: bool = False):
    """Round-robin ``df`` across the cores IFF its scan provides fewer
    splits than the cluster has cores — the guard that lets a
    compute-heavy map stage (per-character explode, candidate probe
    fan-out) parallelize on a single-file fixture input WITHOUT adding
    a corpus shuffle at real scale, where inputs are many-split and
    this is an identity. Row placement only; every value is unchanged
    (r16 optimization).

    ``with_width=True`` returns ``(df, width)`` where ``width`` is the
    spread frame's partition count — already known from the one
    ``getNumPartitions`` call this function makes, so callers that
    need a downstream stage width (e.g. the seed rank) stop re-planning
    the derived subtree just to re-learn it (r17, ADVICE r16: every
    ``df.rdd.getNumPartitions()`` plans the full subtree)."""
    sc = df.sparkSession.sparkContext
    n_in = df.rdd.getNumPartitions()
    width = max(sc.defaultParallelism, n_in)
    if n_in < sc.defaultParallelism:
        df = df.repartition(width)
    return (df, width) if with_width else df


def global_rank(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    out_col: str = "pos",
    partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over a total order WITHOUT the
    single-partition Window (``Window.orderBy`` with no partitioning
    moves the entire table to ONE task — the canonical 100 TB cliff).

    Shape: range-partition on the order keys and sort within each
    partition (the same distributed sort a global ``orderBy`` runs),
    emit (partition id, within-partition rank) in one Arrow pass, pin
    the layout with ``localCheckpoint`` so the offset count and the
    output read the SAME materialization (range-partitioner bounds come
    from sampling; two independent recomputes of the exchange are not
    guaranteed to split identically), then add broadcast per-partition
    offsets. The only driver-side data is one (pid, count) row per
    partition. The caller's ``order_cols`` must be a total order
    (include a unique tiebreak) for the result to be deterministic.
    """
    import pandas as pd

    if partitions is None:
        # follow the INPUT's parallelism: at fixture scale (1-2 parquet
        # splits) a fixed 32-way fan-out pays ~5 jobs of per-task and
        # python-worker overhead for tiny data; at real scale the input
        # has thousands of splits and the rank spreads accordingly.
        partitions = max(1, df.rdd.getNumPartitions())
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    out_fields = df.schema.fields
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
    schema += ", __pid int, __rn long"

    def add_rank(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in batches:
            n = len(pdf)
            pdf = pdf.copy()
            pdf["__pid"] = pid
            pdf["__rn"] = range(seen + 1, seen + n + 1)
            seen += n
            yield pdf

    ranked = (
        df.repartitionByRange(int(partitions), *cols)
        .sortWithinPartitions(*cols)
        .mapInPandas(add_rank, schema=schema)
        .localCheckpoint()
    )
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in ranked.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )  # bounded by partition count, never by rows
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off = F.broadcast(
        df.sparkSession.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    )
    return (
        ranked.join(off, "__pid")
        .withColumn(out_col, (F.col("__rn") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__rn", "__off")
    )


def global_dense_rank(
    df: DataFrame,
    key_cols: Sequence[str],
    out_col: str = "dr",
    partitions: int | None = None,
    with_stats: bool = False,
    pin_input: bool = False,
    min_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global DENSE rank (equal keys share one rank,
    ranks are 1..#distinct with no gaps) over a key ordering, without
    the single-partition ``Window.orderBy`` cliff — the equality-
    preserving sibling of :func:`global_rank`, and the per-round rank
    flattener of the prefix-doubling suffix-array construction
    (``operators/suffix_array.py``).

    Shape: range-partition on the keys (a RangePartitioner assigns
    EQUAL keys to the same partition — boundaries are key values — so
    a key group never straddles two partitions), sort within each
    partition, emit the within-partition dense rank in one Arrow pass
    carrying the last key across record batches, pin the layout with
    ``localCheckpoint`` (same reasoning as :func:`global_rank`), then
    add broadcast cumulative per-partition GROUP counts. Driver-side
    data is one (pid, group count) row per partition. Keys must be
    non-null (range partitioning of nulls is engine-defined).

    ``with_stats=True`` returns ``(ranked, n_rows, n_groups)`` — the
    row count and the number of DISTINCT key tuples, both read from
    the per-partition counts the offsets collect already gathers
    (equal keys never straddle partitions, so the global group count
    is the sum of per-partition group counts). The prefix-doubling
    early-stop check consumes these for free instead of running its
    own corpus-wide count/countDistinct aggregate per round (r16
    optimization).

    ``pin_input=True`` materializes ``df`` (localCheckpoint) BEFORE the
    range partitioning: the RangePartitioner's boundary-sampling pass
    and the shuffle map pass each execute the input subtree, so a
    non-trivial child (the doubling round's self-join) otherwise runs
    TWICE per rank (r16 optimization — measured ~1 s/round at sf0.1).
    Leave False when the input is a cheap scan.

    ``min_partitions`` floors the derived width (the
    :func:`compute_parallelism` floor) — with ``pin_input`` the count
    is read from the CHECKPOINTED RDD, so iterative callers stop
    paying a full physical-planning pass of the un-pinned subtree per
    round just to learn its width (r17, ADVICE r16)."""
    if pin_input:
        df = df.localCheckpoint()
    if partitions is None:
        partitions = max(min_partitions or 1, 1, df.rdd.getNumPartitions())
    names = list(key_cols)
    out_fields = df.schema.fields
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
    schema += ", __pid int, __dr long"

    def add_dense(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        last = None  # last key row of the previous batch (group carry)
        acc = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ks = pdf[names]
            change = (ks != ks.shift()).any(axis=1)
            change.iloc[0] = True if last is None else bool(
                (ks.iloc[0] != last).any()
            )
            dense = change.cumsum() + acc
            acc = int(dense.iloc[-1])
            last = ks.iloc[-1]
            pdf = pdf.copy()
            pdf["__pid"] = pid
            pdf["__dr"] = dense.astype("int64")
            yield pdf

    cols = [F.col(c) for c in names]
    ranked = (
        df.repartitionByRange(int(partitions), *cols)
        .sortWithinPartitions(*cols)
        .mapInPandas(add_dense, schema=schema)
        .localCheckpoint()
    )
    gcounts = sorted(
        (r["__pid"], r["g"], r["n"])
        for r in ranked.groupBy("__pid")
        .agg(F.max("__dr").alias("g"), F.count(F.lit(1)).alias("n"))
        .collect()
    )  # bounded by partition count
    offsets, acc, n_rows = [], 0, 0
    for pid, g, n in gcounts:
        offsets.append((pid, acc))
        acc += g
        n_rows += n
    off = F.broadcast(
        df.sparkSession.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    )
    out = (
        ranked.join(off, "__pid")
        .withColumn(out_col, (F.col("__dr") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__dr", "__off")
    )
    if with_stats:
        return out, n_rows, acc
    return out
