"""Training-sequence packing (SURVEY.md Tier C — VERDICT r12 #5's
growth track continued). The r4-era `pack_sequences` driver query
(queries/tierc3.py) computes the first-token bin per document within
source shards; this module promotes packing to a reusable OPERATOR
family with the pieces a real packing job needs: the full block SPAN
per document (a straddling document belongs to every block it
touches — the trainer's attention-mask bookkeeping needs first AND
last), content-addressed shards (layout/cluster-invariant, not tied
to a `source` column), per-shard fill statistics, and the no-split
first-fit packer SFT corpora require.

Every large-scale LM training run packs variable-length documents
into fixed-length training sequences. Two public strategies:

1. **Concat-and-chunk** (GPT-2/3, The Pile, most pretraining corpora):
   tokenize, concatenate documents in a deterministic order with an
   implicit separator, slice the stream into CAPACITY-token blocks —
   documents MAY straddle block boundaries. :func:`pack_sequences`
   computes, per document, exactly where it lands: shard, token
   offset, first/last block index. The assignment is pure arithmetic
   over a per-shard prefix sum, so it is CLOSED-FORM and
   oracle-checkable (a window prefix sum in any SQL engine).

2. **No-split greedy packing** (SFT / instruction-tuning corpora where
   a document must not be cut): :func:`pack_bins_nosplit` assigns each
   document a bin within its shard by FIRST-FIT over a deterministic
   order, never splitting; documents longer than the capacity refuse
   loudly. First-fit is inherently sequential, so it runs per shard
   via ``applyInPandas`` over the same deterministic order — bounded
   state (one open-bin table), Arrow-batched, zero row-Python.

100 TB posture (SCALE.md): the shard is CONTENT-ADDRESSED
(md5(seed:id) — `sampling.split_hash`, the engine's standard
construction), so the layout of the input never changes an
assignment; each shard's prefix sum / first-fit is a shard-local
window (one shuffle by shard, sort within — no global ordering, no
single-partition window); shard count scales with the corpus. Token
counting is the JVM-side regexp of `operators/text.py` — map-only,
fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postgre_to_clickhouse_spark.operators.sampling import split_hash

__all__ = ["pack_sequences", "pack_shard_stats", "pack_bins_nosplit"]


def _with_shard(df: DataFrame, id_col: str, n_shards: int,
                seed: str) -> DataFrame:
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        "pack_shard",
        F.floor(split_hash(id_col, seed) * F.lit(int(n_shards)))
        .cast("long"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    n_shards: int,
    seed: str = "pack-v1",
) -> DataFrame:
    """Concat-and-chunk packing: documents are ordered by ``id_col``
    within their content-addressed shard, concatenated, and sliced
    into ``capacity``-token blocks.

    Adds: ``pack_shard``, ``pack_offset`` (token offset of the doc's
    first token within its shard stream), ``pack_block_first`` /
    ``pack_block_last`` (inclusive block-index span) and
    ``pack_n_blocks`` (blocks the document touches). A zero-token
    document spans no block (``pack_n_blocks`` = 0 and
    ``pack_block_last`` < ``pack_block_first``); filter them upstream
    if that shape is unwanted.

    One shuffle (by shard) + a shard-local ordered prefix sum; the
    block arithmetic is per-row. Deterministic for any input layout.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    out = _with_shard(df, id_col, n_shards, seed)
    w = (
        Window.partitionBy("pack_shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    cap = F.lit(int(capacity))
    return (
        out.withColumn("pack_offset", cum - F.col(token_col))
        .withColumn(
            "pack_block_first",
            F.floor(F.col("pack_offset") / cap).cast("long"))
        .withColumn(
            "pack_block_last",
            F.floor((F.col("pack_offset") + F.col(token_col) - 1) / cap)
            .cast("long"))
        .withColumn(
            "pack_n_blocks",
            F.greatest(
                F.col("pack_block_last") - F.col("pack_block_first")
                + F.lit(1),
                F.lit(0),
            ).cast("long"))
    )


def pack_shard_stats(packed: DataFrame, token_col: str,
                     capacity: int) -> DataFrame:
    """Per-shard packing summary over :func:`pack_sequences` output:
    document/token totals, block count (= ceil(tokens / capacity))
    and the fill ratio of the blocks. One partial-aggregable groupBy."""
    cap = F.lit(int(capacity))
    return (
        packed.groupBy("pack_shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_col)).alias("n_tokens"),
        )
        .withColumn(
            "n_blocks",
            F.ceil(F.col("n_tokens") / cap).cast("long"))
        .withColumn(
            "fill_ratio",
            F.col("n_tokens").cast("double")
            / (F.col("n_blocks") * cap).cast("double"))
    )


def pack_bins_nosplit(
    df: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    n_shards: int,
    seed: str = "pack-v1",
) -> DataFrame:
    """No-split FIRST-FIT packing: within each content-addressed
    shard, documents are taken in ``id_col`` order and placed into
    the first open bin with room; a document opens a new bin when
    none fits. Adds ``pack_shard`` and ``pack_bin`` (0-based within
    the shard).

    A document longer than ``capacity`` raises (no-split packing has
    no legal placement — truncate or route to concat-and-chunk
    upstream). First-fit over a fixed order is sequential by nature,
    so each shard runs as ONE ``applyInPandas`` group: state is the
    open-bin remaining-space table (bounded by bins-per-shard), the
    scan is a single pass. Shards are independent — the parallelism
    unit — and the order inside is deterministic, so the result is
    layout-independent (hypothesis-tested).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    out = _with_shard(df, id_col, n_shards, seed)
    cap = int(capacity)

    import pandas as pd

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        remaining: list[int] = []  # remaining space per open bin
        bins = []
        for tok in pdf[token_col].astype("int64"):
            if tok > cap:
                raise ValueError(
                    f"document with {tok} tokens exceeds the no-split "
                    f"capacity {cap} — truncate upstream or use "
                    "pack_sequences (concat-and-chunk allows splits)"
                )
            for b, space in enumerate(remaining):
                if tok <= space:
                    remaining[b] = space - tok
                    bins.append(b)
                    break
            else:
                remaining.append(cap - tok)
                bins.append(len(remaining) - 1)
        pdf["pack_bin"] = pd.Series(bins, dtype="int64")
        return pdf

    from pyspark.sql import types as T

    # a FRESH StructType — StructType.add mutates the receiver, which
    # here is the input DataFrame's live schema object
    result_schema = T.StructType(
        list(out.schema.fields) + [T.StructField("pack_bin", T.LongType())]
    )
    return out.groupBy("pack_shard").applyInPandas(
        _pack, schema=result_schema)
