"""Training-shard export — the terminal sink of a training-data
pipeline: the curated corpus laid out as evenly-sized, deterministically
ordered parquet shards a data loader can stream.

What trainers need from the layout (and what this sink guarantees):

- **Bounded shard size** — ``maxRecordsPerFile`` caps rows per file so
  loader workers get even chunks regardless of upstream partitioning.
- **Global deterministic order** — rows are range-partitioned and
  sorted within shards by a content-addressed shuffle key
  (md5 of the id — :func:`operators.sampling.split_hash`), so the
  "random" document order every epoch reads is reproducible
  bit-for-bit on any cluster size, and shard N always holds the same
  rows. Range partitioning gives NON-OVERLAPPING key ranges per shard:
  global order = shard order ++ within-shard order.
- **A manifest** — `_shards.json` records file names, row counts, and
  a content fingerprint per shard, so downstream jobs (and resumable
  loaders) can verify integrity without re-scanning data.

Scale shape: one range-exchange (sampling pass + shuffle — Spark's
``repartitionByRange``) and a within-partition sort; no global sort,
no driver-side data movement. At 100 TB, `shards` ≈ corpus / desired
shard bytes; the sampling pass is negligible.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.operators.sampling import split_hash


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    shards: int,
    max_records_per_file: int | None = None,
    seed: str = "shard-v1",
) -> dict:
    """Write ``df`` as ``shards`` ordered parquet shards + manifest.

    Returns the manifest dict: {"shards": [{"file", "rows", "fingerprint"}...],
    "total_rows", "order_seed"}. The fingerprint is a content hash per
    shard (sum of xxhash64 over ids — membership, not order; order
    inside a file is already fixed by the writer's sort), computed in
    ONE pass over the written files via ``input_file_name`` grouping —
    not a per-file job loop.
    """
    u = split_hash(id_col, seed).alias("__u")
    out = (
        df.withColumn("__u", u)
        .repartitionByRange(shards, F.col("__u"), F.col(id_col))
        .sortWithinPartitions("__u", id_col)
        .drop("__u")
    )
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.parquet(path)

    spark = df.sparkSession
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            # decimal-widened: a long sum of xxhash64 values overflows
            # under ANSI mode; decimal(38,0) is exact far past any real
            # shard size, and the fingerprint only needs equality
            F.sum(F.xxhash64(F.col(id_col)).cast("decimal(38,0)")).alias("fingerprint"),
        )
        .collect()
    )
    entries = [
        {"file": r.file, "rows": r.rows, "fingerprint": int(r.fingerprint or 0)}
        for r in sorted(per_file, key=lambda r: r.file)
    ]
    manifest = {
        "shards": entries,
        "total_rows": sum(e["rows"] for e in entries),
        "order_seed": seed,
    }
    with open(os.path.join(path, "_shards.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read the shard set back (manifest-verified row total)."""
    df = spark.read.parquet(path)
    mpath = os.path.join(path, "_shards.json")
    if os.path.exists(mpath):
        with open(mpath) as fh:
            manifest = json.load(fh)
        n = df.count()
        if n != manifest["total_rows"]:
            raise ValueError(
                f"shard set at {path} has {n} rows; manifest says {manifest['total_rows']}"
            )
    return df
