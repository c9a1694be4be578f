"""WebDataset tar-shard export — the loader format the multimodal /
LLM training stacks standardize on (sequential tar reads, samples as
``{key}.{ext}`` member groups; github.com/webdataset/webdataset).

Layout contract (same spine as ``sinks/shards.py``):

- rows are range-partitioned on the content-addressed shuffle key, so
  shard N always holds the same sample set on any cluster size, and
  the concatenated shard order is the deterministic epoch order;
- each executor partition writes ONE ``shard-NNNNN.tar`` with the
  stdlib ``tarfile`` — members emitted in sorted key order with zeroed
  mtime/uid/gid/uname, so the tar BYTES are reproducible (the manifest
  records each shard's sha256 to prove it);
- every sample contributes ``{key}.txt`` (payload) and ``{key}.json``
  (metadata, sorted keys) — the two-member-per-sample WebDataset
  convention loaders group by basename.

Scale shape: one range exchange + an Arrow pass per partition
(``mapInPandas``); tar bytes stream straight from each executor to its
shard file — no driver data movement, no post-pass. The returned
manifest is assembled from the per-partition summary rows (one row per
shard — bounded by shard count, not data).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.operators.sampling import split_hash


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    meta_cols: tuple[str, ...] = ("lang", "source"),
    binary_col: str | None = None,
    binary_ext: str = ".bin",
    shards: int = 8,
    seed: str = "wds-v1",
) -> dict:
    """Write ``df`` as WebDataset tar shards + ``_wds.json`` manifest.

    ``text_col`` -> a ``{key}.txt`` member; ``binary_col`` (e.g. an
    encoded image payload) -> a ``{key}{binary_ext}`` member — the
    canonical multimodal shard is exactly (``{key}.png``/``.jpg`` +
    ``{key}.json``). Either may be omitted; metadata always ships.

    Returns the manifest dict: one entry per shard with file name,
    sample count, and sha256 of the tar bytes. Re-running on the same
    data produces byte-identical shards (asserted in tests)."""
    if text_col is None and binary_col is None:
        raise ValueError("at least one of text_col/binary_col is required")
    os.makedirs(path, exist_ok=True)
    u = split_hash(id_col, seed).alias("__u")
    cols = [id_col, *([text_col] if text_col else []), *([binary_col] if binary_col else []), *meta_cols]
    ordered = (
        df.select(*cols)
        .withColumn("__u", u)
        .repartitionByRange(shards, F.col("__u"), F.col(id_col))
        .sortWithinPartitions("__u", id_col)
        .drop("__u")
    )

    def write_partition(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = io.BytesIO()
        n = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    rec = dict(zip(pdf.columns, row))
                    key = f"{int(rec[id_col]):012d}"
                    members = []
                    if text_col:
                        members.append((".txt", str(rec[text_col]).encode("utf-8")))
                    if binary_col:
                        members.append((binary_ext, bytes(rec[binary_col])))
                    meta = json.dumps(
                        # .item() unwraps numpy scalars pandas hands back
                        {
                            c: (rec[c].item() if hasattr(rec[c], "item") else rec[c])
                            for c in meta_cols
                        },
                        sort_keys=True,
                    ).encode("utf-8")
                    for ext, body in (*members, (".json", meta)):
                        ti = tarfile.TarInfo(name=key + ext)
                        ti.size = len(body)
                        ti.mtime = 0  # zeroed metadata -> reproducible bytes
                        ti.uid = ti.gid = 0
                        ti.uname = ti.gname = ""
                        tar.addfile(ti, io.BytesIO(body))
                    n += 1
        data = buf.getvalue()
        fname = f"shard-{pid:05d}.tar"
        if n:  # empty partitions write no shard
            with open(os.path.join(path, fname), "wb") as f:
                f.write(data)
        yield pd.DataFrame(
            {
                "shard": [fname],
                "samples": [n],
                "sha256": [hashlib.sha256(data).hexdigest() if n else ""],
            }
        )

    summary = ordered.mapInPandas(
        write_partition, schema="shard string, samples long, sha256 string"
    ).collect()  # one row per shard — bounded by shard count
    entries = sorted(
        ({"shard": r.shard, "samples": r.samples, "sha256": r.sha256} for r in summary if r.samples),
        key=lambda e: e["shard"],
    )
    manifest = {
        "format": "webdataset",
        "order_seed": seed,
        "total_samples": sum(e["samples"] for e in entries),
        "shards": entries,
    }
    with open(os.path.join(path, "_wds.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_webdataset_samples(path: str) -> list[tuple[str, str, dict]]:
    """Test/loader helper: stream (key, text, meta) from every shard in
    manifest order — the exact epoch order trainers consume."""
    with open(os.path.join(path, "_wds.json")) as f:
        manifest = json.load(f)
    out = []
    for e in manifest["shards"]:
        with tarfile.open(os.path.join(path, e["shard"])) as tar:
            members = tar.getmembers()
            by_key: dict[str, dict[str, bytes]] = {}
            for m in members:
                key, ext = m.name.rsplit(".", 1)
                by_key.setdefault(key, {})[ext] = tar.extractfile(m).read()
            for key in sorted(by_key):
                parts = by_key[key]
                out.append(
                    (key, parts["txt"].decode("utf-8"), json.loads(parts["json"]))
                )
    return out
