"""WebDataset tar-shard export — the loader format the multimodal /
LLM training stacks standardize on (sequential tar reads, samples as
``{key}.{ext}`` member groups; github.com/webdataset/webdataset).

Layout contract (same spine as ``sinks/shards.py``):

- shard membership is COMPUTED, not sampled: ``bucket =
  floor(__u * shards)`` on the content-addressed shuffle key ``__u``,
  so shard N holds exactly the same sample set on any cluster size,
  any partition count, any run — no reliance on range-partitioner
  sampling (which is only deterministic when the sampler sees every
  row, i.e. small data);
- each bucket's ``shard-NNNNN.tar`` (named by BUCKET, not partition
  id) is written by the one task that owns the bucket after a hash
  exchange on the bucket id, with the stdlib ``tarfile`` — members
  emitted in sorted key order with zeroed mtime/uid/gid/uname, so the
  tar BYTES are reproducible (the manifest records each shard's
  sha256 to prove it);
- every sample contributes ``{key}.txt`` (payload) and ``{key}.json``
  (metadata, sorted keys) — the two-member-per-sample WebDataset
  convention loaders group by basename.

Scale shape: one hash exchange + an Arrow pass per partition
(``mapInPandas``); tar bytes STREAM from each executor to a temp file
(sha256 computed by a wrapping writer as bytes pass through — the
shard is never materialized in memory, so a multi-GB shard cannot OOM
an executor) and are renamed into place on success. No driver data
movement, no post-pass; the returned manifest is assembled from the
per-partition summary rows (one row per shard — bounded by shard
count, not data).
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
    u = split_hash(id_col, seed)
    cols = [id_col, *([text_col] if text_col else []), *([binary_col] if binary_col else []), *meta_cols]
    # bucket = floor(__u * shards): pure function of content hash ->
    # shard membership is identical on any cluster size / partition
    # count (repartitionByRange's sampled bounds are only stable when
    # the sampler sees every row). The hash exchange on __b co-locates
    # each bucket in exactly one task; a task may own several buckets
    # (hash collisions mod parallelism) and writes one tar per bucket.
    ordered = (
        df.select(*cols)
        .withColumn("__u", u)
        .withColumn(
            "__b",
            F.least(F.floor(F.col("__u") * shards).cast("int"), F.lit(shards - 1)),
        )
        .repartition(shards, F.col("__b"))
        .sortWithinPartitions("__b", "__u", id_col)
    )

    class _ShardWriter:
        """Incremental tar writer for one bucket: every byte streams
        through a sha256-ing wrapper straight to a temp file (the shard
        is never held in memory), renamed into place on close."""

        def __init__(self, bucket: int):
            self.fname = f"shard-{bucket:05d}.tar"
            self._tmp = os.path.join(path, f"_tmp.{self.fname}")
            self._digest = hashlib.sha256()
            self._raw = open(self._tmp, "wb")
            self.n = 0
            writer = self

            class _Hashing:
                def write(self, b):
                    writer._digest.update(b)
                    return writer._raw.write(b)

                def tell(self):
                    return writer._raw.tell()

                def close(self):
                    pass

            self._tar = tarfile.open(fileobj=_Hashing(), mode="w")

        def add(self, rec: dict) -> None:
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
                self._tar.addfile(ti, io.BytesIO(body))
            self.n += 1

        def close(self) -> str:
            self._tar.close()
            self._raw.close()
            os.replace(self._tmp, os.path.join(path, self.fname))
            return self._digest.hexdigest()

    def write_partition(batches):
        import pandas as pd

        out_shard, out_n, out_sha = [], [], []
        current_b, w = None, None
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                rec = dict(zip(pdf.columns, row))
                b = int(rec["__b"])
                if b != current_b:  # sorted by __b -> each bucket is contiguous
                    if w is not None:
                        out_shard.append(w.fname)
                        out_n.append(w.n)
                        out_sha.append(w.close())
                    current_b, w = b, _ShardWriter(b)
                w.add(rec)
        if w is not None:
            out_shard.append(w.fname)
            out_n.append(w.n)
            out_sha.append(w.close())
        yield pd.DataFrame(
            {"shard": out_shard, "samples": out_n, "sha256": out_sha}
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
