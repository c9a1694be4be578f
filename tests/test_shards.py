"""Training-shard export sink: bounded ordered shards + manifest."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.sinks.shards import read_training_shards, write_training_shards
from tests.conftest import SF_SMALL


def _docs(spark):
    return catalog.load(spark, SF_SMALL, "documents")


def test_shards_partition_count_and_manifest(spark, tmp_path):
    p = str(tmp_path / "shards")
    m = write_training_shards(_docs(spark), p, id_col="doc_id", shards=4)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) == 4
    assert m["total_rows"] == 500
    assert sorted(e["file"] for e in m["shards"]) == sorted(files)
    on_disk = json.load(open(os.path.join(p, "_shards.json")))
    assert on_disk == m


def test_shards_max_records_per_file(spark, tmp_path):
    p = str(tmp_path / "shards")
    m = write_training_shards(
        _docs(spark), p, id_col="doc_id", shards=4, max_records_per_file=50
    )
    assert all(e["rows"] <= 50 for e in m["shards"])
    assert m["total_rows"] == 500


def test_shards_deterministic_across_layouts(spark, tmp_path):
    """Same corpus, different upstream partitioning → byte-identical
    shard membership and order (content-addressed shuffle key)."""
    d = _docs(spark)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_training_shards(d, p1, id_col="doc_id", shards=4)
    m2 = write_training_shards(
        d.repartition(17).orderBy(F.rand(7)), p2, id_col="doc_id", shards=4
    )
    assert [e["fingerprint"] for e in m1["shards"]] == [e["fingerprint"] for e in m2["shards"]]
    assert [e["rows"] for e in m1["shards"]] == [e["rows"] for e in m2["shards"]]
    # and the within-shard ORDER matches too, not just membership
    for f1, f2 in zip((e["file"] for e in m1["shards"]), (e["file"] for e in m2["shards"])):
        a = [r.doc_id for r in spark.read.parquet(os.path.join(p1, f1)).collect()]
        b = [r.doc_id for r in spark.read.parquet(os.path.join(p2, f2)).collect()]
        assert a == b


def test_shards_roundtrip_and_manifest_verification(spark, tmp_path):
    p = str(tmp_path / "shards")
    write_training_shards(_docs(spark), p, id_col="doc_id", shards=3)
    back = read_training_shards(spark, p)
    assert back.count() == 500
    assert {r.doc_id for r in back.select("doc_id").collect()} == set(range(500))


# -- WebDataset tar export (r5) --------------------------------------------
def test_webdataset_roundtrip_and_byte_determinism(spark, tmp_path):
    from postgre_to_clickhouse_spark import catalog
    from postgre_to_clickhouse_spark.sinks.webdataset import (
        read_webdataset_samples,
        write_webdataset_shards,
    )
    from tests.conftest import SF_SMALL

    d = catalog.load(spark, SF_SMALL, "documents")
    m1 = write_webdataset_shards(d, str(tmp_path / "wds1"), shards=4)
    assert m1["total_samples"] == d.count()

    # every sample survives with its text + metadata
    samples = read_webdataset_samples(str(tmp_path / "wds1"))
    assert len(samples) == d.count()
    truth = {f"{r.doc_id:012d}": (r.text, r.lang, r.source) for r in d.collect()}
    for key, text, meta in samples:
        t_text, t_lang, t_source = truth[key]
        assert text == t_text and meta == {"lang": t_lang, "source": t_source}

    # a different physical layout yields BYTE-identical shards
    from pyspark.sql import functions as F

    m2 = write_webdataset_shards(
        d.repartition(13).orderBy(F.rand(5)), str(tmp_path / "wds2"), shards=4
    )
    assert [e["sha256"] for e in m1["shards"]] == [e["sha256"] for e in m2["shards"]]
    assert [e["samples"] for e in m1["shards"]] == [e["samples"] for e in m2["shards"]]


def test_webdataset_multimodal_binary_members(spark, tmp_path):
    import hashlib
    import tarfile

    import numpy as np

    from postgre_to_clickhouse_spark.operators import multimodal as M
    from postgre_to_clickhouse_spark.sinks.webdataset import write_webdataset_shards

    rows = [
        (i, bytearray(M.encode_bmp(np.full((4, 4, 3), i % 256, dtype=np.uint8))), "img")
        for i in range(20)
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary, source string")
    m = write_webdataset_shards(
        media, str(tmp_path / "wds"), text_col=None, meta_cols=("source",),
        binary_col="payload", binary_ext=".bmp", shards=2,
    )
    assert m["total_samples"] == 20
    # tar members round-trip the exact encoded bytes, grouped by key
    seen = 0
    for e in m["shards"]:
        with tarfile.open(str(tmp_path / "wds" / e["shard"])) as tar:
            for mem in tar.getmembers():
                if mem.name.endswith(".bmp"):
                    body = tar.extractfile(mem).read()
                    i = int(mem.name.split(".")[0])
                    assert body == bytes(rows[i][1])
                    seen += 1
    assert seen == 20
