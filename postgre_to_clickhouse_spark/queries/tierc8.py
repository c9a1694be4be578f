"""Round-9 driver queries: bloom/token-bloom skip-index reads, table
projections, and the ClickHouse SAMPLE clause — the three r8-VERDICT
gaps (#1 bloom proof, #3 projections, #4 SAMPLE parity) surfaced as
driver-verified lifecycle queries with in-query skip-rate contracts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark import catalog
from postgre_to_clickhouse_spark.queries.registry import dsum, register
from postgre_to_clickhouse_spark.session import configure


def _t(spark, sf_dir, name):
    configure(spark)
    return catalog.load(spark, sf_dir, name)


def _pin(out):
    """Executor-pinned materialization for tempdir-backed lifecycle
    results — see queries/tierc3.py:_pin (r8, VERDICT r7 #1)."""
    return out.localCheckpoint(eager=True)


@register(
    "manifest_bloom_read",
    oracle="""
    SELECT 'eq7' AS probe, doc_id, lang FROM documents WHERE doc_id = 7
    UNION ALL
    SELECT 'eq20' AS probe, doc_id, lang FROM documents WHERE doc_id = 20
    UNION ALL
    SELECT 'tok33' AS probe, doc_id, lang FROM documents
    WHERE list_contains(
      regexp_extract_all(lower(text || ' doctag' || CAST(doc_id AS VARCHAR)),
                         '[a-z0-9]+'),
      'doctag33')
    """,
)
def manifest_bloom_read(spark, sf_dir):
    """r9 (VERDICT r8 #1d), A8 bloom + token-bloom skip indexes THROUGH
    the driver: the documents table — each doc's text suffixed with a
    per-doc ``doctagN`` token so every doc owns one unique indexed
    token — ingested as four part batches into a ``ManifestTable``
    with ``bloom_cols=("doc_id",)`` and ``token_bloom_cols=("text2",)``
    (the ClickHouse ``INDEX ... TYPE bloom_filter`` / ``tokenbf_v1``
    surface, provisioned in the reference's target DDL,
    /root/reference/docker-compose.yml:156-167). Three probed reads —
    two doc_id equality probes and one hasToken probe — each carry an
    in-query contract check that RAISES unless the bitsets actually
    pruned files (a single doc lives in 1 of ~16 files; the bloom must
    skip most of the rest), while the DuckDB oracle recomputes the
    exact row sets from raw documents — an over-pruning bitset (false
    negative) breaks the hash, an under-pruning one breaks the
    RuntimeError. Build cost is one distributed scan of each batch's
    NEW files (never table-sized); probe cost is manifest-local."""
    import shutil
    import tempfile

    from postgre_to_clickhouse_spark.sinks.manifest import ManifestTable

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.concat(F.col("text"), F.lit(" doctag"), F.col("doc_id").cast("string")).alias(
            "text2"
        ),
    )
    path = tempfile.mkdtemp(prefix="p2c_manifest_bloom_")
    try:
        t = ManifestTable(
            path,
            key_col="doc_id",
            n_buckets=4,
            bloom_cols=("doc_id",),
            token_bloom_cols=("text2",),
        )
        apply_batch = t.append_parts(sort_key=("doc_id", "doc_id"), arrival=("doc_id",))
        for b in range(4):
            apply_batch(d.filter(F.pmod("doc_id", F.lit(4)) == b), b)
        n_total = len(t.current_manifest()["files"])

        def probed(label, equals=None, tokens=None):
            kept = t.files_for(equals=equals, tokens=tokens)
            if not len(kept) < n_total:
                raise RuntimeError(
                    f"bloom probe {label} pruned nothing: {len(kept)}/{n_total}"
                )
            return t.read(spark, equals=equals, tokens=tokens)

        toks = F.filter(F.split(F.lower("text2"), r"[^a-z0-9]+"), lambda x: x != "")
        eq7 = (
            probed("eq7", equals=[("doc_id", 7)])
            .filter(F.col("doc_id") == 7)
            .select(F.lit("eq7").alias("probe"), "doc_id", "lang")
        )
        eq20 = (
            probed("eq20", equals=[("doc_id", 20)])
            .filter(F.col("doc_id") == 20)
            .select(F.lit("eq20").alias("probe"), "doc_id", "lang")
        )
        tok33 = (
            probed("tok33", tokens=[("text2", "doctag33")])
            .filter(F.array_contains(toks, "doctag33"))
            .select(F.lit("tok33").alias("probe"), "doc_id", "lang")
        )
        return _pin(eq7.unionByName(eq20).unionByName(tok33))
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register(
    "manifest_projection_read",
    oracle="""
    WITH b AS (
      SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events, b
    WHERE epoch_us(ts) >= b.lo + ((b.hi - b.lo) * 2) // 4
      AND epoch_us(ts) <  b.lo + ((b.hi - b.lo) * 3) // 4
    GROUP BY event_type
    """,
)
def manifest_projection_read(spark, sf_dir):
    """r9 (VERDICT r8 #3), A8 table PROJECTIONS through the driver —
    ClickHouse ``ADD PROJECTION ... ORDER BY`` (the alternate-layout
    half of projections; the agg-MV covers the pre-agg half): events
    ingested as four TIME-INTERLEAVED part batches (split by
    ``kafka_offset % 4``, so every part — and every key-hash bucket
    file — spans the full time range and the BASE zone maps on
    ``updated_at`` can prune NOTHING), under a ``by_time`` projection
    that re-sorts each part by ``updated_at`` into range-split files.
    A part-merge compaction runs mid-stream (merges parts 0-2,
    REBUILDING the projection for the merged rows — CH merge
    semantics). The third-quartile range read must then (a) choose the
    projection layout, (b) prove base pruning is impossible while the
    projection skips files — both enforced by in-query RuntimeErrors —
    and (c) return oracle-exact aggregates, proving layout choice and
    projection maintenance are invisible to results. Quartile bounds
    are exact integer µs arithmetic (identical `//` in Python, Spark,
    DuckDB)."""
    import shutil
    import tempfile

    from postgre_to_clickhouse_spark.sinks.manifest import ManifestTable

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("updated_at"),
        F.col("event_id").alias("kafka_offset"),
    )
    lo, hi = ev.agg(F.min("updated_at"), F.max("updated_at")).collect()[0]
    bounds = [lo + ((hi - lo) * k) // 4 for k in range(5)]
    path = tempfile.mkdtemp(prefix="p2c_manifest_proj_")
    try:
        t = ManifestTable(
            path, key_col="user_id", n_buckets=4, stats_cols=("updated_at",)
        )
        t.add_projection(spark, "by_time", "updated_at", n_files=4)
        apply_batch = t.append_parts(
            sort_key=("user_id", "updated_at"), arrival=("kafka_offset",)
        )
        for b in range(4):  # time-interleaved: every batch spans the range
            apply_batch(ev.filter(F.pmod("kafka_offset", F.lit(4)) == b), b)
            if b == 2:  # background part-merge must rebuild the projection
                t.compact(spark, sort_key=("user_id", "updated_at"), arrival=("kafka_offset",))
        q_lo, q_hi = bounds[2], bounds[3] - 1  # third quartile, inclusive
        probe = [("updated_at", q_lo, q_hi)]
        n_base = len(t.files_for())
        if len(t.files_for(probe)) != n_base:
            raise RuntimeError(
                "base layout unexpectedly pruned — the interleaved-ingest "
                "fixture no longer isolates the projection's contribution"
            )
        layout, files = t.choose_layout(where=probe)
        if layout != "by_time" or not 0 < len(files) < n_base:
            raise RuntimeError(
                f"projection not chosen or pruned nothing: layout={layout}, "
                f"{len(files)}/{n_base} files"
            )
        out = (
            t.read(spark, where=probe)
            .filter((F.col("updated_at") >= q_lo) & (F.col("updated_at") <= q_hi))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                dsum("value").alias("value_sum"),
            )
        )
        return _pin(out)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _horner_u(seed: str, id_expr: str) -> str:
    """DuckDB twin of sampling.split_hash (see queries/tierc5.py)."""
    h = f"md5('{seed}' || ':' || CAST({id_expr} AS VARCHAR))"
    expr = "0"
    for i in range(1, 9):
        expr = f"(({expr}) * 16 + (strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1))"
    return f"(CAST({expr} AS DOUBLE) / 4294967296.0)"


@register(
    "sample_keyed_events",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    WHERE {_horner_u("sample-v1", "user_id")} >= 0.35
      AND {_horner_u("sample-v1", "user_id")} < 0.65
    GROUP BY event_type
    """,
)
def sample_keyed_events(spark, sf_dir):
    """r9 (VERDICT r8 #4): the ClickHouse ``SAMPLE 0.3 OFFSET 0.35``
    clause over the events table, keyed by ``user_id`` — every user's
    events are kept or dropped TOGETHER (per-entity aggregates stay
    unbiased), and the member set is the deterministic md5 hash band
    the DuckDB oracle recomputes value-for-value
    (:func:`operators.sampling.sample_consistent`; superset/partition
    laws pytest-gated in test_training_ops.py). Map-only: the sample
    is a scan predicate — no shuffle, no state, any cluster size."""
    from postgre_to_clickhouse_spark.operators.sampling import sample_consistent

    ev = _t(spark, sf_dir, "events")
    out = sample_consistent(ev, 0.3, "user_id", offset=0.35, seed="sample-v1")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        dsum("value").alias("value_sum"),
    )
