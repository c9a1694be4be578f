"""SparkSession construction and runtime tuning.

Scale posture (100 TB design, tested on local[32]):
- AQE on: runtime re-planning handles skew joins and coalesces
  post-shuffle partitions, so a fixed ``shuffle.partitions`` is only a
  ceiling, not a latency floor, on small SFs.
- Broadcast threshold left at default (10 MB): tiny dims (region, nation,
  supplier at low SF) broadcast automatically; genuinely large tables
  shuffle. We additionally hint ``F.broadcast`` where a dim is known-small
  by construction.
- Arrow enabled for any pandas interchange (Tier-C operators).

Every query callable runs :func:`configure` on the session it receives —
the driver owns the session, so only runtime-settable confs are used
there. ``get_spark`` is for tests/bench where we own the builder.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to *any* session (including the
# driver's). Keep to confs that SparkSession.conf.set accepts post-start.
_RUNTIME_CONF: dict[str, str] = {
    # Deterministic timestamp semantics vs the DuckDB oracle (naive µs
    # timestamps in parquet): treat everything as UTC.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # local[N] testing: 32 is plenty for <=sf0.1; at cluster scale this is
    # overridden by --conf and AQE coalescing makes it a ceiling anyway.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The fixture generator writes events.ts as parquet TIMESTAMP(NANOS),
    # which Spark has no native type for — read as epoch-nanos long and
    # convert in catalog.load (µs truncation, matching DuckDB).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # answer bare MIN/MAX/COUNT from parquet footers instead of scanning
    # row groups (no effect on filtered/grouped aggs; exact semantics)
    "spark.sql.parquet.aggregatePushdown": "true",
    # r16 optimization: AQE partition coalescing floors post-shuffle
    # partitions at 1 MB by default, which serializes CPU-bound text
    # stages (per-character folds, candidate verifies) onto 2-3 tasks
    # whenever the shuffled BYTES are small but the per-byte compute is
    # not. 256k keeps tiny-stage parallelism on small inputs; at
    # cluster scale any non-trivial stage carries >= cores x 1 MB and
    # the floor never binds, so coalescing behaves exactly as before.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ.get(
        "SPARK_GRAFT_MIN_COALESCE", "256k"
    ),
}


from contextlib import contextmanager


@contextmanager
def no_aqe(spark: SparkSession):
    """Run one micro-batch lifecycle ACTION without adaptive execution
    (r16 optimization). AQE materializes every exchange of a query as
    its own stage-submission JOB, so a small fixed-shape action (a
    bucket write, a part-sized index read-back, an MV partial-state
    append) pays one scheduling+planning round per exchange where a
    non-adaptive plan pays one total — and re-planning has nothing to
    decide for these: widths are explicit or micro-batch-bounded and
    there is no join strategy to revisit. Restores the session's
    setting on exit; everything analytical keeps AQE.

    CONCURRENCY CONTRACT (r17, VERDICT r16 #6 / ADVICE): this (and
    :func:`micro_shape`) flips SESSION-scoped SQL confs for the
    duration — any action planned concurrently on the SAME session
    from another thread would see the flipped values (notably the
    agg-projection writer, whose output FILE COUNT depends on AQE
    coalescing). Every current call site runs serially on the caller's
    thread (synchronous lifecycle methods; foreachBatch bodies, which
    Structured Streaming serializes per query and runs on a CLONED
    session anyway). If concurrent multi-query use of one session ever
    arrives, route these actions through ``spark.newSession()`` (own
    SQLConf, shared context) instead of adding a lock — a lock would
    still leak the flipped confs to the other thread's plans."""
    try:
        old = spark.conf.get("spark.sql.adaptive.enabled")
    except Exception:  # pragma: no cover - conf always readable in practice
        old = "true"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


@contextmanager
def micro_shape(spark: SparkSession, width: int | None = None):
    """Run one micro-batch-bounded ACTION non-adaptively at a narrow,
    cluster-derived shuffle width (r16 optimization). The MV sinks'
    partial-state appends shuffle state rows bounded by the GROUPS a
    batch touches — kilobytes — yet each exchange under AQE costs a
    stage-submission job (~50-100 ms of driver gap apiece), and under
    plain no_aqe costs ``shuffle.partitions`` near-empty tasks (the
    measured 3.2 -> 5.9 s regression recorded in agg_mv.apply_batch).
    Pinning BOTH — AQE off and width max(2, defaultParallelism/8) —
    takes one planning round AND a task count matched to the state's
    size. Width scales with the cluster, not a local constant; at any
    scale the shuffled bytes stay batch-group-bounded by construction.

    Same single-threaded-session contract as :func:`no_aqe` (see its
    docstring): the flipped confs are session-visible for the duration."""
    if width is None:
        width = max(2, spark.sparkContext.defaultParallelism // 8)
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-owned or ours)."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf not settable at runtime in this build — skip
            pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Pandas-path operators (mapInPandas / applyInPandas) pickle their
    closures by reference to this module; workers spawned by a driver
    running outside the repo (the grading driver, spark-submit from
    elsewhere) can't import it from cwd. Shipping a zip via addPyFile
    fixes that for local and cluster mode alike. Once per session.
    """
    if getattr(spark, "_p2c_pkg_shipped", False):
        return
    import hashlib
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    # content-addressed archive name: editing any package source produces
    # a fresh zip, so executors never import stale code from a previous
    # driver process's archive
    digest = hashlib.sha256()
    for dirpath, _, files in sorted(os.walk(pkg_dir)):
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                digest.update(full.encode())
                with open(full, "rb") as f:
                    digest.update(f.read())
    zpath = os.path.join(tempfile.gettempdir(), f"p2c_spark_pkg_{digest.hexdigest()[:16]}.zip")
    if not os.path.exists(zpath):
        tmp = zpath + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as z:
            for dirpath, _, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        z.write(full, os.path.relpath(full, root))
        os.replace(tmp, zpath)
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # e.g. Spark Connect without SparkContext — workers use PYTHONPATH
    spark._p2c_pkg_shipped = True


def get_spark(app_name: str = "p2c-spark") -> SparkSession:
    """Build a local session (tests / bench). Honors SPARK_GRAFT_CPUS."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    )
    return configure(builder.getOrCreate())
