"""SQL DDL surface (SURVEY.md A22): the engine's analogue of the
reference's CREATE DATABASE / CREATE TABLE / CREATE MATERIALIZED VIEW
statements (``/root/reference/README.md:96,164-230``), executed against
the Spark session catalog.

The reference's three DDL objects map to:
- `shop.users` final table        → a parquet-backed table (or view over
  the ingested path);
- `kafka_shop.kafka__users`       → the streaming source (no DDL needed;
  Spark reads the topic/files directly);
- the materialized view           → `users_latest`, a SQL VIEW wrapping
  the engine's latest-wins semantics — queryable exactly like the
  reference's endpoint (`SELECT * FROM shop_users`, README.md:240).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from postgre_to_clickhouse_spark.session import configure


def create_cdc_tables(spark: SparkSession, users_table_path: str) -> None:
    """Register the reference's query surface in the session catalog:
    `shop_users` (all version rows, A21) and `shop_users_latest`
    (the FINAL/argMax view the README claims, A20) — both plain SQL
    objects so any SQL client of this session sees them."""
    configure(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS shop")
    spark.sql(f"""
        CREATE OR REPLACE TEMPORARY VIEW shop_users
        AS SELECT * FROM parquet.`{users_table_path}`
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY VIEW shop_users_latest AS
        SELECT user_id, username, account_type, updated_at, created_at,
               kafka_time, kafka_offset
        FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY updated_at DESC, kafka_offset DESC) AS __rn
          FROM shop_users
        ) WHERE __rn = 1
    """)


def create_analytics_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the analytics tables as SQL views (the ClickHouse-endpoint
    role, SURVEY.md Tier B): after this, every Tier-B query is also
    runnable as plain `spark.sql` text."""
    from postgre_to_clickhouse_spark import catalog

    configure(spark)
    catalog.register_views(spark, sf_dir)


class SqlEndpoint:
    """Handle for a running in-process HiveServer2-protocol endpoint —
    ``url`` is the JDBC address any beeline/JDBC/ODBC client dials."""

    def __init__(self, server, host: str, port: int):
        self._server = server
        self.host = host
        self.port = port
        self.url = f"jdbc:hive2://{host}:{port}/default"

    def stop(self) -> None:
        self._server.stop()


def serve_sql_endpoint(
    spark: SparkSession,
    port: int = 0,
    host: str = "127.0.0.1",
    timeout_s: float = 30.0,
) -> SqlEndpoint:
    """Start the engine's wire-protocol SQL endpoint (r7, VERDICT r6
    #6): the analogue of the reference's interactive surface — the
    ClickHouse server listens on native TCP 9000 / HTTP 8123 / MySQL
    9004 (``/root/reference/clickhouse-server/config.d/config.xml:
    11-12,30``, ``README.md:156``); Spark's equivalent is the Thrift
    JDBC/ODBC server (HiveServer2 protocol) sharing THIS session's
    catalog, so every view registered by :func:`create_cdc_tables` /
    :func:`create_analytics_views` is queryable from beeline, JDBC, or
    ODBC. ``port=0`` picks a free port. Spark Connect
    (``spark.api.mode=connect`` at launch, gRPC port 15002) is the
    other public wire option; Thrift is started here because it needs
    no session-launch flag.

    In-process (``HiveThriftServer2.startWithContext``), so per-
    connection sessions share the catalog but NOT local temp views —
    register shared objects as global temp views or catalog tables.
    Gated: raises RuntimeError with the spark-submit fallback if the
    thriftserver classes are missing from the distribution."""
    import socket
    import time

    configure(spark)
    jvm = spark.sparkContext._jvm
    try:
        # force real class resolution before we mutate any conf (py4j
        # resolves member access lazily, so a bare attribute chain
        # would not detect a missing jar)
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.hive.thriftserver.HiveThriftServer2"
        )
        cls = jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
    except Exception as e:  # pragma: no cover — full dist always has it
        raise RuntimeError(
            "spark-hive-thriftserver is not on the classpath; launch via "
            "`spark-submit --class org.apache.spark.sql.hive.thriftserver."
            "HiveThriftServer2` or `sbin/start-thriftserver.sh` instead"
        ) from e
    if port == 0:
        s = socket.socket()
        s.bind((host, 0))
        port = s.getsockname()[1]
        s.close()
    spark.conf.set("hive.server2.thrift.bind.host", host)
    spark.conf.set("hive.server2.thrift.port", str(port))
    server = cls.startWithContext(spark._jsparkSession.sqlContext())
    deadline = time.time() + timeout_s
    while True:
        try:
            probe = socket.create_connection((host, port), 1)
            probe.close()
            return SqlEndpoint(server, host, port)
        except OSError:
            if time.time() > deadline:
                server.stop()
                raise TimeoutError(
                    f"thrift endpoint did not listen on {host}:{port} "
                    f"within {timeout_s}s"
                )
            time.sleep(0.2)
