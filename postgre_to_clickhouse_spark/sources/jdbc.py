"""PostgreSQL source (SURVEY.md A1/A2): the batch side of the CDC story.

The reference's Debezium connector declares host/db/table-include/
snapshot-mode as JSON config (``/root/reference/README.md:126-144``).
Spark's equivalent of the *initial snapshot* (A2, ``snapshot.mode=
initial``) is a parallel JDBC read; the *change stream* (A1) rides the
Kafka topic (``streaming.kafka``) because Spark — like ClickHouse in
the reference — does not tail the WAL itself; Debezium/Kafka is the CDC
transport in both systems.

No PostgreSQL server or JDBC driver exists in this container, so
``snapshot`` builds and returns the configured reader without
connecting; tests assert the option wiring (partitioned reads,
predicate pushdown via dbtable subquery).

Scale posture: ``partition_column/num_partitions`` shards the snapshot
across executors (the reference is single-task, ``tasks.max=1`` —
Spark's per-partition parallelism is strictly better, SURVEY.md §4.1);
``fetchsize`` bounds per-round-trip memory.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class PostgresSource:
    """Connection + capture config — the engine's analogue of the
    reference's connector JSON (README.md:124-146)."""

    host: str = "postgres"  # README.md:128
    port: int = 5432  # README.md:129
    database: str = "shop"  # README.md:131
    user: str = "postgres"
    password: str = "postgres"
    table_include: tuple[str, ...] = ("public.users",)  # README.md:136 (A3)
    fetchsize: int = 10_000

    extra_options: dict[str, str] = field(default_factory=dict)

    @property
    def url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"

    def snapshot_reader(
        self,
        spark: SparkSession,
        table: str,
        partition_column: str | None = None,
        num_partitions: int = 8,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        predicate: str | None = None,
    ):
        """Configured DataFrameReader for the initial snapshot (A2).

        ``predicate`` is pushed into the dbtable subquery so the filter
        executes in PostgreSQL, not in Spark (capture-side pushdown —
        the moral equivalent of the reference's table.include.list).
        """
        if table not in self.table_include:
            raise ValueError(f"table {table!r} not in include list {self.table_include} (A3)")
        dbtable = table if predicate is None else f"(SELECT * FROM {table} WHERE {predicate}) AS src"
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", dbtable)
            .option("user", self.user)
            .option("password", self.password)
            .option("driver", "org.postgresql.Driver")
            .option("fetchsize", str(self.fetchsize))
        )
        if partition_column is not None:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("numPartitions", str(num_partitions))
                .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
                .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
            )
        for k, v in self.extra_options.items():
            reader = reader.option(k, v)
        return reader

    def snapshot(self, spark: SparkSession, table: str, **kwargs) -> DataFrame:
        """Run the snapshot read (requires a live PG + JDBC driver)."""
        return self.snapshot_reader(spark, table, **kwargs).load()
