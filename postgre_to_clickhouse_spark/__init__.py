"""PySpark-native analytics engine with the capabilities of
``rynkoemi/postgre-to-clickhouse`` (CDC pipeline: PostgreSQL → Debezium →
Kafka/Avro → ClickHouse materialized view → ReplacingMergeTree), rebuilt
Spark-first per SURVEY.md, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Layout:
    session    — SparkSession construction + runtime tuning knobs
    catalog    — table registry over the parquet fixtures
    cdc/       — CDC envelope unwrap, MV transform, dedup/latest, Avro glue
    operators/ — as-of join, range join, top-k, dedup family, similarity, text
    queries/   — the driver-facing query battery (Tier A/B/C) + DuckDB oracles
    streaming/ — Structured Streaming pipeline (file/kafka source → upsert sink)
    sinks/     — parquet/upsert sinks
"""

__version__ = "0.1.0"
