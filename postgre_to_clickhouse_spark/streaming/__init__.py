"""Structured Streaming side of the engine (SURVEY.md §2.4, §7.3).

The reference's streaming plane is: Kafka-engine table consumes the
topic continuously; a materialized view fires per consumed block and
inserts into ReplacingMergeTree (``/root/reference/README.md:189-230``).
Spark's micro-batch IS the per-block trigger (A24); checkpointing
replaces consumer-group offset commits (A23) and upgrades at-least-once
to exactly-once into idempotent sinks.
"""
