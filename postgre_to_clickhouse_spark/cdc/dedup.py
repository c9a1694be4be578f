"""ReplacingMergeTree semantics, done honestly (SURVEY.md §2.3 note, §7.5.1).

The reference's final table is ``ENGINE = ReplacingMergeTree ORDER BY
(user_id, updated_at)`` (``/root/reference/README.md:176-177``). Because
the version column is *in* the sort key, background merges only collapse
exact redeliveries (same ``(user_id, updated_at)``, Kafka at-least-once),
while every genuine UPDATE survives as a new version row. The README's
*claimed* latest-wins-per-user behavior (``README.md:180``) only appears
under ``FINAL``/``argMax``. We expose both semantics as distinct,
deterministic operators:

- :func:`dedup_redelivery` — A19, exact-duplicate drop per sort key
  (keeps the first-delivered copy, lowest Kafka offset);
- :func:`latest` — A20, per-entity version collapse (the ``FINAL`` view).

Spark's per-batch dedup is deterministic — strictly stronger than CH's
eventual merge (reads there may see duplicates pre-merge); documented
deliberate strengthening.

Scale: both are a single hash-shuffle on the entity key. At 100 TB the
final table is bucketed/partitioned by entity key so this shuffle
disappears on ingest (per-batch dedup touches only the batch) and the
``latest`` view shuffles only the partitions a query reads. Window +
``row_number`` is Catalyst-optimized (partial sort within partitions,
no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def dedup_redelivery(
    df: DataFrame,
    sort_key: Sequence[str] = ("user_id", "updated_at"),
    arrival_order: Sequence[str] = ("kafka_offset",),
) -> DataFrame:
    """Drop exact redeliveries: one row per sort_key, earliest arrival wins.

    Deterministic replacement for ``dropDuplicates`` (which keeps an
    arbitrary row) so results are stable across runs/partitionings.
    """
    w = Window.partitionBy(*sort_key).orderBy(*[F.col(c).asc() for c in arrival_order])
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)


def latest(
    df: DataFrame,
    entity_key: Sequence[str] = ("user_id",),
    version_cols: Sequence[str] = ("updated_at", "kafka_offset"),
) -> DataFrame:
    """Latest-wins per entity (the `FINAL` / argMax view, README.md:180).

    ``version_cols`` order descending decides the winner; include the
    Kafka offset as tiebreak so same-version redeliveries resolve
    deterministically to the last-delivered copy.
    """
    w = Window.partitionBy(*entity_key).orderBy(*[F.col(c).desc() for c in version_cols])
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)
