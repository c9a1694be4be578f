"""Debezium envelope unwrap — the reference's ``ExtractNewRecordState``
SMT (``/root/reference/README.md:142-143``), re-expressed as a DataFrame
operator.

Semantics reproduced exactly (SURVEY.md A11, §7.5.5):
- keep the ``after`` row state for op in (c, u, r);
- with SMT defaults, DELETE events and tombstones are dropped — deletes
  never reach the final table. We preserve that default but expose
  ``keep_deletes=True`` so soft-delete pipelines can opt in without a
  redesign (the ``op`` column pathway stays intact).

Pure ``DataFrame -> DataFrame``: works identically on batch and
streaming inputs. Stateless → no shuffle; at 100 TB this is a map-only
stage fused into the scan by whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UPSERT_OPS = ("c", "u", "r")  # create / update / snapshot-read


def unwrap(
    df: DataFrame,
    envelope_col: str = "event",
    keep_deletes: bool = False,
    keep_op: bool = False,
) -> DataFrame:
    """Flatten ``{before, after, source, op, ts_ms}`` to the after-row.

    Input: one column holding the Debezium envelope struct plus any
    transport metadata columns (kept). Output: the ``after.*`` fields +
    metadata (+ ``op`` if ``keep_op``).
    """
    env = F.col(envelope_col)
    op = env.getField("op")
    if keep_deletes:
        # Soft-delete pathway: deletes surface the *before* image with op='d'.
        row = F.when(op == "d", env.getField("before")).otherwise(env.getField("after"))
        filtered = df
    else:
        row = env.getField("after")
        filtered = df.filter(op.isin(*_UPSERT_OPS))

    meta = [c for c in df.columns if c != envelope_col]
    cols = [row.getField(f.name).alias(f.name) for f in df.schema[envelope_col].dataType["after"].dataType.fields]
    if keep_op:
        cols.append(op.alias("op"))
    return filtered.select(*cols, *[F.col(c) for c in meta])
