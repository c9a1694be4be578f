"""External-dictionary lookups (ClickHouse ``dictGet`` family).

ClickHouse dictionaries are bounded key→attribute tables pinned in
memory on every server; ``dictGet('d', 'attr', key)`` is a scan-local
hash probe, never a join (reference workload: dimension enrichment
inside the MV SELECT). The Spark-first equivalent is a **map literal
folded into the plan**: the dictionary rows are collected once on the
driver (bounded, asserted), compiled into a ``CreateMap`` expression,
and every probe becomes ``element_at`` inside whole-stage codegen — a
map-only stage with NO join, NO shuffle, NO broadcast exchange. At
100 TB the fact scan never moves; the dictionary rides the serialized
plan exactly like ClickHouse ships dictionaries to every replica.

Size discipline: literal maps serialize into the plan, so the bound is
strict (``max_rows``, default 10 000 — region/nation/calendar-class
dims). Anything larger is not a "dictionary" in the ClickHouse sense
either — use a broadcast join (``F.broadcast``), which this module
refuses loudly rather than degrading into.

Semantics parity:
- ``dict_get``            → CH ``dictGetOrNull`` (missing key → NULL)
- ``dict_get_or_default`` → CH ``dictGetOrDefault``
- ``dict_has``            → CH ``dictHas``
- chained lookups (key of one dict = attribute of another) mirror CH
  hierarchical dictionaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_ROWS = 10_000


class Dictionary:
    """A bounded key → {attr: value} lookup compiled to map literals."""

    def __init__(self, mapping: dict[str, dict], key_type: str = "bigint"):
        self._maps: dict[str, Column] = {}
        self._key_type = key_type
        for attr, kv in mapping.items():
            pairs = []
            # deterministic literal order — identical plans across runs
            for k in sorted(kv):
                pairs.append(F.lit(k).cast(key_type))
                pairs.append(F.lit(kv[k]))
            self._maps[attr] = F.create_map(*pairs) if pairs else F.create_map()

    @classmethod
    def from_df(
        cls,
        df: DataFrame,
        key_col: str,
        attr_cols: list[str],
        max_rows: int = DEFAULT_MAX_ROWS,
        key_type: str = "bigint",
    ) -> "Dictionary":
        """Build from a dimension DataFrame. Collects AT MOST
        ``max_rows + 1`` rows (limit-guarded — never an unbounded
        driver materialization) and refuses anything larger."""
        rows = df.select(key_col, *attr_cols).limit(max_rows + 1).collect()
        if len(rows) > max_rows:
            raise ValueError(
                f"dictionary source exceeds max_rows={max_rows}; "
                "use a broadcast join for large dimensions"
            )
        mapping = {a: {} for a in attr_cols}
        for r in rows:
            for a in attr_cols:
                mapping[a][r[key_col]] = r[a]
        return cls(mapping, key_type=key_type)

    def get(self, attr: str, key: Column | str) -> Column:
        """``dictGetOrNull``: NULL when the key is absent."""
        k = F.col(key) if isinstance(key, str) else key
        return F.element_at(self._maps[attr], k.cast(self._key_type))

    def get_or_default(self, attr: str, key: Column | str, default) -> Column:
        """``dictGetOrDefault``."""
        return F.coalesce(self.get(attr, key), F.lit(default))

    def has(self, key: Column | str) -> Column:
        """``dictHas``: key present in the dictionary (any attribute —
        all attribute maps share the key set)."""
        attr = next(iter(self._maps))
        k = F.col(key) if isinstance(key, str) else key
        return F.element_at(self._maps[attr], k.cast(self._key_type)).isNotNull()
