"""Dictionary surface — the reference's RAM-resident external key→value
lookup tables with ``dictGet()`` (SURVEY.md §1.1 Dictionary,
§2.8 dictionary lookups; upstream ``src/Dictionaries/``).

Two access paths, matching the reference's flat/hashed layouts:

- ``Dictionary`` — materializes the (small) lookup table into a map
  LITERAL compiled into the plan: ``dict_get`` becomes a pure expression
  (no join, no shuffle). This is the exact analog of the reference's
  RAM-resident dictionaries: appropriate when |dict| is dimension-sized
  (the collect is bounded and happens once at build).
- ``dict_get_join`` — broadcast-join fallback for lookup tables too large
  for a literal map but small enough to broadcast (the reference's
  ``direct`` join against a dictionary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Dictionary:
    """dictGet via a compiled map literal."""

    def __init__(self, lookup: DataFrame, key_col: str, value_col: str,
                 max_entries: int = 100_000):
        rows = lookup.select(key_col, value_col).limit(max_entries + 1).collect()
        if len(rows) > max_entries:
            raise ValueError(
                f"dictionary larger than {max_entries} entries — use "
                "dict_get_join (broadcast) instead")
        flat: list[Column] = []
        for r in rows:
            flat.append(F.lit(r[0]))
            flat.append(F.lit(r[1]))
        self._map = F.create_map(*flat) if flat else F.create_map()

    def get(self, key: Column | str) -> Column:
        """``dictGet(dict, key)`` — NULL when absent."""
        k = F.col(key) if isinstance(key, str) else key
        return F.element_at(self._map, k)

    def get_or_default(self, key: Column | str, default) -> Column:
        """``dictGetOrDefault``."""
        return F.coalesce(self.get(key), F.lit(default))

    def has(self, key: Column | str) -> Column:
        """``dictHas``."""
        return self.get(key).isNotNull()


def dict_get_join(df: DataFrame, lookup: DataFrame, key_col: str,
                  lookup_key: str, value_col: str, out_col: str) -> DataFrame:
    """dictGet as a broadcast left join (keeps all df rows, adds the
    looked-up value column)."""
    small = F.broadcast(lookup.select(F.col(lookup_key).alias("__k"),
                                      F.col(value_col).alias(out_col)))
    return df.join(small, df[key_col] == small["__k"], "left").drop("__k")


class HierarchicalDictionary(Dictionary):
    """Hierarchical dictionary (reference ``dictGetHierarchy`` /
    ``dictIsIn`` — upstream src/Dictionaries hierarchy support +
    src/Functions/FunctionsExternalDictionaries.h): a key→parent map
    walked a bounded number of levels entirely as compiled expressions
    (each level is one map lookup — no join, no recursion at runtime;
    the reference bounds hierarchy depth the same way its loop does,
    we bound it statically with ``max_depth``)."""

    def __init__(self, lookup: DataFrame, key_col: str, parent_col: str,
                 max_depth: int = 8, max_entries: int = 100_000):
        super().__init__(lookup, key_col, parent_col, max_entries)
        self._max_depth = max_depth

    def get_hierarchy(self, key: Column | str) -> Column:
        """``dictGetHierarchy(key)`` — array [key, parent, grandparent,
        ...] stopping at the first key with no parent."""
        k = F.col(key) if isinstance(key, str) else key
        chain = [k]
        cur = k
        for _ in range(self._max_depth):
            cur = self.get(cur)
            chain.append(cur)
        return F.filter(F.array(*chain), lambda x: x.isNotNull())

    def is_in(self, child: Column | str, ancestor: Column | str) -> Column:
        """``dictIsIn(child, ancestor)`` — ancestor appears in the
        child's hierarchy chain (including child itself)."""
        a = F.col(ancestor) if isinstance(ancestor, str) else ancestor
        return F.array_contains(self.get_hierarchy(child), a)
