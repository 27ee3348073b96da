"""Window-function-adjacent helpers (SURVEY.md §2.5, §2.6).

All reference window functions map 1:1 onto ``pyspark.sql.Window``; these
are the two composed idioms the reference exposes as syntax.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def qualify(df: DataFrame, window_col: Column, predicate) -> DataFrame:
    """``QUALIFY`` — filter on a window-function result without exposing the
    helper column. ``predicate`` is a callable Column -> Column."""
    tmp = df.withColumn("__q", window_col)
    return tmp.filter(predicate(F.col("__q"))).drop("__q")


def _normalize_ties_spec(order_by):
    """Each item: ``"col"`` | ``(col, asc)`` | ``(col, asc, nulls_first)``.
    Default null placement mirrors the reference (NULL sorts greatest:
    last for ASC, first for DESC) — Spark's default is the opposite."""
    spec = []
    for item in order_by:
        if isinstance(item, str):
            spec.append((item, True, False))
        else:
            col, asc = item[0], bool(item[1])
            nf = bool(item[2]) if len(item) > 2 else (not asc)
            spec.append((col, asc, nf))
    return spec


def _sort_cols(spec, reverse=False):
    out = []
    for col, asc, nf in spec:
        a, f = (not asc, not nf) if reverse else (asc, nf)
        c = F.col(col)
        out.append((c.asc_nulls_first() if f else c.asc_nulls_last()) if a
                   else (c.desc_nulls_first() if f else c.desc_nulls_last()))
    return out


def _sorts_before(spec, left_prefix: str = "",
                  boundary_prefix: str = "__b_") -> Column:
    """Lexicographic ``row < boundary`` under an arbitrary per-key
    direction / null-placement spec — generated as plain boolean columns
    (no UDF): OR over key positions of (all earlier keys null-safe-equal
    AND this key strictly before)."""
    disjuncts = []
    eq_so_far = F.lit(True)
    for col, asc, nulls_first in spec:
        k, b = F.col(left_prefix + col), F.col(boundary_prefix + col)
        if asc:
            strict = k < b
        else:
            strict = k > b
        # NULL vs non-NULL ordering per the key's null placement;
        # NULL vs NULL is never strictly-before.
        null_before = (k.isNull() & b.isNotNull()) if nulls_first \
            else (k.isNotNull() & b.isNull())
        before = F.coalesce(strict, F.lit(False)) | null_before
        disjuncts.append(eq_so_far & before)
        eq_so_far = eq_so_far & k.eqNullSafe(b)
    out = disjuncts[0]
    for d in disjuncts[1:]:
        out = out | d
    return out


def limit_with_ties(df: DataFrame, n: int,
                    order_by: Sequence) -> DataFrame:
    """``LIMIT n WITH TIES`` (reference ``LimitTransform`` ties mode)
    without a global rank window: pass 1 reduces ``orderBy().limit(n)``
    (TakeOrderedAndProject — per-partition top-n heaps, no
    single-partition exchange) to the nth row's sort-key tuple (re-sorted
    descending, LIMIT 1); pass 2 keeps every row whose key tuple
    null-safe-equals that broadcast boundary OR sorts strictly before it
    under the given spec — rows tying the nth value are included, exactly
    RANK() <= n semantics without the single-partition rank exchange.

    ``order_by`` items: a column name (ascending, reference null order)
    or ``(name, asc[, nulls_first])`` tuples for DESC / explicit null
    placement."""
    spec = _normalize_ties_spec(order_by)
    names = [c for c, _, _ in spec]
    boundary = (df.select(*[F.col(c) for c in names])
                .orderBy(*_sort_cols(spec)).limit(n)
                .orderBy(*_sort_cols(spec, reverse=True)).limit(1)
                .select(*[F.col(c).alias(f"__b_{c}") for c in names]))
    eq = F.lit(True)
    for c in names:
        eq = eq & F.col(c).eqNullSafe(F.col(f"__b_{c}"))
    keep = eq | _sorts_before(spec)
    return (df.crossJoin(F.broadcast(boundary))
            .filter(keep).drop(*[f"__b_{c}" for c in names]))
