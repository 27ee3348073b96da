"""Driver-gate output-shape helpers.

The driver's correctness gate canonicalizes each query result with a
pandas ``sort_values`` over all columns and hash-compares values EXACTLY
against the DuckDB oracle. Two output shapes defeat it (the three
round-13 driver failures, judge-audited to 21 registry entries):

- top-level Array/Map/Struct columns crash the pandas lexsort
  (``TypeError: unhashable type: 'list'``);
- top-level Decimal columns hash-diverge because Spark ``toPandas()``
  yields ``decimal.Decimal`` objects while DuckDB ``.df()`` lowers
  DECIMAL to float64 — numerically equal, differently hashed.

Convention (registry docstring): such queries serialize those columns
deterministically on BOTH sides —

- arrays → ``to_json`` strings. Spark's Jackson writer and DuckDB's JSON
  writer agree byte-for-byte on ints, strings, nested arrays, and null
  elements (probed round 14); they do NOT agree on doubles (Java
  ``1.0E-6`` vs DuckDB ``1e-06``), so double arrays are first formatted
  with C-style ``%.6f`` (``fmt_double_array`` here, ``list_transform(a,
  x -> printf('%.6f', x + 0.0))`` in the oracle). The ``+ 0.0``
  normalizes ``-0.0``; the null-gate matches printf's NULL propagation
  (Spark ``format_string`` would render the string ``'null'``).
- DECIMAL(p,0) wide-integer outputs → ``CAST(... AS STRING)`` /
  ``CAST(... AS VARCHAR)`` — strings, not doubles, because full-range
  UInt64/Int128 values exceed float64's 53-bit mantissa.

``tests/test_queries_registry.py::test_no_driver_incompatible_output_shapes``
lints every registered query's plan-time schema so new entries can't
regress this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Top-level output types the driver's gate cannot verify — single
# source of truth for tools/audit_shapes.py and the registry lint
# (tests/test_queries_registry.py). Array/Map/Struct crash the pandas
# canonicalizer; Decimal hash-diverges from DuckDB's float64 lowering;
# Date lands as datetime.date objects where DuckDB hands back midnight
# Timestamps (cast to timestamp or string instead).
DRIVER_BANNED_TYPES = (T.ArrayType, T.MapType, T.StructType,
                       T.DecimalType, T.DateType)


def offending_columns(schema: T.StructType) -> list[tuple[str, str]]:
    """(name, type) of every top-level column the driver gate cannot
    canonicalize/hash — empty list means driver-safe."""
    return [(f.name, f.dataType.simpleString())
            for f in schema.fields
            if isinstance(f.dataType, DRIVER_BANNED_TYPES)]


def json_arrays(df: DataFrame, *cols: str) -> DataFrame:
    """Replace each named array column with its deterministic to_json
    string (same column name), leaving the rest of the schema intact."""
    missing = set(cols) - set(df.columns)
    if missing:
        raise ValueError(f"json_arrays: columns not in frame: {missing}")
    return df.select(*[
        F.to_json(F.col(c)).alias(c) if c in cols else F.col(c)
        for c in df.columns])


def fmt_double_array(col: str | Column) -> Column:
    """array<double> → array<string> via ``%.6f`` so the JSON rendering
    matches DuckDB's ``printf('%.6f', x + 0.0)`` element-for-element
    (fixed notation, no scientific; NULL elements stay NULL).

    Domain bound (round-14 fuzz finding,
    tests/test_shapes.py::test_double_array_rendering_fuzz): the two
    engines agree byte-for-byte for |x| < 1e10. Beyond ~1e11 Java
    prints the double's EXACT decimal expansion while DuckDB's fmt
    pads the shortest-round-trip digits with zeros
    (``665221496204.312012`` vs ``665221496204.312000``) — if an entry
    ever serializes doubles that large, scale them down or emit
    integer strings instead. Every registered array stays orders of
    magnitude inside the bound (sums over the fixtures top out
    ~1e6).

    Tie bound (round-14 second finding, found live by
    ch_sql_scalar_tail_r14c): even inside the domain the engines
    disagree when a 6-dp HALF-boundary (k + 0.5)·1e-6 falls between
    the double's exact binary value and its shortest round-trip
    representation — Java's ``%.6f`` rounds the SHORTEST digits
    (``3.3/64`` → repr ``0.0515625`` → HALF_UP → ``0.051563``) while C
    printf rounds the EXACT value (``0.05156249999999999722…`` →
    ``0.051562``). The boundary must sit within one ulp of the value,
    so random data never hits it (~1e-11 per element at these
    magnitudes) — but ROUND arithmetic constants manufacture it
    reliably (dyadic quotients, error-cancelling sums, divisions that
    round to exact integers). Rule for registry entries: derive
    serialized doubles from fixture columns through at least one
    non-dyadic constant (e.g. ``/1.2999953``), never from
    integer-over-power-of-two arithmetic
    (tests/test_shapes.py::test_double_rendering_tie_class pins the
    divergent example)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.when(x.isNotNull(),
                            F.format_string("%.6f", x + F.lit(0.0))))


def json_double_arrays(df: DataFrame, *cols: str) -> DataFrame:
    """``json_arrays`` for array<double> columns: %.6f-format elements
    first, then serialize."""
    for c in cols:
        df = df.withColumn(c, fmt_double_array(c))
    return json_arrays(df, *cols)
