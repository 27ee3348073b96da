"""shapes.py — driver-gate serialization helpers (round 14).

The contract under test: Spark's to_json rendering of the serialized
columns must equal DuckDB's to_json rendering byte-for-byte, because
the driver hash-compares exact values. Doubles go through %.6f first
(Java writes 1.0E-6 where DuckDB writes 1e-06), -0.0 normalizes to
0.0, NULL elements stay null on both sides."""

import duckdb
import pytest
from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.shapes import (
    fmt_double_array,
    json_arrays,
    json_double_arrays,
)


def test_json_arrays_matches_duckdb_rendering(spark):
    sdf = spark.sql("""
        SELECT array(1, 2, 3) AS ints,
               array('a', 'b "q"', cast(null as string)) AS strs,
               array(array(1, 2), array(3)) AS nested,
               cast(null as array<bigint>) AS whole_null
    """)
    out = json_arrays(sdf, "ints", "strs", "nested", "whole_null") \
        .collect()[0]
    duck = duckdb.connect().execute("""
        SELECT to_json([1, 2, 3]),
               to_json(['a', 'b "q"', CAST(NULL AS VARCHAR)]),
               to_json([[1, 2], [3]]),
               to_json(CAST(NULL AS BIGINT[]))
    """).fetchone()
    assert (out.ints, out.strs, out.nested, out.whole_null) == duck


@pytest.mark.parametrize("vals", [
    [1.5, 1.0, 2.25],
    [0.000001, -0.0, 123456.789],   # sci-notation + neg-zero hazards
    [None, 4.5],
])
def test_double_arrays_match_duckdb_printf(spark, vals):
    lit = ", ".join("CAST(NULL AS DOUBLE)" if v is None else f"{v!r}D"
                    for v in vals)
    sdf = spark.sql(f"SELECT array({lit}) AS a")
    out = json_double_arrays(sdf, "a").collect()[0].a
    dlit = ", ".join("NULL" if v is None else repr(v) for v in vals)
    duck = duckdb.connect().execute(
        f"SELECT to_json(list_transform([{dlit}]::DOUBLE[], "
        f"x -> printf('%.6f', x + 0.0)))").fetchone()[0]
    assert out == duck


def test_fmt_double_array_null_gate(spark):
    # Spark format_string renders NULL as the string 'null' — the
    # helper must keep NULL elements NULL (DuckDB printf propagates)
    row = spark.sql(
        "SELECT array(cast(null as double), 1.0D) AS a"
    ).select(fmt_double_array("a").alias("a")).collect()[0]
    assert row.a == [None, "1.000000"]


def test_json_arrays_unknown_column_raises(spark):
    with pytest.raises(ValueError, match="not in frame"):
        json_arrays(spark.sql("SELECT array(1) AS a"), "nope")


def test_double_array_rendering_fuzz(spark):
    """Seeded random magnitudes across the %.6f danger zones
    (sub-epsilon, sci-notation thresholds, large integers, negatives,
    -0.0): the serialized Spark string must equal DuckDB's rendering
    byte-for-byte, because the driver hashes exact values.

    The contract's documented domain is |x| < 1e10 (fmt_double_array
    docstring): beyond ~1e11 Java prints the exact decimal expansion
    where DuckDB's fmt zero-pads shortest-round-trip digits — the
    fuzz sweeps the contract domain, and a companion assert pins that
    the divergence beyond it is REAL (so the bound stays honest)."""
    import random

    rng = random.Random(1414)
    vals = []
    for exp in range(-8, 10):
        for _ in range(3):
            v = rng.uniform(1, 10) * (10 ** exp) * rng.choice([1, -1])
            vals.append(round(v, 6))
    vals += [-0.0, 0.0, 123456789.123456, 9999999999.999999]
    # chunks of 6 per array
    arrays = [vals[i:i + 6] for i in range(0, len(vals), 6)]
    sel = ", ".join(
        "array(" + ", ".join(f"{v!r}D" for v in a) + f") AS a{i}"
        for i, a in enumerate(arrays))
    sdf = spark.sql(f"SELECT {sel}")
    out = json_double_arrays(sdf, *[f"a{i}" for i in range(len(arrays))]
                             ).collect()[0]
    con = duckdb.connect()
    for i, a in enumerate(arrays):
        lit = ", ".join(repr(v) for v in a)
        duck = con.execute(
            f"SELECT to_json(list_transform([{lit}]::DOUBLE[], "
            f"x -> printf('%.6f', x + 0.0)))").fetchone()[0]
        assert out[f"a{i}"] == duck, (i, a, out[f"a{i}"], duck)

    # the out-of-domain divergence is real: pin it so the documented
    # bound can't silently go stale
    big = 665221496204.312012
    sp = spark.sql(f"SELECT array({big!r}D) AS a")
    sp = json_double_arrays(sp, "a").collect()[0].a
    dk = con.execute(
        f"SELECT to_json(list_transform([{big!r}]::DOUBLE[], "
        f"x -> printf('%.6f', x + 0.0)))").fetchone()[0]
    assert sp != dk, "engines now agree beyond 1e11 — relax the bound"


def test_double_rendering_tie_class(spark):
    """Round-14 second finding (fmt_double_array docstring): INSIDE
    the |x|<1e10 domain the engines diverge when a 6-dp half-boundary
    sits between a double's exact value and its shortest round-trip
    repr — Java %.6f rounds the shortest digits, C printf the exact
    binary value. 3.3/64 is the live example ch_sql_scalar_tail_r14c
    hit (exact 0.05156249999…, repr 0.0515625)."""
    import duckdb

    sp = spark.sql("SELECT FORMAT_STRING('%.6f', 3.3D / 64) AS f"
                   ).collect()[0].f
    dk = duckdb.sql(
        "SELECT printf('%.6f', 3.3::DOUBLE / 64)").fetchone()[0]
    assert sp == "0.051563" and dk == "0.051562", (sp, dk)
    # a non-dyadic perturbation clears the tie on both engines
    sp2 = spark.sql(
        "SELECT FORMAT_STRING('%.6f', 3.3D / 64.0000071D) AS f"
        ).collect()[0].f
    dk2 = duckdb.sql(
        "SELECT printf('%.6f', 3.3::DOUBLE / 64.0000071::DOUBLE)"
        ).fetchone()[0]
    assert sp2 == dk2
