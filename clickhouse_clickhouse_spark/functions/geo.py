"""Geo scalar functions (SURVEY.md §2.8 geo family): geohashEncode /
geohashDecode (reference src/Functions/geohash.cpp) and pointInPolygon
(reference src/Functions/pointInPolygon.cpp, ray-casting form).

All are UNROLLED constant-folded column expressions — the bit loops and
polygon-edge loop run in Python at plan-build time over literal
constants, so the emitted plan is pure codegen arithmetic (no UDF, no
shuffle). Matching DuckDB oracle SQL is generated from the same
constants by the ``*_oracle_expr`` helpers, keeping both sides of the
correctness gate mechanically in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _interleave_terms(lon_q: Column, lat_q: Column, half_bits: int) -> Column:
    """Morton-interleave two half_bits-wide ints, lon in the higher
    (odd) positions — geohash bit order (lon bit first from MSB)."""
    code = F.lit(0).cast("long")
    for j in range(half_bits):
        code = code + F.shiftleft(
            F.shiftright(lon_q, j).bitwiseAND(F.lit(1)), 2 * j + 1)
        code = code + F.shiftleft(
            F.shiftright(lat_q, j).bitwiseAND(F.lit(1)), 2 * j)
    return code


def geohash_encode(lon: Column, lat: Column, precision: int = 6) -> Column:
    """``geohashEncode(lon, lat, p)`` → base32 string. Even precisions
    only (equal lon/lat bit split, 5p/2 bits each)."""
    if precision % 2:
        raise ValueError("geohash_encode: even precision only")
    half = 5 * precision // 2
    scale = 1 << half
    lon_q = F.least(F.floor((lon + 180.0) / 360.0 * scale).cast("long"),
                    F.lit(scale - 1))
    lat_q = F.least(F.floor((lat + 90.0) / 180.0 * scale).cast("long"),
                    F.lit(scale - 1))
    code = _interleave_terms(lon_q, lat_q, half)
    alpha = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    chars = [
        F.element_at(alpha, (F.shiftright(code, 5 * (precision - 1 - k))
                             .bitwiseAND(F.lit(31)) + 1).cast("int"))
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_decode(gh: Column, precision: int = 6) -> Column:
    """``geohashDecode(s)`` → struct(lon, lat) cell-center. Inverse of
    :func:`geohash_encode` (same even-precision restriction)."""
    if precision % 2:
        raise ValueError("geohash_decode: even precision only")
    half = 5 * precision // 2
    scale = 1 << half
    alpha = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    code = F.lit(0).cast("long")
    for k in range(precision):
        idx = (F.array_position(alpha, F.substring(gh, k + 1, 1)) - 1)
        code = code + F.shiftleft(idx, 5 * (precision - 1 - k))
    lon_q = F.lit(0).cast("long")
    lat_q = F.lit(0).cast("long")
    for j in range(half):
        lon_q = lon_q + F.shiftleft(
            F.shiftright(code, 2 * j + 1).bitwiseAND(F.lit(1)), j)
        lat_q = lat_q + F.shiftleft(
            F.shiftright(code, 2 * j).bitwiseAND(F.lit(1)), j)
    lon = (lon_q.cast("double") + 0.5) / scale * 360.0 - 180.0
    lat = (lat_q.cast("double") + 0.5) / scale * 180.0 - 90.0
    return F.struct(lon.alias("lon"), lat.alias("lat"))


def geohash_oracle_expr(lon_sql: str, lat_sql: str, precision: int = 6) -> str:
    """DuckDB SQL computing the same geohash from the same constants."""
    half = 5 * precision // 2
    scale = 1 << half
    lon_q = (f"least(CAST(floor(({lon_sql} + 180.0) / 360.0 * {scale}) "
             f"AS BIGINT), {scale - 1})")
    lat_q = (f"least(CAST(floor(({lat_sql} + 90.0) / 180.0 * {scale}) "
             f"AS BIGINT), {scale - 1})")
    terms = []
    for j in range(half):
        terms.append(f"((({lon_q} >> {j}) & 1) << {2 * j + 1})")
        terms.append(f"((({lat_q} >> {j}) & 1) << {2 * j})")
    code = "(" + " + ".join(terms) + ")"
    chars = [
        f"substring('{GEOHASH_ALPHABET}', "
        f"CAST((({code} >> {5 * (precision - 1 - k)}) & 31) + 1 AS INT), 1)"
        for k in range(precision)
    ]
    return " || ".join(chars)


def point_in_polygon(px: Column, py: Column,
                     polygon: list[tuple[float, float]]) -> Column:
    """``pointInPolygon((x,y), poly)`` via even-odd ray casting: for each
    edge crossing the point's horizontal line, toggle if the point is
    left of the intersection. Horizontal edges never toggle (skipped at
    plan-build time, which also avoids the 0/0 interpolation)."""
    inside = F.lit(False)
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue
        straddles = (F.lit(float(y1)) > py) != (F.lit(float(y2)) > py)
        xint = (F.lit(float(x2 - x1)) * (py - F.lit(float(y1)))
                / F.lit(float(y2 - y1)) + F.lit(float(x1)))
        toggle = straddles & (px < xint)
        inside = F.when(toggle, ~inside).otherwise(inside)
    return inside


def point_in_polygon_oracle_expr(px_sql: str, py_sql: str,
                                 polygon: list[tuple[float, float]]) -> str:
    """DuckDB SQL: crossing-count parity with the identical arithmetic."""
    cases = []
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue
        cases.append(
            f"CASE WHEN (({y1!r} > {py_sql}) != ({y2!r} > {py_sql})) "
            f"AND ({px_sql} < {float(x2 - x1)!r} * ({py_sql} - {y1!r}) "
            f"/ {float(y2 - y1)!r} + {x1!r}) THEN 1 ELSE 0 END")
    return "((" + " + ".join(cases) + ") % 2 = 1)"
