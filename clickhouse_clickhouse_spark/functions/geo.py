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

    # bind `code` ONCE as a lambda variable before the 2·half bit
    # extractions below reference it — bare Column reuse deep-copies the
    # whole decode subtree per reference (30 copies blew analysis to
    # ~50 s; the bound variable is a leaf node)
    def unpack(c: Column) -> Column:
        lon_q = F.lit(0).cast("long")
        lat_q = F.lit(0).cast("long")
        for j in range(half):
            lon_q = lon_q + F.shiftleft(
                F.shiftright(c, 2 * j + 1).bitwiseAND(F.lit(1)), j)
            lat_q = lat_q + F.shiftleft(
                F.shiftright(c, 2 * j).bitwiseAND(F.lit(1)), j)
        lon = (lon_q.cast("double") + 0.5) / scale * 360.0 - 180.0
        lat = (lat_q.cast("double") + 0.5) / scale * 180.0 - 90.0
        return F.struct(lon.alias("lon"), lat.alias("lat"))

    return F.element_at(F.transform(F.array(code), unpack), 1)


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


# -- Hierarchical tile cells + hexagonal binning (h3/s2-class capability) --
#
# The reference exposes h3*/s2* cell indexing (upstream [U]
# src/Functions/h3*.cpp, s2*.cpp — bindings to the native libs, which
# are not in this environment and whose cell ids are bit-parity-bound to
# those libraries). The *capability* those functions provide — map a
# point to a hierarchical cell id for binning/joining, walk cell
# neighborhoods — is covered here with two public schemes that are pure
# arithmetic and therefore oracle-checkable:
#
# - Web-Mercator slippy tiles + Bing quadkeys (OSM/Bing public
#   algorithm): hierarchical quad cells, prefix-of-quadkey = ancestor —
#   the s2-style hierarchy property.
# - Axial hex binning on the Web-Mercator plane with cube rounding
#   (Red Blob Games' public hex-grid construction): equal-size planar
#   hexes — the h3-style "hex binning at scale" use-case. NOT
#   bit-compatible with H3 ids (documented; H3's icosahedral projection
#   needs its base-cell tables), but neighbor arithmetic (the 6 axial
#   offsets) and bucketing semantics carry over.
#
# Only +,-,*,/ and tan/ln/atan/exp touch floats; basic IEEE arithmetic
# is bit-identical across engines, and the libm calls would need to land
# within 1 ulp of a cell boundary to flip a floor() — the oracle-expr
# generators below emit the SAME formula with the SAME Python-computed
# literal constants, so both engines evaluate the identical expression
# tree.

_MERC_R = 6378137.0


def lat_lng_to_tile(lat: Column, lon: Column, z: int) -> Column:
    """Slippy-map tile at zoom ``z``: struct(tx, ty). Public OSM
    formula: tx = floor((lon+180)/360 * 2^z), ty via the Mercator
    y-projection. Inputs clamped to the Web-Mercator latitude bound."""
    n = 1 << z
    la = F.greatest(F.least(lat, F.lit(85.05112878)), F.lit(-85.05112878))
    rad = F.radians(la)
    tx = F.least(F.floor((lon + 180.0) / 360.0 * n).cast("long"),
                 F.lit(n - 1))
    merc = F.log(F.tan(rad) + 1.0 / F.cos(rad))
    ty = F.least(F.floor((1.0 - merc / F.lit(3.141592653589793)) / 2.0 * n)
                 .cast("long"), F.lit(n - 1))
    tx = F.greatest(tx, F.lit(0))
    ty = F.greatest(ty, F.lit(0))
    return F.struct(tx.alias("tx"), ty.alias("ty"))


def tile_quadkey(tx: Column, ty: Column, z: int) -> Column:
    """Bing quadkey for a tile: z base-4 digits MSB-first, digit =
    x-bit + 2*y-bit. An ancestor cell's quadkey is a string prefix of
    its descendants' — the hierarchy join/rollup property."""
    digits = [
        (F.shiftright(tx, i).bitwiseAND(F.lit(1))
         + F.shiftright(ty, i).bitwiseAND(F.lit(1)) * 2).cast("string")
        for i in range(z - 1, -1, -1)
    ]
    return F.concat(*digits)


def tile_center(tx: Column, ty: Column, z: int) -> Column:
    """struct(lon, lat) of a tile's center (inverse slippy formula;
    sinh written out as (exp(x)-exp(-x))/2 so both engines evaluate the
    same primitive calls)."""
    n = 1 << z
    lon = (tx.cast("double") + 0.5) / n * 360.0 - 180.0
    m = F.lit(3.141592653589793) * (1.0 - 2.0 * (ty.cast("double") + 0.5) / n)
    sinh_m = (F.exp(m) - F.exp(-m)) / 2.0
    lat = F.degrees(F.atan(sinh_m))
    return F.struct(lon.alias("lon"), lat.alias("lat"))


def _merc_xy(lat: Column, lon: Column) -> tuple[Column, Column]:
    la = F.greatest(F.least(lat, F.lit(85.05112878)), F.lit(-85.05112878))
    mx = F.lit(_MERC_R) * F.radians(lon)
    my = F.lit(_MERC_R) * F.log(F.tan(F.lit(0.7853981633974483)
                                      + F.radians(la) / 2.0))
    return mx, my


def hex_bin(lat: Column, lon: Column, size_m: float) -> Column:
    """Axial hex-cell id struct(hq, hr) for a point: pointy-top hexes of
    circumradius ``size_m`` meters on the Web-Mercator plane, fractional
    axial coords cube-rounded to the containing cell. The 6 neighbors of
    (q, r) are the fixed axial offsets (+1,0)(+1,-1)(0,-1)(-1,0)(-1,+1)
    (0,+1) — k-ring expansion is pure integer arithmetic."""
    mx, my = _merc_xy(lat, lon)
    q = (F.lit(0.5773502691896258) * mx - F.lit(1.0) / 3.0 * my) / size_m
    r = (F.lit(2.0) / 3.0 * my) / size_m
    rx, ry, rz = F.round(q, 0), F.round(-q - r, 0), F.round(r, 0)
    dx, dy, dz = F.abs(rx - q), F.abs(ry - (-q - r)), F.abs(rz - r)
    hq = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    hr = F.when(~((dx > dy) & (dx > dz)) & ~(dy > dz), -rx - ry).otherwise(rz)
    return F.struct(hq.cast("long").alias("hq"), hr.cast("long").alias("hr"))


def tile_oracle_exprs(lat_sql: str, lon_sql: str, z: int) -> tuple[str, str]:
    """DuckDB SQL for (tx, ty) — the identical formula and constants."""
    n = 1 << z
    la = f"greatest(least({lat_sql}, 85.05112878), -85.05112878)"
    rad = f"radians({la})"
    tx = (f"greatest(least(CAST(floor(({lon_sql} + 180.0) / 360.0 * {n}) "
          f"AS BIGINT), {n - 1}), 0)")
    merc = f"ln(tan({rad}) + 1.0 / cos({rad}))"
    ty = (f"greatest(least(CAST(floor((1.0 - {merc} / 3.141592653589793) "
          f"/ 2.0 * {n}) AS BIGINT), {n - 1}), 0)")
    return tx, ty


def quadkey_oracle_expr(tx_sql: str, ty_sql: str, z: int) -> str:
    digits = [
        f"CAST((({tx_sql} >> {i}) & 1) + (({ty_sql} >> {i}) & 1) * 2 "
        f"AS VARCHAR)"
        for i in range(z - 1, -1, -1)
    ]
    return " || ".join(digits)


def hex_bin_oracle_exprs(lat_sql: str, lon_sql: str,
                         size_m: float) -> tuple[str, str]:
    """DuckDB SQL for (hq, hr) with the identical cube rounding."""
    la = f"greatest(least({lat_sql}, 85.05112878), -85.05112878)"
    mx = f"({_MERC_R!r} * radians({lon_sql}))"
    my = f"({_MERC_R!r} * ln(tan(0.7853981633974483 + radians({la}) / 2.0)))"
    q = f"((0.5773502691896258 * {mx} - 1.0 / 3.0 * {my}) / {size_m!r})"
    r = f"((2.0 / 3.0 * {my}) / {size_m!r})"
    rx, ry, rz = f"round({q})", f"round(-{q} - {r})", f"round({r})"
    dx = f"abs({rx} - {q})"
    dy = f"abs({ry} - (-{q} - {r}))"
    dz = f"abs({rz} - {r})"
    big_dx = f"({dx} > {dy} AND {dx} > {dz})"
    hq = f"CAST(CASE WHEN {big_dx} THEN -{ry} - {rz} ELSE {rx} END AS BIGINT)"
    hr = (f"CAST(CASE WHEN NOT {big_dx} AND NOT ({dy} > {dz}) "
          f"THEN -{rx} - {ry} ELSE {rz} END AS BIGINT)")
    return hq, hr


def hex_kring(hq: Column, hr: Column, k: int) -> Column:
    """All axial cells within hex distance ``k`` of (hq, hr) — the
    h3 kRing analog (upstream [U] src/Functions/h3kRing.cpp). Pure
    integer arithmetic unrolled at plan-build time: the ring-k disc is
    the fixed offset set {(dq, dr): |dq|<=k, |dr|<=k, |dq+dr|<=k},
    (2k+1)cells^2-ish (3k^2+3k+1 cells). Returns array<struct<hq,hr>>
    ordered by (dq, dr) — deterministic for joins/rollups."""
    cells = []
    for dq in range(-k, k + 1):
        for dr in range(-k, k + 1):
            if abs(dq + dr) <= k:
                cells.append(F.struct(
                    (hq + dq).cast("long").alias("hq"),
                    (hr + dr).cast("long").alias("hr")))
    return F.array(*cells)
