"""Vectorized 2-D Hilbert-curve codecs (optimization round 14).

The dialect's hilbertEncode/hilbertDecode were 31-step ``AGGREGATE``
folds — higher-order functions are CodegenFallback, so every step ran
interpreted and rebuilt a 3-field struct per row (~62 interpreted fold
steps/row; the roundtrip measured ~3.9 s for 100 k rows on one core,
and the fold's presence pushed the WHOLE enclosing projection out of
whole-stage codegen). The same xy2d / d2xy construction (Wikipedia
"Hilbert curve" public-domain pseudocode, bit-identical to the SQL fold
it replaces — same fixed order 31, same N-1 rotation constant) runs
here as a 31-iteration loop over whole numpy int64 arrays inside an
Arrow-batched pandas UDF: per-row cost drops from ~40 µs interpreted to
~0.2 µs vectorized (guide §4.2 — hand batches to vectorized native
code when the JVM path is interpreted row-at-a-time).

Bounds contracts match the SQL templates exactly: encode raises on
coordinates outside [0, 2^31), decode on codes outside [0, 2^62); NULL
inputs yield NULL outputs (never an error), like the SQL guard chain.

Upstream: [U] src/Functions/hilbertEncode2DLUT.h (a state-machine LUT;
values beyond the pinned docs example hilbertEncode(3,4)=31 are NOT
guaranteed bit-parity with it — documented stance unchanged).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

_UDFS: dict = {}

_N1 = (1 << 31) - 1  # order-31 curve: coordinates in [0, 2^31)


def hilbert_encode_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """xy2d at fixed order 31 over int64 arrays. Mirrors the SQL fold
    step for step: i = 30..0, d += ((3*rx)^ry) << 2i, then the fixed
    (N-1)-rotation."""
    if ((x < 0) | (x > _N1) | (y < 0) | (y > _N1)).any():
        raise ValueError("hilbertEncode: coordinates must be in [0, 2^31)")
    X = x.copy()
    Y = y.copy()
    d = np.zeros_like(X)
    for i in range(30, -1, -1):
        rx = (X >> i) & 1
        ry = (Y >> i) & 1
        d += ((3 * rx) ^ ry) << (2 * i)
        swap = ry == 0
        flip = swap & (rx == 1)
        nx = np.where(swap, np.where(flip, _N1 - Y, Y), X)
        ny = np.where(swap, np.where(flip, _N1 - X, X), Y)
        X, Y = nx, ny
    return d


def hilbert_decode_np(t: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """d2xy at fixed order 31: i = 0..30, rotate by (s-1) then offset by
    s*rx / s*ry, consuming two code bits per level — same step as the
    SQL fold."""
    if ((t < 0) | (t >= (1 << 62))).any():
        raise ValueError("hilbertDecode: code must be in [0, 2^62)")
    T = t.copy()
    x = np.zeros_like(T)
    y = np.zeros_like(T)
    for i in range(31):
        s = np.int64(1) << i
        rx = (T >> 1) & 1
        ry = (T ^ rx) & 1
        swap = ry == 0
        flip = swap & (rx == 1)
        nx = np.where(swap, np.where(flip, s - 1 - y, y), x) + s * rx
        ny = np.where(swap, np.where(flip, s - 1 - x, x), y) + s * ry
        x, y = nx, ny
        T = T >> 2
    return x, y


def _masked_long_pair(a: pd.Series, b: pd.Series):
    """(int64 arrays with NULL rows zero-filled, combined null mask)."""
    na = a.isna() | b.isna()
    av = a.fillna(0).to_numpy(dtype=np.int64)
    bv = b.fillna(0).to_numpy(dtype=np.int64)
    return av, bv, na.to_numpy()


def gcd_udf():
    """Exact twin of the old Euclid SQL fold: gcd(0,0)=0, negatives via
    ABS (np.gcd already takes absolute values), NULL in → NULL out."""
    if "gcd" not in _UDFS:
        @pandas_udf("bigint")
        def _gcd(a: pd.Series, b: pd.Series) -> pd.Series:
            av, bv, na = _masked_long_pair(a, b)
            out = np.gcd(av, bv)
            if na.any():
                res = pd.Series(out, dtype="Int64")
                res[na] = None
                return res
            return pd.Series(out)
        _UDFS["gcd"] = _gcd
    return _UDFS["gcd"]


def lcm_udf():
    """Exact twin of the old SQL form ``IF(a=0 OR b=0, 0,
    ABS(a DIV gcd * b))``: the division is exact (gcd divides a, so
    floor == truncate), the product wraps in int64 like the ANSI-off
    SQL multiply, and ABS wraps on INT64_MIN the same way."""
    if "lcm" not in _UDFS:
        @pandas_udf("bigint")
        def _lcm(a: pd.Series, b: pd.Series) -> pd.Series:
            av, bv, na = _masked_long_pair(a, b)
            g = np.gcd(av, bv)
            zero = (av == 0) | (bv == 0)
            with np.errstate(over="ignore"):
                out = np.where(zero, np.int64(0),
                               np.abs((av // np.where(zero, 1, g)) * bv))
            if na.any():
                res = pd.Series(out, dtype="Int64")
                res[na] = None
                return res
            return pd.Series(out)
        _UDFS["lcm"] = _lcm
    return _UDFS["lcm"]


def hilbert_encode_udf():
    if "henc" not in _UDFS:
        @pandas_udf("bigint")
        def _henc(x: pd.Series, y: pd.Series) -> pd.Series:
            xv, yv, na = _masked_long_pair(x, y)
            if na.any():
                # guard only the non-null rows (NULL in → NULL out, no
                # error — matches the SQL IF-guard chain)
                keep = ~na
                out = np.zeros(len(xv), dtype=np.int64)
                out[keep] = hilbert_encode_np(xv[keep], yv[keep])
                res = pd.Series(out, dtype="Int64")
                res[na] = None
                return res
            return pd.Series(hilbert_encode_np(xv, yv))
        _UDFS["henc"] = _henc
    return _UDFS["henc"]


def morton_encode_np(coords: list[np.ndarray]) -> np.ndarray:
    """k-ary Morton interleave over int64 arrays: bit j of input i lands
    at bit k*j + i (same convention as the SQL template it replaces —
    only the low 64//k bits of each coordinate participate, and bit
    extraction ``(c >> j) & 1`` is shift-kind-agnostic)."""
    k = len(coords)
    bits = 64 // k
    out = np.zeros_like(coords[0])
    for i, c in enumerate(coords):
        for j in range(bits):
            out |= ((c >> j) & 1) << (k * j + i)
    return out


def morton_decode_np(k: int, code: np.ndarray) -> list[np.ndarray]:
    """Inverse interleave: field i collects bits k*j + i of the code."""
    bits = 64 // k
    outs = []
    for i in range(k):
        x = np.zeros_like(code)
        for j in range(bits):
            x |= ((code >> (k * j + i)) & 1) << j
        outs.append(x)
    return outs


def morton_encode_udf(k: int):
    """Arity-k encode UDF (pandas UDFs are fixed-arity, so one
    registration per supported k). NULL in any coordinate → NULL out,
    like the SQL bitwise chain."""
    key = f"menc{k}"
    if key not in _UDFS:
        @pandas_udf("bigint")
        def _menc(*cols: pd.Series) -> pd.Series:
            na = cols[0].isna()
            for c in cols[1:]:
                na = na | c.isna()
            arrs = [c.fillna(0).to_numpy(dtype=np.int64) for c in cols]
            out = morton_encode_np(arrs)
            if na.any():
                res = pd.Series(out, dtype="Int64")
                res[na.to_numpy()] = None
                return res
            return pd.Series(out)
        _UDFS[key] = _menc
    return _UDFS[key]


def morton_decode_udf(k: int):
    """Dimension-k decode UDF returning struct<_1.._k: bigint>. A NULL
    code yields a struct of NULL FIELDS — exactly what the old SQL
    template's NAMED_STRUCT over NULL bitwise terms produced (NOT a
    null struct, unlike hilbertDecode's fold)."""
    key = f"mdec{k}"
    if key not in _UDFS:
        fields = ", ".join(f"_{i + 1}: bigint" for i in range(k))

        @pandas_udf(f"struct<{fields}>")
        def _mdec(c: pd.Series) -> pd.DataFrame:
            na = c.isna().to_numpy()
            cv = c.fillna(0).to_numpy(dtype=np.int64)
            outs = morton_decode_np(k, cv)
            if na.any():
                df = pd.DataFrame({f"_{i + 1}": pd.Series(v, dtype="Int64")
                                   for i, v in enumerate(outs)})
                df.loc[na, :] = None
                return df
            return pd.DataFrame({f"_{i + 1}": v for i, v in enumerate(outs)})
        _UDFS[key] = _mdec
    return _UDFS[key]


_READABLE_UNITS = {
    "B": 1.0, "KB": 1e3, "KIB": 1024.0,
    "MB": 1e6, "MIB": 1048576.0,
    "GB": 1e9, "GIB": 1073741824.0,
    "TB": 1e12, "TIB": 1099511627776.0,
    "PB": 1e15, "PIB": 1125899906842624.0,
    "EB": 1e18, "EIB": 1152921504606846976.0,
}
_I64_MAX = (1 << 63) - 1
_I64_MIN = -(1 << 63)


def parse_readable_udf(mode: str):
    """parseReadableSize[OrNull/OrZero] kernel (optimization round 15):
    the SQL template was a _bind_once binder (two REGEXP_EXTRACTs + two
    26-arm CASE chains per row) that kept the whole enclosing projection
    on the interpreted path. Exact twin of the template: same anchored
    ASCII regex, correctly-rounded float parse (Python float() ==
    Java Double.parseDouble), exact double multiply, CEIL then the
    ANSI-off saturating double→BIGINT cast. Unparsable input — and NULL
    input, which the template's `n = '' OR unit-CASE IS NULL` condition
    routes to the same branch (NULL OR TRUE = TRUE) — raises / NULLs /
    zeroes per mode, template-verified. Strict mode's error surfaces as
    a PythonException rather than RAISE_ERROR's SparkRuntimeException
    (same stance as the hilbert bounds guards — pinned in tests)."""
    import math
    import re as _re

    key = f"readable_{mode}"
    if key not in _UDFS:
        rx = _re.compile(r"^\s*([0-9]+(?:\.[0-9]+)?)\s*([A-Za-z]+)\s*$",
                         _re.ASCII)

        def one(s):
            m = rx.match(s) if s is not None else None
            mult = _READABLE_UNITS.get(m.group(2).upper()) if m else None
            if m is None or mult is None:
                if mode == "strict":
                    raise ValueError(
                        "parseReadableSize: cannot parse "
                        + ("NULL" if s is None else s))
                return None if mode == "null" else 0
            v = float(m.group(1)) * mult
            if math.isinf(v):
                return _I64_MAX if v > 0 else _I64_MIN
            return max(_I64_MIN, min(_I64_MAX, math.ceil(v)))

        @pandas_udf("bigint")
        def _parse(s: pd.Series) -> pd.Series:
            return pd.Series([one(x) for x in s], dtype="Int64")

        _UDFS[key] = _parse
    return _UDFS[key]


# WGS-84 local-radius great circle — kernel twin of the retired
# _geo_distance_tpl binder ([U] src/Functions/greatCircleDistance.cpp
# geoDistance method): haversine angle on the Earth radius at the mean
# latitude, R(phi) from the WGS-84 ellipsoid (a = 6378137,
# b = 6356752.314245). numpy trig may differ from JVM Math in the last
# ulp; every declared consumer rounds (3 dp), and rounded outputs are
# verified value-identical against the SQL form on all fixture SFs.
#
# NULL fidelity: the template's NULL behavior is an artifact of Spark's
# null-skipping LEAST/GREATEST — a NULL *longitude* NULLs the haversine
# term, GREATEST(NULL, -1) = -1, and the result is pi * R(mla) (the
# half-circumference at the mean latitude), while a NULL *latitude*
# also NULLs mla and hence R, so the product is NULL. The pandas
# boundary folds NULL and NaN into one NaN, so the template's two
# null-mask predicates come in as extra boolean args and the kernel
# replays each path exactly (NaN values — distinguishable from NULL via
# the masks — propagate through the arithmetic as in the SQL form:
# a NaN haversine term clips to ACOS(1) = 0 because LEAST(NaN, 1) = 1).
_GEO_A2 = 40680631590769.0          # a^2
_GEO_B2 = 40408299984661.453        # b^2


def geo_distance_udf():
    if "geodist" not in _UDFS:
        @pandas_udf("double")
        def _geo(lo1: pd.Series, la1: pd.Series,
                 lo2: pd.Series, la2: pd.Series,
                 lat_null: pd.Series, lon_null: pd.Series) -> pd.Series:
            latn = lat_null.fillna(False).to_numpy(dtype=bool)
            lonn = lon_null.fillna(False).to_numpy(dtype=bool)
            # no na_value fill: NULL arrives as NaN and the masks carry
            # the NULL-ness; genuine NaN VALUES must keep propagating
            # through the arithmetic exactly like the SQL form
            x1 = np.radians(lo1.to_numpy(dtype=np.float64))
            y1 = np.radians(la1.to_numpy(dtype=np.float64))
            x2 = np.radians(lo2.to_numpy(dtype=np.float64))
            y2 = np.radians(la2.to_numpy(dtype=np.float64))
            mla = np.radians((la1.to_numpy(dtype=np.float64)
                              + la2.to_numpy(dtype=np.float64)) / 2.0)
            inner = (np.sin(y1) * np.sin(y2)
                     + np.cos(y1) * np.cos(y2) * np.cos(x2 - x1))
            # LEAST(GREATEST(x, -1), 1) with Spark's NaN-sorts-highest:
            # GREATEST(NaN, -1) = NaN, LEAST(NaN, 1) = 1.0
            inner = np.where(np.isnan(inner), 1.0,
                             np.clip(inner, -1.0, 1.0))
            ang = np.arccos(inner)
            c, s = np.cos(mla), np.sin(mla)
            r = np.sqrt((_GEO_A2 * c * _GEO_A2 * c
                         + _GEO_B2 * s * _GEO_B2 * s)
                        / (_GEO_A2 * c * c + _GEO_B2 * s * s))
            # NULL longitude only: haversine term NULL -> GREATEST
            # skips it -> ACOS(-1) = pi; R(mla) is still defined.
            out = np.where(lonn & ~latn, np.pi * r, ang * r)
            # ArrowDtype return: the plain float64 path re-masks NaN
            # VALUES as nulls at the pandas->Arrow boundary, but the
            # SQL form emits NaN (not NULL) for NaN latitudes — build
            # the Arrow array directly so only the lat-null rows are
            # null and NaN stays a value.
            import pyarrow as pa
            arr = pa.array(out, type=pa.float64(), from_pandas=False,
                           mask=latn if latn.any() else None)
            return pd.Series(arr, dtype=pd.ArrowDtype(pa.float64()))
        _UDFS["geodist"] = _geo
    return _UDFS["geodist"]


_GEOHASH_ALPHABET = np.array(
    list("0123456789bcdefghjkmnpqrstuvwxyz"))


def geohash_encode_udf(p: int):
    """geohashEncode kernel (optimization round 15): the dialect
    template's nested _bind_once binder (interpreted 2·half-term
    interleave + p substring extractions per row) was the last
    CodegenFallback site in the curves projection. Bit-exact twin of
    the SQL form: the quantization doubles ((lon+180)/360*scale) are
    the same IEEE ops, FLOOR + the ANSI-off double→BIGINT cast is
    replayed including its NaN→0 and saturation behavior, LEAST(…,
    scale-1) has no lower clamp (out-of-range coordinates wrap through
    the shifts exactly like the SQL chain). NULL-ness comes in as
    per-coordinate mask args because the pandas boundary folds NULL
    and NaN, and the SQL form treats them differently: a NULL
    coordinate NULLs its FLOOR term and the null-skipping LEAST then
    yields scale-1 (the top cell), while a NaN coordinate casts to 0
    (Java (long)NaN) and quantizes to cell 0 — template-verified, so
    the output is never NULL."""
    if p % 2 or not 2 <= p <= 12:
        raise ValueError("geohash_encode_udf: even precision in [2, 12]")
    key = f"ghenc{p}"
    if key not in _UDFS:
        half = 5 * p // 2
        scale = np.int64(1) << half

        def quant(v: np.ndarray, null_mask: np.ndarray,
                  lo: float, span: float) -> np.ndarray:
            f = np.floor((v + lo) / span * np.float64(scale))
            # Java (long) double: NaN -> 0, +/-inf saturates
            q = np.where(np.isnan(f), np.int64(0),
                         np.clip(f, -9.223372036854776e18,
                                 9.223372036854775e18)).astype(np.int64)
            q = np.minimum(q, scale - 1)
            # NULL coordinate: FLOOR term NULL -> LEAST skips it
            return np.where(null_mask, scale - 1, q)

        @pandas_udf("string")
        def _ghenc(lon: pd.Series, lat: pd.Series,
                   lon_null: pd.Series, lat_null: pd.Series) -> pd.Series:
            lonn = lon_null.fillna(False).to_numpy(dtype=bool)
            latn = lat_null.fillna(False).to_numpy(dtype=bool)
            lq = quant(lon.to_numpy(dtype=np.float64), lonn, 180.0, 360.0)
            tq = quant(lat.to_numpy(dtype=np.float64), latn, 90.0, 180.0)
            code = np.zeros_like(lq)
            for j in range(half):
                code |= ((lq >> j) & 1) << (2 * j + 1)
                code |= ((tq >> j) & 1) << (2 * j)
            chars = [
                _GEOHASH_ALPHABET[(code >> (5 * (p - 1 - k))) & 31]
                for k in range(p)
            ]
            out = chars[0].astype(object)
            for c in chars[1:]:
                out = out + c
            return pd.Series(out, dtype=object)

        _UDFS[key] = _ghenc
    return _UDFS[key]


def hilbert_decode_udf():
    if "hdec" not in _UDFS:
        @pandas_udf("struct<_1: bigint, _2: bigint>")
        def _hdec(c: pd.Series) -> pd.DataFrame:
            na = c.isna().to_numpy()
            cv = c.fillna(0).to_numpy(dtype=np.int64)
            if na.any():
                keep = ~na
                x = np.zeros(len(cv), dtype=np.int64)
                y = np.zeros(len(cv), dtype=np.int64)
                x[keep], y[keep] = hilbert_decode_np(cv[keep])
                df = pd.DataFrame({"_1": pd.Series(x, dtype="Int64"),
                                   "_2": pd.Series(y, dtype="Int64")})
                df.loc[na, "_1"] = None
                df.loc[na, "_2"] = None
                return df
            x, y = hilbert_decode_np(cv)
            return pd.DataFrame({"_1": x, "_2": y})
        _UDFS["hdec"] = _hdec
    return _UDFS["hdec"]
