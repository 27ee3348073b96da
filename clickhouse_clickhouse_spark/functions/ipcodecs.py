"""IPv6 codecs for the dialect front end — pure Python stdlib.

Backs the reference's IPv6 scalar family (upstream
``src/Functions/FunctionsCoding.h`` — IPv6StringToNum / IPv6NumToString
/ toIPv6 / isIPv6String / IPv4ToIPv6 / cutIPv6) with ``socket.inet_pton
/ inet_ntop`` (RFC 5952 canonical rendering, the same convention
upstream follows: lowercase hex, longest zero-run compressed,
IPv4-mapped tail in dotted-quad form).

Per-value Python inside Arrow-batched pandas UDFs — compatibility
codecs for address-like short strings, the same stance as the
``textcodecs`` module (none sit on a scale path; the IPv4 family
remains pure JVM arithmetic in ch_sql templates).
"""

from __future__ import annotations

import socket

import pandas as pd
from pyspark.sql.functions import pandas_udf



# exact spellings of the registered UDF names (the Spark catalog
# lowercases; system.functions restores case from this set)
REGISTERED_NAMES: set[str] = set()


def _reg(spark, name, udf):
    REGISTERED_NAMES.add(name)
    spark.udf.register(name, udf)

def ipv6_pton_py(s: str) -> bytes:
    return socket.inet_pton(socket.AF_INET6, s)


def ipv6_ntop_py(b: bytes) -> str:
    if len(b) != 16:
        raise ValueError(f"IPv6 value must be 16 bytes, got {len(b)}")
    return socket.inet_ntop(socket.AF_INET6, bytes(b))


def is_ipv6_py(s: str) -> bool:
    try:
        socket.inet_pton(socket.AF_INET6, s)
        return True
    except OSError:
        return False


def ipv4_to_ipv6_py(n: int) -> bytes:
    """IPv4 (UInt32) → IPv4-mapped IPv6 bytes ::ffff:a.b.c.d."""
    return b"\x00" * 10 + b"\xff\xff" + int(n).to_bytes(4, "big")


def cut_ipv6_py(b: bytes, bytes_v6: int, bytes_v4: int) -> str:
    """Zero the trailing ``bytes_v6`` bytes (or ``bytes_v4`` for an
    IPv4-mapped address) and render — upstream's anonymization helper."""
    b = bytes(b)
    if len(b) != 16:
        raise ValueError(f"IPv6 value must be 16 bytes, got {len(b)}")
    is_mapped = b[:12] == b"\x00" * 10 + b"\xff\xff"
    cut = int(bytes_v4) if is_mapped else int(bytes_v6)
    cut = max(0, min(16, cut))
    kept = b[:16 - cut] + b"\x00" * cut
    return socket.inet_ntop(socket.AF_INET6, kept)


def ipv6_cidr_range_py(v, prefix: int) -> tuple[str, str]:
    """IPv6CIDRToRange: (address, prefix) → (first, last) canonical
    text of the CIDR block — byte-wise masking, no 128-bit arithmetic.
    Accepts the string-carried address or the 16-byte binary form."""
    b = bytearray(v if isinstance(v, (bytes, bytearray))
                  else ipv6_pton_py(v))
    if len(b) != 16:
        raise ValueError(f"IPv6 value must be 16 bytes, got {len(b)}")
    prefix = max(0, min(128, int(prefix)))
    full, rem = divmod(prefix, 8)
    lo, hi = bytearray(b), bytearray(b)
    if rem and full < 16:
        mask = (0xFF << (8 - rem)) & 0xFF
        lo[full] &= mask
        hi[full] = (hi[full] & mask) | (0xFF >> rem)
    for i in range(full + (1 if rem else 0), 16):
        lo[i], hi[i] = 0, 0xFF
    return (socket.inet_ntop(socket.AF_INET6, bytes(lo)),
            socket.inet_ntop(socket.AF_INET6, bytes(hi)))


def ipv6_in_range_py(addr: str, cidr: str) -> bool:
    net, _, p = cidr.partition("/")
    lo, hi = ipv6_cidr_range_py(net, int(p) if p else 128)
    a = ipv6_pton_py(addr)
    return ipv6_pton_py(lo) <= a <= ipv6_pton_py(hi)


def register_ip_udfs(spark) -> None:
    """Register the IPv6 family under the reference names (idempotent
    per session via ch_sql._register_udfs)."""

    @pandas_udf("binary")
    def _pton(col: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return ipv6_pton_py(v)
            except OSError as ex:
                raise ValueError(f"IPv6StringToNum({v!r}): {ex}") from ex
        return col.map(one)

    @pandas_udf("binary")
    def _pton_or_null(col: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return ipv6_pton_py(v)
            except OSError:
                return None
        return col.map(one)

    @pandas_udf("string")
    def _ntop(col: pd.Series) -> pd.Series:
        return col.map(lambda v: None if v is None else ipv6_ntop_py(v))

    @pandas_udf("boolean")
    def _is6(col: pd.Series) -> pd.Series:
        return col.map(lambda v: None if v is None else is_ipv6_py(v))

    @pandas_udf("string")
    def _to6(col: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return ipv6_ntop_py(ipv6_pton_py(v))
            except OSError as ex:
                raise ValueError(f"toIPv6({v!r}): {ex}") from ex
        return col.map(one)

    @pandas_udf("string")
    def _to6_or_null(col: pd.Series) -> pd.Series:
        # tolerant twin for the OrNull/OrDefault forms — python UDFs
        # are batch-extracted out of IF branches, so the strict toIPv6
        # would fire even on the not-taken branch
        def one(v):
            if v is None:
                return None
            try:
                return ipv6_ntop_py(ipv6_pton_py(v))
            except OSError:
                return None
        return col.map(one)

    @pandas_udf("binary")
    def _v4to6(col: pd.Series) -> pd.Series:
        return col.map(lambda v: None if v is None else ipv4_to_ipv6_py(v))

    @pandas_udf("string")
    def _cut6(b: pd.Series, c6: pd.Series, c4: pd.Series) -> pd.Series:
        return pd.Series([
            None if v is None else cut_ipv6_py(v, x6, x4)
            for v, x6, x4 in zip(b, c6, c4)
        ])

    @pandas_udf("_1 string, _2 string")
    def _cidr6(a: pd.Series, p: pd.Series) -> pd.DataFrame:
        out = [(None, None) if v is None or pr is None
               else ipv6_cidr_range_py(v, pr) for v, pr in zip(a, p)]
        return pd.DataFrame(out, columns=["_1", "_2"])

    @pandas_udf("boolean")
    def _in6(a: pd.Series, c: pd.Series) -> pd.Series:
        return pd.Series([
            None if v is None or cd is None else ipv6_in_range_py(v, cd)
            for v, cd in zip(a, c)])

    _reg(spark, "IPv6CIDRToRange", _cidr6)
    _reg(spark, "__ipv6_in_range", _in6)
    _reg(spark, "IPv6StringToNum", _pton)
    _reg(spark, "IPv6StringToNumOrNull", _pton_or_null)
    _reg(spark, "IPv6NumToString", _ntop)
    _reg(spark, "isIPv6String", _is6)
    _reg(spark, "toIPv6", _to6)
    _reg(spark, "toIPv6OrNull", _to6_or_null)
    _reg(spark, "IPv4ToIPv6", _v4to6)
    _reg(spark, "cutIPv6", _cut6)
