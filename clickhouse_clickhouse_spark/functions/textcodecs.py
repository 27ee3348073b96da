"""Unicode/text codecs for the dialect front end — pure Python stdlib.

Backs the reference's punycode/IDNA/UTF8-normalization/base58 scalar
functions (upstream ``src/Functions/punycode.cpp`` / ``idna.cpp`` /
``normalizeUTF8.h`` / ``FunctionBase58Conversion.h``) with stdlib
codecs — no external libraries:

* ``punycodeEncode/Decode`` — RFC 3492 via Python's built-in
  ``punycode`` codec (the same algorithm upstream takes from ada/idna).
* ``idnaEncode/Decode`` — per-label ToASCII/ToUnicode: ASCII labels
  lowercase-pass-through, non-ASCII labels get ``xn--`` + punycode.
  This is the raw-punycode label mapping (matches upstream's documented
  examples, e.g. ``straße.münchen.de → xn--strae-oqa.xn--mnchen-3ya.de``);
  the IDNA2003 nameprep remappings (``ß → ss``) are deliberately NOT
  applied — Python's ``idna`` codec would, upstream does not.
* ``normalizeUTF8NFC/NFD/NFKC/NFKD`` — ``unicodedata.normalize``.
* ``base58Encode/Decode`` — Bitcoin alphabet, leading-zero ``1`` runs
  preserved (the convention upstream pins).

Per-value Python inside Arrow-batched pandas UDFs — these are
compatibility codecs for name-like short strings, the same stance as
``cityHash64`` (documented in SCALE.md); none sit on a scale path.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf

_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_IDX = {c: i for i, c in enumerate(_B58)}



# exact spellings of the registered UDF names (the Spark catalog
# lowercases; system.functions restores case from this set)
REGISTERED_NAMES: set[str] = set()


def _reg(spark, name, udf):
    REGISTERED_NAMES.add(name)
    spark.udf.register(name, udf)

def punycode_encode_py(s: str) -> str:
    return s.encode("punycode").decode("ascii")


def punycode_decode_py(s: str) -> str:
    return s.encode("ascii").decode("punycode")


def idna_encode_py(domain: str) -> str:
    out = []
    for label in domain.split("."):
        low = label.lower()
        if low.isascii():
            out.append(low)
        else:
            out.append("xn--" + low.encode("punycode").decode("ascii"))
    return ".".join(out)


def idna_decode_py(domain: str) -> str:
    out = []
    for label in domain.split("."):
        low = label.lower()
        if low.startswith("xn--"):
            out.append(low[4:].encode("ascii").decode("punycode"))
        else:
            out.append(low)
    return ".".join(out)


def base58_encode_py(s: str) -> str:
    data = s.encode("utf-8")
    n = int.from_bytes(data, "big")
    enc = ""
    while n:
        n, rem = divmod(n, 58)
        enc = _B58[rem] + enc
    pad = 0
    for b in data:
        if b:
            break
        pad += 1
    return "1" * pad + enc


def base58_decode_py(s: str) -> str:
    n = 0
    for c in s:
        if c not in _B58_IDX:
            raise ValueError(f"invalid base58 character {c!r}")
        n = n * 58 + _B58_IDX[c]
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = 0
    for c in s:
        if c != "1":
            break
        pad += 1
    return (b"\x00" * pad + raw).decode("utf-8")


def base32_encode_py(s: str) -> str:
    import base64
    return base64.b32encode(s.encode("utf-8")).decode("ascii")


def base32_decode_py(s: str) -> str:
    import base64
    return base64.b32decode(s.encode("ascii"), casefold=False) \
        .decode("utf-8")


# CRC-64 per upstream src/Functions/CRC.h (CRC-64/XZ parameters:
# poly 0x42F0E1EBA9EA3693 reflected, init/xorout all-ones) — table-driven
_CRC64_POLY_REFL = 0xC96C5795D7870F42
_CRC64_TABLE: list[int] = []


def _crc64_table() -> list[int]:
    if not _CRC64_TABLE:
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ _CRC64_POLY_REFL if c & 1 else c >> 1
            _CRC64_TABLE.append(c)
    return _CRC64_TABLE


def crc64_py(s: str) -> int:
    tbl = _crc64_table()
    crc = 0xFFFFFFFFFFFFFFFF
    for b in s.encode("utf-8"):
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    crc ^= 0xFFFFFFFFFFFFFFFF
    return crc - (1 << 64) if crc >= (1 << 63) else crc  # BIGINT wrap


def bfloat16_py(x: float) -> float:
    """Round a double to bfloat16 precision (round-to-nearest-even on
    the float32 representation, the standard truncation trick)."""
    import struct
    v = struct.unpack("<I", struct.pack("<f", x))[0]
    v = (v + 0x7FFF + ((v >> 16) & 1)) & 0xFFFF0000
    return struct.unpack("<f", struct.pack("<I", v))[0]


def _str_udf(fn, try_mode: bool = False):
    """Wrap a str->str core as a null-safe Arrow-batched pandas UDF.
    ``try_mode`` maps failures to '' (the reference's try* contract);
    otherwise failures raise with the offending value named."""

    @pandas_udf("string")
    def run(col: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return fn(v)
            except Exception as ex:
                if try_mode:
                    return ""
                raise ValueError(f"{fn.__name__}({v!r}): {ex}") from ex
        return col.map(one)

    return run


def register_codec_udfs(spark) -> None:
    """Register every codec under its reference name (idempotent per
    session via ch_sql._register_udfs)."""
    _reg(spark, "punycodeEncode", _str_udf(punycode_encode_py))
    _reg(spark, "punycodeDecode", _str_udf(punycode_decode_py))
    _reg(spark, "tryPunycodeDecode",
                       _str_udf(punycode_decode_py, try_mode=True))
    _reg(spark, "idnaEncode", _str_udf(idna_encode_py))
    _reg(spark, "idnaDecode", _str_udf(idna_decode_py))
    _reg(spark, "tryIdnaEncode",
                       _str_udf(idna_encode_py, try_mode=True))
    _reg(spark, "base58Encode", _str_udf(base58_encode_py))
    _reg(spark, "base58Decode", _str_udf(base58_decode_py))
    _reg(spark, "tryBase58Decode",
                       _str_udf(base58_decode_py, try_mode=True))
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        _reg(spark, 
            f"normalizeUTF8{form}",
            _str_udf(lambda v, f=form: unicodedata.normalize(f, v)))
    _reg(spark, "base32Encode", _str_udf(base32_encode_py))
    _reg(spark, "base32Decode", _str_udf(base32_decode_py))
    _reg(spark, "tryBase32Decode",
                       _str_udf(base32_decode_py, try_mode=True))

    @pandas_udf("bigint")
    def _crc64(col: pd.Series) -> pd.Series:
        return col.map(lambda v: None if v is None else crc64_py(v))

    _reg(spark, "crc64", _crc64)

    @pandas_udf("float")
    def _bf16(col: pd.Series) -> pd.Series:
        return col.map(lambda v: None if v is None else bfloat16_py(v))

    _reg(spark, "toBFloat16", _bf16)
