"""IPv6 codec family (reference ``IPv6StringToNum`` / ``IPv6NumToString``
/ ``IPv6CIDRToRange`` / ``isIPAddressInRange``, upstream
``src/Functions/FunctionsCodingIP.cpp``) as pure JVM-side column
expressions — no UDFs, so the whole family stays inside whole-stage
codegen and pushes through Catalyst like any other string expression.

Representation: the numeric form is Spark ``binary(16)`` (network byte
order), which compares lexicographically as unsigned bytes — exactly the
ordering CIDR range checks need. The canonical string form follows
RFC 5952 (longest zero-run compressed, leftmost on ties, lowercase,
IPv4-mapped ``::ffff:a.b.c.d`` rendered in dotted form), matching the
reference's output format.

API shape: parsing is a plain Column function; rendering and CIDR ranges
are *staged DataFrame transformers* (``with_*``). The canonicalizer's
zero-run search references its own subterms many times — inlined as one
nested Column expression the analyzer tree grows multiplicatively (three
canonicalizations in one select overflow the JVM heap at ANALYSIS time);
as layered ``withColumn`` projections every stage refers to named
attributes, so tree size stays linear. Intermediates use a ``__ip6_``
prefix and are dropped before return.

The IPv4 family lives in ``operators/advanced.py``
(``ipv4_string_to_num`` etc.); this module completes the v6 half that
round-1 review flagged as the top missing user-facing surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GROUPS = 8
_HEXDIGITS = "0123456789abcdef"


def _hex_nibble(n: Column) -> Column:
    """int 0..15 -> one lowercase hex char."""
    return F.substr(F.lit(_HEXDIGITS), n + 1, F.lit(1))


def ipv6_string_to_num(s: Column) -> Column:
    """``IPv6StringToNum``: textual IPv6 (full, ``::``-compressed, or with
    an embedded dotted-quad IPv4 tail) -> binary(16). Invalid input yields
    NULL (unhex returns NULL on bad hex), mirroring the reference's
    ``OrNull`` variant rather than throwing."""
    t = F.lower(F.trim(s))
    # embedded IPv4 tail "…:a.b.c.d" -> two hex groups
    quad = F.regexp_extract(t, r"(\d+\.\d+\.\d+\.\d+)$", 1)
    qp = F.split(quad, r"\.")
    q_as_hex = F.concat(
        F.lpad(F.lower(F.hex(qp.getItem(0).cast("int") * 256
                             + qp.getItem(1).cast("int"))), 4, "0"),
        F.lit(":"),
        F.lpad(F.lower(F.hex(qp.getItem(2).cast("int") * 256
                             + qp.getItem(3).cast("int"))), 4, "0"))
    t = F.when(quad != "", F.concat(
        F.substring(t, F.lit(1), F.length(t) - F.length(quad)),
        q_as_hex)).otherwise(t)
    # split on '::' -> left groups + implied zeros + right groups
    has_dc = t.contains("::")
    left = F.when(has_dc, F.split(t, "::").getItem(0)).otherwise(t)
    right = F.when(has_dc, F.split(t, "::").getItem(1)).otherwise(F.lit(""))
    lg = F.filter(F.split(left, ":"), lambda x: x != "")
    rg = F.filter(F.split(right, ":"), lambda x: x != "")
    mid = F.lit(_GROUPS) - F.size(lg) - F.size(rg)
    groups = F.when(has_dc,
                    F.concat(lg, F.array_repeat(F.lit("0"), mid), rg)) \
              .otherwise(lg)
    ok = F.size(groups) == _GROUPS
    hexstr = F.aggregate(groups, F.lit(""),
                         lambda acc, g: F.concat(acc, F.lpad(g, 4, "0")))
    return F.when(ok, F.unhex(hexstr)).otherwise(F.lit(None).cast("binary"))


def with_ipv6_canonical(df: DataFrame, bin_col: Column | str,
                        out: str) -> DataFrame:
    """``IPv6NumToString``: binary(16) -> RFC 5952 canonical text
    (longest zero run >= 2 compressed, leftmost on ties, lowercase,
    v4-mapped addresses rendered ``::ffff:a.b.c.d`` — the reference's
    format). Staged projections; adds column ``out``."""
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    d = df.withColumn("__ip6_hx", F.lower(F.hex(b)))
    for i in range(_GROUPS):
        d = d.withColumn(
            f"__ip6_g{i}",
            F.regexp_replace(F.substring("__ip6_hx", 4 * i + 1, 4),
                             r"^0+(?=.)", ""))
    # run length of consecutive zero groups starting at i (unrolled,
    # each stage referencing the previous BY NAME keeps the tree linear)
    d = d.withColumn(f"__ip6_r{_GROUPS - 1}",
                     F.when(F.col(f"__ip6_g{_GROUPS - 1}") == "0", 1)
                     .otherwise(0))
    for i in range(_GROUPS - 2, -1, -1):
        d = d.withColumn(
            f"__ip6_r{i}",
            F.when(F.col(f"__ip6_g{i}") == "0",
                   F.col(f"__ip6_r{i + 1}") + 1).otherwise(F.lit(0)))
    d = d.withColumn("__ip6_best",
                     F.greatest(*[F.col(f"__ip6_r{i}")
                                  for i in range(_GROUPS)]))
    start = F.lit(None).cast("int")
    for i in range(_GROUPS - 1, -1, -1):   # later whens override: leftmost wins
        start = F.when(F.col(f"__ip6_r{i}") == F.col("__ip6_best"),
                       F.lit(i)).otherwise(start)
    d = d.withColumn("__ip6_start", start)
    d = d.withColumn("__ip6_arr",
                     F.array(*[F.col(f"__ip6_g{i}")
                               for i in range(_GROUPS)]))
    head = F.concat_ws(":", F.slice("__ip6_arr", F.lit(1),
                                    F.col("__ip6_start")))
    tail = F.concat_ws(
        ":", F.slice(F.col("__ip6_arr"),
                     F.col("__ip6_start") + F.col("__ip6_best") + 1,
                     F.lit(_GROUPS) - F.col("__ip6_start")
                     - F.col("__ip6_best")))
    canon = F.when(F.col("__ip6_best") >= 2,
                   F.concat(head, F.lit("::"), tail)) \
             .otherwise(F.concat_ws(":", F.col("__ip6_arr")))
    # v4-mapped special form ::ffff:a.b.c.d
    is_v4m = (F.substring("__ip6_hx", 1, 20) == F.lit("0" * 20)) & \
             (F.substring("__ip6_hx", 21, 4) == "ffff")
    b2i = lambda i: F.conv(F.substring("__ip6_hx", i, 2), 16, 10)  # noqa: E731
    dotted = F.concat_ws(".", b2i(25), b2i(27), b2i(29), b2i(31))
    d = d.withColumn(out, F.when(is_v4m, F.concat(F.lit("::ffff:"), dotted))
                     .otherwise(canon))
    drop = (["__ip6_hx", "__ip6_best", "__ip6_start", "__ip6_arr"]
            + [f"__ip6_g{i}" for i in range(_GROUPS)]
            + [f"__ip6_r{i}" for i in range(_GROUPS)])
    return d.drop(*drop)


def with_ipv6_cidr_range(df: DataFrame, addr: Column | str,
                         prefix: Column | str,
                         lo_out: str, hi_out: str) -> DataFrame:
    """``IPv6CIDRToRange``: (address string, prefix_len) -> two binary(16)
    columns holding the block's first and last address. Nibble-wise hex
    masking keeps everything in 64-bit-safe string arithmetic (a 16-byte
    value does not fit a long)."""
    a = F.col(addr) if isinstance(addr, str) else addr
    p = (F.col(prefix) if isinstance(prefix, str) else prefix).cast("int")
    d = (df.withColumn("__ip6_chx", F.lower(F.hex(ipv6_string_to_num(a))))
         .withColumn("__ip6_full", (p / 4).cast("int"))
         .withColumn("__ip6_rem", p % 4))
    full, rem = F.col("__ip6_full"), F.col("__ip6_rem")
    keep = F.substring("__ip6_chx", F.lit(1), full)
    nib = F.conv(F.substring("__ip6_chx", full + 1, F.lit(1)), 16, 10) \
           .cast("int")
    low_bits = (F.pow(F.lit(2.0), (4 - rem).cast("double")).cast("int")
                - 1)                      # 2^(4-rem) - 1, exact for rem 1..3
    mask = F.lit(0xF) - low_bits
    lo_nib = F.when(rem > 0, _hex_nibble(nib.bitwiseAND(mask))) \
              .otherwise(F.lit(""))
    hi_nib = F.when(rem > 0,
                    _hex_nibble(nib.bitwiseAND(mask) + low_bits)) \
              .otherwise(F.lit(""))
    rest = F.lit(32) - full - F.when(rem > 0, 1).otherwise(0)
    d = (d.withColumn(lo_out,
                      F.unhex(F.concat(keep, lo_nib,
                                       F.repeat(F.lit("0"), rest))))
         .withColumn(hi_out,
                     F.unhex(F.concat(keep, hi_nib,
                                      F.repeat(F.lit("f"), rest)))))
    return d.drop("__ip6_chx", "__ip6_full", "__ip6_rem")


def with_ipv6_in_range(df: DataFrame, addr: Column | str,
                       cidr: Column | str, out: str) -> DataFrame:
    """``isIPAddressInRange`` (v6 path): address string vs "net/prefix"
    CIDR string. binary(16) compares as unsigned bytes, so the range
    check is two comparisons — no bigint emulation."""
    c = F.col(cidr) if isinstance(cidr, str) else cidr
    a = F.col(addr) if isinstance(addr, str) else addr
    parts = F.split(c, "/")
    d = with_ipv6_cidr_range(df, parts.getItem(0), parts.getItem(1),
                             "__ip6_lo", "__ip6_hi")
    bin_a = ipv6_string_to_num(a)
    d = d.withColumn(out, (bin_a >= F.col("__ip6_lo"))
                     & (bin_a <= F.col("__ip6_hi")))
    return d.drop("__ip6_lo", "__ip6_hi")
