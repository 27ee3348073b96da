"""IPv6 codec family (reference ``IPv6StringToNum`` / ``IPv6NumToString``
/ ``IPv6CIDRToRange`` / ``isIPAddressInRange``, upstream
``src/Functions/FunctionsCodingIP.cpp``) as pure JVM-side column
expressions — no UDFs.

Representation: the numeric form is Spark ``binary(16)`` (network byte
order), which compares lexicographically as unsigned bytes — exactly the
ordering CIDR range checks need. The canonical string form follows
RFC 5952 (longest zero-run compressed, leftmost on ties, lowercase,
IPv4-mapped ``::ffff:a.b.c.d`` rendered in dotted form), matching the
reference's output format.

Expression-size discipline (rewritten in optimization round 14): the
original staged-``withColumn`` form kept the ANALYZED tree linear, but
Catalyst's CollapseProject re-inlines every deterministic intermediate
into each of its use sites during optimization — the canonicalizer
references its hex form ~14 times, the CIDR bounds reference the parsed
binary ~4 times, and chaining three canonicalizations over CIDR bounds
multiplied the OPTIMIZED tree to ~10⁴ nodes. The registry's 11-row
``ip_funcs_v6`` query measured 11-39 s, all of it driver-side optimizer
+ codegen time (round-14 profile). Every shared subterm is now bound
exactly once with ``_let`` (the ``element_at(transform(array(x), f), 1)``
lambda-variable idiom, same as the round-7 geohash fix): a lambda
variable is a leaf, so a subtree appears once no matter how many times
the body references it. After the rewrite the query runs in ~0.5 s with
identical results. The cost is that higher-order functions fall out of
whole-stage codegen — per-row interpreted evaluation of a ~100-node
expression, microseconds, irrelevant next to the former 10-second
planning bill at ANY scale.

The IPv4 family lives in ``operators/advanced.py``
(``ipv4_string_to_num`` etc.); this module completes the v6 half that
round-1 review flagged as the top missing user-facing surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GROUPS = 8
_HEXDIGITS = "0123456789abcdef"


def _let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``value`` once; every reference inside ``body`` is a lambda
    variable (a plan LEAF), not a copy of the subtree. This is the
    CollapseProject barrier that keeps the optimized tree linear."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _hex_nibble(n: Column) -> Column:
    """int 0..15 -> one lowercase hex char."""
    return F.substr(F.lit(_HEXDIGITS), n + 1, F.lit(1))


def ipv6_string_to_num(s: Column) -> Column:
    """``IPv6StringToNum``: textual IPv6 (full, ``::``-compressed, or with
    an embedded dotted-quad IPv4 tail) -> binary(16). Invalid input yields
    NULL (unhex returns NULL on bad hex), mirroring the reference's
    ``OrNull`` variant rather than throwing."""

    def with_t0(t0: Column) -> Column:
        def with_quad(quad: Column) -> Column:
            qp = F.split(quad, r"\.")
            q_as_hex = F.concat(
                F.lpad(F.lower(F.hex(qp.getItem(0).cast("int") * 256
                                     + qp.getItem(1).cast("int"))), 4, "0"),
                F.lit(":"),
                F.lpad(F.lower(F.hex(qp.getItem(2).cast("int") * 256
                                     + qp.getItem(3).cast("int"))), 4, "0"))
            return F.when(quad != "", F.concat(
                F.substr(t0, F.lit(1), F.length(t0) - F.length(quad)),
                q_as_hex)).otherwise(t0)

        # embedded IPv4 tail "…:a.b.c.d" -> two hex groups
        t = _let(F.regexp_extract(t0, r"(\d+\.\d+\.\d+\.\d+)$", 1),
                 with_quad)

        def with_t(t: Column) -> Column:
            # split on '::' -> left groups + implied zeros + right groups
            has_dc = t.contains("::")
            left = F.when(has_dc, F.split(t, "::").getItem(0)).otherwise(t)
            right = F.when(has_dc,
                           F.split(t, "::").getItem(1)).otherwise(F.lit(""))
            lg = F.filter(F.split(left, ":"), lambda x: x != "")
            rg = F.filter(F.split(right, ":"), lambda x: x != "")
            mid = F.lit(_GROUPS) - F.size(lg) - F.size(rg)
            groups = F.when(has_dc,
                            F.concat(lg, F.array_repeat(F.lit("0"), mid),
                                     rg)).otherwise(lg)

            def with_groups(groups: Column) -> Column:
                ok = F.size(groups) == _GROUPS
                hexstr = F.aggregate(
                    groups, F.lit(""),
                    lambda acc, g: F.concat(acc, F.lpad(g, 4, "0")))
                return F.when(ok, F.unhex(hexstr)) \
                        .otherwise(F.lit(None).cast("binary"))

            return _let(groups, with_groups)

        return _let(t, with_t)

    return _let(F.lower(F.trim(s)), with_t0)


def ipv6_canonical(b: Column) -> Column:
    """``IPv6NumToString``: binary(16) -> RFC 5952 canonical text
    (longest zero run >= 2 compressed, leftmost on ties, lowercase,
    v4-mapped addresses rendered ``::ffff:a.b.c.d`` — the reference's
    format). One Column expression; the zero-run search is a single
    indexed fold instead of the unrolled per-group recurrence the old
    form used (which CollapseProject re-inlined per reference)."""

    def render(hx: Column) -> Column:
        grp = F.transform(
            F.sequence(F.lit(0), F.lit(_GROUPS - 1)),
            lambda i: F.regexp_replace(
                F.substr(hx, i * 4 + 1, F.lit(4)), r"^0+(?=.)", ""))

        def with_arr(arr: Column) -> Column:
            idx = F.transform(
                arr, lambda g, i: F.struct(g.alias("g"), i.alias("i")))
            init = F.struct(F.lit(0).alias("cur"), F.lit(0).alias("best"),
                            F.lit(0).alias("start"))

            def step(acc: Column, x: Column) -> Column:
                cur = F.when(x["g"] == "0", acc["cur"] + 1).otherwise(0)
                return F.struct(
                    cur.alias("cur"),
                    F.when(cur > acc["best"], cur)
                     .otherwise(acc["best"]).alias("best"),
                    F.when(cur > acc["best"], x["i"] - cur + 1)
                     .otherwise(acc["start"]).alias("start"))

            def fin(zr: Column) -> Column:
                best, start = zr["best"], zr["start"]
                head = F.concat_ws(":", F.slice(arr, F.lit(1), start))
                tail = F.concat_ws(
                    ":", F.slice(arr, start + best + 1,
                                 F.lit(_GROUPS) - start - best))
                return F.when(best >= 2,
                              F.concat(head, F.lit("::"), tail)) \
                        .otherwise(F.concat_ws(":", arr))

            return F.aggregate(idx, init, step, fin)

        canon = _let(grp, with_arr)
        # v4-mapped special form ::ffff:a.b.c.d
        is_v4m = (F.substr(hx, F.lit(1), F.lit(20)) == F.lit("0" * 20)) & \
                 (F.substr(hx, F.lit(21), F.lit(4)) == "ffff")
        b2i = lambda i: F.conv(F.substr(hx, F.lit(i), F.lit(2)), 16, 10)  # noqa: E731
        dotted = F.concat_ws(".", b2i(25), b2i(27), b2i(29), b2i(31))
        return F.when(is_v4m, F.concat(F.lit("::ffff:"), dotted)) \
                .otherwise(canon)

    return _let(F.lower(F.hex(b)), render)


def with_ipv6_canonical(df: DataFrame, bin_col: Column | str,
                        out: str) -> DataFrame:
    """DataFrame wrapper over :func:`ipv6_canonical` (kept for API
    compatibility with the staged-transformer callers)."""
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    return df.withColumn(out, ipv6_canonical(b))


def ipv6_cidr_bounds(addr: Column, prefix: Column) -> Column:
    """``IPv6CIDRToRange`` core: (address string, prefix_len) -> one
    struct<lo:binary,hi:binary> with the block's first and last address.
    Nibble-wise hex masking keeps everything in 64-bit-safe string
    arithmetic (a 16-byte value does not fit a long)."""
    p = prefix.cast("int")

    def with_chx(chx: Column) -> Column:
        full = (p / 4).cast("int")
        rem = p % 4
        keep = F.substr(chx, F.lit(1), full)
        nib = F.conv(F.substr(chx, full + 1, F.lit(1)), 16, 10).cast("int")
        low_bits = (F.pow(F.lit(2.0), (4 - rem).cast("double")).cast("int")
                    - 1)                  # 2^(4-rem) - 1, exact for rem 1..3
        mask = F.lit(0xF) - low_bits
        lo_nib = F.when(rem > 0, _hex_nibble(nib.bitwiseAND(mask))) \
                  .otherwise(F.lit(""))
        hi_nib = F.when(rem > 0,
                        _hex_nibble(nib.bitwiseAND(mask) + low_bits)) \
                  .otherwise(F.lit(""))
        rest = F.lit(32) - full - F.when(rem > 0, 1).otherwise(0)
        return F.struct(
            F.unhex(F.concat(keep, lo_nib,
                             F.repeat(F.lit("0"), rest))).alias("lo"),
            F.unhex(F.concat(keep, hi_nib,
                             F.repeat(F.lit("f"), rest))).alias("hi"))

    return _let(F.lower(F.hex(ipv6_string_to_num(addr))), with_chx)


def with_ipv6_cidr_range(df: DataFrame, addr: Column | str,
                         prefix: Column | str,
                         lo_out: str, hi_out: str) -> DataFrame:
    """``IPv6CIDRToRange``: adds two binary(16) columns holding the
    block's first and last address."""
    a = F.col(addr) if isinstance(addr, str) else addr
    p = F.col(prefix) if isinstance(prefix, str) else prefix
    d = df.withColumn("__ip6_cb", ipv6_cidr_bounds(a, p))
    return (d.withColumn(lo_out, F.col("__ip6_cb")["lo"])
            .withColumn(hi_out, F.col("__ip6_cb")["hi"])
            .drop("__ip6_cb"))


def ipv6_in_range(addr: Column, cidr: Column) -> Column:
    """``isIPAddressInRange`` (v6 path): address string vs "net/prefix"
    CIDR string. binary(16) compares as unsigned bytes, so the range
    check is two comparisons — no bigint emulation."""
    parts = F.split(cidr, "/")
    bounds = ipv6_cidr_bounds(parts.getItem(0), parts.getItem(1))
    return _let(ipv6_string_to_num(addr),
                lambda ba: _let(bounds,
                                lambda bd: (ba >= bd["lo"])
                                & (ba <= bd["hi"])))


def with_ipv6_in_range(df: DataFrame, addr: Column | str,
                       cidr: Column | str, out: str) -> DataFrame:
    """DataFrame wrapper over :func:`ipv6_in_range`."""
    a = F.col(addr) if isinstance(addr, str) else addr
    c = F.col(cidr) if isinstance(cidr, str) else cidr
    return df.withColumn(out, ipv6_in_range(a, c))
