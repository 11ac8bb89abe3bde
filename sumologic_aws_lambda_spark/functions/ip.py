"""IPv4 / CIDR column functions.

The reference manipulates IP addresses in the VPC-flow path — CIDR-prefix
matching in ``cloudwatchlogs-with-dlq/vpcutils.js:31-48`` (internal-traffic
discard compares ``srcaddr``/``dstaddr`` against a list of CIDR prefixes
with ``startsWith``) — and Sumo's public search language exposes the same
capability as scalar functions (``compareCIDRPrefix``, ``getCIDRPrefix``,
``maskFromCIDR``, ``ipv4ToNumber``).  Here they are pure Column
expressions: JVM-side, codegen-friendly, no UDFs.

Prefix lengths are Python ints (query-literal in every observed use), so
bit masks fold to constants at plan build time and the comparisons stay
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def ipv4_to_number(ip: Column | str) -> Column:
    """Dotted-quad string → 32-bit number (as LONG).

    Positional octet math over ``split`` — stays inside codegen, no UDF.
    """
    parts = F.split(_col(ip), r"\.")

    def octet(i: int) -> Column:
        return parts.getItem(i).cast("bigint")

    return (
        octet(0) * 16777216 + octet(1) * 65536 + octet(2) * 256 + octet(3)
    )


def number_to_ipv4(num: Column | str) -> Column:
    """32-bit number → dotted-quad string."""
    n = _col(num)
    return F.concat_ws(
        ".",
        (F.shiftright(n, 24).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(n, 16).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(n, 8).bitwiseAND(F.lit(255))).cast("string"),
        (n.bitwiseAND(F.lit(255))).cast("string"),
    )


def _mask_int(prefix_len: int) -> int:
    """Validated 32-bit netmask — the ONE place the mask math lives, so
    every CIDR helper shares the 0-32 range check (an unchecked
    out-of-range length either crashes with a raw shift error or, worse,
    yields a mask that silently matches every IP pair)."""
    if not 0 <= prefix_len <= 32:
        raise ValueError(f"prefix length out of range: {prefix_len}")
    return ((1 << 32) - 1) ^ ((1 << (32 - prefix_len)) - 1)


def mask_from_cidr(prefix_len: int) -> Column:
    """CIDR length → dotted-quad netmask literal (constant-folded)."""
    mask = _mask_int(prefix_len)
    return F.lit(
        ".".join(str((mask >> s) & 255) for s in (24, 16, 8, 0))
    )


def get_cidr_prefix(ip: Column | str, prefix_len: int) -> Column:
    """IP → its network address under the given prefix, ``a.b.c.d/len``."""
    net = ipv4_to_number(ip).bitwiseAND(F.lit(_mask_int(prefix_len)))
    return F.concat(number_to_ipv4(net), F.lit(f"/{prefix_len}"))


def compare_cidr_prefix(ip1: Column | str, ip2: Column | str,
                        prefix_len: int) -> Column:
    """True when both IPs share the same ``prefix_len``-bit network."""
    mask = F.lit(_mask_int(prefix_len))
    return (
        ipv4_to_number(ip1).bitwiseAND(mask)
        == ipv4_to_number(ip2).bitwiseAND(mask)
    )
