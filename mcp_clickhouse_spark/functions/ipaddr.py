"""Value-faithful ClickHouse IPv6 function family (round 9 — previously a
guided-error block: 128-bit address arithmetic has no Spark builtin).

Python's ``ipaddress`` module implements the same RFC 5952 text forms and
network math ClickHouse uses, so each function is an Arrow-batched
``pandas_udf``: IPv6StringToNum → 16 packed bytes (CH's FixedString(16)),
IPv6NumToString → the canonical compressed form, cutIPv6 → zero low
bytes then render, IPv6CIDRToRange → (low, high) endpoints,
isIPAddressInRange → membership for BOTH v4 and v6 CIDRs (CH docs pin
isIPAddressInRange('127.0.0.1', '127.0.0.0/8') = 1).  Registered lazily
via functions.LAZY_UDFS.
"""

from __future__ import annotations

import ipaddress

import pandas as pd  # module-level: pandas_udf resolves stringified hints


def _parse6(v: str) -> ipaddress.IPv6Address:
    """Parse like ClickHouse's IPv6StringToNum/toIPv6: a plain IPv6 string,
    OR a valid IPv4 dotted-quad (returned as its IPv4-mapped equivalent
    ::ffff:a.b.c.d — CH docs: 'if the input is a valid IPv4 address, the
    IPv6 equivalent is returned').  Anything else raises ValueError."""
    try:
        return ipaddress.IPv6Address(v)
    except (ValueError, ipaddress.AddressValueError):
        v4 = ipaddress.IPv4Address(v)  # raises → caller maps to NULL
        return ipaddress.IPv6Address(b"\x00" * 10 + b"\xff\xff" + v4.packed)


def _render(addr: ipaddress.IPv6Address) -> str:
    """RFC 5952 compressed form, except IPv4-mapped addresses render with
    the dotted tail (::ffff:192.168.0.1) exactly like ClickHouse."""
    v4 = addr.ipv4_mapped
    if v4 is not None:
        return f"::ffff:{v4}"
    return addr.compressed


def _map(s: pd.Series, fn, dtype=object) -> pd.Series:
    out = []
    for v in s:
        if v is None:
            out.append(None)
            continue
        try:
            out.append(fn(v))
        except (ValueError, ipaddress.AddressValueError):
            out.append(None)
        except Exception:
            out.append(None)
    return pd.Series(out, dtype=dtype)


def ensure_registered(spark) -> None:
    """Register the IPv6 UDFs on this session (idempotent overwrite)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _aton(s: pd.Series) -> pd.Series:
        return _map(s, lambda v: _parse6(v).packed)

    @pandas_udf("string")
    def _ntoa(b: pd.Series) -> pd.Series:
        return _map(b, lambda v: _render(ipaddress.IPv6Address(bytes(v))))

    @pandas_udf("int")
    def _is_v6(s: pd.Series) -> pd.Series:
        def check(v: str) -> int:
            try:
                ipaddress.IPv6Address(v)
                return 1
            except ValueError:
                return 0
        return _map(s, check, dtype="Int32")

    @pandas_udf("string")
    def _cut(b: pd.Series, cut6: pd.Series, cut4: pd.Series) -> pd.Series:
        out = []
        for v, c6, c4 in zip(b, cut6, cut4):
            if v is None or c6 is None or c4 is None:
                out.append(None)
                continue
            raw = bytes(v)
            addr = ipaddress.IPv6Address(raw)
            # CH: v4-mapped addresses cut bytesToCutForIPv4, others cut6
            cut = int(c4) if addr.ipv4_mapped is not None else int(c6)
            cut = max(0, min(16, cut))
            kept = raw[: 16 - cut] + b"\x00" * cut
            out.append(_render(ipaddress.IPv6Address(kept)))
        return pd.Series(out, dtype=object)

    @pandas_udf("string")
    def _cidr_lo(b: pd.Series, p: pd.Series) -> pd.Series:
        out = []
        for v, pre in zip(b, p):
            if v is None or pre is None:
                out.append(None)
                continue
            net = ipaddress.IPv6Network(
                (ipaddress.IPv6Address(bytes(v)), int(pre)), strict=False
            )
            out.append(_render(net.network_address))
        return pd.Series(out, dtype=object)

    @pandas_udf("string")
    def _cidr_hi(b: pd.Series, p: pd.Series) -> pd.Series:
        out = []
        for v, pre in zip(b, p):
            if v is None or pre is None:
                out.append(None)
                continue
            net = ipaddress.IPv6Network(
                (ipaddress.IPv6Address(bytes(v)), int(pre)), strict=False
            )
            out.append(_render(net.broadcast_address))
        return pd.Series(out, dtype=object)

    @pandas_udf("int")
    def _in_range(a: pd.Series, c: pd.Series) -> pd.Series:
        out = []
        for addr, cidr in zip(a, c):
            if addr is None or cidr is None:
                out.append(None)
                continue
            try:
                out.append(int(
                    ipaddress.ip_address(addr)
                    in ipaddress.ip_network(cidr, strict=False)
                ))
            except ValueError:
                out.append(0)
        return pd.Series(out, dtype="Int32")

    spark.udf.register("ch_ipv6_aton", _aton)
    spark.udf.register("ch_ipv6_ntoa", _ntoa)
    spark.udf.register("ch_is_ipv6", _is_v6)
    spark.udf.register("ch_cut_ipv6", _cut)
    spark.udf.register("ch_ipv6_cidr_lo", _cidr_lo)
    spark.udf.register("ch_ipv6_cidr_hi", _cidr_hi)
    spark.udf.register("ch_ip_in_range", _in_range)
