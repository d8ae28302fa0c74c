"""Value-faithful xxHash32 / xxHash64 (seed 0) as Arrow pandas_udfs.

ClickHouse's xxHash32/xxHash64 are the reference XXH32/XXH64 algorithms
with seed 0 over the string's UTF-8 bytes — unlike Spark's builtin
``xxhash64`` (XXH64 with seed 42 over Spark's internal row encoding),
so the builtin can never be value-faithful.  Implemented here from the
public xxHash specification (github.com/Cyan4973/xxHash — the spec
document, not the code); pinned against the spec's known answers
(XXH32("") = 0x02CC5D05, XXH64("") = 0xEF46DB3751D8E999) and the
ClickHouse docs example xxHash32('Hello, world!') = 834093149 in
tests/test_r14_fixes.py.

Reference contract basis: verbatim SQL delegation in
/root/reference/mcp_clickhouse/mcp_server.py:425.
"""

from __future__ import annotations

import struct

import pandas as pd

_M32 = 0xFFFFFFFF
_P32_1, _P32_2, _P32_3, _P32_4, _P32_5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393,
)

_M64 = 0xFFFFFFFFFFFFFFFF
_P64_1, _P64_2, _P64_3, _P64_4, _P64_5 = (
    11400714785074694791, 14029467366897019727, 1609587929392839161,
    9650029242287828579, 2870177450012600261,
)


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P32_1 + _P32_2) & _M32
        v2 = (seed + _P32_2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P32_1) & _M32
        while i <= n - 16:
            for _ in range(1):
                pass
            lanes = struct.unpack_from("<4I", data, i)
            v1 = (_rotl32((v1 + lanes[0] * _P32_2) & _M32, 13) * _P32_1) & _M32
            v2 = (_rotl32((v2 + lanes[1] * _P32_2) & _M32, 13) * _P32_1) & _M32
            v3 = (_rotl32((v3 + lanes[2] * _P32_2) & _M32, 13) * _P32_1) & _M32
            v4 = (_rotl32((v4 + lanes[3] * _P32_2) & _M32, 13) * _P32_1) & _M32
            i += 16
        acc = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
            + _rotl32(v4, 18)
        ) & _M32
    else:
        acc = (seed + _P32_5) & _M32
    acc = (acc + n) & _M32
    while i <= n - 4:
        (lane,) = struct.unpack_from("<I", data, i)
        acc = (_rotl32((acc + lane * _P32_3) & _M32, 17) * _P32_4) & _M32
        i += 4
    while i < n:
        acc = (_rotl32((acc + data[i] * _P32_5) & _M32, 11) * _P32_1) & _M32
        i += 1
    acc ^= acc >> 15
    acc = (acc * _P32_2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P32_3) & _M32
    acc ^= acc >> 16
    return acc


def _xxh64_round(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P64_2) & _M64, 31) * _P64_1) & _M64


def _xxh64_merge(acc: int, val: int) -> int:
    acc ^= _xxh64_round(0, val)
    return (acc * _P64_1 + _P64_4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        while i <= n - 32:
            lanes = struct.unpack_from("<4Q", data, i)
            v1 = _xxh64_round(v1, lanes[0])
            v2 = _xxh64_round(v2, lanes[1])
            v3 = _xxh64_round(v3, lanes[2])
            v4 = _xxh64_round(v4, lanes[3])
            i += 32
        acc = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
            + _rotl64(v4, 18)
        ) & _M64
        acc = _xxh64_merge(acc, v1)
        acc = _xxh64_merge(acc, v2)
        acc = _xxh64_merge(acc, v3)
        acc = _xxh64_merge(acc, v4)
    else:
        acc = (seed + _P64_5) & _M64
    acc = (acc + n) & _M64
    while i <= n - 8:
        (lane,) = struct.unpack_from("<Q", data, i)
        acc = (_rotl64(acc ^ _xxh64_round(0, lane), 27) * _P64_1
               + _P64_4) & _M64
        i += 8
    if i <= n - 4:
        (lane,) = struct.unpack_from("<I", data, i)
        acc = (_rotl64(acc ^ (lane * _P64_1) & _M64, 23) * _P64_2
               + _P64_3) & _M64
        i += 4
    while i < n:
        acc = (_rotl64(acc ^ (data[i] * _P64_5) & _M64, 11) * _P64_1) & _M64
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P64_2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P64_3) & _M64
    acc ^= acc >> 32
    return acc


def register(spark) -> None:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def ch_xxhash32(s: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else xxh32(str(v).encode("utf-8"))
             for v in s],
            dtype="Int64",
        )

    @pandas_udf("string")
    def ch_xxhash64(s: pd.Series) -> pd.Series:
        # CH returns UInt64; values past 2^63 can't ride a Spark LONG,
        # so marshal the decimal string (the repo's UInt64 convention)
        return pd.Series(
            [None if v is None else str(xxh64(str(v).encode("utf-8")))
             for v in s]
        )

    spark.udf.register("ch_xxhash32", ch_xxhash32)
    spark.udf.register("ch_xxhash64", ch_xxhash64)
