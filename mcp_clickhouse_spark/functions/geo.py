"""Geohash codec UDFs (round 10 — geohashEncode/geohashDecode were
unresolved names; reference parity: the mcp server delegates them to
ClickHouse's GeoHash.cpp).

The standard geohash algorithm: interleave longitude/latitude binary
subdivisions (lon takes the even bits starting at bit 0) and render
5 bits per character in the geohash base32 alphabet.  Pinned to the
ClickHouse docs examples in tests/test_strdist_geo.py:

- ``geohashEncode(-5.60302734375, 42.593994140625, 0)`` =
  ``'ezs42d000000'`` (precision 0 → the CH default 12);
- ``geohashDecode('ezs42')`` = ``(-5.60302734375, 42.60498046875)``
  (center of the cell).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified hints

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32_INDEX = {c: i for i, c in enumerate(_B32)}


def geohash_encode(lon: float, lat: float, precision: int) -> str:
    # CH clamps precision to [1, 12]; 0 / out-of-range → 12 (the default)
    p = int(precision)
    if p <= 0 or p > 12:
        p = 12
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    bits = []
    even = True  # longitude first
    while len(bits) < p * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(0, len(bits), 5):
        v = 0
        for b in bits[i : i + 5]:
            v = (v << 1) | b
        out.append(_B32[v])
    return "".join(out)


def geohash_decode(s: str) -> tuple[float, float]:
    """Cell-center (lon, lat) of a geohash; invalid chars → (0, 0) like
    ClickHouse's tolerant decode of non-base32 input."""
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    even = True
    for c in s:
        v = _B32_INDEX.get(c)
        if v is None:
            return (0.0, 0.0)
        for shift in range(4, -1, -1):
            bit = (v >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return ((lon_lo + lon_hi) / 2, (lat_lo + lat_hi) / 2)


def ensure_registered(spark) -> None:
    """Register the geohash UDFs on this session (idempotent)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def ch_geohash_encode(
        lon: pd.Series, lat: pd.Series, prec: pd.Series
    ) -> pd.Series:
        out = []
        for lo, la, p in zip(lon, lat, prec):
            if lo is None or la is None:
                out.append(None)
            else:
                out.append(geohash_encode(float(lo), float(la), int(p or 0)))
        return pd.Series(out, dtype=object)

    @pandas_udf("struct<_1: double, _2: double>")
    def ch_geohash_decode(s: pd.Series) -> pd.DataFrame:
        lons, lats = [], []
        for v in s:
            if v is None:
                lons.append(None)
                lats.append(None)
            else:
                lon, lat = geohash_decode(v)
                lons.append(lon)
                lats.append(lat)
        return pd.DataFrame({"_1": lons, "_2": lats})

    spark.udf.register("ch_geohash_encode", ch_geohash_encode)
    spark.udf.register("ch_geohash_decode", ch_geohash_decode)
