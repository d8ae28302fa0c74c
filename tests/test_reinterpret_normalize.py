"""Round 9 (r8 verdict next #5): the two highest-impact guided-error
corners now TRANSLATE — reinterpretAs* (byte-exact little-endian
reinterpretation as JVM-side conv/hex folds) and normalizeUTF8NFC/NFD/
NFKC/NFKD (Arrow pandas_udf over unicodedata, the same UAX #15 forms
ICU gives ClickHouse).  Values pinned against the ClickHouse docs
examples (sql-reference/functions/type-conversion-functions and
string-functions)."""

from __future__ import annotations

from decimal import Decimal

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate


def one(spark, sql):
    return spark.sql(translate(sql)).collect()[0]


def test_reinterpret_unsigned_from_signed(spark):
    # two's-complement wrap: CH docs pin reinterpretAsUInt8(toInt8(-1))=255
    row = one(
        spark,
        "SELECT reinterpretAsUInt8(toInt8(-1)) AS u8,"
        " reinterpretAsUInt16(toInt16(-1)) AS u16,"
        " reinterpretAsUInt32(toInt32(-1)) AS u32,"
        " reinterpretAsUInt64(toInt64(-1)) AS u64",
    )
    assert row.u8 == 255
    assert row.u16 == 65535
    assert row.u32 == 4294967295
    assert row.u64 == Decimal("18446744073709551615")


def test_reinterpret_signed_from_unsigned(spark):
    row = one(
        spark,
        "SELECT reinterpretAsInt8(255) AS i8,"
        " reinterpretAsInt16(65535) AS i16,"
        " reinterpretAsInt32(4294967295) AS i32,"
        " reinterpretAsInt64(42) AS i64",
    )
    assert (row.i8, row.i16, row.i32, row.i64) == (-1, -1, -1, 42)


def test_reinterpret_narrowing_takes_low_bytes(spark):
    # LE memory layout: the low byte survives narrowing (CH docs:
    # reinterpretAsUInt8 of 257 reads the first byte = 1)
    row = one(
        spark,
        "SELECT reinterpretAsUInt8(257) AS a, reinterpretAsInt8(257) AS b",
    )
    assert (row.a, row.b) == (1, 1)


def test_reinterpret_string_input_le_bytes(spark):
    # 'ab' = bytes 97, 98 → 97 + 98·256; missing bytes read as 0
    row = one(
        spark,
        "SELECT reinterpretAsUInt16('ab') AS u16,"
        " reinterpretAsUInt32('abcd') AS u32,"
        " reinterpretAsUInt64('a') AS u64,"
        " reinterpretAsUInt8('') AS z",
    )
    assert row.u16 == 25185
    assert row.u32 == 1684234849
    assert row.u64 == Decimal(97)
    assert row.z == 0


def test_reinterpret_as_string(spark):
    # CH docs: reinterpretAsString(toInt32(65)) = 'A' (trailing zero
    # bytes dropped); strings pass through unchanged
    row = one(
        spark,
        "SELECT reinterpretAsString(toInt32(65)) AS a,"
        " reinterpretAsString('keep') AS k,"
        " reinterpretAsString(0) AS z",
    )
    assert row.a == "A"
    assert row.k == "keep"
    assert row.z == ""


def test_reinterpret_string_roundtrip(spark):
    # CH docs example: reinterpretAsUInt32(reinterpretAsString(3909))=3909
    row = one(
        spark,
        "SELECT reinterpretAsUInt32(reinterpretAsString(3909)) AS n",
    )
    assert row.n == 3909


def test_reinterpret_temporal(spark):
    # Date = UInt16 days since epoch; DateTime = UInt32 unix seconds
    row = one(
        spark,
        "SELECT reinterpretAsDate(65) AS d, reinterpretAsDateTime(65) AS t,"
        " reinterpretAsUInt16(toDate('1970-03-07')) AS days",
    )
    assert str(row.d) == "1970-03-07"
    assert str(row.t).startswith("1970-01-01 00:01:05")
    assert row.days == 65


def test_reinterpret_float_stays_guided(spark):
    with pytest.raises(DialectError, match="bit-cast"):
        translate("SELECT reinterpretAsFloat32(x) FROM t")
    # float INPUT is a runtime guided error (typeof branch)
    with pytest.raises(Exception, match="IEEE bit access"):
        spark.sql(
            translate("SELECT reinterpretAsUInt32(CAST(1.5 AS Float64))")
        ).collect()


def test_normalize_utf8_forms(spark):
    # lazy-UDF path: probe through run_select_query exactly like the tool
    # layer does (registration happens on demand)
    from mcp_clickhouse_spark.tools import run_select_query

    res = run_select_query(
        spark,
        "SELECT char_length(normalizeUTF8NFC('á')) AS nfc_len,"
        " char_length(normalizeUTF8NFD('á')) AS nfd_len,"
        " normalizeUTF8NFKC('①') AS nfkc,"
        " char_length(normalizeUTF8NFKD('á')) AS nfkd_len",
        dialect="clickhouse",
    )
    row = dict(zip(res["columns"], res["rows"][0]))
    assert row["nfc_len"] == 1      # a + combining acute composes to á
    assert row["nfd_len"] == 2      # á decomposes to a + combining acute
    assert row["nfkc"] == "1"       # CH docs: circled digit ① → '1'
    assert row["nfkd_len"] == 2
