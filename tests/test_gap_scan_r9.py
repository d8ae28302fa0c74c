"""Round-9 gap-scan closures: CH names that fell through to Spark's
unresolved-function error now either translate (builtin-identical maps,
subsequence/multi-search folds, mapSort, UUID roundtrip, jump hash) or
raise guided errors (NLP-dictionary functions, byte-level distances).
Values pinned against ClickHouse docs examples."""

from __future__ import annotations

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate


def one(spark, sql):
    from mcp_clickhouse_spark.functions import register_lazy_udfs

    out = translate(sql)
    register_lazy_udfs(spark, out)  # initcap → ch_initcap since round 16
    return spark.sql(out).collect()[0]


def test_builtin_identical_names(spark):
    row = one(
        spark,
        "SELECT initcap('building for fast') AS ic,"
        " levenshteinDistance('clickhouse', 'mouse') AS lev,"
        " editDistance('kitten', 'sitting') AS ed,"
        " soundex('aksel') AS sx,"
        " widthBucket(10.15, -8.6, 23, 18) AS wb,"
        " repeat('ab', 3) AS rep,"
        " isValidUTF8('ok') AS valid,"
        " toValidUTF8('ok') AS fixed",
    )
    assert row.ic == "Building For Fast"   # CH docs initcap example
    assert row.lev == 6                    # CH docs levenshteinDistance
    assert row.ed == 3
    assert row.sx == "A240"                # CH docs soundex example
    assert row.wb == 11                    # CH docs widthBucket example
    assert row.rep == "ababab"
    assert (row.valid, row.fixed) == (1, "ok")


def test_has_subsequence(spark):
    # CH docs: hasSubsequence('garbage', 'arg') = 1 (in-order, gaps ok)
    row = one(
        spark,
        "SELECT hasSubsequence('garbage', 'arg') AS a,"
        " hasSubsequence('garbage', 'eg') AS b,"
        " hasSubsequence('garbage', '') AS c,"
        " hasSubsequence('', 'x') AS d,"
        " hasSubsequenceCaseInsensitive('garbage', 'ARG') AS e",
    )
    assert (row.a, row.b, row.c, row.d, row.e) == (1, 0, 1, 0, 1)


def test_multisearch_first_position_and_counts(spark):
    row = one(
        spark,
        "SELECT multiSearchFirstPosition('Hello World', ['or', 'Wor']) AS p,"
        " multiSearchFirstPosition('abc', ['zz', 'yy']) AS zero,"
        " countSubstringsCaseInsensitive('AAaa', 'aa') AS ci",
    )
    assert row.p == 7       # min('or'@8, 'Wor'@7) — leftmost wins
    assert row.zero == 0
    assert row.ci == 2


def test_map_sort_and_uuid_roundtrip(spark):
    row = one(
        spark,
        "SELECT map_keys(mapSort(map('c', 3, 'a', 1, 'b', 2))) AS ks,"
        " map_keys(mapReverseSort(map('a', 1, 'b', 2))) AS rks,"
        " UUIDNumToString(UUIDStringToNum("
        "'612f3c40-5d3b-217e-707b-6a546a3d7b29')) AS u",
    )
    assert list(row.ks) == ["a", "b", "c"]
    assert list(row.rks) == ["b", "a"]
    assert row.u == "612f3c40-5d3b-217e-707b-6a546a3d7b29"


def test_regexp_quote_meta(spark):
    row = one(spark, r"SELECT regexpQuoteMeta('a.b[c]+{d}') AS q")
    # CH's escape list has '{' but NOT '}' — the docs' exact set
    assert row.q == r"a\.b\[c\]\+\{d}"


def test_group_array_last_shape():
    out = translate("SELECT groupArrayLast(2)(x) FROM t GROUP BY g")
    assert "reverse(slice(reverse(collect_list(x)), 1, 2))" in out


def test_jump_consistent_hash(spark):
    from mcp_clickhouse_spark.functions.jumphash import jump_consistent_hash
    from mcp_clickhouse_spark.tools import run_select_query

    # CH docs example
    assert jump_consistent_hash(256, 4) == 3
    # stability: moving 4 -> 5 buckets only reassigns ~1/5 of keys
    moved = sum(
        jump_consistent_hash(k, 4) != jump_consistent_hash(k, 5)
        for k in range(1000)
    )
    assert 100 < moved < 320
    res = run_select_query(
        spark,
        "SELECT jumpConsistentHash(256, 4) AS j",
        dialect="clickhouse",
    )
    assert res["rows"] == [[3]]


def test_guided_errors_fire():
    for sql, frag in [
        ("SELECT detectLanguage(text) FROM t", "NLP"),
        ("SELECT lemmatize('en', w) FROM t", "NLP"),
        # jaroWinklerSimilarity & friends now TRANSLATE (round 10,
        # functions/strdist.py); ngramDistance/Search now TRANSLATE too
        # (round 11, functions/strdist.py) — the MinHash shingle family
        # stays guided (engine-internal state)
        ("SELECT ngramMinHash(a) FROM t", "MinHash"),
        ("SELECT consistentHash(x, 10) FROM t", "jumpConsistentHash"),
        # sequenceNextNode now TRANSLATES (round 10) — malformed arity
        # still raises the argument-shape guidance
        ("SELECT sequenceNextNode('forward', 'head')(t, e) FROM x",
         "arguments"),
        ("SELECT seriesDecomposeSTL(x, 7) FROM t", "STL"),
        ("SELECT mapSort((k, v) -> v, m) FROM t", "1-argument"),
    ]:
        with pytest.raises(DialectError, match=frag):
            translate(sql)


def test_interval_length_sum(spark):
    # union length: [1,3] ∪ [2,4] = [1,4] → 3; touching [1,3] ∪ [3,5] → 4;
    # disjoint adds; NULL endpoints contribute nothing
    rows = spark.sql(
        translate(
            "SELECT g, intervalLengthSum(s, e) AS l FROM (SELECT * FROM"
            " VALUES (1, 1.0, 3.0), (1, 2.0, 4.0),"
            " (2, 1.0, 3.0), (2, 3.0, 5.0),"
            " (3, 1.0, 2.0), (3, 10.0, 11.5),"
            " (4, 1.0, 2.0), (4, CAST(NULL AS DOUBLE), 9.0)"
            " AS t(g, s, e)) GROUP BY g ORDER BY g"
        )
    ).collect()
    assert [(r.g, r.l) for r in rows] == [
        (1, 3.0), (2, 4.0), (3, 2.5), (4, 1.0)
    ]


def test_skew_kurt_samp(spark):
    row = one(
        spark,
        "SELECT round(skewSamp(x), 10) AS sk, round(kurtSamp(x), 10) AS ku"
        " FROM (SELECT explode(array(1.0, 2.0, 4.0, 8.0, 16.0)) AS x)",
    )
    # pinned against CH Moments.h: population (/n) central moments over
    # SAMPLE stddev powers (m₃/s³, m₄/s⁴) — the r9 advisor's correction
    assert abs(row.sk - 0.6361510607104343) < 1e-9
    assert abs(row.ku - 1.4886021505376340) < 1e-9


def test_base58_binary_payload():
    # r9 advisor: valid base58 encoding NON-UTF-8 bytes must decode to a
    # string (latin-1 fallback — Spark strings are UTF-8, documented
    # delta), not raise / return '' from tryBase58Decode
    from mcp_clickhouse_spark.functions.codecs import base58_decode

    # '3CUsUpv9t' is base58 of bytes fedcba9876 (non-UTF-8: 0xfe lead byte)
    n = int.from_bytes(bytes.fromhex("fedcba9876"), "big")
    _B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    enc = ""
    while n:
        n, r = divmod(n, 58)
        enc = _B58[r] + enc
    out = base58_decode(enc)
    assert out.encode("latin-1") == bytes.fromhex("fedcba9876")


def test_string_codecs(spark):
    from mcp_clickhouse_spark.tools import run_select_query

    res = run_select_query(
        spark,
        "SELECT punycodeEncode('München') AS pe,"
        " punycodeDecode('Mnchen-3ya') AS pd,"
        " tryPunycodeDecode('---!not punycode!') AS tp,"
        " idnaEncode('straße.münchen.de') AS ie,"
        " idnaDecode('xn--strae-oqa.xn--mnchen-3ya.de') AS id,"
        " base58Encode('Encoded') AS be,"
        " base58Decode('3dc8KtHrwM') AS bd,"
        " tryBase58Decode('invalid!0') AS tb",
        dialect="clickhouse",
    )
    row = dict(zip(res["columns"], res["rows"][0]))
    assert row["pe"] == "Mnchen-3ya"          # CH docs punycodeEncode
    assert row["pd"] == "München"
    assert row["tp"] == ""
    # CH docs idnaEncode example — IDNA 2008 (ß preserved, not ss)
    assert row["ie"] == "xn--strae-oqa.xn--mnchen-3ya.de"
    assert row["id"] == "straße.münchen.de"
    assert row["be"] == "3dc8KtHrwM"          # CH docs base58Encode
    assert row["bd"] == "Encoded"
    assert row["tb"] == ""


def test_quantize_embeddings_quality(spark, monkeypatch):
    # int8 quantization: reconstruction error bounded by scale/2 per
    # component, and the quantized dot product preserves the float
    # nearest-neighbor for well-separated vectors
    import math

    from mcp_clickhouse_spark.pipeline.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.02, 0.01, -0.02, 0.005]),
         (3, [0.0, 0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    # -0.5/(1/127) = -63.5 → Spark round is half-away-from-zero → -64
    assert rows[1].q == [127, -64, 32, 0]
    assert rows[1].rmse <= rows[1].scale / 2 + 1e-12
    assert rows[2].scale == pytest.approx(0.02 / 127)
    assert rows[3].scale is None and rows[3].q == [0, 0, 0, 0]
    assert rows[3].rmse == 0.0
