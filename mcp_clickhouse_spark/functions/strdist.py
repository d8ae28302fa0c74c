"""Byte-exact ClickHouse string-distance functions (round 10 — were
guided errors): byteHammingDistance, damerauLevenshteinDistance,
jaroSimilarity, jaroWinklerSimilarity, and arrayLevenshtein.

ClickHouse computes these over BYTES (its String type is a byte
string; reference parity: the mcp server delegates them verbatim to
ClickHouse's StringDistance implementations).  Spark's builtin
``levenshtein`` is character-based, so these ship as Arrow pandas_udfs
operating on the UTF-8 byte encoding — identical to CH on every input,
not just ASCII.

Pinned semantics (ClickHouse docs examples, asserted in
tests/test_strdist_geo.py):

- ``byteHammingDistance('karolin', 'kathrin')`` = 3; unequal lengths
  count the length difference on top of the mismatched prefix.
- ``damerauLevenshteinDistance('clickhouse', 'mouse')`` = 6 — the FULL
  Damerau-Levenshtein (unrestricted, alphabet-indexed DP), the same
  variant DuckDB's ``damerau_levenshtein`` implements, which lets the
  driver oracle recompute it independently.
- ``jaroSimilarity('clickhouse', 'click')`` = 0.8333333333333333.
- ``jaroWinklerSimilarity('clickhouse', 'click')`` = 0.9 (standard
  Winkler boost: scaling 0.1, prefix capped at 4).
- ``arrayLevenshtein([1, 2, 4], [1, 2, 3])`` = 1 — plain Levenshtein
  over array ELEMENTS (equality-compared), any element type.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified hints


def byte_hamming(a: bytes, b: bytes) -> int:
    n = min(len(a), len(b))
    return sum(a[i] != b[i] for i in range(n)) + abs(len(a) - len(b))


def damerau_levenshtein(a, b) -> int:
    """Full (unrestricted) Damerau-Levenshtein over two sequences."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    # last row each symbol was seen in `a` (the classic "da" array)
    last_seen: dict = {}
    # DP matrix with a -1 sentinel row/col (offset by 1)
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0  # last column a[i-1] matched in b
        for j in range(1, lb + 1):
            k = last_seen.get(b[j - 1], 0)
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution / match
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[k][db] + (i - k - 1) + 1 + (j - db - 1),  # transposition
            )
        last_seen[a[i - 1]] = i
    return d[la + 1][lb + 1]


def jaro(a: bytes, b: bytes) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_match = [False] * la
    b_match = [False] * lb
    m = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_match[j] and a[i] == b[j]:
                a_match[i] = b_match[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    # transpositions: matched symbols out of order, halved
    t = 0
    j = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: bytes, b: bytes) -> float:
    sim = jaro(a, b)
    prefix = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        prefix += 1
    return sim + prefix * 0.1 * (1.0 - sim)


def levenshtein_seq(a, b) -> int:
    """Plain Levenshtein over two sequences (for arrayLevenshtein)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ai == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[lb]


def levenshtein_seq_weighted(a, b, wa, wb) -> float:
    """Weighted Levenshtein over sequences (arrayLevenshteinDistance-
    Weighted): deleting a[i] costs wa[i], inserting b[j] costs wb[j],
    substituting an unequal pair costs wa[i] + wb[j] (matching the CH
    docs example: (['A','B','C'], ['A','K','L'], [1,2,3], [3,4,5]) →
    14 = (2+4) + (3+5))."""
    la, lb = len(a), len(b)
    prev = [0.0] * (lb + 1)
    for j in range(1, lb + 1):
        prev[j] = prev[j - 1] + wb[j - 1]
    for i in range(1, la + 1):
        cur = [prev[0] + wa[i - 1]] + [0.0] * lb
        ai = a[i - 1]
        for j in range(1, lb + 1):
            sub = 0.0 if ai == b[j - 1] else wa[i - 1] + wb[j - 1]
            cur[j] = min(
                prev[j] + wa[i - 1],      # delete a[i]
                cur[j - 1] + wb[j - 1],   # insert b[j]
                prev[j - 1] + sub,        # match / substitute
            )
        prev = cur
    return prev[lb]


def _ngrams(seq):
    """4-gram multiset of a sequence (bytes → byte 4-slices, str →
    codepoint 4-tuples); sequences shorter than 4 have no grams."""
    n = 4
    if len(seq) < n:
        return []
    return [seq[i : i + n] for i in range(len(seq) - n + 1)]


def ngram_distance(a, b) -> float:
    """CH ngramDistance* (round 11 — was guided): symmetric-difference
    count of the two 4-gram multisets over the total gram count,
    computed in Float32 like ClickHouse (FunctionsStringSimilarity.cpp:
    ``distance * 1.f / std::max(first_size + second_size, size_t(1))``).
    Both shorter-than-4 → 0 grams each → 0.0; one-sided empty → 1.0."""
    import numpy as np
    from collections import Counter

    ca, cb = Counter(_ngrams(a)), Counter(_ngrams(b))
    total = sum(ca.values()) + sum(cb.values())
    if total == 0:
        return 0.0
    sym = sum(abs(ca[g] - cb[g]) for g in set(ca) | set(cb))
    return float(np.float32(sym) / np.float32(total))


def ngram_search(haystack, needle) -> float:
    """CH ngramSearch*: the fraction of the needle's 4-gram multiset
    found in the haystack (multiset-aware), Float32 like ClickHouse;
    a gram-less needle (len < 4) is trivially found → 1.0."""
    import numpy as np
    from collections import Counter

    cn = Counter(_ngrams(needle))
    ntotal = sum(cn.values())
    if ntotal == 0:
        return 1.0
    chay = Counter(_ngrams(haystack))
    matched = sum(min(c, chay[g]) for g, c in cn.items())
    return float(
        np.float32(1.0) - np.float32(ntotal - matched) / np.float32(ntotal)
    )


def _pair_series(sa: pd.Series, sb: pd.Series, fn, dtype) -> pd.Series:
    out = []
    for a, b in zip(sa, sb):
        if a is None or b is None:
            out.append(None)
        else:
            out.append(fn(a, b))
    return pd.Series(out, dtype=dtype)


def ensure_registered(spark) -> None:
    """Register the string-distance UDFs on this session (idempotent)."""
    from pyspark.sql.functions import pandas_udf

    def _bytes(fn):
        return lambda a, b: fn(a.encode("utf-8"), b.encode("utf-8"))

    @pandas_udf("int")
    def ch_byte_hamming(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pair_series(a, b, _bytes(byte_hamming), "Int32")

    @pandas_udf("int")
    def ch_damerau_lev(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pair_series(a, b, _bytes(damerau_levenshtein), "Int32")

    @pandas_udf("double")
    def ch_jaro(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pair_series(a, b, _bytes(jaro), "float64")

    @pandas_udf("double")
    def ch_jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pair_series(a, b, _bytes(jaro_winkler), "float64")

    @pandas_udf("int")
    def ch_array_levenshtein(a: pd.Series, b: pd.Series) -> pd.Series:
        # element lists arrive as numpy arrays; tolist() gives hashable
        # scalars compared by value
        return _pair_series(
            a,
            b,
            lambda x, y: levenshtein_seq(list(x), list(y)),
            "Int32",
        )

    @pandas_udf("double")
    def ch_array_lev_weighted(
        a: pd.Series, b: pd.Series, wa: pd.Series, wb: pd.Series
    ) -> pd.Series:
        out = []
        for x, y, wx, wy in zip(a, b, wa, wb):
            if x is None or y is None or wx is None or wy is None:
                out.append(None)
            else:
                out.append(
                    levenshtein_seq_weighted(
                        list(x), list(y),
                        [float(v) for v in wx], [float(v) for v in wy],
                    )
                )
        return pd.Series(out, dtype="float64")

    # ngram family (round 11): 8 CH spellings → 8 thin registrations over
    # the two core functions.  Byte variants run on the UTF-8 encoding
    # (bytes.lower() = ASCII-only lowercase, matching CH's byte path);
    # UTF8 variants run on codepoints (str.lower() = full Unicode
    # lowering, matching CH's lowerUTF8 on the supported planes).
    def _ngram_udf(core, ci: bool, utf8: bool):
        def prep(s: str):
            if utf8:
                return s.lower() if ci else s
            bs = s.encode("utf-8")
            return bs.lower() if ci else bs

        @pandas_udf("float")
        def f(a: pd.Series, b: pd.Series) -> pd.Series:
            return _pair_series(
                a, b, lambda x, y: core(prep(x), prep(y)), "float32"
            )

        return f

    for _nm, _core in (("dist", ngram_distance), ("search", ngram_search)):
        for _suffix, _ci, _u8 in (
            ("", False, False),
            ("_ci", True, False),
            ("_utf8", False, True),
            ("_ci_utf8", True, True),
        ):
            spark.udf.register(
                f"ch_ngram_{_nm}{_suffix}", _ngram_udf(_core, _ci, _u8)
            )

    spark.udf.register("ch_byte_hamming", ch_byte_hamming)
    spark.udf.register("ch_damerau_lev", ch_damerau_lev)
    spark.udf.register("ch_jaro", ch_jaro)
    spark.udf.register("ch_jaro_winkler", ch_jaro_winkler)
    spark.udf.register("ch_array_levenshtein", ch_array_levenshtein)
    spark.udf.register("ch_array_lev_weighted", ch_array_lev_weighted)
