"""Value-faithful ClickHouse string codecs (round 9 gap scan):
punycodeEncode/Decode (RFC 3492 via Python's punycode codec),
idnaEncode/Decode (IDNA 2008 via the `idna` package — ClickHouse's
idnaEncode docs example 'straße.münchen.de' →
'xn--strae-oqa.xn--mnchen-3ya.de' is non-transitional IDNA 2008, which
Python's BUILT-IN idna codec would get wrong: it implements IDNA 2003
and maps ß→ss), and base58Encode/Decode (Bitcoin alphabet, the one CH
uses).  All Arrow-batched pandas_udfs registered lazily via
functions.LAZY_UDFS; the try* variants return the CH-documented
empty-string-on-error instead of raising.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified hints

_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58)}


def base58_encode(s: str) -> str:
    data = s.encode("utf-8")
    n = int.from_bytes(data, "big") if data else 0
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(_B58[r])
    pad = 0
    for b in data:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def base58_decode(s: str) -> str:
    n = 0
    for c in s:
        if c not in _B58_INDEX:
            raise ValueError(f"invalid base58 character {c!r}")
        n = n * 58 + _B58_INDEX[c]
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = len(s) - len(s.lstrip("1"))
    data = b"\x00" * pad + raw
    # CH returns the raw bytes as a String (its strings are byte strings).
    # Spark's StringType is UTF-8, so non-UTF-8 payloads can't round-trip
    # byte-exactly; fall back to latin-1 (r9 advisor) — every byte maps to
    # one codepoint, information-preserving, rather than raising (which
    # also broke tryBase58Decode's empty-string contract for valid base58
    # of binary payloads).  Documented delta: re-encoding those codepoints
    # as UTF-8 differs from CH's raw bytes.
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return data.decode("latin-1")


def _map_series(s: pd.Series, fn, on_error: str | None) -> pd.Series:
    out = []
    for v in s:
        if v is None:
            out.append(None)
            continue
        try:
            out.append(fn(v))
        except Exception:
            if on_error is None:
                raise
            out.append(on_error)
    return pd.Series(out, dtype=object)


def ensure_registered(spark) -> None:
    """Register the codec UDFs on this session (idempotent overwrite)."""
    import idna as _idna
    from pyspark.sql.functions import pandas_udf

    def _puny_enc(v: str) -> str:
        return v.encode("punycode").decode("ascii")

    def _puny_dec(v: str) -> str:
        return v.encode("ascii").decode("punycode")

    def _idna_enc(v: str) -> str:
        # uts46 pre-maps case/dots the way CH's ToASCII accepts them
        return _idna.encode(v, uts46=True).decode("ascii") if v else ""

    def _idna_dec(v: str) -> str:
        return _idna.decode(v) if v else ""

    def _make(fn, on_error):
        # a closure factory, NOT default args: pandas_udf requires type
        # hints on every parameter, so extras must be captured lexically
        @pandas_udf("string")
        def _udf(s: pd.Series) -> pd.Series:
            return _map_series(s, fn, on_error)

        return _udf

    for name, fn, on_error in [
        ("ch_punycode_encode", _puny_enc, None),
        ("ch_punycode_decode", _puny_dec, None),
        ("ch_try_punycode_decode", _puny_dec, ""),
        ("ch_idna_encode", _idna_enc, None),
        ("ch_try_idna_encode", _idna_enc, ""),
        ("ch_idna_decode", _idna_dec, None),
        ("ch_base58_encode", base58_encode, None),
        ("ch_base58_decode", base58_decode, None),
        ("ch_try_base58_decode", base58_decode, ""),
        ("ch_base32_encode", base32_encode, None),
        ("ch_base32_decode", base32_decode, None),
        ("ch_try_base32_decode", base32_decode, ""),
        ("ch_decode_xml", decode_xml_component, None),
        ("ch_decode_html", decode_html_component, None),
    ]:
        spark.udf.register(name, _make(fn, on_error))

    @pandas_udf("string")
    def ch_json_merge_patch(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            out.append(
                None if x is None or y is None else json_merge_patch(x, y)
            )
        return pd.Series(out, dtype=object)

    # variadic CH calls fold into nested 2-arg applications (dialect.py)
    spark.udf.register("ch_json_merge_patch", ch_json_merge_patch)

    @pandas_udf("decimal(20,0)")
    def _crc64(s: pd.Series) -> pd.Series:
        from decimal import Decimal

        return pd.Series(
            [
                None if v is None else Decimal(crc64_ecma(str(v).encode()))
                for v in s
            ],
            dtype=object,
        )

    spark.udf.register("ch_crc64", _crc64)

    @pandas_udf("float")
    def ch_bfloat16(x: pd.Series) -> pd.Series:
        # toBFloat16 (round 15): float32 with the mantissa cut to 7 bits
        # via round-to-nearest-even on the raw bits — the standard
        # fp32→bf16 conversion (add 0x7FFF plus the round bit, then
        # truncate), matching hardware/static_cast<BFloat16> semantics.
        import numpy as np

        f32 = x.to_numpy(dtype="float64").astype(np.float32)
        bits = f32.view(np.uint32)
        rounded = (bits + 0x7FFF + ((bits >> 16) & 1)) & 0xFFFFFFFF
        out = ((rounded >> 16) << 16).astype(np.uint32).view(np.float32)
        # NaN payloads must stay NaN (the rounding add can carry into
        # the exponent of a NaN/inf only for NaN payload bits)
        out = np.where(np.isnan(f32), np.float32("nan"), out)
        res = pd.Series(out.astype("float64"))
        res[x.isna()] = None
        return res

    spark.udf.register("ch_bfloat16", ch_bfloat16)

    # CH initcap (round 16): words are ALNUM RUNS separated by any
    # non-alphanumeric character — first character uppercased, the rest
    # of the word lowercased ('foo_bar' → 'Foo_Bar'); Spark's builtin
    # splits on whitespace only.  The plain form is ASCII-word (CH's
    # byte-oriented contract on ASCII input); the UTF8 form uses Unicode
    # alphanumerics (\w minus underscore).
    import re as _re

    _ascii_word = _re.compile(r"[A-Za-z0-9]+")
    _uni_word = _re.compile(r"[^\W_]+", _re.UNICODE)

    def _initcap_of(pat):
        def _conv(m):
            w = m.group(0)
            return w[0].upper() + w[1:].lower()

        def _fn(s: pd.Series) -> pd.Series:
            return pd.Series(
                [None if v is None else pat.sub(_conv, str(v)) for v in s],
                dtype=object,
            )

        return _fn

    spark.udf.register(
        "ch_initcap", pandas_udf("string")(_initcap_of(_ascii_word))
    )
    spark.udf.register(
        "ch_initcap_utf8", pandas_udf("string")(_initcap_of(_uni_word))
    )


_CRC64_POLY = 0xC96C5795D7870F42  # reflected ECMA-182
_CRC64_TAB: list[int] = []


def crc64_ecma(data: bytes) -> int:
    """CRC-64 with the reflected ECMA-182 polynomial, init 0, xorout 0 —
    the exact parameter set of ClickHouse's CRC64 (src/Functions/CRC.h:
    CRC64ECMAImpl builds the reflected table from 0xc96c5795d7870f42 and
    folds from crc = 0 with no final inversion; this is NOT CRC-64/XZ,
    which adds all-ones init/xorout).  Returns UInt64 (round 13)."""
    if not _CRC64_TAB:
        for i in range(256):
            c = i
            for _ in range(8):
                c = (_CRC64_POLY ^ (c >> 1)) if (c & 1) else (c >> 1)
            _CRC64_TAB.append(c)
    crc = 0
    for b in data:
        crc = _CRC64_TAB[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc


def base32_encode(s: str) -> str:
    """RFC 4648 base32 with padding (round 10), over the UTF-8 bytes —
    the same contract CH's base32Encode documents."""
    import base64 as _b64

    return _b64.b32encode(s.encode("utf-8")).decode("ascii")


def base32_decode(s: str) -> str:
    """Strict RFC 4648 decode; raises on invalid input (base32Decode),
    mapped to '' by the try* wrapper.  Non-UTF-8 payloads fall back to
    latin-1 like base58_decode (documented delta)."""
    import base64 as _b64

    data = _b64.b32decode(s.encode("ascii"))
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return data.decode("latin-1")


_XML_ENTITIES = {
    "lt": "<", "gt": ">", "amp": "&", "quot": '"', "apos": "'",
}


def decode_xml_component(s: str) -> str:
    """CH decodeXMLComponent (round 11 — was guided): only the five
    predefined XML entities plus numeric character references
    (&#NNN; / &#xHH;) decode; any other &…; sequence passes through
    verbatim (the CH docs' contract).  Invalid/overflowing numeric refs
    also pass through, like CH."""
    import re as _re

    def _sub(m):
        body = m.group(1)
        if body in _XML_ENTITIES:
            return _XML_ENTITIES[body]
        try:
            code = (
                int(body[2:], 16) if body[:2] in ("#x", "#X")
                else int(body[1:])
            )
            return chr(code)
        except (ValueError, OverflowError):
            return m.group(0)

    return _re.sub(r"&(#[xX][0-9a-fA-F]+|#[0-9]+|[a-zA-Z]+);", _sub, s)


def decode_html_component(s: str) -> str:
    """CH decodeHTMLComponent (round 11 — was guided): the full HTML5
    named-entity table plus numeric references — exactly Python's
    html.unescape (both implement the WHATWG entity list)."""
    import html as _html

    return _html.unescape(s)


def json_merge_patch(*docs: str) -> str:
    """CH jsonMergePatch(j1, j2, …) (round 11 — was a passthrough):
    RFC 7386 JSON Merge Patch applied left-to-right — object members
    merge recursively, null values DELETE the member, non-objects
    replace wholesale.  The algorithm is the RFC's own pseudocode;
    output is compact-separator JSON like CH."""
    import json as _json

    def merge(target, patch):
        if not isinstance(patch, dict):
            return patch
        if not isinstance(target, dict):
            target = {}
        out = dict(target)
        for k, v in patch.items():
            if v is None:
                out.pop(k, None)
            else:
                out[k] = merge(out.get(k), v)
        return out

    acc = _json.loads(docs[0])
    for d in docs[1:]:
        acc = merge(acc, _json.loads(d))
    return _json.dumps(acc, separators=(",", ":"), ensure_ascii=False)
