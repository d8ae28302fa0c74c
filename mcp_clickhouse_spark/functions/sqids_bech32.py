"""Value-faithful Sqids and Bech32 codecs (round 13 — the last two
guided-error codec names become real implementations).

Both are written from their PUBLIC specifications, not ported from any
implementation:

- **Sqids** (https://sqids.org, github.com/sqids/sqids-spec): the
  alphabet-shuffle id obfuscator ClickHouse wraps for ``sqid()`` /
  ``sqidDecode()`` (reference: mcp-clickhouse delegates to the server's
  function set; CH docs example sqid(1,2,3,4,5) = 'gXHfJ1C6dN').  The
  spec's consistent-shuffle, offset selection, reversed-alphabet
  chaining and separator re-shuffle are reproduced exactly; pinned
  against the spec repo's published vectors ([1,2,3] = '86Rf07', the
  0..7 incremental table) AND the CH docs example.  DELTA (documented):
  the default ~560-word blocklist re-encode step is NOT applied — ids
  that happen to contain a blocklisted word differ from upstream (an
  explicitly cosmetic feature; numeric round-trip fidelity is
  unaffected).
- **Bech32 / Bech32m** (BIP-173 / BIP-350 reference pseudocode): 5-bit
  charset, GF(2^5) polymod checksum.  ``ch_bech32_encode(hrp, data,
  witver)`` with witver >= 0 emits the SegWit form (witver symbol +
  8→5-bit program, bech32 constant for v0, bech32m for v1+); witver < 0
  emits plain bech32 over the padded 8→5 conversion.  Decode
  auto-detects (tries the plain byte conversion first, then the
  witver-prefixed shape, and both checksum constants) and returns the
  CH-style (hrp, bytes) tuple.  Pinned against the BIP-173 vectors
  ('a' + empty = 'a12uel5l', the P2WPKH/P2WSH addresses).

Both run as Arrow-batched pandas_udfs (per-row alphabet shuffles and
data-dependent loops have no SQL-expression form) — the same fidelity
path as murmurHash3_64 / jumpConsistentHash.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified hints

# --- Sqids (public spec) ----------------------------------------------------

_SQIDS_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def _sq_shuffle(alphabet: str) -> str:
    """The spec's 'consistent shuffle' — deterministic, seedless."""
    chars = list(alphabet)
    i, j = 0, len(chars) - 1
    while j > 0:
        r = (i * j + ord(chars[i]) + ord(chars[j])) % len(chars)
        chars[i], chars[r] = chars[r], chars[i]
        i += 1
        j -= 1
    return "".join(chars)


_SQIDS_SHUFFLED = _sq_shuffle(_SQIDS_ALPHABET)


def _sq_to_id(num: int, alph: str) -> str:
    out = []
    n = num
    while True:
        out.append(alph[n % len(alph)])
        n //= len(alph)
        if n == 0:
            break
    return "".join(reversed(out))


def _sq_to_number(s: str, alph: str) -> int:
    n = 0
    for ch in s:
        n = n * len(alph) + alph.index(ch)
    return n


def sqids_encode(numbers: list[int]) -> str:
    """Spec encode with increment 0 (no blocklist pass — see module
    docstring)."""
    if not numbers:
        return ""
    if any(n < 0 for n in numbers):
        raise ValueError("sqid: numbers must be non-negative")
    alphabet = _SQIDS_SHUFFLED
    offset = len(numbers)
    for i, v in enumerate(numbers):
        offset += ord(alphabet[v % len(alphabet)]) + i
    offset %= len(alphabet)
    alph = alphabet[offset:] + alphabet[:offset]
    prefix = alph[0]
    alph = alph[::-1]
    parts = [prefix]
    for i, num in enumerate(numbers):
        parts.append(_sq_to_id(num, alph[1:]))
        if i < len(numbers) - 1:
            parts.append(alph[0])
            alph = _sq_shuffle(alph)
    return "".join(parts)


def sqids_decode(sqid: str) -> list[int]:
    if not sqid:
        return []
    alphabet = _SQIDS_SHUFFLED
    if any(c not in alphabet for c in sqid):
        return []
    offset = alphabet.index(sqid[0])
    alph = alphabet[offset:] + alphabet[:offset]
    alph = alph[::-1]
    rest = sqid[1:]
    numbers: list[int] = []
    while rest:
        separator = alph[0]
        chunks = rest.split(separator, 1)
        if chunks[0] == "":
            return numbers
        numbers.append(_sq_to_number(chunks[0], alph[1:]))
        if len(chunks) > 1:
            alph = _sq_shuffle(alph)
            rest = chunks[1]
        else:
            rest = ""
    return numbers


# --- Bech32 / Bech32m (BIP-173 / BIP-350 reference pseudocode) --------------

_B32_CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
_BECH32_CONST = 1
_BECH32M_CONST = 0x2BC830A3


def _b32_polymod(values: list[int]) -> int:
    gen = [0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3]
    chk = 1
    for v in values:
        b = chk >> 25
        chk = (chk & 0x1FFFFFF) << 5 ^ v
        for i in range(5):
            chk ^= gen[i] if ((b >> i) & 1) else 0
    return chk


def _b32_hrp_expand(hrp: str) -> list[int]:
    return [ord(x) >> 5 for x in hrp] + [0] + [ord(x) & 31 for x in hrp]


def _b32_checksum(hrp: str, data: list[int], const: int) -> list[int]:
    poly = _b32_polymod(_b32_hrp_expand(hrp) + data + [0] * 6) ^ const
    return [(poly >> 5 * (5 - i)) & 31 for i in range(6)]


def _b32_verify(hrp: str, data: list[int]) -> int | None:
    """The checksum constant that validates, or None."""
    poly = _b32_polymod(_b32_hrp_expand(hrp) + data)
    if poly == _BECH32_CONST:
        return _BECH32_CONST
    if poly == _BECH32M_CONST:
        return _BECH32M_CONST
    return None


def _convertbits(data, frombits: int, tobits: int, pad: bool):
    acc = bits = 0
    ret = []
    maxv = (1 << tobits) - 1
    for value in data:
        if value < 0 or (value >> frombits):
            return None
        acc = (acc << frombits) | value
        bits += frombits
        while bits >= tobits:
            bits -= tobits
            ret.append((acc >> bits) & maxv)
    if pad:
        if bits:
            ret.append((acc << (tobits - bits)) & maxv)
    elif bits >= frombits or ((acc << (tobits - bits)) & maxv):
        return None
    return ret


def bech32_encode(hrp: str, data: bytes, witver: int = -1) -> str:
    hrp = hrp.lower()
    if witver >= 0:
        groups = [witver] + _convertbits(list(data), 8, 5, True)
        const = _BECH32_CONST if witver == 0 else _BECH32M_CONST
    else:
        groups = _convertbits(list(data), 8, 5, True)
        const = _BECH32_CONST
    chk = _b32_checksum(hrp, groups, const)
    return hrp + "1" + "".join(_B32_CHARSET[d] for d in groups + chk)


def bech32_decode(addr: str) -> tuple[str, bytes] | None:
    if addr.lower() != addr and addr.upper() != addr:
        return None  # mixed case is invalid per BIP-173
    addr = addr.lower()
    pos = addr.rfind("1")
    if pos < 1 or pos + 7 > len(addr):
        return None
    hrp, body = addr[:pos], addr[pos + 1 :]
    if any(c not in _B32_CHARSET for c in body):
        return None
    data = [_B32_CHARSET.index(c) for c in body]
    if _b32_verify(hrp, data) is None:
        return None
    payload = data[:-6]
    as_bytes = _convertbits(payload, 5, 8, False)
    if as_bytes is not None:
        return hrp, bytes(as_bytes)
    # witver-prefixed (SegWit) shape: first symbol is the version
    as_bytes = _convertbits(payload[1:], 5, 8, False)
    if as_bytes is not None:
        return hrp, bytes(as_bytes)
    return None


# --- Spark registration ------------------------------------------------------


def ensure_registered(spark) -> None:
    """Register ch_sqid_encode/decode + ch_bech32_encode/decode
    (idempotent overwrite)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _sqid_enc(nums: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if v is None else sqids_encode([int(x) for x in v])
                for v in nums
            ],
            dtype="object",
        )

    @pandas_udf("array<bigint>")
    def _sqid_dec(s: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else sqids_decode(str(v)) for v in s],
            dtype="object",
        )

    @pandas_udf("string")
    def _b32_enc(hrp: pd.Series, data: pd.Series, witver: pd.Series) -> pd.Series:
        out = []
        for h, d, w in zip(hrp, data, witver):
            if h is None or d is None:
                out.append(None)
            else:
                out.append(bech32_encode(str(h), bytes(d), int(w)))
        return pd.Series(out, dtype="object")

    @pandas_udf("struct<_1: string, _2: binary>")
    def _b32_dec(addr: pd.Series) -> pd.DataFrame:
        hrps, datas = [], []
        for a in addr:
            r = None if a is None else bech32_decode(str(a))
            hrps.append(None if r is None else r[0])
            datas.append(None if r is None else r[1])
        return pd.DataFrame({"_1": hrps, "_2": datas})

    spark.udf.register("ch_sqid_encode", _sqid_enc)
    spark.udf.register("ch_sqid_decode", _sqid_dec)
    spark.udf.register("ch_bech32_encode", _b32_enc)
    spark.udf.register("ch_bech32_decode", _b32_dec)
