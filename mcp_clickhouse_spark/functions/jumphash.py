"""Value-faithful ClickHouse ``jumpConsistentHash`` (round 9 gap scan).

Lamping & Veach's jump consistent hash (arXiv:1406.2294, public domain
pseudo-code) — the exact algorithm ClickHouse wraps
(src/Functions/jumpConsistentHash.cpp delegates to the paper's loop).
The loop length is O(ln n) with data-dependent trip counts, which no
fixed-length Spark SQL fold can express, so like murmurHash3_64 this is
the FIDELITY path: an Arrow-batched ``pandas_udf``.  Pinned against the
ClickHouse docs example jumpConsistentHash(256, 4) = 3.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified hints

_MASK = (1 << 64) - 1
_LCG = 2862933555777941757


def jump_consistent_hash(key: int, num_buckets: int) -> int:
    """The paper's loop, bit-exact (unsigned 64-bit LCG state)."""
    key &= _MASK  # signed inputs reinterpret as UInt64, like CH
    if num_buckets <= 0:
        num_buckets = 1
    b, j = -1, 0
    while j < num_buckets:
        b = j
        key = (key * _LCG + 1) & _MASK
        j = int((b + 1) * ((1 << 31) / ((key >> 33) + 1)))
    return b


def ensure_registered(spark) -> None:
    """Register ``ch_jump_hash`` on this session (idempotent overwrite)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _jump(key: pd.Series, n: pd.Series) -> pd.Series:
        out = [
            None if k is None or b is None
            else jump_consistent_hash(int(k), int(b))
            for k, b in zip(key, n)
        ]
        return pd.Series(out, dtype="Int32")

    spark.udf.register("ch_jump_hash", _jump)
