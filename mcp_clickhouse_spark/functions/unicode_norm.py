"""Value-faithful ClickHouse ``normalizeUTF8NFC/NFD/NFKC/NFKD`` (round 9,
r8 verdict next #5 — previously guided errors).

ClickHouse normalizes through ICU (src/Functions/normalizeString.cpp);
Python's ``unicodedata.normalize`` implements the same Unicode Standard
Annex #15 forms, so values match for every assigned code point.  Spark
has no Unicode-normalization builtin, so like murmurHash3_64 this is the
FIDELITY path: an Arrow-batched ``pandas_udf`` (columnar JVM→Python
transfer, no per-row pickling).  One UDF takes the form name as a second
column; the dialect emits ``ch_normalize_utf8(x, 'NFC')`` etc. and the
tool layer registers lazily via functions.LAZY_UDFS.
"""

from __future__ import annotations

import unicodedata

import pandas as pd  # module-level: pandas_udf resolves stringified hints

_FORMS = {"NFC", "NFD", "NFKC", "NFKD"}


def _normalize_series(s: pd.Series, form: pd.Series) -> pd.Series:
    out = []
    for v, f in zip(s, form):
        if v is None or f is None:
            out.append(None)
        else:
            out.append(unicodedata.normalize(f, v))
    return pd.Series(out, dtype=object)


def ensure_registered(spark) -> None:
    """Register ``ch_normalize_utf8`` on this session (idempotent
    overwrite, same contract as murmur.ensure_registered)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series, form: pd.Series) -> pd.Series:
        return _normalize_series(s, form)

    spark.udf.register("ch_normalize_utf8", _norm)
