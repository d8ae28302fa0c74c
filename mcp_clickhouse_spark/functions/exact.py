"""Exact-arithmetic money/quantity expressions.

Cross-engine float determinism is a correctness requirement here (the
driver hash-compares against a DuckDB oracle), and plain double SUMs differ
between engines in the last ulps because accumulation order differs. Two
exact formulations produce identical doubles on both engines:

  1. DECIMAL(12,2) aggregation, final CAST to DOUBLE — exact but backed by
     BigDecimal on the JVM (~2× slower);
  2. scaled-integer (cents) aggregation in longs, final division — exact,
     runs in whole-stage codegen at long-arithmetic speed.

Both yield the SAME double (one correctly-rounded conversion of the same
rational number), so a cents-based query hash-matches a decimal-based
oracle. The engine uses cents everywhere; oracles may use either.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str | Column, scale: int = 2) -> Column:
    """Exact integer representation of a fixed-point column (default 2dp).

    Implemented as a half-away-from-zero shift + truncating cast instead of
    ``F.round``: round() routes every value through BigDecimal on the JVM
    (measured ~0.06 s per aggregated column on a 600k-row scan), while the
    shift/cast stays in primitive long arithmetic inside codegen.  For
    fixed-point source data (≤``scale`` decimals stored as double)
    ``x·10^s`` is always within 0.5 of an integer, so the ±0.5 shift can't
    cross a rounding boundary and the two forms are value-identical —
    verified exhaustively over every money column (incl. negatives) in the
    testdata.
    """
    c = F.col(col) if isinstance(col, str) else col
    shifted = c * (10**scale)
    half = F.when(c >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))
    return (shifted + half).cast("bigint")


def cents_sql(col: str, scale: int = 2) -> str:
    """SQL-string twin of :func:`cents` for parsed-expression query builders.

    Building the same tree Column-by-Column costs ~6 py4j round-trips per
    call site (~2-3 ms each); a query with 8 cents-based aggregates spends
    ~0.2 s of wall time in plan CONSTRUCTION alone.  Embedding this snippet
    in one ``F.expr`` string is a single parse call.  ``0.5D`` keeps the
    shift in double arithmetic (a bare ``0.5`` parses as DECIMAL(1,1) and
    would drag the expression onto the BigDecimal path cents exists to
    avoid)."""
    return (
        f"CAST(({col}) * {10**scale} + IF(({col}) >= 0, 0.5D, -0.5D) AS BIGINT)"
    )


def exact_sum(col: str | Column, scale: int = 2) -> Column:
    """SUM of a fixed-point column as an exact double."""
    return F.sum(cents(col, scale)) / F.lit(float(10**scale))


def exact_avg(col: str | Column, scale: int = 2) -> Column:
    """AVG of a fixed-point column as sum-exact double over count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(cents(c, scale)) / F.lit(float(10**scale))) / F.count(c)
