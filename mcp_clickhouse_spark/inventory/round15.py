"""Round-15 oracle-checked closures.

``scalar_round15`` covers this round's dialect fixes end-to-end, against
an independent DuckDB reconstruction (literal CASE tables — never the
translation's own expression, per the round-13 tautology lesson):

- bare ``IN`` / ``NOT IN`` OPERATOR two-valued NULL logic (judge r14:
  ``WHERE x NOT IN (1, NULL)`` silently returned zero rows; the r14 fix
  covered only the in/notIn FUNCTION spellings) — literal lists with
  NULL, a nullable probe, and an expression list whose element is a
  runtime value;
- ``divide()`` and the bare ``/`` zero-denominator Float64 contract
  (1/0 = inf, -1/0 = -inf, 0/0 = nan — CH docs §arithmetic#divide);
  checked via isInfinite/isNaN flags and ``= ±inf`` equality (NOT an
  ordering comparison: Spark ranks NaN above every double, so
  ``nan > 1e308`` is true there and 0 in CH — a documented delta that
  only matters when NaNs flow through ``>``/``<``), so no inf/nan value
  has to survive the driver's canonicalizer;
- ``intDiv`` negative-operand truncation toward zero and ``modulo``'s
  C-style dividend-sign remainder (the div/mod identity pin —
  tests/test_r15_wave.py::TestIntDivRoundingPin has the full docs
  rationale), reconstructed as literal CASE tables.

Reference contract basis: verbatim SQL delegation in
/root/reference/mcp_clickhouse/mcp_server.py:425.
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import query, t

_SQL_R15_CH = """
SELECT o_orderkey,
  toInt64(o_orderkey % 7 IN (1, 2, NULL)) AS in_null,
  toInt64(o_orderkey % 7 NOT IN (1, 2, NULL)) AS ni_null,
  toInt64(if(o_orderkey % 5 = 0, NULL, o_orderkey % 5) IN (1, 2))
    AS in_probe,
  toInt64(if(o_orderkey % 5 = 0, NULL, o_orderkey % 5) NOT IN (1, 2))
    AS ni_probe,
  toInt64(o_orderkey % 3 IN (0, o_orderkey % 2, NULL)) AS in_expr,
  toInt64(isInfinite(divide(o_orderkey % 5 - 2, o_orderkey % 3))) AS dinf,
  toInt64(isNaN(divide(o_orderkey % 5 - 2, o_orderkey % 3))) AS dnan,
  toInt64((o_orderkey % 5 - 2) / (o_orderkey % 3) = divide(1, 0)) AS dpos,
  toInt64((o_orderkey % 5 - 2) / (o_orderkey % 3) = divide(-1, 0)) AS dneg,
  round(if(o_orderkey % 3 = 0, 0,
           divide(o_orderkey % 5 - 2, o_orderkey % 3)), 6) AS dfin,
  toInt64(intDiv(2 - o_orderkey % 5, 2)) AS idv,
  toInt64(modulo(2 - o_orderkey % 5, 3)) AS md
FROM orders
"""

# Independent reconstruction: IN columns from two-valued truth tables,
# divide flags from the (numerator, denominator) zero analysis, intDiv
# and modulo from LITERAL value tables (numerator 2-o%5 ∈ {2,1,0,-1,-2}:
# truncation → {1,0,0,0,-1}; C-style remainder mod 3 → {2,1,0,-1,-2}).
_SQL_R15_ORACLE = """
SELECT o_orderkey,
  CAST(CASE WHEN o_orderkey % 7 IN (1, 2) THEN 1 ELSE 0 END AS BIGINT)
    AS in_null,
  CAST(CASE WHEN o_orderkey % 7 IN (1, 2) THEN 0 ELSE 1 END AS BIGINT)
    AS ni_null,
  CAST(CASE WHEN o_orderkey % 5 = 0 THEN 0
            WHEN o_orderkey % 5 IN (1, 2) THEN 1 ELSE 0 END AS BIGINT)
    AS in_probe,
  CAST(CASE WHEN o_orderkey % 5 = 0 THEN 0
            WHEN o_orderkey % 5 IN (1, 2) THEN 0 ELSE 1 END AS BIGINT)
    AS ni_probe,
  CAST(CASE WHEN o_orderkey % 3 = 0 OR o_orderkey % 3 = o_orderkey % 2
            THEN 1 ELSE 0 END AS BIGINT) AS in_expr,
  CAST(CASE WHEN o_orderkey % 3 = 0 AND o_orderkey % 5 <> 2
            THEN 1 ELSE 0 END AS BIGINT) AS dinf,
  CAST(CASE WHEN o_orderkey % 3 = 0 AND o_orderkey % 5 = 2
            THEN 1 ELSE 0 END AS BIGINT) AS dnan,
  CAST(CASE WHEN o_orderkey % 3 = 0 AND o_orderkey % 5 > 2
            THEN 1 ELSE 0 END AS BIGINT) AS dpos,
  CAST(CASE WHEN o_orderkey % 3 = 0 AND o_orderkey % 5 < 2
            THEN 1 ELSE 0 END AS BIGINT) AS dneg,
  round(CASE WHEN o_orderkey % 3 = 0 THEN 0
             ELSE (o_orderkey % 5 - 2) / CAST(o_orderkey % 3 AS DOUBLE)
        END, 6) AS dfin,
  CAST(CASE o_orderkey % 5 WHEN 0 THEN 1 WHEN 1 THEN 0 WHEN 2 THEN 0
                           WHEN 3 THEN 0 WHEN 4 THEN -1 END AS BIGINT)
    AS idv,
  CAST(CASE o_orderkey % 5 WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 0
                           WHEN 3 THEN -1 WHEN 4 THEN -2 END AS BIGINT)
    AS md
FROM orders
"""


@query("scalar_round15", oracle=_SQL_R15_ORACLE, category="scalars")
def scalar_round15(spark, sf_dir):
    """Round-15 dialect fixes end-to-end (module docstring above lists
    the contracts; each is also pinned by tests/test_r15_wave.py
    vectors).  Per-row modular arithmetic exercises every truth-table
    branch: IN probes hit NULL rows (o%5=0), the divide denominator
    o%3 is zero on a third of the rows with numerators of both signs
    and zero, and the intDiv/modulo numerators span {2,1,0,-1,-2}."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate(_SQL_R15_CH))


# Round-15 wave-2 closures: groupBitmapAnd/Or/Xor (collect_list folds),
# the 2-arg dateAdd INTERVAL signature, the OrDefault family,
# toIPv4OrZero, multiSearchFirstIndexCaseInsensitive.  The DuckDB
# reconstruction of the bitmap aggregates is INDEPENDENT of the fold:
# unnest per-row element sets, count rows containing each element, then
# AND = elements present in EVERY row, OR = distinct elements,
# XOR = elements present in an ODD number of rows.
_SQL_R15B_CH = """
SELECT o_orderkey % 20 AS g,
  toInt64(groupBitmapAnd(bitmapBuild(
    [o_orderkey % 5, o_orderkey % 7, 3]))) AS gand,
  toInt64(groupBitmapOr(bitmapBuild(
    [o_orderkey % 5, o_orderkey % 7, 3]))) AS gor,
  toInt64(groupBitmapXor(bitmapBuild(
    [o_orderkey % 5, o_orderkey % 7, 3]))) AS gxor,
  toString(toDate(min(dateAdd(o_orderdate, INTERVAL 1 MONTH)))) AS da2,
  toInt64(sum(toInt32OrDefault(
    if(o_orderkey % 2 = 0, '7', 'x'), 3))) AS iod,
  toString(min(toDateOrDefault(
    if(o_orderkey % 3 = 0, 'x', toString(o_orderdate))))) AS dod,
  toInt64(sum(multiSearchFirstIndexCaseInsensitive(
    o_orderpriority, ['urgent', 'high']))) AS msi,
  toInt64(sum(toIPv4OrZero(
    if(o_orderkey % 4 = 0, '1.2.3.4', 'bad')))) AS ipz
FROM orders
GROUP BY o_orderkey % 20
"""

_SQL_R15B_ORACLE = """
WITH rows_ AS (
  SELECT o_orderkey % 20 AS g, o_orderkey AS rid, o_orderdate,
         o_orderkey % 2 AS m2, o_orderkey % 3 AS m3, o_orderkey % 4 AS m4,
         o_orderpriority,
         list_distinct([o_orderkey % 5, o_orderkey % 7, 3]) AS ba
  FROM orders
),
grp AS (SELECT g, count(*) AS nrows FROM rows_ GROUP BY g),
cnt AS (
  SELECT g, e, count(*) AS ne
  FROM (SELECT g, rid, unnest(ba) AS e FROM rows_)
  GROUP BY g, e
),
bm AS (
  SELECT cnt.g,
    CAST(sum(CASE WHEN ne = nrows THEN 1 ELSE 0 END) AS BIGINT) AS gand,
    CAST(count(*) AS BIGINT) AS gor,
    CAST(sum(CASE WHEN ne % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS gxor
  FROM cnt JOIN grp ON cnt.g = grp.g GROUP BY cnt.g
),
sc AS (
  SELECT g,
    CAST(CAST(min(o_orderdate + INTERVAL 1 MONTH) AS DATE) AS VARCHAR)
      AS da2,
    CAST(sum(CASE WHEN m2 = 0 THEN 7 ELSE 3 END) AS BIGINT) AS iod,
    CAST(CAST(min(CASE WHEN m3 = 0 THEN DATE '1970-01-01'
                       ELSE o_orderdate END) AS DATE) AS VARCHAR) AS dod,
    CAST(sum(CASE WHEN o_orderpriority ILIKE '%urgent%' THEN 1
                  WHEN o_orderpriority ILIKE '%high%' THEN 2
                  ELSE 0 END) AS BIGINT) AS msi,
    CAST(sum(CASE WHEN m4 = 0 THEN 16909060 ELSE 0 END) AS BIGINT) AS ipz
  FROM rows_ GROUP BY g
)
SELECT CAST(bm.g AS BIGINT) AS g, gand, gor, gxor, da2, iod, dod, msi, ipz
FROM bm JOIN sc ON bm.g = sc.g
"""


# Round-15 wave-3 NULL/edge fixes: range() direction/exclusivity,
# arraySlice negative length, log-family domain edges (flag columns —
# no inf/nan survives the canonicalizer), modular int-cast wrapping,
# two-valued arrayExists/arrayAll, position with an empty needle.
# The oracle reconstructs every value from DuckDB primitives/CASE
# tables (DuckDB list slicing and generate_series differ from both CH
# and Spark, so nothing is shared with the translation).
_SQL_R15C_CH = """
SELECT o_orderkey,
  arrayStringConcat(arrayMap(x -> toString(x),
    range(o_orderkey % 4, o_orderkey % 7)), ',') AS rng,
  arrayStringConcat(arrayMap(x -> toString(x),
    range(o_orderkey % 3, 9, 3)), ',') AS rngs,
  arrayStringConcat(arrayMap(x -> toString(x),
    arraySlice([1, 2, 3, 4, 5], 2, -(o_orderkey % 3))), ',') AS slc,
  toInt64(if(log(o_orderkey % 3) = divide(-1, 0), 1, 0)) AS lginf,
  round(if(o_orderkey % 3 = 0, -1, log2(o_orderkey % 3 * 4)), 6) AS lg2,
  toInt64(toInt8(o_orderkey % 300)) AS w8,
  toInt64(toUInt8(o_orderkey % 300)) AS wu8,
  toInt64(toInt16(o_orderkey * 7)) AS w16,
  toInt64(arrayExists(x -> x > 2,
    [if(o_orderkey % 2 = 0, NULL, 1), o_orderkey % 4])) AS aex,
  toInt64(arrayAll(x -> x < 3,
    [if(o_orderkey % 2 = 0, NULL, 1), o_orderkey % 4])) AS aal,
  toInt64(position(o_orderpriority, '', o_orderkey % 12)) AS pse
FROM orders
"""

_SQL_R15C_ORACLE = """
SELECT o_orderkey,
  CASE WHEN o_orderkey % 7 <= o_orderkey % 4 THEN ''
       ELSE array_to_string(generate_series(o_orderkey % 4,
                                            o_orderkey % 7 - 1), ',')
  END AS rng,
  array_to_string(generate_series(o_orderkey % 3, 8, 3), ',') AS rngs,
  CASE o_orderkey % 3
       WHEN 0 THEN '' WHEN 1 THEN '2,3,4' WHEN 2 THEN '2,3'
  END AS slc,
  CAST(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
    AS lginf,
  round(CASE WHEN o_orderkey % 3 = 0 THEN -1
             ELSE log2(o_orderkey % 3 * 4) END, 6) AS lg2,
  CAST(CASE WHEN o_orderkey % 300 < 128 THEN o_orderkey % 300
            WHEN o_orderkey % 300 < 256 THEN o_orderkey % 300 - 256
            ELSE o_orderkey % 300 - 256 END AS BIGINT) AS w8,
  CAST((o_orderkey % 300) % 256 AS BIGINT) AS wu8,
  CAST(CASE WHEN (o_orderkey * 7) % 65536 >= 32768
            THEN (o_orderkey * 7) % 65536 - 65536
            ELSE (o_orderkey * 7) % 65536 END AS BIGINT) AS w16,
  CAST(CASE WHEN o_orderkey % 4 > 2 THEN 1 ELSE 0 END AS BIGINT)
    AS aex,
  CAST(CASE WHEN o_orderkey % 2 = 0 THEN 0
            WHEN o_orderkey % 4 < 3 THEN 1 ELSE 0 END AS BIGINT)
    AS aal,
  CAST(CASE WHEN o_orderkey % 12 <= 1 THEN 1
            WHEN o_orderkey % 12 <= length(o_orderpriority) + 1
            THEN o_orderkey % 12 ELSE 0 END AS BIGINT) AS pse
FROM orders
"""


@query("scalar_round15c", oracle=_SQL_R15C_ORACLE, category="scalars")
def scalar_round15c(spark, sf_dir):
    """Round-15 wave-3 NULL/edge fixes end-to-end (see the _SQL_R15C_CH
    comment block; pins in tests/test_r15_wave2.py).  o%4 vs o%7 range
    bounds cross in both directions; the slice length spans 0/-1/-2;
    log hits the zero pivot on a third of rows; the int-cast inputs
    cross the Int8 boundary both ways; the HOF probes mix NULL
    predicate rows with matching and non-matching values."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate(_SQL_R15C_CH))


# Round-15 waves 4-6: two-valued mapAll/mapExists, roundToExp2's
# below-one zero, JSONExtractUInt's UInt64 wrap (string-serialized —
# the driver bans HUGEINT/DECIMAL outputs), toBFloat16 (exact on
# ≤8-mantissa-bit integers, plus the 3.14159 → 3.140625 rounding pin),
# and the values() TABLE FUNCTION bound through the tool-layer binder
# in JOIN position.
_SQL_R15D_CH = """
SELECT o_orderkey,
  toInt64(mapAll((k, v) -> v > 0,
    map('a', if(o_orderkey % 3 = 0, NULL, 1), 'b', 1))) AS mal,
  toInt64(mapExists((k, v) -> v > 1, map('a', o_orderkey % 4))) AS mex,
  toInt64(roundToExp2(o_orderkey % 9)) AS rexp,
  toString(JSONExtractUInt(
    concat('{"a":', toString(2 - o_orderkey % 4), '}'), 'a')) AS jeu,
  toBFloat16((o_orderkey % 128) * 2 + 1) AS bfe,
  toString(toBFloat16(3.14159)) AS bfr,
  v.tag AS tag
FROM orders
JOIN values('m Int64, tag String', (0, 'z'), (1, 'o'), (2, 't'), (3, 'h')) v
  ON o_orderkey % 4 = v.m
"""

_SQL_R15D_ORACLE = """
SELECT o_orderkey,
  CAST(CASE WHEN o_orderkey % 3 = 0 THEN 0 ELSE 1 END AS BIGINT) AS mal,
  CAST(CASE WHEN o_orderkey % 4 > 1 THEN 1 ELSE 0 END AS BIGINT) AS mex,
  CAST(CASE o_orderkey % 9 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2
       WHEN 3 THEN 2 WHEN 4 THEN 4 WHEN 5 THEN 4 WHEN 6 THEN 4
       WHEN 7 THEN 4 WHEN 8 THEN 8 END AS BIGINT) AS rexp,
  CASE o_orderkey % 4 WHEN 0 THEN '2' WHEN 1 THEN '1' WHEN 2 THEN '0'
       WHEN 3 THEN '18446744073709551615' END AS jeu,
  CAST((o_orderkey % 128) * 2 + 1 AS FLOAT) AS bfe,
  '3.140625' AS bfr,
  CASE o_orderkey % 4 WHEN 0 THEN 'z' WHEN 1 THEN 'o' WHEN 2 THEN 't'
       WHEN 3 THEN 'h' END AS tag
FROM orders
"""


@query("scalar_round15d", oracle=_SQL_R15D_ORACLE, category="scalars")
def scalar_round15d(spark, sf_dir):
    """Round-15 waves 4-6 end-to-end (see the _SQL_R15D_CH comment
    block; pins in tests/test_r15_wave2.py).  The values() JOIN runs
    through the tool layer's bind_sql_table_functions — the same path
    a delegated query takes."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions import register_lazy_udfs
    from mcp_clickhouse_spark.sources.table_functions import (
        bind_sql_table_functions,
    )

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    out = translate(bind_sql_table_functions(spark, _SQL_R15D_CH))
    register_lazy_udfs(spark, out)
    return spark.sql(out)


@query("scalar_round15b", oracle=_SQL_R15B_ORACLE, category="scalars")
def scalar_round15b(spark, sf_dir):
    """Round-15 wave-2 closures end-to-end (see the _SQL_R15B_CH comment
    block): each closure is also value-pinned in
    tests/test_r15_wave2.py; per-group modular arithmetic varies every
    branch including single-row groups for the bitmap folds."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate(_SQL_R15B_CH))
