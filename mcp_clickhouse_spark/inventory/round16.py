"""Round-16 oracle-checked closures (advisor ADVICE.md r15 fixes).

``scalar_round16`` drives every advisor finding end-to-end through the
delegated-SQL path, against an independent DuckDB reconstruction
(literal CASE tables, never the translation's own expression — the
round-13 tautology lesson):

- COMMENTS inside the query text (CH docs §syntax#comments): a block
  comment between SELECT and the first column, comments adjacent to a
  division operator, a comment INSIDE an IN list, a line comment, and a
  string literal containing ``/*`` that must survive verbatim —
  previously ``_rewrite_division`` treated the ``/`` of ``*/`` as an
  operator and corrupted the query;
- scientific-notation literals as division operands (``1.5e+2 / x``
  previously split on the exponent sign and emitted invalid SQL);
- a NONZERO-literal denominator (``o_orderkey / 8``) that now keeps the
  native ``/`` (pushdown-preserving fast path) — same values either way;
- ``mapContains`` with a runtime-NULL key (two-valued: 0, not NULL);
- ``groupBitmapAnd`` over ZERO rows via a scalar subquery (CH returns
  cardinality 0; the old fold ANSI-threw INVALID_ARRAY_INDEX);
- ``values()`` with PARAMETERIZED column types — ``Decimal(10,2)`` and
  ``Map(String, Int64)`` — through the tool layer's
  ``bind_sql_table_functions`` (previously comma-split into bogus
  column specs).

Reference contract basis: verbatim SQL delegation in
/root/reference/mcp_clickhouse/mcp_server.py:425.
"""

from __future__ import annotations

from mcp_clickhouse_spark.inventory.registry import query, t

_SQL_R16_CH = """
SELECT /* projection starts after this block comment */ o_orderkey,
  round(1.5e+2 / (o_orderkey % 9 + 1), 6) AS scidiv,
  round(o_orderkey / 8, 6) AS litdiv,  -- nonzero literal: native `/`
  round(6 /*six*/ / /*three*/ 3, 2) AS cdiv,
  toInt64(mapContains(map('a', 1),
    if(o_orderkey % 2 = 0, NULL, 'a'))) AS mck,
  toInt64(o_orderkey % 7 NOT IN (2, /* NULL in list */ NULL)) AS nin,
  (SELECT toInt64(groupBitmapAnd(bitmapBuild([1, 2])))
     FROM orders WHERE 1 = 0) AS gbe,
  '/* not a comment */' AS lit,
  toFloat64(v.d) AS vd,
  v.m['k'] AS vmk
FROM orders
JOIN values('g Int64, d Decimal(10,2), m Map(String, Int64)',
  (0, 1.25, map('k', 7)), (1, 2.50, map('k', 9)),
  (2, 3.75, map('k', 11)), (3, 5.00, map('k', 13))) v
  ON o_orderkey % 4 = v.g
"""

# Independent reconstruction: comments resolve to plain arithmetic, the
# two-valued columns come from literal CASE truth tables, the values()
# join from a CASE over o_orderkey % 4, the empty-set bitmap aggregate
# from CH's documented empty-set default (cardinality 0).
_SQL_R16_ORACLE = """
SELECT o_orderkey,
  round(CAST(150 AS DOUBLE) / (o_orderkey % 9 + 1), 6) AS scidiv,
  round(o_orderkey / CAST(8 AS DOUBLE), 6) AS litdiv,
  CAST(2.0 AS DOUBLE) AS cdiv,
  CAST(CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END AS BIGINT) AS mck,
  CAST(CASE WHEN o_orderkey % 7 = 2 THEN 0 ELSE 1 END AS BIGINT) AS nin,
  CAST(0 AS BIGINT) AS gbe,
  '/* not a comment */' AS lit,
  CAST(CASE o_orderkey % 4 WHEN 0 THEN 1.25 WHEN 1 THEN 2.50
       WHEN 2 THEN 3.75 WHEN 3 THEN 5.00 END AS DOUBLE) AS vd,
  CAST(CASE o_orderkey % 4 WHEN 0 THEN 7 WHEN 1 THEN 9
       WHEN 2 THEN 11 WHEN 3 THEN 13 END AS BIGINT) AS vmk
FROM orders
"""


# Round-16 probe-wave closures end-to-end: left/right negative lengths,
# initcap alnum-run word boundaries (oracle = a literal CASE table over
# the o_orderpriority domain — independent of the engine's regex),
# hex even-digit padding (oracle = DuckDB's own minimal-width hex +
# explicit pad arithmetic), avgWeighted zero-weight nan, base64Decode
# String return, cutWWW behind a scheme.
_SQL_R16B_CH = """
SELECT o_orderkey,
  left(o_orderpriority, -(o_orderkey % 4)) AS lneg,
  right(o_orderpriority, -(o_orderkey % 4)) AS rneg,
  initcap(lower(o_orderpriority)) AS ic,
  hex(o_orderkey % 300) AS hx,
  (SELECT toInt64(isNaN(avgWeighted(v, 0)))
     FROM (SELECT 1 AS v UNION ALL SELECT 2)) AS awn,
  base64Decode(base64Encode(o_orderpriority)) AS b64,
  cutWWW(concat('http://www.ex', toString(o_orderkey % 5), '.com/p'))
    AS cw
FROM orders
"""

_SQL_R16B_ORACLE = """
SELECT o_orderkey,
  CASE WHEN o_orderkey % 4 = 0 THEN ''
       ELSE substr(o_orderpriority, 1,
                   greatest(length(o_orderpriority)
                            - (o_orderkey % 4), 0)) END AS lneg,
  CASE WHEN o_orderkey % 4 = 0 THEN ''
       ELSE substr(o_orderpriority,
                   least(o_orderkey % 4, length(o_orderpriority))
                   + 1) END AS rneg,
  CASE o_orderpriority
       WHEN '1-URGENT' THEN '1-Urgent'
       WHEN '2-HIGH' THEN '2-High'
       WHEN '3-MEDIUM' THEN '3-Medium'
       WHEN '4-NOT SPECIFIED' THEN '4-Not Specified'
       WHEN '5-LOW' THEN '5-Low' END AS ic,
  CASE WHEN length(hex(o_orderkey % 300)) % 2 = 1
       THEN '0' || hex(o_orderkey % 300)
       ELSE hex(o_orderkey % 300) END AS hx,
  CAST(1 AS BIGINT) AS awn,
  o_orderpriority AS b64,
  'http://ex' || CAST(o_orderkey % 5 AS VARCHAR) || '.com/p' AS cw
FROM orders
"""


@query("scalar_round16b", oracle=_SQL_R16B_ORACLE, category="scalars")
def scalar_round16b(spark, sf_dir):
    """Round-16 probe-wave closures end-to-end (see the _SQL_R16B_CH
    comment block; pins in tests/test_r16_wave.py and
    tests/test_r16_wave2.py).  o%4 spans the 0/-1/-2/-3 negative-length
    branches; o%300 crosses the 1/2-digit hex-byte boundary; the
    o_orderpriority domain covers multi-word and '_-'-adjacent initcap
    shapes."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions import register_lazy_udfs

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    out = translate(_SQL_R16B_CH)
    register_lazy_udfs(spark, out)
    return spark.sql(out)


# Round-16 wave-3 closures: regexp-replacement \N backreferences
# (replaceRegexpAll converts to Java $N; replaceRegexpOne replaces the
# FIRST match only, expanding backrefs via regexp_extract), splitByString
# with an empty separator (char split, no trailing ''), and
# leadInFrame with the explicit full-frame idiom.  DuckDB is a true
# independent twin for all four: its regexp_replace natively uses \N
# backreferences and replaces first-only by default, and str_split('')
# yields characters without a trailing empty.
_SQL_R16C_CH = r"""
SELECT o_orderkey,
  replaceRegexpAll(o_orderpriority, '([0-9])-([A-Z]+)', '\\2:\\1') AS rra,
  replaceRegexpOne(concat('k', toString(o_orderkey % 100), 'v',
                          toString(o_orderkey % 10)),
                   '(\\d+)', '<\\1>') AS rro,
  arrayStringConcat(splitByString('', substring(o_orderpriority, 1, 3)),
                    '|') AS sbe,
  leadInFrame(o_orderkey, 1) OVER (PARTITION BY o_custkey
    ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lif
FROM orders
"""

_SQL_R16C_ORACLE = r"""
SELECT o_orderkey,
  regexp_replace(o_orderpriority, '([0-9])-([A-Z]+)', '\2:\1') AS rra,
  regexp_replace('k' || CAST(o_orderkey % 100 AS VARCHAR) || 'v'
                 || CAST(o_orderkey % 10 AS VARCHAR),
                 '(\d+)', '<\1>') AS rro,
  array_to_string(str_split(substr(o_orderpriority, 1, 3), ''), '|') AS sbe,
  lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
    AS lif
FROM orders
"""


@query("scalar_round16c", oracle=_SQL_R16C_ORACLE, category="scalars")
def scalar_round16c(spark, sf_dir):
    """Round-16 wave-3 closures end-to-end (see the _SQL_R16C_CH comment
    block; pins in tests/test_r16_wave2.py).  The replaceRegexpOne
    input carries TWO digit runs so first-only semantics are load-
    bearing; the lead window has real partition ties and NULL tails."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate(_SQL_R16C_CH))


@query("scalar_round16", oracle=_SQL_R16_ORACLE, category="scalars")
def scalar_round16(spark, sf_dir):
    """Round-16 advisor fixes end-to-end (module docstring lists the
    contracts; each is also value-pinned in tests/test_r16_advice.py).
    The values() JOIN runs through bind_sql_table_functions — the same
    path a delegated query takes — and the query text itself carries
    every comment form the comment stripper must survive."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions import register_lazy_udfs
    from mcp_clickhouse_spark.sources.table_functions import (
        bind_sql_table_functions,
    )

    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    out = translate(bind_sql_table_functions(spark, _SQL_R16_CH))
    register_lazy_udfs(spark, out)
    return spark.sql(out)
