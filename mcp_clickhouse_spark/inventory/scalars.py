"""Scalar-function inventory — SURVEY.md §2.3.8 (the dialect-compat table).

One query per function family: string, regex, date/time, math, type
conversion, array, map/JSON, hash, null-handling. Each exercises the Spark
builtins that realize the ClickHouse names (the name→name mapping itself
lives in dialect.py).

Float-determinism: transcendental functions (ln/exp) are rounded — libm vs
JVM StrictMath can differ in the last ulp; everything else is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_clickhouse_spark.inventory.registry import query, t


def _csv(arr):
    """Serialize an array column to CSV — the driver's pandas canonicalizer
    crashes on list-typed cells (``unhashable type: 'list'``), so every
    oracle-checked query must emit scalars only (DuckDB twin:
    ``array_to_string(..., ',')``)."""
    return F.concat_ws(",", F.transform(arr, lambda x: x.cast("string")))


@query(
    "scalar_string",
    oracle="""
    SELECT
      n_name,
      lower(n_name) AS lower_name,
      upper(n_name) AS upper_name,
      length(n_name) AS name_len,
      substring(n_name, 1, 3) AS prefix3,
      concat(n_name, '-', CAST(n_nationkey AS VARCHAR)) AS tagged,
      trim('  ' || n_name || ' ') AS trimmed,
      lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded,
      replace(n_name, 'a', '_') AS replaced,
      reverse(n_name) AS reversed,
      repeat('ab', 3) AS repeated,
      strpos(n_name, 'a') AS a_pos,
      starts_with(n_name, 'A') AS starts_a,
      left(n_name, 2) AS left2,
      right(n_name, 2) AS right2
    FROM nation
    """,
    category="scalars",
)
def scalar_string(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    name = F.col("n_name")
    return n.select(
        name,
        F.lower(name).alias("lower_name"),
        F.upper(name).alias("upper_name"),
        F.length(name).alias("name_len"),
        F.substring(name, 1, 3).alias("prefix3"),
        F.concat(name, F.lit("-"), F.col("n_nationkey").cast("string")).alias("tagged"),
        F.trim(F.concat(F.lit("  "), name, F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("n_nationkey").cast("string"), 4, "0").alias("padded"),
        F.replace(name, F.lit("a"), F.lit("_")).alias("replaced"),
        F.reverse(name).alias("reversed"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.instr(name, "a").alias("a_pos"),
        F.startswith(name, F.lit("A")).alias("starts_a"),
        F.left(name, F.lit(2)).alias("left2"),
        F.right(name, F.lit(2)).alias("right2"),
    )


@query(
    "scalar_regex",
    oracle="""
    SELECT
      p_partkey,
      p_type,
      regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
      regexp_replace(p_type, '[AEIOU]', '*', 'g') AS devoweled,
      regexp_matches(p_type, 'BRUSHED') AS is_brushed,
      split_part(p_type, ' ', 1) AS type_head
    FROM part WHERE p_partkey <= 500
    """,
    category="scalars",
)
def scalar_regex(spark, sf_dir):
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        "p_type",
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", r"[AEIOU]", "*").alias("devoweled"),
        F.col("p_type").rlike("BRUSHED").alias("is_brushed"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
    )


@query(
    "scalar_datetime",
    oracle="""
    SELECT
      o_orderkey,
      CAST(o_orderdate AS DATE) AS order_date,
      year(o_orderdate) AS yr,
      month(o_orderdate) AS mo,
      day(o_orderdate) AS dy,
      dayofweek(o_orderdate) + 1 AS dow,
      dayofyear(o_orderdate) AS doy,
      quarter(o_orderdate) AS qtr,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      o_orderdate + INTERVAL 30 DAY AS plus30,
      datediff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS days_to_98,
      last_day(CAST(o_orderdate AS DATE)) AS month_end,
      strftime(o_orderdate, '%Y%m') AS yyyymm
    FROM orders WHERE o_orderkey <= 1000
    """,
    category="scalars",
)
def scalar_datetime(spark, sf_dir):
    # ClickHouse toYear/toMonth/toStartOfMonth/addDays/dateDiff/toYYYYMM…
    # Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday → +1 in oracle.
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("date").alias("order_date"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.quarter(d).alias("qtr"),
        F.date_trunc("month", d).cast("timestamp_ntz").alias("month_start"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        F.datediff(F.lit("1998-01-01").cast("date"), d.cast("date")).alias("days_to_98"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.date_format(d, "yyyyMM").alias("yyyymm"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT
      c_custkey,
      abs(c_acctbal) AS abs_bal,
      round(c_acctbal, 1) AS round1,
      CAST(floor(c_acctbal) AS BIGINT) AS flr,
      CAST(ceil(c_acctbal) AS BIGINT) AS cl,
      CAST(c_custkey % 7 AS BIGINT) AS mod7,
      CAST(c_custkey // 10 AS BIGINT) AS intdiv10,
      sqrt(abs(c_acctbal)) AS sqrt_bal,
      round(ln(abs(c_acctbal) + 1), 8) AS ln_bal,
      round(exp(c_acctbal / 10000), 8) AS exp_small,
      power(CAST(c_custkey % 10 AS DOUBLE), 2) AS sq,
      CAST(sign(c_acctbal) AS DOUBLE) AS sgn,
      greatest(c_acctbal, 0.0) AS pos_part,
      least(c_acctbal, 0.0) AS neg_part
    FROM customer WHERE c_custkey <= 500
    """,
    category="scalars",
)
def scalar_math(spark, sf_dir):
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.abs(bal).alias("abs_bal"),
        F.round(bal, 1).alias("round1"),
        F.floor(bal).alias("flr"),
        F.ceil(bal).alias("cl"),
        (F.col("c_custkey") % 7).alias("mod7"),
        F.expr("c_custkey div 10").alias("intdiv10"),
        F.sqrt(F.abs(bal)).alias("sqrt_bal"),
        F.round(F.log(F.abs(bal) + 1), 8).alias("ln_bal"),
        F.round(F.exp(bal / 10000), 8).alias("exp_small"),
        F.pow(F.col("c_custkey") % 10, 2).alias("sq"),
        F.signum(bal).alias("sgn"),
        F.greatest(bal, F.lit(0.0)).alias("pos_part"),
        F.least(bal, F.lit(0.0)).alias("neg_part"),
    )


@query(
    "scalar_cast",
    oracle="""
    SELECT
      s_suppkey,
      CAST(s_suppkey AS VARCHAR) AS key_str,
      CAST(CAST(s_suppkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
      CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal_dec,
      CAST(trunc(s_acctbal) AS INTEGER) AS bal_int,
      CAST(s_suppkey AS DOUBLE) AS key_dbl,
      CAST('2024-03-15' AS DATE) AS d,
      CAST('2024-03-15 10:30:00' AS TIMESTAMP) AS ts_parsed,
      TRY_CAST('not a number' AS INTEGER) AS bad_int
    FROM supplier WHERE s_suppkey <= 200
    """,
    category="scalars",
)
def scalar_cast(spark, sf_dir):
    # ClickHouse toUInt32/toString/toDecimal/parseDateTimeBestEffort/
    # accurateCastOrNull → cast/try_cast. NOTE: CAST(double AS INT) semantics
    # differ (Spark truncates toward zero, DuckDB rounds half-even) — Spark
    # truncation is the ClickHouse behavior; oracle uses trunc to match CH.
    s = t(spark, sf_dir, "supplier").where(F.col("s_suppkey") <= 200)
    return s.select(
        "s_suppkey",
        F.col("s_suppkey").cast("string").alias("key_str"),
        F.col("s_suppkey").cast("string").cast("bigint").alias("key_roundtrip"),
        # DOUBLE on the wire: raw DECIMAL output breaks the driver's pandas
        # canonicalizer (Decimal('8752.13') vs float64 string drift — r2 RED).
        F.col("s_acctbal").cast("decimal(12,2)").cast("double").alias("bal_dec"),
        F.col("s_acctbal").cast("int").alias("bal_int"),
        F.col("s_suppkey").cast("double").alias("key_dbl"),
        F.lit("2024-03-15").cast("date").alias("d"),
        F.lit("2024-03-15 10:30:00").cast("timestamp_ntz").alias("ts_parsed"),
        F.lit("not a number").try_cast("int").alias("bad_int"),
    )


@query(
    "scalar_array",
    oracle="""
    SELECT
      vec_id,
      len(embedding) AS dim,
      embedding[1] AS first_comp,
      embedding[len(embedding)] AS last_comp,
      round(list_max(embedding), 6) AS max_comp,
      round(list_min(embedding), 6) AS min_comp,
      list_contains(list_transform(embedding, x -> x > 0), true) AS has_positive,
      len(list_filter(embedding, x -> x > 0)) AS n_positive,
      array_to_string(list_transform(embedding[1:3], x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), ',') AS head3,
      array_to_string(list_sort(list_transform(embedding[1:3], x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))), ',') AS head3_sorted,
      array_to_string(list_reverse(list_transform(embedding[1:3], x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))), ',') AS head3_rev
    FROM embeddings WHERE vec_id < 50
    """,
    category="scalars",
)
def scalar_array(spark, sf_dir):
    # ClickHouse array family: length/arrayElement/arrayMax/arrayMin/has/
    # arrayFilter/arraySlice/arraySort/arrayReverse → higher-order builtins.
    # Array outputs are serialized to CSV of ×1e6-scaled int64 — the driver
    # canonicalizer crashes on list cells (r1+r2 RED), and float→string
    # formatting differs cross-engine while the scaled double→round→bigint
    # path is bit-deterministic in both engines.
    e = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    emb = F.col("embedding")
    scaled3 = F.transform(
        F.slice(emb, 1, 3),
        lambda x: F.round(x.cast("double") * 1000000).cast("bigint"),
    )
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).alias("first_comp"),
        F.element_at(emb, F.size(emb)).alias("last_comp"),
        F.round(F.array_max(emb), 6).alias("max_comp"),
        F.round(F.array_min(emb), 6).alias("min_comp"),
        F.exists(emb, lambda x: x > 0).alias("has_positive"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        _csv(scaled3).alias("head3"),
        _csv(F.sort_array(scaled3)).alias("head3_sorted"),
        _csv(F.reverse(scaled3)).alias("head3_rev"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT
      event_id,
      json_extract_string(props, '$.k') AS k_str,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
      json_extract_string(props, '$.missing') AS missing_val,
      json_valid(props) AS is_valid
    FROM events WHERE event_id < 500
    """,
    category="scalars",
)
def scalar_json(spark, sf_dir):
    # ClickHouse JSONExtractString/JSONExtractInt/JSONHas/isValidJSON →
    # get_json_object + casts (VariantType on Spark 4 is the scale path for
    # repeated access; get_json_object suffices for one-shot extraction).
    e = t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@query(
    "scalar_hash",
    oracle="""
    SELECT
      n_nationkey,
      md5(n_name) AS md5_hex,
      sha256(n_name) AS sha256_hex,
      to_base64(CAST(n_name AS BLOB)) AS b64,
      CAST(from_base64(to_base64(CAST(n_name AS BLOB))) AS VARCHAR) AS b64_roundtrip
    FROM nation
    """,
    category="scalars",
)
def scalar_hash(spark, sf_dir):
    # ClickHouse MD5/SHA256/base64Encode/base64Decode. (cityHash64/sipHash64
    # have no cross-engine twin — xxhash64 is the Spark-native analog, used
    # in the dedup pipeline where only self-consistency matters.)
    n = t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5(F.col("n_name")).alias("md5_hex"),
        F.sha2(F.col("n_name"), 256).alias("sha256_hex"),
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("n_name").cast("binary"))).cast("string").alias(
            "b64_roundtrip"
        ),
    )


@query(
    "scalar_null_handling",
    oracle="""
    WITH j AS (
      SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_orderkey < 100
    )
    SELECT
      c_custkey,
      COALESCE(o_totalprice, -1.0) AS price_or_default,
      o_orderkey IS NULL AS no_order,
      o_orderkey IS NOT NULL AS has_order,
      NULLIF(c_custkey % 2, 0) AS odd_or_null,
      IFNULL(o_orderkey, -1) AS key_or_neg,
      CASE WHEN o_orderkey IS NULL THEN 'none' ELSE 'some' END AS tag
    FROM j
    """,
    category="scalars",
)
def scalar_null_handling(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 100)
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce(F.col("o_totalprice"), F.lit(-1.0)).alias("price_or_default"),
        F.col("o_orderkey").isNull().alias("no_order"),
        F.col("o_orderkey").isNotNull().alias("has_order"),
        F.nullif(F.col("c_custkey") % 2, F.lit(0)).alias("odd_or_null"),
        F.ifnull(F.col("o_orderkey"), F.lit(-1)).alias("key_or_neg"),
        F.when(F.col("o_orderkey").isNull(), "none").otherwise("some").alias("tag"),
    )


@query(
    "scalar_map",
    oracle="""
    SELECT
      n_nationkey,
      map {'name': n_name, 'key': CAST(n_nationkey AS VARCHAR)}['name'][1] AS name_via_map,
      CAST(cardinality(map {'a': 1, 'b': 2}) AS INTEGER) AS map_size,
      array_to_string(list_sort(map_keys(map {'a': 1, 'b': 2})), ',') AS keys_sorted
    FROM nation WHERE n_nationkey < 5
    """,
    category="scalars",
)
def scalar_map(spark, sf_dir):
    # ClickHouse map()/mapKeys/length/m[k] → create_map/map_keys/element_at.
    n = t(spark, sf_dir, "nation").where(F.col("n_nationkey") < 5)
    m = F.create_map(
        F.lit("name"), F.col("n_name"), F.lit("key"), F.col("n_nationkey").cast("string")
    )
    m2 = F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2))
    return n.select(
        "n_nationkey",
        F.element_at(m, "name").alias("name_via_map"),
        F.size(m2).alias("map_size"),
        _csv(F.sort_array(F.map_keys(m2))).alias("keys_sorted"),
    )


_SQL_URL_FSS_CH = """
SELECT doc_id,
       firstSignificantSubdomain(
         concat('https://news.', source, '.com.tr/p')) AS fss_listed,
       firstSignificantSubdomain(
         concat('https://www.', source, '.org/p')) AS fss_plain,
       cutToFirstSignificantSubdomain(
         concat('https://a.', source, '.co.uk/p')) AS cut_co
FROM documents ORDER BY doc_id LIMIT 500
"""


@query(
    "scalar_url_fss",
    oracle="""
    SELECT doc_id,
           source AS fss_listed,
           source AS fss_plain,
           source || '.co.uk' AS cut_co
    FROM documents ORDER BY doc_id LIMIT 500
    """,
    category="scalars",
)
def scalar_url_fss(spark, sf_dir):
    """firstSignificantSubdomain / cutToFirstSignificantSubdomain
    (round 8 — were public-suffix guided errors; CH's documented rule
    needs only the com/net/org/co second-level list): URLs synthesized
    from the dot-free `source` column so the oracle is ground truth by
    construction — `news.{src}.com.tr` exercises the listed-second-level
    branch (answer = third level), `www.{src}.org` the plain branch
    (answer = second level), and the cut variant returns the suffix from
    the first significant label on."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(translate(_SQL_URL_FSS_CH))


_SQL_ARRAY_AUC_CH = """
SELECT vec_id,
       arrayAUC(embedding,
                arrayMap(x -> x % 2, arrayEnumerate(embedding))) AS auc
FROM embeddings ORDER BY vec_id LIMIT 1000
"""


@query(
    "scalar_array_auc",
    oracle="""
    SELECT vec_id,
           list_sum(flatten(list_transform(ps, sp -> list_transform(ns,
             sn -> CASE WHEN sp > sn THEN 1.0
                        WHEN sp = sn THEN 0.5 ELSE 0.0 END))))
             / (len(ps) * len(ns)) AS auc
    FROM (
      SELECT vec_id,
             [embedding[i] FOR i IN generate_series(1, len(embedding))
              IF i % 2 = 1] AS ps,
             [embedding[i] FOR i IN generate_series(1, len(embedding))
              IF i % 2 = 0] AS ns
      FROM embeddings)
    ORDER BY vec_id LIMIT 1000
    """,
    category="scalars",
)
def scalar_array_auc(spark, sf_dir):
    """arrayAUC (round 8 — was a guided error): exact tie-aware pairwise
    ROC AUC of each row's embedding, with odd positions labeled positive
    via arrayMap over arrayEnumerate.  The numerator sums only 1/0.5/0
    (exact in double) and the denominator is 16×16, so the result is a
    dyadic rational — binary-exact cross-engine, no rounding needed.
    Oracle: the same pairwise construction with DuckDB list lambdas."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(translate(_SQL_ARRAY_AUC_CH))


_SQL_URL_HIERARCHY_CH = """
SELECT doc_id,
       arrayStringConcat(
         URLHierarchy(concat('https://ex.com/', source, '/a/b?q=1')), '|')
         AS uh,
       arrayStringConcat(
         pathHierarchy(concat('https://ex.com/', source, '/a/')), '|')
         AS ph
FROM documents ORDER BY doc_id LIMIT 500
"""


@query(
    "scalar_url_hierarchy",
    oracle="""
    SELECT doc_id,
           'https://ex.com/' ||
           '|https://ex.com/' || source || '/' ||
           '|https://ex.com/' || source || '/a/' ||
           '|https://ex.com/' || source || '/a/b?' ||
           '|https://ex.com/' || source || '/a/b?q=1' AS uh,
           '/' || source || '/' ||
           '|/' || source || '/a/' AS ph
    FROM documents ORDER BY doc_id LIMIT 500
    """,
    category="scalars",
)
def scalar_url_hierarchy(spark, sf_dir):
    """URLHierarchy / pathHierarchy (round 8 — were guided errors): every
    prefix cut AFTER each separator run in path+query, plus the full URL
    when it does not end on a separator; pathHierarchy drops
    protocol+host and the bare root.  URLs synthesized from the
    slash-free `source` column, so the oracle enumerates the expected
    hierarchy verbatim — ground truth by construction."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(translate(_SQL_URL_HIERARCHY_CH))


_SQL_VECTOR_MATH_CH = """
SELECT vec_id,
       round(arrayL2Norm(embedding), 5) AS n2,
       round(arrayDotProduct(embedding, embedding), 5) AS dot_self,
       round(arrayL1Distance(embedding,
                             arrayMap(x -> 0 - x, embedding)), 5) AS l1_opp,
       round(cosineDistance(embedding,
                            arrayMap(x -> 0 - x, embedding)), 9) AS cos_opp
FROM embeddings ORDER BY vec_id LIMIT 500
"""


@query(
    "scalar_vector_math",
    oracle="""
    WITH base AS (
      SELECT vec_id,
             list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * x)) AS sq,
             list_sum(list_transform(embedding,
               x -> 2 * abs(CAST(x AS DOUBLE)))) AS l1d
      FROM embeddings
    )
    SELECT vec_id,
           ROUND(sqrt(sq), 5) AS n2,
           ROUND(sq, 5) AS dot_self,
           ROUND(l1d, 5) AS l1_opp,
           ROUND(1.0 - (0.0 - sq) / (sqrt(sq) * sqrt(sq)), 9) AS cos_opp
    FROM base ORDER BY vec_id LIMIT 500
    """,
    category="scalars",
)
def scalar_vector_math(spark, sf_dir):
    """The vector-math family as verbatim SQL text (round 8 — all were
    unresolved functions): L2 norm, dot product, L1 distance, and cosine
    distance over the real embedding column, composed with arrayMap
    negation so the expected values have closed forms (cosine to the
    opposite vector ≈ 2).  Double-accumulated folds on both engines;
    rounded because fold orders differ."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(translate(_SQL_VECTOR_MATH_CH))


_SQL_TIME_DELTA_CH = """
SELECT l_orderkey AS k,
       formatReadableTimeDelta(l_orderkey % 7201, 'minutes') AS d1,
       formatReadableTimeDelta((l_orderkey * 37) % 86400) AS d2,
       formatReadableTimeDelta(42 - (l_orderkey % 100), 'seconds') AS d3
FROM lineitem
"""


@query(
    "scalar_time_delta",
    oracle="""
    WITH b AS (
      SELECT l_orderkey AS k,
             l_orderkey % 7201 AS s1,
             (l_orderkey * 37) % 86400 AS s2,
             42 - (l_orderkey % 100) AS s3
      FROM lineitem
    ), parts AS (
      SELECT k, s3,
             s1 // 60 AS m1, s1 % 60 AS r1,
             s2 // 3600 AS h2, (s2 % 3600) // 60 AS m2, s2 % 60 AS r2
      FROM b
    ),
    lists AS (
      SELECT k, s3,
        list_filter([
          CASE WHEN m1 > 0 THEN m1 || CASE WHEN m1 = 1
            THEN ' minute' ELSE ' minutes' END END,
          CASE WHEN r1 > 0 THEN r1 || CASE WHEN r1 = 1
            THEN ' second' ELSE ' seconds' END END
        ], x -> x IS NOT NULL) AS l1,
        list_filter([
          CASE WHEN h2 > 0 THEN h2 || CASE WHEN h2 = 1
            THEN ' hour' ELSE ' hours' END END,
          CASE WHEN m2 > 0 THEN m2 || CASE WHEN m2 = 1
            THEN ' minute' ELSE ' minutes' END END,
          CASE WHEN r2 > 0 THEN r2 || CASE WHEN r2 = 1
            THEN ' second' ELSE ' seconds' END END
        ], x -> x IS NOT NULL) AS l2
      FROM parts
    )
    SELECT k,
      CASE WHEN len(l1) = 0 THEN '0 seconds'
           WHEN len(l1) = 1 THEN l1[1]
           ELSE array_to_string(l1[1:len(l1)-1], ', ')
                || ' and ' || l1[-1] END AS d1,
      CASE WHEN len(l2) = 0 THEN '0 seconds'
           WHEN len(l2) = 1 THEN l2[1]
           ELSE array_to_string(l2[1:len(l2)-1], ', ')
                || ' and ' || l2[-1] END AS d2,
      CASE WHEN s3 = 0 THEN '0 seconds'
           ELSE (CASE WHEN s3 < 0 THEN '-' ELSE '' END)
             || abs(s3) || CASE WHEN abs(s3) = 1
               THEN ' second' ELSE ' seconds' END END AS d3
    FROM lists
    """,
    category="scalars",
)
def scalar_time_delta(spark, sf_dir):
    """``formatReadableTimeDelta`` as verbatim SQL text (round 8 — was a
    guided error): CH's exact unit constants and formatting — floor per
    unit largest→smallest, zero units skipped, pluralized, ', '-joined
    with ' and ' before the last unit (round 14 — the CH docs join),
    '0 <min_unit>' for zero, one leading '-' for negatives.  Exercised
    with a bounded maximum unit (minutes), the default chain on
    sub-day values (hours/minutes/seconds), and a signed seconds-only
    form; the oracle rebuilds the same strings with integer div/mod in
    DuckDB, so the comparison is exact."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(translate(_SQL_TIME_DELTA_CH))


_SQL_LTTB_CH = """
SELECT tupleElement(p, 1) AS x, tupleElement(p, 2) AS y
FROM (
  SELECT arrayJoin(
    largestTriangleThreeBuckets(7)(CAST(s_suppkey AS Float64), 0.0)) AS p
  FROM supplier
)
"""


@query(
    "scalar_lttb",
    oracle="""
    WITH c AS (SELECT COUNT(*) AS n FROM supplier),
    sel AS (
      SELECT 2 + CAST(FLOOR((i.i - 1) * (c.n - 2) / 5.0) AS BIGINT) AS rn
      FROM c, (SELECT UNNEST(GENERATE_SERIES(1, 5)) AS i) i
      UNION SELECT 1 FROM c
      UNION SELECT n FROM c
    ),
    s AS (
      SELECT CAST(s_suppkey AS DOUBLE) AS x,
             ROW_NUMBER() OVER (ORDER BY s_suppkey) AS rn
      FROM supplier
    )
    SELECT s.x AS x, CAST(0.0 AS DOUBLE) AS y FROM s JOIN sel USING (rn)
    """,
    category="scalars",
)
def scalar_lttb(spark, sf_dir):
    """``largestTriangleThreeBuckets(7)(x, y)`` as verbatim SQL text
    (round 8 — was a guided error), flattened through arrayJoin +
    tupleElement for the scalar-only driver canonicalizer.  With a
    constant y every triangle area is zero, so the first-maximum tie
    convention must select the FIRST point of each of the 5 middle
    buckets plus the two endpoints — the oracle computes exactly those
    bucket-boundary row numbers (lo_i = 2 + floor((i−1)·(N−2)/5)) in
    DuckDB, making bucket arithmetic and tie order ground-truth
    checkable; value fidelity on non-degenerate data is pinned against
    an independent pure-Python LTTB in tests/test_lttb.py."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(translate(_SQL_LTTB_CH))


_SQL_REINTERPRET_CH = """
SELECT s_suppkey,
       reinterpretAsUInt8(s_suppkey * 7 - 128) AS u8,
       reinterpretAsInt16(s_suppkey * 517) AS i16,
       reinterpretAsUInt32(reinterpretAsString(65 + s_suppkey % 58)) AS rt,
       reinterpretAsUInt16(substring(s_name, 1, 2)) AS su16,
       reinterpretAsDate(s_suppkey + 60) AS d
FROM supplier
"""


@query(
    "scalar_reinterpret",
    oracle="""
    SELECT s_suppkey,
           ((s_suppkey * 7 - 128) % 256 + 256) % 256 AS u8,
           CASE WHEN ((s_suppkey * 517) % 65536 + 65536) % 65536 >= 32768
                THEN ((s_suppkey * 517) % 65536 + 65536) % 65536 - 65536
                ELSE ((s_suppkey * 517) % 65536 + 65536) % 65536
           END AS i16,
           65 + s_suppkey % 58 AS rt,
           ascii(substr(s_name, 1, 1)) + 256 * ascii(substr(s_name, 2, 1)) AS su16,
           DATE '1970-01-01' + CAST(s_suppkey + 60 AS INTEGER) AS d
    FROM supplier
    """,
    category="scalars",
)
def scalar_reinterpret(spark, sf_dir):
    """``reinterpretAs{UInt8,Int16,UInt32,UInt16,Date,String}`` as verbatim
    SQL text (round 9 — was a guided error): little-endian byte-exact
    reinterpretation via JVM-side conv/hex folds, typeof-branched per
    input kind (string → LE byte fold, integer → two's-complement wrap,
    Date/DateTime → raw payload).  The oracle recomputes each value with
    plain modular arithmetic in DuckDB: u8 = wrap(x, 2^8); i16 = signed
    wrap; rt = a single-ASCII-byte String roundtrip (CH docs pin
    reinterpretAsUInt32(reinterpretAsString(3909)) = 3909); su16 = the
    first two s_name bytes little-endian; d = UInt16 days since epoch."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(translate(_SQL_REINTERPRET_CH))


# 'a' + U+0301 COMBINING ACUTE (decomposed) — NFC composes it to one
# code point; the Spark side appends it to real document text so the
# normalization runs over data, not just literals
_DECOMPOSED = "á"

_SQL_NORMALIZE_CH = f"""
SELECT doc_id,
       char_length(normalizeUTF8NFC(concat(substring(text, 1, 40),
                                           '{_DECOMPOSED}'))) AS nfc_len,
       char_length(normalizeUTF8NFD(concat(substring(text, 1, 40),
                                           '{_DECOMPOSED}'))) AS nfd_len
FROM documents
"""


@query(
    "scalar_normalize_utf8",
    oracle=f"""
    SELECT doc_id,
           length(nfc_normalize(substr(text, 1, 40) || '{_DECOMPOSED}'))
             AS nfc_len,
           length(nfc_normalize(substr(text, 1, 40) || '{_DECOMPOSED}'))
             + 1 AS nfd_len
    FROM documents
    """,
    category="scalars",
)
def scalar_normalize_utf8(spark, sf_dir):
    """``normalizeUTF8NFC/NFD`` as verbatim SQL text (round 9 — was a
    guided error): UAX #15 normalization via an Arrow pandas_udf over
    unicodedata (functions/unicode_norm.py), registered lazily by the
    tool layer.  Each document's first 40 chars get a DECOMPOSED 'a' +
    combining-acute appended; NFC composes it (one code point), NFD keeps
    it decomposed.  Oracle: DuckDB's nfc_normalize for the NFC length;
    the NFD length is NFC+1 because the corpus text is ASCII (generated
    TPC-H-ish prose), so the appended pair is the only decomposable."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions.unicode_norm import ensure_registered

    ensure_registered(spark)
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(translate(_SQL_NORMALIZE_CH))


_SQL_STRING_FNS_R9_CH = """
SELECT p_partkey,
       initcap(lower(p_name)) AS ic,
       levenshteinDistance(p_brand, p_type) AS lev,
       hasSubsequence(p_name, 'air') AS hs,
       multiSearchFirstPosition(p_name, ['old', 'sky', 'an']) AS ms,
       countSubstringsCaseInsensitive(p_name, 'a') AS ca,
       widthBucket(p_retailprice, 800.0, 2200.0, 14) AS wb,
       isValidUTF8(p_name) AS vu
FROM part
"""


@query(
    "scalar_string_fns_r9",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(lower(p_name), ' '),
               w -> upper(w[1]) || substr(w, 2)), ' ') AS ic,
           levenshtein(p_brand, p_type) AS lev,
           CASE WHEN regexp_matches(p_name, 'a.*i.*r') THEN 1 ELSE 0 END AS hs,
           coalesce(least(nullif(strpos(p_name, 'old'), 0),
                          nullif(strpos(p_name, 'sky'), 0),
                          nullif(strpos(p_name, 'an'), 0)), 0) AS ms,
           CAST(length(lower(p_name))
                - length(replace(lower(p_name), 'a', '')) AS INTEGER) AS ca,
           CAST(CASE WHEN p_retailprice < 800 THEN 0
                     WHEN p_retailprice >= 2200 THEN 15
                     ELSE FLOOR((p_retailprice - 800) / 100) + 1
                END AS BIGINT) AS wb,
           1 AS vu
    FROM part
    """,
    category="scalars",
)
def scalar_string_fns_r9(spark, sf_dir):
    """Round-9 gap-scan string functions as verbatim SQL text: initcap,
    levenshteinDistance (Spark's levenshtein, character-exact),
    hasSubsequence (in-order character fold — oracle proves it equals the
    subsequence regex 'a.*i.*r'), multiSearchFirstPosition (leftmost
    needle hit), countSubstringsCaseInsensitive, widthBucket (equal-width
    histogram bucket incl. the under/overflow 0 / n+1 edges), and
    isValidUTF8.  Each recomputed independently in DuckDB (initcap via a
    per-word transform — DuckDB 1.0 has no initcap; widthBucket via
    explicit floor arithmetic)."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions import register_lazy_udfs

    t(spark, sf_dir, "part").createOrReplaceTempView("part")
    out = translate(_SQL_STRING_FNS_R9_CH)
    register_lazy_udfs(spark, out)  # initcap → ch_initcap since round 16
    return spark.sql(out)


_SQL_INTERVAL_STATS_CH = """
SELECT l_returnflag,
       intervalLengthSum(toRelativeDayNum(l_shipdate),
                         toRelativeDayNum(l_shipdate)
                         + toInt32(l_quantity)) AS union_days,
       round(skewSamp(l_quantity), 6) AS sk,
       round(kurtSamp(l_quantity), 6) AS ku
FROM lineitem GROUP BY l_returnflag
"""


@query(
    "agg_interval_stats",
    oracle="""
    WITH iv AS (
      SELECT l_returnflag AS g,
             datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS s,
             datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               + CAST(l_quantity AS INTEGER) AS e
      FROM lineitem
    ),
    runs AS (
      SELECT g, s, e,
             MAX(e) OVER (PARTITION BY g ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pm
      FROM iv
    ),
    ul AS (
      SELECT g, SUM(CASE WHEN pm IS NULL OR pm < s THEN e - s
                         WHEN e > pm THEN e - pm ELSE 0 END) AS union_days
      FROM runs GROUP BY g
    ),
    mo AS (
      SELECT l_returnflag AS g, COUNT(*) AS n, AVG(l_quantity) AS m,
             SUM(l_quantity) AS s1,
             SUM(l_quantity * l_quantity) AS s2,
             SUM(l_quantity * l_quantity * l_quantity) AS s3,
             SUM(l_quantity * l_quantity * l_quantity * l_quantity) AS s4,
             VAR_SAMP(l_quantity) AS vs
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT mo.g AS l_returnflag,
           CAST(ul.union_days AS DOUBLE) AS union_days,
           round(((s3 - 3 * m * s2 + 2 * n * m * m * m) / n)
                 / POW(vs, 1.5), 6) AS sk,
           round(((s4 - 4 * m * s3 + 6 * m * m * s2 - 3 * n * m * m * m * m)
                 / n) / POW(vs, 2), 6) AS ku
    FROM ul JOIN mo ON ul.g = mo.g
    """,
    category="aggregates",
)
def agg_interval_stats(spark, sf_dir):
    """``intervalLengthSum`` (union length of per-row day
    segments per return flag — sweep-line fold, overlaps counted once)
    — segment ends are shipdate + quantity days, a deterministic
    synthetic span since the slimmed testdata has no l_receiptdate —
    plus ``skewSamp``/``kurtSamp`` (CH's Moments.h: population (/n)
    central moments over SAMPLE-variance powers, recovered from Spark's
    population skewness/kurtosis/var aggregates)
    as verbatim SQL text, round 9.  Oracle: the union length via the
    classic running-max gaps-and-islands window, the moments via raw
    power sums Σx..Σx⁴ expanded around the mean — two fully independent
    formulations.  round(6) absorbs the cross-engine fold-order ULPs of
    the double-typed quantity column."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(translate(_SQL_INTERVAL_STATS_CH))


_SQL_GAP_WAVE2_CH = """
SELECT s_suppkey,
       clamp(s_acctbal, 0.0, 5000.0) AS cl,
       positiveModulo(s_suppkey - 50, 7) AS pm,
       toDecimalString(s_acctbal, 3) AS tds,
       mortonEncode(s_suppkey % 256, (s_suppkey * 7) % 256) AS mz,
       arrayStringConcat(arrayMap(x -> toString(x),
                         bitPositionsToArray(s_suppkey)), ',') AS bp
FROM supplier
"""


@query(
    "scalar_gap_wave2",
    oracle="""
    SELECT s_suppkey,
           least(greatest(s_acctbal, 0.0), 5000.0) AS cl,
           CAST(((s_suppkey - 50) % 7 + 7) % 7 AS BIGINT) AS pm,
           CAST(CAST(s_acctbal AS DECIMAL(38, 3)) AS VARCHAR) AS tds,
           CAST(
             (SELECT SUM((((s_suppkey % 256) >> i.i) & 1) << (2 * i.i))
              FROM (SELECT UNNEST(GENERATE_SERIES(0, 31)) AS i) i)
             + (SELECT SUM(((((s_suppkey * 7) % 256) >> j.j) & 1)
                           << (2 * j.j + 1))
                FROM (SELECT UNNEST(GENERATE_SERIES(0, 31)) AS j) j)
             AS BIGINT) AS mz,
           COALESCE(array_to_string(
             (SELECT LIST(k.k ORDER BY k.k)
              FROM (SELECT UNNEST(GENERATE_SERIES(0, 62)) AS k) k
              WHERE ((s_suppkey >> k.k) & 1) = 1), ','), '') AS bp
    FROM supplier
    """,
    category="scalars",
)
def scalar_gap_wave2(spark, sf_dir):
    """Round-9 wave-2 gap-scan functions with DuckDB-recomputable twins:
    clamp, positiveModulo, toDecimalString (fixed-scale render),
    mortonEncode (Z-order bit interleave — the oracle re-derives it with
    shift arithmetic over GENERATE_SERIES, fully independent of the
    Spark fold), and bitPositionsToArray flattened to CSV for the
    scalar-only driver canonicalizer."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(translate(_SQL_GAP_WAVE2_CH))


_SQL_HTML_EXTRACT_CH = """
SELECT doc_id,
       extractTextFromHTML(concat('<html><body><p class="x">',
         substring(text, 1, 60),
         '</p><!-- boilerplate --><script>var x = 1;</script>',
         '<style>p { color: red }</style></body></html>')) AS txt
FROM documents
"""


@query(
    "pipe_html_extract",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             '<html><body><p class="x">' || substr(text, 1, 60)
             || '</p><!-- boilerplate --><script>var x = 1;</script>'
             || '<style>p { color: red }</style></body></html>' AS h
      FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(h,
               '(?is)<script[^>]*>.*?</script[[:space:]]*>', ' ', 'g'),
               '(?is)<style[^>]*>.*?</style[[:space:]]*>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g'),
               '(?s)<[^>]*>', ' ', 'g'),
               '[[:space:]]+', ' ', 'g')) AS txt
    FROM w
    """,
    category="pipeline",
)
def pipe_html_extract(spark, sf_dir):
    """HTML boilerplate removal — the C4/CommonCrawl text-extraction
    stage — as verbatim ClickHouse ``extractTextFromHTML`` over document
    text wrapped in real markup (tags + comment + script + style).  Pure
    column expression, zero shuffles, whole-stage codegen.  The DuckDB
    oracle reproduces every pass with RE2 (which has no backreferences,
    so script/style strip in separate passes)."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(translate(_SQL_HTML_EXTRACT_CH))


_SQL_IP_FUNCS_CH = """
SELECT s_suppkey,
       isIPAddressInRange(concat('10.', toString(s_suppkey % 256), '.0.1'),
                          '10.0.0.0/9') AS inr,
       IPv6NumToString(IPv4ToIPv6(IPv4StringToNum(
         concat('10.', toString(s_suppkey % 256), '.0.1')))) AS v6,
       isIPv4String(concat('10.', toString(s_suppkey % 256), '.0.1')) AS v4
FROM supplier
"""


@query(
    "scalar_ip_functions",
    oracle="""
    SELECT s_suppkey,
           CASE WHEN s_suppkey % 256 < 128 THEN 1 ELSE 0 END AS inr,
           '::ffff:10.' || CAST(s_suppkey % 256 AS VARCHAR) || '.0.1' AS v6,
           true AS v4
    FROM supplier
    """,
    category="scalars",
)
def scalar_ip_functions(spark, sf_dir):
    """The IP function family as verbatim SQL text (round 9 — IPv6 was a
    guided-error block, now ipaddress-module pandas_udfs):
    isIPAddressInRange (10.x.0.1 ∈ 10.0.0.0/9 ⇔ x < 128 — the oracle
    re-derives the CIDR check arithmetically), the
    IPv4→IPv6-mapped→text roundtrip (CH's dotted ::ffff: rendering), and
    isIPv4String.  One Arrow batch per partition, no shuffles."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions.ipaddr import ensure_registered

    ensure_registered(spark)
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(translate(_SQL_IP_FUNCS_CH))


_SQL_QUANTILE_MPS_CH = """
SELECT l_linenumber AS g,
       quantileExact(0.5)(l_quantity) AS qe,
       quantileExactLow(0.5)(l_quantity) AS ql,
       quantileExactHigh(0.5)(l_quantity) AS qh,
       round(quantileExactExclusive(0.25)(l_quantity), 6) AS qx,
       round(quantileExactInclusive(0.75)(l_quantity), 6) AS qi,
       arrayStringConcat(arrayMap(v -> toString(v), tupleElement(
           mapPopulateSeries(
               arraySort(groupUniqArray(intDiv(toInt32(l_quantity), 10))),
               arrayMap(k -> k * 11,
                        arraySort(groupUniqArray(intDiv(toInt32(l_quantity), 10)))),
               7), 2)), ',') AS mps
FROM lineitem GROUP BY l_linenumber
"""


@query(
    "agg_quantile_exact_variants",
    oracle="""
    WITH q AS (
      SELECT l_linenumber AS g, CAST(l_quantity AS DOUBLE) AS v,
             CAST(l_quantity AS INTEGER) // 10 AS b
      FROM lineitem
    ),
    ls AS (
      SELECT g, list_sort(list(v)) AS a, COUNT(*) AS n FROM q GROUP BY g
    ),
    sel AS (
      SELECT g,
             a[CAST(n // 2 AS INTEGER) + 1] AS qe,
             a[CASE WHEN n % 2 = 1 THEN CAST(n // 2 AS INTEGER)
                    ELSE CAST(n // 2 AS INTEGER) - 1 END + 1] AS ql,
             a[CAST(n // 2 AS INTEGER) + 1] AS qh,
             round(CASE WHEN CAST(floor(0.25 * (n + 1)) AS INTEGER) < 1
                        THEN a[1]
                        WHEN CAST(floor(0.25 * (n + 1)) AS INTEGER) >= n
                        THEN a[CAST(n AS INTEGER)]
                        ELSE a[CAST(floor(0.25 * (n + 1)) AS INTEGER)]
                          + (0.25 * (n + 1) - floor(0.25 * (n + 1)))
                          * (a[CAST(floor(0.25 * (n + 1)) AS INTEGER) + 1]
                             - a[CAST(floor(0.25 * (n + 1)) AS INTEGER)])
                   END, 6) AS qx
      FROM ls
    ),
    qc AS (
      SELECT g, round(quantile_cont(v, 0.75), 6) AS qi FROM q GROUP BY g
    ),
    bu AS (SELECT g, b FROM q GROUP BY g, b),
    rng AS (SELECT g, MIN(b) AS lo FROM bu GROUP BY g),
    ser AS (
      SELECT r.g, gs.k FROM rng r,
      LATERAL unnest(generate_series(r.lo, 7)) AS gs(k)
    ),
    mps AS (
      SELECT s.g,
             string_agg(CAST(CASE WHEN bu.b IS NOT NULL THEN s.k * 11
                                  ELSE 0 END AS VARCHAR),
                        ',' ORDER BY s.k) AS mps
      FROM ser s LEFT JOIN bu ON bu.g = s.g AND bu.b = s.k GROUP BY s.g
    )
    SELECT sel.g, sel.qe, sel.ql, sel.qh, sel.qx, qc.qi, mps.mps
    FROM sel JOIN qc ON qc.g = sel.g JOIN mps ON mps.g = sel.g
    """,
    category="aggregates",
)
def agg_quantile_exact_variants(spark, sf_dir):
    """The quantileExact SELECTION family + mapPopulateSeries (round 10 —
    all previously guided): quantileExact/Low/High pick the
    floor(level·n) / median_low / median_high element (QuantileExact.h
    rules, actual data values — hash-exact), Exclusive/Inclusive are the
    Excel PERCENTILE.EXC / PERCENTILE.INC interpolations, and
    mapPopulateSeries fills integer-key gaps with 0 up to max=7 (the
    per-group quantity-decile keys never reach 6-7, so the fill is always
    exercised).  Oracle: the same selection indices / interpolations over
    list_sort, quantile_cont for INC, and a generate_series LEFT JOIN for
    the series fill."""
    from mcp_clickhouse_spark.dialect import translate

    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(translate(_SQL_QUANTILE_MPS_CH))


_SQL_STRING_DISTANCE_CH = """
SELECT p_partkey,
       byteHammingDistance(p_brand, p_type) AS bh,
       damerauLevenshteinDistance(p_brand, p_type) AS dl,
       round(jaroSimilarity(p_type, p_name), 8) AS js,
       round(jaroWinklerSimilarity(p_type, p_name), 8) AS jw,
       arrayLevenshtein(
         arrayMap(i -> (p_partkey + i) % 10, range(1 + p_partkey % 7)),
         arrayMap(i -> (p_partkey * 3 + i * i) % 10, range(1 + p_partkey % 5))
       ) AS alev,
       round(lgamma(1.0 + p_size), 6) AS lg,
       tgamma(1.0 + p_size % 5) AS tg
FROM part
"""


@query(
    "scalar_string_distance",
    oracle="""
    SELECT p_partkey,
           CAST(len(list_filter(
                  generate_series(1, least(length(p_brand), length(p_type))),
                  i -> substr(p_brand, i, 1) != substr(p_type, i, 1)))
                + abs(length(p_brand) - length(p_type)) AS INTEGER) AS bh,
           CAST(damerau_levenshtein(p_brand, p_type) AS INTEGER) AS dl,
           CAST(round(jaro_similarity(p_type, p_name), 8) AS DOUBLE) AS js,
           CAST(round(jaro_winkler_similarity(p_type, p_name), 8) AS DOUBLE) AS jw,
           CAST(levenshtein(
             list_aggregate(list_transform(generate_series(0, p_partkey % 7),
               i -> CAST((p_partkey + i) % 10 AS VARCHAR)), 'string_agg', ''),
             list_aggregate(list_transform(generate_series(0, p_partkey % 5),
               i -> CAST((p_partkey * 3 + i * i) % 10 AS VARCHAR)), 'string_agg', '')
           ) AS INTEGER) AS alev,
           round(lgamma(1.0 + p_size), 6) AS lg,
           gamma(1.0 + p_size % 5) AS tg
    FROM part
    """,
    category="scalars",
)
def scalar_string_distance(spark, sf_dir):
    """Round-10 string-distance wave (were guided errors): the byte-exact
    Damerau-Levenshtein / Jaro / Jaro-Winkler / byteHammingDistance family
    (Arrow pandas_udfs over UTF-8 bytes, functions/strdist.py — ASCII
    TPC-H columns make them comparable with DuckDB's char-based twins),
    arrayLevenshtein over element sequences (the oracle re-derives it as
    plain levenshtein over single-digit strings — one char per element, an
    exact reduction), and lgamma/tgamma (math.lgamma/math.gamma — the same
    libm DuckDB calls; tgamma kept to exact small-integer arguments, lgamma
    rounded to absorb last-ulp divergence)."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions.stats import (
        ensure_registered as _stats_udfs,
    )
    from mcp_clickhouse_spark.functions.strdist import ensure_registered

    ensure_registered(spark)
    _stats_udfs(spark)
    t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(translate(_SQL_STRING_DISTANCE_CH))


_SQL_GEO_CH = """
SELECT s_suppkey,
       round(greatCircleDistance(
         (s_suppkey % 360) - 180 + 0.25, (s_suppkey % 170) - 85 + 0.25,
         ((s_suppkey * 7) % 360) - 180 + 0.25,
         ((s_suppkey * 3) % 170) - 85 + 0.25), 4) AS gcd,
       round(greatCircleAngle(
         (s_suppkey % 360) - 180 + 0.25, (s_suppkey % 170) - 85 + 0.25,
         ((s_suppkey * 7) % 360) - 180 + 0.25,
         ((s_suppkey * 3) % 170) - 85 + 0.25), 6) AS gca,
       pointInPolygon(((s_suppkey % 9) + 0.5, ((s_suppkey * 3) % 13) + 0.5),
         [(0, 0), (10, 0), (10, 10), (0, 10)]) AS pip,
       round(polygonAreaCartesian([[
         (0.0, 0.0), (1.0 + s_suppkey % 7, 0.0),
         (1.0 + s_suppkey % 7, 1.0 + s_suppkey % 11),
         (0.0, 1.0 + s_suppkey % 11)]]), 6) AS area,
       round(polygonPerimeterCartesian([[
         (0.0, 0.0), (1.0 + s_suppkey % 7, 0.0),
         (1.0 + s_suppkey % 7, 1.0 + s_suppkey % 11),
         (0.0, 1.0 + s_suppkey % 11)]]), 6) AS perim,
       geohashEncode((s_suppkey % 360) - 180 + 0.25,
                     (s_suppkey % 170) - 85 + 0.25, 5) AS gh
FROM supplier
"""


@query(
    "scalar_geo",
    oracle="""
    WITH pts AS (
      SELECT s_suppkey,
             (s_suppkey % 360) - 180 + 0.25 AS lon1,
             (s_suppkey % 170) - 85 + 0.25 AS lat1,
             ((s_suppkey * 7) % 360) - 180 + 0.25 AS lon2,
             ((s_suppkey * 3) % 170) - 85 + 0.25 AS lat2,
             (s_suppkey % 9) + 0.5 AS px,
             ((s_suppkey * 3) % 13) + 0.5 AS py,
             1.0 + s_suppkey % 7 AS w,
             1.0 + s_suppkey % 11 AS h
      FROM supplier
    ),
    gq AS (
      SELECT s_suppkey,
             CAST(floor((lon1 + 180.0) / 360.0 * 8192) AS BIGINT) AS lonq,
             CAST(floor((lat1 + 90.0) / 180.0 * 4096) AS BIGINT) AS latq
      FROM pts
    ),
    gh AS (
      SELECT s_suppkey,
             (SELECT string_agg(
                substr('0123456789bcdefghjkmnpqrstuvwxyz', 1 + CAST(
                  (SELECT SUM(CASE WHEN (b.b + 5 * k.k) % 2 = 0
                     THEN ((lonq >> CAST(12 - (b.b + 5 * k.k) // 2 AS BIGINT)) & 1)
                          << CAST(4 - b.b AS BIGINT)
                     ELSE ((latq >> CAST(11 - (b.b + 5 * k.k - 1) // 2 AS BIGINT)) & 1)
                          << CAST(4 - b.b AS BIGINT) END)
                   FROM (SELECT UNNEST(generate_series(0, 4)) AS b) b) AS INT), 1),
                '' ORDER BY k.k)
              FROM (SELECT UNNEST(generate_series(0, 4)) AS k) k) AS gh
      FROM gq
    )
    SELECT pts.s_suppkey,
           round(2 * 6371000.0 * asin(sqrt(
             pow(sin(radians(lat2 - lat1) / 2), 2)
             + cos(radians(lat1)) * cos(radians(lat2))
             * pow(sin(radians(lon2 - lon1) / 2), 2))), 4) AS gcd,
           round(degrees(2 * asin(sqrt(
             pow(sin(radians(lat2 - lat1) / 2), 2)
             + cos(radians(lat1)) * cos(radians(lat2))
             * pow(sin(radians(lon2 - lon1) / 2), 2)))), 6) AS gca,
           CAST(CASE WHEN px < 10 AND py < 10 THEN 1 ELSE 0 END AS INTEGER)
             AS pip,
           CAST(round(w * h, 6) AS DOUBLE) AS area,
           CAST(round(2 * (w + h), 6) AS DOUBLE) AS perim,
           gh.gh AS gh
    FROM pts JOIN gh ON gh.s_suppkey = pts.s_suppkey
    """,
    category="scalars",
)
def scalar_geo(spark, sf_dir):
    """Round-10 planar/sphere geometry wave (were guided errors or
    unresolved names): greatCircleDistance + greatCircleAngle (haversine
    on CH's 6371 km sphere — the oracle re-derives both trigonometrically),
    pointInPolygon (even-odd ray casting as pure column expressions; the
    synthetic point grid stays off every edge, so the oracle reduces to the
    rectangle-bounds test px,py < 10), polygonAreaCartesian /
    polygonPerimeterCartesian over a per-row w x h rectangle ring (oracle:
    the closed forms w*h and 2(w+h) — fully independent of the shoelace /
    edge-length folds), and geohashEncode at precision 5 (oracle: quantize
    lon/lat to 13/12 bits, re-interleave with shift arithmetic over
    generate_series, and render base32 — independent of the Python
    successive-halving UDF)."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions.geo import ensure_registered

    ensure_registered(spark)
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(translate(_SQL_GEO_CH))


_SQL_R10_WAVE2_CH = """
SELECT o_orderpriority AS pri,
       toISOYear(toDate(min(o_orderdate))) AS iy,
       toStartOfISOYear(toDate(max(o_orderdate))) AS sy,
       round(sigmoid(avg(o_totalprice) / 100000.0), 8) AS sg,
       bin(count() % 300) AS bn,
       unbin(bin(64 + count() % 32)) AS ub,
       toStringCutToZero(concat(min(o_orderpriority), char(0), 'zzz')) AS cz,
       round(tupleElement(studentTTestOneSample(o_totalprice, 150000.0),
             't_statistic'), 6) AS t1
FROM orders GROUP BY o_orderpriority
"""


@query(
    "scalar_round10_wave2",
    oracle="""
    SELECT o_orderpriority AS pri,
           CAST(isoyear(CAST(min(o_orderdate) AS DATE)) AS INT) AS iy,
           make_date(CAST(isoyear(CAST(max(o_orderdate) AS DATE)) AS INT),
                     1, 4)
             - CAST(isodow(make_date(CAST(isoyear(CAST(max(o_orderdate)
                 AS DATE)) AS INT), 1, 4)) - 1 AS INT) AS sy,
           round(1.0 / (1.0 + exp(-(avg(o_totalprice) / 100000.0))), 8)
             AS sg,
           lpad(bin(COUNT(*) % 300),
                CAST(8 * ceil(length(bin(COUNT(*) % 300)) / 8.0) AS INT),
                '0') AS bn,
           chr(CAST(64 + COUNT(*) % 32 AS INT)) AS ub,
           min(o_orderpriority) AS cz,
           round((avg(o_totalprice) - 150000.0)
                 / (stddev_samp(o_totalprice) / sqrt(COUNT(*))), 6) AS t1
    FROM orders GROUP BY o_orderpriority
    """,
    category="scalars",
)
def scalar_round10_wave2(spark, sf_dir):
    """Round-10 wave-2 gap-scan functions with DuckDB-recomputable twins:
    toISOYear / toStartOfISOYear (the oracle re-derives the Monday of ISO
    week 1 from isoyear+isodow), sigmoid, bin with CH's byte-boundary
    padding (oracle: the same lpad rule over DuckDB's minimal-width bin),
    unbin (the oracle reduces the bin→unbin round trip to chr() of the
    value — 64..95 stays printable ASCII), toStringCutToZero (cut at the
    planted NUL restores the bare priority string), and the round-10
    studentTTestOneSample (oracle: the closed-form (x̄−μ)/(s/√n); the
    p-value rides on the pytest-pinned t-distribution like the two-sample
    family).  erf/erfc have no DuckDB twin — pinned against math.erf in
    tests/test_strdist_geo.py instead."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions.stats import ensure_registered

    ensure_registered(spark)
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate(_SQL_R10_WAVE2_CH))


_SQL_R11_CH = """
SELECT p_partkey,
       round(polygonAreaSpherical([[
         (CAST(p_partkey % 300 AS Float64) - 150.0, 0.0),
         (CAST(p_partkey % 300 AS Float64) - 150.0
            + CAST(p_partkey % 80 AS Float64) + 1.0, 0.0),
         (0.0, 90.0)]]), 9) AS sph,
       CAST(ngramDistance(p_name,
            concat(substring(p_name, 3, 6), ' bolt')) AS Float64) AS nd,
       CAST(ngramSearch(p_name, concat(substring(p_name, 2, 5),
            substring(p_type, 1, 3))) AS Float64) AS ns,
       round(minSampleSizeConversion(
         0.01 + CAST(p_partkey % 20 AS Float64) * 0.01,
         0.005, 0.8, 0.05).1, 6) AS mc_n,
       round(minSampleSizeConversion(
         0.01 + CAST(p_partkey % 20 AS Float64) * 0.01,
         0.005, 0.8, 0.05).2, 6) AS mc_lo,
       round(minSampleSizeContinous(
         100.0 + CAST(p_partkey % 50 AS Float64),
         10.0 + CAST(p_partkey % 7 AS Float64),
         0.03, 0.8, 0.05).1, 6) AS ms_n
FROM part
"""


@query(
    "scalar_round11",
    oracle="""
    WITH base AS (
      SELECT p_partkey, p_name AS a,
             concat(substr(p_name, 3, 6), ' bolt') AS b,
             concat(substr(p_name, 2, 5), substr(p_type, 1, 3)) AS ndl,
             CAST(0.01 AS DOUBLE)
               + (p_partkey % 20) * CAST(0.01 AS DOUBLE) AS p1,
             CAST(100.0 AS DOUBLE) + (p_partkey % 50) AS cb,
             CAST(10.0 AS DOUBLE) + (p_partkey % 7) AS cs
      FROM part
    ),
    idx AS (SELECT UNNEST(generate_series(1, 64)) AS i),
    dg AS (
      SELECT p_partkey, g, SUM(ca) AS sa, SUM(cb) AS sb FROM (
        SELECT p_partkey, substr(a, i, 4) AS g, 1 AS ca, 0 AS cb
        FROM base, idx WHERE i + 3 <= length(a)
        UNION ALL
        SELECT p_partkey, substr(b, i, 4), 0, 1
        FROM base, idx WHERE i + 3 <= length(b)
      ) GROUP BY 1, 2
    ),
    nd AS (
      SELECT p_partkey,
             CAST(CAST(SUM(ABS(sa - sb)) AS REAL)
                  / CAST(SUM(sa + sb) AS REAL) AS DOUBLE) AS nd
      FROM dg GROUP BY 1
    ),
    sg AS (
      SELECT p_partkey, g, SUM(ca) AS sa, SUM(cn) AS sn FROM (
        SELECT p_partkey, substr(a, i, 4) AS g, 1 AS ca, 0 AS cn
        FROM base, idx WHERE i + 3 <= length(a)
        UNION ALL
        SELECT p_partkey, substr(ndl, i, 4), 0, 1
        FROM base, idx WHERE i + 3 <= length(ndl)
      ) GROUP BY 1, 2
    ),
    ns AS (
      SELECT p_partkey,
             CAST(CAST(1 AS REAL)
                  - CAST(SUM(sn) - SUM(LEAST(sn, sa)) AS REAL)
                    / CAST(SUM(sn) AS REAL) AS DOUBLE) AS ns
      FROM sg GROUP BY 1
    )
    SELECT base.p_partkey,
           round(radians((base.p_partkey % 80) + 1), 9) AS sph,
           nd.nd AS nd,
           ns.ns AS ns,
           round((7.848879734349086
             * (p1 * (1.0 - p1) + (p1 + 0.005) * (1.0 - (p1 + 0.005)))
             / (0.005 * 0.005)), 6) AS mc_n,
           round(p1 - 0.005, 6) AS mc_lo,
           round((7.848879734349086 * 2.0 * cs * cs
             / ((0.03 * cb) * (0.03 * cb))), 6) AS ms_n
    FROM base
    JOIN nd ON nd.p_partkey = base.p_partkey
    JOIN ns ON ns.p_partkey = base.p_partkey
    """,
    category="scalars",
)
def scalar_round11(spark, sf_dir):
    """Round-11 guided-tail closures with DuckDB-recomputable twins:

    - ``polygonAreaSpherical`` over a per-row polar triangle (two
      meridian edges + an equator base, dlon = (k % 80)+1 degrees): the
      exact spherical excess of that triangle is the closed form
      radians(dlon), fully independent of the edge-wise atan2 fan the
      translation emits (octant/hole/orientation pins live in
      tests/test_r11_wave.py);
    - ``ngramDistance``/``ngramSearch``: the oracle regrows both 4-gram
      multisets with substr over generate_series and recomputes
      sym-diff/total resp. matched-needle-fraction in REAL (float32)
      arithmetic -- DuckDB REAL division is bit-identical IEEE-754
      single precision, so the values compare exactly, no rounding;
    - ``minSampleSizeConversion``/``minSampleSizeContinous``: the oracle
      repeats the closed-form power analysis with the z**2 literal
      7.848879734349086 ((z_0.975 + z_0.8)**2 -- table constants,
      reproduced to double precision by functions/stats.norm_ppf at
      translation time) and the same association order, so the doubles
      match bit-for-bit before the defensive round(..., 6)."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions.strdist import ensure_registered

    ensure_registered(spark)
    t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(translate(_SQL_R11_CH))


_SQL_R11B_CH = """
SELECT p_partkey,
       readWKTPoint(concat('POINT (', toString(p_partkey % 100), ' ',
           toString(p_partkey % 7), ')')).1 AS px,
       readWKTPoint(concat('POINT (', toString(p_partkey % 100), ' ',
           toString(p_partkey % 7), ')')).2 AS py,
       tupleElement(arrayElement(readWKTRing(concat('POLYGON ((0 0, ',
           toString(p_partkey % 50 + 1), ' 0, ',
           toString(p_partkey % 50 + 1), ' ',
           toString(p_partkey % 30 + 1), ', 0 ',
           toString(p_partkey % 30 + 1), '))')), 3), 2) AS ring_h,
       round(polygonAreaCartesian(readWKTPolygon(concat('POLYGON ((0 0, ',
           toString(p_partkey % 50 + 1), ' 0, ',
           toString(p_partkey % 50 + 1), ' ',
           toString(p_partkey % 30 + 1), ', 0 ',
           toString(p_partkey % 30 + 1),
           '), (1 1, 2 1, 2 2, 1 2))'))), 6) AS area,
       round(polygonAreaCartesian(arrayElement(readWKTMultiPolygon(concat(
           'MULTIPOLYGON (((0 0, ', toString(p_partkey % 50 + 1), ' 0, ',
           toString(p_partkey % 50 + 1), ' ', toString(p_partkey % 30 + 1),
           ', 0 ', toString(p_partkey % 30 + 1),
           ')), ((0 0, 1 0, 1 1, 0 1)))')), 1)), 6) AS mp_area,
       decodeXMLComponent(concat('&lt;', p_name, '&gt; &amp; &#',
           toString(65 + p_partkey % 26), '; &#x4A; &nope;')) AS dx,
       decodeHTMLComponent(concat('&copy; ', p_name, ' &#',
           toString(97 + p_partkey % 26), ';')) AS dh
FROM part
"""


@query(
    "scalar_round11b",
    oracle="""
    SELECT p_partkey,
           CAST(p_partkey % 100 AS DOUBLE) AS px,
           CAST(p_partkey % 7 AS DOUBLE) AS py,
           CAST(p_partkey % 30 + 1 AS DOUBLE) AS ring_h,
           round(CAST((p_partkey % 50 + 1) * (p_partkey % 30 + 1)
                 AS DOUBLE) - 1.0, 6) AS area,
           round(CAST((p_partkey % 50 + 1) * (p_partkey % 30 + 1)
                 AS DOUBLE), 6) AS mp_area,
           concat('<', p_name, '> & ', chr(CAST(65 + p_partkey % 26 AS INTEGER)),
                  ' J &nope;') AS dx,
           concat(chr(169), ' ', p_name, ' ',
                  chr(CAST(97 + p_partkey % 26 AS INTEGER))) AS dh
    FROM part
    """,
    category="scalars",
)
def scalar_round11b(spark, sf_dir):
    """Round-11 wave 2 closures, oracle-checked by independent
    reconstruction (the DuckDB twin never parses or decodes — it rebuilds
    the expected values from the raw key arithmetic, so the WKT readers
    and entity decoders are proven against ground truth, not against a
    reimplementation):

    - ``readWKTPoint/Ring/Polygon/MultiPolygon``: pure regex/split column
      expressions over the OGC WKT grammar, composed with
      polygonAreaCartesian (shoelace) so the parse feeds a real geometry
      consumer — expected area is the closed form w*h - 1 (hole) / w*h;
    - ``decodeXMLComponent``: five predefined entities + decimal and hex
      numeric refs decode, unknown ``&nope;`` passes through verbatim;
    - ``decodeHTMLComponent``: WHATWG named entities (``&copy;``) +
      numeric refs (functions/codecs.py, html.unescape)."""
    from mcp_clickhouse_spark.dialect import translate
    from mcp_clickhouse_spark.functions.codecs import (
        ensure_registered as _codecs,
    )

    _codecs(spark)
    t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(translate(_SQL_R11B_CH))
