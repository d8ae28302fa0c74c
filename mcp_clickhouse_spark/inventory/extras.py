"""Remaining §2.3 surface: generated sources (numbers/generateRandom/VALUES),
SELECT modifiers (* EXCEPT, COLUMNS regex), ILIKE/regex predicates,
multi-quantiles, correlated/scalar subqueries, CTEs, EXISTS/IN subqueries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_clickhouse_spark.functions import cents
from mcp_clickhouse_spark.inventory.registry import query, t


@query(
    "source_numbers",
    oracle="""
    SELECT r AS number, r * 2 AS doubled, r % 5 AS mod5
    FROM range(1000) tbl(r)
    """,
    category="sources",
)
def source_numbers(spark, sf_dir):
    # ClickHouse numbers(N) table function → spark.range (a generated
    # distributed source, no file scan).
    return spark.range(1000).select(
        F.col("id").alias("number"),
        (F.col("id") * 2).alias("doubled"),
        (F.col("id") % 5).alias("mod5"),
    )


@query(
    "source_values_table",
    oracle="""
    SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS v(id, tag)
    """,
    category="sources",
)
def source_values_table(spark, sf_dir):
    # ClickHouse values(...) literal table (§2.3.1).
    return spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') AS v(id, tag)")


@query("source_generate_random", category="sources")  # rows-only: rand() is impl-specific
def source_generate_random(spark, sf_dir):
    # generateRandom() analog: seeded rand/randn — deterministic within
    # Spark but not across engines.
    return spark.range(100).select(
        "id",
        F.rand(seed=42).alias("u"),
        F.randn(seed=42).alias("g"),
    )


@query(
    "select_star_except",
    oracle="SELECT * EXCLUDE (o_orderpriority, o_orderdate) FROM orders WHERE o_orderkey <= 100",
    category="core",
)
def select_star_except(spark, sf_dir):
    # ClickHouse `SELECT * EXCEPT (cols)` (§2.3.2) — Spark selectExpr
    # supports the same syntax (DuckDB spells it EXCLUDE).
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 100)
    return o.selectExpr("* EXCEPT (o_orderpriority, o_orderdate)")


@query(
    "select_columns_regex",
    oracle="SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber FROM lineitem WHERE l_orderkey <= 50",
    category="core",
)
def select_columns_regex(spark, sf_dir):
    # ClickHouse COLUMNS('re') projection → df.colRegex.
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 50)
    return li.select(li.colRegex("`^l_(orderkey|partkey|suppkey|linenumber)$`"))


@query(
    "filter_ilike_regex",
    oracle=r"""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name ILIKE '%GEAR%' OR regexp_matches(p_type, '^(STANDARD|PROMO)$')
    """,
    category="core",
)
def filter_ilike_regex(spark, sf_dir):
    # ILIKE + match() regex predicates (§2.3.2).
    p = t(spark, sf_dir, "part")
    return p.where(
        F.col("p_name").ilike("%GEAR%") | F.col("p_type").rlike("^(STANDARD|PROMO)$")
    ).select("p_partkey", "p_name")


@query(
    "agg_multi_quantiles",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(
             [CAST(round(x, 4) AS DECIMAL(18,4)) FOR x IN quantile_cont(o_totalprice, [0.25, 0.5, 0.75])],
             ','
           ) AS quartiles
    FROM orders GROUP BY o_orderstatus
    """,
    category="aggregates",
)
def agg_multi_quantiles(spark, sf_dir):
    # ClickHouse quantiles(0.25,0.5,0.75)(x) — array-returning percentile.
    # Serialized to a comma-joined DECIMAL(18,4) string on both sides: the
    # driver canonicalizer cannot hash array cells (round-1 RED row), and
    # the fixed-scale decimal render makes float formatting engine-agnostic.
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.percentile(
                    "o_totalprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
                ),
                lambda x: F.round(x, 4).cast("decimal(18,4)").cast("string"),
            ),
        ).alias("quartiles")
    )


@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_totalprice
             - (SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FROM orders)
               / (SELECT COUNT(*) FROM orders) / 100.0 AS delta_from_mean
    FROM orders WHERE o_orderkey <= 100
    """,
    category="subqueries",
)
def subquery_scalar(spark, sf_dir):
    # Uncorrelated scalar subquery.  The mean goes through the bigint-cents
    # pattern (exact.py): a double AVG's value depends on partial-sum order,
    # which the multi-file storage layout no longer pins — at sf0.1 the
    # naive AVG drifted one ULP between Spark's 2-file partial aggregation
    # and DuckDB's serial sum.  An integer cents SUM is order-independent on
    # both engines, and the two double divisions that follow are identical
    # IEEE ops on identical operands.
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               o_totalprice
                 - (SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FROM orders)
                   / (SELECT COUNT(*) FROM orders) / 100.0 AS delta_from_mean
        FROM orders WHERE o_orderkey <= 100
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
    """,
    category="subqueries",
)
def subquery_in(spark, sf_dir):
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        """
    )


@query(
    "subquery_correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    )
    """,
    category="subqueries",
)
def subquery_correlated_exists(spark, sf_dir):
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
        )
        """
    )


@query(
    "cte_multi",
    oracle="""
    WITH big_orders AS (
      SELECT o_custkey, COUNT(*) AS n_big
      FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey
    ),
    seg AS (
      SELECT c_custkey, c_mktsegment FROM customer
    )
    SELECT seg.c_mktsegment, CAST(SUM(b.n_big) AS BIGINT) AS total_big
    FROM big_orders b JOIN seg ON b.o_custkey = seg.c_custkey
    GROUP BY seg.c_mktsegment
    """,
    category="subqueries",
)
def cte_multi(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH big_orders AS (
          SELECT o_custkey, COUNT(*) AS n_big
          FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey
        ),
        seg AS (
          SELECT c_custkey, c_mktsegment FROM customer
        )
        SELECT seg.c_mktsegment, SUM(b.n_big) AS total_big
        FROM big_orders b JOIN seg ON b.o_custkey = seg.c_custkey
        GROUP BY seg.c_mktsegment
        """
    )


# --- TPC-H-shaped classics for coverage depth -------------------------------


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    category="core",
)
def q6_forecast_revenue(spark, sf_dir):
    # TPC-H Q6 shape: pure scan-filter-aggregate; every predicate reaches the
    # parquet reader (row-group skipping on l_shipdate min/max stats).
    li = t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        (
            F.sum(
                cents("l_extendedprice")
                * cents("l_discount")
            )
            / F.lit(10000.0)
        ).alias("revenue")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    category="core",
)
def q10_returned_items(spark, sf_dir):
    # TPC-H Q10 shape: revenue lost to returned items, top-20 customers.
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    rev = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev).cast("double") / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 21000
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 25
    """,
    category="core",
)
def q18_large_volume_customers(spark, sf_dir):
    # TPC-H Q18 shape: HAVING-filtered semi-join of an aggregate back onto
    # the fact — the aggregate subquery shuffles once and then semi-joins.
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    qty = cents("l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("q"))
        .where(F.col("q") > 21000)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "o_orderkey"), on="o_orderkey", how="left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg((F.sum(qty).cast("double") / F.lit(100.0)).alias("total_qty"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(25)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT
      CAST(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
            THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
            ELSE 0 END)
        AS DOUBLE)
      / SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
      AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
    category="core",
)
def q14_promo_revenue(spark, sf_dir):
    # TPC-H Q14 shape: conditional revenue ratio over a month window; the
    # part side broadcasts, revenue in exact integer ten-thousandths.
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp_ntz"))
    )
    p = t(spark, sf_dir, "part")
    rev = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev)).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS volume
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name < sn.n_name
    GROUP BY cn.n_name, sn.n_name
    """,
    category="core",
)
def q7_volume_shipping(spark, sf_dir):
    # TPC-H Q7 shape: 6-table join with the nation dim joined TWICE
    # (customer side + supplier side) — alias discipline + double broadcast.
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .where(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(rev).cast("double") / F.lit(10000.0)).alias("volume"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    category="core",
)
def q3_shipping_priority(spark, sf_dir):
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    rev = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(rev) / F.lit(10000.0)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH offer AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS price_c
      FROM lineitem l
    ),
    best AS (
      SELECT l_partkey, MIN(price_c) AS min_price_c FROM offer GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name,
           CAST(o.price_c AS DOUBLE) / 100.0 AS best_price
    FROM offer o
    JOIN best b ON o.l_partkey = b.l_partkey AND o.price_c = b.min_price_c
    JOIN part p ON p.p_partkey = o.l_partkey
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE' AND p.p_size <= 15
    ORDER BY p_partkey, s_name
    LIMIT 100
    """,
    category="core",
)
def q2_min_cost_supplier(spark, sf_dir):
    # TPC-H Q2 shape (correlated MIN subquery): cheapest offer per part,
    # restricted to European suppliers. No partsupp table in the testdata —
    # lineitem serves as the part↔supplier offer bridge; the correlated
    # scalar subquery is decorrelated into an aggregate + self-join, which is
    # exactly what Catalyst/any optimizer does to Q2. Scale: one shuffle for
    # the per-part min, one for the offer↔best join (same key, reused
    # partitioning); part/supplier/nation/region dims are broadcast.
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_size") <= 15)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    offer = li.select(
        "l_partkey",
        "l_suppkey",
        cents("l_extendedprice").alias("price_c"),
    )
    best = (
        offer.groupBy("l_partkey")
        .agg(F.min("price_c").alias("min_price_c"))
        .withColumnRenamed("l_partkey", "b_partkey")
    )
    return (
        offer.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("price_c") == F.col("min_price_c")),
        )
        .drop("b_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            (F.col("price_c").cast("double") / F.lit(100.0)).alias("best_price"),
        )
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    category="core",
)
def q4_order_priority(spark, sf_dir):
    # TPC-H Q4 shape (EXISTS semi-join): orders with at least one late
    # lineitem (shipped >60 days after order; testdata has no
    # commitdate/receiptdate). EXISTS → left_semi join — one shuffle on
    # l_orderkey, count-by-priority on the survivors.
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q8_market_share",
    oracle="""
    WITH rev AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS volume_c,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'AMERICA' AND p.p_type IN ('PROMO', 'STANDARD')
    )
    SELECT o_year,
           round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_c ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume_c) AS DOUBLE), 6) AS mkt_share
    FROM rev GROUP BY o_year ORDER BY o_year
    """,
    category="core",
)
def q8_market_share(spark, sf_dir):
    # TPC-H Q8 shape (national market share): one nation's share of PROMO/STANDARD-part
    # revenue sold into AMERICA, per order year. Fact-to-fact joins shuffle
    # on their keys; all five dims broadcast. Share = bigint-cents ratio →
    # exact IEEE division, cross-engine deterministic.
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    p = t(spark, sf_dir, "part").where(F.col("p_type").isin("PROMO", "STANDARD"))
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    )
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume_c"),
            "supp_nation",
        )
    )
    return (
        rev.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume_c")).otherwise(0))
                .cast("double")
                / F.sum("volume_c").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q12_priority_by_flag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    category="core",
)
def q12_priority_by_flag(spark, sf_dir):
    # TPC-H Q12 shape (conditional CASE aggregation over a join): testdata
    # has no l_shipmode, so l_returnflag carries the grouping role. The
    # shipdate range reaches the parquet scan; one shuffle for the join, one
    # for the 3-group agg (map-side combined).
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    category="core",
)
def q19_discounted_revenue(spark, sf_dir):
    # TPC-H Q19 shape (disjunctive multi-branch predicate across the join):
    # the OR-of-ANDs mixes join-side columns, so it can only be applied
    # post-join — but each branch's part-side conjunct (brand+size) is
    # implied by the disjunction and Catalyst derives the part filter for
    # the broadcast side. Revenue in bigint cents.
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    rev = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg((F.sum(rev).cast("double") / F.lit(10000.0)).alias("revenue"))
    )


# --- round-4 TPC-H depth: Q5 / Q13 / Q15 / Q17 / Q22 shapes -----------------

_REV_CENTS_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_REV_CENTS_SQL.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")}) AS DOUBLE) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    category="core",
)
def q5_local_supplier_volume(spark, sf_dir):
    # TPC-H Q5 (local supplier volume): the classic 6-way star-with-cycle —
    # the c_nationkey = s_nationkey equality closes the customer/supplier
    # loop, so it rides the supplier join as a second condition rather than
    # a separate shuffle. nation/region broadcast; revenue in bigint cents.
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg((F.sum(rev).cast("double") / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    category="core",
)
def q13_customer_distribution(spark, sf_dir):
    # TPC-H Q13 (customer order distribution): LEFT JOIN with an extra
    # join-side predicate (not a WHERE — it must preserve order-less
    # customers), double aggregation. COUNT(col) counts non-null only.
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM({_REV_CENTS_SQL}) AS DOUBLE) / 10000.0 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    category="core",
)
def q15_top_supplier(spark, sf_dir):
    # TPC-H Q15 (top supplier): CTE revenue view + scalar-subquery max.
    # The max is exact (double derived from a bigint-cents sum), so the
    # equality predicate is engine-deterministic.
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    totals = li.groupBy("l_suppkey").agg(
        (F.sum(rev).cast("double") / F.lit(10000.0)).alias("total_revenue")
    )
    mx = totals.agg(F.max("total_revenue").alias("m"))
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(totals, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.2 * pq.avg_qty
    """,
    category="core",
)
def q17_small_quantity_revenue(spark, sf_dir):
    # TPC-H Q17 (small-quantity-order revenue): correlated per-part average
    # as a join against a pre-aggregated frame. Quantities are
    # integer-valued doubles, so AVG is an exact-int sum / count — the
    # 0.2×avg threshold is bit-identical across engines.
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pq_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / F.lit(100.0) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH thresh AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT a FROM thresh)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    category="core",
)
def q22_global_sales_opportunity(spark, sf_dir):
    # TPC-H Q22 (global sales opportunity): scalar-subquery threshold +
    # anti-join. Every customer has SOME order in this corpus, so the
    # NOT EXISTS carries Q22's "never ordered" role against urgent orders.
    # The average threshold is computed from exact bigint cents (integer
    # sums are order-independent), so the > comparison cannot flip between
    # engines.
    c = t(spark, sf_dir, "customer")
    thresh = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(cents("c_acctbal")).cast("double") / F.lit(100.0) / F.count("*")
            ).alias("a")
        )
    )
    urgent = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(F.broadcast(thresh), F.col("c_acctbal") > F.col("a"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(cents("c_acctbal")).cast("double") / F.lit(100.0)).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    category="core",
)
def q21_waiting_supplier(spark, sf_dir):
    # TPC-H Q21 shape (suppliers solely responsible for returns on
    # multi-supplier F orders): EXISTS and NOT EXISTS correlated on the
    # SAME fact table become a left-semi and a left-anti join with
    # composite (equi + inequality) conditions — the equi part shuffles,
    # the inequality evaluates post-match, never a cartesian.
    li = t(spark, sf_dir, "lineitem")
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("k1"),
            F.col("l_suppkey").alias("sk1"),
        )
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    base = (
        l1.join(
            l2,
            (F.col("k1") == F.col("k2")) & (F.col("sk1") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k1") == F.col("k3")) & (F.col("sk1") != F.col("sk3")),
            "left_anti",
        )
        .join(o, F.col("k1") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("sk1") == F.col("s_suppkey"))
    )
    return (
        base.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
             - CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
               * CAST(ROUND(l.l_quantity) AS BIGINT) * 60
           ) AS DOUBLE) / 10000.0 AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    category="core",
)
def q9_product_profit(spark, sf_dir):
    # TPC-H Q9 shape (product-type profit by nation and year): computed
    # profit measure over a 5-way join with a LIKE part filter.  The
    # testdata has no partsupp, so supply cost is modeled as 60% of
    # p_retailprice — the shape (revenue minus quantity-scaled cost, all in
    # one bigint-cents sum) is what Q9 exercises.
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    profit_c = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    ) - cents("p_retailprice") * F.round("l_quantity").cast("bigint") * F.lit(60)
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(profit_c).cast("double") / F.lit(10000.0)).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                 * CAST(ROUND(l.l_quantity) AS BIGINT)) AS value_c
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_1' OR n.n_name = 'GERMANY'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(value_c AS DOUBLE) / 100.0 AS total_value
    FROM val
    WHERE CAST(value_c AS DOUBLE) > (SELECT 0.001 * CAST(SUM(value_c) AS DOUBLE) FROM val)
    ORDER BY total_value DESC, l_partkey
    """,
    category="core",
)
def q11_important_stock(spark, sf_dir):
    # TPC-H Q11 shape (important stock): per-part value for one nation's
    # suppliers, kept only when above a fraction of the grand total — a
    # grouped aggregate filtered against a scalar subquery over ITSELF.
    # Exact bigint-cents values keep the > comparison engine-deterministic.
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").where(
        (F.col("n_name") == "NATION_1") | (F.col("n_name") == "GERMANY")
    )
    val = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                cents("l_extendedprice") * F.round("l_quantity").cast("bigint")
            ).alias("value_c")
        )
    )
    thresh = val.agg((F.lit(0.001) * F.sum("value_c").cast("double")).alias("thr"))
    return (
        val.join(F.broadcast(thresh), F.col("value_c").cast("double") > F.col("thr"))
        .select(
            "l_partkey",
            (F.col("value_c").cast("double") / F.lit(100.0)).alias("total_value"),
        )
        .orderBy(F.col("total_value").desc(), "l_partkey")
    )


@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    category="core",
)
def q16_supplier_part_count(spark, sf_dir):
    # TPC-H Q16 shape (parts/supplier relationship): COUNT DISTINCT
    # suppliers per (brand, type, size) with negated predicates and a
    # NOT IN supplier-exclusion subquery (left-anti join).
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 1000.0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("bad_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_part_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
    ),
    part_total AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT sh.l_suppkey
      FROM shipped sh
      JOIN part_total pt ON pt.l_partkey = sh.l_partkey
      JOIN part p ON p.p_partkey = sh.l_partkey
      WHERE p.p_name LIKE '%bolt%'
        AND CAST(sh.qty AS DOUBLE) > 0.5 * CAST(pt.total_qty AS DOUBLE)
    )
    ORDER BY s_name
    """,
    category="core",
)
def q20_part_promotion(spark, sf_dir):
    # TPC-H Q20 shape (potential part promotion): nested IN over a
    # grouped-having derived table — suppliers who shipped more than half
    # of a bolt part's yearly volume. Integer quantity sums keep the 0.5×
    # threshold exact on both engines; the IN becomes a left-semi join.
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.round("l_quantity").cast("bigint")).alias("qty")
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    dominant = (
        shipped.join(part_total, F.col("pt_partkey") == F.col("l_partkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(F.col("qty").cast("double") > F.lit(0.5) * F.col("total_qty").cast("double"))
        .select(F.col("l_suppkey").alias("dom_suppkey"))
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(dominant, F.col("s_suppkey") == F.col("dom_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
