"""Relational operator coverage: scans, filters, joins, aggregates, sets.

Maps SURVEY.md §2.1-§2.4, §2.6, §2.7 onto the driver's TPC-H-ish tables.
Each query's docstring cites the reference pattern it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._util import davg, dec, dsum, tbl

# ---------------------------------------------------------------------------
# q01 — flagship: grouped aggregate battery (SUM/AVG/COUNT over expressions).
# Reference patterns: A2-A4, A8 (TableHealthCount.sql:13-36 uses the same
# SUM/MIN/MAX/AVG/COUNT battery; expression aggregates like
# `SUM(page_count * 8)` at TempdbConsumption.sql:4).  Also carries the
# statistical-aggregate family STDEV/STDEVP/VAR/VARP
# (white-papers/...md:511-514) so that family keeps an exemplar inside the
# driver's 50-query correctness window; the dedicated q34 battery stays
# registered for depth.  Rounded to 6 dp: float accumulation order differs
# across engines.
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
           * CAST((1 - CAST(l_discount AS DECIMAL(18,4)))
                  * (1 + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(18,8)))
       AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order,
  ROUND(STDDEV_SAMP(l_quantity), 6) AS qty_stdev,
  ROUND(STDDEV_POP(l_quantity), 6) AS qty_stdevp,
  ROUND(VAR_SAMP(l_quantity), 6) AS qty_var,
  ROUND(VAR_POP(l_quantity), 6) AS qty_varp
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    disc_factor = 1 - dec("l_discount")
    charge_factor = (disc_factor * (1 + dec("l_tax"))).cast("decimal(18,8)")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(dec("l_extendedprice") * disc_factor).cast("double").alias("sum_disc_price"),
            F.sum(dec("l_extendedprice") * charge_factor).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stdev"),
            F.round(F.stddev_pop("l_quantity"), 6).alias("qty_stdevp"),
            F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
            F.round(F.var_pop("l_quantity"), 6).alias("qty_varp"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — TOP-k with ORDER BY (O1/O3: `SELECT TOP 1 ... ORDER BY run_id DESC`,
# LatestBackup.sql:2-10, generalized to top-10 with a unique tiebreaker).
# ---------------------------------------------------------------------------


@query(
    "q02_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q02_topk_orders(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q03 — multi-way inner equi-join + group + top-k (J1; star-join pattern of
# the WWI schema, SURVEY §1.1; revenue-rank pattern white-papers/...md:189-197).
# ---------------------------------------------------------------------------


@query(
    "q03_shipping_priority",
    oracle="""
SELECT
  l.l_orderkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
  o.o_orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 20
""",
)
def q03_shipping_priority(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    # customer is a REPLICATE-class dim (SURVEY J13) — broadcast explicitly.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")), o.o_custkey == c.c_custkey)
        .filter(
            (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15")))
            & (F.col("l_shipdate") > F.to_timestamp(F.lit("1995-03-15")))
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q04 — EXISTS semi-join (J10: white-papers/...md:405-408 `where exists
# (select ... where r11.store_nbr = a11.store_nbr)`).
# ---------------------------------------------------------------------------


@query(
    "q04_order_priority_semi",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
  )
GROUP BY o_orderpriority
""",
)
def q04_order_priority_semi(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01")))
        )
        .join(
            li.filter(F.col("l_discount") > 0.05),
            o.o_orderkey == li.l_orderkey,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q05 — 6-table star join with residual predicate (J1-J3, J13; the WWI
# fact-to-many-dims shape; co-located-join discussion white-papers/...md:42-51).
# ---------------------------------------------------------------------------


@query(
    "q05_local_supplier_volume",
    oracle="""
SELECT
  n.n_name,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def q05_local_supplier_volume(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    return (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q03+q05 — combined J1/J13 star-join battery (same family, one driver
# slot): q03's 3-table broadcast star with top-k and q05's 6-table
# replicated-dim star, tagged and unioned.  Frees a driver-window slot for
# a round-4 flagship (d12/q60) while both exemplars stay value-checked.
# ---------------------------------------------------------------------------


@query(
    "q03_q05_star_battery",
    oracle="""
SELECT * FROM (
  SELECT 'shipping_priority' AS mode,
         CAST(l.l_orderkey AS VARCHAR) AS key,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
         CAST(o.o_orderdate AS VARCHAR) AS orderdate,
         o.o_orderpriority AS orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-03-15'
    AND l.l_shipdate > TIMESTAMP '1995-03-15'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
  ORDER BY revenue DESC, l.l_orderkey
  LIMIT 20
)
UNION ALL
SELECT 'supplier_volume' AS mode,
       n.n_name AS key,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
       CAST(NULL AS VARCHAR) AS orderdate,
       CAST(NULL AS VARCHAR) AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def q03_q05_star_battery(spark, sf_dir):
    a = q03_shipping_priority(spark, sf_dir).select(
        F.lit("shipping_priority").alias("mode"),
        F.col("l_orderkey").cast("string").alias("key"),
        "revenue",
        F.col("o_orderdate").cast("string").alias("orderdate"),
        F.col("o_orderpriority").alias("orderpriority"),
    )
    b = q05_local_supplier_volume(spark, sf_dir).select(
        F.lit("supplier_volume").alias("mode"),
        F.col("n_name").alias("key"),
        "revenue",
        F.lit(None).cast("string").alias("orderdate"),
        F.lit(None).cast("string").alias("orderpriority"),
    )
    return a.unionByName(b)


# ---------------------------------------------------------------------------
# q06 — range-filter global aggregate (A1 ungrouped aggregate,
# UserActivities.sql:6-8; compound predicates P8).
# ---------------------------------------------------------------------------


@query(
    "q06_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
              * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
""",
)
def q06_forecast_revenue(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 25)
        ).agg(
            F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — DISTINCT (O4: `SELECT DISTINCT pr.request_id ...`,
# query_memory_usage.sql:22-32).
# ---------------------------------------------------------------------------


@query(
    "q07_distinct_pairs",
    oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""",
)
def q07_distinct_pairs(spark, sf_dir):
    return tbl(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# ---------------------------------------------------------------------------
# q08 — UNION ALL (U1: three-block storage report StorageSize.sql:100,199).
# ---------------------------------------------------------------------------


@query(
    "q08_union_all_accounts",
    oracle="""
SELECT side, nationkey, COUNT(*) AS n,
       CAST(SUM(CAST(acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
FROM (
  SELECT 'customer' AS side, c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier' AS side, s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
)
GROUP BY side, nationkey
""",
)
def q08_union_all_accounts(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = tbl(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return (
        c.unionByName(s)
        .groupBy("side", "nationkey")
        .agg(F.count(F.lit(1)).alias("n"), dsum("acctbal", "total_bal"))
    )


# ---------------------------------------------------------------------------
# q09 — INTERSECT (U2: white-papers/...md:445-455 customer-set intersection).
# ---------------------------------------------------------------------------


@query(
    "q09_intersect_customers",
    oracle="""
SELECT COUNT(*) AS n_both FROM (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                                 AND o_orderdate < TIMESTAMP '1996-01-01'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                                 AND o_orderdate < TIMESTAMP '1997-01-01'
)
""",
)
def q09_intersect_customers(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    y95 = o.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-01-01")))
    ).select("o_custkey")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    ).select("o_custkey")
    return y95.intersect(y96).agg(F.count(F.lit(1)).alias("n_both"))


# ---------------------------------------------------------------------------
# q10 — EXCEPT (U3: white-papers/...md:437).
# ---------------------------------------------------------------------------


@query(
    "q10_except_customers",
    oracle="""
SELECT COUNT(*) AS n_only_95 FROM (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                                 AND o_orderdate < TIMESTAMP '1996-01-01'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                                 AND o_orderdate < TIMESTAMP '1997-01-01'
)
""",
)
def q10_except_customers(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    y95 = o.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-01-01")))
    ).select("o_custkey")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    ).select("o_custkey")
    # SQL EXCEPT is set difference — Spark's subtract() (EXCEPT DISTINCT)
    return y95.subtract(y96).agg(F.count(F.lit(1)).alias("n_only_95"))


# ---------------------------------------------------------------------------
# q11 — LEFT OUTER JOIN + IS NULL probing (J4 vw_table_sizes.sql:50-51;
# P7 sp_create_statistics.sql:56 `l.[object_id] IS NULL`).
# ---------------------------------------------------------------------------


@query(
    "q11_customers_without_orders",
    oracle="""
SELECT c.c_mktsegment, COUNT(*) AS n_customers
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
WHERE o.o_orderkey IS NULL
GROUP BY c.c_mktsegment
""",
)
def q11_customers_without_orders(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# q12 — RIGHT OUTER JOIN (J5: vw_sql_requests.sql:21-22 `sys.pdw_distributions
# d RIGHT JOIN sys.dm_pdw_sql_requests sr`).
# ---------------------------------------------------------------------------


@query(
    "q12_right_join_nations",
    oracle="""
SELECT n.n_name, COUNT(c.c_custkey) AS n_customers
FROM customer c
RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q12_right_join_nations(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# q13 — FULL OUTER JOIN (J6: white-papers/...md:261 declares support).
# ---------------------------------------------------------------------------


@query(
    "q13_full_outer_balance",
    oracle="""
SELECT COALESCE(cs.nk, ss.nk) AS nationkey,
       COALESCE(cs.n_cust, 0) AS n_cust,
       COALESCE(ss.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) cs
FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) ss
ON cs.nk = ss.nk
""",
)
def q13_full_outer_balance(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    s = tbl(spark, sf_dir, "supplier")
    cs = (
        c.filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    ss = (
        s.filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cs.join(ss, cs.nk == ss.nk, "full_outer").select(
        F.coalesce(cs.nk, ss.nk).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# q14 — cross join of 1-row derived tables (J9: UserActivities.sql:3-31
# scalar-assembly `FROM (...) A, (...) B, (...) C`).
# ---------------------------------------------------------------------------


@query(
    "q14_cross_scalar_assembly",
    oracle="""
SELECT a.n_customers, b.n_orders, c.n_lineitems
FROM (SELECT COUNT(*) AS n_customers FROM customer) a,
     (SELECT COUNT(*) AS n_orders FROM orders) b,
     (SELECT COUNT(*) AS n_lineitems FROM lineitem) c
""",
)
def q14_cross_scalar_assembly(spark, sf_dir):
    a = tbl(spark, sf_dir, "customer").agg(F.count(F.lit(1)).alias("n_customers"))
    b = tbl(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("n_orders"))
    c = tbl(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_lineitems"))
    return a.crossJoin(b).crossJoin(c)


# ---------------------------------------------------------------------------
# q15 — self join (J8: MemoryConsumption.sql:24-35 os_performance_counters
# pc1 JOIN ... pc2; pairs within the same group).
# ---------------------------------------------------------------------------


@query(
    "q15_self_join_pairs",
    oracle="""
SELECT l1.l_orderkey AS orderkey, COUNT(*) AS n_pairs
FROM lineitem l1
JOIN lineitem l2
  ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
WHERE l1.l_quantity > 45 AND l2.l_quantity > 45
GROUP BY l1.l_orderkey
""",
)
def q15_self_join_pairs(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_linenumber") < F.col("l2.l_linenumber")),
        )
        .groupBy(F.col("l1.l_orderkey").alias("orderkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# q16 — anti join (J11: `AND NOT <metric_qualification>` white-papers/...md:384;
# NOT IN subquery).
# ---------------------------------------------------------------------------


@query(
    "q16_parts_never_shipped",
    oracle="""
SELECT p.p_brand, COUNT(*) AS n_parts
FROM part p
WHERE p.p_partkey NOT IN (SELECT l_partkey FROM lineitem)
GROUP BY p.p_brand
""",
)
def q16_parts_never_shipped(spark, sf_dir):
    p = tbl(spark, sf_dir, "part")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# q17 — IN-subquery semi join (J12: vw_tables_with_skew.sql:9-20
# `WHERE two_part_name IN (SELECT ... GROUP BY ... HAVING ...)`).
# ---------------------------------------------------------------------------


@query(
    "q17_brands_of_hot_parts",
    oracle="""
SELECT p.p_brand, COUNT(*) AS n_parts
FROM part p
WHERE p.p_partkey IN (
  SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 5
)
GROUP BY p.p_brand
""",
)
def q17_brands_of_hot_parts(spark, sf_dir):
    p = tbl(spark, sf_dir, "part")
    li = tbl(spark, sf_dir, "lineitem")
    hot = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") >= 5)
    return (
        p.join(hot, p.p_partkey == hot.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# q04+q17 battery — the two semi-join families in ONE driver slot (round-6
# rotation): J10 EXISTS semi (q04) + J12 IN-subquery semi (q17), both
# planned as LeftSemi.  Results align on a (family, k, n) shape; the
# standalone exemplars stay registered post-window with their own oracles.
# ---------------------------------------------------------------------------


@query(
    "q04_q17_semi_battery",
    oracle="""
SELECT 'q04_exists_semi' AS family, o_orderpriority AS k, COUNT(*) AS n
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
  )
GROUP BY 2
UNION ALL
SELECT 'q17_in_semi' AS family, p.p_brand AS k, COUNT(*) AS n
FROM part p
WHERE p.p_partkey IN (
  SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 5
)
GROUP BY 2
""",
)
def q04_q17_semi_battery(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part")
    exists_semi = (
        o.filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01")))
        )
        .join(
            li.filter(F.col("l_discount") > 0.05),
            o.o_orderkey == li.l_orderkey,
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("q04_exists_semi").alias("family"), "k", "n")
    )
    hot = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )
    in_semi = (
        p.join(hot, p.p_partkey == hot.l_partkey, "left_semi")
        .groupBy(F.col("p_brand").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("q17_in_semi").alias("family"), "k", "n")
    )
    return exists_semi.unionByName(in_semi)


# ---------------------------------------------------------------------------
# q18 — two-level aggregation + HAVING ratio: the skew% formula (A9, A11:
# ImpactedTables cmp_details/cmp_summary CTEs; vw_tables_with_skew.sql:19
# `HAVING MIN(row_count*1.000)/MAX(row_count*1.000) > .10`).
# The 60-way hash distribution is modelled as pmod(key, 60) — the reference's
# fixed distribution count (white-papers/...md:37).
# ---------------------------------------------------------------------------


@query(
    "q18_distribution_skew",
    oracle="""
WITH dist AS (
  SELECT l_suppkey % 60 AS distribution_id, COUNT(*) AS row_count
  FROM lineitem
  GROUP BY l_suppkey % 60
)
SELECT
  MIN(row_count) AS min_rows,
  MAX(row_count) AS max_rows,
  CAST(SUM(row_count) AS BIGINT) AS total_rows,
  CAST(ROUND((MAX(row_count) - MIN(row_count)) * 100.0
             / NULLIF(SUM(row_count), 0), 6) AS DOUBLE) AS skew_pct
FROM dist
""",
)
def q18_distribution_skew(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    dist = li.groupBy(
        F.pmod(F.col("l_suppkey"), F.lit(60)).alias("distribution_id")
    ).agg(F.count(F.lit(1)).alias("row_count"))
    return dist.agg(
        F.min("row_count").alias("min_rows"),
        F.max("row_count").alias("max_rows"),
        F.sum("row_count").alias("total_rows"),
        F.round(
            (F.max("row_count") - F.min("row_count"))
            * 100.0
            / F.nullif(F.sum("row_count"), F.lit(0)),
            6,
        )
        .cast("double")
        .alias("skew_pct"),
    )


# ---------------------------------------------------------------------------
# q19 — conditional aggregation / pivot-by-CASE (A7: SlotUsage.sql:3-6
# `SUM(CASE WHEN r.status='Running' THEN 1 ELSE 0 END)`; 20-branch variant
# TableHealthCount.sql:16-36).
# ---------------------------------------------------------------------------


@query(
    "q19_status_pivot",
    oracle="""
SELECT
  o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_other
FROM orders
GROUP BY o_orderpriority
""",
)
def q19_status_pivot(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")

    def flag(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    st = F.col("o_orderstatus")
    return o.groupBy("o_orderpriority").agg(
        flag(st == "F").alias("n_f"),
        flag(st == "O").alias("n_o"),
        flag(st == "P").alias("n_p"),
        flag(~st.isin("F", "O", "P")).alias("n_other"),
    )


# ---------------------------------------------------------------------------
# q20 — aggregates over expressions with ISNULL/NULLIF wrappers (A8, A12:
# MemoryGrant.sql:16-18 `ISNULL(SUM(CAST(column_count AS BIGINT)),0)`;
# TempdbConsumption.sql:4 `SUM(... * 8)`).
# ---------------------------------------------------------------------------


@query(
    "q20_expression_aggregates",
    oracle="""
SELECT
  l_returnflag,
  CAST(COALESCE(SUM(CAST(l_quantity * 8 AS BIGINT)), 0) AS BIGINT) AS pages8,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * l_quantity) AS DOUBLE) AS gross,
  CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
       / NULLIF(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 0), 6) AS DOUBLE) AS price_per_unit
FROM lineitem
GROUP BY l_returnflag
""",
)
def q20_expression_aggregates(spark, sf_dir):
    # spread=False: ``gross`` sums a DOUBLE product (dec × quantity), so
    # its low bits depend on the aggregation fold order — the scan spread
    # would change the partitioning and drift the last decimal digit off
    # the oracle (caught by the forced-spread driver_sim run, r12).
    li = tbl(spark, sf_dir, "lineitem", spread=False)
    return li.groupBy("l_returnflag").agg(
        F.coalesce(F.sum((F.col("l_quantity") * 8).cast("bigint")), F.lit(0)).alias("pages8"),
        F.sum(dec("l_extendedprice") * F.col("l_quantity")).cast("double").alias("gross"),
        F.round(
            F.sum(dec("l_extendedprice")).cast("double")
            / F.nullif(F.sum(dec("l_quantity")).cast("double"), F.lit(0.0)),
            6,
        )
        .cast("double")
        .alias("price_per_unit"),
    )


# ---------------------------------------------------------------------------
# q21 — COUNT(DISTINCT) multi (A5: vw_table_space_summary.sql:12
# `COUNT(distinct partition_nmbr)`; TableHealthCount.sql:14).
# ---------------------------------------------------------------------------


@query(
    "q21_count_distinct",
    oracle="""
SELECT
  l_returnflag,
  COUNT(DISTINCT l_suppkey) AS n_suppliers,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def q21_count_distinct(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# q22 — nested aggregation: aggregates of aggregates via derived tables
# (A10: MemoryGrant.sql:6-55 inner GROUP BY feeding outer GROUP BY).
# ---------------------------------------------------------------------------


@query(
    "q22_nested_aggregation",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT
  n_orders,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(spend AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
FROM per_cust
GROUP BY n_orders
""",
)
def q22_nested_aggregation(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "spend"),
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("spend", "total_spend"),
    )


# ---------------------------------------------------------------------------
# q23 — scalar-subquery comparison (P10-adjacent: filter against an
# aggregate computed over the whole table; MicroStrategy metric-qualification
# pattern white-papers/...md:379-413).
# ---------------------------------------------------------------------------


@query(
    "q23_above_average_customers",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT COUNT(*) AS n_above
FROM per_cust
WHERE spend > 2 * (SELECT CAST(SUM(CAST(spend AS DECIMAL(18,4))) AS DOUBLE) / COUNT(spend) FROM per_cust)
""",
)
def q23_above_average_customers(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(dsum("o_totalprice", "spend"))
    avg_spend = per_cust.agg(davg("spend", "avg_spend"))
    return (
        per_cust.crossJoin(F.broadcast(avg_spend))
        .filter(F.col("spend") > 2 * F.col("avg_spend"))
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


# ---------------------------------------------------------------------------
# q24 — ROLLUP (not in the reference's own surface — MicroStrategy emulates
# via multi-pass SQL, white-papers/...md:222-231 — but free in Spark; SURVEY
# §2.4 note).
# ---------------------------------------------------------------------------


@query(
    "q24_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q24_rollup(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty")
    )


# ---------------------------------------------------------------------------
# q43 — UNION with dedup (U4: "UNION statements within derived tables",
# white-papers/...md:309).
# ---------------------------------------------------------------------------


@query(
    "q43_union_dedup",
    oracle="""
SELECT nation_key FROM (
  SELECT c_nationkey AS nation_key FROM customer WHERE c_acctbal > 5000
  UNION
  SELECT s_nationkey AS nation_key FROM supplier WHERE s_acctbal > 5000
)
""",
)
def q43_union_dedup(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select(
        F.col("c_nationkey").alias("nation_key")
    )
    s = tbl(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000).select(
        F.col("s_nationkey").alias("nation_key")
    )
    return c.unionByName(s).distinct()


# ---------------------------------------------------------------------------
# q44 — composite-key equi-join to a derived table (J2: 3-col key joins like
# `nt.object_id = nps.object_id AND nt.pdw_node_id = nps.pdw_node_id AND
# nt.distribution_id = nps.distribution_id`, vw_table_sizes.sql:46-48;
# J7: join-to-subquery, vw_table_sizes.sql:49).
# ---------------------------------------------------------------------------


@query(
    "q44_composite_key_join",
    oracle="""
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         COUNT(*) AS n_lines,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS supp_total
  FROM lineitem GROUP BY l_orderkey, l_suppkey
)
SELECT l.l_orderkey, l.l_suppkey, l.l_linenumber, p.n_lines, p.supp_total
FROM lineitem l
JOIN per_supp p
  ON l.l_orderkey = p.l_orderkey AND l.l_suppkey = p.l_suppkey
WHERE p.n_lines >= 2 AND l.l_linenumber = 1
""",
)
def q44_composite_key_join(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"), dsum("l_extendedprice", "supp_total")
    )
    return (
        li.join(per_supp, ["l_orderkey", "l_suppkey"])
        .filter((F.col("n_lines") >= 2) & (F.col("l_linenumber") == 1))
        .select("l_orderkey", "l_suppkey", "l_linenumber", "n_lines", "supp_total")
    )


# ---------------------------------------------------------------------------
# q46 — CUBE grouping sets (SURVEY §2.4 note: absent from the reference's own
# surface — MicroStrategy emulates via multi-pass SQL, white-papers/
# ...md:222-231 — exposed because Spark gives it for free).
# ---------------------------------------------------------------------------


@query(
    "q46_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q46_cube(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total")
    )


# ---------------------------------------------------------------------------
# q47 — LIKE / NOT LIKE pattern filters (P6: `[label] LIKE '%MSTR%'`,
# white-papers/...md:137; `obj.name not like '%_Backup%'`,
# AddTableChanges.sql:9-12) + NOT IN list (P5).
# ---------------------------------------------------------------------------


@query(
    "q47_like_patterns",
    oracle="""
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM part
WHERE p_type LIKE '%BRASS%'
  AND p_name NOT LIKE '%green%'
  AND p_brand NOT IN ('Brand#11', 'Brand#22')
GROUP BY p_brand
""",
)
def q47_like_patterns(spark, sf_dir):
    p = tbl(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_type").like("%BRASS%")
            & ~F.col("p_name").like("%green%")
            & ~F.col("p_brand").isin("Brand#11", "Brand#22")
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice", "total_price"),
        )
    )


# ---------------------------------------------------------------------------
# q49/q50 — multiset set operators (U2/U3 ALL-variants: "Set Operator
# Optimization ... (UNION, INTERSECT, EXCEPT)", white-papers/...md:437;
# Spark exposes both distinct and ALL forms).
# ---------------------------------------------------------------------------


@query(
    "q49_intersect_all",
    oracle="""
SELECT c_nationkey FROM customer WHERE c_acctbal > 7000
INTERSECT ALL
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
""",
)
def q49_intersect_all(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 7000).select("c_nationkey")
    seg = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    return rich.intersectAll(seg)


@query(
    "q50_except_all",
    oracle="""
SELECT c_nationkey FROM customer WHERE c_acctbal > 7000
EXCEPT ALL
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
""",
)
def q50_except_all(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 7000).select("c_nationkey")
    seg = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    return rich.exceptAll(seg)


# ---------------------------------------------------------------------------
# q53 — combined INTERSECT ALL + EXCEPT ALL battery (U2/U3, same citations
# as q49/q50: "Set Operator Optimization ... (UNION, INTERSECT, EXCEPT)",
# white-papers/...md:437).  One driver slot proves both ALL-variant set
# operators; the standalone q49/q50 stay registered post-window.
# ---------------------------------------------------------------------------


@query(
    "q53_setop_all_battery",
    oracle="""
SELECT 'intersect' AS op, c_nationkey FROM (
  SELECT c_nationkey FROM customer WHERE c_acctbal > 7000
  INTERSECT ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT 'except' AS op, c_nationkey FROM (
  SELECT c_nationkey FROM customer WHERE c_acctbal > 7000
  EXCEPT ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
""",
)
def q53_setop_all_battery(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 7000).select("c_nationkey")
    seg = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    inter = rich.intersectAll(seg).select(
        F.lit("intersect").alias("op"), "c_nationkey"
    )
    exc = rich.exceptAll(seg).select(F.lit("except").alias("op"), "c_nationkey")
    return inter.unionByName(exc)


# ---------------------------------------------------------------------------
# q54 — combined RIGHT OUTER + FULL OUTER battery (J5/J6, same citations as
# q12/q13: vw_sql_requests.sql:21-22 RIGHT JOIN; white-papers/...md:261 FULL
# OUTER support).  The region filters give each full-outer side exclusive
# keys so both preserved-null directions are actually exercised.
# ---------------------------------------------------------------------------


@query(
    "q54_outer_join_battery",
    oracle="""
WITH cs AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_cust
  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
),
cn AS (
  SELECT n.n_nationkey AS nationkey, n.n_name,
         COALESCE(cs.n_cust, 0) AS n_cust
  FROM cs RIGHT JOIN nation n ON cs.nk = n.n_nationkey
  WHERE n.n_regionkey <= 2
),
sn AS (
  SELECT s.s_nationkey AS nationkey, COUNT(*) AS n_supp
  FROM supplier s JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE n2.n_regionkey >= 2 AND s.s_acctbal > 9000
  GROUP BY s.s_nationkey
)
SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
       cn.n_name,
       COALESCE(cn.n_cust, 0) AS n_cust,
       COALESCE(sn.n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
""",
)
def q54_outer_join_battery(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    cs = (
        c.filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    cn = (
        cs.join(n, cs.nk == n.n_nationkey, "right")
        .filter(F.col("n_regionkey") <= 2)
        .select(
            F.col("n_nationkey").alias("nationkey"),
            "n_name",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        )
    )
    sn = (
        s.join(n.alias("n2"), s.s_nationkey == F.col("n2.n_nationkey"))
        .filter((F.col("n2.n_regionkey") >= 2) & (F.col("s_acctbal") > 9000))
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    cn_a, sn_a = cn.alias("cn"), sn.alias("sn")
    return cn_a.join(
        sn_a, F.col("cn.nationkey") == F.col("sn.nationkey"), "full_outer"
    ).select(
        F.coalesce(F.col("cn.nationkey"), F.col("sn.nationkey")).alias("nationkey"),
        F.col("cn.n_name").alias("n_name"),
        F.coalesce(F.col("cn.n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("sn.n_supp"), F.lit(0)).alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# q55 — combined UNION ALL + UNION-dedup battery (U1/U4, same citations as
# q08/q43: StorageSize.sql:100,199 three-block UNION ALL; "UNION statements
# within derived tables", white-papers/...md:309).
# ---------------------------------------------------------------------------


@query(
    "q55_union_battery",
    oracle="""
SELECT 'union_all' AS mode, side, nationkey, COUNT(*) AS n,
       CAST(SUM(CAST(acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
FROM (
  SELECT 'customer' AS side, c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier' AS side, s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
)
GROUP BY side, nationkey
UNION ALL
SELECT 'union_dedup' AS mode, 'either' AS side, nation_key AS nationkey,
       CAST(1 AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS total_bal
FROM (
  SELECT c_nationkey AS nation_key FROM customer WHERE c_acctbal > 5000
  UNION
  SELECT s_nationkey AS nation_key FROM supplier WHERE s_acctbal > 5000
)
""",
)
def q55_union_battery(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    s = tbl(spark, sf_dir, "supplier")
    u_all = c.select(
        F.lit("customer").alias("side"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    ).unionByName(
        s.select(
            F.lit("supplier").alias("side"),
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_acctbal").alias("acctbal"),
        )
    )
    agg = (
        u_all.groupBy("side", "nationkey")
        .agg(F.count(F.lit(1)).alias("n"), dsum("acctbal", "total_bal"))
        .select(
            F.lit("union_all").alias("mode"), "side", "nationkey", "n", "total_bal"
        )
    )
    ded = (
        c.filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(
            s.filter(F.col("s_acctbal") > 5000)
            .select(F.col("s_nationkey").alias("nationkey"))
        )
        .distinct()
        .select(
            F.lit("union_dedup").alias("mode"),
            F.lit("either").alias("side"),
            "nationkey",
            F.lit(1).cast("long").alias("n"),
            F.lit(None).cast("double").alias("total_bal"),
        )
    )
    return agg.unionByName(ded)


# ---------------------------------------------------------------------------
# q53_q55 — the COMBINED set-operator battery (round-11 fold): U1 UNION ALL
# + U4 UNION (q55) and U2 INTERSECT ALL + U3 EXCEPT ALL (q53) in one driver
# slot — all four set operators behind one exact oracle.  The constituent
# batteries stay registered (and locally oracle-checked) post-window; this
# fold freed the seat s11_hybrid_rrf took (the rrf_fuse family's first
# driver row).  q53's two-column rows ride q55's five-column schema the
# same way q55's own dedup arm does (n=1, NULL total_bal).
# ---------------------------------------------------------------------------


def _q53_q55_oracle() -> str:
    from . import ORACLES

    return (
        ORACLES["q55_union_battery"]
        + """
UNION ALL
SELECT 'intersect' AS mode, 'either' AS side, c_nationkey AS nationkey,
       CAST(1 AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS total_bal
FROM (
  SELECT c_nationkey FROM customer WHERE c_acctbal > 7000
  INTERSECT ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT 'except' AS mode, 'either' AS side, c_nationkey AS nationkey,
       CAST(1 AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS total_bal
FROM (
  SELECT c_nationkey FROM customer WHERE c_acctbal > 7000
  EXCEPT ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""
    )


@query("q53_q55_setop_battery", oracle=_q53_q55_oracle())
def q53_q55_setop_battery(spark, sf_dir):
    setops = q53_setop_all_battery(spark, sf_dir).select(
        F.col("op").alias("mode"),
        F.lit("either").alias("side"),
        F.col("c_nationkey").alias("nationkey"),
        F.lit(1).cast("long").alias("n"),
        F.lit(None).cast("double").alias("total_bal"),
    )
    return q55_union_battery(spark, sf_dir).unionByName(setops)


# ---------------------------------------------------------------------------
# q51 — Date-dimension generation (dimension.date.sql: the WWI calendar
# dimension; DW engines materialize it rather than compute date parts per
# query).  Pure JVM: sequence + explode + date-part functions.
# ---------------------------------------------------------------------------


@query(
    "q51_date_dimension",
    oracle="""
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '2013-01-01', DATE '2014-12-31',
                                     INTERVAL 1 DAY)) AS DATE) AS date_key
)
SELECT date_key,
       EXTRACT(year FROM date_key) AS calendar_year,
       EXTRACT(quarter FROM date_key) AS calendar_quarter,
       EXTRACT(month FROM date_key) AS calendar_month,
       EXTRACT(day FROM date_key) AS day_of_month,
       EXTRACT(dow FROM date_key) + 1 AS day_of_week,
       CASE WHEN EXTRACT(dow FROM date_key) IN (0, 6) THEN TRUE ELSE FALSE END
         AS is_weekend,
       CAST(date_trunc('month', date_key) AS DATE) AS month_start,
       CAST(last_day(date_key) AS DATE) AS month_end
FROM days
""",
)
def q51_date_dimension(spark, sf_dir):
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2013-01-01").cast("date"),
                F.lit("2014-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("date_key")
    )
    return days.select(
        "date_key",
        F.year("date_key").cast("long").alias("calendar_year"),
        F.quarter("date_key").cast("long").alias("calendar_quarter"),
        F.month("date_key").cast("long").alias("calendar_month"),
        F.dayofmonth("date_key").cast("long").alias("day_of_month"),
        F.dayofweek("date_key").cast("long").alias("day_of_week"),
        F.dayofweek("date_key").isin(1, 7).alias("is_weekend"),
        F.trunc("date_key", "month").alias("month_start"),
        F.last_day("date_key").alias("month_end"),
    )


# ---------------------------------------------------------------------------
# q57 — GROUPING SETS with GROUPING() disambiguation: the explicit-sets
# member of the q24/q46 ROLLUP/CUBE family (multi-grain report in one
# pass — Spark plans one Expand over the scan, not one scan per grain).
# ---------------------------------------------------------------------------


@query(
    "q57_grouping_sets",
    oracle="""
SELECT n_name,
       CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS INT) AS order_year,
       CAST(GROUPING(n_name) AS INT) AS g_nation,
       CAST(GROUPING(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE))) AS INT)
         AS g_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS (
  (n_name, EXTRACT(YEAR FROM CAST(o_orderdate AS DATE))),
  (n_name),
  (EXTRACT(YEAR FROM CAST(o_orderdate AS DATE))),
  ()
)
""",
)
def q57_grouping_sets(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.year(F.col("o_orderdate").cast("date")).alias("order_year"),
            dec("o_totalprice").alias("price"),
        )
    )
    return joined.groupingSets(
        [["n_name", "order_year"], ["n_name"], ["order_year"], []],
        "n_name",
        "order_year",
    ).agg(
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.grouping("order_year").cast("int").alias("g_year"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q60 — SCD Type-2 dimension merge (operators/scd.py, SURVEY D17) with an
# exact end-to-end oracle.  A synthetic versioned customer dimension (one
# closed history row for every 7th key) receives a snapshot where every 5th
# key changed acctbal and every 11th key disappeared (close_missing=True).
# The oracle reconstructs every row class — history passthrough, unchanged,
# closed-at-as_of, reopened, new-version, missing-closed — in ANSI SQL.
# Timestamps are literal; acctbal+100 is exact double arithmetic, so hashes
# match bit-for-bit.
# ---------------------------------------------------------------------------


@query(
    "q60_scd2_dimension",
    oracle="""
WITH hist AS (
  SELECT c_custkey AS cust_id, c_name AS name, c_mktsegment AS segment,
         c_acctbal - 50.0 AS acctbal,
         TIMESTAMP '2022-01-01' AS valid_from,
         TIMESTAMP '2023-01-01' AS valid_to, FALSE AS is_current
  FROM customer WHERE c_custkey % 7 = 0
),
cur AS (
  SELECT c_custkey AS cust_id, c_name AS name, c_mktsegment AS segment,
         c_acctbal AS acctbal,
         TIMESTAMP '2023-01-01' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
  FROM customer
)
SELECT * FROM hist
UNION ALL
-- unchanged current rows (still in snapshot, attribute identical)
SELECT * FROM cur WHERE cust_id % 11 <> 0 AND cust_id % 5 <> 0
UNION ALL
-- changed keys: old version closed at the as-of instant
SELECT cust_id, name, segment, acctbal, valid_from,
       TIMESTAMP '2024-01-01', FALSE
FROM cur WHERE cust_id % 11 <> 0 AND cust_id % 5 = 0
UNION ALL
-- changed keys: new open version carrying the snapshot attribute
SELECT cust_id, name, segment, acctbal + 100.0,
       TIMESTAMP '2024-01-01', CAST(NULL AS TIMESTAMP), TRUE
FROM cur WHERE cust_id % 11 <> 0 AND cust_id % 5 = 0
UNION ALL
-- keys missing from the snapshot: closed (close_missing)
SELECT cust_id, name, segment, acctbal, valid_from,
       TIMESTAMP '2024-01-01', FALSE
FROM cur WHERE cust_id % 11 = 0
""",
)
def q60_scd2_dimension(spark, sf_dir):
    from ..operators.scd import scd2_apply

    c = tbl(spark, sf_dir, "customer")
    cur = c.select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
        F.to_timestamp(F.lit("2023-01-01")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    hist = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_acctbal") - F.lit(50.0)).alias("acctbal"),
        F.to_timestamp(F.lit("2022-01-01")).alias("valid_from"),
        F.to_timestamp(F.lit("2023-01-01")).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    dim = hist.unionByName(cur)
    snapshot = (
        c.filter(F.col("c_custkey") % 11 != 0)
        .select(
            F.col("c_custkey").alias("cust_id"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.when(
                F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + F.lit(100.0)
            ).otherwise(F.col("c_acctbal")).alias("acctbal"),
        )
    )
    return scd2_apply(
        dim, snapshot, "cust_id", as_of="2024-01-01 00:00:00", close_missing=True
    )


# ---------------------------------------------------------------------------
# q61 — TPC-H Q21 shape (multi-EXISTS + NOT-EXISTS over a self-joined fact):
# suppliers whose shipment was the LAST to ship inside a multi-supplier
# order ("kept the order waiting").  EXISTS → left_semi with a residual
# non-equi conjunct, NOT EXISTS → left_anti with a residual inequality —
# the J10/J11 building blocks composed the way the reference's samples
# compose them (samples/scripts/queries subquery patterns; SURVEY §2.3).
# ---------------------------------------------------------------------------


@query(
    "q61_waiting_suppliers",
    oracle="""
SELECT s.s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
""",
)
def q61_waiting_suppliers(spark, sf_dir):
    # r12 rewrite (guide §2.4/§3): the semi + anti self-joins carried the
    # lineitem fact THREE times — at bench scale the planner broadcast two
    # full lineitem projections; at 100 TB those become two extra
    # sort-merge self-shuffles.  Both subqueries only compare values
    # WITHIN an order, so they are window aggregates over ONE
    # l_orderkey exchange of a 3-column projection:
    #   EXISTS(l2: same order, other supp)      ⟺ n_supps(order) ≥ 2
    #   NOT EXISTS(l3: other supp, later ship)  ⟺ l_shipdate ≥ max
    #     shipdate of the order's OTHER suppliers, where that max is G1
    #     (the order's top per-supplier max) unless ONLY this row's
    #     supplier attains G1, in which case it is G2 (the best other
    #     supplier's max).
    # Equivalence is per-row (each l1 row keeps its own verdict), proven
    # against the unchanged EXISTS/NOT-EXISTS oracle.
    from pyspark.sql import Window

    # the explicit l_orderkey repartition pins the ONE exchange both
    # window keys share — without it the planner gives the w_supp window
    # its exact (l_orderkey, l_suppkey) key and then RE-exchanges for
    # w_ord (two shuffles of the fact).  (If a caller ever opts the scan
    # into the r13 spread — same key — CollapseRepartition folds the two
    # into one; the default unspread read keeps this as the plan's only
    # fact exchange.)
    li = (
        tbl(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition(F.col("l_orderkey"))
    )
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = tbl(spark, sf_dir, "supplier")
    w_ord = Window.partitionBy("l_orderkey")
    w_supp = Window.partitionBy("l_orderkey", "l_suppkey")
    # pass 1 (one exchange by l_orderkey; w_supp is a refinement, so the
    # same exchange feeds both windows): per-supplier max + marker row
    pass1 = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w_supp).alias("__g"),
        F.row_number()
        .over(w_supp.orderBy("l_shipdate"))
        .alias("__rn"),
    )
    # pass 2 (same partition key — no new exchange): order-level stats
    one_per_supp = F.when(F.col("__rn") == 1, 1).otherwise(0)
    pass2 = pass1.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        "__g",
        "__rn",
        F.sum(one_per_supp).over(w_ord).alias("__n_supp"),
        F.max("__g").over(w_ord).alias("__G1"),
    )
    # pass 3 (still the same partition key): suppliers attaining G1
    # (count marker rows whose group max is the order max) and G2 = best
    # group-max of the NON-attaining suppliers
    pass3 = pass2.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        "__g",
        "__n_supp",
        "__G1",
        F.sum(
            F.when(
                (F.col("__rn") == 1) & (F.col("__g") == F.col("__G1")), 1
            ).otherwise(0)
        )
        .over(w_ord)
        .alias("__c1"),
        F.max(F.when(F.col("__g") < F.col("__G1"), F.col("__g")))
        .over(w_ord)
        .alias("__G2"),
    )
    max_others = F.when(
        (F.col("__g") < F.col("__G1")) | (F.col("__c1") >= 2), F.col("__G1")
    ).otherwise(F.col("__G2"))
    waited = (
        pass3.filter(
            (F.col("__n_supp") >= 2) & (F.col("l_shipdate") >= max_others)
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
    )
    return (
        waited.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


# ---------------------------------------------------------------------------
# q62 — TPC-H Q2 shape (correlated MIN subquery): the cheapest supplier
# observed for each part, rewritten the Spark-idiomatic way — a groupBy-min
# derived table joined back on (partkey, min_price) instead of a per-row
# correlated scan.
# ---------------------------------------------------------------------------


@query(
    "q62_cheapest_supplier_per_part",
    oracle="""
WITH offer AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice) AS best_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, p.p_name, s.s_name, o.best_price
FROM offer o
JOIN part p ON p.p_partkey = o.l_partkey
JOIN supplier s ON s.s_suppkey = o.l_suppkey
WHERE o.best_price = (SELECT MIN(best_price) FROM offer o2
                      WHERE o2.l_partkey = o.l_partkey)
  AND p.p_size >= 40
ORDER BY o.best_price, p.p_partkey, s.s_name
""",
)
def q62_cheapest_supplier_per_part(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    s = tbl(spark, sf_dir, "supplier")
    offer = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("best_price")
    )
    # correlated (SELECT MIN.. WHERE partkey=o.partkey) -> one more partial
    # agg on the SAME l_partkey key + equi-join back: no per-row rescan,
    # and the second agg rides the first one's partitioning
    floor_ = offer.groupBy("l_partkey").agg(
        F.min("best_price").alias("floor_price")
    )
    return (
        offer.join(
            floor_,
            (offer.l_partkey == floor_.l_partkey)
            & (offer.best_price == floor_.floor_price),
        )
        .drop(floor_.l_partkey)
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "best_price")
        .orderBy("best_price", "p_partkey", "s_name")
    )


# ---------------------------------------------------------------------------
# q63 — TPC-H Q20 shape (nested IN with an aggregate threshold): suppliers
# who shipped more than half of a brand-filtered part's total quantity —
# IN(parts) prunes before aggregation, the HAVING-style threshold joins an
# agg-of-agg back on the part key.
# ---------------------------------------------------------------------------


@query(
    "q63_dominant_suppliers",
    oracle="""
WITH brand_parts AS (
  SELECT p_partkey FROM part WHERE p_brand = 'BRAND#1'
),
shipped AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM brand_parts)
  GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey, CAST(SUM(CAST(qty AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM shipped GROUP BY l_partkey
)
SELECT s.s_name, sh.l_partkey AS p_partkey, sh.qty, t.total_qty
FROM shipped sh
JOIN tot t ON t.l_partkey = sh.l_partkey
JOIN supplier s ON s.s_suppkey = sh.l_suppkey
WHERE sh.qty > 0.5 * t.total_qty
ORDER BY s.s_name, p_partkey
""",
)
def q63_dominant_suppliers(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_brand") == "BRAND#1")
    s = tbl(spark, sf_dir, "supplier")
    # IN-subquery -> broadcast semi-join BEFORE the aggregate, so the big
    # fact is pruned at the scan and the shuffle carries brand parts only
    shipped = (
        li.join(F.broadcast(p.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "qty"))
    )
    tot = shipped.groupBy("l_partkey").agg(dsum("qty", "total_qty"))
    return (
        shipped.join(tot, "l_partkey")
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", F.col("l_partkey").alias("p_partkey"), "qty", "total_qty")
        .orderBy("s_name", "p_partkey")
    )


# ---------------------------------------------------------------------------
# q07+q15 battery — round-7 rotation: DISTINCT projection (O4,
# query_memory_usage.sql:22-32) and self-join pairs (J8,
# MemoryConsumption.sql:24-35) in ONE driver slot.  Results align on a
# (family, k, n) shape; the standalone exemplars stay registered
# post-window with their own oracles.
# ---------------------------------------------------------------------------


@query(
    "q07_q15_pairs_battery",
    oracle="""
SELECT 'q07_distinct' AS family,
       o_orderstatus || '|' || o_orderpriority AS k,
       CAST(1 AS BIGINT) AS n
FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
UNION ALL
SELECT 'q15_self_join' AS family,
       CAST(l1.l_orderkey AS VARCHAR) AS k,
       COUNT(*) AS n
FROM lineitem l1
JOIN lineitem l2
  ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
WHERE l1.l_quantity > 45 AND l2.l_quantity > 45
GROUP BY 2
""",
)
def q07_q15_pairs_battery(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    distinct_part = (
        o.select("o_orderstatus", "o_orderpriority")
        .distinct()
        .select(
            F.lit("q07_distinct").alias("family"),
            F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("k"),
            F.lit(1).cast("long").alias("n"),
        )
    )
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    l1, l2 = li.alias("l1"), li.alias("l2")
    pairs_part = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_linenumber") < F.col("l2.l_linenumber")),
        )
        .groupBy(F.col("l1.l_orderkey").cast("string").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("q15_self_join").alias("family"), "k", "n")
    )
    return distinct_part.unionByName(pairs_part)


# ---------------------------------------------------------------------------
# q11+q54 battery — round-7 rotation: LEFT-OUTER + IS NULL probing (J4/P7,
# vw_table_sizes.sql:50-51, sp_create_statistics.sql:56) and the RIGHT/FULL
# OUTER pair (J5/J6, vw_sql_requests.sql:21-22, white-papers/...md:261) in
# ONE driver slot.  The q54 branch keeps the region filters that give each
# full-outer side exclusive keys so both preserved-null directions fire.
# ---------------------------------------------------------------------------


@query(
    "q11_q54_outer_battery",
    oracle="""
WITH cs AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_cust
  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
),
cn AS (
  SELECT n.n_nationkey AS nationkey, n.n_name,
         COALESCE(cs.n_cust, 0) AS n_cust
  FROM cs RIGHT JOIN nation n ON cs.nk = n.n_nationkey
  WHERE n.n_regionkey <= 2
),
sn AS (
  SELECT s.s_nationkey AS nationkey, COUNT(*) AS n_supp
  FROM supplier s JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE n2.n_regionkey >= 2 AND s.s_acctbal > 9000
  GROUP BY s.s_nationkey
)
SELECT 'q54_right_full_outer' AS family,
       CAST(COALESCE(cn.nationkey, sn.nationkey) AS VARCHAR)
         || ':' || COALESCE(cn.n_name, '~') AS k,
       COALESCE(cn.n_cust, 0) AS n_a,
       COALESCE(sn.n_supp, 0) AS n_b
FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
UNION ALL
SELECT 'q11_left_isnull' AS family,
       c.c_mktsegment AS k,
       COUNT(*) AS n_a,
       CAST(0 AS BIGINT) AS n_b
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
WHERE o.o_orderkey IS NULL
GROUP BY c.c_mktsegment
""",
)
def q11_q54_outer_battery(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    o = tbl(spark, sf_dir, "orders")
    cs = (
        c.filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    cn = (
        cs.join(n, cs.nk == n.n_nationkey, "right")
        .filter(F.col("n_regionkey") <= 2)
        .select(
            F.col("n_nationkey").alias("nationkey"),
            "n_name",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        )
    )
    sn = (
        s.join(n.alias("n2"), s.s_nationkey == F.col("n2.n_nationkey"))
        .filter((F.col("n2.n_regionkey") >= 2) & (F.col("s_acctbal") > 9000))
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    cn_a, sn_a = cn.alias("cn"), sn.alias("sn")
    outer_part = (
        cn_a.join(sn_a, F.col("cn.nationkey") == F.col("sn.nationkey"), "full_outer")
        .select(
            F.lit("q54_right_full_outer").alias("family"),
            F.concat(
                F.coalesce(F.col("cn.nationkey"), F.col("sn.nationkey")).cast("string"),
                F.lit(":"),
                F.coalesce(F.col("cn.n_name"), F.lit("~")),
            ).alias("k"),
            F.coalesce(F.col("cn.n_cust"), F.lit(0)).alias("n_a"),
            F.coalesce(F.col("sn.n_supp"), F.lit(0)).alias("n_b"),
        )
    )
    isnull_part = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .groupBy(F.col("c_mktsegment").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_a"))
        .select(
            F.lit("q11_left_isnull").alias("family"),
            "k",
            "n_a",
            F.lit(0).cast("long").alias("n_b"),
        )
    )
    return outer_part.unionByName(isnull_part)


# ---------------------------------------------------------------------------
# q21+q22 battery — round-7 rotation: multi COUNT(DISTINCT) (A5,
# vw_table_space_summary.sql:12) and aggregate-of-aggregate via derived
# table (A10, MemoryGrant.sql:6-55) in ONE driver slot.
# ---------------------------------------------------------------------------


@query(
    "q21_q22_agg_battery",
    oracle="""
SELECT 'q21_count_distinct' AS family,
       l_returnflag AS k,
       COUNT(DISTINCT l_suppkey) AS n_a,
       COUNT(DISTINCT l_partkey) AS n_b,
       COUNT(*) AS n_c,
       CAST(NULL AS DOUBLE) AS total
FROM lineitem
GROUP BY l_returnflag
UNION ALL
SELECT 'q22_nested_agg' AS family,
       CAST(n_orders AS VARCHAR) AS k,
       COUNT(*) AS n_a,
       CAST(0 AS BIGINT) AS n_b,
       CAST(0 AS BIGINT) AS n_c,
       CAST(SUM(CAST(spend AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
GROUP BY 2
""",
)
def q21_q22_agg_battery(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    cd_part = (
        li.groupBy(F.col("l_returnflag").alias("k"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_a"),
            F.countDistinct("l_partkey").alias("n_b"),
            F.count(F.lit(1)).alias("n_c"),
        )
        .select(
            F.lit("q21_count_distinct").alias("family"),
            "k",
            "n_a",
            "n_b",
            "n_c",
            F.lit(None).cast("double").alias("total"),
        )
    )
    o = tbl(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "spend"),
    )
    nested_part = (
        per_cust.groupBy(F.col("n_orders").cast("string").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_a"), dsum("spend", "total"))
        .select(
            F.lit("q22_nested_agg").alias("family"),
            "k",
            "n_a",
            F.lit(0).cast("long").alias("n_b"),
            F.lit(0).cast("long").alias("n_c"),
            "total",
        )
    )
    return cd_part.unionByName(nested_part)


# ---------------------------------------------------------------------------
# q18+q21+q22 battery — round-9 rotation: the skew% formula (A9/A11/M7,
# vw_tables_with_skew.sql:19) folds into the aggregation battery as one
# more family row (min/max/total land in the n_a/n_b/n_c slots, skew_pct
# in total), freeing a driver slot for a round-8 flagship.  q18 and the
# q21_q22 battery stay individually registered + locally oracle-checked.
# ---------------------------------------------------------------------------


@query(
    "q18_q21_q22_agg_battery",
    oracle="""
SELECT 'q18_skew' AS family,
       'all' AS k,
       MIN(row_count) AS n_a,
       MAX(row_count) AS n_b,
       CAST(SUM(row_count) AS BIGINT) AS n_c,
       CAST(ROUND((MAX(row_count) - MIN(row_count)) * 100.0
                  / NULLIF(SUM(row_count), 0), 6) AS DOUBLE) AS total
FROM (
  SELECT l_suppkey % 60 AS distribution_id, COUNT(*) AS row_count
  FROM lineitem
  GROUP BY l_suppkey % 60
)
UNION ALL
SELECT 'q21_count_distinct' AS family,
       l_returnflag AS k,
       COUNT(DISTINCT l_suppkey) AS n_a,
       COUNT(DISTINCT l_partkey) AS n_b,
       COUNT(*) AS n_c,
       CAST(NULL AS DOUBLE) AS total
FROM lineitem
GROUP BY l_returnflag
UNION ALL
SELECT 'q22_nested_agg' AS family,
       CAST(n_orders AS VARCHAR) AS k,
       COUNT(*) AS n_a,
       CAST(0 AS BIGINT) AS n_b,
       CAST(0 AS BIGINT) AS n_c,
       CAST(SUM(CAST(spend AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
GROUP BY 2
""",
)
def q18_q21_q22_agg_battery(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    dist = li.groupBy(
        F.pmod(F.col("l_suppkey"), F.lit(60)).alias("distribution_id")
    ).agg(F.count(F.lit(1)).alias("row_count"))
    skew_part = dist.agg(
        F.min("row_count").alias("n_a"),
        F.max("row_count").alias("n_b"),
        F.sum("row_count").alias("n_c"),
        F.round(
            (F.max("row_count") - F.min("row_count"))
            * 100.0
            / F.nullif(F.sum("row_count"), F.lit(0)),
            6,
        )
        .cast("double")
        .alias("total"),
    ).select(
        F.lit("q18_skew").alias("family"),
        F.lit("all").alias("k"),
        "n_a",
        "n_b",
        "n_c",
        "total",
    )
    return skew_part.unionByName(q21_q22_agg_battery(spark, sf_dir))
