"""Scalar-function coverage (SURVEY.md §2.8): string, date/time, math,
null-handling, CASE, and conversion functions.

Each family mirrors the reference's usage sites: QUOTENAME/concat/SUBSTRING/
REPLACE/LEN/CHARINDEX (vw_table_sizes.sql:12, GenerateLoadScript-V3:144-155),
DATEDIFF/DATEADD/DATEPART (vw_query_queue.sql:8, TableHealthCount.sql:72,
white-papers/...md:515-531), the math library (white-papers/...md:535-564),
ISNULL/NULLIF (MemoryGrant.sql:17, ImpactedTables:13), CASE
(GenerateLoadScript-V3:148-163), CAST/CONVERT (MemoryGrant.sql:4).

Transcendental outputs are rounded to 6 dp (libm last-bit differences
between JVM and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._util import tbl

# ---------------------------------------------------------------------------
# q31 — string functions.  QUOTENAME (vw_table_sizes.sql:12) is modelled by
# the bracket-concat; the rest map 1:1 (SURVEY §2.8 "String").
# ---------------------------------------------------------------------------


@query(
    "q31_string_functions",
    oracle="""
SELECT
  p_partkey,
  '[' || p_name || ']' AS quoted_name,
  UPPER(p_name) AS upper_name,
  LOWER(p_brand) AS lower_brand,
  LENGTH(p_name) AS name_len,
  SUBSTRING(p_name, 1, 5) AS name_head,
  p_brand || '#' || p_type AS brand_type,
  REPLACE(p_name, ' ', '_') AS snake_name,
  STRPOS(p_name, 'a') AS first_a,
  LEFT(p_name, 3) AS left3,
  RIGHT(p_name, 3) AS right3,
  TRIM(p_name) AS trimmed,
  LPAD(p_brand, 12, '*') AS padded_brand,
  TRANSLATE(p_name, 'ae', 'AE') AS translated,
  REVERSE(p_brand) AS rev_brand
FROM part
""",
)
def q31_string_functions(spark, sf_dir):
    p = tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.lit("["), F.col("p_name"), F.lit("]")).alias("quoted_name"),
        F.upper("p_name").alias("upper_name"),
        F.lower("p_brand").alias("lower_brand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("snake_name"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.expr("left(p_name, 3)").alias("left3"),
        F.expr("right(p_name, 3)").alias("right3"),
        F.trim(F.col("p_name")).alias("trimmed"),
        F.lpad(F.col("p_brand"), 12, "*").alias("padded_brand"),
        F.translate(F.col("p_name"), "ae", "AE").alias("translated"),
        F.reverse(F.col("p_brand")).alias("rev_brand"),
    )


# ---------------------------------------------------------------------------
# q32 — date/time functions (DATEPART family white-papers/...md:521-531,
# DATEADD/DATEDIFF TableHealthCount.sql:72, month-start/last-day idioms
# white-papers/...md:525-532).
# ---------------------------------------------------------------------------


@query(
    "q32_date_functions",
    oracle="""
SELECT
  o_orderkey,
  CAST(o_orderdate AS DATE) AS order_date,
  YEAR(o_orderdate) AS order_year,
  MONTH(o_orderdate) AS order_month,
  QUARTER(o_orderdate) AS order_quarter,
  DAY(o_orderdate) AS order_day,
  DAYOFYEAR(o_orderdate) AS order_doy,
  WEEKOFYEAR(o_orderdate) AS order_week,
  CAST(o_orderdate AS DATE) + 7 AS plus_week,
  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus_month,
  DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch95,
  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
  LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
FROM orders
""",
)
def q32_date_functions(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("date").alias("order_date"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.quarter(d).alias("order_quarter"),
        F.dayofmonth(d).alias("order_day"),
        F.dayofyear(d).alias("order_doy"),
        F.weekofyear(d).alias("order_week"),
        F.date_add(d.cast("date"), 7).alias("plus_week"),
        F.add_months(d.cast("date"), 1).alias("plus_month"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch95"
        ),
        F.trunc(d.cast("date"), "month").alias("month_start"),
        F.last_day(d.cast("date")).alias("month_end"),
    )


# ---------------------------------------------------------------------------
# q33 — math library (white-papers/...md:535-564: ABS..TAN; CEILING usage
# TableHealthCount.sql:15).  Rounded to 6 dp for cross-libm determinism.
# ---------------------------------------------------------------------------


@query(
    "q33_math_functions",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  ABS(l_quantity - 25) AS abs_dev,
  CAST(CEIL(l_quantity / 7) AS BIGINT) AS ceil7,
  CAST(FLOOR(l_quantity / 7) AS BIGINT) AS floor7,
  ROUND(l_extendedprice, 1) AS rounded_price,
  ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,
  ROUND(LN(l_extendedprice + 1), 6) AS ln_price,
  ROUND(LOG10(l_extendedprice + 1), 6) AS log10_price,
  ROUND(EXP(l_discount), 6) AS exp_disc,
  ROUND(POWER(l_quantity, 2), 6) AS qty_sq,
  ROUND(ATAN2(l_quantity, l_extendedprice), 6) AS angle,
  ROUND(DEGREES(l_discount), 6) AS disc_deg,
  ROUND(RADIANS(l_quantity), 6) AS qty_rad,
  ROUND(SIN(l_discount), 6) AS sin_disc,
  ROUND(COS(l_discount), 6) AS cos_disc,
  CAST(l_orderkey % 60 AS BIGINT) AS mod60
FROM lineitem
""",
)
def q33_math_functions(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    disc = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25).alias("abs_dev"),
        F.ceil(q / 7).alias("ceil7"),
        F.floor(q / 7).alias("floor7"),
        F.round(p, 1).alias("rounded_price"),
        F.round(F.sqrt(p), 6).alias("sqrt_price"),
        F.round(F.log(p + 1), 6).alias("ln_price"),
        F.round(F.log10(p + 1), 6).alias("log10_price"),
        F.round(F.exp(disc), 6).alias("exp_disc"),
        F.round(F.pow(q, 2), 6).alias("qty_sq"),
        F.round(F.atan2(q, p), 6).alias("angle"),
        F.round(F.degrees(disc), 6).alias("disc_deg"),
        F.round(F.radians(q), 6).alias("qty_rad"),
        F.round(F.sin(disc), 6).alias("sin_disc"),
        F.round(F.cos(disc), 6).alias("cos_disc"),
        (F.col("l_orderkey") % 60).cast("bigint").alias("mod60"),
    )


# ---------------------------------------------------------------------------
# q34 — statistical aggregates STDEV/STDEVP/VAR/VARP
# (white-papers/...md:511-514).  Rounded: float accumulation order differs.
# ---------------------------------------------------------------------------


@query(
    "q34_statistical_aggs",
    oracle="""
SELECT
  l_returnflag,
  ROUND(STDDEV_SAMP(l_quantity), 6) AS qty_stdev,
  ROUND(STDDEV_POP(l_quantity), 6) AS qty_stdevp,
  ROUND(VAR_SAMP(l_quantity), 6) AS qty_var,
  ROUND(VAR_POP(l_quantity), 6) AS qty_varp
FROM lineitem
GROUP BY l_returnflag
""",
)
def q34_statistical_aggs(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stdev"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("qty_stdevp"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.var_pop("l_quantity"), 6).alias("qty_varp"),
    )


# ---------------------------------------------------------------------------
# q35 — null handling + CASE (ISNULL/NULLIF MemoryGrant.sql:17,
# ImpactedTables:13; searched & simple CASE GenerateLoadScript-V3:148-163).
# ---------------------------------------------------------------------------


@query(
    "q35_null_case",
    oracle="""
SELECT
  c_custkey,
  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(suppressed)') AS segment_masked,
  CASE WHEN c_acctbal < 0 THEN 'negative'
       WHEN c_acctbal < 5000 THEN 'mid'
       ELSE 'high' END AS bal_band,
  CASE CAST(c_nationkey % 3 AS INT) WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
       ELSE 'gamma' END AS cohort,
  COALESCE(NULLIF(CAST(c_acctbal AS DECIMAL(18,4)), 0), -1) > 0 AS has_balance
FROM customer
""",
)
def q35_null_case(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(suppressed)")).alias(
            "segment_masked"
        ),
        F.when(bal < 0, "negative").when(bal < 5000, "mid").otherwise("high").alias("bal_band"),
        F.when((F.col("c_nationkey") % 3).cast("int") == 0, "alpha")
        .when((F.col("c_nationkey") % 3).cast("int") == 1, "beta")
        .otherwise("gamma")
        .alias("cohort"),
        (
            F.coalesce(
                F.nullif(bal.cast("decimal(18,4)"), F.lit(0).cast("decimal(18,4)")),
                F.lit(-1).cast("decimal(18,4)"),
            )
            > 0
        ).alias("has_balance"),
    )


# ---------------------------------------------------------------------------
# q52 — combined scalar battery: one driver-checked projection covering the
# string / date / math / null-CASE / conversion families in a single query
# (the per-family batteries q31–q36 stay registered for depth; this wide row
# keeps every family inside the driver's correctness window).  Same usage
# sites as q31–q36: vw_table_sizes.sql:12, TableHealthCount.sql:72,
# white-papers/...md:515-564, MemoryGrant.sql:4,17.
# ---------------------------------------------------------------------------


@query(
    "q52_scalar_battery",
    oracle="""
SELECT
  o_orderkey,
  UPPER(o_orderpriority) AS upper_priority,
  LOWER(o_orderpriority) AS lower_priority,
  LENGTH(o_orderpriority) AS priority_len,
  SUBSTRING(o_orderpriority, 1, 8) AS priority_head,
  o_orderstatus || '/' || o_orderpriority AS status_priority,
  REPLACE(o_orderpriority, '-', '_') AS snake_priority,
  STRPOS(o_orderpriority, 'I') AS first_i,
  TRIM(o_orderpriority) AS trimmed_priority,
  LPAD(o_orderstatus, 4, '*') AS padded_status,
  REVERSE(o_orderstatus) AS rev_status,
  YEAR(o_orderdate) AS order_year,
  MONTH(o_orderdate) AS order_month,
  QUARTER(o_orderdate) AS order_quarter,
  DAYOFYEAR(o_orderdate) AS order_doy,
  CAST(o_orderdate AS DATE) + 30 AS plus_month30,
  DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch95,
  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
  LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
  ABS(o_totalprice - 100000) AS abs_dev,
  CAST(CEIL(o_totalprice / 1000) AS BIGINT) AS ceil_k,
  CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS floor_k,
  ROUND(o_totalprice, 1) AS rounded_price,
  ROUND(SQRT(o_totalprice), 6) AS sqrt_price,
  ROUND(LN(o_totalprice + 1), 6) AS ln_price,
  ROUND(LOG10(o_totalprice + 1), 6) AS log10_price,
  CAST(o_orderkey % 60 AS BIGINT) AS mod60,
  COALESCE(NULLIF(o_orderstatus, 'O'), '(open)') AS status_masked,
  CASE WHEN o_totalprice < 50000 THEN 'small'
       WHEN o_totalprice < 200000 THEN 'mid'
       ELSE 'large' END AS price_band,
  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
  CAST(o_orderkey AS VARCHAR) AS key_str,
  CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS priority_num,
  CAST(o_custkey AS DOUBLE) AS custkey_dbl
FROM orders
""",
)
def q52_scalar_battery(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("upper_priority"),
        F.lower("o_orderpriority").alias("lower_priority"),
        F.length("o_orderpriority").alias("priority_len"),
        F.substring("o_orderpriority", 1, 8).alias("priority_head"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("status_priority"),
        F.regexp_replace("o_orderpriority", "-", "_").alias("snake_priority"),
        F.instr(F.col("o_orderpriority"), "I").alias("first_i"),
        F.trim(F.col("o_orderpriority")).alias("trimmed_priority"),
        F.lpad(F.col("o_orderstatus"), 4, "*").alias("padded_status"),
        F.reverse(F.col("o_orderstatus")).alias("rev_status"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.quarter(d).alias("order_quarter"),
        F.dayofyear(d).alias("order_doy"),
        F.date_add(d.cast("date"), 30).alias("plus_month30"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch95"
        ),
        F.trunc(d.cast("date"), "month").alias("month_start"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.abs(tp - 100000).alias("abs_dev"),
        F.ceil(tp / 1000).alias("ceil_k"),
        F.floor(tp / 1000).alias("floor_k"),
        F.round(tp, 1).alias("rounded_price"),
        F.round(F.sqrt(tp), 6).alias("sqrt_price"),
        F.round(F.log(tp + 1), 6).alias("ln_price"),
        F.round(F.log10(tp + 1), 6).alias("log10_price"),
        (F.col("o_orderkey") % 60).cast("bigint").alias("mod60"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("(open)")).alias(
            "status_masked"
        ),
        F.when(tp < 50000, "small")
        .when(tp < 200000, "mid")
        .otherwise("large")
        .alias("price_band"),
        tp.cast("decimal(12,2)").cast("string").alias("price_str"),
        F.floor(tp).cast("bigint").alias("price_floor"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("priority_num"),
        F.col("o_custkey").cast("double").alias("custkey_dbl"),
    )


# ---------------------------------------------------------------------------
# q36 — CAST/CONVERT battery (MemoryGrant.sql:4, ImpactedTables:14
# `convert(decimal(10,2), ...)`, GenerateLoadScript-V3:139-167 staged casts).
# Note: double→int CAST rounds in DuckDB but truncates in Spark, so integer
# conversion goes through FLOOR explicitly — the loader does the same.
# ---------------------------------------------------------------------------


@query(
    "q36_cast_conversion",
    oracle="""
SELECT
  o_orderkey,
  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
  CAST(o_orderdate AS DATE) AS od,
  CAST(o_orderkey AS VARCHAR) AS key_str,
  CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS priority_num,
  CAST(o_custkey AS DOUBLE) AS custkey_dbl
FROM orders
""",
)
def q36_cast_conversion(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_str"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.col("o_orderdate").cast("date").alias("od"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("priority_num"),
        F.col("o_custkey").cast("double").alias("custkey_dbl"),
    )
