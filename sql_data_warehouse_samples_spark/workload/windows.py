"""Window / OLAP function coverage (SURVEY.md §2.5).

The reference's dialect declares the full OLAP family: ROW_NUMBER / RANK over
aggregates, lag/lead, first_value, moving & running aggregates with frame
specs (white-papers/...md:175-177, 567-588; ROW_NUMBER sites
vw_table_sizes.sql:14, sp_create_statistics.sql:45-46).

Determinism: every window ORDER BY includes a unique tiebreaker column so
rank/lag results are identical across engines.  Frame aggregates run over
DECIMAL so running sums are order-independent bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query
from ._util import dec, dsum, tbl

# ---------------------------------------------------------------------------
# q25 — RANK() OVER (PARTITION BY region ORDER BY SUM(...) DESC): the
# MicroStrategy rank-over-aggregate pattern (white-papers/...md:192-197).
# ---------------------------------------------------------------------------


@query(
    "q25_nation_revenue_rank",
    oracle="""
WITH nat_rev AS (
  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region_name, nation_name, revenue,
       RANK() OVER (PARTITION BY region_name ORDER BY revenue DESC, nation_name) AS rev_rank
FROM nat_rev
""",
)
def q25_nation_revenue_rank(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    nat_rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(dsum("o_totalprice", "revenue"))
    )
    w = Window.partitionBy("region_name").orderBy(F.desc("revenue"), F.asc("nation_name"))
    return nat_rev.withColumn("rev_rank", F.rank().over(w))


# ---------------------------------------------------------------------------
# q26 — ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...) top-N-per-group
# (W1: vw_table_sizes.sql:14, SkewDetection.sql:54).
# ---------------------------------------------------------------------------


@query(
    "q26_latest_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate, rn
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def q26_latest_orders_per_customer(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# q27 — LAG / LEAD (W3: white-papers/...md:575-576 Lag/Lead mappings).
# ---------------------------------------------------------------------------


@query(
    "q27_order_gaps",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       CAST(COALESCE(CAST(o_totalprice AS DECIMAL(18,4))
             - CAST(LAG(o_totalprice) OVER w AS DECIMAL(18,4)), 0) AS DOUBLE) AS price_delta
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q27_order_gaps(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.coalesce(
            dec("o_totalprice") - dec(F.lag("o_totalprice").over(w)),
            F.lit(0).cast("decimal(18,4)"),
        )
        .cast("double")
        .alias("price_delta"),
    )


# ---------------------------------------------------------------------------
# q28 — moving average + running sum with explicit frames (W3/W4:
# MovingAvg → `avg(#0) over (... rows 6 preceding)` and RunningSum,
# white-papers/...md:578-588).  Also carries a month-partitioned
# RANK-over-aggregate column (W2, white-papers/...md:571-575) and a
# ROW_NUMBER column over the same partition (W1, vw_table_sizes.sql:14) so
# both families keep an exemplar inside the driver window; q25's
# nation-grain RANK and q26's top-N-per-group ROW_NUMBER stay registered
# for depth.  day_rev is an exact DECIMAL sum and the orderings carry a
# unique tiebreaker (order_day), so rank/row_number are bit-identical
# across engines.
# ---------------------------------------------------------------------------


@query(
    "q28_moving_revenue",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_day,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS day_rev
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
)
SELECT order_day,
       CAST(day_rev AS DOUBLE) AS day_rev,
       CAST(SUM(day_rev) OVER (ORDER BY order_day
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(day_rev) OVER (ORDER BY order_day
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS moving_avg_7d,
       CAST(SUM(day_rev) OVER (ORDER BY order_day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev,
       RANK() OVER (PARTITION BY DATE_TRUNC('month', order_day)
            ORDER BY day_rev DESC, order_day) AS rank_in_month,
       ROW_NUMBER() OVER (PARTITION BY DATE_TRUNC('month', order_day)
            ORDER BY day_rev DESC, order_day) AS rownum_in_month
FROM daily
""",
)
def q28_moving_revenue(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("order_day")).agg(
        F.sum(dec("o_totalprice")).alias("day_rev")
    )
    w7 = Window.orderBy("order_day").rowsBetween(-6, Window.currentRow)
    wrun = Window.orderBy("order_day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "order_day",
        F.col("day_rev").cast("double").alias("day_rev"),
        (F.sum("day_rev").over(w7).cast("double") / F.count("day_rev").over(w7)).alias(
            "moving_avg_7d"
        ),
        F.sum("day_rev").over(wrun).cast("double").alias("running_rev"),
        F.rank()
        .over(
            Window.partitionBy(F.trunc("order_day", "month")).orderBy(
                F.desc("day_rev"), F.asc("order_day")
            )
        )
        .alias("rank_in_month"),
        F.row_number()
        .over(
            Window.partitionBy(F.trunc("order_day", "month")).orderBy(
                F.desc("day_rev"), F.asc("order_day")
            )
        )
        .alias("rownum_in_month"),
    )


# ---------------------------------------------------------------------------
# q29 — FIRST_VALUE (W3: FirstInRange → first_value, white-papers/...md:567).
# ---------------------------------------------------------------------------


@query(
    "q29_first_priority",
    oracle="""
SELECT DISTINCT o_custkey,
       FIRST_VALUE(o_orderpriority) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_priority,
       FIRST_VALUE(o_orderkey) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_orderkey
FROM orders
""",
)
def q29_first_priority(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        F.first("o_orderpriority").over(w).alias("first_priority"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    ).distinct()


# ---------------------------------------------------------------------------
# q30 — NTILE + percent-of-total (OLAP family; per-group share pattern used
# by the BI SQL in white-papers/...md:357-377).
# ---------------------------------------------------------------------------


@query(
    "q30_customer_quartiles",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT quartile, COUNT(*) AS n_customers,
       CAST(SUM(spend) AS DOUBLE) AS quartile_spend
FROM (
  SELECT o_custkey, spend,
         NTILE(4) OVER (ORDER BY spend DESC, o_custkey) AS quartile
  FROM per_cust
)
GROUP BY quartile
""",
)
def q30_customer_quartiles(spark, sf_dir):
    # Exact T-SQL NTILE semantics → global window (single partition); this
    # input grows with the corpus, so the 100 TB path is the two-pass
    # operators/quantiles.approx_ntile (boundary sketch + map-only CASE),
    # equivalence-tested against this exact form at sf0.01.
    o = tbl(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.sum(dec("o_totalprice")).alias("spend"))
    w = Window.orderBy(F.desc("spend"), F.asc("o_custkey"))
    return (
        per_cust.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("spend").cast("double").alias("quartile_spend"),
        )
    )


# ---------------------------------------------------------------------------
# q45 — RANGE-frame window (W4 <windowing clause>, white-papers/...md:175-177):
# value-based frame over per-day revenue — all days within the trailing
# 7-day VALUE range, not the trailing 7 ROWS.
# ---------------------------------------------------------------------------


@query(
    "q45_range_frame",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_day,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS revenue,
         CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_nr
  FROM orders GROUP BY 1
)
SELECT order_day,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(SUM(revenue) OVER (
         ORDER BY day_nr RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_week_revenue
FROM daily
""",
)
def q45_range_frame(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("order_day")).agg(
        F.sum(dec("o_totalprice")).alias("revenue")
    ).withColumn(
        "day_nr", F.datediff("order_day", F.lit("1992-01-01").cast("date")).cast("long")
    )
    w = Window.orderBy("day_nr").rangeBetween(-6, Window.currentRow)
    return daily.select(
        "order_day",
        F.col("revenue").cast("double").alias("revenue"),
        F.sum("revenue").over(w).cast("double").alias("trailing_week_revenue"),
    )
