"""Relational analytics over the TPC-H-ish driver tables.

The reference has no relational operators at all (SURVEY.md §2.9); this
module exercises Spark's native join/agg/window/rollup surface — the
operators Catalyst optimizes for free (predicate pushdown, broadcast
joins, partial aggregation) — so the engine covers the standard OLAP
query classes at scale.

Scale notes per query are in each docstring; the common rules:
dimension tables (region/nation/customer/supplier/part) broadcast;
fact-side filters are pushed into the parquet scan; aggregates run
partial+final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table, ts_us


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with 8 partial+final aggregates.
    At 100 TB this is embarrassingly parallel — no join, 6-group shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                6,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
  ROUND(CAST(SUM(l_quantity) AS DOUBLE), 6) AS sum_qty,
  ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 6) AS sum_base_price,
  ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 6) AS sum_disc_price,
  ROUND(CAST(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE), 6) AS sum_charge,
  ROUND(CAST(AVG(l_quantity) AS DOUBLE), 6) AS avg_qty,
  ROUND(CAST(AVG(l_extendedprice) AS DOUBLE), 6) AS avg_price,
  ROUND(CAST(AVG(l_discount) AS DOUBLE), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective fact filters + two joins + top-N.
    customer is broadcast (small dim); orders/lineitem join shuffles on
    orderkey; global top-10 via orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition partial top-k merged at the
    driver — no single-partition shuffle, scales to any row count).
    The rank column is then assigned over just the 10 surviving rows."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01")
    )
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_rev"
            )
        )
    )
    top10 = rev.orderBy(F.col("_rev").desc(), F.col("o_orderkey")).limit(10)
    w = W.orderBy(F.col("_rev").desc(), F.col("o_orderkey"))
    return (
        top10.withColumn("rn", F.row_number().over(w))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            ts_us("o_orderdate").alias("orderdate_us"),
            F.col("o_orderpriority").alias("priority"),
            F.round("_rev", 6).alias("revenue"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


SHIPPING_PRIORITY_SQL = """
WITH rev AS (
  SELECT o_orderkey, o_orderdate, o_orderpriority,
         SUM(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND l_shipdate > TIMESTAMP '1998-01-01'
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rev DESC, o_orderkey) AS rn FROM rev
)
SELECT o_orderkey AS orderkey, epoch_us(o_orderdate) AS orderdate_us,
       o_orderpriority AS priority,
       ROUND(CAST(rev AS DOUBLE), 6) AS revenue, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 10
"""


def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join through 4 broadcast dims to one fact."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


NATION_REVENUE_SQL = """
SELECT r_name AS region, n_name AS nation,
  ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 6) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the canonical window pattern; partitions by
    custkey so the sort is per-group, never global."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 6).alias("totalprice"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


TOP_ORDERS_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       ROUND(CAST(o_totalprice AS DOUBLE), 6) AS totalprice,
       CAST(rn AS BIGINT) AS rn
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — subtotals + grand total in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


SALES_ROLLUP_SQL = """
SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       ROUND(CAST(SUM(l_quantity) AS DOUBLE), 6) AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def segment_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles of order value per market segment
    (broadcast dim join + percentile aggregate)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.round(F.percentile("o_totalprice", 0.5), 6).alias("median_value"),
            F.round(F.percentile("o_totalprice", 0.9), 6).alias("p90_value"),
            F.count("*").alias("n_orders"),
        )
    )


SEGMENT_QUANTILES_SQL = """
SELECT c_mktsegment AS segment,
  ROUND(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 6) AS median_value,
  ROUND(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 6) AS p90_value,
  COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


def quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS): customers with no order above 300k —
    the set-difference pattern; big side streams, filter side broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 300000
    )
    return (
        cust.join(
            big, cust["c_custkey"] == big["o_custkey"], "left_anti"
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_nationkey").cast("long").alias("nationkey"),
        )
    )


QUIET_CUSTOMERS_SQL = """
SELECT c_custkey AS custkey, c_name AS name,
       CAST(c_nationkey AS BIGINT) AS nationkey
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per status x priority (fixed pivot values so
    the schema is static — required for streaming reuse and the oracle)."""
    orders = load_table(spark, sf_dir, "orders")
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", pris)
        .count()
        .na.fill(0)
    )
    cols = [F.col("o_orderstatus").alias("status")] + [
        F.col(p).cast("long").alias(f"p{i + 1}") for i, p in enumerate(pris)
    ]
    return out.select(*cols)


ORDER_PRIORITY_PIVOT_SQL = """
SELECT o_orderstatus AS status,
  COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
  COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
  COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
  COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
  COUNT(*) FILTER (o_orderpriority = '5-LOW') AS p5
FROM orders GROUP BY 1
"""


def returning_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers active in BOTH 1996 and 1997
    (INTERSECT), minus any who ever placed a failed ('F') order
    (EXCEPT).  Spark plans INTERSECT/EXCEPT as aggregate-or-join on the
    full row — at scale each is one shuffle on c_custkey, and the
    distinct key sets are far smaller than the order fact table because
    the year filters are pushed into the parquet scan first."""
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.where(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.where(F.year("o_orderdate") == 1997).select("o_custkey")
    failed = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    keys = y96.intersect(y97).exceptAll(failed.distinct())
    cust = load_table(spark, sf_dir, "customer")
    return keys.join(cust, keys["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
    )


RETURNING_CUSTOMERS_SQL = """
WITH keys AS (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
),
clean AS (
  SELECT o_custkey FROM keys
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
SELECT CAST(c_custkey AS BIGINT) AS custkey, c_mktsegment AS segment
FROM clean JOIN customer ON o_custkey = c_custkey
"""


def brand_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (brand, container-ish type prefix): all 4 grouping-set
    combinations in ONE pass — Spark expands the cube map-side and runs
    a single partial+final aggregate, so at 100 TB the fact table is
    still read once.  part is broadcast (small dim)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_brand"),
        F.substring("p_type", 1, 6).alias("p_class"),
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .cube("p_brand", "p_class")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "revenue"
            ),
            F.count("*").cast("long").alias("n_items"),
        )
        .select(
            F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
            F.coalesce("p_class", F.lit("ALL")).alias("class"),
            "revenue",
            "n_items",
        )
    )


BRAND_SALES_CUBE_SQL = """
SELECT COALESCE(p_brand, 'ALL') AS brand,
       COALESCE(substring(p_type, 1, 6), 'ALL') AS class,
       ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 6) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY CUBE (p_brand, substring(p_type, 1, 6))
"""


def price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) join: classify every order into a price band via a
    non-equi join against a tiny band table.  Spark picks
    BroadcastNestedLoopJoin because the band table is broadcast — the
    scale-correct plan for interval joins against small dimension
    ranges (the alternative, a theta-join shuffle, is never needed when
    one side fits in memory)."""
    bands = spark.createDataFrame(
        [
            ("micro", 0.0, 50_000.0),
            ("small", 50_000.0, 150_000.0),
            ("medium", 150_000.0, 300_000.0),
            ("large", 300_000.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(
            F.broadcast(bands),
            (orders["o_totalprice"] >= bands["lo"])
            & (orders["o_totalprice"] < bands["hi"]),
        )
        .groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
    )


PRICE_BAND_JOIN_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('micro', 0.0, 50000.0), ('small', 50000.0, 150000.0),
         ('medium', 150000.0, 300000.0), ('large', 300000.0, 1e18)
)
SELECT band, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS total_price,
       ROUND(CAST(AVG(o_totalprice) AS DOUBLE), 6) AS avg_price
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY 1
"""


def high_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS): customers with at least one 1997 order over
    200k.  ``left_semi`` keeps the probe side intact and deduplicated —
    at scale it shuffles only the distinct filtered order keys, never
    multiplies rows like an inner join + distinct would."""
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").where(
        (F.year("o_orderdate") == 1997) & (F.col("o_totalprice") > 200_000)
    )
    return (
        cust.join(
            big_orders,
            cust["c_custkey"] == big_orders["o_custkey"],
            "left_semi",
        )
        .select(
            F.col("c_custkey").cast("long").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
            F.round("c_acctbal", 6).alias("acctbal"),
        )
    )


HIGH_VALUE_CUSTOMERS_SQL = """
SELECT CAST(c_custkey AS BIGINT) AS custkey, c_mktsegment AS segment,
       ROUND(CAST(c_acctbal AS DOUBLE), 6) AS acctbal
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND year(o_orderdate) = 1997 AND o_totalprice > 200000
)
"""
