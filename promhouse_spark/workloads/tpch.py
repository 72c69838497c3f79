"""TPC-H-style analytics over the driver testdata — the raw-SQL analytics
surface (O7) exercised as native DataFrame plans.

These are the "arbitrary ClickHouse SQL" class of queries the reference
forwards verbatim (``storages/clickhouse/rawsql.go``); here they double as
scale benchmarks: scan-heavy aggregation (q1), selective multi-join (q3, q5),
semi/anti joins (the reference's J1/J2 strategies over relational keys), and
deterministic top-k (T5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from promhouse_spark.session import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy group-aggregate (TPC-H Q1 shape): one pass over lineitem,
    8 aggregates, 4 groups — the plan should be a single WholeStageCodegen
    scan→partial-agg→exchange→final-agg."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.expr("l_shipdate <= timestamp_ntz'1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.round(F.sum("l_quantity"), 2) / F.count("*"), 2).alias("avg_qty"),
            F.round(F.round(F.sum("l_extendedprice"), 2) / F.count("*"), 2).alias("avg_price"),
            F.round(F.round(F.sum("l_discount"), 2) / F.count("*"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(round(sum(l_quantity), 2) / count(*), 2) AS avg_qty,
       round(round(sum(l_extendedprice), 2) / count(*), 2) AS avg_price,
       round(round(sum(l_discount), 2) / count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective 3-table join + top-k by aggregated revenue (TPC-H Q3 shape).

    No explicit broadcast hints: ``orders`` and ``customer`` scale with SF,
    so a forced broadcast is an OOM at large scale AND overrides AQE. With
    adaptive execution on (session default), Spark converts these to
    broadcast joins at runtime when the filtered sides are actually small —
    the right strategy at every scale factor."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate < timestamp_ntz'1998-01-01 00:00:00'")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate > timestamp_ntz'1998-01-01 00:00:00'")
    )
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-table join with a locality predicate (TPC-H Q5 shape).

    Only the true dimension tables (``nation`` 25 rows, ``region`` 5 rows —
    fixed size at every SF) carry broadcast hints; ``orders``/``supplier``/
    ``customer`` scale with SF, so join strategy for them is left to AQE,
    which picks broadcast at small SF and shuffle-hash/sort-merge at 100 TB."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= timestamp_ntz'1996-01-01 00:00:00' AND "
            "o_orderdate < timestamp_ntz'1998-01-01 00:00:00'"
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def top_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: deterministic top-k on a raw column."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


TOP_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def orders_semijoin_bigqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 analog over relational keys: orders that have at least one
    high-quantity lineitem (left-semi = the reference's fingerprint
    restriction), counted per priority."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 47)
    return (
        orders.join(li.select("l_orderkey"), orders.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


SEMIJOIN_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 47)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def parts_antijoin_unsold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 analog (set difference): parts never shipped in bulk (anti-join),
    per brand."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    return (
        part.join(li.select("l_partkey"), part.p_partkey == F.col("l_partkey"), "left_anti")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_brand")
    )


ANTIJOIN_SQL = """
SELECT p_brand, count(*) AS n_parts
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 48)
GROUP BY p_brand
ORDER BY p_brand
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "top_orders_by_price": top_orders_by_price,
    "orders_semijoin_bigqty": orders_semijoin_bigqty,
    "parts_antijoin_unsold": parts_antijoin_unsold,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "top_orders_by_price": TOP_ORDERS_SQL,
    "orders_semijoin_bigqty": SEMIJOIN_SQL,
    "parts_antijoin_unsold": ANTIJOIN_SQL,
}
