"""Final-wave TPC-H query shapes (Q2, Q8, Q9, Q11, Q16, Q20) — with these the
raw-SQL analytics surface (O7, ``clickhouse.go:193-215``) covers all 22
public TPC-H patterns. The testdata schema has no ``partsupp`` table, so the
supply relationship is derived where needed: distinct ``(l_partkey,
l_suppkey)`` pairs from lineitem, with unit price (``l_extendedprice /
l_quantity``) standing in for ``ps_supplycost`` and shipped quantity for
``ps_availqty`` — the *query shapes* (correlated regional min, market-share
ratio, profit star join, scalar HAVING threshold, NOT-IN exclusion,
dominant-share semi-join chain) are the originals.

Scale notes: every derived set (per-pair unit costs, per-part totals) is
SF-scaled — no broadcast hints; AQE picks strategies at runtime. Correlated
subqueries are decorrelated as window aggregates sharing the probe-side
shuffle (one scan, one exchange) rather than aggregate-plus-join-back; the
only crossJoined scalars are 1-row aggregates (broadcast nested loop of a
single row). Oracles are written in the original correlated-subquery form so
DuckDB reaches the same answer by a genuinely different plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from promhouse_spark.session import load_table


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived supply relationship: one row per (part, supplier) pair
    that ever shipped, with the minimum observed unit price as the cost."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("sp_partkey"),
        F.col("l_suppkey").alias("sp_suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("sp_cost"))


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier — for each STANDARD small part,
    the EUROPE supplier(s) whose unit cost equals the regional minimum for
    that part. The correlated regional-min subquery decorrelates as a window
    min over partkey on the region-filtered supply set: the filter and the
    min see exactly the same frame, so one shuffle on partkey replaces the
    aggregate-plus-join-back (two scans, three exchanges)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_sup = (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    supply = _supply(spark, sf_dir)
    min_cost = F.min("sp_cost").over(W.partitionBy("sp_partkey"))
    return (
        supply.join(part.select("p_partkey"), F.col("sp_partkey") == F.col("p_partkey"), "left_semi")
        .join(eu_sup, F.col("sp_suppkey") == F.col("s_suppkey"))
        .withColumn("min_cost", min_cost)
        .filter(F.col("sp_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("sp_partkey").alias("p_partkey"),
            F.round("sp_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH supply AS (
  SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
         min(l_extendedprice / l_quantity) AS sp_cost
  FROM lineitem GROUP BY 1, 2
)
SELECT s_acctbal, s_name, n_name, sp_partkey AS p_partkey,
       round(sp_cost, 4) AS unit_cost
FROM supply
JOIN part ON p_partkey = sp_partkey
JOIN supplier ON s_suppkey = sp_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE p_size <= 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  AND sp_cost = (SELECT min(s2.sp_cost)
                 FROM supply s2
                 JOIN supplier ON s_suppkey = s2.sp_suppkey
                 JOIN nation ON n_nationkey = s_nationkey
                 JOIN region ON r_regionkey = n_regionkey
                 WHERE s2.sp_partkey = supply.sp_partkey AND r_name = 'EUROPE')
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — NATION_5's share of PROMO-part
    revenue in the ASIA customer market, by order year. One star join; the
    share is a conditional-sum / total-sum ratio per group (both operands
    rounded before dividing, the Q14 bit-stability rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cnat = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    snat = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_vol = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0))
    return (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"), "left_semi")
        .join(sup, li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(snat), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.round(F.sum(nat_vol), 2) / F.round(F.sum(vol), 2)).alias("mkt_share"),
            F.count("*").cast("long").alias("n_lines"),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_5'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
       / round(sum(l_extendedprice * (1 - l_discount)), 2) AS mkt_share,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n1.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
GROUP BY o_year
ORDER BY o_year
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by nation and year. With no
    ps_supplycost, cost = 50% of the part's retail price per unit; profit =
    discounted revenue minus cost. Star join, two SF-scaled fact/dim joins
    (part, supplier) left to AQE, 25-row nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part.select("p_partkey", "p_retailprice"), li.l_partkey == F.col("p_partkey"))
        .join(sup, li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.5 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(l_shipdate)
ORDER BY nation, o_year DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: scalar HAVING against a global aggregate — parts
    whose shipped value through NATION_3 suppliers exceeds 0.1% of the
    national total. The per-part view is computed once and reused for both
    the rows and the 1-row total (Q15's shared-view pattern); the threshold
    crossJoins back as a broadcast nested loop of one row."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_sup = sup.join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    per_part = (
        li.join(nat_sup, li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("value"))
    )
    total = per_part.agg(F.sum("value").alias("total_value"))
    return (
        per_part.crossJoin(total)
        .filter(F.col("value") > F.lit(0.001) * F.col("total_value"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
        .orderBy(F.desc("value"), "p_partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, value
FROM per_part
WHERE value > (SELECT 0.001 * sum(value) FROM per_part)
ORDER BY value DESC, p_partkey
"""


def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier count per part attribute with a NOT-IN
    exclusion — how many distinct suppliers ship each (brand, type, size)
    combo, excluding one brand, one type, and suppliers in arrears
    (negative balance standing in for the complaints filter). NOT IN ≡
    left-anti on the null-free key; countDistinct shuffles once on the
    3-attribute group key."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21))
    )
    bad_sup = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = _supply(spark, sf_dir)
    return (
        pairs.join(bad_sup, pairs.sp_suppkey == F.col("s_suppkey"), "left_anti")
        .join(
            part.select("p_partkey", "p_brand", "p_type", "p_size"),
            pairs.sp_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("sp_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain — EUROPE suppliers that
    dominated a 'small' part in 1997 (shipped more than half of that part's
    total 1997 quantity). The correlated half-of-total subquery decorrelates
    as a window sum over partkey on the already part- and year-filtered
    aggregate; the dominant pairs then semi-join into the supplier list, so
    supplier attributes are never widened through the fact scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    qty = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("pair_qty"))
        .withColumn("part_qty", F.sum("pair_qty").over(W.partitionBy("l_partkey")))
        .filter(F.col("pair_qty") > F.lit(0.5) * F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .join(qty, sup.s_suppkey == qty.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


Q20_SQL = """
WITH qty AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
  FROM lineitem
  WHERE year(l_shipdate) = 1997
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY 1, 2
)
SELECT s_name, round(s_acctbal, 2) AS acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey FROM qty
    WHERE pair_qty > 0.5 * (SELECT sum(q2.pair_qty) FROM qty q2
                            WHERE q2.l_partkey = qty.l_partkey)
  )
ORDER BY s_name
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_stock": q11_important_stock,
    "q16_supplier_relationship": q16_supplier_relationship,
    "q20_dominant_supplier": q20_dominant_supplier,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_type_profit": Q9_SQL,
    "q11_important_stock": Q11_SQL,
    "q16_supplier_relationship": Q16_SQL,
    "q20_dominant_supplier": Q20_SQL,
}
