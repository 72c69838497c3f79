"""Salted-operator tests: result equality with the unsalted formulation on
skewed data, determinism across runs, and plan-shape checks (the salt must
actually appear in the pre-aggregate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from promhouse_spark.operators import skew as K


@pytest.fixture(scope="module")
def skewed(spark):
    # power-law: key 'hot' has 5000 rows / 500 distinct values,
    # 20 cold keys have 10 rows each
    hot = spark.range(5000).select(
        F.lit("hot").alias("k"), (F.col("id") % 500).cast("string").alias("v")
    )
    cold = spark.range(200).select(
        F.concat(F.lit("c"), (F.col("id") % 20).cast("string")).alias("k"),
        (F.col("id") % 7).cast("string").alias("v"),
    )
    return hot.unionAll(cold).cache()


def test_salted_count_distinct_matches_exact(spark, skewed):
    got = {
        r["k"]: r["n_distinct"]
        for r in K.salted_count_distinct(skewed, ["k"], "v", n_salts=16).collect()
    }
    want = {
        r["k"]: r["n"]
        for r in skewed.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == want
    assert got["hot"] == 500


def test_salted_count_distinct_deterministic(skewed):
    a = sorted(map(tuple, K.salted_count_distinct(skewed, ["k"], "v").collect()))
    b = sorted(map(tuple, K.salted_count_distinct(skewed, ["k"], "v").collect()))
    assert a == b


def test_salt_reaches_the_partial_aggregate(skewed):
    plan = K.salted_count_distinct(skewed, ["k"], "v", n_salts=16)._jdf.queryExecution().optimizedPlan().toString()
    # phase-1 grouping really is (k, hash-salt): the salt expression (or its
    # alias, pre-pruning) must survive into the optimized aggregate
    assert "__salt" in plan or ("xxhash64" in plan and "pmod" in plan)


def test_salted_collect_set_matches(spark, skewed):
    got = {
        r["k"]: list(r["values"])
        for r in K.salted_collect_set(skewed, ["k"], "v", n_salts=8).collect()
    }
    want = {
        r["k"]: sorted(r["vals"])
        for r in skewed.groupBy("k").agg(F.collect_set("v").alias("vals")).collect()
    }
    assert got == want


def test_salted_join_row_identical(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("c1", "C1"), ("c2", "C2"), ("missing", "M")],
        "k string, label string",
    )
    plain = sorted(map(tuple, skewed.join(dim, ["k"], "inner").collect()))
    salted = sorted(map(tuple, K.salted_join(skewed, dim, ["k"], n_salts=4).collect()))
    assert salted == plain

    plain_l = sorted(
        map(tuple, skewed.join(dim, ["k"], "left").select("k", "v", "label").collect())
    )
    salted_l = sorted(
        map(
            tuple,
            K.salted_join(skewed, dim, ["k"], n_salts=4, how="left")
            .select("k", "v", "label")
            .collect(),
        )
    )
    assert salted_l == plain_l


def test_salted_join_rejects_right(skewed, spark):
    dim = spark.createDataFrame([("hot", 1)], "k string, x int")
    with pytest.raises(ValueError):
        K.salted_join(skewed, dim, ["k"], how="right")


def test_key_histogram_orders_heaviest_first(skewed):
    rows = K.key_histogram(skewed, ["k"], top=3).collect()
    assert rows[0]["k"] == "hot" and rows[0]["n_rows"] == 5000
    assert all(rows[i]["n_rows"] >= rows[i + 1]["n_rows"] for i in range(len(rows) - 1))
