"""Bucketed layout (storage/bucketed.py): joins and aggregations on the
bucket key must be exchange-free, and the bucketed result must equal the
plain-parquet computation exactly."""

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from promhouse_spark.storage import bucketed as B


@pytest.fixture(scope="module")
def bucketed_table(spark):
    rows = [(i, i % 7, float(i * 13 % 101)) for i in range(1000)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    table = f"phs_test_bucketed_{uuid.uuid4().hex[:8]}"
    path = tempfile.mkdtemp(prefix="phs-test-bucketed-") + "/t"
    B.write_bucketed(df, table, path, key="user_id", num_buckets=4,
                     sort_cols=("user_id", "event_id"))
    yield spark.table(table), df
    B.drop_bucketed(spark, table)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_groupby_on_bucket_key_no_exchange(bucketed_table):
    evb, _ = bucketed_table
    agg = evb.groupBy("user_id").agg(F.count("*").alias("n"))
    assert "Exchange" not in _plan(agg)


def test_join_on_bucket_key_no_hash_exchange(bucketed_table):
    evb, _ = bucketed_table
    stats = evb.groupBy("user_id").agg(F.avg("value").alias("avg_value"))
    joined = evb.join(stats, "user_id").filter(F.col("value") > F.col("avg_value"))
    assert "Exchange hashpartitioning" not in _plan(joined)


def test_bucketed_result_equals_plain(bucketed_table):
    evb, plain = bucketed_table

    def compute(df):
        stats = df.groupBy("user_id").agg(F.avg("value").alias("avg_value"))
        return (
            df.join(stats, "user_id")
            .filter(F.col("value") > F.col("avg_value"))
            .groupBy("user_id")
            .agg(F.count("*").cast("long").alias("n_above"))
            .orderBy("user_id")
        )

    assert compute(evb).collect() == compute(plain).collect()


def test_scan_parallelism_is_bucket_count(bucketed_table):
    # the scan runs at num_buckets tasks — the docstring's sizing contract
    evb, _ = bucketed_table
    assert evb.rdd.getNumPartitions() == 4
