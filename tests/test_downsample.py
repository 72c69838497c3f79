"""Downsample rollup (C4) against a hand-computed oracle."""

from pyspark.sql import functions as F

from promhouse_spark.operators.downsample import downsample
from promhouse_spark.schemas import SAMPLES_SCHEMA


def test_downsample_5m(spark):
    rows = [
        # fp=1: two windows
        (1, 0, 10.0),
        (1, 100_000, 20.0),
        (1, 299_999, 30.0),
        (1, 300_000, 40.0),
        # fp=2: one window, check last_value picks max-ts
        (2, 250_000, 5.0),
        (2, 150_000, 7.0),
    ]
    df = spark.createDataFrame(rows, SAMPLES_SCHEMA)
    got = {
        (r["fingerprint"], r["window_start_ms"]): r
        for r in downsample(df, 300_000).collect()
    }
    w10 = got[(1, 0)]
    assert w10["n"] == 3 and w10["min_value"] == 10.0 and w10["max_value"] == 30.0
    assert w10["last_value"] == 30.0 and abs(w10["avg_value"] - 20.0) < 1e-9
    assert got[(1, 300_000)]["n"] == 1
    w2 = got[(2, 0)]
    assert w2["last_value"] == 5.0  # ts=250k beats ts=150k
    assert str(w10["date"]) == "1970-01-01"


def test_downsample_day_partition_alignment(spark):
    day_ms = 86_400_000
    df = spark.createDataFrame([(1, day_ms * 3 + 42, 1.0)], SAMPLES_SCHEMA)
    row = downsample(df, 3_600_000).collect()[0]
    assert row["window_start_ms"] == day_ms * 3
    assert str(row["date"]) == "1970-01-04"
