"""Continuous native-histogram building (streaming/nhist.py): partial
histograms per micro-batch, associative merge on read (monoid property:
streaming ≡ batch hist_build on the same data), late data folds in,
compaction preserves results, and the merged tier answers wire quantile
queries."""

from __future__ import annotations

import pytest

from promhouse_spark.operators.nativehist import (
    hist_build,
    hist_to_wire,
    wire_hist_quantile,
)
from promhouse_spark.schemas import SAMPLES_SCHEMA
from promhouse_spark.storage.parquet import SparkParquetStorage
from promhouse_spark.streaming.nhist import (
    compact_hist_rollup,
    hist_partial,
    merge_hist_rollup,
    read_hist_rollup,
    start_hist_rollup_stream,
)
from tests.fixtures import T0

from pyspark.sql import functions as F

# slow tier (r12): streaming native-histogram integration. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow


def _hist_map(df):
    return {
        (r["fingerprint"], r["window_start_ms"]): (
            r["zero_count"],
            r["count"],
            r["sum_cents"],
            tuple((b["idx"], b["cnt"]) for b in r["buckets"]),
        )
        for r in df.collect()
    }


def _obs(fp: int, i: int, v: float) -> tuple:
    return (fp, T0 + i * 60_000, v)


def test_partials_merge_equals_batch(spark):
    rows = [_obs(1, i, float(i)) for i in range(10)] + [
        _obs(2, 0, 0.005),  # rounds to cents 1 (idx 0)
        _obs(2, 7, 123.45),
    ]
    full = spark.createDataFrame(rows, SAMPLES_SCHEMA).withColumn(
        "window_start_ms",
        F.col("timestamp_ms") - F.pmod(F.col("timestamp_ms"), F.lit(300_000)),
    )
    batch = _hist_map(
        hist_build(full, "value", by=["fingerprint", "window_start_ms"])
    )
    # arbitrary split incl. a mid-window boundary and out-of-order late rows
    b1 = spark.createDataFrame(rows[7:], SAMPLES_SCHEMA)
    b2 = spark.createDataFrame(rows[:7], SAMPLES_SCHEMA)
    partials = hist_partial(b1).unionByName(hist_partial(b2))
    assert _hist_map(merge_hist_rollup(partials)) == batch


def test_streaming_hist_rollup_end_to_end(spark, tmp_path):
    store = SparkParquetStorage(spark, str(tmp_path / "store"))
    rollup = str(tmp_path / "hist_rollup")
    ck = str(tmp_path / "ck")

    rows = [_obs(1, i, float(i + 1)) for i in range(5)]
    store.ingest_df(spark.createDataFrame(rows, SAMPLES_SCHEMA))

    q = start_hist_rollup_stream(
        spark, store.samples_path, rollup, ck, step_ms=300_000, trigger_seconds=1
    )
    try:
        q.processAllAvailable()
        # a late observation lands in a second micro-batch
        store.ingest_df(
            spark.createDataFrame([_obs(1, 1, 100.0)], SAMPLES_SCHEMA)
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got = _hist_map(read_hist_rollup(spark, rollup))
    w0 = T0 - (T0 % 300_000)
    # first window: samples at i=0..4 (values 1..5) + the late 100.0
    z, n, s, buckets = got[(1, w0)]
    assert n == 6
    assert s == sum(c for c in (100, 200, 300, 400, 500, 10000))
    # streaming result ≡ batch build over everything written
    all_rows = rows + [_obs(1, 1, 100.0)]
    batch = _hist_map(
        hist_build(
            spark.createDataFrame(all_rows, SAMPLES_SCHEMA).withColumn(
                "window_start_ms",
                F.col("timestamp_ms")
                - F.pmod(F.col("timestamp_ms"), F.lit(300_000)),
            ),
            "value",
            by=["fingerprint", "window_start_ms"],
        )
    )
    assert got == batch
    # compaction collapses partials without changing the merged view
    compact_hist_rollup(spark, rollup)
    assert _hist_map(read_hist_rollup(spark, rollup)) == got


def test_merged_tier_answers_wire_quantile(spark):
    # 100 observations of value k cents (k=1..100) in one window: the
    # median interpolates inside the bucket containing rank 50
    rows = [(1, T0 + i, i / 100.0 + 0.001) for i in range(1, 101)]
    partials = hist_partial(spark.createDataFrame(rows, SAMPLES_SCHEMA))
    wire = hist_to_wire(
        merge_hist_rollup(partials),
        {"fp": F.col("fingerprint")},
        F.col("window_start_ms"),
    )
    (r,) = wire_hist_quantile(wire, 0.5).collect()
    # rank 50: buckets idx0:1, idx1:1, idx2:2, idx3:4 ... idx k holds
    # 2^(k-1) obs (cents 2^(k-1)+1..2^k); cum through idx5 = 32, idx6
    # holds 32 (cents 33..64) → rank 50 interpolates in (32, 64]:
    # 32 + 32·(50−32)/32 = 50 cents
    assert r["quantile_value"] == pytest.approx(50.0)
