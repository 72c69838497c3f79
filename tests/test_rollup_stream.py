"""Continuous rollup (C4 streaming): partial-aggregate appends per
micro-batch, associative merge on read, late data folds in, compaction
preserves results."""

from promhouse_spark.schemas import SAMPLES_SCHEMA
from promhouse_spark.storage.parquet import SparkParquetStorage
from promhouse_spark.streaming.rollup import (
    compact_rollup,
    downsample_partial,
    merge_rollup,
    read_rollup,
    start_rollup_stream,
)
from tests.fixtures import T0


def _rollup_map(df):
    return {
        (r["fingerprint"], r["window_start_ms"]): (
            r["n"],
            round(r["sum_value"], 6),
            r["min_value"],
            r["max_value"],
            r["last_value"],
        )
        for r in df.collect()
    }


def test_partials_merge_equals_batch(spark):
    """Splitting the input into arbitrary batches must not change the merged
    rollup (monoid property)."""
    rows = [(1, T0 + i * 60_000, float(i)) for i in range(10)] + [
        (2, T0 + 30_000, 5.0),
        (2, T0 + 400_000, 7.0),
    ]
    full = spark.createDataFrame(rows, SAMPLES_SCHEMA)
    merged_once = _rollup_map(merge_rollup(downsample_partial(full)))
    # two batches split mid-window + a late-data batch out of order
    b1 = spark.createDataFrame(rows[7:], SAMPLES_SCHEMA)
    b2 = spark.createDataFrame(rows[:7], SAMPLES_SCHEMA)
    partials = downsample_partial(b1).unionByName(downsample_partial(b2))
    assert _rollup_map(merge_rollup(partials)) == merged_once


def test_streaming_rollup_end_to_end(spark, tmp_path):
    store = SparkParquetStorage(spark, str(tmp_path / "store"))
    rollup = str(tmp_path / "rollup")
    ck = str(tmp_path / "ck")

    rows = [(1, T0 + i * 60_000, float(i)) for i in range(5)]
    store.ingest_df(spark.createDataFrame(rows, SAMPLES_SCHEMA))

    q = start_rollup_stream(spark, store.samples_path, rollup, ck, step_ms=300_000, trigger_seconds=1)
    try:
        q.processAllAvailable()
        # late/new data lands in a second micro-batch
        store.ingest_df(
            spark.createDataFrame([(1, T0 + 90_000, 100.0)], SAMPLES_SCHEMA)
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got = _rollup_map(read_rollup(spark, rollup))
    w0 = got[(1, T0 - (T0 % 300_000))]
    assert w0[0] == 6  # 5 original + 1 late sample in the first window
    assert w0[3] == 100.0  # max picked up the late value
    # compaction collapses partials without changing the merged view
    compact_rollup(spark, rollup)
    assert _rollup_map(read_rollup(spark, rollup)) == got
