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

import pytest

# slow tier (r12): continuous rollup stream integration. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow


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


def test_rollup_range_agg_pushdown_matches_raw_engine(spark):
    """The aggregation-pushdown path: *_over_time served from rollup
    partials must equal the compiled engine over the RAW samples whenever
    grid and range align to whole rollup windows (samples placed off the
    bucket boundaries so the two window conventions coincide)."""
    import pytest as _pytest
    from pyspark.sql import Row

    from promhouse_spark.promql import PromQLEngine
    from promhouse_spark.streaming.rollup import downsample_partial, rollup_range_agg

    T0 = 1_767_225_600_000
    R = 60_000  # rollup window
    rows = []
    rng_vals = [3.1, 7.4, 2.2, 9.9, 5.5, 1.0, 8.8, 4.4]
    for fp in (1, 2):
        for i in range(40):
            # offsets 7s/37s inside each 60s bucket — never on a boundary
            for off in (7_000, 37_000):
                rows.append(
                    (fp, T0 + i * R + off, rng_vals[(i + fp + off // 1000) % 8] * fp)
                )
    df = spark.createDataFrame(
        rows, "fingerprint long, timestamp_ms long, value double"
    )
    # two partial batches exercise the associative merge
    p1 = downsample_partial(df.filter("timestamp_ms % 2 = 0"), R)
    p2 = downsample_partial(df.filter("timestamp_ms % 2 = 1"), R)
    partials = p1.unionByName(p2)

    series = spark.createDataFrame(
        [Row(fingerprint=f, labels={"__name__": "m", "f": str(f)}) for f in (1, 2)],
        "fingerprint long, labels map<string,string>",
    )
    start, end, step, rng = T0 + 600_000, T0 + 1_800_000, 300_000, 600_000
    eng = PromQLEngine(df, series, start, end, step)
    for func in (
        "sum_over_time", "count_over_time", "min_over_time",
        "max_over_time", "avg_over_time", "last_over_time",
    ):
        got = {
            (r["fingerprint"], r["eval_ms"]): r["value"]
            for r in rollup_range_agg(partials, R, func, rng, step)
            .filter(f"eval_ms between {start} and {end}")
            .collect()
        }
        want = {
            (int(r["labels"]["f"]), r["eval_ms"]): r["value"]
            for r in eng.eval(f"{func}(m[10m])").collect()
        }
        assert set(got) == set(want), func
        for k, v in want.items():
            assert got[k] == _pytest.approx(v), (func, k)
    # misalignment and non-decomposable functions are rejected, not wrong
    with _pytest.raises(ValueError):
        rollup_range_agg(partials, R, "rate", rng, step)
    with _pytest.raises(ValueError):
        rollup_range_agg(partials, R, "sum_over_time", rng + 1, step)


def test_rollup_max_nan_semantics(spark):
    """Go max fold through the rollup: NaN never displaces a numeric max
    at partial, merge, or pushdown level; an all-NaN window stays NaN."""
    import math

    from pyspark.sql import Row, functions as F

    from promhouse_spark.streaming.rollup import (
        downsample_partial,
        merge_rollup,
        rollup_range_agg,
    )

    nan = float("nan")
    rows = [
        Row(fingerprint=1, timestamp_ms=0, value=5.0),
        Row(fingerprint=1, timestamp_ms=1_000, value=nan),
        Row(fingerprint=2, timestamp_ms=0, value=nan),
        Row(fingerprint=2, timestamp_ms=1_000, value=nan),
    ]
    sdf = spark.createDataFrame(
        rows, "fingerprint long, timestamp_ms long, value double"
    )
    part = downsample_partial(sdf, 60_000)
    by_fp = {r["fingerprint"]: r["max_value"] for r in part.collect()}
    assert by_fp[1] == 5.0 and math.isnan(by_fp[2])
    merged = merge_rollup(part.unionByName(part))
    by_fp = {r["fingerprint"]: r["max_value"] for r in merged.collect()}
    assert by_fp[1] == 5.0 and math.isnan(by_fp[2])
    out = rollup_range_agg(part, 60_000, "max_over_time", 60_000, 60_000)
    vals = {
        r["fingerprint"]: r["value"]
        for r in out.filter(F.col("eval_ms") == 60_000).collect()
    }
    assert vals[1] == 5.0 and math.isnan(vals[2])
