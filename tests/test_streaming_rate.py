"""Streaming sliding-window rate (streaming/rate.py): the batch form must
equal the compiled PromQL rate() row-for-row, and the streaming form must
finalize the same rows via append-mode watermarking across micro-batches."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import Row

from promhouse_spark.schemas import SAMPLES_SCHEMA
from promhouse_spark.streaming.rate import sliding_rate, start_sliding_rate_stream

# slow tier (r12): streaming rate integration. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow


T0 = 1_767_225_600_000  # aligned to every step used here


def _counter_rows(mult: float, fp: int, n: int = 41):
    return [(fp, T0 + i * 15_000, float(i) * 15.0 * mult) for i in range(n)]


def test_batch_sliding_rate_matches_compiled_promql(spark):
    rows = _counter_rows(1.0, 1) + _counter_rows(2.0, 2)
    df = spark.createDataFrame(rows, SAMPLES_SCHEMA)

    got = {
        (r.fingerprint, r.eval_ms): r.rate
        for r in sliding_rate(df, range_ms=120_000, step_ms=60_000).collect()
    }
    # the compiled engine evaluates the same grid (epoch-aligned start)
    from promhouse_spark.promql import PromQLEngine

    series = spark.createDataFrame(
        [Row(fingerprint=1, labels={"__name__": "m", "i": "1"}),
         Row(fingerprint=2, labels={"__name__": "m", "i": "2"})],
        "fingerprint long, labels map<string,string>",
    )
    eng = PromQLEngine(
        df, series, start_ms=T0 + 120_000, end_ms=T0 + 600_000, step_ms=60_000
    )
    compiled = eng.eval("rate(m[2m])").collect()
    want = {
        (int(r.labels["i"]), r.eval_ms): r.value for r in compiled
    }
    shared = {k: v for k, v in got.items() if k in want}
    assert len(shared) == len(want) > 0
    for k, v in want.items():
        assert got[k] == pytest.approx(v), k
    # linear counters: the rate is exactly the slope
    assert got[(1, T0 + 300_000)] == pytest.approx(1.0)
    assert got[(2, T0 + 300_000)] == pytest.approx(2.0)


def test_batch_sliding_rate_handles_resets_and_gauges(spark):
    rows = [(1, T0 + i * 15_000, v) for i, v in enumerate([0.0, 30.0, 10.0, 40.0, 70.0])]
    df = spark.createDataFrame(rows, SAMPLES_SCHEMA)
    out = {
        r.eval_ms: r.increase
        for r in sliding_rate(df, range_ms=60_000, step_ms=60_000).collect()
    }
    # window (T0, T0+60]: samples at 15/30/45/60 s (ts=0 excluded — the
    # range is left-open), deltas reset(10) + 30 + 30 = 70; sampled 45 s,
    # head = to_start = 15 s (< 1.1*avg_iv, and to_zero = 45*30/70 > 15),
    # tail = 0 → increase = 70 * (45+15+0)/45
    assert out[T0 + 60_000] == pytest.approx(70 * 60 / 45)
    gauge = {
        r.eval_ms: r.increase
        for r in sliding_rate(
            df, range_ms=60_000, step_ms=60_000, counter=False
        ).collect()
    }
    # gauge delta ignores the reset: 70 - 30 extrapolated the same way
    assert gauge[T0 + 60_000] == pytest.approx(40 * 60 / 45)


def test_streaming_rate_end_to_end(spark, tmp_path):
    src = str(tmp_path / "samples")
    out = str(tmp_path / "rates")
    ck = str(tmp_path / "ck")

    b1 = spark.createDataFrame(_counter_rows(1.0, 1, 21), SAMPLES_SCHEMA)
    b1.write.mode("append").parquet(src)

    q = start_sliding_rate_stream(
        spark, src, out, ck, range_ms=120_000, step_ms=60_000, trigger_seconds=1
    )
    try:
        q.processAllAvailable()
        # second micro-batch extends the series; a far-future flush sample
        # advances the watermark so earlier evaluations finalize
        b2 = spark.createDataFrame(
            _counter_rows(1.0, 1, 41)[21:]
            + [(9, T0 + 3 * 3600 * 1000, 0.0), (9, T0 + 3 * 3600 * 1000 + 1, 0.0)],
            SAMPLES_SCHEMA,
        )
        b2.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.fingerprint, r.eval_ms): r.rate
        for r in spark.read.parquet(out).filter("fingerprint = 1").collect()
    }
    assert got, "no finalized rows"
    # every finalized row equals the batch computation on the full data
    full = spark.createDataFrame(_counter_rows(1.0, 1, 41), SAMPLES_SCHEMA)
    want = {
        (r.fingerprint, r.eval_ms): r.rate
        for r in sliding_rate(full, range_ms=120_000, step_ms=60_000).collect()
    }
    for k, v in got.items():
        assert v == pytest.approx(want[k]), k
    # the steady-state windows saw both micro-batches' samples
    assert got[(1, T0 + 360_000)] == pytest.approx(1.0)
