"""Streaming recording rules (streaming/rules.py): the per-series +
label-aggregation pipeline must equal the batch PromQL engine on the same
data (differential), and the live stream must finalize the same recorded
rows via append-mode watermarking across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from promhouse_spark.promql import PromQLEngine
from promhouse_spark.schemas import SAMPLES_SCHEMA
from promhouse_spark.streaming.rules import (

    compile_streaming_rule,
    recorded_frame,
    rule_series_frame,
    start_streaming_rule,
)

# slow tier (r12): streaming rule integration. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow

T0 = 1_767_225_600_000  # epoch-aligned to the 60 s step


def _counter_rows(mult: float, fp: int, n: int = 41):
    return [(fp, T0 + i * 15_000, float(i) * 15.0 * mult) for i in range(n)]


def _series(spark):
    return spark.createDataFrame(
        [
            Row(fingerprint=1, labels={"__name__": "m", "job": "a", "i": "1"}),
            Row(fingerprint=2, labels={"__name__": "m", "job": "a", "i": "2"}),
            Row(fingerprint=7, labels={"__name__": "other", "job": "a"}),
        ],
        "fingerprint long, labels map<string,string>",
    )


def test_compile_validation():
    r = compile_streaming_rule("x", "sum by (job) (increase(m[2m]))")
    assert r.func == "increase" and r.range_ms == 120_000 and r.by == ["job"]
    r = compile_streaming_rule("x", 'avg_over_time(m{job="a"}[5m])')
    assert r.agg_op is None and r.range_ms == 300_000
    r = compile_streaming_rule("x", "m", lookback_ms=120_000)
    assert r.func == "last_over_time" and r.range_ms == 120_000
    for bad in (
        "a / b",  # vector matching: two stateful inputs
        "topk(3, m)",  # non-streamable aggregation
        "rate(m[5m] offset 1m)",  # offset
        "max_over_time(rate(m[5m])[30m:1m])",  # subquery
        "sum(sum by (job) (m))",  # nested aggregation
    ):
        with pytest.raises(ValueError):
            compile_streaming_rule("x", bad)


def _batch_recorded(spark, df, record, expr, step_ms=60_000):
    series = _series(spark)
    rule = compile_streaming_rule(record, expr)
    per = rule_series_frame(df, series, rule, step_ms=step_ms)
    return recorded_frame(per, series, rule)


def test_batch_parity_with_engine_increase(spark):
    rows = _counter_rows(1.0, 1) + _counter_rows(2.0, 2)
    df = spark.createDataFrame(rows, SAMPLES_SCHEMA)
    rec = _batch_recorded(spark, df, "job:m:increase2m", "sum by (job) (increase(m[2m]))")
    got = {r["timestamp_ms"]: (dict(r["labels"]), r["value"]) for r in rec.collect()}
    assert got, "no recorded rows"
    eng = PromQLEngine(
        df, _series(spark), start_ms=T0 + 120_000, end_ms=T0 + 600_000, step_ms=60_000
    )
    want = {
        r["eval_ms"]: r["value"]
        for r in eng.eval("sum by (job) (increase(m[2m]))").collect()
    }
    shared = set(got) & set(want)
    assert len(shared) == len(want) > 0
    for t in shared:
        labels, v = got[t]
        assert labels == {"__name__": "job:m:increase2m", "job": "a"}
        assert v == pytest.approx(want[t]), t
    # linear counters at rates 1 and 2: the summed 2 m increase is 360
    assert got[T0 + 360_000][1] == pytest.approx(360.0)


def test_batch_parity_with_engine_instant(spark):
    rows = _counter_rows(1.0, 1) + _counter_rows(2.0, 2)
    df = spark.createDataFrame(rows, SAMPLES_SCHEMA)
    rec = _batch_recorded(spark, df, "job:m:sum", "sum by (job) (m)")
    got = {r["timestamp_ms"]: r["value"] for r in rec.collect()}
    eng = PromQLEngine(
        df, _series(spark), start_ms=T0 + 120_000, end_ms=T0 + 600_000, step_ms=60_000
    )
    want = {r["eval_ms"]: r["value"] for r in eng.eval("sum by (job) (m)").collect()}
    shared = set(got) & set(want)
    assert len(shared) == len(want) > 0
    for t in shared:
        assert got[t] == pytest.approx(want[t]), t


def test_batch_parity_with_engine_bare_sum(spark):
    """Bare sum(...) (no by/without) collapses to ONE series — PromQL
    drops every label; by=None must not mean group-by-all-labels."""
    rows = _counter_rows(1.0, 1) + _counter_rows(2.0, 2)
    df = spark.createDataFrame(rows, SAMPLES_SCHEMA)
    rec = _batch_recorded(spark, df, "all:m:sum", "sum(increase(m[2m]))")
    out = rec.collect()
    assert out, "no recorded rows"
    # exactly one series: the record name alone
    assert {tuple(sorted(r["labels"].items())) for r in out} == {
        (("__name__", "all:m:sum"),)
    }
    eng = PromQLEngine(
        df, _series(spark), start_ms=T0 + 120_000, end_ms=T0 + 600_000, step_ms=60_000
    )
    want = {
        r["eval_ms"]: r["value"]
        for r in eng.eval("sum(increase(m[2m]))").collect()
    }
    got = {r["timestamp_ms"]: r["value"] for r in out}
    shared = set(got) & set(want)
    assert len(shared) == len(want) > 0
    for t in shared:
        assert got[t] == pytest.approx(want[t]), t


def test_matcher_resolution_excludes_other_series(spark):
    rows = _counter_rows(1.0, 1) + [(7, T0 + i * 15_000, 99.0) for i in range(41)]
    df = spark.createDataFrame(rows, SAMPLES_SCHEMA)
    rec = _batch_recorded(spark, df, "r", 'sum by (job) (m{i="1"})')
    vals = [r["value"] for r in rec.collect()]
    assert vals and all(v < 99.0 * 41 for v in vals)  # fp7 (name "other") excluded


def test_streaming_rule_end_to_end(spark, tmp_path):
    src = str(tmp_path / "samples")
    out = str(tmp_path / "recorded")
    ck = str(tmp_path / "ck")
    series = _series(spark)

    b1 = spark.createDataFrame(
        _counter_rows(1.0, 1, 21) + _counter_rows(2.0, 2, 21), SAMPLES_SCHEMA
    )
    b1.write.mode("append").parquet(src)
    q = start_streaming_rule(
        spark,
        src,
        series,
        "job:m:increase2m",
        "sum by (job) (increase(m[2m]))",
        out,
        ck,
        step_ms=60_000,
        trigger_seconds=1,
    )
    try:
        q.processAllAvailable()
        # second micro-batch extends both series; far-future samples on a
        # matched series advance the watermark so earlier evals finalize
        flush_ts = T0 + 3 * 3600 * 1000
        b2 = spark.createDataFrame(
            _counter_rows(1.0, 1, 41)[21:]
            + _counter_rows(2.0, 2, 41)[21:]
            + [(1, flush_ts, 0.0), (1, flush_ts + 1, 0.0)],
            SAMPLES_SCHEMA,
        )
        b2.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rec = spark.read.parquet(out)
    got = {r["timestamp_ms"]: r["value"] for r in rec.collect()}
    assert got, "no finalized recorded rows"
    assert all(r["labels"]["__name__"] == "job:m:increase2m" for r in rec.collect())
    # every finalized row equals the batch pipeline over the full data
    full = spark.createDataFrame(
        _counter_rows(1.0, 1, 41)
        + _counter_rows(2.0, 2, 41)
        + [(1, T0 + 3 * 3600 * 1000, 0.0), (1, T0 + 3 * 3600 * 1000 + 1, 0.0)],
        SAMPLES_SCHEMA,
    )
    want = {
        r["timestamp_ms"]: r["value"]
        for r in _batch_recorded(
            spark, full, "job:m:increase2m", "sum by (job) (increase(m[2m]))"
        ).collect()
    }
    for t, v in got.items():
        assert v == pytest.approx(want[t]), t
    # a steady-state evaluation whose window spans BOTH micro-batches
    assert got[T0 + 360_000] == pytest.approx(360.0)


def test_streaming_rule_group(spark, tmp_path):
    """A whole rule group runs as independent queries; each record's
    output carries its own __name__ and matches the batch pipeline."""
    from promhouse_spark.streaming.rules import start_streaming_rule_group

    src = str(tmp_path / "samples")
    out = str(tmp_path / "rec")
    ck = str(tmp_path / "ck")
    series = _series(spark)
    rows = _counter_rows(1.0, 1, 41) + _counter_rows(2.0, 2, 41)
    flush = [(1, T0 + 3 * 3600 * 1000, 0.0), (1, T0 + 3 * 3600 * 1000 + 1, 0.0)]
    spark.createDataFrame(rows + flush, SAMPLES_SCHEMA).write.parquet(src)
    group = {
        "name": "g",
        "interval_ms": 60_000,
        "rules": [
            {"record": "job:m:increase2m", "expr": "sum by (job) (increase(m[2m]))"},
            {"record": "job:m:max5m", "expr": "max_over_time(m[5m])"},
            {"alert": "skipped", "expr": "sum(m) > 1"},  # alerting: not here
        ],
    }
    qs = start_streaming_rule_group(spark, src, series, group, out, ck,
                                    trigger_seconds=1)
    try:
        assert set(qs) == {"job:m:increase2m", "job:m:max5m"}
        for q in qs.values():
            q.processAllAvailable()
    finally:
        for q in qs.values():
            q.stop()
    inc = spark.read.parquet(out + "/job_m_increase2m")
    assert inc.count() > 0
    assert all(
        r["labels"]["__name__"] == "job:m:increase2m" for r in inc.collect()
    )
    got = {r["timestamp_ms"]: r["value"] for r in inc.collect()}
    assert got[T0 + 360_000] == pytest.approx(360.0)
    mx = spark.read.parquet(out + "/job_m_max5m")
    assert mx.count() > 0 and all(
        r["labels"]["__name__"] == "job:m:max5m" for r in mx.collect()
    )
