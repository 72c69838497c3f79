"""Streaming alert evaluation (streaming/alerts.py): the event log's
reconstructed firing intervals must equal the batch engine's
alert_intervals_promql on the same data, across micro-batch boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from promhouse_spark.promql import PromQLEngine
from promhouse_spark.promql.alerts import alert_intervals_promql
from promhouse_spark.schemas import SAMPLES_SCHEMA
from promhouse_spark.streaming.alerts import (

    _AlertState,
    compile_streaming_alert,
    intervals_from_events,
    start_streaming_alert,
)

# slow tier (r12): streaming alert integration. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow

T0 = 1_767_225_600_000


def _rows(n=41):
    # value spikes to 100 during [180 s, 360 s), 10 elsewhere
    return [
        (1, T0 + i * 15_000, 100.0 if 180_000 <= i * 15_000 < 360_000 else 10.0)
        for i in range(n)
    ]


def _series(spark):
    return spark.createDataFrame(
        [Row(fingerprint=1, labels={"__name__": "m", "job": "a"})],
        "fingerprint long, labels map<string,string>",
    )


def test_compile_streaming_alert():
    a = compile_streaming_alert("HighM", "sum by (job) (m) > 50", for_ms=120_000)
    assert a.cmp == ">" and a.threshold == 50.0 and a.rule.by == ["job"]
    a = compile_streaming_alert("LowM", "avg_over_time(m[5m]) < -2.5")
    assert a.threshold == -2.5
    for bad in (
        "sum by (job) (m) > bool 50",  # bool never filters
        "sum(m) > sum(m)",  # vector threshold
        "sum(m)",  # no comparison
        "a / b > 1",  # unstreamable left side
    ):
        with pytest.raises(ValueError):
            compile_streaming_alert("x", bad)


def test_alert_state_machine_runs_and_resolution():
    alert = compile_streaming_alert("A", "sum by (job) (m) > 50", for_ms=120_000)
    st = _AlertState(alert, step_ms=60_000)
    lbl = {"job": "a"}
    e1 = st.step([{"labels": lbl, "eval_ms": 180_000, "value": 100.0}])
    assert [(x[2], x[4]) for x in e1] == [(180_000, "pending")]
    e2 = st.step(
        [
            {"labels": lbl, "eval_ms": 240_000, "value": 100.0},
            {"labels": lbl, "eval_ms": 300_000, "value": 100.0},
        ]
    )
    assert [(x[2], x[4]) for x in e2] == [
        (240_000, "pending"),
        (300_000, "firing"),  # 300-180 >= for
    ]
    # a later evaluation firing for ANOTHER group resolves the stale run
    e3 = st.step([{"labels": {"job": "z"}, "eval_ms": 480_000, "value": 99.0}])
    states = {(x[2], x[4]) for x in e3}
    assert (360_000, "resolved") in states  # run ended at 300 + step
    assert (480_000, "pending") in states
    # recovery from the emitted log continues open runs
    st2 = _AlertState(alert, step_ms=60_000)
    events = [
        {"labels": x[1], "eval_ms": x[2], "active_since_ms": x[3], "state": x[4]}
        for x in e1 + e2 + e3
    ]
    st2.recover(events)
    assert _k({"job": "a"}) not in st2.runs  # resolved stays closed
    assert st2.runs[_k({"job": "z"})][0] == 480_000


def _k(labels):
    from promhouse_spark.streaming.alerts import _canon

    return _canon(labels)


def test_streaming_alert_matches_batch_intervals(spark, tmp_path):
    src = str(tmp_path / "samples")
    out = str(tmp_path / "alerts")
    ck = str(tmp_path / "ck")
    series = _series(spark)
    rows = _rows()

    spark.createDataFrame(rows[:20], SAMPLES_SCHEMA).write.mode("append").parquet(src)
    q = start_streaming_alert(
        spark, src, series, "HighM", "sum by (job) (m) > 50", out, ck,
        for_ms=120_000, step_ms=60_000, trigger_seconds=1,
    )
    try:
        q.processAllAvailable()
        flush = [(1, T0 + 3 * 3600 * 1000, 10.0), (1, T0 + 3 * 3600 * 1000 + 1, 10.0)]
        spark.createDataFrame(rows[20:] + flush, SAMPLES_SCHEMA).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    events = spark.read.parquet(out)
    got = {
        (tuple(sorted(r["labels"].items())), r["start_ms"], r["end_ms"], r["n_evals"])
        for r in intervals_from_events(events, for_ms=120_000).collect()
    }
    # the batch replay over the same data (full history, same grid)
    df = spark.createDataFrame(rows, SAMPLES_SCHEMA)
    eng = PromQLEngine(df, series, start_ms=T0, end_ms=T0 + 600_000, step_ms=60_000)
    want = {
        (tuple(sorted(r["labels"].items())),
         r["start_ms"] - T0 + T0,  # absolute ms on both sides
         r["end_ms"],
         r["n_evals"])
        for r in alert_intervals_promql(
            eng, "sum by (job) (m) > 50", for_ms=120_000
        ).collect()
    }
    assert want, "batch replay found no interval — fixture broken"
    assert got == want
    # the spike interval is exactly [T0+180s, T0+300s], 3 evaluations
    (labels, start, end, n) = next(iter(want))
    assert (start, end, n) == (T0 + 180_000, T0 + 300_000, 3)
    # resolution was emitted once the next evaluation finalized
    resolved = events.filter("state = 'resolved'").collect()
    assert any(r["eval_ms"] == T0 + 360_000 for r in resolved)


def test_alert_state_replay_is_idempotent():
    """foreachBatch re-delivers the last micro-batch on restart: replayed
    (older or equal) evaluations must not split or duplicate a run."""
    alert = compile_streaming_alert("A", "sum by (job) (m) > 50", for_ms=120_000)
    st = _AlertState(alert, step_ms=60_000)
    lbl = {"job": "a"}
    rows = [
        {"labels": lbl, "eval_ms": t, "value": 100.0}
        for t in (180_000, 240_000, 300_000)
    ]
    first = st.step(list(rows))
    # the whole batch replays: no new events, run state unchanged
    replay = st.step(list(rows))
    assert replay == []
    assert st.runs[_k(lbl)][0] == 180_000 and st.runs[_k(lbl)][1] == 300_000
    # continuation after the replay extends the SAME run
    cont = st.step([{"labels": lbl, "eval_ms": 360_000, "value": 100.0}])
    assert [(x[2], x[3], x[4]) for x in cont] == [(360_000, 180_000, "firing")]
    assert first  # silence unused warning
