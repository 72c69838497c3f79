"""Streaming alert evaluation (beyond-reference): run a Prometheus
alerting rule

    alert: HighErrorRate
    expr:  sum by (job) (rate(errors[5m])) > 0.5
    for:   2m

CONTINUOUSLY over the live sample stream — the streaming twin of the
batch replay in promql/alerts.py:alert_intervals_promql, built on the
streaming-rules pipeline (streaming/rules.py).

Shape: the threshold expression's LEFT side must be a streamable rule
(one stateful aggregation — see compile_streaming_rule); the comparison
against a scalar literal filters the aggregated vector inside the
foreachBatch sink, and the pending→firing state machine runs on the
DRIVER over the firing groups — bounded by the alert's output
cardinality, which is small by construction (the same protocol-edge
contract as record_rules). Each firing evaluation appends one event row

    (alert, labels, eval_ms, active_since_ms, state pending|firing)

plus a terminal ``resolved`` row when a later evaluation finalizes
without the group firing (the global watermark is the clock: an open run
is resolved once any group's evaluation beyond run-end+step finalizes).
The event log is therefore exactly replayable: firing intervals
reconstruct from (active_since_ms, max eval_ms) per run — the
differential test asserts they equal the batch engine's
alert_intervals_promql on the same data.

Restart: the state machine rebuilds from the event log's open runs on
the first micro-batch, so a checkpoint-resumed stream continues runs
instead of re-pending them."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from promhouse_spark.promql.parser import BinaryOp, NumberLiteral, Unary, parse
from promhouse_spark.schemas import SAMPLES_SCHEMA
from promhouse_spark.streaming.rules import (
    StreamingRule,
    aggregated_frame,
    compile_rule_node,
    rule_series_frame,
)

_CMP_FNS = {
    ">": lambda v, c: v > c,
    "<": lambda v, c: v < c,
    ">=": lambda v, c: v >= c,
    "<=": lambda v, c: v <= c,
    "==": lambda v, c: v == c,
    "!=": lambda v, c: v != c,
}

EVENT_SCHEMA = (
    "alert string, labels map<string,string>, eval_ms long, "
    "active_since_ms long, state string"
)


@dataclass
class StreamingAlert:
    name: str
    rule: StreamingRule
    cmp: str
    threshold: float
    for_ms: int


def compile_streaming_alert(
    name: str, expr: str, for_ms: int = 0, lookback_ms: int = 300_000
) -> StreamingAlert:
    """``<streamable rule expr> <cmp> <scalar literal>``; the comparison
    must be filter-form (no ``bool`` — a bool comparison never filters, so
    it cannot gate an alert)."""
    node = parse(expr)
    if not isinstance(node, BinaryOp) or node.op not in _CMP_FNS:
        raise ValueError("alert expression must be a threshold comparison")
    if node.bool_mode:
        raise ValueError("bool comparisons do not filter; drop the modifier")
    rhs = node.rhs
    sign = 1.0
    if isinstance(rhs, Unary):
        sign, rhs = -1.0, rhs.expr
    if not isinstance(rhs, NumberLiteral):
        raise ValueError("alert threshold must be a scalar literal")
    rule = compile_rule_node(name, node.lhs, lookback_ms)
    return StreamingAlert(
        name=name,
        rule=rule,
        cmp=node.op,
        threshold=sign * float(rhs.value),
        for_ms=for_ms,
    )


class _AlertState:
    """Driver-side pending→firing runs, keyed by the group's canonical
    labels JSON. Run = (active_since_ms, last_eval_ms)."""

    def __init__(self, alert: StreamingAlert, step_ms: int):
        self.alert = alert
        self.step_ms = step_ms
        self.runs: dict[str, tuple[int, int, dict]] = {}

    def recover(self, events: list) -> None:
        """Rebuild open runs from a previous event log: the latest event
        per group, unless it is a ``resolved``."""
        latest: dict[str, tuple] = {}
        for r in events:
            key = _canon(r["labels"])
            if key not in latest or r["eval_ms"] > latest[key][0]:
                latest[key] = (r["eval_ms"], r["active_since_ms"], r["state"],
                               dict(r["labels"] or {}))
        for key, (ev, since, state, labels) in latest.items():
            if state != "resolved":
                self.runs[key] = (since, ev, labels)

    def step(self, firing_rows: list, clock: int | None = None) -> list[tuple]:
        """Advance by one micro-batch of FINALIZED firing evaluations;
        returns event tuples matching EVENT_SCHEMA. ``clock`` is the
        highest evaluation the watermark finalized in this batch — pass it
        from the UNFILTERED batch so runs resolve even when nothing fires."""
        events: list[tuple] = []
        if clock is None:
            clock = max((r["eval_ms"] for r in firing_rows), default=None)
        by_key: dict[str, list] = {}
        for r in firing_rows:
            by_key.setdefault(_canon(r["labels"]), []).append(r)
        for key, rows in sorted(by_key.items()):
            rows.sort(key=lambda r: r["eval_ms"])
            labels = dict(rows[0]["labels"] or {})
            for r in rows:
                ev = r["eval_ms"]
                run = self.runs.get(key)
                if run is not None and ev == run[1] + self.step_ms:
                    since = run[0]
                elif run is not None and ev <= run[1]:
                    # replayed evaluation (a restart re-delivers the last
                    # micro-batch): at-or-behind the run head is a no-op,
                    # NOT a gap — treating it as one would split the run
                    continue
                else:
                    if run is not None:  # gap within one batch's rows
                        events.append(
                            (self.alert.name, run[2], run[1] + self.step_ms,
                             run[0], "resolved")
                        )
                    since = ev
                self.runs[key] = (since, ev, labels)
                state = (
                    "firing" if ev - since >= self.alert.for_ms else "pending"
                )
                events.append((self.alert.name, labels, ev, since, state))
        # the watermark clock: once any group's evaluation at/after an open
        # run's next expected step has finalized, that run's group provably
        # did not fire there (it would have extended the run) — resolved
        if clock is not None:
            for key, run in list(self.runs.items()):
                if run[1] + self.step_ms <= clock:
                    events.append(
                        (self.alert.name, run[2], run[1] + self.step_ms,
                         run[0], "resolved")
                    )
                    del self.runs[key]
        return events


def _canon(labels) -> str:
    import json

    return json.dumps(dict(labels or {}), sort_keys=True, separators=(",", ":"))


def start_streaming_alert(
    spark: SparkSession,
    samples_path: str,
    series_df: DataFrame,
    name: str,
    expr: str,
    out_path: str,
    checkpoint_path: str,
    for_ms: int = 0,
    step_ms: int = 60_000,
    lookback_ms: int = 300_000,
    watermark: str = "10 minutes",
    trigger_seconds: int = 5,
) -> StreamingQuery:
    """Evaluate one alerting rule continuously, appending the
    pending/firing/resolved event log to ``out_path``."""
    import os

    alert = compile_streaming_alert(name, expr, for_ms, lookback_ms)
    stream = (
        spark.readStream.schema(SAMPLES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(samples_path)
    )
    per_series = rule_series_frame(stream, series_df, alert.rule, step_ms, watermark)
    state = _AlertState(alert, step_ms)
    cmp_fn = _CMP_FNS[alert.cmp]
    recovered = [False]

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        if not recovered[0]:
            recovered[0] = True
            if os.path.isdir(out_path) and any(
                f.endswith(".parquet") for f in os.listdir(out_path)
            ):
                state.recover(spark.read.parquet(out_path).collect())
        vec = aggregated_frame(batch_df, series_df, alert.rule).persist()
        firing = vec.filter(
            cmp_fn(F.col("value"), F.lit(alert.threshold))
        ).collect()
        # the resolution clock: the highest evaluation the watermark
        # finalized this batch, firing or not
        clock = vec.agg(F.max("eval_ms")).first()[0]
        vec.unpersist()
        events = state.step(firing, clock)
        if events:
            spark.createDataFrame(events, EVENT_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(out_path)

    return (
        per_series.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def intervals_from_events(events_df: DataFrame, for_ms: int = 0) -> DataFrame:
    """Reconstruct firing intervals from the event log — the shape
    alert_intervals_promql emits, for differential comparison: one row per
    run with (labels, start_ms, end_ms, n_evals), runs shorter than
    ``for_ms`` dropped."""
    fired = events_df.filter(F.col("state") != "resolved")
    out = (
        fired.groupBy("alert", "active_since_ms", F.to_json("labels").alias("__k"))
        .agg(
            F.first("labels").alias("labels"),
            F.max("eval_ms").alias("end_ms"),
            F.count_distinct("eval_ms").cast("long").alias("n_evals"),
        )
        .select(
            "labels",
            F.col("active_since_ms").alias("start_ms"),
            "end_ms",
            "n_evals",
        )
    )
    return out.filter(F.col("end_ms") - F.col("start_ms") >= F.lit(for_ms))
