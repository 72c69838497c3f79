"""Alerting-rule evaluation over compiled PromQL (beyond-reference):
the batch replay of a Prometheus rule

    alert: X
    expr:  <any PromQL comparison/vector expression>
    for:   <duration>

against stored history. The expression compiles through promql/engine.py
(so thresholds on rates, ratios with vector matching, etc. all work); a
grid point "fires" when the expression returns a sample for the series at
that evaluation (PromQL filter semantics), and an alert interval is a
maximal run of CONSECUTIVE firing grid points that lasts at least the
``for`` duration — prometheus/rules/alerting.go's pending→firing
transition, evaluated over history instead of live.

Gaps-and-islands on the evaluation grid: firing evals are equally spaced,
so run id = eval_ms − rank·step (one window pass per series, keyed by the
canonical labels JSON) — the same one-shuffle shape as
operators/promql_lite.alert_intervals, lifted from raw samples to compiled
expressions."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from promhouse_spark.functions.labels import labels_map_to_json


def alert_intervals_promql(
    engine, expr: str, for_ms: int = 0
) -> DataFrame:
    """Maximal firing intervals of a compiled PromQL alert expression.

    Output: (labels, start_ms, end_ms, n_evals) — ``start_ms`` is the
    first firing evaluation (Prometheus's "pending since"), intervals
    shorter than ``for_ms`` drop (never reached firing)."""
    vec = engine.eval(expr)
    key = labels_map_to_json("labels")
    w = W.partitionBy("__key").orderBy("eval_ms")
    runs = (
        vec.select(key.alias("__key"), "labels", "eval_ms")
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__run", F.col("eval_ms") - F.col("__rn") * F.lit(engine.step_ms)
        )
    )
    return (
        runs.groupBy("__key", "__run")
        .agg(
            F.first("labels").alias("labels"),
            F.min("eval_ms").alias("start_ms"),
            F.max("eval_ms").alias("end_ms"),
            F.count("*").cast("long").alias("n_evals"),
        )
        .filter(F.col("end_ms") - F.col("start_ms") >= F.lit(for_ms))
        .drop("__key", "__run")
    )
