"""Recording rules over compiled PromQL (beyond-reference): the batch
evaluation of a Prometheus rule group

    groups:
    - name: g
      rules:
      - record: job:requests:rate5m
        expr:   sum by (job) (rate(requests_total[5m]))

against stored history, materializing each evaluation back into the
storage as first-class series — so dashboards read the precomputed
``job:requests:rate5m`` instead of re-aggregating raw samples (the
continuous-rollup story, lifted from fixed aggregates to arbitrary
PromQL).

Each rule's result vector becomes samples whose labels are the result
labels plus ``__name__ = record`` (overriding any name the expression
kept, exactly as Prometheus records) and whose timestamps are the grid
evaluations. ``evaluate_rules`` returns the combined series frame;
``record_rules`` writes it through the storage's protocol path so
registry dedup, fingerprinting, and partitioning all apply."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NAME = "__name__"


def evaluate_rules(engine, rules: list[tuple[str, str]]) -> DataFrame:
    """Evaluate ``(record_name, promql_expr)`` rules on the engine's grid.

    Output: (labels map — result labels with ``__name__`` forced to the
    record name — timestamp_ms, value); all rules unioned into one frame.
    """
    out = None
    for record, expr in rules:
        vec = engine.eval(expr)
        named = vec.select(
            F.map_concat(
                F.map_filter("labels", lambda k, _: k != F.lit(NAME)),
                F.create_map(F.lit(NAME), F.lit(record)),
            ).alias("labels"),
            F.col("eval_ms").alias("timestamp_ms"),
            F.col("value").cast("double").alias("value"),
        ).filter(F.col("value").isNotNull())
        out = named if out is None else out.unionByName(named)
    if out is None:
        raise ValueError("no rules given")
    return out


def record_rules(engine, storage, rules: list[tuple[str, str]]) -> int:
    """Evaluate and persist a rule group. Returns the number of series
    written. Collect happens per-series at the protocol edge (same
    contract as remote-write ingestion); at scale prefer
    ``evaluate_rules`` + ``storage.ingest_df`` with a precomputed
    fingerprint column."""
    from promhouse_spark.models import Label, Sample, TimeSeries

    frame = evaluate_rules(engine, rules)
    rows = frame.collect()
    by_labels: dict[tuple, list] = {}
    for r in rows:
        key = tuple(sorted(r["labels"].items()))
        by_labels.setdefault(key, []).append(
            Sample(value=r["value"], timestamp_ms=r["timestamp_ms"])
        )
    series = [
        TimeSeries(
            labels=[Label(n, v) for n, v in key],
            samples=sorted(samples, key=lambda s: s.timestamp_ms),
        )
        for key, samples in sorted(by_labels.items())
    ]
    if series:
        storage.write(series)
    return len(series)
