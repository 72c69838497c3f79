"""Streaming PromQL rate: the sliding-window extrapolated rate as a live
Structured Streaming pipeline (beyond-reference — the reference's roadmap
stops at batch downsampling; this serves `rate(m[5m])` continuously).

The batch compiler (promql/engine.py) explodes each sample to the grid
evaluations whose ``(t - range, t]`` window contains it; that explode is
STATELESS, so the identical transformation runs on a stream: explode →
watermarked keyed aggregation per (series, evaluation). The reset-aware
delta needs time-ordered samples, which a streaming aggregation cannot get
from a window function — instead each window's samples fold through a
sorted-array aggregate (the holt_winters pattern: bounded by the window,
deterministic via (ts, value) sort), and the extrapolation algebra runs
post-aggregation. One shuffle per micro-batch, state bounded by
(active series × range/step evaluations), watermark finalizes append-mode
output exactly when an evaluation can no longer receive samples.

``sliding_rate`` is engine-agnostic: applied to a batch frame it returns
the same rows as the compiled ``rate()`` (differential-tested in
tests/test_streaming_rate.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from promhouse_spark.schemas import FINGERPRINT, SAMPLES_SCHEMA, TIMESTAMP_MS, VALUE


def explode_to_grid(
    samples_df: DataFrame,
    range_ms: int,
    step_ms: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """The stateless sliding-window explode every streaming PromQL shape is
    built on: each sample reaches the epoch-aligned grid evaluations t with
    ts ≤ t < ts + range (the PromQL window ``(t - range, t]``), expansion
    bounded by range/step, entirely map-side. Output: (fingerprint,
    eval_ms, eval_time timestamp, ts, v), watermarked on ``eval_time`` when
    the input is a stream."""
    ts = F.col(TIMESTAMP_MS)
    first = (F.ceil(ts / F.lit(step_ms)) * step_ms).cast("long")
    last = (F.floor((ts + F.lit(range_ms - 1)) / F.lit(step_ms)) * step_ms).cast("long")
    evs = F.when(first <= last, F.sequence(first, last, F.lit(step_ms))).otherwise(
        F.array().cast("array<long>")
    )
    exploded = samples_df.select(
        FINGERPRINT,
        F.explode(evs).alias("eval_ms"),
        ts.alias("ts"),
        F.col(VALUE).cast("double").alias("v"),
    ).withColumn("eval_time", F.timestamp_millis(F.col("eval_ms")))
    if samples_df.isStreaming:
        exploded = exploded.withWatermark("eval_time", watermark)
    return exploded


def sliding_rate(
    samples_df: DataFrame,
    range_ms: int = 300_000,
    step_ms: int = 60_000,
    counter: bool = True,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Extrapolated PromQL rate per (fingerprint, epoch-aligned grid
    evaluation): promql/functions.go extrapolatedRate, evaluated wherever
    the window holds ≥ 2 samples. Pure transformation — valid on batch and
    streaming frames alike (no window functions, no per-series sort).

    Output: (fingerprint, eval_time timestamp, eval_ms, increase, rate,
    n_samples)."""
    exploded = explode_to_grid(samples_df, range_ms, step_ms, watermark)
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("v")))
    )
    g = exploded.groupBy(FINGERPRINT, "eval_time", "eval_ms").agg(
        arr.alias("a"), F.count("*").cast("long").alias("n_samples")
    )
    a = F.col("a")
    if counter:
        # reset-aware fold: a drop contributes the new value
        step = lambda acc, x: F.struct(  # noqa: E731
            (
                acc["s"]
                + F.when(x["v"] >= acc["p"], x["v"] - acc["p"]).otherwise(x["v"])
            ).alias("s"),
            x["v"].alias("p"),
        )
        init = F.struct(F.lit(0.0).alias("s"), a[0]["v"].alias("p"))
        delta = F.aggregate(F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))), init, step)["s"]
    else:
        delta = F.element_at(a, -1)["v"] - a[0]["v"]
    first_ts, last_ts = a[0]["ts"], F.element_at(a, -1)["ts"]
    first_v = a[0]["v"]
    sampled = (last_ts - first_ts).cast("double")
    avg_iv = sampled / (F.col("n_samples") - 1)
    to_start = (first_ts - (F.col("eval_ms") - F.lit(range_ms))).cast("double")
    to_end = (F.col("eval_ms") - last_ts).cast("double")
    if counter:
        to_zero = sampled * (first_v / F.nullif(delta, F.lit(0.0)))
        to_start = F.when(
            (delta > 0) & (first_v >= 0) & (to_zero < to_start), to_zero
        ).otherwise(to_start)
    head = F.when(to_start >= avg_iv * 1.1, avg_iv / 2).otherwise(to_start)
    tail = F.when(to_end >= avg_iv * 1.1, avg_iv / 2).otherwise(to_end)
    inc = delta * (sampled + head + tail) / sampled
    return (
        g.filter((F.col("n_samples") >= 2) & (last_ts > first_ts))
        .select(
            FINGERPRINT,
            "eval_time",
            "eval_ms",
            inc.alias("increase"),
            (inc / F.lit(range_ms / 1000.0)).alias("rate"),
            "n_samples",
        )
    )


def start_sliding_rate_stream(
    spark: SparkSession,
    samples_path: str,
    out_path: str,
    checkpoint_path: str,
    range_ms: int = 300_000,
    step_ms: int = 60_000,
    trigger_seconds: int = 5,
) -> StreamingQuery:
    """Continuous rate serving: stream the samples directory, append each
    FINALIZED (fingerprint, evaluation) rate row to ``out_path`` once the
    watermark guarantees no more samples can join its window. Append mode +
    watermark = every row is written exactly once, late samples inside the
    10-minute watermark still fold in, later ones drop (the explicit
    lateness contract batch replay can backfill)."""
    stream = (
        spark.readStream.schema(SAMPLES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(samples_path)
    )
    rated = sliding_rate(stream, range_ms, step_ms)
    return (
        rated.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
