"""Continuous downsampling (C4 in streaming mode — the reference's #1
roadmap item run as a live pipeline).

Streaming windowed aggregation without a watermark can never finalize (the
reference accepts arbitrarily late data, C1), so the rollup is maintained as
a **commutative monoid of partial aggregates**: every micro-batch appends its
own per-(fingerprint, window) partials (n, sum, min, max, last by ts), and
reads merge partials. Appends need no coordination or state store, late data
just contributes more partials, and the merge is associative — the design
that still works when 1000 executors ingest concurrently. Compaction
(:func:`compact_rollup`) collapses partials out-of-band exactly like the
fact-table compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from promhouse_spark.operators.downsample import window_start_ms
from promhouse_spark.schemas import DATE, FINGERPRINT, TIMESTAMP_MS, VALUE


def downsample_partial(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """Per-batch partial rollup: decomposable aggregates only (sum not avg;
    last carried as (max_ts, value_at_max_ts))."""
    return (
        samples_df.groupBy(FINGERPRINT, window_start_ms(step_ms))
        .agg(
            F.count("*").alias("n"),
            F.sum(VALUE).alias("sum_value"),
            F.min(VALUE).alias("min_value"),
            # Go max semantics (promql/engine.py _SIMPLE_OVER_TIME): NaN
            # never displaces a numeric max; an all-NaN window stays NaN.
            # Spark's bare max would let NaN win the partial and poison
            # every merge above it.
            F.coalesce(
                F.max(F.when(~F.isnan(F.col(VALUE)), F.col(VALUE))),
                F.lit(float("nan")),
            ).alias("max_value"),
            F.max(TIMESTAMP_MS).alias("last_ts"),
            F.max_by(VALUE, F.col(TIMESTAMP_MS)).alias("last_value"),
        )
        .withColumn(DATE, F.to_date(F.timestamp_millis(F.col("window_start_ms"))))
    )


def merge_rollup(partials: DataFrame) -> DataFrame:
    """Merge partial rollups into final per-window aggregates (associative:
    merging partials of partials gives the same result)."""
    return (
        partials.groupBy(FINGERPRINT, "window_start_ms")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            # same NaN masking as downsample_partial: an all-NaN partial
            # (max_value = NaN) must lose to any numeric sibling partial
            F.coalesce(
                F.max(F.when(~F.isnan("max_value"), F.col("max_value"))),
                F.lit(float("nan")),
            ).alias("max_value"),
            F.max_by("last_value", F.col("last_ts")).alias("last_value"),
            F.max("last_ts").alias("last_ts"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n"))
    )


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    return merge_rollup(spark.read.parquet(rollup_path))


def start_rollup_stream(
    spark: SparkSession,
    samples_path: str,
    rollup_path: str,
    checkpoint_dir: str,
    step_ms: int = 300_000,
    trigger_seconds: int = 5,
) -> StreamingQuery:
    """Tail the samples fact table as a file stream and maintain the rollup
    continuously: each micro-batch of newly-arrived sample files appends its
    partial aggregates.

    CONTRACT (found by tests/test_soak.py): the tailed tier must stay
    APPEND-ONLY while this stream runs. ``compact_samples`` deletes files
    the file source may have registered but not yet read (the micro-batch
    then fails on FILE_NOT_EXIST), and its consolidated rewrites are
    indistinguishable from new data to a file stream, so the rollup would
    double-count the whole rewritten partition even with
    ``ignoreMissingFiles``. Production cadence: tail today's live
    partition, compact only CLOSED (yesterday-and-older) partitions, or
    stop/checkpoint the stream across a same-partition compaction — the
    checkpoint makes the restart exactly-once either way."""
    from promhouse_spark.schemas import SAMPLES_SCHEMA

    stream = (
        spark.readStream.schema(SAMPLES_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(samples_path)
    )

    def fold(batch_df: DataFrame, _epoch: int) -> None:
        (
            downsample_partial(batch_df, step_ms)
            .write.partitionBy(DATE)
            .mode("append")
            .parquet(rollup_path)
        )

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def compact_rollup(spark: SparkSession, rollup_path: str) -> None:
    """Collapse accumulated partials in place (merge is associative, so the
    compacted table is itself a valid partials table)."""
    from promhouse_spark.storage import fs

    if not fs.exists(spark, rollup_path):
        return
    tmp = rollup_path + ".compact"
    old = rollup_path + ".old"
    if fs.exists(spark, old):
        # Hadoop rename into an existing dir NESTS src inside dst (mv
        # semantics) — a stale .old from a crashed run would silently
        # swallow the live table. Fail loudly; the operator decides whether
        # .old is the recovery copy or trash.
        raise RuntimeError(
            f"stale {old} exists — previous compaction crashed mid-swap; "
            "inspect/remove it before compacting again"
        )
    merged = merge_rollup(spark.read.parquet(rollup_path)).drop("avg_value")
    (
        merged.withColumn(
            DATE, F.to_date(F.timestamp_millis(F.col("window_start_ms")))
        )
        .repartition(200, F.col(DATE))
        .sortWithinPartitions(FINGERPRINT, "window_start_ms")
        .write.partitionBy(DATE)
        .mode("overwrite")
        .parquet(tmp)
    )
    # crash-safe swap: keep the old table until the new one is in place
    # (Hadoop FS — works on hdfs://, s3a://, ...; see storage/fs.py caveat)
    fs.rename(spark, rollup_path, old)
    fs.rename(spark, tmp, rollup_path)
    fs.delete(spark, old)


# ---- aggregation pushdown: *_over_time served EXACTLY from partials --------

_PUSHDOWN = {
    "sum_over_time": lambda: F.sum("sum_value").alias("value"),
    "count_over_time": lambda: F.sum("n").cast("double").alias("value"),
    "min_over_time": lambda: F.min("min_value").alias("value"),
    "max_over_time": lambda: F.coalesce(
        F.max(F.when(~F.isnan("max_value"), F.col("max_value"))),
        F.lit(float("nan")),
    ).alias("value"),
    "avg_over_time": lambda: (F.sum("sum_value") / F.sum("n")).alias("value"),
    "last_over_time": lambda: F.max_by(
        "last_value", F.struct("last_ts", "last_value")
    ).alias("value"),
}


def rollup_range_agg(
    partials: DataFrame,
    rollup_step_ms: int,
    func: str,
    range_ms: int,
    step_ms: int,
) -> DataFrame:
    """PromQL ``func(m[range])`` answered EXACTLY from the continuous
    rollup — the aggregation-pushdown / materialized-view-matching path:
    sum/count/min/max/avg/last_over_time are decomposable, so when the
    evaluation grid and range align to whole rollup windows
    (``range_ms`` and ``step_ms`` both multiples of ``rollup_step_ms``),
    merging the covered windows' partials gives the same answer as
    scanning the raw samples — which at 100 TB is the difference between
    reading the fact table and reading a table smaller by the downsample
    ratio.

    Window convention: the rollup buckets samples into ``[w, w+R)``, so
    the served evaluation window is ``[t-range, t)`` (closed-open) where
    raw PromQL uses ``(t-range, t]`` — identical unless a sample sits on
    an exact bucket boundary instant (the differential test pins this).

    Output: (fingerprint, eval_ms, value) — the engine's instant-vector
    sample shape, ready for label attach / vector ops."""
    if func not in _PUSHDOWN:
        raise ValueError(
            f"{func} is not decomposable over rollup partials "
            f"(supported: {sorted(_PUSHDOWN)})"
        )
    if range_ms % rollup_step_ms or step_ms % rollup_step_ms:
        raise ValueError(
            "exact pushdown needs range and step aligned to the rollup "
            f"window ({rollup_step_ms} ms)"
        )
    merged = merge_rollup(partials)
    # stamp each rollup window at its END; a window contributes to grid
    # evaluation t iff end ∈ (t-range, t] ⇔ window ⊆ [t-range, t) — the
    # same sliding-window explode shape as streaming/rate.py, map-side
    end = (F.col("window_start_ms") + F.lit(rollup_step_ms)).alias("ts")
    first = (F.ceil(F.col("ts") / F.lit(step_ms)) * step_ms).cast("long")
    last = (
        F.floor((F.col("ts") + F.lit(range_ms - 1)) / F.lit(step_ms)) * step_ms
    ).cast("long")
    evs = F.when(first <= last, F.sequence(first, last, F.lit(step_ms))).otherwise(
        F.array().cast("array<long>")
    )
    exploded = merged.select(
        FINGERPRINT, end, "n", "sum_value", "min_value", "max_value",
        "last_value", "last_ts",
    ).select(
        FINGERPRINT, F.explode(evs).alias("eval_ms"),
        "n", "sum_value", "min_value", "max_value", "last_value", "last_ts",
    )
    return exploded.groupBy(FINGERPRINT, "eval_ms").agg(_PUSHDOWN[func]())
