"""Continuous native-histogram building — the observation→distribution
pre-aggregation tier run as a live pipeline (the streaming counterpart
of :func:`promhouse_spark.operators.nativehist.hist_build`).

Same monoid-of-partials design as :mod:`promhouse_spark.streaming.rollup`
(no watermark, arbitrarily-late data): every micro-batch appends its own
per-(fingerprint, window) partial HISTOGRAMS — a histogram of a subset of
observations is itself a partial whose merge (bucket-wise count addition,
:func:`operators.nativehist.hist_merge`) is commutative and associative.
Late data just contributes more partials; 1000 concurrent ingesting
executors never coordinate. Reads merge partials and can lift the result
to the wire shape (:func:`operators.nativehist.hist_to_wire`) for
quantile/fraction/moment queries — "p99 per 5 m window" without ever
re-scanning the fact table, which is the reason this tier exists at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from promhouse_spark.operators.downsample import window_start_ms
from promhouse_spark.operators.nativehist import hist_build, hist_merge
from promhouse_spark.schemas import DATE, FINGERPRINT, VALUE


def hist_partial(samples_df: DataFrame, step_ms: int = 300_000) -> DataFrame:
    """Per-batch partial histograms: one cents-tier histogram row per
    (fingerprint, window) over this batch's observations."""
    return hist_build(
        samples_df.withColumn("window_start_ms", window_start_ms(step_ms)),
        VALUE,
        by=[FINGERPRINT, "window_start_ms"],
    ).withColumn(DATE, F.to_date(F.timestamp_millis(F.col("window_start_ms"))))


def merge_hist_rollup(partials: DataFrame) -> DataFrame:
    """Merge partial histograms down to one per (fingerprint, window) —
    associative, so partials of partials give the same answer."""
    return hist_merge(
        partials.drop(DATE), by=[FINGERPRINT, "window_start_ms"]
    )


def read_hist_rollup(spark: SparkSession, path: str) -> DataFrame:
    return merge_hist_rollup(spark.read.parquet(path))


def start_hist_rollup_stream(
    spark: SparkSession,
    samples_path: str,
    rollup_path: str,
    checkpoint_dir: str,
    step_ms: int = 300_000,
    trigger_seconds: int = 5,
) -> StreamingQuery:
    """Tail the samples fact table as a file stream and maintain the
    per-window histogram tier continuously: each micro-batch appends its
    partial histograms."""
    from promhouse_spark.schemas import SAMPLES_SCHEMA

    stream = (
        spark.readStream.schema(SAMPLES_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(samples_path)
    )

    def fold(batch_df: DataFrame, _epoch: int) -> None:
        (
            hist_partial(batch_df, step_ms)
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


def compact_hist_rollup(spark: SparkSession, rollup_path: str) -> None:
    """Out-of-band partial collapse: rewrite the tier as one merged row
    per (fingerprint, window) — read results unchanged (associativity),
    file count bounded again."""
    import os
    import shutil
    import tempfile

    merged = merge_hist_rollup(spark.read.parquet(rollup_path)).withColumn(
        DATE, F.to_date(F.timestamp_millis(F.col("window_start_ms")))
    )
    tmp = tempfile.mkdtemp(prefix="phs-histrollup-compact-")
    merged.write.partitionBy(DATE).mode("overwrite").parquet(tmp)
    shutil.rmtree(rollup_path)
    shutil.move(tmp, rollup_path)
    # Spark may cache file listings for the old path
    spark.catalog.clearCache()
    assert os.path.isdir(rollup_path)
