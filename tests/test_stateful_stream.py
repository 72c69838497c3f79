"""Stateful streaming increase (applyInPandasWithState): state must carry
the last sample of each series ACROSS micro-batches — the boundary delta
(and a counter reset at the boundary) are only computable with keyed state,
which is exactly what distinguishes this from the foreachBatch/monoid
pipelines in streaming/rollup.py."""

import pytest

from promhouse_spark.schemas import SAMPLES_SCHEMA
from promhouse_spark.streaming.stateful import continuous_increase


def _write_batch(spark, path, rows, part):
    spark.createDataFrame(rows, SAMPLES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


@pytest.fixture()
def stream_env(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # batch 1 establishes per-series state
    _write_batch(
        spark,
        src,
        [
            (1, 1_000, 10.0),
            (1, 2_000, 13.0),  # +3
            (2, 1_000, 5.0),
        ],
        0,
    )
    return src, ckpt


def test_increase_state_survives_batches(spark, stream_env):
    src, ckpt = stream_env
    stream = (
        spark.readStream.schema(SAMPLES_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        continuous_increase(stream)
        .writeStream.format("memory")
        .queryName("inc_test")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r["fingerprint"]: r
            for r in spark.sql("SELECT * FROM inc_test").collect()
        }
        # batch 1: series 1 rose 10→13 (+3); series 2 has one sample (0)
        assert first[1]["batch_increase"] == 3.0
        assert first[1]["cum_increase"] == 3.0
        assert first[2]["batch_increase"] == 0.0

        # batch 2: series 1 continues 13→20 (+7 across the BATCH BOUNDARY),
        # series 2 counter-resets 5→2 at the boundary (+2), then 2→4 (+2)
        _write_batch(
            spark,
            src,
            [
                (1, 3_000, 20.0),
                (2, 3_000, 2.0),
                (2, 4_000, 4.0),
            ],
            1,
        )
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM inc_test ORDER BY last_ts, fingerprint"
        ).collect()
        latest = {}
        for r in rows:  # memory sink in update mode appends; last row wins
            latest[r["fingerprint"]] = r
        assert latest[1]["batch_increase"] == 7.0
        assert latest[1]["cum_increase"] == 10.0  # 3 + 7 — state carried over
        assert latest[2]["batch_increase"] == 4.0  # reset→2 plus 2→4
        assert latest[2]["cum_increase"] == 4.0
        assert latest[2]["last_ts"] == 4_000
    finally:
        q.stop()


def test_increase_matches_batch_operator(spark, stream_env, tmp_path):
    """Differential: the streaming cumulative total over all batches equals
    the batch promql_lite increase over the union of the data."""
    src, _ = stream_env
    _write_batch(spark, src, [(1, 3_000, 20.0), (1, 4_000, 2.0)], 1)

    ckpt2 = str(tmp_path / "ckpt2")
    stream = spark.readStream.schema(SAMPLES_SCHEMA).parquet(src)
    q = (
        continuous_increase(stream)
        .writeStream.format("memory")
        .queryName("inc_diff")
        .outputMode("update")
        .option("checkpointLocation", ckpt2)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["fingerprint"]: r["cum_increase"]
            for r in spark.sql(
                "SELECT * FROM inc_diff ORDER BY last_ts"
            ).collect()
        }
    finally:
        q.stop()

    from pyspark.sql import functions as F

    from promhouse_spark.operators.promql_lite import increase

    batch = (
        increase(spark.read.parquet(src))
        .groupBy("fingerprint")
        .agg(F.sum("increase").alias("total"))
        .collect()
    )
    for r in batch:
        assert got[r["fingerprint"]] == r["total"], r
