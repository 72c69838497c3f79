"""Structured Streaming ingestion (C1/C2): files → foreachBatch → storage,
read back through the query path; registry dedup across micro-batches."""

import json
import time

from promhouse_spark.models import Query, make_matchers
from promhouse_spark.storage.parquet import SparkParquetStorage
from promhouse_spark.streaming.ingest import start_ingest
from tests.fixtures import T0

import pytest

# slow tier (r12): stream-ingest integration (~2 min). The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow



def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_ingest_end_to_end(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    store_root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    storage = SparkParquetStorage(spark, store_root)

    _write_jsonl(
        src / "batch1.json",
        [
            {"labels": {"__name__": "up", "job": "a"}, "timestamp_ms": T0, "value": 1.0},
            {"labels": {"__name__": "up", "job": "b"}, "timestamp_ms": T0, "value": 0.0},
        ],
    )
    q = start_ingest(spark, storage, str(src), ckpt, trigger_seconds=1)
    try:
        q.processAllAvailable()
        # second batch: one known series (more samples), one new series
        _write_jsonl(
            src / "batch2.json",
            [
                {"labels": {"__name__": "up", "job": "a"}, "timestamp_ms": T0 + 1000, "value": 1.0},
                {"labels": {"__name__": "disk", "job": "a"}, "timestamp_ms": T0, "value": 5.0},
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    # registry deduplicated: 3 distinct series
    assert storage.registry_df().count() == 3
    res = storage.read(
        [Query(T0 - 1000, T0 + 2000, make_matchers(("__name__", "=", "up")))]
    )
    series = res[0]
    assert len(series) == 2
    by_job = {s.labels_map()["job"]: s for s in series}
    assert [smp.timestamp_ms for smp in by_job["a"].samples] == [T0, T0 + 1000]
    assert by_job["b"].samples[0].value == 0.0


def test_stream_series_churn_stays_distributed(spark, tmp_path):
    """cache_registry=False: the new-series delta is written as a DataFrame
    on the executors (ingest.py collects only for the opt-in hot dict), so a
    label-churn storm — every sample a brand-new series — ingests without the
    driver materializing the delta. Dedup across micro-batches still holds."""
    src = tmp_path / "in3"
    src.mkdir()
    storage = SparkParquetStorage(spark, str(tmp_path / "store3"), cache_registry=False)
    n = 5000
    _write_jsonl(
        src / "storm1.json",
        [
            {"labels": {"__name__": "churn", "id": str(i)}, "timestamp_ms": T0, "value": 1.0}
            for i in range(n)
        ],
    )
    q = start_ingest(spark, storage, str(src), str(tmp_path / "ck3"), trigger_seconds=1)
    try:
        q.processAllAvailable()
        # second batch: half repeats (no registry growth), half new
        _write_jsonl(
            src / "storm2.json",
            [
                {"labels": {"__name__": "churn", "id": str(i)}, "timestamp_ms": T0 + 1, "value": 2.0}
                for i in range(n // 2, n + n // 2)
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    assert storage.registry_df().count() == n + n // 2
    assert storage.registry_df().select("fingerprint").distinct().count() == n + n // 2
    res = storage.read(
        [Query(T0 - 1, T0 + 2, make_matchers(("__name__", "=", "churn"), ("id", "=", "7")))]
    )
    assert [s.value for s in res[0][0].samples] == [1.0]


def test_stream_late_data_accepted(spark, tmp_path):
    """C1 parity: no watermark — arbitrarily old timestamps ingest fine."""
    src = tmp_path / "in2"
    src.mkdir()
    storage = SparkParquetStorage(spark, str(tmp_path / "store2"))
    _write_jsonl(
        src / "b.json",
        [
            {"labels": {"__name__": "old"}, "timestamp_ms": 1000, "value": 1.0},
            {"labels": {"__name__": "old"}, "timestamp_ms": T0, "value": 2.0},
        ],
    )
    q = start_ingest(spark, storage, str(src), str(tmp_path / "ck2"), trigger_seconds=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    res = storage.read([Query(0, T0 + 1, make_matchers(("__name__", "=", "old")))])
    assert [s.timestamp_ms for s in res[0][0].samples] == [1000, T0]


def test_session_window_stream_semantics(spark, tmp_path):
    """Native session-window streaming (streaming/sessions.py): crafted
    events with a cross-micro-batch session — the session spanning the
    batch boundary must merge in the state store, and append mode emits
    each session exactly once after the watermark passes it."""
    from pyspark.sql import functions as F

    from promhouse_spark.streaming.sessions import EVENTS_SCHEMA, session_counts

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = "2024-01-01 00:{m:02d}:00"

    def rows(*mins_by_user):
        return [(u, base.format(m=m)) for u, m in mins_by_user]

    def write(batch, mode="append"):
        spark.createDataFrame(batch, "user_id bigint, ts_s string").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts")
        ).write.mode(mode).parquet(src)

    # batch 1: user 1 events at :00 and :10 (one session so far);
    #          user 2 event at :05
    write(rows((1, 0), (1, 10), (2, 5)), mode="overwrite")
    q = (
        session_counts(
            spark.readStream.schema(EVENTS_SCHEMA).parquet(src),
            gap="30 minutes",
            watermark="10 minutes",
        )
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: user 1 at :35 — within 30 min of :10, EXTENDS the open
        # session across the micro-batch boundary; user 2 silent (session
        # will close at :35)
        write(rows((1, 35)))
        q.processAllAvailable()
        # sentinel far in the future closes everything
        spark.createDataFrame([(9, "2024-01-02 00:00:00")], "user_id bigint, ts_s string") \
            .select("user_id", F.col("ts_s").cast("timestamp").alias("ts")) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["user_id"], r["n_events"])
        for r in spark.table("sess_test").filter(F.col("user_id") < 9).collect()
    }
    spark.catalog.dropTempView("sess_test")
    # user 1: ONE merged session of 3 events (00,10,35); user 2: one of 1
    assert got == {(1, 3), (2, 1)}


def test_stream_ingest_chunked_tier_with_compaction(spark, tmp_path):
    """Streaming ingestion into the CHUNKED tier: micro-batches append
    mini-chunks; compact_every merges them back to full-size chunks on
    cadence, and reads stay storages-spec-identical throughout."""
    from promhouse_spark.storage.chunked import ChunkedParquetStorage

    src = tmp_path / "incoming"
    src.mkdir()
    storage = ChunkedParquetStorage(spark, str(tmp_path / "store"))

    # 6 micro-batches of 20 samples each for one series-day → without
    # compaction that is 6 mini-chunks; compact_every=3 merges twice
    expected = []
    q = start_ingest(
        spark,
        storage,
        str(src),
        str(tmp_path / "ckpt"),
        trigger_seconds=1,
        compact_every=3,
    )
    try:
        for b in range(6):
            rows = []
            for i in range(20):
                ts = T0 + (b * 20 + i) * 15_000
                rows.append(
                    {
                        "labels": {"__name__": "dense", "job": "s"},
                        "timestamp_ms": ts,
                        "value": float(b * 20 + i),
                    }
                )
                expected.append((ts, float(b * 20 + i)))
            _write_jsonl(src / f"batch{b}.json", rows)
            q.processAllAvailable()
    finally:
        q.stop()

    # 120 samples, fully compacted → exactly one ≤120-sample chunk
    assert storage.chunks_df().count() == 1
    res = storage.read(
        [Query(0, T0 + 10**9, make_matchers(("__name__", "=", "dense")))]
    )[0]
    assert len(res) == 1
    got = [(s.timestamp_ms, s.value) for s in res[0].samples]
    assert got == sorted(expected)
    # registry deduplicated across all micro-batches
    assert storage.registry_df().count() == 1
