"""Structured Streaming ingestion (C1/C2): files → foreachBatch → storage,
read back through the query path; registry dedup across micro-batches."""

import json
import time

from promhouse_spark.models import Query, make_matchers
from promhouse_spark.storage.parquet import SparkParquetStorage
from promhouse_spark.streaming.ingest import start_ingest
from tests.fixtures import T0


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
