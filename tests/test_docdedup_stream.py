"""Streaming document-dedup admission control: cross-batch rejection via the
persisted signature store, intra-batch min-id resolution, store growth."""

from __future__ import annotations

import pytest

from promhouse_spark.streaming.docdedup import StreamingDocDedup

# slow tier (r12): streaming doc-dedup integration. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow


BASE = "the quick brown fox jumps over the lazy dog while seventeen green "\
    "turtles carry heavy baskets of ripe mangoes across the shallow river "\
    "during a warm october afternoon under pale clouds"
VARIANT = BASE.replace("october", "november")  # one token differs → J ≈ 0.94
OTHER = "completely different content about spark query engines and columnar "\
    "storage formats with vectorized execution pipelines adaptive runtime "\
    "replanning and distributed shuffle free aggregation strategies at scale"


def mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def dedup(spark, tmp_path):
    return StreamingDocDedup(spark, str(tmp_path / "sigstore"), threshold=0.7)


def test_intra_batch_keeps_min_id(spark, dedup):
    admitted = dedup.admit_batch(mk(spark, [(1, BASE), (2, VARIANT), (3, OTHER)]))
    ids = sorted(r["doc_id"] for r in admitted.collect())
    assert ids == [1, 3]  # 2 near-duplicates 1 → dropped; keeper is min id


def test_cross_batch_rejects_against_store(spark, dedup):
    b1 = dedup.admit_batch(mk(spark, [(1, BASE), (3, OTHER)]))
    assert sorted(r["doc_id"] for r in b1.collect()) == [1, 3]
    # next batch: 10 duplicates the stored doc 1; 11 is genuinely new
    b2 = dedup.admit_batch(
        mk(spark, [(10, VARIANT), (11, "eleven brand new tokens " * 8)])
    )
    assert sorted(r["doc_id"] for r in b2.collect()) == [11]
    # store holds signatures for exactly the admitted docs
    store = spark.read.parquet(dedup.store_path)
    assert sorted(r["doc_id"] for r in store.collect()) == [1, 3, 11]
    # and a re-send of an already-admitted text is rejected forever after
    b3 = dedup.admit_batch(mk(spark, [(20, BASE)]))
    assert b3.count() == 0


def test_exact_text_duplicate_rejected(spark, dedup):
    dedup.admit_batch(mk(spark, [(1, BASE)]))
    assert dedup.admit_batch(mk(spark, [(2, BASE)])).count() == 0


def test_unrelated_docs_all_admitted(spark, dedup):
    texts = [
        (i, f"doc number {i} " + " ".join(f"tok{i}_{j}" for j in range(30)))
        for i in range(5)
    ]
    assert dedup.admit_batch(mk(spark, texts)).count() == 5


def test_end_to_end_file_stream(spark, tmp_path, dedup):
    """Real Structured Streaming wiring: file source → foreachBatch admission
    → signature store, across two discovered files with a checkpoint."""
    src = tmp_path / "incoming"
    src.mkdir()
    mk(spark, [(1, BASE), (3, OTHER)]).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src))
        .writeStream.foreachBatch(dedup.foreach_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        stream.processAllAvailable()
        assert sorted(
            r["doc_id"] for r in spark.read.parquet(dedup.store_path).collect()
        ) == [1, 3]
        mk(spark, [(10, VARIANT), (11, "totally novel payload " * 10)]).coalesce(
            1
        ).write.mode("append").parquet(str(src))
        stream.processAllAvailable()
        assert sorted(
            r["doc_id"] for r in spark.read.parquet(dedup.store_path).collect()
        ) == [1, 3, 11]
    finally:
        stream.stop()


def test_retry_replay_is_idempotent(spark, dedup):
    """foreachBatch retry semantics: re-processing a batch whose store append
    already committed must (a) re-admit the same rows — a doc must not be
    rejected by its OWN stored signature — and (b) not append duplicate
    doc_id rows to the store."""
    batch = mk(spark, [(1, BASE), (3, OTHER)])
    first = dedup.admit_batch(batch)
    assert sorted(r["doc_id"] for r in first.collect()) == [1, 3]
    replay = dedup.admit_batch(batch)  # simulated retry of the same epoch
    assert sorted(r["doc_id"] for r in replay.collect()) == [1, 3]
    store = spark.read.parquet(dedup.store_path)
    assert sorted(r["doc_id"] for r in store.collect()) == [1, 3]  # no dups


def test_store_read_errors_propagate(spark, tmp_path):
    """Only a missing store means 'first batch'; a corrupted store must fail
    the batch loudly rather than silently admitting duplicates."""
    store_path = tmp_path / "sigstore"
    store_path.mkdir()
    (store_path / "part-00000.parquet").write_bytes(b"this is not parquet")
    dd = StreamingDocDedup(spark, str(store_path), threshold=0.7)
    with pytest.raises(Exception) as exc_info:
        dd.admit_batch(mk(spark, [(1, BASE)])).collect()
    assert "PATH_NOT_FOUND" not in str(exc_info.value)
