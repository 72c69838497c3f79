"""Chunked vs flat tier: read-path and serve-path comparison.

Builds the same regular-scrape corpus in both tiers, then measures what
the chunk layout is actually FOR:

1. narrow-window protocol read (5 min × 10 series out of the corpus) —
   chunk-envelope pruning vs flat row filtering;
2. full-series streamed serve — zero-decode chunk framing vs
   encode-from-samples;
3. at-rest bytes (same numbers as tools/storage_efficiency.py, for one
   self-contained artifact).

Usage: python3 tools/chunked_bench.py [n_series] [samples_per_series]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from promhouse_spark.edge import chunkenc, prompb  # noqa: E402
from promhouse_spark.models import Label, Query, TimeSeries  # noqa: E402
from promhouse_spark.schemas import FINGERPRINT, TIMESTAMP_MS, VALUE  # noqa: E402
from promhouse_spark.session import get_spark  # noqa: E402
from promhouse_spark.storage.chunked import ChunkedParquetStorage  # noqa: E402
from promhouse_spark.storage.parquet import SparkParquetStorage  # noqa: E402

T0 = 1767225600000


def corpus(spark, n_series: int, per_series: int):
    return (
        spark.range(n_series)
        .select(
            F.col("id").alias(FINGERPRINT),
            F.explode(F.sequence(F.lit(0), F.lit(per_series - 1))).alias("i"),
        )
        .select(
            FINGERPRINT,
            (F.lit(T0) + F.col("i") * 15_000).alias(TIMESTAMP_MS),
            (
                F.col(FINGERPRINT) * 1000
                + F.col("i") * 7
                + F.pmod(F.xxhash64(FINGERPRINT, "i"), F.lit(5))
            ).cast("double").alias(VALUE),
        )
    )


def tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def timed(fn, warmup: int = 1, runs: int = 3) -> float:
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    per_series = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    n = n_series * per_series
    spark = get_spark(app_name="chunked-bench")
    root = tempfile.mkdtemp(prefix="phs-chunkbench-")
    try:
        data = corpus(spark, n_series, per_series).cache()
        data.count()

        flat = SparkParquetStorage(spark, os.path.join(root, "flat"))
        t0 = time.time()
        flat.ingest_df(data, files_per_day=4)
        t_flat_ingest = time.time() - t0

        chunked = ChunkedParquetStorage(spark, os.path.join(root, "chunked"))
        t0 = time.time()
        chunked.ingest_df(data)
        t_chunk_ingest = time.time() - t0

        # register the series so protocol reads resolve labels
        for st in (flat, chunked):
            st._registry = {
                fp: {"__name__": "bench", "i": str(fp)} for fp in range(n_series)
            }

        print(f"corpus: {n_series} series x {per_series} samples = {n:,}")
        print(
            f"ingest: flat {n / t_flat_ingest:,.0f} samples/s, "
            f"chunked {n / t_chunk_ingest:,.0f} samples/s"
        )
        print(
            f"at rest: flat {tree_bytes(flat.samples_path) / n:.2f} B/sample, "
            f"chunked {tree_bytes(chunked.chunks_path) / n:.2f} B/sample"
        )

        # 1. narrow-window protocol read: 5 minutes, all series
        q = Query(T0 + 3_600_000, T0 + 3_900_000, tuple())
        t_flat = timed(lambda: flat.read([q]))
        t_chunk = timed(lambda: chunked.read([q]))
        print(f"narrow read (5 min, all series): flat {t_flat:.2f}s, chunked {t_chunk:.2f}s")

        # 2. streamed serve of one hour across all series
        sq = Query(T0, T0 + 3_600_000, tuple())

        def serve_flat():
            results = flat.read([sq])
            frames = 0
            for series_list in results:
                for ts in series_list:
                    chunks = [
                        (mn, mx, chunkenc.CHUNK_TYPE_XOR, d)
                        for mn, mx, d in chunkenc.chunk_samples(
                            (s.timestamp_ms, s.value) for s in ts.samples
                        )
                    ]
                    msg = prompb.encode_chunked_read_response(
                        [(ts.labels, chunks)], 0
                    )
                    frames += len(chunkenc.frame_message(msg))
            return frames

        def serve_chunked():
            out = chunked.read_chunks(sq)
            frames = 0
            for labels, chunks in out:
                msg = prompb.encode_chunked_read_response(
                    [
                        (
                            [Label(k, v) for k, v in sorted(labels.items())],
                            [
                                (mn, mx, chunkenc.CHUNK_TYPE_XOR, d)
                                for mn, mx, d in chunks
                            ],
                        )
                    ],
                    0,
                )
                frames += len(chunkenc.frame_message(msg))
            return frames

        t_serve_flat = timed(serve_flat)
        t_serve_chunk = timed(serve_chunked)
        print(
            f"streamed serve (1 h, all series): encode-from-flat {t_serve_flat:.2f}s, "
            f"zero-decode-chunked {t_serve_chunk:.2f}s"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
