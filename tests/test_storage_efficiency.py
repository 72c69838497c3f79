"""At-rest storage efficiency vs the reference's published figure.

The reference publishes ~5.3 B/sample compressed (ClickHouse MergeTree,
README.md:63-65 of Percona-Lab/PromHouse) measured on regular-interval
node_exporter scrapes. This pins our engine's ingest path (sorted by
(fingerprint, timestamp_ms), delta-friendly layout, zstd parquet) below
that figure on the same corpus shape, so the BASELINE.md claim cannot rot.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from storage_efficiency import bytes_per_sample, realistic_samples  # noqa: E402


def test_compressed_bytes_per_sample_beats_reference(spark):
    # smaller than the headline run (200x5000) to keep the suite fast;
    # fewer rows per file means WORSE compression, so passing here implies
    # the headline figure passes too.
    bps = bytes_per_sample(spark, realistic_samples(spark, 50, 2000))
    assert bps < 5.3, f"compressed storage {bps:.2f} B/sample >= reference 5.3"
    # sanity floor: it's a real measurement, not an empty write
    assert bps > 0.1
