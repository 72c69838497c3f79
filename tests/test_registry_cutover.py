"""Registry-cardinality auto-cutover (storage/parquet.py
DEFAULT_REGISTRY_CACHE_MAX_SERIES): above the cutover the driver-side
registry dict disables itself and every read path stays distributed —
the high-cardinality guard tools/cardinality_gate.py measures at 100k-5M
series, gated here at toy scale so the flip logic itself is covered on
every run."""

from __future__ import annotations

import pytest

from promhouse_spark.models import Label, Query, Sample, TimeSeries, make_matchers
from promhouse_spark.storage.parquet import SparkParquetStorage

T0 = 1_700_000_000_000


def _series(i: int) -> TimeSeries:
    return TimeSeries(
        labels=[Label("__name__", "up"), Label("instance", f"i-{i}")],
        samples=[Sample(float(k), T0 + k * 15_000) for k in range(4)],
    )


def _write_ten(spark, root) -> None:
    w = SparkParquetStorage(spark, root)
    w.write([_series(i) for i in range(10)])


def test_cache_disables_above_cutover_and_reads_agree(spark, tmp_path):
    root = str(tmp_path / "s")
    _write_ten(spark, root)
    q = Query(T0, T0 + 10**6, make_matchers(("__name__", "=", "up")))

    cached = SparkParquetStorage(spark, root, registry_cache_max_series=None)
    assert cached.cache_registry and len(cached._registry) == 10

    auto = SparkParquetStorage(spark, root, registry_cache_max_series=5)
    assert auto.cache_registry is False
    assert auto._registry == {}

    a = cached.read([q])[0]
    b = auto.read([q])[0]
    assert len(a) == len(b) == 10
    key = lambda ts: tuple((l.name, l.value) for l in ts.labels)  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
    for ta, tb in zip(sorted(a, key=key), sorted(b, key=key)):
        assert [(s.timestamp_ms, s.value) for s in ta.samples] == [
            (s.timestamp_ms, s.value) for s in tb.samples
        ]
    # the cached-only fast path steps aside instead of serving stale/empty
    with pytest.raises(ValueError, match="cache_registry"):
        next(auto.iter_series(q))


def test_cache_reenables_when_back_under_cutover(spark, tmp_path):
    root = str(tmp_path / "s")
    _write_ten(spark, root)
    store = SparkParquetStorage(spark, root, registry_cache_max_series=5)
    assert store.cache_registry is False
    # retention / cleanup shrinks the registry below the cutover: the next
    # reload re-enables the dict (the reloader thread calls this every 5 s)
    store.registry_cache_max_series = 50
    store.reload_registry()
    assert store.cache_registry is True and len(store._registry) == 10


def test_explicit_cache_off_never_reenables(spark, tmp_path):
    root = str(tmp_path / "s")
    _write_ten(spark, root)
    store = SparkParquetStorage(spark, root, cache_registry=False)
    store.reload_registry()  # a manual/reloader refresh must honor intent
    assert store.cache_registry is False and store._registry == {}


def test_under_cutover_keeps_reference_parity_cache(spark, tmp_path):
    root = str(tmp_path / "s")
    _write_ten(spark, root)
    store = SparkParquetStorage(spark, root)  # default cutover = 2M
    assert store.cache_registry is True and len(store._registry) == 10
