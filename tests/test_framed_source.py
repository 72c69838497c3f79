"""Python DataSource for framed dumps (edge/framed_source.py): distributed
per-file scan equals the driver-side frame reader, fingerprints are
bit-exact, and write→read round-trips."""

from __future__ import annotations

import glob
import os

import pytest

from promhouse_spark.edge.framed import read_frames, write_frames
from promhouse_spark.edge.framed_source import register_framed_source
from promhouse_spark.functions.fingerprint import fingerprint_signed
from promhouse_spark.models import Label, Sample, TimeSeries


@pytest.fixture(scope="module")
def framed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("framed")
    for i in range(3):
        with open(d / f"dump{i}.framed", "wb") as f:
            write_frames(
                f,
                [
                    TimeSeries(
                        labels=[Label("__name__", "up"), Label("job", f"j{i}")],
                        samples=[Sample(float(k), 1000 * k) for k in range(5)],
                    ),
                    TimeSeries(
                        labels=[Label("__name__", "down"), Label("job", f"j{i}")],
                        samples=[Sample(2.0 * k, 500 * k) for k in range(3)],
                    ),
                ],
            )
    return str(d)


def test_distributed_scan_matches_driver_reader(spark, framed_dir):
    register_framed_source(spark)
    df = spark.read.format("promframed").load(framed_dir)
    assert df.rdd.getNumPartitions() == 3  # one task per file
    got = sorted(tuple(r) for r in df.collect())

    want = []
    for path in sorted(glob.glob(os.path.join(framed_dir, "*.framed"))):
        with open(path, "rb") as f:
            for ts in read_frames(f):
                labels = {l.name: l.value for l in ts.labels}
                fp = fingerprint_signed(labels)
                for s in ts.samples:
                    want.append((fp, s.timestamp_ms, s.value))
    assert [(r[0], r[2], r[3]) for r in got] == sorted(want)
    # labels come out as the canonical sorted JSON
    assert all(r[1].startswith('{"__name__":"') for r in got)


def test_write_read_roundtrip(spark, framed_dir, tmp_path):
    register_framed_source(spark)
    df = spark.read.format("promframed").load(framed_dir)
    out = str(tmp_path / "out")
    df.repartition(2).write.format("promframed").mode("append").save(out)
    assert len(glob.glob(out + "/*.framed")) <= 2  # one file per partition
    back = spark.read.format("promframed").load(out)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # the written files are valid for the plain driver-side reader too
    n_series = 0
    for path in glob.glob(out + "/*.framed"):
        with open(path, "rb") as f:
            n_series += sum(1 for _ in read_frames(f))
    assert n_series >= 2


def test_missing_path_is_an_error(spark):
    register_framed_source(spark)
    with pytest.raises(Exception):
        spark.read.format("promframed").load("/nonexistent/dir").collect()


def test_distributed_restore_into_storage(spark, framed_dir, tmp_path):
    """Dump → storage without a driver-side series loop: the restored
    store must answer matcher reads identically to protocol-written data,
    and a second restore of the same dump must add no registry rows
    (anti-join idempotence)."""
    from promhouse_spark.edge.framed_source import distributed_restore
    from promhouse_spark.models import Query, make_matchers
    from promhouse_spark.storage.parquet import SparkParquetStorage

    store = SparkParquetStorage(spark, str(tmp_path / "restored"))
    n_series, n_samples = distributed_restore(store, framed_dir)
    assert n_series == 6 and n_samples == 3 * (5 + 3)

    [res] = store.read(
        [Query(0, 10_000_000, make_matchers(("__name__", "=", "up"), ("job", "=", "j1")))]
    )
    assert len(res) == 1
    assert [s.value for s in res[0].samples] == [0.0, 1.0, 2.0, 3.0, 4.0]

    # idempotent registry: restoring again adds samples but no series
    n_series2, _ = distributed_restore(store, framed_dir)
    assert n_series2 == 0


def test_overwrite_mode_replaces_existing_parts(spark, framed_dir, tmp_path):
    """mode('overwrite') must not leave the previous run's parts behind —
    a re-run would otherwise silently double every sample in the dump."""
    register_framed_source(spark)
    df = spark.read.format("promframed").load(framed_dir)
    out = str(tmp_path / "ow")
    df.repartition(2).write.format("promframed").mode("append").save(out)
    first = set(glob.glob(out + "/*.framed"))
    assert first
    df.repartition(1).write.format("promframed").mode("overwrite").save(out)
    second = set(glob.glob(out + "/*.framed"))
    assert not (first & second)  # old parts are gone
    back = spark.read.format("promframed").load(out)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # append after overwrite still accumulates (no accidental clearing)
    df.repartition(1).write.format("promframed").mode("append").save(out)
    assert spark.read.format("promframed").load(out).count() == 2 * df.count()
