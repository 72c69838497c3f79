"""Spark Python DataSource for the framed dump format (S8/S9 at cluster
scale): ``spark.read.format("promframed").load(path)`` scans promload
dump files DISTRIBUTED — one task per file — instead of the driver-side
``read_frames`` loop, and ``df.write.format("promframed")`` emits one
framed file per partition.

The frame stream (``uint32 BE length`` + ``snappy(protobuf(TimeSeries))``,
``cmd/promload/file.go:63-155``) has no sync markers, so a single file
cannot split; per-FILE parallelism is the honest distribution unit (the
same contract as gzipped text). Rows come out flat —
(fingerprint, labels, timestamp_ms, value) — with the bit-exact FNV-1a
fingerprint computed per series, so the scan lands directly in the
engine's samples shape; ``labels`` is the canonical sorted JSON.

Registered lazily: ``register_framed_source(spark)`` once per session,
then the format name is available to any reader/writer.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = (
    "fingerprint long, labels string, timestamp_ms long, value double"
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FramedReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("promframed requires a path")

    def partitions(self):
        import glob

        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*.framed")))
        else:
            files = sorted(glob.glob(self.path)) or [self.path]
        if not files:
            raise FileNotFoundError(f"no framed files under {self.path}")
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        # imports inside read(): the method runs on executors
        from promhouse_spark.edge.framed import read_frames
        from promhouse_spark.functions.fingerprint import fingerprint_signed
        from promhouse_spark.functions.labels import marshal_labels

        with open(partition.path, "rb") as f:
            for ts in read_frames(f):
                labels = {l.name: l.value for l in ts.labels}
                fp = fingerprint_signed(labels)
                ljson = marshal_labels(labels)
                for s in ts.samples:
                    yield (fp, ljson, s.timestamp_ms, s.value)


class _Committed(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class FramedWriter(DataSourceWriter):
    """One framed file per partition. Rows must carry (labels JSON,
    timestamp_ms, value); samples sharing a labels set within the
    partition group into one TimeSeries frame per run (the dump format
    allows a series to span frames — promload itself writes per-batch
    frames, file.go:139-155)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("promframed requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        from promhouse_spark.edge.framed import write_frames
        from promhouse_spark.functions.labels import unmarshal_labels
        from promhouse_spark.models import Label, Sample, TimeSeries

        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.framed")
        groups: dict[str, list] = {}
        for row in iterator:
            groups.setdefault(row["labels"], []).append(
                Sample(value=row["value"], timestamp_ms=row["timestamp_ms"])
            )
        series = [
            TimeSeries(
                labels=[Label(k, v) for k, v in sorted(unmarshal_labels(lj).items())],
                samples=sorted(samples, key=lambda s: s.timestamp_ms),
            )
            for lj, samples in sorted(groups.items())
        ]
        n = 0
        if series:
            with open(out, "wb") as f:
                n = write_frames(f, series)
        else:
            out = ""
        return _Committed(out, n)

    def commit(self, messages):
        # honor mode("overwrite"): drop any pre-existing framed parts that
        # this job did NOT write — otherwise a re-run silently appends a
        # second copy of every sample next to the old dump
        if self.overwrite:
            import glob

            kept = {
                m.path for m in messages if m is not None and getattr(m, "path", "")
            }
            for f in glob.glob(os.path.join(self.path, "*.framed")):
                if f not in kept:
                    try:
                        os.remove(f)
                    except OSError:
                        pass
        return None

    def abort(self, messages):
        for m in messages:
            if m is not None and getattr(m, "path", ""):
                try:
                    os.remove(m.path)
                except OSError:
                    pass


class FramedDataSource(DataSource):
    @classmethod
    def name(cls):
        return "promframed"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return FramedReader(self.options)

    def writer(self, schema, overwrite: bool):
        return FramedWriter(self.options, overwrite)


def register_framed_source(spark) -> None:
    """Idempotently register the format with a session."""
    spark.dataSource.register(FramedDataSource)


def distributed_restore(storage, framed_path: str, files_per_day: int = 4) -> tuple[int, int]:
    """Dump-directory → storage at cluster scale: scan promload framed
    dumps through the ``promframed`` DataSource (one task per file), derive
    the registry diff as a distinct+anti-join, and append samples through
    the bulk ``ingest_df`` path — no driver-side TimeSeries loop, unlike
    ``promload copy file:... store:...`` (which exists for protocol parity,
    ``cmd/promload/main.go:205-241``; this is the shape you actually run on
    a cluster against a TB-scale dump).

    Returns (new_series, samples) counts."""
    from pyspark.sql import functions as F

    from promhouse_spark.schemas import DATE, FINGERPRINT, LABELS

    spark = storage.spark
    register_framed_source(spark)
    df = spark.read.format("promframed").load(framed_path)
    df = df.persist()
    try:
        reg = (
            df.select(
                FINGERPRINT,
                F.from_json("labels", "map<string,string>").alias(LABELS),
            )
            .dropDuplicates([FINGERPRINT])
            .withColumn(DATE, F.current_date())
            .select(DATE, FINGERPRINT, LABELS)
        )
        new_reg = reg.join(
            storage._existing_fingerprints(), FINGERPRINT, "left_anti"
        ).select(DATE, FINGERPRINT, LABELS)
        n_new = new_reg.count()
        if n_new:
            storage._append_registry(new_reg)
            storage.reload_registry()
        samples = df.select(FINGERPRINT, "timestamp_ms", "value")
        n_samples = samples.count()
        storage.ingest_df(samples, files_per_day=files_per_day)
        return n_new, n_samples
    finally:
        df.unpersist()
