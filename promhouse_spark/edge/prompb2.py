"""Remote-Write 2.0 wire codec: ``io.prometheus.write.v2.Request``.

The reference speaks the 2017-era Remote-Write 1.0 protocol only
(``prompb/prompb.proto:1``, ``handlers/prom.go:281-310``); Prometheus 3.x
adds the public Remote-Write 2.0 message (prometheus/prompb
``io/prometheus/write/v2/types.proto``, spec at
prometheus.io/docs/specs/remote_write_spec_2_0) — a string-interned
encoding that carries samples, native histograms, exemplars, metric
metadata and created timestamps in ONE message:

  Request{symbols=4 (repeated string, [0] MUST be ""), timeseries=5}
  TimeSeries{labels_refs=1 (packed uint32, name/value ref pairs),
             samples=2, histograms=3, exemplars=4, metadata=5,
             created_timestamp=6}
  Exemplar{labels_refs=1 (packed uint32), value=2, timestamp=3}
  Sample{value=1, timestamp=2}
  Metadata{type=1 (enum), help_ref=3, unit_ref=4}
  Histogram — field-compatible with the v1 message this repo already
  codecs (:mod:`promhouse_spark.edge.prompb`), plus custom_values=16
  (packed double) for custom-bucket (NHCB) histograms.

Decode resolves every ref back into the plain :class:`TimeSeries` /
:class:`Exemplar` / :class:`NativeHistogram` model the storage write
path consumes, so a 2.0 write lands in the same two-table schema as a
1.0 write. Encode interns each distinct string once (the symbol table is
the protocol's whole point: label names/values repeat across series, so
at scale the table is tiny relative to the payload it deduplicates).

Spec-mandated validations enforced on decode (each → ``ValueError``,
which the HTTP layer maps to 400): odd labels_refs length, refs outside
the symbol table, a non-empty symbols[0], and an empty label set on a
series that carries data.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Sequence

from promhouse_spark.edge.prompb import (
    _fields,
    _len_delim,
    _packed_varints,
    _read_packed_varints,
    _tag,
    _to_int64,
    _varint,
    decode_histogram,
    encode_histogram,
)
from promhouse_spark.models import (
    Exemplar,
    Label,
    NativeHistogram,
    Sample,
    TimeSeries,
)

# Metadata.MetricType enum (types.proto) ↔ the lowercase names the
# /api/v1/metadata endpoint serves.
_METRIC_TYPE_NAMES = {
    0: "unknown",  # UNSPECIFIED renders as "unknown" in the v1 API
    1: "counter",
    2: "gauge",
    3: "histogram",
    4: "gaugehistogram",
    5: "summary",
    6: "info",
    7: "stateset",
    8: "unknown",
}
_METRIC_TYPE_NUMS = {
    "counter": 1,
    "gauge": 2,
    "histogram": 3,
    "gaugehistogram": 4,
    "summary": 5,
    "info": 6,
    "stateset": 7,
    "unknown": 8,
}

CONTENT_TYPE_V2 = "application/x-protobuf;proto=io.prometheus.write.v2.Request"
CONTENT_TYPE_V1 = "application/x-protobuf;proto=prometheus.WriteRequest"


@dataclass
class MetricMetadata:
    """Per-metric scrape metadata carried by a 2.0 write."""

    type: str = "unknown"
    help: str = ""
    unit: str = ""


@dataclass
class WriteV2Result:
    """A decoded 2.0 request, refs resolved.

    ``series`` is ready for ``storage.write``; ``metadata`` is keyed by
    metric name (last write wins, like Prometheus's metadata cache);
    ``created_timestamps_ms`` is parallel to ``series`` (0 = absent).
    """

    series: list[TimeSeries] = field(default_factory=list)
    metadata: dict[str, MetricMetadata] = field(default_factory=dict)
    created_timestamps_ms: list[int] = field(default_factory=list)

    @property
    def samples_written(self) -> int:
        return sum(len(ts.samples) for ts in self.series)

    @property
    def histograms_written(self) -> int:
        return sum(len(ts.histograms) for ts in self.series)

    @property
    def exemplars_written(self) -> int:
        return sum(len(ts.exemplars) for ts in self.series)


# ------------------------------------------------------------------- decode


def _resolve_refs(refs: list[int], symbols: list[str], what: str) -> list[Label]:
    if len(refs) % 2:
        raise ValueError(f"prompb2: {what} labels_refs has odd length {len(refs)}")
    labels = []
    for i in range(0, len(refs), 2):
        n, v = refs[i], refs[i + 1]
        if n >= len(symbols) or v >= len(symbols):
            raise ValueError(
                f"prompb2: {what} label ref out of range "
                f"(refs {n},{v} vs {len(symbols)} symbols)"
            )
        labels.append(Label(symbols[n], symbols[v]))
    return labels


def _decode_sample_v2(buf: bytes) -> Sample:
    value, ts = 0.0, 0
    for f, w, v, _ in _fields(buf):
        if f == 1 and w == 1:
            value = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif f == 2 and w == 0:
            ts = _to_int64(int(v))
    return Sample(value=value, timestamp_ms=ts)


def _decode_exemplar_v2(buf: bytes, symbols: list[str]) -> Exemplar:
    refs: list[int] = []
    value, ts = 0.0, 0
    for f, w, v, _ in _fields(buf):
        if f == 1 and w == 2:
            refs = _read_packed_varints(v)
        elif f == 1 and w == 0:
            refs.append(int(v))  # unpacked encoding is wire-legal
        elif f == 2 and w == 1:
            value = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif f == 3 and w == 0:
            ts = _to_int64(int(v))
    return Exemplar(labels=_resolve_refs(refs, symbols, "exemplar"), value=value, timestamp_ms=ts)


def _decode_metadata(buf: bytes, symbols: list[str]) -> MetricMetadata:
    m = MetricMetadata()
    for f, w, v, _ in _fields(buf):
        if f == 1 and w == 0:
            m.type = _METRIC_TYPE_NAMES.get(int(v), "unknown")
        elif f == 3 and w == 0:
            if int(v) >= len(symbols):
                raise ValueError("prompb2: help_ref out of range")
            m.help = symbols[int(v)]
        elif f == 4 and w == 0:
            if int(v) >= len(symbols):
                raise ValueError("prompb2: unit_ref out of range")
            m.unit = symbols[int(v)]
    return m


def _decode_histogram_v2(buf: bytes) -> NativeHistogram:
    """The v2 Histogram is field-compatible with v1 plus custom_values=16
    (packed double, NHCB). Custom buckets are decoded faithfully and
    stashed on the model as ``custom_values`` so the HTTP layer can
    reject them explicitly rather than mis-aggregate them as
    exponential buckets."""
    h = decode_histogram(buf)
    custom: list[float] = []
    for f, w, v, _ in _fields(buf):
        if f == 16 and w == 2:
            b = bytes(v)
            custom.extend(
                struct.unpack("<d", b[i : i + 8])[0] for i in range(0, len(b) - 7, 8)
            )
        elif f == 16 and w == 1:
            custom.append(struct.unpack("<d", int(v).to_bytes(8, "little"))[0])
    if custom:
        h.custom_values = custom
    return h


def _decode_timeseries_v2(
    buf: bytes, symbols: list[str]
) -> tuple[TimeSeries, MetricMetadata | None, int]:
    refs: list[int] = []
    samples: list[Sample] = []
    histograms: list[NativeHistogram] = []
    exemplars: list[Exemplar] = []
    metadata: MetricMetadata | None = None
    created = 0
    for f, w, v, _ in _fields(buf):
        if f == 1 and w == 2:
            refs = _read_packed_varints(v)
        elif f == 1 and w == 0:
            refs.append(int(v))
        elif f == 2 and w == 2:
            samples.append(_decode_sample_v2(v))
        elif f == 3 and w == 2:
            histograms.append(_decode_histogram_v2(v))
        elif f == 4 and w == 2:
            exemplars.append(_decode_exemplar_v2(v, symbols))
        elif f == 5 and w == 2:
            metadata = _decode_metadata(v, symbols)
        elif f == 6 and w == 0:
            created = _to_int64(int(v))
    labels = _resolve_refs(refs, symbols, "series")
    if not labels and (samples or histograms or exemplars):
        raise ValueError("prompb2: series with data but no labels")
    ts = TimeSeries(
        labels=labels, samples=samples, histograms=histograms, exemplars=exemplars
    )
    return ts, metadata, created


def decode_write_request_v2(buf: bytes) -> WriteV2Result:
    symbols: list[str] = []
    series_bufs: list[bytes] = []
    for f, w, v, _ in _fields(buf):
        if f == 4 and w == 2:
            symbols.append(bytes(v).decode("utf-8"))
        elif f == 5 and w == 2:
            series_bufs.append(bytes(v))
    if symbols and symbols[0] != "":
        raise ValueError("prompb2: symbols[0] must be the empty string")
    if not symbols:
        symbols = [""]
    out = WriteV2Result()
    for sbuf in series_bufs:
        ts, meta, created = _decode_timeseries_v2(sbuf, symbols)
        out.series.append(ts)
        out.created_timestamps_ms.append(created)
        if meta is not None:
            name = ts.labels_map().get("__name__", "")
            if name:
                out.metadata[name] = meta
    return out


# ------------------------------------------------------------------- encode


class _Symbols:
    """Interning symbol table; ref 0 is the mandatory empty string."""

    def __init__(self) -> None:
        self._refs: dict[str, int] = {"": 0}
        self.table: list[str] = [""]

    def ref(self, s: str) -> int:
        r = self._refs.get(s)
        if r is None:
            r = len(self.table)
            self._refs[s] = r
            self.table.append(s)
        return r


def _encode_sample_v2(s: Sample) -> bytes:
    out = b""
    if s.value != 0.0 or str(s.value) == "-0.0":
        out += _tag(1, 1) + struct.pack("<d", s.value)
    if s.timestamp_ms:
        out += _tag(2, 0) + _varint(int(s.timestamp_ms))
    return out


def _label_refs(labels: Sequence[Label], sym: _Symbols) -> bytes:
    refs: list[int] = []
    for l in sorted(labels, key=lambda l: l.name):
        refs.append(sym.ref(l.name))
        refs.append(sym.ref(l.value))
    return _packed_varints(refs)


def _encode_exemplar_v2(e: Exemplar, sym: _Symbols) -> bytes:
    out = b""
    if e.labels:
        out += _len_delim(1, _label_refs(e.labels, sym))
    if e.value != 0.0 or str(e.value) == "-0.0":
        out += _tag(2, 1) + struct.pack("<d", e.value)
    if e.timestamp_ms:
        out += _tag(3, 0) + _varint(int(e.timestamp_ms))
    return out


def _encode_metadata(m: MetricMetadata, sym: _Symbols) -> bytes:
    out = b""
    t = _METRIC_TYPE_NUMS.get(m.type, 8)
    if t:
        out += _tag(1, 0) + _varint(t)
    if m.help:
        out += _tag(3, 0) + _varint(sym.ref(m.help))
    if m.unit:
        out += _tag(4, 0) + _varint(sym.ref(m.unit))
    return out


def _encode_histogram_v2(h: NativeHistogram) -> bytes:
    out = encode_histogram(h)
    custom = getattr(h, "custom_values", None)
    if custom:
        out += _len_delim(16, b"".join(struct.pack("<d", float(c)) for c in custom))
    return out


def encode_write_request_v2(
    series: Sequence[TimeSeries],
    metadata: dict[str, MetricMetadata] | None = None,
    created_timestamps_ms: Sequence[int] | None = None,
) -> bytes:
    """Encode a 2.0 request. ``metadata`` attaches per-metric metadata to
    the FIRST series of each metric name (Prometheus sends it on every
    series; once is wire-legal and smaller). Symbol table built by
    first-use order, ref 0 = ""."""
    sym = _Symbols()
    bodies: list[bytes] = []
    meta_done: set[str] = set()
    for i, ts in enumerate(series):
        body = _len_delim(1, _label_refs(ts.labels, sym))
        for s in ts.samples:
            body += _len_delim(2, _encode_sample_v2(s))
        for h in ts.histograms:
            body += _len_delim(3, _encode_histogram_v2(h))
        for e in ts.exemplars:
            body += _len_delim(4, _encode_exemplar_v2(e, sym))
        name = ts.labels_map().get("__name__", "")
        if metadata and name in metadata and name not in meta_done:
            body += _len_delim(5, _encode_metadata(metadata[name], sym))
            meta_done.add(name)
        if created_timestamps_ms and i < len(created_timestamps_ms) and created_timestamps_ms[i]:
            body += _tag(6, 0) + _varint(int(created_timestamps_ms[i]))
        bodies.append(body)
    out = b"".join(_len_delim(4, s.encode("utf-8")) if s else _tag(4, 2) + _varint(0) for s in sym.table)
    out += b"".join(_len_delim(5, b) for b in bodies)
    return out


def negotiate_proto(content_type: str) -> str:
    """Extract the ``proto=`` parameter from a remote-write Content-Type;
    the bare ``application/x-protobuf`` means the 1.0 message (spec §
    b/w compat)."""
    parts = [p.strip() for p in (content_type or "").split(";")]
    for p in parts[1:]:
        k, _, v = p.partition("=")
        if k.strip().lower() == "proto":
            return v.strip()
    return "prometheus.WriteRequest"
