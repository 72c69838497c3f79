"""OTLP metrics ingestion (beyond the reference, which predates
OpenTelemetry): a hand-rolled wire codec for the public
opentelemetry-proto ``ExportMetricsServiceRequest`` subset Prometheus
accepts at ``/api/v1/otlp/v1/metrics`` (Prometheus ≥ 3.0), and the
OTLP→Prometheus translation onto :mod:`promhouse_spark.models`:

- gauge / sum number points → float samples; CUMULATIVE monotonic sums
  get the ``_total`` suffix (prometheus/otlptranslator naming);
- histogram points → classic ``_bucket``/``_sum``/``_count`` series with
  cumulative ``le`` labels from ``explicit_bounds``;
- exponential-histogram points → native histograms (OTLP ``scale`` IS
  the Prometheus ``schema``; positive bucket at array position k with
  ``offset`` covers (base^(offset+k), base^(offset+k+1)] which is
  Prometheus bucket index offset+k+1);
- resource attributes → one ``target_info`` series per resource, with
  ``service.name``/``service.instance.id`` promoted to ``job``/
  ``instance`` on every series (the promql ``info()`` join key);
- DELTA temporality is rejected (Prometheus default behavior — no
  delta-to-cumulative feature flag here);
- label/metric names sanitize ``[^a-zA-Z0-9_:]`` → ``_`` (classic
  normalization; Prometheus 3 UTF-8 names are opt-in).

Wire rules follow the same proto3 conventions as
:mod:`promhouse_spark.edge.prompb`, whose primitive helpers this module
reuses. Only the fields the translation consumes are encoded/decoded;
unknown fields are skipped, as proto requires.
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass, field

from promhouse_spark.edge.prompb import (
    _fields,
    _len_delim,
    _tag,
    _to_int64,
    _unzigzag,
    _varint,
    _zigzag,
)
from promhouse_spark.models import Label, NativeHistogram, Sample, TimeSeries

# temporality enum (metrics.proto AggregationTemporality)
DELTA = 1
CUMULATIVE = 2

_INVALID = re.compile(r"[^a-zA-Z0-9_:]")
_INVALID_LABEL = re.compile(r"[^a-zA-Z0-9_]")


def sanitize_metric_name(name: str) -> str:
    out = _INVALID.sub("_", name)
    return "_" + out[1:] if out[:1].isdigit() else out


def sanitize_label_name(name: str) -> str:
    out = _INVALID_LABEL.sub("_", name)
    return "_" + out[1:] if out[:1].isdigit() else out


# ------------------------------------------------------------------ model


@dataclass
class OtlpExemplar:
    """metrics.proto Exemplar: filtered_attributes=7, time_unix_nano=2,
    as_double=3 / as_int=6, span_id=8 (8 bytes), trace_id=9 (16 bytes)."""

    attributes: dict = field(default_factory=dict)
    time_unix_nano: int = 0
    value: float = 0.0
    span_id: bytes = b""
    trace_id: bytes = b""


@dataclass
class NumberPoint:
    attributes: dict = field(default_factory=dict)
    time_unix_nano: int = 0
    value: float = 0.0
    exemplars: list = field(default_factory=list)


@dataclass
class HistogramPoint:
    attributes: dict = field(default_factory=dict)
    time_unix_nano: int = 0
    count: int = 0
    sum: float = 0.0
    bucket_counts: list = field(default_factory=list)
    explicit_bounds: list = field(default_factory=list)


@dataclass
class ExpHistogramPoint:
    attributes: dict = field(default_factory=dict)
    time_unix_nano: int = 0
    count: int = 0
    sum: float = 0.0
    scale: int = 0
    zero_count: int = 0
    positive_offset: int = 0
    positive_counts: list = field(default_factory=list)
    negative_offset: int = 0
    negative_counts: list = field(default_factory=list)


@dataclass
class OtlpMetric:
    name: str = ""
    unit: str = ""
    kind: str = "gauge"  # gauge | sum | histogram | exponential_histogram
    temporality: int = CUMULATIVE
    is_monotonic: bool = False
    number_points: list = field(default_factory=list)
    histogram_points: list = field(default_factory=list)
    exp_points: list = field(default_factory=list)


@dataclass
class OtlpResourceMetrics:
    resource_attributes: dict = field(default_factory=dict)
    metrics: list = field(default_factory=list)


# ------------------------------------------------------------------ encode
# (the test/client side: build valid OTLP payloads without protoc)


def _encode_anyvalue(v) -> bytes:
    if isinstance(v, bool):
        return _tag(2, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(3, 0) + _varint(v)
    if isinstance(v, float):
        return _tag(4, 1) + struct.pack("<d", v)
    return _len_delim(1, str(v).encode())


def _encode_kv(k: str, v) -> bytes:
    return _len_delim(1, k.encode()) + _len_delim(2, _encode_anyvalue(v))


def _encode_attrs(field_no: int, attrs: dict) -> bytes:
    return b"".join(
        _len_delim(field_no, _encode_kv(k, v)) for k, v in attrs.items()
    )


def _encode_otlp_exemplar(e: OtlpExemplar) -> bytes:
    out = _encode_attrs(7, e.attributes)
    out += _tag(2, 1) + struct.pack("<Q", e.time_unix_nano)
    out += _tag(3, 1) + struct.pack("<d", float(e.value))
    if e.span_id:
        out += _len_delim(8, e.span_id)
    if e.trace_id:
        out += _len_delim(9, e.trace_id)
    return out


def _encode_number_point(p: NumberPoint) -> bytes:
    out = _encode_attrs(7, p.attributes)
    out += _tag(3, 1) + struct.pack("<Q", p.time_unix_nano)
    out += _tag(4, 1) + struct.pack("<d", float(p.value))
    for e in p.exemplars:
        out += _len_delim(5, _encode_otlp_exemplar(e))
    return out


def _encode_histogram_point(p: HistogramPoint) -> bytes:
    out = _encode_attrs(9, p.attributes)
    out += _tag(3, 1) + struct.pack("<Q", p.time_unix_nano)
    out += _tag(4, 1) + struct.pack("<Q", int(p.count))
    out += _tag(5, 1) + struct.pack("<d", float(p.sum))
    if p.bucket_counts:
        out += _len_delim(
            6, b"".join(struct.pack("<Q", int(c)) for c in p.bucket_counts)
        )
    if p.explicit_bounds:
        out += _len_delim(
            7, b"".join(struct.pack("<d", float(b)) for b in p.explicit_bounds)
        )
    return out


def _encode_exp_buckets(offset: int, counts: list) -> bytes:
    out = _tag(1, 0) + _varint(_zigzag(int(offset)))
    if counts:
        out += _len_delim(2, b"".join(_varint(int(c)) for c in counts))
    return out


def _encode_exp_point(p: ExpHistogramPoint) -> bytes:
    out = _encode_attrs(1, p.attributes)
    out += _tag(3, 1) + struct.pack("<Q", p.time_unix_nano)
    out += _tag(4, 1) + struct.pack("<Q", int(p.count))
    out += _tag(5, 1) + struct.pack("<d", float(p.sum))
    out += _tag(6, 0) + _varint(_zigzag(int(p.scale)))
    out += _tag(7, 1) + struct.pack("<Q", int(p.zero_count))
    out += _len_delim(8, _encode_exp_buckets(p.positive_offset, p.positive_counts))
    if p.negative_counts:
        out += _len_delim(
            9, _encode_exp_buckets(p.negative_offset, p.negative_counts)
        )
    return out


_KIND_FIELD = {"gauge": 5, "sum": 7, "histogram": 9, "exponential_histogram": 10}


def _encode_metric(m: OtlpMetric) -> bytes:
    out = _len_delim(1, m.name.encode())
    if m.unit:
        out += _len_delim(3, m.unit.encode())
    body = b""
    if m.kind == "gauge":
        body = b"".join(
            _len_delim(1, _encode_number_point(p)) for p in m.number_points
        )
    elif m.kind == "sum":
        body = b"".join(
            _len_delim(1, _encode_number_point(p)) for p in m.number_points
        )
        body += _tag(2, 0) + _varint(m.temporality)
        if m.is_monotonic:
            body += _tag(3, 0) + _varint(1)
    elif m.kind == "histogram":
        body = b"".join(
            _len_delim(1, _encode_histogram_point(p)) for p in m.histogram_points
        )
        body += _tag(2, 0) + _varint(m.temporality)
    elif m.kind == "exponential_histogram":
        body = b"".join(
            _len_delim(1, _encode_exp_point(p)) for p in m.exp_points
        )
        body += _tag(2, 0) + _varint(m.temporality)
    out += _len_delim(_KIND_FIELD[m.kind], body)
    return out


def encode_export_request(resources: list[OtlpResourceMetrics]) -> bytes:
    out = b""
    for rm in resources:
        resource = _encode_attrs(1, rm.resource_attributes)
        scope = b"".join(_len_delim(2, _encode_metric(m)) for m in rm.metrics)
        out += _len_delim(1, _len_delim(1, resource) + _len_delim(2, scope))
    return out


# ------------------------------------------------------------------ decode


def _decode_anyvalue(buf: bytes):
    for f, wire, v, _ in _fields(buf):
        if f == 1 and wire == 2:
            return v.decode()
        if f == 2 and wire == 0:
            return bool(v)
        if f == 3 and wire == 0:
            return _to_int64(v)
        if f == 4 and wire == 1:
            return struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
    return None


def _decode_kv(buf: bytes) -> tuple[str, object]:
    k, val = "", None
    for f, wire, v, _ in _fields(buf):
        if f == 1 and wire == 2:
            k = v.decode()
        elif f == 2 and wire == 2:
            val = _decode_anyvalue(v)
    return k, val


def _decode_otlp_exemplar(buf: bytes) -> OtlpExemplar:
    e = OtlpExemplar()
    for f, wire, v, _ in _fields(buf):
        if f == 7 and wire == 2:
            k, val = _decode_kv(v)
            e.attributes[k] = val
        elif f == 2 and wire == 1:
            e.time_unix_nano = int(v)
        elif f == 3 and wire == 1:
            e.value = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif f == 6 and wire == 0:  # as_int
            e.value = float(_to_int64(v))
        elif f == 8 and wire == 2:
            e.span_id = v
        elif f == 9 and wire == 2:
            e.trace_id = v
    return e


def _decode_number_point(buf: bytes) -> NumberPoint:
    p = NumberPoint()
    for f, wire, v, _ in _fields(buf):
        if f == 7 and wire == 2:
            k, val = _decode_kv(v)
            p.attributes[k] = val
        elif f == 3 and wire == 1:
            p.time_unix_nano = int(v)
        elif f == 4 and wire == 1:
            p.value = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif f == 6 and wire == 0:  # as_int
            p.value = float(_to_int64(v))
        elif f == 5 and wire == 2:
            p.exemplars.append(_decode_otlp_exemplar(v))
    return p


def _decode_histogram_point(buf: bytes) -> HistogramPoint:
    p = HistogramPoint()
    for f, wire, v, _ in _fields(buf):
        if f == 9 and wire == 2:
            k, val = _decode_kv(v)
            p.attributes[k] = val
        elif f == 3 and wire == 1:
            p.time_unix_nano = int(v)
        elif f == 4 and wire == 1:
            p.count = int(v)
        elif f == 5 and wire == 1:
            p.sum = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif f == 6 and wire == 2:
            p.bucket_counts = [
                struct.unpack("<Q", v[i : i + 8])[0] for i in range(0, len(v), 8)
            ]
        elif f == 7 and wire == 2:
            p.explicit_bounds = [
                struct.unpack("<d", v[i : i + 8])[0] for i in range(0, len(v), 8)
            ]
    return p


def _decode_exp_buckets(buf: bytes) -> tuple[int, list[int]]:
    offset, counts = 0, []
    for f, wire, v, _ in _fields(buf):
        if f == 1 and wire == 0:
            offset = _unzigzag(int(v))
        elif f == 2 and wire == 2:
            pos = 0
            from promhouse_spark.edge.prompb import _read_varint

            while pos < len(v):
                u, pos = _read_varint(v, pos)
                counts.append(u)
        elif f == 2 and wire == 0:  # non-packed encoding
            counts.append(int(v))
    return offset, counts


def _decode_exp_point(buf: bytes) -> ExpHistogramPoint:
    p = ExpHistogramPoint()
    for f, wire, v, _ in _fields(buf):
        if f == 1 and wire == 2:
            k, val = _decode_kv(v)
            p.attributes[k] = val
        elif f == 3 and wire == 1:
            p.time_unix_nano = int(v)
        elif f == 4 and wire == 1:
            p.count = int(v)
        elif f == 5 and wire == 1:
            p.sum = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif f == 6 and wire == 0:
            p.scale = _unzigzag(int(v))
        elif f == 7 and wire == 1:
            p.zero_count = int(v)
        elif f == 8 and wire == 2:
            p.positive_offset, p.positive_counts = _decode_exp_buckets(v)
        elif f == 9 and wire == 2:
            p.negative_offset, p.negative_counts = _decode_exp_buckets(v)
    return p


def _decode_metric(buf: bytes) -> OtlpMetric:
    m = OtlpMetric()
    for f, wire, v, _ in _fields(buf):
        if f == 1 and wire == 2:
            m.name = v.decode()
        elif f == 3 and wire == 2:
            m.unit = v.decode()
        elif f in (5, 7) and wire == 2:
            m.kind = "gauge" if f == 5 else "sum"
            for sf, swire, sv, _ in _fields(v):
                if sf == 1 and swire == 2:
                    m.number_points.append(_decode_number_point(sv))
                elif sf == 2 and swire == 0:
                    m.temporality = int(sv)
                elif sf == 3 and swire == 0:
                    m.is_monotonic = bool(sv)
        elif f == 9 and wire == 2:
            m.kind = "histogram"
            for sf, swire, sv, _ in _fields(v):
                if sf == 1 and swire == 2:
                    m.histogram_points.append(_decode_histogram_point(sv))
                elif sf == 2 and swire == 0:
                    m.temporality = int(sv)
        elif f == 10 and wire == 2:
            m.kind = "exponential_histogram"
            for sf, swire, sv, _ in _fields(v):
                if sf == 1 and swire == 2:
                    m.exp_points.append(_decode_exp_point(sv))
                elif sf == 2 and swire == 0:
                    m.temporality = int(sv)
    return m


def decode_export_request(buf: bytes) -> list[OtlpResourceMetrics]:
    out: list[OtlpResourceMetrics] = []
    for f, wire, v, _ in _fields(buf):
        if f != 1 or wire != 2:
            continue
        rm = OtlpResourceMetrics()
        for rf, rwire, rv, _ in _fields(v):
            if rf == 1 and rwire == 2:  # Resource
                for af, awire, av, _ in _fields(rv):
                    if af == 1 and awire == 2:
                        k, val = _decode_kv(av)
                        rm.resource_attributes[k] = val
            elif rf == 2 and rwire == 2:  # ScopeMetrics
                for sf, swire, sv, _ in _fields(rv):
                    if sf == 2 and swire == 2:
                        rm.metrics.append(_decode_metric(sv))
        out.append(rm)
    return out


# --------------------------------------------------------------- translate


def _attr_labels(attrs: dict) -> list[Label]:
    return [
        Label(sanitize_label_name(k), str(v))
        for k, v in sorted(attrs.items())
        if v is not None
    ]


def _prom_exemplars(otlp_exemplars: list) -> list:
    """OTLP exemplars → model Exemplars: filtered attributes become
    labels, trace/span ids render as lowercase hex under the canonical
    ``trace_id``/``span_id`` names (the Prometheus OTLP translation)."""
    from promhouse_spark.models import Exemplar

    out = []
    for e in otlp_exemplars:
        labels = _attr_labels(e.attributes)
        if e.trace_id:
            labels.append(Label("trace_id", e.trace_id.hex()))
        if e.span_id:
            labels.append(Label("span_id", e.span_id.hex()))
        out.append(
            Exemplar(
                labels=sorted(labels),
                value=float(e.value),
                timestamp_ms=e.time_unix_nano // 1_000_000,
            )
        )
    return out


def translate(resources: list[OtlpResourceMetrics]) -> list[TimeSeries]:
    """OTLP→Prometheus data-model translation (the storage-agnostic core
    of Prometheus's otlp write handler). Raises ValueError on DELTA
    temporality. Returns model TimeSeries ready for ``Storage.write``."""
    out: list[TimeSeries] = []
    for rm in resources:
        ra = rm.resource_attributes
        job = str(ra.get("service.name", "")) or None
        instance = str(ra.get("service.instance.id", "")) or None
        base: list[Label] = []
        if job is not None:
            base.append(Label("job", job))
        if instance is not None:
            base.append(Label("instance", instance))

        def series(name: str, extra: list[Label]) -> list[Label]:
            return [Label("__name__", sanitize_metric_name(name)), *base, *extra]

        latest_ns = 0
        for m in rm.metrics:
            if m.kind in ("sum", "histogram", "exponential_histogram") and (
                m.temporality == DELTA
            ):
                raise ValueError(
                    f"delta temporality is not supported (metric {m.name!r})"
                )
            name = m.name
            if m.kind == "sum" and m.is_monotonic and not name.endswith("_total"):
                name += "_total"
            if m.kind in ("gauge", "sum"):
                for p in m.number_points:
                    latest_ns = max(latest_ns, p.time_unix_nano)
                    out.append(
                        TimeSeries(
                            labels=series(name, _attr_labels(p.attributes)),
                            samples=[
                                Sample(
                                    value=float(p.value),
                                    timestamp_ms=p.time_unix_nano // 1_000_000,
                                )
                            ],
                            exemplars=_prom_exemplars(p.exemplars),
                        )
                    )
            elif m.kind == "histogram":
                for p in m.histogram_points:
                    latest_ns = max(latest_ns, p.time_unix_nano)
                    t_ms = p.time_unix_nano // 1_000_000
                    attrs = _attr_labels(p.attributes)
                    cum = 0
                    for i, bound in enumerate(list(p.explicit_bounds) + [None]):
                        cum += (
                            p.bucket_counts[i] if i < len(p.bucket_counts) else 0
                        )
                        le = "+Inf" if bound is None else repr(float(bound))
                        out.append(
                            TimeSeries(
                                labels=series(
                                    name + "_bucket",
                                    attrs + [Label("le", le)],
                                ),
                                samples=[Sample(float(cum), t_ms)],
                            )
                        )
                    out.append(
                        TimeSeries(
                            labels=series(name + "_sum", attrs),
                            samples=[Sample(float(p.sum), t_ms)],
                        )
                    )
                    out.append(
                        TimeSeries(
                            labels=series(name + "_count", attrs),
                            samples=[Sample(float(p.count), t_ms)],
                        )
                    )
            elif m.kind == "exponential_histogram":
                for p in m.exp_points:
                    latest_ns = max(latest_ns, p.time_unix_nano)
                    # OTLP positive bucket k covers
                    # (base^(offset+k), base^(offset+k+1)] → Prom idx offset+k+1
                    pos = [
                        (p.positive_offset + k + 1, float(c))
                        for k, c in enumerate(p.positive_counts)
                        if c
                    ]
                    neg = [
                        (p.negative_offset + k + 1, float(c))
                        for k, c in enumerate(p.negative_counts)
                        if c
                    ]
                    out.append(
                        TimeSeries(
                            labels=series(name, _attr_labels(p.attributes)),
                            histograms=[
                                NativeHistogram(
                                    timestamp_ms=p.time_unix_nano // 1_000_000,
                                    count=float(p.count),
                                    sum=float(p.sum),
                                    schema=int(p.scale),
                                    zero_threshold=0.0,
                                    zero_count=float(p.zero_count),
                                    positive=pos,
                                    negative=neg,
                                )
                            ],
                        )
                    )
        # one target_info series per resource carrying the non-identifying
        # resource attributes (the promql info() data source)
        data_attrs = {
            k: v
            for k, v in ra.items()
            if k not in ("service.name", "service.instance.id")
        }
        if data_attrs and latest_ns:
            out.append(
                TimeSeries(
                    labels=[
                        Label("__name__", "target_info"),
                        *base,
                        *_attr_labels(data_attrs),
                    ],
                    samples=[Sample(1.0, latest_ns // 1_000_000)],
                )
            )
    return out
