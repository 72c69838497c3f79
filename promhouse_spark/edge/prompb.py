"""Hand-rolled protobuf wire codec for the prompb messages (S1/S2 payloads).

Implements exactly the message set of ``prompb/prompb.proto`` (Prometheus
2.x remote read/write compatibility is the reference's explicit goal,
``prompb.proto:1``), mapping directly onto :mod:`promhouse_spark.models`:

  Label{name=1,value=2}  Sample{value=1,timestamp_ms=2}
  TimeSeries{labels=1,samples=2}
  LabelMatcher{type=1 (EQ/NEQ/RE/NRE), name=2, value=3}
  ReadHints{step_ms=1,func=2,start_ms=3,end_ms=4}
  Query{start_timestamp_ms=1,end_timestamp_ms=2,matchers=3,hints=4}
  QueryResult{time_series=1}  ReadRequest{queries=1}
  ReadResponse{results=1}     WriteRequest{time_series=1}

Proto3 wire rules honored: varint int64 (two's complement, 10 bytes when
negative), little-endian fixed64 doubles, length-delimited strings/messages,
unknown fields skipped, default values omitted on encode. ReadHints are
decoded but ignored by the engine, matching ``handlers/prom.go:184-186``.

Beyond the reference's 2017-era proto: the NATIVE-HISTOGRAM message
(public prometheus/prompb types.proto ``Histogram``, TimeSeries field 4,
remote-write ≥ Prometheus 2.40) — sint32/sint64 zigzag, packed repeated
deltas/counts, BucketSpan run-length encoding expanded to explicit
(index, count) pairs on decode and re-derived on encode — and the
EXEMPLAR message (types.proto ``Exemplar``, TimeSeries field 3,
remote-write ≥ Prometheus 2.27): trace-correlation labels + value +
timestamp.
"""

from __future__ import annotations

import struct
from typing import Iterator, Sequence

from promhouse_spark.models import (
    Exemplar,
    Label,
    MatchType,
    Matcher,
    NativeHistogram,
    Query,
    Sample,
    TimeSeries,
)

_MATCH_TYPE_BY_NUM = {0: MatchType.EQ, 1: MatchType.NEQ, 2: MatchType.RE, 3: MatchType.NRE}
_NUM_BY_MATCH_TYPE = {v: k for k, v in _MATCH_TYPE_BY_NUM.items()}

_MASK64 = (1 << 64) - 1


# ---------------------------------------------------------------- primitives


def _varint(n: int) -> bytes:
    n &= _MASK64  # negative int64 → 10-byte two's-complement varint
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("prompb: truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("prompb: varint too long")


def _to_int64(u: int) -> int:
    u &= _MASK64
    return u - (1 << 64) if u >= (1 << 63) else u


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _fields(buf: bytes) -> Iterator[tuple[int, int, object, int]]:
    """Yield (field_number, wire_type, value, end_pos); value is int for
    varint/fixed, bytes for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x07
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield field, wire, v, pos
        elif wire == 1:
            if pos + 8 > n:
                raise ValueError("prompb: truncated fixed64")
            yield field, wire, int.from_bytes(buf[pos : pos + 8], "little"), pos + 8
            pos += 8
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            if pos + length > n:
                raise ValueError("prompb: truncated length-delimited field")
            yield field, wire, buf[pos : pos + length], pos + length
            pos += length
        elif wire == 5:
            if pos + 4 > n:
                raise ValueError("prompb: truncated fixed32")
            yield field, wire, int.from_bytes(buf[pos : pos + 4], "little"), pos + 4
            pos += 4
        else:
            raise ValueError(f"prompb: unsupported wire type {wire}")


# ------------------------------------------------------------------- encode


def encode_label(l: Label) -> bytes:
    out = b""
    if l.name:
        out += _len_delim(1, l.name.encode())
    if l.value:
        out += _len_delim(2, l.value.encode())
    return out


def encode_sample(s: Sample) -> bytes:
    out = b""
    if s.value != 0.0 or str(s.value) == "-0.0":
        out += _tag(1, 1) + struct.pack("<d", s.value)
    if s.timestamp_ms:
        out += _tag(2, 0) + _varint(int(s.timestamp_ms))
    return out


def encode_exemplar(e: Exemplar) -> bytes:
    """Public prometheus/prompb types.proto ``Exemplar``:
    labels=1 (repeated), value=2 (double), timestamp=3 (int64)."""
    out = b""
    for l in e.labels:
        out += _len_delim(1, encode_label(l))
    if e.value != 0.0 or str(e.value) == "-0.0":
        out += _tag(2, 1) + struct.pack("<d", e.value)
    if e.timestamp_ms:
        out += _tag(3, 0) + _varint(int(e.timestamp_ms))
    return out


def encode_timeseries(ts: TimeSeries) -> bytes:
    out = b""
    for l in ts.labels:
        out += _len_delim(1, encode_label(l))
    for s in ts.samples:
        out += _len_delim(2, encode_sample(s))
    for e in getattr(ts, "exemplars", ()) or ():
        out += _len_delim(3, encode_exemplar(e))
    for h in getattr(ts, "histograms", ()) or ():
        out += _len_delim(4, encode_histogram(h))
    return out


# ------------------------------------------- native histograms (field 4)
# Public prometheus/prompb types.proto Histogram (Prometheus ≥ 2.40):
#   count_int=1 / count_float=2, sum=3, schema=4 (sint32),
#   zero_threshold=5, zero_count_int=6 / zero_count_float=7,
#   negative_spans=8 / negative_deltas=9 (packed sint64) /
#   negative_counts=10 (packed double), positive_spans=11/12/13,
#   reset_hint=14, timestamp=15.
#   BucketSpan: offset=1 (sint32), length=2 (uint32).
# The sparse encoding: spans are runs of CONSECUTIVE bucket indexes,
# each span's offset relative to the previous span's end; integer
# histograms delta-encode counts bucket-to-bucket, float histograms
# carry absolute counts.


def _zigzag(n: int) -> int:
    return ((n << 1) ^ (n >> 63)) & _MASK64


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _packed_varints(values: list[int]) -> bytes:
    return b"".join(_varint(v) for v in values)


def _read_packed_varints(buf: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return out


def _spans_from_buckets(buckets: list[tuple[int, float]]) -> list[tuple[int, int]]:
    """Re-derive BucketSpans (offset, length) from sorted explicit
    indexes: runs of consecutive indexes; each offset relative to the
    previous span's end (the first to index 0... i.e. absolute)."""
    spans: list[tuple[int, int]] = []
    prev_end = 0  # Prometheus: first span offset is the absolute index
    run_start = None
    last = None
    for idx, _ in buckets:
        if run_start is None:
            run_start, last = idx, idx
            continue
        if idx == last + 1:
            last = idx
            continue
        spans.append((run_start - prev_end, last - run_start + 1))
        prev_end = last + 1
        run_start, last = idx, idx
    if run_start is not None:
        spans.append((run_start - prev_end, last - run_start + 1))
    return spans


def _expand_spans(
    spans: list[tuple[int, int]], deltas: list[int], counts: list[float]
) -> list[tuple[int, float]]:
    """(spans, deltas|counts) → explicit (index, absolute count)."""
    out: list[tuple[int, float]] = []
    idx = 0
    cur = 0.0
    k = 0
    for offset, length in spans:
        idx += offset
        for _ in range(length):
            if deltas:
                cur += deltas[k]
            else:
                cur = counts[k] if k < len(counts) else 0.0
            out.append((idx, float(cur)))
            idx += 1
            k += 1
    return out


def _encode_span(offset: int, length: int) -> bytes:
    out = b""
    if offset:
        out += _tag(1, 0) + _varint(_zigzag(offset))
    if length:
        out += _tag(2, 0) + _varint(length)
    return out


def _decode_span(buf: bytes) -> tuple[int, int]:
    offset = length = 0
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 0:
            offset = _unzigzag(int(v))
        elif field == 2 and wire == 0:
            length = int(v)
    return offset, length


def encode_histogram(h: NativeHistogram) -> bytes:
    out = b""
    use_float = h.is_float or not (
        float(h.count).is_integer()
        and float(h.zero_count).is_integer()
        and all(c == int(c) for _, c in h.positive)
        and all(c == int(c) for _, c in h.negative)
    )
    if use_float:
        if h.count:
            out += _tag(2, 1) + struct.pack("<d", float(h.count))
    elif h.count:
        out += _tag(1, 0) + _varint(int(h.count))
    if h.sum:
        out += _tag(3, 1) + struct.pack("<d", float(h.sum))
    if h.schema:
        out += _tag(4, 0) + _varint(_zigzag(int(h.schema)))
    if h.zero_threshold:
        out += _tag(5, 1) + struct.pack("<d", float(h.zero_threshold))
    if use_float:
        if h.zero_count:
            out += _tag(7, 1) + struct.pack("<d", float(h.zero_count))
    elif h.zero_count:
        out += _tag(6, 0) + _varint(int(h.zero_count))
    for base, span_f, delta_f, count_f in (
        (sorted(h.negative), 8, 9, 10),
        (sorted(h.positive), 11, 12, 13),
    ):
        if not base:
            continue
        for offset, length in _spans_from_buckets(base):
            out += _len_delim(span_f, _encode_span(offset, length))
        if use_float:
            out += _len_delim(
                count_f, b"".join(struct.pack("<d", c) for _, c in base)
            )
        else:
            deltas, prev = [], 0
            for _, c in base:
                deltas.append(int(c) - prev)
                prev = int(c)
            out += _len_delim(delta_f, _packed_varints([_zigzag(d) for d in deltas]))
    if h.timestamp_ms:
        out += _tag(15, 0) + _varint(int(h.timestamp_ms))
    return out


def decode_histogram(buf: bytes) -> NativeHistogram:
    h = NativeHistogram()
    neg_spans: list[tuple[int, int]] = []
    pos_spans: list[tuple[int, int]] = []
    neg_deltas: list[int] = []
    pos_deltas: list[int] = []
    neg_counts: list[float] = []
    pos_counts: list[float] = []
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 0:
            h.count = float(v)
        elif field == 2 and wire == 1:
            h.count = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
            h.is_float = True
        elif field == 3 and wire == 1:
            h.sum = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif field == 4 and wire == 0:
            h.schema = _unzigzag(int(v))
        elif field == 5 and wire == 1:
            h.zero_threshold = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif field == 6 and wire == 0:
            h.zero_count = float(v)
        elif field == 7 and wire == 1:
            h.zero_count = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
            h.is_float = True
        elif field == 8 and wire == 2:
            neg_spans.append(_decode_span(v))
        elif field == 9 and wire == 2:
            neg_deltas.extend(_unzigzag(u) for u in _read_packed_varints(v))
        elif field == 9 and wire == 0:
            neg_deltas.append(_unzigzag(int(v)))
        elif field == 10 and wire == 2:
            neg_counts.extend(
                struct.unpack(f"<{len(v) // 8}d", v) if v else ()
            )
        elif field == 11 and wire == 2:
            pos_spans.append(_decode_span(v))
        elif field == 12 and wire == 2:
            pos_deltas.extend(_unzigzag(u) for u in _read_packed_varints(v))
        elif field == 12 and wire == 0:
            pos_deltas.append(_unzigzag(int(v)))
        elif field == 13 and wire == 2:
            pos_counts.extend(
                struct.unpack(f"<{len(v) // 8}d", v) if v else ()
            )
        elif field == 15 and wire == 0:
            h.timestamp_ms = _to_int64(v)
    h.negative = _expand_spans(neg_spans, neg_deltas, neg_counts)
    h.positive = _expand_spans(pos_spans, pos_deltas, pos_counts)
    if neg_counts or pos_counts:
        h.is_float = True
    return h


def encode_matcher(m: Matcher) -> bytes:
    out = b""
    num = _NUM_BY_MATCH_TYPE[m.type]
    if num:
        out += _tag(1, 0) + _varint(num)
    if m.name:
        out += _len_delim(2, m.name.encode())
    if m.value:
        out += _len_delim(3, m.value.encode())
    return out


def encode_query(q: Query) -> bytes:
    out = b""
    if q.start_ms:
        out += _tag(1, 0) + _varint(int(q.start_ms))
    if q.end_ms:
        out += _tag(2, 0) + _varint(int(q.end_ms))
    for m in q.matchers:
        out += _len_delim(3, encode_matcher(m))
    return out


def encode_read_request(queries: Sequence[Query]) -> bytes:
    return b"".join(_len_delim(1, encode_query(q)) for q in queries)


def encode_query_result(series: Sequence[TimeSeries]) -> bytes:
    return b"".join(_len_delim(1, encode_timeseries(ts)) for ts in series)


def encode_read_response(results: Sequence[Sequence[TimeSeries]]) -> bytes:
    return b"".join(_len_delim(1, encode_query_result(r)) for r in results)


def encode_write_request(series: Sequence[TimeSeries]) -> bytes:
    return b"".join(_len_delim(1, encode_timeseries(ts)) for ts in series)


# ------------------------------------------------------------------- decode


def decode_label(buf: bytes) -> Label:
    name = value = ""
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 2:
            name = v.decode()
        elif field == 2 and wire == 2:
            value = v.decode()
    return Label(name, value)


def decode_sample(buf: bytes) -> Sample:
    value = 0.0
    ts = 0
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 1:
            value = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif field == 2 and wire == 0:
            ts = _to_int64(v)
    return Sample(value=value, timestamp_ms=ts)


def decode_exemplar(buf: bytes) -> Exemplar:
    labels: list[Label] = []
    value = 0.0
    ts = 0
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 2:
            labels.append(decode_label(v))
        elif field == 2 and wire == 1:
            value = struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
        elif field == 3 and wire == 0:
            ts = _to_int64(v)
    return Exemplar(labels=labels, value=value, timestamp_ms=ts)


def decode_timeseries(buf: bytes) -> TimeSeries:
    labels: list[Label] = []
    samples: list[Sample] = []
    histograms: list[NativeHistogram] = []
    exemplars: list[Exemplar] = []
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 2:
            labels.append(decode_label(v))
        elif field == 2 and wire == 2:
            samples.append(decode_sample(v))
        elif field == 3 and wire == 2:
            exemplars.append(decode_exemplar(v))
        elif field == 4 and wire == 2:
            histograms.append(decode_histogram(v))
    return TimeSeries(
        labels=labels, samples=samples, histograms=histograms, exemplars=exemplars
    )


def decode_matcher(buf: bytes) -> Matcher:
    mtype = MatchType.EQ
    name = value = ""
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 0:
            mtype = _MATCH_TYPE_BY_NUM.get(int(v), MatchType.EQ)
        elif field == 2 and wire == 2:
            name = v.decode()
        elif field == 3 and wire == 2:
            value = v.decode()
    return Matcher(name, mtype, value)


def decode_query(buf: bytes) -> tuple[Query, dict | None]:
    """Returns (query, hints) — hints decoded but unused by the engine
    (handlers/prom.go:184-186 logs and drops them)."""
    start = end = 0
    matchers: list[Matcher] = []
    hints = None
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 0:
            start = _to_int64(v)
        elif field == 2 and wire == 0:
            end = _to_int64(v)
        elif field == 3 and wire == 2:
            matchers.append(decode_matcher(v))
        elif field == 4 and wire == 2:
            hints = _decode_hints(v)
    return Query(start_ms=start, end_ms=end, matchers=tuple(matchers)), hints


def _decode_hints(buf: bytes) -> dict:
    hints = {"step_ms": 0, "func": "", "start_ms": 0, "end_ms": 0}
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 0:
            hints["step_ms"] = _to_int64(v)
        elif field == 2 and wire == 2:
            hints["func"] = v.decode()
        elif field == 3 and wire == 0:
            hints["start_ms"] = _to_int64(v)
        elif field == 4 and wire == 0:
            hints["end_ms"] = _to_int64(v)
    return hints


def decode_read_request(buf: bytes) -> list[tuple[Query, dict | None]]:
    return [decode_query(v) for field, wire, v, _ in _fields(buf) if field == 1 and wire == 2]


# Remote-read response-type negotiation (public prometheus/prompb
# remote.proto ReadRequest.accepted_response_types, field 2):
RESPONSE_TYPE_SAMPLES = 0
RESPONSE_TYPE_STREAMED_XOR_CHUNKS = 1


def decode_read_request_full(
    buf: bytes,
) -> tuple[list[tuple[Query, dict | None]], list[int]]:
    """Like :func:`decode_read_request` but also returns the client's
    ``accepted_response_types`` (packed or unpacked varints; absent means
    SAMPLES-only, the proto3 default). The reference never looks at this
    field — it always answers sampled."""
    queries: list[tuple[Query, dict | None]] = []
    accepted: list[int] = []
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 2:
            queries.append(decode_query(v))
        elif field == 2 and wire == 2:
            accepted.extend(_read_packed_varints(v))
        elif field == 2 and wire == 0:
            accepted.append(int(v))
    return queries, accepted


def encode_read_request_full(
    queries: Sequence[Query], accepted_response_types: Sequence[int] = ()
) -> bytes:
    out = encode_read_request(queries)
    if accepted_response_types:
        out += _len_delim(2, _packed_varints(list(accepted_response_types)))
    return out


# ------------------------------------------- streamed chunked read messages
# Public prometheus/prompb types.proto: Chunk{min_time_ms=1, max_time_ms=2,
# type=3 (XOR=1), data=4}; ChunkedSeries{labels=1, chunks=2};
# remote.proto ChunkedReadResponse{chunked_series=1, query_index=2}.


def encode_chunk(min_time_ms: int, max_time_ms: int, ctype: int, data: bytes) -> bytes:
    out = b""
    if min_time_ms:
        out += _tag(1, 0) + _varint(int(min_time_ms))
    if max_time_ms:
        out += _tag(2, 0) + _varint(int(max_time_ms))
    if ctype:
        out += _tag(3, 0) + _varint(ctype)
    if data:
        out += _len_delim(4, data)
    return out


def decode_chunk(buf: bytes) -> tuple[int, int, int, bytes]:
    min_t = max_t = ctype = 0
    data = b""
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 0:
            min_t = _to_int64(int(v))
        elif field == 2 and wire == 0:
            max_t = _to_int64(int(v))
        elif field == 3 and wire == 0:
            ctype = int(v)
        elif field == 4 and wire == 2:
            data = bytes(v)
    return min_t, max_t, ctype, data


def encode_chunked_series(
    labels: Sequence[Label], chunks: Sequence[tuple[int, int, int, bytes]]
) -> bytes:
    out = b""
    for l in labels:
        out += _len_delim(1, encode_label(l))
    for c in chunks:
        out += _len_delim(2, encode_chunk(*c))
    return out


def decode_chunked_series(buf: bytes) -> tuple[list[Label], list[tuple[int, int, int, bytes]]]:
    labels: list[Label] = []
    chunks: list[tuple[int, int, int, bytes]] = []
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 2:
            labels.append(decode_label(v))
        elif field == 2 and wire == 2:
            chunks.append(decode_chunk(v))
    return labels, chunks


def encode_chunked_read_response(
    series: Sequence[tuple[Sequence[Label], Sequence[tuple[int, int, int, bytes]]]],
    query_index: int = 0,
) -> bytes:
    out = b"".join(_len_delim(1, encode_chunked_series(ls, cs)) for ls, cs in series)
    if query_index:
        out += _tag(2, 0) + _varint(query_index)
    return out


def decode_chunked_read_response(buf: bytes):
    series = []
    query_index = 0
    for field, wire, v, _ in _fields(buf):
        if field == 1 and wire == 2:
            series.append(decode_chunked_series(v))
        elif field == 2 and wire == 0:
            query_index = _to_int64(int(v))
    return series, query_index


def decode_query_result(buf: bytes) -> list[TimeSeries]:
    return [decode_timeseries(v) for field, wire, v, _ in _fields(buf) if field == 1 and wire == 2]


def decode_read_response(buf: bytes) -> list[list[TimeSeries]]:
    return [decode_query_result(v) for field, wire, v, _ in _fields(buf) if field == 1 and wire == 2]


def decode_write_request(buf: bytes) -> list[TimeSeries]:
    return [decode_timeseries(v) for field, wire, v, _ in _fields(buf) if field == 1 and wire == 2]
