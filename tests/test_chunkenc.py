"""Gorilla XOR chunk codec + streamed chunked remote read.

The chunk layout is the public prometheus/tsdb/chunkenc XOR format
(Facebook Gorilla, VLDB 2015 §4.1); the stream framing is
prometheus/storage/remote/chunked.go (uvarint length + CRC32C + message);
negotiation is ReadRequest.accepted_response_types. The reference always
answers sampled (handlers/prom.go:184-186) — this surface is spec-first.
"""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings, strategies as st

from promhouse_spark.edge import chunkenc, prompb, snappy_codec
from promhouse_spark.edge.chunkenc import (
    chunk_samples,
    crc32c,
    decode_xor_chunk,
    encode_xor_chunk,
    frame_message,
    iter_frames,
)
from promhouse_spark.models import Label, Query, make_matchers
from promhouse_spark.storage.memory import MemoryStorage
from tests.fixtures import T0, get_data, normalize


def _bits(v: float) -> bytes:
    return struct.pack("<d", v)


def _eq_samples(a, b) -> bool:
    return len(a) == len(b) and all(
        x[0] == y[0] and _bits(x[1]) == _bits(y[1]) for x, y in zip(a, b)
    )


# --------------------------------------------------------------- XOR chunk


def test_golden_two_samples():
    """Hand-derived byte layout: t0=1000 (zigzag varint d0 0f), v0=1.0 raw
    64 bits, tDelta=1000 (uvarint e8 07), v1=2.0 XOR-coded with a new
    leading=1/sigbits=11 window — pins MSB-first bit order, varint
    placement, and the 5+6-bit window header."""
    got = encode_xor_chunk([(1000, 1.0), (2000, 2.0)])
    assert got.hex() == "0002d00f3ff0000000000000e807c25fff"
    assert _eq_samples(decode_xor_chunk(got), [(1000, 1.0), (2000, 2.0)])


def test_dod_zero_is_one_bit():
    """A perfectly regular series spends 1 bit per timestamp and 1 bit per
    repeated value from sample 3 on — the Gorilla headline property."""
    data = encode_xor_chunk([(i * 15_000, 42.0) for i in range(120)])
    # 2B header + ~11B first two samples + 118×2 bits ≈ 43B; < 0.5B/sample
    assert len(data) <= 48
    assert _eq_samples(
        decode_xor_chunk(data), [(i * 15_000, 42.0) for i in range(120)]
    )


@pytest.mark.parametrize(
    "samples",
    [
        [],
        [(0, 0.0)],
        [(-5_000, 3.0), (-1_000, 3.5), (200, 3.5)],  # negative t0
        [(T0, math.inf), (T0 + 1, -math.inf), (T0 + 2, math.nan)],
        [(T0, -0.0), (T0 + 10, 0.0)],  # sign-only XOR
        [(0, 1e-310), (1, 5e-324)],  # subnormals
        [(T0 + i, float(i % 3)) for i in range(1000)],  # 1ms cadence
        [(T0, 1.0), (T0, 1.0), (T0 + 10**13, 2.0)],  # dup ts + 64-bit dod
    ],
)
def test_roundtrip_cases(samples):
    assert _eq_samples(decode_xor_chunk(encode_xor_chunk(samples)), samples)


def test_dod_bucket_boundaries_roundtrip():
    """The dod buckets are ASYMMETRIC ([-(2^(n-1))+1, 2^(n-1)], xor.go
    bitRange): a dod of exactly 8192/65536/524288 is encoded in the
    small bucket with its top bit set, and upstream negates only when
    bits > 1<<(sz-1).  Plain two's-complement decoding flips these
    boundary values to their negatives (e.g. [(0,1.0),(1000,2.0),
    (10192,3.0)] used to decode with timestamp -6192)."""
    s = [(0, 1.0), (1000, 2.0), (10192, 3.0)]  # dod = exactly 8192
    assert decode_xor_chunk(encode_xor_chunk(s)) == s
    for nbits in (14, 17, 20):
        top = 1 << (nbits - 1)
        base = 2 * top  # base delta keeps negative dods sorted
        for dod in (top, top - 1, -(top - 1), -(top - 2), 1, -1, 0):
            s = [(0, 1.0), (base, 2.0), (base + base + dod, 3.0)]
            assert decode_xor_chunk(encode_xor_chunk(s)) == s, (nbits, dod)
    # 64-bit escape bucket stays plain two's complement
    for dod in ((1 << 19) + 1, -(1 << 19) - 1, 10**12, -(10**11)):
        base = 2 * 10**12
        s = [(0, 1.0), (base, 2.0), (base + base + dod, 3.0)]
        assert decode_xor_chunk(encode_xor_chunk(s)) == s, dod


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.floats(width=64, allow_nan=True),
        ),
        max_size=200,
    )
)
def test_roundtrip_property(raw):
    ts = 0
    samples = []
    for dt, v in raw:
        ts += dt
        samples.append((ts, v))
    assert _eq_samples(decode_xor_chunk(encode_xor_chunk(samples)), samples)


def test_unsorted_timestamps_rejected():
    with pytest.raises(ValueError):
        encode_xor_chunk([(10, 1.0), (5, 2.0)])
    with pytest.raises(ValueError):
        encode_xor_chunk([(10, 1.0), (20, 2.0), (15, 3.0)])


def test_chunk_samples_cuts_at_120():
    cs = chunk_samples([(i * 1000, float(i)) for i in range(301)])
    assert [len(decode_xor_chunk(c[2])) for c in cs] == [120, 120, 61]
    assert cs[0][:2] == (0, 119_000)
    assert cs[2][:2] == (240_000, 300_000)


# ----------------------------------------------------------------- framing


def test_crc32c_rfc_vector():
    assert crc32c(b"123456789") == 0xE3069283  # RFC 3720 check value
    assert crc32c(b"") == 0


def test_frame_roundtrip_and_corruption():
    msgs = [b"hello", b"", b"x" * 100_000]
    stream = b"".join(frame_message(m) for m in msgs)
    assert list(iter_frames(stream)) == msgs
    bad = bytearray(stream)
    bad[7] ^= 0x40
    with pytest.raises(ValueError):
        list(iter_frames(bytes(bad)))
    with pytest.raises(ValueError):
        list(iter_frames(stream[:-3]))  # truncated


# ------------------------------------------------------- protocol messages


def test_chunked_read_response_roundtrip():
    labels = [Label("__name__", "up"), Label("job", "x")]
    chunks = [(T0, T0 + 60_000, chunkenc.CHUNK_TYPE_XOR, b"\x00\x01abc")]
    buf = prompb.encode_chunked_read_response([(labels, chunks)], query_index=3)
    series, qi = prompb.decode_chunked_read_response(buf)
    assert qi == 3
    assert series == [(labels, chunks)]


def test_read_request_accepted_types_roundtrip():
    q = Query(T0, T0 + 1000, make_matchers(("__name__", "=", "up")))
    buf = prompb.encode_read_request_full(
        [q], [prompb.RESPONSE_TYPE_STREAMED_XOR_CHUNKS]
    )
    decoded, accepted = prompb.decode_read_request_full(buf)
    assert len(decoded) == 1 and decoded[0][0].matchers == q.matchers
    assert accepted == [prompb.RESPONSE_TYPE_STREAMED_XOR_CHUNKS]
    # absent field = SAMPLES-only
    _, accepted = prompb.decode_read_request_full(prompb.encode_read_request([q]))
    assert accepted == []


# --------------------------------------------------------------------- HTTP


@pytest.fixture()
def client():
    flask = pytest.importorskip("flask")  # noqa: F841
    from promhouse_spark.edge.http import create_app

    app = create_app(MemoryStorage())
    app.testing = True
    return app.test_client()


def test_http_streamed_read(client):
    body = snappy_codec.compress(prompb.encode_write_request(get_data()))
    assert client.post("/write", data=body).status_code == 200

    rq = snappy_codec.compress(
        prompb.encode_read_request_full(
            [
                Query(
                    T0 - 60_000,
                    T0 + 60_000,
                    make_matchers(("__name__", "=", "http_requests_total")),
                )
            ],
            [prompb.RESPONSE_TYPE_STREAMED_XOR_CHUNKS],
        )
    )
    resp = client.post("/read", data=rq)
    assert resp.status_code == 200
    assert resp.headers["Content-Type"].startswith("application/x-streamed-protobuf")
    assert "proto=prometheus.ChunkedReadResponse" in resp.headers["Content-Type"]
    assert "Content-Encoding" not in resp.headers  # frames are not snappy'd

    got = []
    for payload in iter_frames(resp.data):
        series, qi = prompb.decode_chunked_read_response(payload)
        assert qi == 0
        for labels, chunks in series:
            samples = []
            for mn, mx, ctype, data in chunks:
                assert ctype == chunkenc.CHUNK_TYPE_XOR
                decoded = decode_xor_chunk(data)
                assert decoded[0][0] == mn and decoded[-1][0] == mx
                samples.extend(decoded)
            got.append((tuple((l.name, l.value) for l in labels),
                        tuple((t, v) for t, v in samples)))
    want = normalize(get_data())
    assert sorted(got) == [(ls, ss) for ls, ss in want]


def test_http_sampled_read_still_default(client):
    body = snappy_codec.compress(prompb.encode_write_request(get_data()))
    assert client.post("/write", data=body).status_code == 200
    rq = snappy_codec.compress(
        prompb.encode_read_request(
            [Query(T0 - 60_000, T0 + 60_000,
                   make_matchers(("__name__", "=", "http_requests_total")))]
        )
    )
    resp = client.post("/read", data=rq)
    assert resp.headers["Content-Type"] == "application/x-protobuf"
    assert resp.headers["Content-Encoding"] == "snappy"
    results = prompb.decode_read_response(snappy_codec.decompress(resp.data))
    assert normalize(results[0]) == normalize(get_data())
