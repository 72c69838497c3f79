"""Native-histogram chunk codec tests (edge/chunkenc.py types 2/3 —
the public prometheus/tsdb/chunkenc histogram/floathistogram formats).

The golden is assembled BY HAND from the documented bit layout (module
docstring of the histogram section), so it pins bit order, varbit
bucket boundaries, zigzag varint placement, and the 3-byte header —
not just self-consistency.
"""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from promhouse_spark.edge import chunkenc as C
from promhouse_spark.models import NativeHistogram as NH

T0 = 1_500_000_000_000


def _hist(
    t=T0,
    count=4.0,
    zcount=1.0,
    s=2.0,
    schema=0,
    zt=0.0,
    pos=((0, 2.0), (1, 4.0)),
    neg=(),
    is_float=False,
    cv=(),
):
    return NH(
        timestamp_ms=t,
        count=count,
        sum=s,
        schema=schema,
        zero_threshold=zt,
        zero_count=zcount,
        positive=[(i, c) for i, c in pos],
        negative=[(i, c) for i, c in neg],
        is_float=is_float,
        custom_values=list(cv),
    )


def _nonzero(pairs):
    return sorted((i, c) for i, c in pairs if c != 0.0)


def _same_hist(a: NH, b: NH) -> bool:
    """Equality up to union-layout zero padding (upstream recodes chunks
    with explicit zero buckets too)."""
    return (
        a.timestamp_ms == b.timestamp_ms
        and a.count == b.count
        and a.zero_count == b.zero_count
        and struct.pack("<d", a.sum) == struct.pack("<d", b.sum)
        and a.schema == b.schema
        and struct.pack("<d", a.zero_threshold)
        == struct.pack("<d", b.zero_threshold)
        and _nonzero(a.positive) == _nonzero(b.positive)
        and _nonzero(a.negative) == _nonzero(b.negative)
        and list(a.custom_values) == list(b.custom_values)
    )


# ----------------------------------------------------------------- golden


def test_golden_single_sample_int_chunk():
    """Hand-assembled from the layout: header 0001 + CR byte 00, zero
    threshold byte 00, schema 0 ('0'), positive spans {1 span: len 2,
    off 0} ('10'001 '10'010 '0'), no negative spans ('0'), t=1000 as
    zigzag varint d0 0f, count uvarint 04, zero_count uvarint 01, sum
    2.0 raw 64 bits, positive deltas [2,2] as zigzag varints 04 04."""
    got = C.encode_histogram_chunk(
        [_hist(t=1000, pos=((0, 2.0), (1, 4.0)))]
    )
    assert got.hex() == "0001000046468078200a00000000000000002020"
    dec, cr = C.decode_histogram_chunk(got)
    assert cr == C.CR_UNKNOWN
    assert len(dec) == 1 and _same_hist(dec[0], _hist(t=1000))


def test_counter_reset_header_byte():
    for cr in (C.CR_UNKNOWN, C.CR_NOT_RESET, C.CR_RESET, C.CR_GAUGE):
        data = C.encode_histogram_chunk([_hist()], cr)
        assert data[2] == cr
        assert C.decode_histogram_chunk(data)[1] == cr


# -------------------------------------------------------------- varbit


@pytest.mark.parametrize(
    "val",
    [0, 1, -1, 4, -3, 5, 32, -31, 33, 256, 2048, 131072, 16777216,
     1 << 55, -(1 << 55) + 1, (1 << 55) + 1, -(1 << 62), (1 << 62)],
)
def test_varbit_int_bucket_boundaries(val):
    w = C.BitWriter()
    C._put_varbit_int(w, val)
    assert C._read_varbit_int(C.BitReader(w.bytes())) == val


@pytest.mark.parametrize(
    "val", [0, 1, 7, 8, 63, 64, 511, 4095, 262143, 33554431, (1 << 56) - 1,
            1 << 56, (1 << 64) - 1]
)
def test_varbit_uint_bucket_boundaries(val):
    w = C.BitWriter()
    C._put_varbit_uint(w, val)
    assert C._read_varbit_uint(C.BitReader(w.bytes())) == val


def test_varbit_asymmetric_bucket_edge():
    """+2^(n-1) stays positive in an n-bit bucket (the same asymmetric
    rule the XOR dod buckets use) — plain two's complement would flip
    4 → -4 in the 3-bit bucket."""
    for val in (4, 32, 256, 2048, 131072, 16777216, 1 << 55):
        w = C.BitWriter()
        C._put_varbit_int(w, val)
        assert C._read_varbit_int(C.BitReader(w.bytes())) == val


# ------------------------------------------------------- zero threshold


@pytest.mark.parametrize(
    "zt,nbytes",
    [
        (0.0, 1),
        (2.0**-128, 1),  # power of two in the 1-byte window
        (1.0, 1),
        (2.0**10, 1),
        (2.938735877055719e-39, 1),  # 2^-128, upstream's default
        (0.001, 9),  # not a power of two → escape byte + raw float
        (2.0**12, 9),  # power of two outside the window
    ],
)
def test_zero_threshold_coding(zt, nbytes):
    w = C.BitWriter()
    C._put_zero_threshold(w, zt)
    data = w.bytes()
    assert len(data) == nbytes
    assert C._read_zero_threshold(C.BitReader(data)) == zt


# ------------------------------------------------------------ roundtrips


@pytest.mark.parametrize(
    "hists",
    [
        [],
        [_hist()],
        [_hist(t=T0 + i * 15_000, count=4.0 + i, s=2.0 + 0.5 * i,
               pos=((0, 2.0 + i), (1, 4.0)), zcount=float(i))
         for i in range(50)],
        # sparse buckets appearing mid-chunk (union layout, zero fill)
        [_hist(pos=((0, 1.0),)),
         _hist(t=T0 + 1, count=5.0, pos=((0, 1.0), (7, 1.0))),
         _hist(t=T0 + 2, count=6.0, pos=((7, 2.0),), neg=((-3, 1.0),))],
        # negative schema, negative bucket indexes, negative sum
        [_hist(schema=-2, s=-5.25, pos=((-10, 1.0),), neg=((-1, 2.0), (4, 1.0))),
         _hist(t=T0 + 60_000, schema=-2, s=-5.0,
               pos=((-10, 2.0),), neg=((-1, 2.0), (4, 3.0)))],
        # irregular cadence → large dods
        [_hist(t=T0), _hist(t=T0 + 1), _hist(t=T0 + 10**10, count=9.0)],
        # inf/nan sums survive the XOR coder
        [_hist(s=math.inf), _hist(t=T0 + 1, s=math.nan, count=5.0)],
    ],
)
def test_int_chunk_roundtrip(hists):
    data = C.encode_histogram_chunk(hists)
    dec, _ = C.decode_histogram_chunk(data)
    assert len(dec) == len(hists)
    for a, b in zip(hists, dec):
        assert _same_hist(a, b)
        assert b.is_float is False


def test_float_chunk_roundtrip_with_custom_values():
    """NHCB float histograms: schema -53 carries the custom bounds in
    the layout; fractional counts force the float chunk."""
    hists = [
        _hist(t=T0 + i * 1000, count=10.5 + i, zcount=0.25 * i,
              s=-2.25 * i, schema=-53, pos=((0, 1.5 + i), (1, 2.25)),
              is_float=True, cv=(0.1, 0.5, 2.5, 10.0))
        for i in range(9)
    ]
    data = C.encode_float_histogram_chunk(hists, C.CR_GAUGE)
    dec, cr = C.decode_float_histogram_chunk(data)
    assert cr == C.CR_GAUGE
    assert len(dec) == 9
    for a, b in zip(hists, dec):
        assert _same_hist(a, b)
        assert b.is_float is True


def test_one_layout_per_chunk_enforced():
    with pytest.raises(ValueError, match="one layout"):
        C.encode_histogram_chunk([_hist(schema=0), _hist(t=T0 + 1, schema=3)])
    with pytest.raises(ValueError, match="one layout"):
        C.encode_float_histogram_chunk(
            [_hist(zt=0.0, is_float=True), _hist(t=T0 + 1, zt=1.0, is_float=True)]
        )


def test_int_chunk_rejects_fractional_counts():
    with pytest.raises(ValueError, match="float histogram chunk"):
        C.encode_histogram_chunk([_hist(count=2.5)])


def test_unsorted_timestamps_rejected():
    with pytest.raises(ValueError, match="sorted"):
        C.encode_histogram_chunk([_hist(t=T0), _hist(t=T0 - 1)])
    with pytest.raises(ValueError, match="sorted"):
        C.encode_float_histogram_chunk(
            [_hist(t=T0, is_float=True), _hist(t=T0 - 1, is_float=True)]
        )


# ------------------------------------------------------------- the cutter


def test_cutter_splits_on_layout_reset_and_capacity():
    run = (
        [_hist(t=T0 + i * 1000, count=4.0 + i) for i in range(5)]  # base
        + [_hist(t=T0 + 5000, count=1.0, pos=((0, 1.0), (1, 0.0)))]  # reset
        + [_hist(t=T0 + 6000, count=2.0, schema=3, pos=((0, 2.0),))]  # layout
        + [_hist(t=T0 + 7000, count=2.5, schema=3, pos=((0, 2.5),))]  # float
    )
    chunks = C.chunk_native_histograms(run, max_samples=3)
    kinds = [(ct, C.decode_histogram_chunk(d)[1] if ct == 2 else
              C.decode_float_histogram_chunk(d)[1],
              struct.unpack(">H", d[:2])[0]) for _, _, ct, d in chunks]
    # 5 base samples at capacity 3 → [3 unknown][2 not-reset], then the
    # count drop → [1 reset], the schema change → [1 unknown int], the
    # fractional count → [1 unknown float]
    assert kinds == [
        (2, C.CR_UNKNOWN, 3),
        (2, C.CR_NOT_RESET, 2),
        (2, C.CR_RESET, 1),
        (2, C.CR_UNKNOWN, 1),
        (3, C.CR_UNKNOWN, 1),
    ]
    # every sample survives, in order
    all_dec = []
    for _, _, ct, d in chunks:
        all_dec += (
            C.decode_histogram_chunk(d)[0]
            if ct == 2
            else C.decode_float_histogram_chunk(d)[0]
        )
    assert [h.timestamp_ms for h in all_dec] == [h.timestamp_ms for h in run]
    for a, b in zip(run, all_dec):
        assert _same_hist(a, b)


def test_cutter_envelopes_match_contents():
    run = [_hist(t=T0 + i * 500, count=4.0 + i) for i in range(10)]
    for mn, mx, _ct, d in C.chunk_native_histograms(run, max_samples=4):
        dec, _ = C.decode_histogram_chunk(d)
        assert mn == dec[0].timestamp_ms and mx == dec[-1].timestamp_ms


# ---------------------------------------------------------------- fuzzing


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**7),  # t increment
            st.integers(min_value=0, max_value=1000),  # count
            st.integers(min_value=0, max_value=50),  # zero count
            st.floats(allow_nan=False, width=64),  # sum
            st.lists(  # positive buckets
                st.tuples(
                    st.integers(min_value=-20, max_value=100),
                    st.integers(min_value=0, max_value=10**6),
                ),
                max_size=6,
            ),
        ),
        max_size=25,
    )
)
def test_int_chunk_roundtrip_property(raw):
    t = T0
    hists = []
    for dt, cnt, zcnt, s, pos in raw:
        t += dt
        hists.append(
            _hist(
                t=t,
                count=float(cnt),
                zcount=float(zcnt),
                s=s,
                pos=sorted(dict(pos).items()),
            )
        )
    dec, _ = C.decode_histogram_chunk(C.encode_histogram_chunk(hists))
    assert len(dec) == len(hists)
    for a, b in zip(hists, dec):
        assert _same_hist(a, b)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**7),
            st.floats(min_value=0, max_value=1e12),
            st.floats(allow_nan=False, width=64),
            st.lists(
                st.tuples(
                    st.integers(min_value=-20, max_value=100),
                    st.floats(min_value=0, max_value=1e9),
                ),
                max_size=5,
            ),
        ),
        max_size=20,
    )
)
def test_float_chunk_roundtrip_property(raw):
    t = T0
    hists = []
    for dt, cnt, s, pos in raw:
        t += dt
        hists.append(
            _hist(
                t=t,
                count=cnt,
                s=s,
                pos=sorted(dict(pos).items()),
                is_float=True,
            )
        )
    dec, _ = C.decode_float_histogram_chunk(
        C.encode_float_histogram_chunk(hists)
    )
    assert len(dec) == len(hists)
    for a, b in zip(hists, dec):
        assert _same_hist(a, b)
