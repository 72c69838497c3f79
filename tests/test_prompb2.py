"""Remote-Write 2.0 (io.prometheus.write.v2.Request) codec + HTTP tests.

The reference speaks only Remote-Write 1.0 (prompb.proto:1,
handlers/prom.go:281-310); the 2.0 message and its content negotiation,
written-stats headers, and in-message metadata follow the public
Prometheus Remote-Write 2.0 specification.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

from promhouse_spark.edge import prompb, prompb2, snappy_codec
from promhouse_spark.models import (
    Exemplar,
    Label,
    NativeHistogram,
    Query,
    Sample,
    TimeSeries,
    make_matchers,
)
from promhouse_spark.storage.memory import MemoryStorage
from tests.fixtures import T0, get_data, normalize


def _rich_series() -> list[TimeSeries]:
    series = get_data()
    series[0].exemplars = [
        Exemplar(
            labels=[Label("trace_id", "abc123")], value=13.5, timestamp_ms=T0 + 500
        )
    ]
    series[1].histograms = [
        NativeHistogram(
            timestamp_ms=T0,
            count=7,
            sum=42.5,
            schema=3,
            zero_threshold=2.938735877055719e-39,
            zero_count=2,
            positive=[(0, 1.0), (1, 3.0), (4, 1.0)],
            negative=[(2, 2.0)],
        )
    ]
    return series


METADATA = {
    "http_requests_total": prompb2.MetricMetadata(
        type="counter", help="Total HTTP requests.", unit=""
    )
}


# -------------------------------------------------------------------- codec


def test_v2_roundtrip_full_surface():
    series = _rich_series()
    created = [T0 - 60_000, 0, 0]
    buf = prompb2.encode_write_request_v2(series, METADATA, created)
    out = prompb2.decode_write_request_v2(buf)
    assert normalize(out.series) == normalize(series)
    # exemplars and histograms survive
    by_name = {ts.labels_map()["code"]: ts for ts in out.series}
    ex = by_name["200" if by_name["200"].exemplars else "400"].exemplars
    got_ex = [e for ts in out.series for e in ts.exemplars]
    assert len(got_ex) == 1
    assert got_ex[0].labels_map() == {"trace_id": "abc123"}
    assert got_ex[0].value == 13.5 and got_ex[0].timestamp_ms == T0 + 500
    got_h = [h for ts in out.series for h in ts.histograms]
    assert len(got_h) == 1
    h = got_h[0]
    assert h.count == 7 and h.sum == 42.5 and h.schema == 3
    assert h.positive == [(0, 1.0), (1, 3.0), (4, 1.0)]
    assert h.negative == [(2, 2.0)]
    # metadata resolved through the symbol table
    assert out.metadata["http_requests_total"].type == "counter"
    assert out.metadata["http_requests_total"].help == "Total HTTP requests."
    # created timestamps parallel to series
    assert sorted(out.created_timestamps_ms) == sorted(created)
    del ex


def test_v2_symbol_table_interns_each_string_once():
    series = get_data()  # 3 series sharing __name__/code/handler names
    buf = prompb2.encode_write_request_v2(series)
    symbols = [
        bytes(v).decode()
        for f, w, v, _ in prompb._fields(buf)
        if f == 4 and w == 2
    ]
    assert symbols[0] == ""
    assert len(symbols) == len(set(symbols))
    # every label string appears, exactly once
    want = {l.name for ts in series for l in ts.labels} | {
        l.value for ts in series for l in ts.labels
    }
    assert want <= set(symbols)
    # interning means the table is small: 1 + names(3) + values(5 distinct)
    assert len(symbols) == 1 + len(want)


def test_v2_matches_v1_semantics():
    """The same logical payload decodes identically through both dialects."""
    series = get_data()
    v1 = prompb.decode_write_request(prompb.encode_write_request(series))
    v2 = prompb2.decode_write_request_v2(
        prompb2.encode_write_request_v2(series)
    ).series
    assert normalize(v1) == normalize(v2)


def test_v2_custom_values_nhcb_roundtrip():
    h = NativeHistogram(
        timestamp_ms=T0,
        count=5,
        sum=10.0,
        positive=[(0, 2.0), (1, 3.0)],
        custom_values=[0.1, 0.5, 2.5],
    )
    ts = TimeSeries(labels=[Label("__name__", "nhcb")], histograms=[h])
    out = prompb2.decode_write_request_v2(prompb2.encode_write_request_v2([ts]))
    got = out.series[0].histograms[0]
    assert got.custom_values == [0.1, 0.5, 2.5]
    assert got.positive == [(0, 2.0), (1, 3.0)]


@pytest.mark.parametrize(
    "mutate",
    [
        "odd_refs",
        "ref_out_of_range",
        "nonempty_symbol0",
        "data_no_labels",
    ],
)
def test_v2_spec_validations(mutate):
    from promhouse_spark.edge.prompb import _len_delim, _packed_varints, _tag, _varint

    if mutate == "odd_refs":
        body = _len_delim(4, b"") + _len_delim(4, b"x") + _len_delim(
            5, _len_delim(1, _packed_varints([1]))
        )
    elif mutate == "ref_out_of_range":
        body = _len_delim(4, b"") + _len_delim(
            5, _len_delim(1, _packed_varints([0, 7]))
        )
    elif mutate == "nonempty_symbol0":
        body = _len_delim(4, b"oops") + _len_delim(4, b"x")
    else:  # data_no_labels
        sample = _tag(1, 1) + b"\x00" * 8 + _tag(2, 0) + _varint(T0)
        body = _len_delim(4, b"") + _len_delim(5, _len_delim(2, sample))
    with pytest.raises(ValueError):
        prompb2.decode_write_request_v2(body)


def test_negotiate_proto():
    f = prompb2.negotiate_proto
    assert f("application/x-protobuf") == "prometheus.WriteRequest"
    assert f("") == "prometheus.WriteRequest"
    assert (
        f("application/x-protobuf;proto=io.prometheus.write.v2.Request")
        == "io.prometheus.write.v2.Request"
    )
    assert (
        f("application/x-protobuf; proto=prometheus.WriteRequest ; charset=utf-8")
        == "prometheus.WriteRequest"
    )
    assert f("application/x-protobuf;proto=future.Message") == "future.Message"


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_v2_decode_never_crashes(buf):
    """Arbitrary bytes either decode or raise ValueError — no other
    exception escapes the codec."""
    try:
        prompb2.decode_write_request_v2(buf)
    except ValueError:
        pass


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(min_size=1, max_size=8),
            st.floats(allow_nan=False, width=64),
            st.integers(min_value=-(2**40), max_value=2**40),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_v2_roundtrip_property(rows):
    series = [
        TimeSeries(
            labels=[Label("__name__", "m"), Label("l", name)],
            samples=[Sample(value=v, timestamp_ms=ts)],
        )
        for name, v, ts in rows
    ]
    out = prompb2.decode_write_request_v2(prompb2.encode_write_request_v2(series))
    assert normalize(out.series) == normalize(series)


# --------------------------------------------------------------------- HTTP


@pytest.fixture()
def client():
    flask = pytest.importorskip("flask")  # noqa: F841
    from promhouse_spark.edge.http import create_app

    app = create_app(MemoryStorage())
    app.testing = True
    return app.test_client()


def _post_v2(client, series, metadata=None):
    body = snappy_codec.compress(prompb2.encode_write_request_v2(series, metadata))
    return client.post(
        "/write",
        data=body,
        headers={"Content-Type": prompb2.CONTENT_TYPE_V2},
    )


def test_http_v2_write_then_read(client):
    resp = _post_v2(client, _rich_series(), METADATA)
    assert resp.status_code == 204
    assert resp.headers["X-Prometheus-Remote-Write-Samples-Written"] == "15"
    assert resp.headers["X-Prometheus-Remote-Write-Histograms-Written"] == "1"
    assert resp.headers["X-Prometheus-Remote-Write-Exemplars-Written"] == "1"

    rq = snappy_codec.compress(
        prompb.encode_read_request(
            [
                Query(
                    T0 - 60_000,
                    T0 + 60_000,
                    make_matchers(("__name__", "=", "http_requests_total")),
                )
            ]
        )
    )
    resp = client.post("/read", data=rq)
    assert resp.status_code == 200
    results = prompb.decode_read_response(snappy_codec.decompress(resp.data))
    assert normalize(results[0]) == normalize(get_data())


def test_http_v2_metadata_served(client):
    assert _post_v2(client, get_data(), METADATA).status_code == 204
    data = client.get("/api/v1/metadata").get_json()["data"]
    assert data["http_requests_total"] == [
        {"type": "counter", "help": "Total HTTP requests.", "unit": ""}
    ]
    only = client.get("/api/v1/metadata?metric=http_requests_total").get_json()["data"]
    assert list(only) == ["http_requests_total"]
    none = client.get("/api/v1/metadata?metric=nope").get_json()["data"]
    assert none == {}


def test_http_v1_still_default(client):
    body = snappy_codec.compress(prompb.encode_write_request(get_data()))
    assert client.post("/write", data=body).status_code == 200
    # and with the explicit v1 content type
    assert (
        client.post(
            "/write", data=body, headers={"Content-Type": prompb2.CONTENT_TYPE_V1}
        ).status_code
        == 200
    )


def test_http_unknown_proto_is_415(client):
    body = snappy_codec.compress(prompb.encode_write_request(get_data()))
    resp = client.post(
        "/write",
        data=body,
        headers={"Content-Type": "application/x-protobuf;proto=future.Message"},
    )
    assert resp.status_code == 415
    assert "io.prometheus.write.v2.Request" in resp.headers["Accept"]


def test_nhcb_to_classic_mapping():
    """NHCB -> classic: per-bucket counts become CUMULATIVE le-bucket
    counters (le="+Inf" = total count), plus _sum/_count, other labels
    preserved (public prometheus model/histogram/nhcb semantics)."""
    from promhouse_spark.edge.nhcb import nhcb_to_classic

    h = NativeHistogram(
        timestamp_ms=T0,
        count=10,          # 2+3+1 bucketed + 4 in the overflow (+Inf) bucket
        sum=42.5,
        positive=[(0, 2.0), (1, 3.0), (2, 1.0), (3, 4.0)],
        custom_values=[0.1, 0.5, 2.5],
    )
    ts = TimeSeries(
        labels=[Label("__name__", "lat"), Label("job", "x")], histograms=[h]
    )
    remaining, classic = nhcb_to_classic(ts)
    assert remaining.histograms == [] and remaining.samples == []
    got = {
        tuple(sorted((l.name, l.value) for l in s.labels)): [
            (x.timestamp_ms, x.value) for x in s.samples
        ]
        for s in classic
    }
    base = (("job", "x"),)
    assert got[tuple(sorted((("__name__", "lat_bucket"), ("le", "0.1")) + base))] == [(T0, 2.0)]
    assert got[tuple(sorted((("__name__", "lat_bucket"), ("le", "0.5")) + base))] == [(T0, 5.0)]
    assert got[tuple(sorted((("__name__", "lat_bucket"), ("le", "2.5")) + base))] == [(T0, 6.0)]
    assert got[tuple(sorted((("__name__", "lat_bucket"), ("le", "+Inf")) + base))] == [(T0, 10.0)]
    assert got[tuple(sorted((("__name__", "lat_sum"),) + base))] == [(T0, 42.5)]
    assert got[tuple(sorted((("__name__", "lat_count"),) + base))] == [(T0, 10.0)]


def test_http_v2_nhcb_ingested_as_classic_and_served(spark, tmp_path):
    """A Prometheus 3 sender with NHCB enabled no longer bounces: the v2
    write ingests custom-bucket histograms as classic series, and
    histogram_quantile over the derived buckets serves correctly (PromQL
    endpoints need the frame-backed storage)."""
    import json

    from promhouse_spark.edge.http import create_app
    from promhouse_spark.models import Query as MQuery
    from promhouse_spark.storage.parquet import SparkParquetStorage

    storage = SparkParquetStorage(spark, str(tmp_path / "nhcb"))
    app = create_app(storage)
    app.testing = True
    c = app.test_client()
    hs = [
        NativeHistogram(
            timestamp_ms=T0 + i * 15_000,
            count=4.0 * (i + 1),
            sum=2.0 * (i + 1),
            positive=[(0, 1.0 * (i + 1)), (1, 2.0 * (i + 1)), (2, 1.0 * (i + 1))],
            custom_values=[0.1, 0.5, 2.5],
        )
        for i in range(3)
    ]
    ts = TimeSeries(labels=[Label("__name__", "lat"), Label("job", "x")], histograms=hs)
    resp = _post_v2(c, [ts])
    assert resp.status_code == 204
    res = storage.read(
        [MQuery(0, T0 + 60_000, make_matchers(("__name__", "=", "lat_bucket")))]
    )[0]
    by_le = {s.labels_map()["le"]: [x.value for x in s.samples] for s in res}
    assert by_le == {
        "0.1": [1.0, 2.0, 3.0],
        "0.5": [3.0, 6.0, 9.0],
        "2.5": [4.0, 8.0, 12.0],
        "+Inf": [4.0, 8.0, 12.0],
    }
    # served: classic-bucket quantile over the derived series. At t=T0 the
    # cumulative histogram is {0.1: 1, 0.5: 3, 2.5: 4, +Inf: 4}; the median
    # (rank 2 of 4) interpolates inside the (0.1, 0.5] bucket.
    r = c.get(
        "/api/v1/query",
        query_string={
            "query": 'histogram_quantile(0.5, lat_bucket{job="x"})',
            "time": str(T0 / 1000),
        },
    )
    data = json.loads(r.data)
    assert data["status"] == "success"
    (result,) = data["data"]["result"]
    assert abs(float(result["value"][1]) - 0.3) < 1e-9


def test_http_v2_nhcb_unmappable_400(client):
    from promhouse_spark.models import Label as L

    # negative buckets can't map to classic
    h = NativeHistogram(
        timestamp_ms=T0, count=1, sum=1.0, negative=[(0, 1.0)],
        positive=[(0, 1.0)], custom_values=[1.0],
    )
    resp = _post_v2(client, [TimeSeries(labels=[L("__name__", "n")], histograms=[h])])
    assert resp.status_code == 400 and b"NHCB" in resp.data
    # and so can a series without __name__
    h2 = NativeHistogram(
        timestamp_ms=T0, count=1, sum=1.0, positive=[(0, 1.0)], custom_values=[1.0]
    )
    resp = _post_v2(client, [TimeSeries(labels=[L("job", "x")], histograms=[h2])])
    assert resp.status_code == 400 and b"NHCB" in resp.data


def test_http_v2_bad_payload_400(client):
    bad = snappy_codec.compress(b"\x22\x04oops" + b"\x2a\x02\x08")  # truncated series
    resp = client.post(
        "/write", data=bad, headers={"Content-Type": prompb2.CONTENT_TYPE_V2}
    )
    assert resp.status_code == 400


def test_http_v2_ct_zero_ingestion():
    """With the feature flag on, a created_timestamp before the first
    sample materializes as a synthetic 0 sample (Prometheus's
    created-timestamp-zero-ingestion); off (default), CT is carried but
    not injected."""
    flask = pytest.importorskip("flask")  # noqa: F841
    from promhouse_spark.edge.http import create_app
    from promhouse_spark.models import Query as MQuery

    series = [
        TimeSeries(
            labels=[Label("__name__", "ct_total")],
            samples=[Sample(value=5.0, timestamp_ms=T0 + 10_000)],
        )
    ]
    body = snappy_codec.compress(
        prompb2.encode_write_request_v2(series, created_timestamps_ms=[T0])
    )

    for flag, want in ((True, [(T0, 0.0), (T0 + 10_000, 5.0)]),
                       (False, [(T0 + 10_000, 5.0)])):
        storage = MemoryStorage()
        app = create_app(storage, ct_zero_ingestion=flag)
        app.testing = True
        resp = app.test_client().post(
            "/write", data=body, headers={"Content-Type": prompb2.CONTENT_TYPE_V2}
        )
        assert resp.status_code == 204
        res = storage.read(
            [MQuery(0, T0 + 60_000, make_matchers(("__name__", "=", "ct_total")))]
        )[0]
        got = [(s.timestamp_ms, s.value) for s in res[0].samples]
        assert got == want, (flag, got)


def test_http_v2_ct_zero_histogram_series():
    """created-timestamp-zero-ingestion on a histogram-ONLY series: upstream
    inserts a synthetic zero HISTOGRAM (same schema, all counts zero) at ct,
    not a float 0 sample."""
    from promhouse_spark.edge.http import create_app
    from promhouse_spark.models import Query as MQuery

    h = NativeHistogram(
        timestamp_ms=T0 + 10_000,
        count=7,
        sum=42.5,
        schema=3,
        zero_threshold=2.938735877055719e-39,
        zero_count=2,
        positive=[(0, 1.0), (1, 3.0), (4, 1.0)],
    )
    series = [TimeSeries(labels=[Label("__name__", "ct_hist")], histograms=[h])]
    body = snappy_codec.compress(
        prompb2.encode_write_request_v2(series, created_timestamps_ms=[T0])
    )
    storage = MemoryStorage()
    app = create_app(storage, ct_zero_ingestion=True)
    app.testing = True
    resp = app.test_client().post(
        "/write", data=body, headers={"Content-Type": prompb2.CONTENT_TYPE_V2}
    )
    assert resp.status_code == 204
    res = storage.read(
        [MQuery(0, T0 + 60_000, make_matchers(("__name__", "=", "ct_hist")))]
    )[0]
    hists = res[0].histograms
    assert [x.timestamp_ms for x in hists] == [T0, T0 + 10_000]
    zero = hists[0]
    assert (zero.count, zero.sum, zero.zero_count) == (0.0, 0.0, 0.0)
    assert zero.positive == [] and zero.negative == []
    assert zero.schema == h.schema and zero.zero_threshold == h.zero_threshold
    # float-sample path untouched: no synthetic float 0 was added
    assert res[0].samples == []


def test_v2_special_floats_roundtrip():
    series = [
        TimeSeries(
            labels=[Label("__name__", "specials")],
            samples=[
                Sample(value=math.inf, timestamp_ms=T0),
                Sample(value=-math.inf, timestamp_ms=T0 + 1),
            ],
        )
    ]
    out = prompb2.decode_write_request_v2(prompb2.encode_write_request_v2(series))
    vals = [s.value for s in out.series[0].samples]
    assert vals == [math.inf, -math.inf]


def test_nhcb_to_classic_zero_count_folds_into_buckets():
    """zero_count observations sit at ~0, so every cumulative le-bucket
    whose upper bound covers 0 must include them — otherwise each bucket
    undercounts relative to _count/le="+Inf" and histogram_quantile
    skews (public prometheus model/histogram/nhcb semantics)."""
    from promhouse_spark.edge.nhcb import nhcb_to_classic

    h = NativeHistogram(
        timestamp_ms=T0,
        count=5,  # 1+2 bucketed + 2 zero-bucket observations
        sum=3.0,
        zero_count=2,
        positive=[(0, 1.0), (1, 2.0)],
        custom_values=[0.1, 0.5],
    )
    ts = TimeSeries(labels=[Label("__name__", "z")], histograms=[h])
    _, classic = nhcb_to_classic(ts)
    got = {
        tuple(sorted((l.name, l.value) for l in s.labels)): s.samples[0].value
        for s in classic
    }
    le = lambda v: tuple(sorted((("__name__", "z_bucket"), ("le", v))))
    assert got[le("0.1")] == 3.0  # 1 + 2 zero obs
    assert got[le("0.5")] == 5.0  # cumulative + zero obs
    assert got[le("+Inf")] == 5.0  # buckets now consistent with _count


def test_nhcb_to_classic_zero_count_negative_boundary():
    """With a negative first boundary the zero observations only join
    buckets whose upper bound reaches 0 — le=-1 must NOT count them."""
    from promhouse_spark.edge.nhcb import nhcb_to_classic

    h = NativeHistogram(
        timestamp_ms=T0,
        count=4,
        sum=0.0,
        zero_count=2,
        positive=[(0, 1.0), (1, 1.0)],
        custom_values=[-1.0, 0.5],
    )
    ts = TimeSeries(labels=[Label("__name__", "nz")], histograms=[h])
    _, classic = nhcb_to_classic(ts)
    got = {
        tuple(sorted((l.name, l.value) for l in s.labels)): s.samples[0].value
        for s in classic
    }
    le = lambda v: tuple(sorted((("__name__", "nz_bucket"), ("le", v))))
    assert got[le("-1")] == 1.0   # zero obs are NOT ≤ -1
    assert got[le("0.5")] == 4.0  # they are ≤ 0.5
    assert got[le("+Inf")] == 4.0
