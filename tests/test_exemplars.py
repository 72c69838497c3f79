"""Exemplars end-to-end (remote-write >= Prometheus 2.27, beyond the
reference's 2017-era proto): prompb Exemplar wire round-trip (TimeSeries
field 3), parquet exemplar tier write/read with matcher + time-range
filtering, and the real /api/v1/query_exemplars endpoint shape."""

from __future__ import annotations

import tempfile

import pytest

from promhouse_spark.edge import prompb
from promhouse_spark.edge.http import create_app
from promhouse_spark.models import (
    Exemplar,
    Label,
    MatchType,
    Matcher,
    Query,
    Sample,
    TimeSeries,
)
from promhouse_spark.storage.parquet import SparkParquetStorage

T0 = 1_767_225_600_000  # 2026-01-01T00:00:00Z


def _series():
    out = []
    for job, mult in (("api", 1.0), ("db", 2.0)):
        out.append(
            TimeSeries(
                labels=[Label("__name__", "latency_total"), Label("job", job)],
                samples=[
                    Sample(value=i * mult, timestamp_ms=T0 + i * 15_000)
                    for i in range(10)
                ],
                exemplars=[
                    Exemplar(
                        labels=[Label("trace_id", f"{job}-{i:04x}")],
                        value=i * mult + 0.5,
                        timestamp_ms=T0 + i * 30_000,
                    )
                    for i in range(3)
                ],
            )
        )
    return out


# ----------------------------------------------------------------- wire


def test_exemplar_wire_roundtrip():
    e = Exemplar(
        labels=[Label("trace_id", "abc123"), Label("span_id", "def")],
        value=42.25,
        timestamp_ms=1_700_000_000_123,
    )
    back = prompb.decode_exemplar(prompb.encode_exemplar(e))
    assert back == e


def test_timeseries_roundtrip_with_exemplars():
    for ts in _series():
        back = prompb.decode_timeseries(prompb.encode_timeseries(ts))
        assert back.labels == ts.labels
        assert back.samples == ts.samples
        assert back.exemplars == ts.exemplars


def test_write_request_roundtrip_with_exemplars():
    series = _series()
    buf = prompb.encode_write_request(series)
    back = prompb.decode_write_request(buf)
    assert [t.exemplars for t in back] == [t.exemplars for t in series]


def test_exemplar_defaults_omitted_on_wire():
    # proto3: all-default exemplar encodes to zero bytes
    assert prompb.encode_exemplar(Exemplar()) == b""
    assert prompb.decode_exemplar(b"") == Exemplar()


# -------------------------------------------------------------- storage


@pytest.fixture(scope="module")
def store(spark):
    s = SparkParquetStorage(spark, tempfile.mkdtemp(prefix="phs-exemplars-"))
    s.write(_series())
    return s


def test_storage_reads_exemplars_matcher_filtered(store):
    q = Query(
        start_ms=T0,
        end_ms=T0 + 600_000,
        matchers=(
            Matcher("__name__", MatchType.EQ, "latency_total"),
            Matcher("job", MatchType.EQ, "api"),
        ),
    )
    rows = store.read_exemplars(q).collect()
    assert len(rows) == 3
    assert all(dict(r["labels"])["job"] == "api" for r in rows)
    got = sorted(
        (r["timestamp_ms"], r["value"], dict(r["exemplar_labels"])["trace_id"])
        for r in rows
    )
    assert got == [
        (T0, 0.5, "api-0000"),
        (T0 + 30_000, 1.5, "api-0001"),
        (T0 + 60_000, 2.5, "api-0002"),
    ]


def test_storage_exemplar_time_range_inclusive(store):
    q = Query(
        start_ms=T0 + 30_000,
        end_ms=T0 + 60_000,
        matchers=(Matcher("__name__", MatchType.EQ, "latency_total"),),
    )
    rows = store.read_exemplars(q).collect()
    # both jobs, ts in {30s, 60s} inclusive at both ends
    assert sorted(r["timestamp_ms"] for r in rows) == [
        T0 + 30_000,
        T0 + 30_000,
        T0 + 60_000,
        T0 + 60_000,
    ]


# ------------------------------------------------------------------ API


@pytest.fixture(scope="module")
def client(store):
    app = create_app(store)
    app.config["TESTING"] = True
    return app.test_client()


def test_query_exemplars_endpoint(client):
    r = client.get(
        "/api/v1/query_exemplars",
        query_string={
            "query": 'rate(latency_total{job="api"}[5m])',
            "start": str(T0 / 1000),
            "end": str(T0 / 1000 + 600),
        },
    )
    assert r.status_code == 200
    body = r.get_json()
    assert body["status"] == "success"
    data = body["data"]
    assert len(data) == 1
    s = data[0]
    assert s["seriesLabels"] == {"__name__": "latency_total", "job": "api"}
    assert [e["labels"]["trace_id"] for e in s["exemplars"]] == [
        "api-0000",
        "api-0001",
        "api-0002",
    ]
    # Prometheus-API scalars: value as string, timestamp in float seconds
    assert s["exemplars"][1]["value"] == "1.5"
    assert s["exemplars"][1]["timestamp"] == (T0 + 30_000) / 1000.0


def test_query_exemplars_multi_selector_dedup(client):
    # the same selector twice in one expression must not duplicate exemplars
    r = client.get(
        "/api/v1/query_exemplars",
        query_string={
            "query": "latency_total / ignoring(job) group_left latency_total",
            "start": str(T0 / 1000),
            "end": str(T0 / 1000 + 600),
        },
    )
    body = r.get_json()
    assert body["status"] == "success"
    assert len(body["data"]) == 2  # one per job
    for s in body["data"]:
        assert len(s["exemplars"]) == 3


def test_query_exemplars_window_filters(client):
    r = client.get(
        "/api/v1/query_exemplars",
        query_string={
            "query": "latency_total",
            "start": str((T0 + 30_000) / 1000),
            "end": str((T0 + 30_000) / 1000),
        },
    )
    body = r.get_json()
    assert sum(len(s["exemplars"]) for s in body["data"]) == 2


def test_query_exemplars_bad_query_is_400(client):
    r = client.get(
        "/api/v1/query_exemplars",
        query_string={"query": "rate(", "start": "0", "end": "1"},
    )
    assert r.status_code == 400
    assert r.get_json()["errorType"] == "bad_data"


# ----------------------------------------------------- framed dump parity


def test_framed_dump_roundtrips_exemplars_and_histograms(tmp_path):
    """The promload dump format frames whole TimeSeries messages, so the
    round-8 sample types ride along: a dump written from series with
    exemplars and native histograms restores them bit-for-bit."""
    from promhouse_spark.edge.framed import read_frames, write_frames
    from promhouse_spark.models import NativeHistogram

    series = _series()
    series[0].histograms = [
        NativeHistogram(
            timestamp_ms=T0, count=3.0, sum=4.5, schema=1,
            zero_threshold=0.1, zero_count=1.0,
            positive=[(2, 2.0)], negative=[(-1, 1.0)],
        )
    ]
    p = tmp_path / "dump.framed"
    with open(p, "wb") as f:
        assert write_frames(f, series) == 2
    with open(p, "rb") as f:
        back = list(read_frames(f))
    assert [t.labels for t in back] == [t.labels for t in series]
    assert [t.exemplars for t in back] == [t.exemplars for t in series]
    assert back[0].histograms == series[0].histograms


# ------------------------------------------------ OpenMetrics exemplars


def test_exposition_parses_openmetrics_exemplars():
    from promhouse_spark.edge.exposition import merge_series, parse_exposition

    text = (
        'reqs{code="200"} 41 1700000000000 '
        '# {trace_id="abc",span_id="s1"} 12.5 1700000000.5\n'
        "plain 3.5\n"
    )
    series = merge_series(parse_exposition(text, default_timestamp_ms=7))
    by_name = {ts.labels_map()["__name__"]: ts for ts in series}
    (e,) = by_name["reqs"].exemplars
    assert e.labels_map() == {"trace_id": "abc", "span_id": "s1"}
    assert e.value == 12.5 and e.timestamp_ms == 1_700_000_000_500
    assert by_name["plain"].exemplars == []


def test_exposition_renders_and_roundtrips_exemplars():
    from promhouse_spark.edge.exposition import (
        merge_series,
        parse_exposition,
        render_exposition,
    )
    from promhouse_spark.models import Label, Sample

    series = [
        TimeSeries(
            labels=[Label("__name__", "m"), Label("job", "x")],
            samples=[Sample(1.5, 1_700_000_000_000)],
            exemplars=[
                Exemplar([Label("trace_id", "t1")], 9.0, 1_700_000_000_250)
            ],
        )
    ]
    text = render_exposition(series)
    assert " # {" in text and "1700000000.25" in text
    back = merge_series(parse_exposition(text))
    assert back[0].exemplars == series[0].exemplars
