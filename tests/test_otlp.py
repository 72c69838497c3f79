"""OTLP metrics ingestion (edge/otlp.py + /api/v1/otlp/v1/metrics):
wire round-trips, OTLP→Prometheus translation goldens (naming, classic
histogram expansion, exponential→native mapping, target_info), and
end-to-end ingest → PromQL query."""

from __future__ import annotations

import tempfile

import pytest

from promhouse_spark.edge import otlp
from promhouse_spark.edge.http import create_app
from promhouse_spark.storage.parquet import SparkParquetStorage

# slow tier (r12): OTLP ingest integration. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow


T_NS = 1_767_225_600_000_000_000  # 2026-01-01T00:00:00Z in ns


def _payload():
    return [
        otlp.OtlpResourceMetrics(
            resource_attributes={
                "service.name": "checkout",
                "service.instance.id": "pod-1",
                "k8s.cluster": "prod-eu",
            },
            metrics=[
                otlp.OtlpMetric(
                    name="http.requests",
                    kind="sum",
                    temporality=otlp.CUMULATIVE,
                    is_monotonic=True,
                    number_points=[
                        otlp.NumberPoint(
                            attributes={"code": "200"},
                            time_unix_nano=T_NS,
                            value=41.0,
                        )
                    ],
                ),
                otlp.OtlpMetric(
                    name="queue.depth",
                    kind="gauge",
                    number_points=[
                        otlp.NumberPoint(
                            attributes={}, time_unix_nano=T_NS, value=7.5
                        )
                    ],
                ),
                otlp.OtlpMetric(
                    name="latency",
                    kind="histogram",
                    temporality=otlp.CUMULATIVE,
                    histogram_points=[
                        otlp.HistogramPoint(
                            attributes={"route": "/buy"},
                            time_unix_nano=T_NS,
                            count=10,
                            sum=25.0,
                            bucket_counts=[5, 3, 2],
                            explicit_bounds=[1.0, 2.5],
                        )
                    ],
                ),
                otlp.OtlpMetric(
                    name="resp.size",
                    kind="exponential_histogram",
                    temporality=otlp.CUMULATIVE,
                    exp_points=[
                        otlp.ExpHistogramPoint(
                            attributes={},
                            time_unix_nano=T_NS,
                            count=6,
                            sum=10.0,
                            scale=0,
                            zero_count=1,
                            positive_offset=0,
                            positive_counts=[2, 3],
                        )
                    ],
                ),
            ],
        )
    ]


def test_wire_roundtrip():
    buf = otlp.encode_export_request(_payload())
    back = otlp.decode_export_request(buf)
    assert len(back) == 1
    rm = back[0]
    assert rm.resource_attributes["service.name"] == "checkout"
    kinds = {m.name: m.kind for m in rm.metrics}
    assert kinds == {
        "http.requests": "sum",
        "queue.depth": "gauge",
        "latency": "histogram",
        "resp.size": "exponential_histogram",
    }
    h = next(m for m in rm.metrics if m.kind == "histogram").histogram_points[0]
    assert h.bucket_counts == [5, 3, 2] and h.explicit_bounds == [1.0, 2.5]
    e = next(m for m in rm.metrics if m.kind == "exponential_histogram").exp_points[0]
    assert e.scale == 0 and e.positive_counts == [2, 3] and e.zero_count == 1


def test_translate_naming_and_labels():
    series = otlp.translate(_payload())
    by_name = {}
    for ts in series:
        by_name.setdefault(ts.labels_map()["__name__"], []).append(ts)
    # monotonic cumulative sum gains _total; dots sanitize to underscores
    s = by_name["http_requests_total"][0]
    assert s.labels_map() == {
        "__name__": "http_requests_total",
        "job": "checkout",
        "instance": "pod-1",
        "code": "200",
    }
    assert s.samples[0].value == 41.0
    assert s.samples[0].timestamp_ms == T_NS // 1_000_000
    assert "queue_depth" in by_name


def test_translate_classic_histogram_expansion():
    series = otlp.translate(_payload())
    buckets = {
        ts.labels_map()["le"]: ts.samples[0].value
        for ts in series
        if ts.labels_map().get("__name__") == "latency_bucket"
    }
    # cumulative: 5, 5+3, 5+3+2
    assert buckets == {"1.0": 5.0, "2.5": 8.0, "+Inf": 10.0}
    sums = [
        ts.samples[0].value
        for ts in series
        if ts.labels_map().get("__name__") == "latency_sum"
    ]
    counts = [
        ts.samples[0].value
        for ts in series
        if ts.labels_map().get("__name__") == "latency_count"
    ]
    assert sums == [25.0] and counts == [10.0]


def test_translate_exponential_to_native():
    series = otlp.translate(_payload())
    native = next(
        ts for ts in series if ts.labels_map().get("__name__") == "resp_size"
    )
    h = native.histograms[0]
    # OTLP offset 0, counts [2, 3] → Prometheus idx 1 (1,2], idx 2 (2,4]
    assert h.positive == [(1, 2.0), (2, 3.0)]
    assert h.schema == 0 and h.count == 6.0 and h.zero_count == 1.0


def test_translate_target_info():
    series = otlp.translate(_payload())
    info = next(
        ts for ts in series if ts.labels_map().get("__name__") == "target_info"
    )
    assert info.labels_map() == {
        "__name__": "target_info",
        "job": "checkout",
        "instance": "pod-1",
        "k8s_cluster": "prod-eu",
    }
    assert info.samples[0].value == 1.0


def test_translate_rejects_delta():
    bad = _payload()
    bad[0].metrics[0].temporality = otlp.DELTA
    with pytest.raises(ValueError, match="delta"):
        otlp.translate(bad)


def test_endpoint_ingest_and_query(spark):
    store = SparkParquetStorage(spark, tempfile.mkdtemp(prefix="phs-otlp-"))
    app = create_app(store)
    app.config["TESTING"] = True
    c = app.test_client()
    r = c.post(
        "/api/v1/otlp/v1/metrics",
        data=otlp.encode_export_request(_payload()),
        content_type="application/x-protobuf",
    )
    assert r.status_code == 200
    t = T_NS / 1e9
    body = c.get(
        "/api/v1/query",
        query_string={"query": "http_requests_total", "time": str(t)},
    ).get_json()
    res = body["data"]["result"]
    assert len(res) == 1 and float(res[0]["value"][1]) == 41.0
    # the native tier is queryable through histogram functions
    body = c.get(
        "/api/v1/query",
        query_string={"query": "histogram_count(resp_size)", "time": str(t)},
    ).get_json()
    assert float(body["data"]["result"][0]["value"][1]) == 6.0
    # info() enrichment joins the OTLP-derived target_info
    body = c.get(
        "/api/v1/query",
        query_string={"query": "info(queue_depth)", "time": str(t)},
    ).get_json()
    metric = body["data"]["result"][0]["metric"]
    assert metric.get("k8s_cluster") == "prod-eu"


def test_endpoint_rejects_delta(spark):
    store = SparkParquetStorage(spark, tempfile.mkdtemp(prefix="phs-otlp-d-"))
    app = create_app(store)
    app.config["TESTING"] = True
    c = app.test_client()
    bad = _payload()
    bad[0].metrics[0].temporality = otlp.DELTA
    r = c.post(
        "/api/v1/otlp/v1/metrics", data=otlp.encode_export_request(bad)
    )
    assert r.status_code == 400


def test_otlp_exemplars_flow_to_the_exemplar_tier(spark):
    """OTLP number-point exemplars translate (trace/span ids as hex
    labels) and land in the exemplar tier, queryable through
    /api/v1/query_exemplars."""
    payload = [
        otlp.OtlpResourceMetrics(
            resource_attributes={"service.name": "checkout"},
            metrics=[
                otlp.OtlpMetric(
                    name="hits",
                    kind="sum",
                    temporality=otlp.CUMULATIVE,
                    is_monotonic=True,
                    number_points=[
                        otlp.NumberPoint(
                            attributes={},
                            time_unix_nano=T_NS,
                            value=3.0,
                            exemplars=[
                                otlp.OtlpExemplar(
                                    attributes={"user.tier": "gold"},
                                    time_unix_nano=T_NS,
                                    value=1.25,
                                    trace_id=bytes(range(16)),
                                    span_id=bytes(range(8)),
                                )
                            ],
                        )
                    ],
                )
            ],
        )
    ]
    buf = otlp.encode_export_request(payload)
    back = otlp.decode_export_request(buf)
    e = back[0].metrics[0].number_points[0].exemplars[0]
    assert e.trace_id == bytes(range(16)) and e.value == 1.25

    store = SparkParquetStorage(spark, tempfile.mkdtemp(prefix="phs-otlp-ex-"))
    app = create_app(store)
    app.config["TESTING"] = True
    c = app.test_client()
    assert c.post("/api/v1/otlp/v1/metrics", data=buf).status_code == 200
    r = c.get(
        "/api/v1/query_exemplars",
        query_string={
            "query": "hits_total",
            "start": str(T_NS / 1e9 - 1),
            "end": str(T_NS / 1e9 + 1),
        },
    ).get_json()
    (s,) = r["data"]
    (ex,) = s["exemplars"]
    assert ex["labels"] == {
        "user_tier": "gold",
        "trace_id": bytes(range(16)).hex(),
        "span_id": bytes(range(8)).hex(),
    }
    assert ex["value"] == "1.25"
