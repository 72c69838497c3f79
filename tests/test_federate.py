"""/federate endpoint: latest-sample-per-series federation output in
exposition text format, round-tripped through our own exposition parser
(the format a federating Prometheus scrapes, web/federate.go)."""

from __future__ import annotations

import tempfile

import pytest

from promhouse_spark.edge.exposition import parse_exposition
from promhouse_spark.edge.http import create_app
from promhouse_spark.models import Label, Sample, TimeSeries
from promhouse_spark.storage.parquet import SparkParquetStorage

# slow tier (r12): federation endpoint integration. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow


T0 = 1_767_225_600_000


@pytest.fixture(scope="module")
def client(spark):
    store = SparkParquetStorage(spark, tempfile.mkdtemp(prefix="phs-federate-"))
    series = []
    for name, job in (("up", "api"), ("up", "db"), ("load", "api")):
        series.append(
            TimeSeries(
                labels=[Label("__name__", name), Label("job", job)],
                samples=[
                    Sample(value=float(i), timestamp_ms=T0 + i * 15_000)
                    for i in range(4)
                ],
            )
        )
    store.write(series)
    app = create_app(store)
    app.config["TESTING"] = True
    return app.test_client()


def _federate(client, **params):
    r = client.get("/federate", query_string=params)
    assert r.status_code == 200, r.get_data()
    assert r.mimetype == "text/plain"
    return list(parse_exposition(r.get_data(as_text=True)))


def test_federate_latest_per_series(client):
    got = _federate(
        client, **{"match[]": "up", "time": str((T0 + 45_000) / 1000)}
    )
    by_job = {ts.labels_map()["job"]: ts for ts in got}
    assert set(by_job) == {"api", "db"}
    for ts in got:
        assert ts.labels_map()["__name__"] == "up"
        # the latest sample only, with its original millisecond timestamp
        assert ts.samples == [Sample(value=3.0, timestamp_ms=T0 + 45_000)]


def test_federate_multiple_matchers_or(client):
    got = _federate(
        client,
        **{
            "match[]": ['up{job="db"}', "load"],
            "time": str((T0 + 45_000) / 1000),
        },
    )
    names = sorted(
        (ts.labels_map()["__name__"], ts.labels_map()["job"]) for ts in got
    )
    assert names == [("load", "api"), ("up", "db")]


def test_federate_staleness_window(client):
    # 10 minutes after the last write: everything is stale, empty body
    got = _federate(
        client, **{"match[]": "up", "time": str((T0 + 645_000) / 1000)}
    )
    assert got == []
    # a tighter mid-range time picks the sample as of that instant
    got = _federate(
        client, **{"match[]": "up", "time": str((T0 + 20_000) / 1000)}
    )
    assert all(ts.samples[0].timestamp_ms == T0 + 15_000 for ts in got)


def test_federate_requires_match(client):
    r = client.get("/federate")
    assert r.status_code == 400
    assert r.get_json()["errorType"] == "bad_data"
