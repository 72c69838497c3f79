"""fake_exporter server: one upstream → N jittered instances on /metrics,
values move between scrapes, upstream scrape cached."""

import pytest

from promhouse_spark.edge.exposition import merge_series, parse_exposition
from promhouse_spark.models import Label, Sample, TimeSeries
from tests.fixtures import T0

# slow tier (r12): exporter integration. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow



@pytest.fixture()
def app():
    pytest.importorskip("flask")
    from promhouse_spark.edge.fake_exporter import create_app

    calls = {"n": 0}

    def source():
        calls["n"] += 1
        return [
            TimeSeries(
                labels=[Label("__name__", "up")], samples=[Sample(1.0, T0)]
            ),
            TimeSeries(
                labels=[Label("__name__", "load")], samples=[Sample(2.5, T0)]
            ),
        ]

    a = create_app(source, instances=4, cache_seconds=60)
    a.testing = True
    return a, calls


def test_fan_out_served(app):
    a, calls = app
    c = a.test_client()
    text = c.get("/metrics").get_data(as_text=True)
    series = merge_series(parse_exposition(text))
    instances = {ts.labels_map().get("instance") for ts in series}
    assert instances == {f"fake-{i}" for i in range(4)}
    assert len(series) == 8  # 2 metrics × 4 instances
    ups = [ts for ts in series if ts.labels_map()["__name__"] == "up"]
    assert all(ts.samples[0].value == 1.0 for ts in ups)  # 1.0 never jittered
    loads = [ts for ts in series if ts.labels_map()["__name__"] == "load"]
    assert all(2.25 <= ts.samples[0].value <= 2.75 for ts in loads)  # ±10%


def test_upstream_cached(app):
    a, calls = app
    c = a.test_client()
    c.get("/metrics")
    c.get("/metrics")
    assert calls["n"] == 1  # second scrape served from cache window
