"""fake_exporter server: the reference's load-test metric fan-out daemon
(``cmd/fake_exporter``) — scrape one upstream exporter (or a static series
set), re-expose N jittered instances on ``GET /metrics``.

Each scrape re-jitters values through the X9 rules (``edge/faker.py``), so a
Prometheus pointed at this endpoint ingests a realistic N-instance load from
one source, exactly like the reference's docker-compose load rig
(``misc/docker-compose-linux.yml``: 1 exporter → 100 fake instances).
"""

from __future__ import annotations

import time
import urllib.request
from typing import Callable, Sequence

from promhouse_spark.edge.exposition import parse_exposition, render_exposition
from promhouse_spark.edge.faker import fan_out
from promhouse_spark.models import TimeSeries


def scrape_upstream(url: str) -> list[TimeSeries]:
    with urllib.request.urlopen(url, timeout=10) as resp:  # noqa: S310
        return list(parse_exposition(resp.read().decode()))


def create_app(
    source: Callable[[], Sequence[TimeSeries]],
    instances: int = 100,
    cache_seconds: float = 1.0,
):
    """WSGI app exposing the fanned-out ``/metrics``.

    ``source`` supplies the base series per scrape (e.g.
    ``lambda: scrape_upstream(url)``); upstream scrapes are cached for
    ``cache_seconds`` (the reference's optional ``cache`` reuse of the last
    scrape, ``exporter.go:188-241``). Jitter is re-seeded per scrape from the
    clock so consecutive scrapes move.
    """
    from flask import Flask, Response

    app = Flask("fake_exporter")
    state = {"ts": 0.0, "base": []}

    @app.get("/metrics")
    def metrics():
        now = time.time()
        if now - state["ts"] > cache_seconds or not state["base"]:
            state["base"] = list(source())
            state["ts"] = now
        seed = int(now * 1000) & 0xFFFFFFFF
        fanned = list(fan_out(state["base"], instances=instances, seed=seed))
        return Response(render_exposition(fanned), mimetype="text/plain")

    return app


def serve(
    upstream_url: str,
    instances: int = 100,
    host: str = "127.0.0.1",
    port: int = 7782,
) -> None:
    create_app(lambda: scrape_upstream(upstream_url), instances).run(
        host=host, port=port, threaded=True
    )
