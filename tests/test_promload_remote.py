"""promload ``remote:`` endpoints: step-sliced streamed remote read and
Remote-Write 1.0/2.0 over a live HTTP server — the migration path the
reference's promload covers with its ClickHouse client, re-expressed
against the open remote protocols."""

from __future__ import annotations

import argparse
import socket
import threading

import pytest

from promhouse_spark.models import Label, Sample, TimeSeries
from promhouse_spark.storage.memory import MemoryStorage
from tests.fixtures import T0, get_data, normalize

# slow tier (r12): remote-write load integration. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow



def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture()
def live_server():
    flask = pytest.importorskip("flask")  # noqa: F841
    from werkzeug.serving import make_server

    from promhouse_spark.edge.http import create_app

    storage = MemoryStorage()
    app = create_app(storage)
    port = _free_port()
    srv = make_server("127.0.0.1", port, app, threaded=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", storage
    srv.shutdown()


def _all(storage):
    from promhouse_spark.models import Query

    return storage.read([Query(0, 1 << 52, ())])[0]


def _args(**kw):
    ns = argparse.Namespace(
        step_ms=60_000,
        last_ms=120_000,
        start_ms=0,
        end_ms=0,
        cache=False,
        rw2=False,
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_remote_read_streamed_to_file(live_server, tmp_path):
    from promhouse_spark.edge import framed
    from promhouse_spark.edge.exposition import merge_series
    from promhouse_spark.edge.promload import copy

    base, storage = live_server
    storage.write(get_data())
    dst = tmp_path / "dump.bin"
    n = copy(
        f"remote:{base}/read",
        f"file:{dst}",
        _args(start_ms=T0 - 30_000, end_ms=T0 + 30_000, step_ms=20_000),
    )
    assert n > 0
    with open(dst, "rb") as f:
        got = merge_series(framed.read_frames(f))
    assert normalize(got) == normalize(get_data())


@pytest.mark.parametrize("rw2", [False, True])
def test_remote_write_v1_and_v2(live_server, tmp_path, rw2):
    from promhouse_spark.edge import framed
    from promhouse_spark.edge.promload import copy

    base, storage = live_server
    src = tmp_path / "src.bin"
    with open(src, "wb") as f:
        framed.write_frames(f, get_data())

    copy(f"file:{src}", f"remote:{base}/write", _args(rw2=rw2))
    assert normalize(_all(storage)) == normalize(get_data())


def test_remote_roundtrip_preserves_streamed_chunks(live_server, tmp_path):
    """remote → file → remote: a full migration loop through both new
    protocols (streamed read out, RW2 write back)."""
    from promhouse_spark.edge.promload import copy

    base, storage = live_server
    dense = [
        TimeSeries(
            labels=[Label("__name__", "dense"), Label("k", "0")],
            samples=[Sample(float(i % 5), T0 + i * 1000) for i in range(300)],
        )
    ]
    storage.write(dense)
    dump = tmp_path / "d.bin"
    copy(
        f"remote:{base}/read",
        f"file:{dump}",
        _args(start_ms=T0 - 1000, end_ms=T0 + 301_000, step_ms=500_000),
    )
    store2 = MemoryStorage()
    from promhouse_spark.edge.http import create_app
    from werkzeug.serving import make_server

    port = _free_port()
    app2 = create_app(store2)
    srv2 = make_server("127.0.0.1", port, app2, threaded=True)
    t = threading.Thread(target=srv2.serve_forever, daemon=True)
    t.start()
    try:
        copy(f"file:{dump}", f"remote:http://127.0.0.1:{port}/write", _args(rw2=True))
    finally:
        srv2.shutdown()
    want = normalize(dense)
    got = normalize(
        [ts for ts in _all(store2) if ts.labels_map().get("__name__") == "dense"]
    )
    assert got == want


def test_remote_read_streamed_histogram_chunks_roundtrip(live_server):
    """Native-histogram series ride the streamed remote-read response as
    HISTOGRAM / FLOAT_HISTOGRAM chunks and the read_remote client decodes
    them back — integer-count and fractional-count (float chunk) series
    in one response next to a float-sample series."""
    from promhouse_spark.edge.promload import read_remote
    from promhouse_spark.models import NativeHistogram

    base, storage = live_server
    storage.write(
        [
            TimeSeries(
                labels=[Label("__name__", "lat_int"), Label("job", "h")],
                histograms=[
                    NativeHistogram(
                        timestamp_ms=T0 + i * 15_000,
                        count=float(3 + i),
                        sum=1.5 * i,
                        schema=0,
                        zero_count=float(i),
                        positive=[(0, 2.0), (1, float(1 + i))],
                    )
                    for i in range(5)
                ],
            ),
            TimeSeries(
                labels=[Label("__name__", "lat_float"), Label("job", "h")],
                histograms=[
                    NativeHistogram(
                        timestamp_ms=T0 + i * 15_000,
                        count=2.5 + i,
                        sum=0.25 * i,
                        schema=3,
                        positive=[(2, 1.25 + i)],
                        is_float=True,
                    )
                    for i in range(3)
                ],
            ),
            TimeSeries(
                labels=[Label("__name__", "floats"), Label("job", "h")],
                samples=[Sample(float(i), T0 + i * 15_000) for i in range(5)],
            ),
        ]
    )
    got: dict[str, TimeSeries] = {}
    for batch in read_remote(
        f"{base}/read", step_ms=10**9, last_ms=10**9, end_ms=T0 + 10**6
    ):
        for ts in batch:
            got[ts.labels_map()["__name__"]] = ts
    assert set(got) == {"lat_int", "lat_float", "floats"}
    assert [s.value for s in got["floats"].samples] == [0.0, 1.0, 2.0, 3.0, 4.0]
    hi = got["lat_int"].histograms
    assert [h.count for h in hi] == [3.0, 4.0, 5.0, 6.0, 7.0]
    assert all(not h.is_float for h in hi)
    assert dict(hi[4].positive)[1] == 5.0 and hi[4].zero_count == 4.0
    hf = got["lat_float"].histograms
    assert [h.count for h in hf] == [2.5, 3.5, 4.5]
    assert all(h.is_float for h in hf)
    assert dict(hf[2].positive)[2] == 3.25 and hf[2].schema == 3
