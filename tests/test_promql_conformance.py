"""Prometheus HTTP API conformance sweep: a promql-compliance-style query
corpus (modeled on the families the public prometheus/compliance promql
tester exercises) served end-to-end through /api/v1/query_range over a
golden fixture, with per-family semantic spot checks against closed-form
expected values. Known divergences are PINNED, not skipped — the corpus
asserts each one's documented behavior, so the ARCHITECTURE.md conformance
table stays true by test.

Fixture: perfect counters requests_total{job=api|db} at 1 and 2 req/s
(15 s scrapes, 10 min), a gauge temp{room=a|b} = 20/30 constant, and a
request-duration histogram with le buckets 0.1/0.5/+Inf filling linearly.
"""

from __future__ import annotations

import math

import pytest

from promhouse_spark.edge.http import create_app
from promhouse_spark.models import Label, Sample, TimeSeries
from promhouse_spark.storage.parquet import SparkParquetStorage

T0 = 1_767_225_600_000  # 2026-01-01T00:00:00Z, aligned to every step used
START = T0 / 1000 + 300
END = T0 / 1000 + 600


@pytest.fixture(scope="module")
def client(spark, tmp_path_factory):
    store = SparkParquetStorage(
        spark, str(tmp_path_factory.mktemp("conformance-store"))
    )
    series = []
    for job, mult in (("api", 1.0), ("db", 2.0)):
        series.append(
            TimeSeries(
                labels=[Label("__name__", "requests_total"), Label("job", job)],
                samples=[
                    Sample(value=i * 15.0 * mult, timestamp_ms=T0 + i * 15_000)
                    for i in range(41)
                ],
            )
        )
    for room, deg in (("a", 20.0), ("b", 30.0)):
        series.append(
            TimeSeries(
                labels=[Label("__name__", "temp"), Label("room", room)],
                samples=[
                    Sample(value=deg, timestamp_ms=T0 + i * 15_000)
                    for i in range(41)
                ],
            )
        )
    # histogram: at any instant, cumulative counts 10 (≤0.1), 40 (≤0.5), 50 (+Inf)
    for le, cnt in (("0.1", 10.0), ("0.5", 40.0), ("+Inf", 50.0)):
        series.append(
            TimeSeries(
                labels=[
                    Label("__name__", "req_seconds_bucket"),
                    Label("le", le),
                ],
                samples=[
                    Sample(value=cnt, timestamp_ms=T0 + i * 15_000)
                    for i in range(41)
                ],
            )
        )
    # native histograms: the unit schema-0 histogram scaled k+1 per step
    # (perfectly linear cumulative growth) for job=api, 2x for job=db
    from promhouse_spark.models import NativeHistogram

    for job, mult in (("api", 1.0), ("db", 2.0)):
        series.append(
            TimeSeries(
                labels=[Label("__name__", "nlat"), Label("job", job)],
                histograms=[
                    NativeHistogram(
                        timestamp_ms=T0 + i * 15_000,
                        count=6.0 * (i + 1) * mult,
                        sum=10.0 * (i + 1) * mult,
                        schema=0,
                        zero_threshold=0.25,
                        zero_count=1.0 * (i + 1) * mult,
                        positive=[
                            (1, 2.0 * (i + 1) * mult),
                            (2, 3.0 * (i + 1) * mult),
                        ],
                    )
                    for i in range(41)
                ],
            )
        )
    store.write(series)
    app = create_app(store)
    app.config["TESTING"] = True
    return app.test_client()


def _range(client, query, start=START, end=END, step="60"):
    r = client.get(
        "/api/v1/query_range",
        query_string={"query": query, "start": str(start), "end": str(end),
                      "step": step},
    )
    return r.status_code, r.get_json()


def _values(body):
    """{frozen metric dict -> {t_sec: float}} with Prometheus string values
    parsed back ('+Inf'/'-Inf'/'NaN' included)."""
    out = {}
    for s in body["data"]["result"]:
        out[tuple(sorted(s["metric"].items()))] = {
            t: float(v.replace("+Inf", "inf").replace("-Inf", "-inf"))
            for t, v in s["values"]
        }
    return out


def _ok(client, query, **kw):
    code, body = _range(client, query, **kw)
    assert code == 200 and body["status"] == "success", (query, body)
    return _values(body)


# ---- selectors ------------------------------------------------------------


def test_selectors_family(client):
    v = _ok(client, "requests_total")
    assert len(v) == 2  # both jobs, name kept
    assert any(("__name__", "requests_total") in k for k in v)
    assert len(_ok(client, 'requests_total{job="api"}')) == 1
    assert len(_ok(client, 'requests_total{job=~"a.*"}')) == 1
    assert len(_ok(client, 'requests_total{job!~"a.*"}')) == 1
    assert len(_ok(client, '{__name__="temp", room!=""}')) == 2
    # offset shifts the counter timeline: value at t == raw at t-1m
    base = _ok(client, 'requests_total{job="api"}')
    off = _ok(client, 'requests_total{job="api"} offset 1m')
    (bk, bvals), (ok_, ovals) = next(iter(base.items())), next(iter(off.items()))
    assert ovals[START + 60] == bvals[START]
    # negative offset looks ahead
    noff = _ok(client, 'requests_total{job="api"} offset -1m')
    nvals = next(iter(noff.values()))
    assert nvals[START] == bvals[START + 60]
    # @ pins every step to one evaluation
    at = _ok(client, f'requests_total{{job="api"}} @ {T0 / 1000 + 300}')
    avals = next(iter(at.values()))
    assert set(avals.values()) == {bvals[START]}


def test_rate_family(client):
    v = _ok(client, "rate(requests_total[2m])")
    for key, vals in v.items():
        mult = 2.0 if ("job", "db") in key else 1.0
        assert ("__name__", "requests_total") not in key  # name drops
        for t, val in vals.items():
            assert val == pytest.approx(mult)
    inc = _ok(client, "increase(requests_total[2m])")
    for key, vals in inc.items():
        mult = 2.0 if ("job", "db") in key else 1.0
        assert all(val == pytest.approx(120 * mult) for val in vals.values())
    assert _ok(client, "irate(requests_total[2m])")
    assert _ok(client, "delta(temp[2m])")
    assert _ok(client, "idelta(requests_total[2m])")
    assert _ok(client, "resets(requests_total[5m])")
    assert _ok(client, "changes(requests_total[5m])")
    d = _ok(client, "deriv(requests_total[2m])")
    for key, vals in d.items():
        mult = 2.0 if ("job", "db") in key else 1.0
        assert all(val == pytest.approx(mult) for val in vals.values())
    assert _ok(client, "predict_linear(requests_total[2m], 60)")


def test_over_time_family(client):
    avg = _ok(client, "avg_over_time(temp[2m])")
    for key, vals in avg.items():
        want = 20.0 if ("room", "a") in key else 30.0
        assert all(v == want for v in vals.values())
    for fn in ("min_over_time", "max_over_time", "last_over_time"):
        v = _ok(client, f"{fn}(temp[2m])")
        assert len(v) == 2
    cnt = _ok(client, "count_over_time(temp[2m])")
    assert all(v == 8.0 for vals in cnt.values() for v in vals.values())
    s = _ok(client, "sum_over_time(temp[2m])")
    assert any(v == 160.0 for vals in s.values() for v in vals.values())
    q = _ok(client, "quantile_over_time(0.5, temp[2m])")
    assert len(q) == 2
    assert _ok(client, "stddev_over_time(temp[2m])")
    assert _ok(client, "present_over_time(temp[2m])")
    # last_over_time keeps the metric name (engine.go special case)
    lk = _ok(client, "last_over_time(temp[2m])")
    assert all(("__name__", "temp") in k for k in lk)


def test_aggregation_family(client):
    s = _ok(client, "sum(temp)")
    assert list(s) == [()]
    assert all(v == 50.0 for v in next(iter(s.values())).values())
    by = _ok(client, "sum by (room) (temp)")
    assert len(by) == 2
    wo = _ok(client, "sum without (room) (temp)")
    assert len(wo) == 1
    for op in ("avg", "min", "max", "count", "group", "stddev", "stdvar"):
        assert _ok(client, f"{op}(temp)")
    tk = _ok(client, "topk(1, temp)")
    assert list(tk) == [(("__name__", "temp"), ("room", "b"))]
    bk = _ok(client, "bottomk(1, temp)")
    assert list(bk) == [(("__name__", "temp"), ("room", "a"))]
    q = _ok(client, "quantile(0.5, temp)")
    assert all(v == 25.0 for v in next(iter(q.values())).values())
    cv = _ok(client, 'count_values("deg", temp)')
    assert len(cv) == 2
    # Prometheus 3.x experimental aggregations
    lk = _ok(client, "limitk(1, temp)")
    assert len(lk) == 1
    keep = _ok(client, "limit_ratio(0.5, temp)")
    rest = _ok(client, "limit_ratio(-0.5, temp)")
    assert len(keep) + len(rest) == 2 and not (set(keep) & set(rest))
    assert _ok(client, 'sort_by_label(temp, "room")')


def test_binop_family(client):
    r = _ok(client, "temp + temp")
    assert all(v in (40.0, 60.0) for vals in r.values() for v in vals.values())
    r = _ok(client, "temp * 2")
    assert all(v in (40.0, 60.0) for vals in r.values() for v in vals.values())
    r = _ok(client, 'temp{room="a"} / on() group_left temp{room="a"}')
    assert all(v == 1.0 for vals in r.values() for v in vals.values())
    # comparison filter vs bool
    f = _ok(client, "temp > 25")
    assert len(f) == 1 and ("room", "b") in next(iter(f))
    b = _ok(client, "temp > bool 25")
    assert sorted(
        v for vals in b.values() for v in set(vals.values())
    ) == [0.0, 1.0]
    # set operators
    assert len(_ok(client, 'temp and temp{room="a"}')) == 1
    assert len(_ok(client, 'temp unless temp{room="a"}')) == 1
    assert len(_ok(client, 'temp{room="a"} or temp{room="b"}')) == 2
    # scalar-vector
    sv = _ok(client, "temp / scalar(sum(temp))")
    assert all(
        v in (pytest.approx(0.4), pytest.approx(0.6))
        for vals in sv.values()
        for v in vals.values()
    )
    # IEEE specials over the wire: x/0 serializes as "+Inf", 0/0 as "NaN"
    inf = _ok(client, "temp / 0")
    assert all(math.isinf(v) for vals in inf.values() for v in vals.values())
    nan = _ok(client, "(temp - temp) / 0")
    assert all(math.isnan(v) for vals in nan.values() for v in vals.values())


def test_function_family(client):
    assert _ok(client, "abs(0 - temp)")
    assert _ok(client, "ceil(temp / 7)")
    assert _ok(client, "floor(temp / 7)")
    sq = _ok(client, "sqrt(temp * temp)")
    assert all(
        v in (pytest.approx(20.0), pytest.approx(30.0))
        for vals in sq.values()
        for v in vals.values()
    )
    for fn in ("exp", "ln", "log2", "log10", "sgn", "sin", "cos", "tan",
               "asin", "acos", "atan", "sinh", "cosh", "tanh", "deg", "rad"):
        arg = "temp / 100" if fn in ("asin", "acos") else "temp"
        assert _ok(client, f"{fn}({arg})") is not None
    cl = _ok(client, "clamp(temp, 22, 28)")
    assert sorted(
        {v for vals in cl.values() for v in vals.values()}
    ) == [22.0, 28.0]
    assert _ok(client, "clamp_min(temp, 25)")
    assert _ok(client, "clamp_max(temp, 25)")
    rd = _ok(client, "round(temp / 7)")
    assert rd
    lr = _ok(client, 'label_replace(temp, "r2", "$1", "room", "(.*)")')
    assert all(("r2", "a") in k or ("r2", "b") in k for k in lr)
    lj = _ok(client, 'label_join(temp, "rj", "-", "room", "room")')
    assert all(any(x[0] == "rj" for x in k) for k in lj)
    v = _ok(client, "vector(7)")
    assert all(x == 7.0 for vals in v.values() for x in vals.values())
    t = _ok(client, "time()")
    assert all(ts == x for vals in t.values() for ts, x in vals.items())
    assert _ok(client, "minute()")
    assert _ok(client, "hour(temp * 0)")
    sc = _ok(client, "scalar(sum(temp))")
    assert all(x == 50.0 for vals in sc.values() for x in vals.values())
    ts = _ok(client, "timestamp(temp)")
    # selector timestamps are the as-of matched SAMPLE times (≤ eval time)
    assert all(0 < t - x <= 300 or x == t
               for vals in ts.values() for t, x in vals.items())
    assert _ok(client, "day_of_year(temp * 0)")
    assert _ok(client, "days_in_month(temp * 0)")


def test_at_start_end_modifiers(client):
    pinned = _ok(client, "requests_total @ start()")
    base = _ok(client, "requests_total")
    for key, vals in pinned.items():
        want = base[key][START]
        assert set(vals.values()) == {want}
    pinned_end = _ok(client, "requests_total @ end()")
    for key, vals in pinned_end.items():
        assert set(vals.values()) == {base[key][END]}


def test_absent_family(client):
    a = _ok(client, "absent(no_such)")
    assert all(x == 1.0 for vals in a.values() for x in vals.values())
    assert _ok(client, "absent(temp)") == {}
    aot = _ok(client, 'absent_over_time(no_such{job="x"}[5m])')
    assert list(aot) == [(("job", "x"),)]
    assert _ok(client, "absent_over_time(temp[5m])") == {}


def test_histogram_family(client):
    q = _ok(client, "histogram_quantile(0.5, req_seconds_bucket)")
    vals = next(iter(q.values()))
    # rank 25 falls in the (0.1, 0.5] bucket: 0.1 + 0.4 * (25-10)/30 = 0.3
    assert all(v == pytest.approx(0.3) for v in vals.values())
    top = _ok(client, "histogram_quantile(0.99, req_seconds_bucket)")
    # 0.99 quantile lands in +Inf bucket → highest finite bound
    assert all(
        v == pytest.approx(0.5) for vals in top.values() for v in vals.values()
    )


def test_subquery_family(client):
    v = _ok(client, "max_over_time(rate(requests_total[2m])[4m:1m])")
    for key, vals in v.items():
        mult = 2.0 if ("job", "db") in key else 1.0
        assert all(val == pytest.approx(mult) for val in vals.values())
    assert _ok(client, "avg_over_time(temp[4m:30s])")


def test_error_shapes(client):
    for bad in ("sum(", "temp{", "no_such_fn(temp)", "topk(temp)",
                "scalar(temp) > 1", "temp + bool temp",
                "temp and on(room) group_left temp"):
        code, body = _range(client, bad)
        assert code == 400 and body["status"] == "error", bad
        assert body["errorType"] == "bad_data"


def test_newer_function_surface(client):
    # atan2 operator
    a = _ok(client, "temp atan2 temp")
    assert all(v == pytest.approx(math.pi / 4)
               for vals in a.values() for v in vals.values())
    # constant series: MAD is 0 everywhere
    mad = _ok(client, "mad_over_time(temp[2m])")
    assert all(v == 0.0 for vals in mad.values() for v in vals.values())
    # ts_of_* return sample timestamps within the window
    ts = _ok(client, "ts_of_last_over_time(temp[2m])")
    assert all(t - x < 120 for vals in ts.values() for t, x in vals.items())
    assert _ok(client, "ts_of_max_over_time(temp[2m])")
    assert _ok(client, "ts_of_min_over_time(temp[2m])")


def test_documented_divergences(client):
    """Each known divergence asserted AS DOCUMENTED in ARCHITECTURE.md —
    if one gets fixed or regresses differently, this test flags the doc."""
    # 1. RE2 POSIX classes take Java's nested-class-union parse:
    #    [[:alpha:]] becomes the character set {[ : a l p h}, so room "a"
    #    matches and room "b" does not — RE2 would match both. (Same
    #    divergence family as tests/test_regex_dialect.py.)
    code, body = _range(client, 'temp{room=~"[[:alpha:]]+"}')
    assert code == 200
    rooms = {s["metric"].get("room") for s in body["data"]["result"]}
    assert rooms == {"a"}
    # 2. holt_winters is served under BOTH its 2.x name and the 3.x
    #    double_exponential_smoothing alias (not a divergence anymore)
    assert _range(client, "double_exponential_smoothing(temp[2m], 0.1, 0.3)")[0] == 200
    assert _range(client, "holt_winters(temp[2m], 0.1, 0.3)")[0] == 200


def test_ieee_specials_family(client):
    """Round-7 closures: Go math.Pow for ^, NaN-window over-time folds,
    timestamp() under offset, strconv 'f' value serialization."""
    # 0 ^ -1 -> +Inf (Go math.Pow); previously an uncaught
    # ZeroDivisionError -> 500
    v = _ok(client, "0 ^ -1")
    assert all(val == math.inf for vals in v.values() for val in vals.values())
    # vector-side ^ goes through Java Math.pow: same answer
    v = _ok(client, '(temp{room="a"} - temp{room="a"}) ^ -1')
    assert all(val == math.inf for vals in v.values() for val in vals.values())
    # an all-NaN window keeps max_over_time NaN; a numeric max is never
    # displaced by NaN (Go fold semantics)
    v = _ok(
        client,
        'max_over_time(((temp{room="a"} - temp{room="a"}) / '
        '(temp{room="a"} - temp{room="a"}))[2m:1m])',
    )
    assert v and all(
        math.isnan(val) for vals in v.values() for val in vals.values()
    )
    # timestamp() reports the RAW sample timestamp under offset
    v = _ok(client, 'timestamp(temp{room="a"} offset 1m)')
    assert v and all(
        val == pytest.approx(t - 60)
        for vals in v.values()
        for t, val in vals.items()
    )
    # @ on a range selector reached through a parameterized function
    v = _ok(
        client,
        f'quantile_over_time(0.5, temp{{room="a"}}[2m] @ {T0 / 1000 + 300})',
    )
    assert v and all(
        val == 20.0 for vals in v.values() for val in vals.values()
    )


def test_value_serialization_strconv(client):
    # sample values serialize Go-strconv style: fixed notation, shortest
    # digits — 20/2e6 = 0.00001 must NOT render "1e-05"
    code, body = _range(client, 'temp{room="a"} / 2000000')
    assert code == 200
    vals = body["data"]["result"][0]["values"]
    assert vals and all(v == "0.00001" for _, v in vals)
    code, body = _range(client, 'temp{room="a"} * 5000000000000000')
    vals = body["data"]["result"][0]["values"]
    assert vals and all(v == "100000000000000000" for _, v in vals)


def test_native_histogram_family(client):
    """histogram_* functions over native-histogram series through
    query_range: instant moments, quantile, fraction, aggregation, and
    rate() — closed-form values from the linearly-growing fixture."""
    # count at step i = 6·(i+1)·mult; at t = T0+300s (i = 20) → 126
    v = _ok(client, 'histogram_count(nlat{job="api"})')
    assert v and all(
        val == 6.0 * (t - T0 / 1000 + 15) / 15
        for vals in v.values()
        for t, val in vals.items()
    )
    v = _ok(client, 'histogram_avg(nlat{job="api"})')
    assert v and all(
        val == pytest.approx(10.0 / 6.0)
        for vals in v.values()
        for val in vals.values()
    )
    # shape is scale-invariant: the median is always 2
    v = _ok(client, "histogram_quantile(0.5, nlat)")
    assert len(v) == 2 and all(
        val == pytest.approx(2.0) for vals in v.values() for val in vals.values()
    )
    v = _ok(client, 'histogram_fraction(0, 2, nlat{job="db"})')
    assert v and all(
        val == pytest.approx(2.5 / 6.0)
        for vals in v.values()
        for val in vals.values()
    )
    v = _ok(client, 'histogram_stddev(nlat{job="api"})')
    mean = 10.0 / 6.0
    want = math.sqrt(
        (1 * mean**2 + 2 * (2**0.5 - mean) ** 2 + 3 * (2**1.5 - mean) ** 2) / 6
    )
    assert v and all(
        val == pytest.approx(want) for vals in v.values() for val in vals.values()
    )
    # sum() merges the api + db histograms; count triples (1x + 2x)
    v = _ok(client, "histogram_count(sum(nlat))")
    assert v and all(
        val == 18.0 * (t - T0 / 1000 + 15) / 15
        for vals in v.values()
        for t, val in vals.items()
    )
    # rate over the linear counter: count grows 6·mult per 15 s
    v = _ok(client, 'histogram_count(rate(nlat{job="api"}[2m]))')
    assert v and all(
        val == pytest.approx(6.0 / 15.0)
        for vals in v.values()
        for val in vals.values()
    )


def test_utf8_names_family(client):
    """Prometheus 3 quoted-name syntax through the API: classic metrics
    addressed via the quoted sugar and quoted grouping labels."""
    v = _ok(client, '{"requests_total", job="api"}')
    assert len(v) == 1
    v = _ok(client, 'sum by ("room") ({"temp"})')
    assert len(v) == 2


def test_comparison_bool_matrix(client):
    """Every comparison operator in filter AND bool form (upstream
    promql testdata operators.test breadth): filter keeps the metric
    name and subsets; bool drops the name and emits 0/1 for every
    series (engine.go shouldDropMetricName is true only for bool)."""
    # temp: room a=20, room b=30 — (op, threshold, room kept by filter)
    cases = [
        ("==", 20, "a"), ("!=", 20, "b"),
        (">", 25, "b"), ("<", 25, "a"),
        (">=", 30, "b"), ("<=", 20, "a"),
    ]
    for op, thr, kept in cases:
        f = _ok(client, f"temp {op} {thr}")
        assert len(f) == 1, (op, thr, f)
        key = next(iter(f))
        assert ("room", kept) in key and ("__name__", "temp") in key, (op, key)
        b = _ok(client, f"temp {op} bool {thr}")
        assert len(b) == 2, (op, b)
        for k, vals in b.items():
            assert ("__name__", "temp") not in k  # bool drops the name
            want = 1.0 if ("room", kept) in k else 0.0
            assert set(vals.values()) == {want}, (op, k, vals)
    # scalar on the LEFT flips the comparison direction, not the filter
    # target: the vector side is still what's filtered/kept
    lf = _ok(client, "25 > temp")
    assert len(lf) == 1 and ("room", "a") in next(iter(lf))
    lb = _ok(client, "25 > bool temp")
    assert len(lb) == 2
    # vector-vector: filter keeps name, bool drops it
    vv = _ok(client, "temp == temp")
    assert len(vv) == 2 and all(("__name__", "temp") in k for k in vv)
    vb = _ok(client, "temp >= bool temp")
    assert len(vb) == 2
    for k, vals in vb.items():
        assert ("__name__", "temp") not in k
        assert set(vals.values()) == {1.0}


def test_group_left_label_copies(client):
    """group_left/group_right include-label copies under __name__ drops
    (upstream operators.test many-to-one family): the many side's labels
    survive minus __name__, the listed labels copy over from the one
    side; the mirrored group_right produces the identical result."""
    # one side: group() collapses requests_total{job="api"} to value 1
    one = 'group by (job) (requests_total{job="api"})'
    gl = _ok(client, f"temp * on() group_left(job) {one}")
    assert len(gl) == 2
    for k, vals in gl.items():
        assert ("job", "api") in k          # copied from the one side
        assert ("__name__", "temp") not in k  # arithmetic drops the name
        assert any(("room", r) in k for r in ("a", "b"))
        want = 20.0 if ("room", "a") in k else 30.0
        assert set(vals.values()) == {want}  # temp * 1
    gr = _ok(client, f"{one} * on() group_right(job) temp")
    assert gr == gl  # mirrored cardinality, identical output
    # grouped COMPARISON filter: many-side rows kept with name intact,
    # include labels still copied (resultMetric applies either way)
    gf = _ok(client, f"temp >= on() group_left(job) {one}")
    assert len(gf) == 2
    for k, vals in gf.items():
        assert ("__name__", "temp") in k and ("job", "api") in k
        want = 20.0 if ("room", "a") in k else 30.0
        assert set(vals.values()) == {want}  # filter keeps temp's values
    # grouped bool comparison: 0/1 values, name dropped, copies applied
    gb = _ok(client, f"temp >= bool on() group_left(job) {one}")
    assert len(gb) == 2
    for k, vals in gb.items():
        assert ("__name__", "temp") not in k and ("job", "api") in k
        assert set(vals.values()) == {1.0}


def test_staleness_lookback_family(spark, tmp_path):
    """Upstream staleness.test analog: a series whose samples stop is
    still returned by an instant selector for the 5 m lookback window
    after its last sample, then vanishes — no value is invented past
    lookback. (Explicit stale NaN markers are a scrape-path concept the
    remote-write surface never carries; lookback expiry is the part with
    query-visible semantics.)"""
    store = SparkParquetStorage(spark, str(tmp_path / "stale"))
    store.write(
        [
            TimeSeries(
                labels=[Label("__name__", "short"), Label("job", "x")],
                # samples at T0, T0+15s, ..., T0+120s, then silence
                samples=[
                    Sample(value=1.0, timestamp_ms=T0 + i * 15_000)
                    for i in range(9)
                ],
            ),
            TimeSeries(
                labels=[Label("__name__", "long"), Label("job", "x")],
                samples=[
                    Sample(value=2.0, timestamp_ms=T0 + i * 15_000)
                    for i in range(41)
                ],
            ),
        ]
    )
    app = create_app(store)
    app.config["TESTING"] = True
    c = app.test_client()
    last = T0 / 1000 + 120  # last sample of `short`
    code, body = _range(c, "short", start=T0 / 1000, end=T0 / 1000 + 600,
                        step="60")
    assert code == 200
    vals = next(iter(_values(body).values()))
    times = sorted(vals)
    # present through last+300s (5m lookback), absent after
    assert all(t <= last + 300 for t in times), times
    assert max(times) == T0 / 1000 + 420  # 120s + 300s lookback, on-step
    assert set(vals.values()) == {1.0}  # lookback repeats the LAST value
    # the still-scraped series spans the whole window at every step
    code, body = _range(c, "long", start=T0 / 1000, end=T0 / 1000 + 600,
                        step="60")
    lvals = next(iter(_values(body).values()))
    assert len(lvals) == 11
