"""Native-histogram functions in the compiled PromQL engine:
histogram_count/sum/avg/stddev/stdvar/fraction and histogram_quantile
over wire-ingested native histograms, at instant selectors and through
rate()/increase() — hand-computed goldens on a schema-0 histogram."""

from __future__ import annotations

import math
import tempfile

import pytest

from promhouse_spark.models import Label, NativeHistogram, Sample, TimeSeries
from promhouse_spark.promql import PromQLEngine
from promhouse_spark.storage.parquet import SparkParquetStorage

T0 = 1_767_225_600_000  # 2026-01-01T00:00:00Z


def _hist(ts_ms: int, scale: float = 1.0) -> NativeHistogram:
    """schema 0 (base 2): zero bucket [-0.25, 0.25] count 1·scale,
    bucket idx 1 = (1, 2] count 2·scale, idx 2 = (2, 4] count 3·scale;
    count 6·scale, sum 10·scale."""
    return NativeHistogram(
        timestamp_ms=ts_ms,
        count=6.0 * scale,
        sum=10.0 * scale,
        schema=0,
        zero_threshold=0.25,
        zero_count=1.0 * scale,
        positive=[(1, 2.0 * scale), (2, 3.0 * scale)],
        negative=[],
    )


@pytest.fixture(scope="module")
def store(spark):
    s = SparkParquetStorage(spark, tempfile.mkdtemp(prefix="phs-nh-engine-"))
    s.write(
        [
            TimeSeries(
                labels=[Label("__name__", "lat"), Label("job", "api")],
                histograms=[_hist(T0 + k * 60_000, scale=k + 1) for k in range(5)],
            ),
            # a float series under a DIFFERENT name: histogram functions
            # must not pick it up
            TimeSeries(
                labels=[Label("__name__", "reqs"), Label("job", "api")],
                samples=[Sample(float(k), T0 + k * 60_000) for k in range(5)],
            ),
        ]
    )
    return s


@pytest.fixture(scope="module")
def store2(spark):
    """Two native-histogram series of one metric, for aggregation tests:
    job=a the unit histogram, job=b the 2× histogram."""
    s = SparkParquetStorage(spark, tempfile.mkdtemp(prefix="phs-nh-agg-"))
    s.write(
        [
            TimeSeries(
                labels=[Label("__name__", "h2"), Label("job", "a")],
                histograms=[_hist(T0)],
            ),
            TimeSeries(
                labels=[Label("__name__", "h2"), Label("job", "b")],
                histograms=[_hist(T0, scale=2.0)],
            ),
        ]
    )
    return s


def _eng(store, at_ms=None, **kw):
    t = at_ms if at_ms is not None else T0 + 120_000
    return PromQLEngine.from_storage(store, t, t, 60_000, **kw)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1, rows
    return rows[0]


# -------------------------------------------------- instant moments


def test_histogram_count_sum_avg(store):
    e = _eng(store)  # eval at T0+120s → latest is the scale-3 histogram
    r = _one(e.eval("histogram_count(lat)"))
    assert dict(r["labels"]) == {"job": "api"}  # name dropped
    assert r["value"] == 18.0
    assert _one(e.eval("histogram_sum(lat)"))["value"] == 30.0
    assert _one(e.eval("histogram_avg(lat)"))["value"] == pytest.approx(30.0 / 18.0)


def test_histogram_stddev_stdvar(store):
    e = _eng(store)
    # mass at geometric midpoints: zero bucket → 0, idx1 → 2^0.5, idx2 → 2^1.5
    mean = 10.0 / 6.0
    var = (
        1 * (0.0 - mean) ** 2
        + 2 * (2**0.5 - mean) ** 2
        + 3 * (2**1.5 - mean) ** 2
    ) / 6.0
    assert _one(e.eval("histogram_stdvar(lat)"))["value"] == pytest.approx(var)
    assert _one(e.eval("histogram_stddev(lat)"))["value"] == pytest.approx(
        math.sqrt(var)
    )


def test_histogram_fraction(store):
    e = _eng(store)
    # F(2) = zero bucket full (1) + idx1 full (2) = 3; F(0) = half the
    # zero bucket = 0.5 → (3 − 0.5)/6
    r = _one(e.eval("histogram_fraction(0, 2, lat)"))
    assert r["value"] == pytest.approx(2.5 / 6.0)
    # full range → 1
    assert _one(e.eval("histogram_fraction(-4, 4, lat)"))["value"] == pytest.approx(1.0)


def test_histogram_quantile_native(store):
    e = _eng(store)
    # rank = 0.5·6 = 3; cum: zero→1, idx1→3 (hit); interp inside (1,2]:
    # 1 + (2−1)·(3−1)/2 = 2
    r = _one(e.eval("histogram_quantile(0.5, lat)"))
    assert dict(r["labels"]) == {"job": "api"}
    assert r["value"] == pytest.approx(2.0)
    # out-of-range q: native rows answer ±Inf like Prometheus
    assert _one(e.eval("histogram_quantile(1.5, lat)"))["value"] == float("inf")
    assert _one(e.eval("histogram_quantile(-1, lat)"))["value"] == float("-inf")


# -------------------------------------------------- rate/increase path


def test_histogram_count_of_rate(store):
    # perfect 60 s cadence, scale grows by 1 per step → count grows 6/60 s
    t = T0 + 240_000
    e = PromQLEngine.from_storage(store, t, t, 60_000)
    r = _one(e.eval("histogram_count(rate(lat[4m]))"))
    assert r["value"] == pytest.approx(6.0 * 4 / 240.0)
    ri = _one(e.eval("histogram_count(increase(lat[4m]))"))
    assert ri["value"] == pytest.approx(6.0 * 4)


def test_histogram_quantile_of_rate(store):
    t = T0 + 240_000
    e = PromQLEngine.from_storage(store, t, t, 60_000)
    # the increase is scale-4× the unit histogram → same shape, so the
    # median matches the instant median
    r = _one(e.eval("histogram_quantile(0.5, rate(lat[4m]))"))
    assert r["value"] == pytest.approx(2.0)


# -------------------------------------------------- edges


def test_histogram_functions_ignore_float_series(store):
    e = _eng(store)
    assert e.eval("histogram_count(reqs)").collect() == []


def test_histogram_functions_without_tier(spark):
    from pyspark.sql import Row

    sdf = spark.createDataFrame(
        [Row(fingerprint=1, timestamp_ms=T0, value=1.0)]
    )
    ser = spark.createDataFrame(
        [Row(fingerprint=1, labels={"__name__": "m"})]
    )
    e = PromQLEngine(sdf, ser, T0, T0, 60_000)
    assert e.eval("histogram_count(m)").collect() == []


def test_histogram_function_bad_arg_shape(store):
    e = _eng(store)
    with pytest.raises(ValueError):
        e.eval("histogram_count(abs(lat))").collect()


# -------------------------------------------------- aggregation


def test_sum_of_histograms(store2):
    """sum(h): two series with schema-0 unit histograms merge bucket-wise;
    sum by (job) keeps the job label."""
    e = PromQLEngine.from_storage(store2, T0, T0, 60_000)
    r = _one(e.eval("histogram_count(sum(h2))"))
    assert dict(r["labels"]) == {}
    assert r["value"] == 6.0 + 12.0
    r = e.eval("histogram_count(sum by (job) (h2))").collect()
    got = sorted((dict(x["labels"])["job"], x["value"]) for x in r)
    assert got == [("a", 6.0), ("b", 12.0)]


def test_avg_of_histograms(store2):
    e = PromQLEngine.from_storage(store2, T0, T0, 60_000)
    assert _one(e.eval("histogram_count(avg(h2))"))["value"] == pytest.approx(9.0)
    # avg preserves the overall mean: sums 10 and 20 over counts 6 and 12
    assert _one(e.eval("histogram_sum(avg(h2))"))["value"] == pytest.approx(15.0)


def test_quantile_over_summed_histograms(store2):
    """The canonical histogram_quantile(q, sum(rate(...))) shape, here at
    an instant: merged buckets zero→3, idx1→6, idx2→9, count 18;
    rank 9 hits idx1 (cum 9) exactly → upper bound interp:
    1 + 1·(9−3)/6 = 2."""
    e = PromQLEngine.from_storage(store2, T0, T0, 60_000)
    assert _one(e.eval("histogram_quantile(0.5, sum(h2))"))["value"] == pytest.approx(2.0)


def test_sum_mixed_schemas(spark):
    """schema 1 (base √2) buckets regroup exactly into schema 0 (base 2):
    idx 1 (1, √2] and idx 2 (√2, 2] both → idx 1 (1, 2]."""
    import tempfile as _tf

    s = SparkParquetStorage(spark, _tf.mkdtemp(prefix="phs-nh-mix-"))
    s.write(
        [
            TimeSeries(
                labels=[Label("__name__", "hm"), Label("i", "fine")],
                histograms=[
                    NativeHistogram(
                        timestamp_ms=T0, count=3.0, sum=4.0, schema=1,
                        zero_threshold=0.25, zero_count=0.0,
                        positive=[(1, 1.0), (2, 2.0)], negative=[],
                    )
                ],
            ),
            TimeSeries(
                labels=[Label("__name__", "hm"), Label("i", "coarse")],
                histograms=[_hist(T0)],
            ),
        ]
    )
    e = PromQLEngine.from_storage(s, T0, T0, 60_000)
    # merged at schema 0: zero 1, idx1 = (2 from coarse) + (1+2 rescaled),
    # idx2 = 3  → fraction(0, 2) = (1·full + idx1 full 5 + 0)/9 … F(0)=0.5
    assert _one(e.eval("histogram_count(sum(hm))"))["value"] == 9.0
    assert _one(e.eval("histogram_fraction(0, 2, sum(hm))"))["value"] == pytest.approx(
        (1.0 + 5.0 - 0.5) / 9.0
    )


def test_classic_histogram_quantile_still_works(spark):
    """The native union must not disturb the classic le-bucket path."""
    from pyspark.sql import Row

    rows, series = [], []
    for i, (le, cnt) in enumerate((("1", 5.0), ("2", 8.0), ("+Inf", 10.0))):
        series.append(
            Row(fingerprint=i, labels={"__name__": "h_bucket", "le": le})
        )
        rows.append(Row(fingerprint=i, timestamp_ms=T0, value=cnt))
    sdf = spark.createDataFrame(rows)
    ser = spark.createDataFrame(series)
    e = PromQLEngine(sdf, ser, T0, T0, 60_000)
    r = _one(e.eval("histogram_quantile(0.5, h_bucket)"))
    assert r["value"] == pytest.approx(1.0)  # rank 5 → exactly first le


def test_served_histogram_functions(store):
    """from_storage wires the histogram tier, so the HTTP query endpoints
    evaluate histogram_* functions with no extra plumbing."""
    from promhouse_spark.edge.http import create_app

    app = create_app(store)
    app.config["TESTING"] = True
    c = app.test_client()
    r = c.get(
        "/api/v1/query",
        query_string={
            "query": "histogram_count(lat)",
            "time": str((T0 + 120_000) / 1000),
        },
    )
    assert r.status_code == 200
    body = r.get_json()
    res = body["data"]["result"]
    assert len(res) == 1
    assert res[0]["metric"] == {"job": "api"}
    assert float(res[0]["value"][1]) == 18.0


# -------------------------------------------------- remote-read round-trip


def test_read_returns_native_histograms(store):
    """storage.read attaches the query's native histograms to the float
    result (modern prompb TimeSeries carries both sample types), so the
    /read protocol round-trips them."""
    from promhouse_spark.models import MatchType, Matcher, Query

    q = Query(
        start_ms=T0,
        end_ms=T0 + 300_000,
        matchers=(Matcher("__name__", MatchType.EQ, "lat"),),
    )
    (res,) = store.read([q])
    assert len(res) == 1
    ts = res[0]
    assert ts.labels_map() == {"__name__": "lat", "job": "api"}
    assert ts.samples == []  # lat is native-only
    assert [h.timestamp_ms for h in ts.histograms] == [
        T0 + k * 60_000 for k in range(5)
    ]
    assert ts.histograms[2].count == 18.0
    # float series stay float
    qf = Query(
        start_ms=T0,
        end_ms=T0 + 300_000,
        matchers=(Matcher("__name__", MatchType.EQ, "reqs"),),
    )
    (resf,) = store.read([qf])
    assert len(resf) == 1 and resf[0].histograms == []


def test_read_wire_roundtrip_with_histograms(store):
    from promhouse_spark.edge import prompb, snappy_codec
    from promhouse_spark.edge.http import create_app
    from promhouse_spark.models import MatchType, Matcher, Query

    app = create_app(store)
    app.config["TESTING"] = True
    c = app.test_client()
    q = Query(
        start_ms=T0,
        end_ms=T0 + 300_000,
        matchers=(Matcher("__name__", MatchType.EQ, "lat"),),
    )
    req = snappy_codec.compress(prompb.encode_read_request([q]))
    r = c.post("/read", data=req)
    assert r.status_code == 200
    (result,) = prompb.decode_read_response(snappy_codec.decompress(r.data))
    assert len(result) == 1
    hs = result[0].histograms
    assert len(hs) == 5 and hs[0].positive == [(1, 2.0), (2, 3.0)]


def test_memory_storage_histograms_roundtrip(spark):
    from promhouse_spark.models import MatchType, Matcher, Query
    from promhouse_spark.storage.memory import MemoryStorage

    m = MemoryStorage()
    m.write(
        [
            TimeSeries(
                labels=[Label("__name__", "lat")],
                histograms=[_hist(T0), _hist(T0 + 60_000, 2.0)],
            )
        ]
    )
    (res,) = m.read(
        [Query(T0, T0 + 60_000, (Matcher("__name__", MatchType.EQ, "lat"),))]
    )
    assert len(res) == 1 and len(res[0].histograms) == 2
    # range filter applies to histograms too
    (res2,) = m.read(
        [Query(T0 + 1, T0 + 60_000, (Matcher("__name__", MatchType.EQ, "lat"),))]
    )
    assert [h.count for h in res2[0].histograms] == [12.0]


def test_query_range_serves_native_histogram_matrix(store):
    from promhouse_spark.edge.http import create_app

    app = create_app(store)
    app.config["TESTING"] = True
    c = app.test_client()
    r = c.get(
        "/api/v1/query_range",
        query_string={
            "query": "lat",
            "start": str(T0 / 1000),
            "end": str(T0 / 1000 + 120),
            "step": "60",
        },
    )
    assert r.status_code == 200
    res = r.get_json()["data"]["result"]
    hs = [s for s in res if "histograms" in s]
    assert len(hs) == 1
    s = hs[0]
    assert s["metric"] == {"__name__": "lat", "job": "api"}
    assert [t for t, _ in s["histograms"]] == [
        T0 / 1000, T0 / 1000 + 60, T0 / 1000 + 120,
    ]
    # step 2 serves the scale-3 histogram: count 18
    assert s["histograms"][2][1]["count"] == "18"
    # float queries over the same storage are unaffected
    r2 = c.get(
        "/api/v1/query_range",
        query_string={
            "query": "reqs",
            "start": str(T0 / 1000),
            "end": str(T0 / 1000 + 60),
            "step": "60",
        },
    )
    res2 = r2.get_json()["data"]["result"]
    assert len(res2) == 1 and "values" in res2[0]


# ------------------------------------------- histogram-typed *_over_time


def test_hist_over_time_functions(store):
    """sum/avg/last_over_time stay histogram-typed over native series and
    compose under the histogram functions."""
    t = T0 + 240_000
    e = PromQLEngine.from_storage(store, t, t, 60_000)
    # window (t-5m, t] holds scales 1..5 → counts 6,12,18,24,30
    r = _one(e.eval("histogram_count(sum_over_time(lat[5m]))"))
    assert r["value"] == 6.0 + 12 + 18 + 24 + 30
    r = _one(e.eval("histogram_count(avg_over_time(lat[5m]))"))
    assert r["value"] == pytest.approx(90.0 / 5)
    r = _one(e.eval("histogram_count(last_over_time(lat[5m]))"))
    assert r["value"] == 30.0
    # shape is scale-invariant, so quantile over the window-sum matches
    r = _one(e.eval("histogram_quantile(0.5, sum_over_time(lat[5m]))"))
    assert r["value"] == pytest.approx(2.0)
    # offset shifts the window
    r = _one(e.eval("histogram_count(last_over_time(lat[5m] offset 2m))"))
    assert r["value"] == 18.0
