"""Native-histogram wire codec (edge/prompb.py Histogram, TimeSeries
field 4) and the bridge into the analytics frame: span/delta expansion,
zigzag, packed repeated fields, float-histogram form, and the
schema-aware wire quantile."""

from __future__ import annotations

import math
import random

import pytest

from promhouse_spark.edge import prompb
from promhouse_spark.models import Label, NativeHistogram, Sample, TimeSeries
from promhouse_spark.operators.nativehist import (
    native_histogram_frame,
    wire_hist_quantile,
)


def test_span_expansion_by_hand():
    # spans [(0,2), (3,2)] → indexes 0,1 then gap of 3 → 5,6
    # integer deltas [2,1,-1,2] → absolute counts 2,3,2,4
    out = prompb._expand_spans([(0, 2), (3, 2)], [2, 1, -1, 2], [])
    assert out == [(0, 2.0), (1, 3.0), (5, 2.0), (6, 4.0)]


def test_spans_rederived_from_buckets():
    buckets = [(0, 2.0), (1, 3.0), (5, 2.0), (6, 4.0)]
    assert prompb._spans_from_buckets(buckets) == [(0, 2), (3, 2)]
    # negative start index (negative-schema histograms)
    assert prompb._spans_from_buckets([(-2, 1.0), (-1, 1.0), (3, 1.0)]) == [
        (-2, 2),
        (3, 1),
    ]


def test_zigzag():
    for n in (0, 1, -1, 2, -2, 63, -64, 2**31 - 1, -(2**31)):
        assert prompb._unzigzag(prompb._zigzag(n)) == n


@pytest.mark.parametrize("is_float", [False, True])
def test_histogram_roundtrip(is_float):
    h = NativeHistogram(
        timestamp_ms=1700000000123,
        count=10.5 if is_float else 10.0,
        sum=123.456,
        schema=3,
        zero_threshold=2.938735877055719e-39,
        zero_count=1.5 if is_float else 1.0,
        positive=[(1, 2.0), (2, 3.0), (7, 4.5 if is_float else 4.0)],
        negative=[(-1, 0.5 if is_float else 1.0)],
        is_float=is_float,
    )
    back = prompb.decode_histogram(prompb.encode_histogram(h))
    assert back.timestamp_ms == h.timestamp_ms
    assert back.count == h.count
    assert back.sum == h.sum
    assert back.schema == h.schema
    assert back.zero_threshold == h.zero_threshold
    assert back.zero_count == h.zero_count
    assert back.positive == h.positive
    assert back.negative == h.negative
    assert back.is_float == is_float


def test_histogram_roundtrip_fuzz():
    rng = random.Random(99)
    for _ in range(200):
        idxs = sorted(rng.sample(range(-20, 40), rng.randrange(0, 12)))
        pos = [(i, float(rng.randrange(0, 50))) for i in idxs if i >= 0]
        neg = [(i, float(rng.randrange(0, 50))) for i in idxs if i < 0]
        h = NativeHistogram(
            timestamp_ms=rng.randrange(0, 2**40),
            count=float(sum(c for _, c in pos + neg)),
            sum=rng.uniform(-1e6, 1e6),
            schema=rng.randrange(-4, 9),
            zero_count=float(rng.randrange(0, 5)),
            positive=pos,
            negative=neg,
        )
        back = prompb.decode_histogram(prompb.encode_histogram(h))
        assert back.positive == h.positive, h
        assert back.negative == h.negative, h
        assert back.schema == h.schema


def test_writerequest_roundtrip_with_histograms():
    ts = TimeSeries(
        labels=[Label("__name__", "rpc_latency"), Label("job", "api")],
        samples=[Sample(1.5, 1000)],
        histograms=[
            NativeHistogram(
                timestamp_ms=1000,
                count=6.0,
                sum=12.5,
                schema=2,
                positive=[(0, 1.0), (1, 2.0), (4, 3.0)],
            )
        ],
    )
    buf = prompb.encode_write_request([ts])
    back = prompb.decode_write_request(buf)
    assert len(back) == 1
    assert back[0].labels == ts.labels
    assert back[0].samples == ts.samples
    assert len(back[0].histograms) == 1
    h = back[0].histograms[0]
    assert h.positive == [(0, 1.0), (1, 2.0), (4, 3.0)]
    assert (h.count, h.sum, h.schema) == (6.0, 12.5, 2)


def test_golden_wire_bytes_minimal_histogram():
    """Hand-assembled wire bytes for a minimal integer histogram:
    count_int=3 (field 1 varint), sum=2.0 (field 3 fixed64),
    one positive span (offset 1, length 2) (field 11), deltas [1,1]
    (field 12 packed zigzag)."""
    import struct

    h = NativeHistogram(count=3.0, sum=2.0, positive=[(1, 1.0), (2, 2.0)])
    got = prompb.encode_histogram(h)
    want = (
        b"\x08\x03"  # field 1 varint 3
        + b"\x19" + struct.pack("<d", 2.0)  # field 3 fixed64 sum
        + b"\x5a\x04"  # field 11, len 4: span{offset=1(zigzag 02), length=2}
        + b"\x08\x02\x10\x02"
        + b"\x62\x02"  # field 12, len 2: packed zigzag [2, 2] → deltas [1,1]
        + b"\x02\x02"
    )
    assert got == want


def test_unpacked_varints_also_decode():
    # an encoder may emit repeated sint64 unpacked (one tag per value)
    buf = (
        b"\x08\x02"  # count_int = 2
        + b"\x5a\x02\x10\x02"  # positive span {offset 0, length 2}
        + b"\x60\x02"  # positive_deltas: unpacked zigzag 2 → +1
        + b"\x60\x00"  # unpacked zigzag 0 → +0
    )
    h = prompb.decode_histogram(buf)
    assert h.positive == [(0, 1.0), (1, 1.0)]


def test_wire_frame_and_quantile(spark):
    """End-to-end: synthesize observations, bucket them at schema 3 in
    Python (base 2^(1/8)), ship through the wire codec, and check the
    schema-aware quantile against the exact percentile within one bucket
    width (factor 2^(2^-3) ≈ 1.09)."""
    rng = random.Random(5)
    obs = [rng.lognormvariate(2.0, 0.8) for _ in range(5000)]
    schema = 3
    factor = 2.0 ** (2.0**-schema)
    buckets: dict[int, float] = {}
    for v in obs:
        idx = math.ceil(math.log(v, factor))
        buckets[idx] = buckets.get(idx, 0.0) + 1.0
    h = NativeHistogram(
        timestamp_ms=60_000,
        count=float(len(obs)),
        sum=float(sum(obs)),
        schema=schema,
        positive=sorted(buckets.items()),
    )
    ts = TimeSeries(labels=[Label("__name__", "lat")], histograms=[h])
    back = prompb.decode_write_request(prompb.encode_write_request([ts]))
    frame = native_histogram_frame(spark, back)
    assert frame.count() == 1
    for q in (0.5, 0.9, 0.99):
        est = wire_hist_quantile(frame, q).first()["quantile_value"]
        exact = sorted(obs)[int(q * (len(obs) - 1))]
        assert exact / factor <= est <= exact * factor, (q, est, exact)


def test_wire_quantile_negative_and_zero_buckets(spark):
    """Rank walking crosses negative buckets (descending index order),
    the zero bucket, then positives."""
    h = NativeHistogram(
        timestamp_ms=1,
        count=10.0,
        sum=0.0,
        schema=0,
        zero_threshold=0.5,
        zero_count=2.0,
        positive=[(1, 4.0)],  # (1, 2]
        negative=[(1, 4.0)],  # [-2, -1)
    )
    ts = TimeSeries(labels=[Label("__name__", "g")], histograms=[h])
    frame = native_histogram_frame(
        spark, prompb.decode_write_request(prompb.encode_write_request([ts]))
    )
    # ranks: 4 negative, 2 zero, 4 positive
    q10 = wire_hist_quantile(frame, 0.1).first()["quantile_value"]
    assert -2.0 <= q10 <= -1.0
    q50 = wire_hist_quantile(frame, 0.5).first()["quantile_value"]
    assert -0.5 <= q50 <= 0.5  # inside the zero bucket
    q90 = wire_hist_quantile(frame, 0.9).first()["quantile_value"]
    assert 1.0 <= q90 <= 2.0


def test_storage_roundtrip_histograms(spark, tmp_path):
    """Remote-write → storage → matcher-filtered read → quantile: the
    full ingest loop for native-histogram samples. Histograms land in
    their own day-partitioned table; the registry carries the labels."""
    from promhouse_spark.models import MatchType, Matcher, Query
    from promhouse_spark.storage.parquet import SparkParquetStorage

    store = SparkParquetStorage(spark, str(tmp_path / "store"))
    series = [
        TimeSeries(
            labels=[Label("__name__", "lat"), Label("job", j)],
            histograms=[
                NativeHistogram(
                    timestamp_ms=1_700_000_000_000 + k * 60_000,
                    count=4.0,
                    sum=10.0,
                    schema=0,
                    positive=[(0, 2.0), (1, 2.0)],  # (0.5,1] and (1,2]
                )
                for k in range(3)
            ],
        )
        for j in ("api", "db")
    ]
    # wire round-trip first, then persist — the exact /write path shape
    store.write(prompb.decode_write_request(prompb.encode_write_request(series)))
    q = Query(
        start_ms=1_700_000_000_000,
        end_ms=1_700_000_000_000 + 120_000,
        matchers=(
            Matcher("__name__", MatchType.EQ, "lat"),
            Matcher("job", MatchType.EQ, "api"),
        ),
    )
    frame = store.read_histograms(q)
    rows = frame.collect()
    assert len(rows) == 3  # only job=api, all three timestamps in range
    assert all(r["labels"]["job"] == "api" for r in rows)
    med = wire_hist_quantile(frame, 0.5).collect()
    assert len(med) == 3
    # 4 observations in (0.5,1] and (1,2]: rank 2 → upper edge of bucket 1
    assert all(abs(m["quantile_value"] - 1.0) < 1e-9 for m in med)
    # narrower time range prunes
    q2 = Query(
        start_ms=1_700_000_000_000,
        end_ms=1_700_000_000_000,
        matchers=(Matcher("__name__", MatchType.EQ, "lat"),),
    )
    assert store.read_histograms(q2).count() == 2  # both jobs, first ts only


def test_hist_increase_and_rate(spark):
    """Cumulative native-histogram series on a grid: increase is the
    bucket-wise endpoint diff with extrapolation; a counter reset inside
    the window makes the last histogram the increase; quantile composes
    on the result (histogram_quantile over rate)."""
    from promhouse_spark.operators.nativehist import hist_increase

    # perfectly aligned samples every 30 s, buckets growing by (1, 2)
    # per step in idx 0 / idx 1; count grows by 3 per step
    rows = []
    for k in range(11):  # ts 0..300_000
        rows.append(
            (
                {"__name__": "lat", "job": "api"},
                k * 30_000,
                0,
                0.0,
                0.0,
                3.0 * k,
                10.0 * k,
                [(0, 1.0 * k), (1, 2.0 * k)],
                [],
            )
        )
    schema = (
        "labels map<string,string>, timestamp_ms long, schema int, "
        "zero_threshold double, zero_count double, count double, "
        "sum double, positive array<struct<idx:int,cnt:double>>, "
        "negative array<struct<idx:int,cnt:double>>"
    )
    frame = spark.createDataFrame(rows, schema)
    inc = hist_increase(
        frame, start_ms=120_000, end_ms=300_000, step_ms=60_000,
        range_ms=120_000,
    )
    got = {r["timestamp_ms"]: r for r in inc.collect()}
    assert set(got) == {120_000, 180_000, 240_000, 300_000}
    r = got[240_000]
    # window (120s, 240s]: first 150s (k=5), last 240s (k=8); diff 3 steps
    # → count 9, buckets (3, 6); sampled 90 s of a 120 s window with 30 s
    # spacing → extrapolates the 30 s start gap fully (< 1.1×avg) and the
    # 0 s end gap adds 0: factor = (90+30+0)/90 = 4/3
    assert r["count"] == pytest.approx(12.0)
    assert [(b["idx"], b["cnt"]) for b in r["positive"]] == [
        (0, pytest.approx(4.0)),
        (1, pytest.approx(8.0)),
    ]
    # rate divides by the 120 s range
    rated = hist_increase(
        frame, start_ms=240_000, end_ms=240_000, step_ms=60_000,
        range_ms=120_000, rate=True,
    ).first()
    assert rated["count"] == pytest.approx(12.0 / 120.0)
    # quantile composes on the rate output
    qv = wire_hist_quantile(
        hist_increase(
            frame, 240_000, 240_000, 60_000, 120_000, rate=True
        ),
        0.5,
    ).first()["quantile_value"]
    assert 0.5 <= qv <= 2.0  # inside the (0.5,1] / (1,2] bucket pair


def test_hist_increase_reset(spark):
    """A counter reset (all components drop) inside the window → the
    last histogram IS the increase (detectReset semantics)."""
    from promhouse_spark.operators.nativehist import hist_increase

    schema = (
        "labels map<string,string>, timestamp_ms long, schema int, "
        "zero_threshold double, zero_count double, count double, "
        "sum double, positive array<struct<idx:int,cnt:double>>, "
        "negative array<struct<idx:int,cnt:double>>"
    )
    rows = [
        ({"job": "x"}, 0, 0, 0.0, 0.0, 100.0, 50.0, [(1, 100.0)], []),
        ({"job": "x"}, 60_000, 0, 0.0, 0.0, 5.0, 2.0, [(1, 5.0)], []),
    ]
    frame = spark.createDataFrame(rows, schema)
    inc = hist_increase(frame, 60_000, 60_000, 60_000, 120_000).first()
    # reset at the second sample: increase = last histogram, extrapolated
    # (sampled 60 s of 120 s window, zero-clamped start for counters)
    assert inc is not None
    assert inc["count"] > 0
    got_bucket = inc["positive"][0]
    assert got_bucket["idx"] == 1
    assert got_bucket["cnt"] == pytest.approx(inc["count"])
