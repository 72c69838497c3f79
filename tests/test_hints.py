"""Hint-aware coarse reads: step_ms hints at/above the attached rollup
resolution are served from the rollup table (one last-value sample per
window); smaller steps and hint-less queries take the raw path."""

import pytest

from promhouse_spark.models import Label, Query, Sample, TimeSeries, make_matchers
from promhouse_spark.schemas import SAMPLES_SCHEMA
from promhouse_spark.storage.parquet import SparkParquetStorage
from promhouse_spark.streaming.rollup import downsample_partial
from tests.fixtures import T0

STEP = 300_000


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("hints")
    st = SparkParquetStorage(spark, str(root / "store"))
    st.write(
        [
            TimeSeries(
                labels=[Label("__name__", "cpu")],
                samples=[Sample(float(i), T0 + i * 60_000) for i in range(10)],
            )
        ]
    )
    rollup = str(root / "rollup")
    downsample_partial(st.samples_df().select(*SAMPLES_SCHEMA.names), STEP).write.mode(
        "append"
    ).parquet(rollup)
    st.attach_rollup(rollup, STEP)
    return st


def q(start=T0, end=T0 + 600_000):
    return Query(start, end, make_matchers(("__name__", "=", "cpu")))


def test_coarse_hint_served_from_rollup(store):
    [res] = store.read_with_hints([q()], [{"step_ms": 600_000}])
    (ts,) = res
    # 10 raw samples collapse to 2 windows; last value per window
    assert [(s.timestamp_ms - T0, s.value) for s in ts.samples] == [
        (0, 4.0),       # window [T0, T0+5m): samples 0..4 → last = 4
        (STEP, 9.0),    # window [T0+5m, T0+10m): samples 5..9 → last = 9
    ]


def test_fine_hint_takes_raw_path(store):
    [res] = store.read_with_hints([q()], [{"step_ms": 60_000}])
    assert len(res[0].samples) == 10  # raw samples, not rollup


def test_no_hint_takes_raw_path(store):
    [res] = store.read_with_hints([q()], [None])
    assert len(res[0].samples) == 10


def test_rate_hint_takes_raw_path(store):
    """rate/increase/delta need intra-window timestamps and counter resets;
    serving them from the rollup would silently corrupt client-side math
    (ADVICE r1, medium) — they must fall through to raw even with a coarse
    step hint."""
    for func in ("rate", "increase", "delta", "irate", "deriv", "quantile_over_time"):
        [res] = store.read_with_hints([q()], [{"step_ms": 600_000, "func": func}])
        assert len(res[0].samples) == 10, f"{func} must be served raw"


def test_aggregating_funcs_served_from_matching_rollup_column(store):
    # raw values per window: [0,1,2,3,4] and [5,6,7,8,9]. Only functions
    # that COMPOSE (f over per-window f-values == f over raw samples) are
    # rollup-servable — the client re-applies the function over what we
    # return.
    expect = {
        "min_over_time": [0.0, 5.0],
        "max_over_time": [4.0, 9.0],
        "sum_over_time": [10.0, 35.0],
        "last_over_time": [4.0, 9.0],
    }
    for func, values in expect.items():
        [res] = store.read_with_hints([q()], [{"step_ms": 600_000, "func": func}])
        (ts,) = res
        assert [s.value for s in ts.samples] == values, func
        assert [s.timestamp_ms - T0 for s in ts.samples] == [0, STEP]


def test_noncomposing_aggregates_take_raw_path(store):
    """count_over_time / avg_over_time (ADVICE r2, medium): count over
    one-sample-per-window rollup output counts windows, not raw samples;
    avg over per-window avgs is wrong for unequal window counts — both must
    fall through to raw even with a coarse step hint."""
    for func in ("count_over_time", "avg_over_time"):
        [res] = store.read_with_hints([q()], [{"step_ms": 600_000, "func": func}])
        assert len(res[0].samples) == 10, f"{func} must be served raw"


def test_mixed_request(store):
    coarse, fine, nomatch = store.read_with_hints(
        [q(), q(), Query(T0, T0 + 1, make_matchers(("__name__", "=", "nope")))],
        [{"step_ms": STEP}, None, {"step_ms": STEP}],
    )
    assert len(coarse[0].samples) == 2
    assert len(fine[0].samples) == 10
    assert nomatch == []
