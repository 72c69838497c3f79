"""As-of join (operators/asof.py): semantics pinned against hand-computed
expectations (exact-tie match, tolerance cutoff, unmatched rows, multiple
keys), partition independence, and the plan-shape guarantee the module
docstring makes — the union-merge rendering must not contain a nested-loop
or cartesian join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from promhouse_spark.operators.asof import asof_join, instant_vector

RIGHT = [
    # (key, ts, value)
    ("a", 100, 1.0),
    ("a", 200, 2.0),
    ("a", 300, 3.0),
    ("b", 150, 9.0),
]
LEFT = [
    ("a", 50),   # before any sample → unmatched
    ("a", 100),  # exact tie → matches ts=100
    ("a", 250),  # between → matches ts=200
    ("a", 990),  # far after → matches ts=300 (no tolerance) / NULL (tol=100)
    ("b", 160),  # matches ts=150
    ("c", 500),  # key with no right rows → unmatched
]


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(LEFT, "k string, t long").repartition(3)
    right = spark.createDataFrame(RIGHT, "k string, ts long, v double").repartition(2)
    return left, right


def _as_map(rows):
    return {(r["k"], r["t"]): (r["v"], r["matched_ts"]) for r in rows}


def test_asof_backward_semantics(spark, frames):
    left, right = frames
    got = _as_map(asof_join(left, right, on="k", left_ts="t", right_ts="ts").collect())
    assert got == {
        ("a", 50): (None, None),
        ("a", 100): (1.0, 100),
        ("a", 250): (2.0, 200),
        ("a", 990): (3.0, 300),
        ("b", 160): (9.0, 150),
        ("c", 500): (None, None),
    }


def test_asof_tolerance(spark, frames):
    left, right = frames
    got = _as_map(
        asof_join(
            left, right, on="k", left_ts="t", right_ts="ts", tolerance_ms=100
        ).collect()
    )
    # only matches within 100ms survive; ties count as distance 0
    assert got[("a", 100)] == (1.0, 100)
    assert got[("a", 250)] == (2.0, 200)
    assert got[("a", 990)] == (None, None)
    assert got[("b", 160)] == (9.0, 150)


def test_asof_partition_independent(spark, frames):
    left, right = frames
    a = _as_map(asof_join(left, right, "k", "t", "ts").collect())
    b = _as_map(
        asof_join(left.repartition(7), right.repartition(5), "k", "t", "ts").collect()
    )
    assert a == b


def test_asof_duplicate_left_ts(spark):
    """Two left rows at the same (key, ts) both get the same match."""
    left = spark.createDataFrame(
        [("a", 250, "x"), ("a", 250, "y")], "k string, t long, tag string"
    )
    right = spark.createDataFrame([("a", 200, 5.0)], "k string, ts long, v double")
    rows = asof_join(left, right, "k", "t", "ts").collect()
    assert sorted((r["tag"], r["v"]) for r in rows) == [("x", 5.0), ("y", 5.0)]


def test_asof_plan_has_no_nested_loop(spark, frames):
    left, right = frames
    plan = (
        asof_join(left, right, "k", "t", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_instant_vector_staleness(spark):
    samples = spark.createDataFrame(
        [(1, 1000, 10.0), (1, 5000, 20.0), (2, 2000, 7.0)],
        "fingerprint long, timestamp_ms long, value double",
    )
    out = {
        (r["fingerprint"], r["eval_ms"]): (r["value"], r["sample_ts_ms"])
        for r in instant_vector(
            samples, start_ms=0, end_ms=8000, step_ms=2000, lookback_ms=3000
        ).collect()
    }
    assert out == {
        (1, 2000): (10.0, 1000),
        (1, 4000): (10.0, 1000),   # still within 3000ms lookback
        (1, 6000): (20.0, 5000),
        (1, 8000): (20.0, 5000),
        (2, 2000): (7.0, 2000),
        (2, 4000): (7.0, 2000),
        # (2, 6000+): sample at 2000 is stale (> 3000ms behind)
    }


def test_gap_fill_linear_semantics(spark):
    from promhouse_spark.operators.asof import gap_fill

    samples = spark.createDataFrame(
        [(1, 1000, 10.0), (1, 3000, 30.0), (2, 2000, 5.0)],
        "fingerprint long, timestamp_ms long, value double",
    )
    out = {
        (r["fingerprint"], r["eval_ms"]): r["value"]
        for r in gap_fill(samples, 0, 4000, 1000, method="linear").collect()
    }
    assert out == {
        (1, 0): None,          # before first sample: no extrapolation
        (1, 1000): 10.0,       # exactly on a sample
        (1, 2000): 20.0,       # midpoint of 10 @1000 and 30 @3000
        (1, 3000): 30.0,
        (1, 4000): None,       # after last sample
        (2, 0): None,
        (2, 1000): None,
        (2, 2000): 5.0,
        (2, 3000): None,
        (2, 4000): None,
    }


def test_gap_fill_locf_max_gap(spark):
    from promhouse_spark.operators.asof import gap_fill

    samples = spark.createDataFrame(
        [(1, 1000, 10.0)], "fingerprint long, timestamp_ms long, value double"
    )
    out = {
        r["eval_ms"]: r["value"]
        for r in gap_fill(
            samples, 0, 5000, 1000, method="locf", max_gap_ms=2000
        ).collect()
    }
    assert out == {0: None, 1000: 10.0, 2000: 10.0, 3000: 10.0,
                   4000: None, 5000: None}


def test_asof_property_vs_python_model(spark):
    """Hypothesis sweep: random (key, ts) sets on both sides — the Spark
    as-of join must equal the brute-force Python model everywhere,
    including duplicate timestamps and empty keys."""
    from hypothesis import given, settings, strategies as st

    ts = st.integers(min_value=0, max_value=50)
    key = st.sampled_from(["a", "b"])

    @settings(max_examples=12, deadline=None)
    @given(
        lefts=st.lists(st.tuples(key, ts), min_size=1, max_size=8),
        rights=st.lists(st.tuples(key, ts, st.integers(0, 99)), max_size=8),
    )
    def check(lefts, rights):
        left = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(lefts)],
            "k string, t long, row_id long",
        )
        right = spark.createDataFrame(rights, "k string, ts long, v long") \
            if rights else spark.createDataFrame([], "k string, ts long, v long")
        got = {
            r["row_id"]: (r["v"], r["matched_ts"])
            for r in asof_join(left, right, "k", "t", "ts").collect()
        }
        for i, (k, t) in enumerate(lefts):
            cands = [(ts_, v) for (rk, ts_, v) in rights if rk == k and ts_ <= t]
            # duplicates at the max ts: any of them is a valid match value —
            # the operator picks the last in (ts, side) order; accept any
            if cands:
                best_ts = max(c[0] for c in cands)
                vals = {v for (ts_, v) in cands if ts_ == best_ts}
                assert got[i][1] == best_ts and got[i][0] in vals, (i, k, t)
            else:
                assert got[i] == (None, None), (i, k, t)

    check()


def test_promql2_queries_nonempty_at_sf0001(spark):
    """Guard against a silently-empty evaluation grid (a grid outside the
    data's time range makes every oracle compare trivially pass on 0=0
    rows — this caught a 2025 grid over 2024 data once)."""
    from promhouse_spark.workloads import promql2

    for name, fn in promql2.QUERIES.items():
        n = fn(spark, "/root/testdata/sf0.001").count()
        assert n > 0, f"{name} returned 0 rows — grid/data mismatch?"


def test_gap_fill_property_vs_python_model(spark):
    """Hypothesis sweep: gap_fill(linear) must equal a brute-force Python
    interpolator on random sample sets — duplicates, on-grid samples,
    empty-series windows and all."""
    from hypothesis import given, settings, strategies as st

    from promhouse_spark.operators.asof import gap_fill

    @settings(max_examples=10, deadline=None)
    @given(
        samples=st.lists(
            st.tuples(
                st.integers(1, 2),                  # fingerprint
                st.integers(0, 40),                 # ts
                st.integers(-5, 5),                 # value (ints: exact fp)
            ),
            min_size=1,
            max_size=10,
            unique_by=lambda s: (s[0], s[1]),       # one sample per (fp, ts)
        )
    )
    def check(samples):
        df = spark.createDataFrame(
            [(f, t, float(v)) for f, t, v in samples],
            "fingerprint long, timestamp_ms long, value double",
        )
        got = {
            (r["fingerprint"], r["eval_ms"]): r["value"]
            for r in gap_fill(df, 0, 40, 10, method="linear").collect()
        }
        by_fp: dict[int, list[tuple[int, float]]] = {}
        for f, t, v in samples:
            by_fp.setdefault(f, []).append((t, float(v)))
        want = {}
        for f, pts in by_fp.items():
            pts.sort()
            for g in range(0, 41, 10):
                prev = max(((t, v) for t, v in pts if t <= g), default=None)
                nxt = min(((t, v) for t, v in pts if t >= g), default=None)
                if prev and prev[0] == g:
                    want[(f, g)] = prev[1]
                elif prev and nxt:
                    t0, v0 = prev
                    t1, v1 = nxt
                    want[(f, g)] = v0 + (v1 - v0) * (g - t0) / (t1 - t0)
                else:
                    want[(f, g)] = None
        assert set(got) == set(want)
        for k in want:
            if want[k] is None:
                assert got[k] is None, k
            else:
                assert got[k] == pytest.approx(want[k]), k

    check()
