"""Differential test: the Spark PromQL engine vs the independent
pure-Python reference evaluator (tests/promql_reference.py) over a
deterministic synthetic corpus of series and expressions.

Every expression is evaluated as a range query on the same grid by both
implementations and compared series-by-series, value-by-value (relative
1e-9; NaN ≡ NaN). The corpus crosses selector modifiers, the rate
family at several range/step ratios, over-time folds, aggregations,
vector matching (on/ignoring/group_left), IEEE specials, scalar typing,
and subqueries — the surfaces where a compiled plan can silently diverge
from engine.go semantics.
"""

from __future__ import annotations

import math
import random

import pytest

from promhouse_spark.promql import PromQLEngine
from tests.promql_reference import NAME, RefEval, RefSeries

# slow tier (r12): engine-vs-reference differential (~8 min) — the compile + conformance golden nets cover the fast tier. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow


START, END, STEP = 600_000, 1_200_000, 60_000
LOOKBACK = 300_000


def _gen_series() -> list[RefSeries]:
    rng = random.Random(20260814)
    out = []
    # counters: http_requests_total{job, instance, code} every 15s w/ resets
    for job in ("api", "db"):
        for instance in ("i1", "i2"):
            for code in ("200", "500"):
                v = 0.0
                samples = []
                for ts in range(0, 1_300_001, 15_000):
                    if rng.random() < 0.06:  # missed scrape
                        continue
                    if rng.random() < 0.02:  # counter reset
                        v = 0.0
                    v += rng.uniform(0, 5 if code == "200" else 0.5)
                    samples.append((ts, round(v, 3)))
                out.append(
                    RefSeries(
                        {
                            NAME: "http_requests_total",
                            "job": job,
                            "instance": instance,
                            "code": code,
                        },
                        samples,
                    )
                )
    # gauges: mem_usage{job, instance} random walk
    for job in ("api", "db"):
        for instance in ("i1", "i2"):
            v = rng.uniform(20, 80)
            samples = []
            for ts in range(0, 1_300_001, 15_000):
                if rng.random() < 0.08:
                    continue
                v = max(0.5, v + rng.uniform(-4, 4))
                samples.append((ts, round(v, 3)))
            out.append(
                RefSeries(
                    {NAME: "mem_usage", "job": job, "instance": instance},
                    samples,
                )
            )
    # sparse 0/1 gauge with long gaps (staleness edges)
    for job in ("api", "db"):
        samples = [
            (ts, float(rng.random() > 0.2))
            for ts in range(0, 1_300_001, 120_000)
            if rng.random() < 0.7
        ]
        out.append(RefSeries({NAME: "up", "job": job}, samples))
    # a gauge carrying IEEE specials (one NaN, one spell of zeros)
    samples = []
    for i, ts in enumerate(range(0, 1_300_001, 60_000)):
        v = {3: math.nan, 7: 0.0, 8: 0.0}.get(i, rng.uniform(-5, 5))
        samples.append((ts, v))
    out.append(RefSeries({NAME: "odd_gauge", "job": "api"}, samples))
    # classic histogram: cumulative bucket counters per le
    les = ("0.1", "0.5", "1", "5", "+Inf")
    for job in ("api", "db"):
        counts = [0.0] * len(les)
        by_le = {le: [] for le in les}
        for ts in range(0, 1_300_001, 15_000):
            if rng.random() < 0.05:
                continue
            for _ in range(rng.randrange(0, 6)):
                obs = rng.expovariate(1.0)
                for i, le in enumerate(les):
                    if le == "+Inf" or obs <= float(le):
                        counts[i] += 1
            for le, c in zip(les, counts):
                by_le[le].append((ts, c))
        for le in les:
            out.append(
                RefSeries(
                    {NAME: "req_duration_bucket", "job": job, "le": le},
                    by_le[le],
                )
            )
    return out


EXPRESSIONS = [
    # selectors + modifiers
    'http_requests_total{job="api"}',
    'http_requests_total{job="api",code!="500"}',
    'mem_usage{instance=~"i[12]"}',
    'mem_usage{instance!~"i1"}',
    "mem_usage offset 2m30s",
    "mem_usage @ 900",
    "up",
    # rate family at several range/step ratios
    "rate(http_requests_total[1m])",
    "rate(http_requests_total[2m30s])",
    "rate(http_requests_total[5m])",
    "increase(http_requests_total[2m])",
    "irate(http_requests_total[3m])",
    "resets(http_requests_total[5m])",
    "changes(mem_usage[4m])",
    "delta(mem_usage[2m30s])",
    "idelta(mem_usage[2m])",
    "deriv(mem_usage[4m])",
    "predict_linear(mem_usage[4m], 120)",
    "rate(http_requests_total[1m] offset 1m)",
    "increase(http_requests_total[2m] @ 1000)",
    # over-time folds
    "avg_over_time(mem_usage[2m30s])",
    "sum_over_time(mem_usage[2m])",
    "min_over_time(odd_gauge[5m])",
    "max_over_time(odd_gauge[5m])",
    "count_over_time(up[5m])",
    "last_over_time(mem_usage[3m])",
    "present_over_time(up[4m])",
    "stddev_over_time(mem_usage[5m])",
    "stdvar_over_time(mem_usage[5m])",
    "quantile_over_time(0.9, mem_usage[5m])",
    "mad_over_time(mem_usage[5m])",
    "timestamp(mem_usage)",
    "timestamp(up offset 1m)",
    # functions
    "abs(odd_gauge)",
    "ceil(mem_usage)",
    "floor(odd_gauge)",
    "exp(odd_gauge)",
    "ln(mem_usage)",
    "sqrt(odd_gauge)",
    "sgn(odd_gauge)",
    "round(mem_usage, 0.5)",
    "clamp(mem_usage, 30, 60)",
    "clamp_min(odd_gauge, 0)",
    "clamp_max(mem_usage, 50)",
    'label_replace(up, "env", "prod", "job", "a.*")',
    'label_join(mem_usage, "jobinst", "-", "job", "instance")',
    "sort(mem_usage)",
    # aggregations
    "sum(mem_usage)",
    "sum by (job) (http_requests_total)",
    "sum without (instance) (mem_usage)",
    "avg by (job) (mem_usage)",
    "min by (code) (http_requests_total)",
    "max without (code, instance) (http_requests_total)",
    "count by (job) (up)",
    "group by (job) (http_requests_total)",
    "stddev by (job) (mem_usage)",
    "stdvar(mem_usage)",
    "topk(2, mem_usage)",
    "bottomk(2, mem_usage)",
    "quantile(0.9, mem_usage)",
    'count_values("v", floor(mem_usage / 10))',
    "sum by (job) (rate(http_requests_total[2m30s]))",
    # binary ops: vector-scalar
    "mem_usage * 2",
    "2 / mem_usage",
    "odd_gauge % 3",
    "mem_usage ^ 2",
    "odd_gauge > 0",
    "odd_gauge >= bool 0",
    "mem_usage < 40",
    "42 < mem_usage",
    "odd_gauge == bool 0",
    "-odd_gauge",
    # binary ops: vector-vector
    "mem_usage + on(job, instance) mem_usage",
    'http_requests_total{code="200"} / ignoring(code) mem_usage',
    "http_requests_total / on(job, instance) group_left mem_usage",
    'sum by (job)(rate(http_requests_total[2m])) '
    '/ on(job) sum by (job)(rate(http_requests_total[5m]))',
    'http_requests_total > on(job, instance) group_left() mem_usage',
    "mem_usage and up",
    "mem_usage or up",
    "mem_usage unless up",
    'mem_usage and on(job) up{job="api"}',
    'mem_usage or on(job) up',
    "mem_usage > on(job, instance) mem_usage offset 1m",
    # scalar typing
    "scalar(sum(mem_usage)) + odd_gauge",
    "mem_usage - scalar(quantile(0.5, mem_usage))",
    "vector(3)",
    "vector(time())",
    "time() - timestamp(mem_usage)",
    # subqueries
    "avg_over_time(mem_usage[5m:1m])",
    "max_over_time(mem_usage[4m:30s])",
    "rate(http_requests_total[5m:15s])",
    "sum by (job) (last_over_time(mem_usage[3m:45s]))",
    "increase((http_requests_total * 1)[5m:30s])",
    # @ start()/end() resolution
    "mem_usage @ start()",
    "sum by (job) (increase(http_requests_total[5m] @ end()))",
    "mem_usage @ end() offset 2m",
    # histogram_quantile over classic buckets
    "histogram_quantile(0.9, rate(req_duration_bucket[5m]))",
    "histogram_quantile(0.5, req_duration_bucket)",
    "histogram_quantile(0.99, sum by (le) (rate(req_duration_bucket[2m30s])))",
    "histogram_quantile(1, rate(req_duration_bucket[5m]))",
    "histogram_quantile(0, rate(req_duration_bucket[5m]))",
    # absent family
    "absent(nonexistent)",
    'absent(nonexistent{job="x", instance="i9"})',
    "absent(mem_usage)",
    'absent(up{job="api"})',
    "absent_over_time(nonexistent[5m])",
    "absent_over_time(up[2m])",
    # bool vector-vector comparisons; deeper compositions
    "mem_usage >= bool on(job, instance) mem_usage offset 1m",
    "mem_usage == bool mem_usage",
    'http_requests_total * on(job, instance) group_left(noexist) mem_usage',
    "(mem_usage + 1) * 2 - -odd_gauge",
    "clamp_min(rate(http_requests_total[2m30s]), 0.5) ^ 2",
    "sum without () (up)",
    "quantile(1.5, mem_usage)",
    "quantile(-0.5, mem_usage)",
    # NaN propagation through folds and counters
    "avg_over_time(odd_gauge[5m])",
    "sum_over_time(odd_gauge[3m])",
    "changes(odd_gauge[5m])",
    "resets(odd_gauge[5m])",
    "deriv(odd_gauge[5m])",
    'count_values("v", odd_gauge)',
    "round(odd_gauge)",
    "topk(3, odd_gauge)",
    "bottomk(3, odd_gauge)",
]


@pytest.fixture(scope="module")
def corpus(spark):
    series = _gen_series()
    samples, fps = [], []
    for fp, s in enumerate(series, start=1):
        fps.append((fp, s.labels))
        samples.extend((fp, ts, float(v)) for ts, v in s.samples)
    sdf = spark.createDataFrame(
        samples, "fingerprint long, timestamp_ms long, value double"
    )
    ser = spark.createDataFrame(
        fps, "fingerprint long, labels map<string,string>"
    )
    engine = PromQLEngine(sdf, ser, START, END, STEP, LOOKBACK)
    ref = RefEval(series, START, END, STEP, LOOKBACK)
    return engine, ref


def _values_eq(a: float, b: float) -> bool:
    if math.isnan(a) and math.isnan(b):
        return True
    if a == b:
        return True
    return abs(a - b) <= 1e-9 * max(abs(a), abs(b))


@pytest.mark.parametrize("expr", EXPRESSIONS)
def test_engine_matches_reference(corpus, expr):
    engine, ref = corpus
    got = {
        (tuple(sorted((r["labels"] or {}).items())), r["eval_ms"]): r["value"]
        for r in engine.eval(expr).collect()
        if r["value"] is not None
    }
    want = ref.eval_vector(expr)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{expr}: series/eval mismatch\n  missing={missing[:4]}"
        f"\n  extra={extra[:4]}"
    )
    bad = [
        (k, got[k], want[k])
        for k in want
        if not _values_eq(got[k], want[k])
    ]
    assert not bad, f"{expr}: value mismatch {bad[:4]}"
