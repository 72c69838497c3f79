"""Seeded random-expression differential fuzz: generate PromQL ASTs from
the grammar, render them through the canonical formatter (so the parser
round-trips them), and evaluate both the Spark engine and the pure-Python
reference (tests/promql_reference.py) on the shared corpus dataset.

Complements the hand-written corpus in test_promql_differential.py with
compositions it doesn't reach (range functions over subqueries of binary
ops, nested aggregations under vector matching, scalar arms inside
comparisons). Matching errors are compared too: when the reference
raises a duplicate-/multiple-match error, the engine's collect() must
raise as well.

Everything is seeded — the corpus is identical on every run.
"""

from __future__ import annotations

import math
import random

import pytest

from promhouse_spark.promql import PromQLEngine
from promhouse_spark.promql.format import format_expr
from promhouse_spark.promql.parser import (
    Aggregation,
    BinaryOp,
    Call,
    NumberLiteral,
    RangeSelector,
    Subquery,
    VectorSelector,
    parse,
)
from tests.promql_reference import RefEval
from tests.test_promql_differential import (
    END,
    LOOKBACK,
    START,
    STEP,
    _gen_series,
)

# slow tier (r12): 180-expression fuzz corpus (~6 min) — redundancy layer over the compile/conformance/differential nets. The default tier keeps the operator unit
# nets, the compiled-engine compile/conformance nets, and the executed
# 101-query DuckDB oracle tail; run this file via `pytest -m slow`.
pytestmark = pytest.mark.slow

# metrics with NaN-free float values (quantile/sort-sensitive ops allowed)
_CLEAN = ["http_requests_total", "mem_usage", "up"]
_RANGES = [60_000, 150_000, 240_000, 300_000]
_AGG_OPS = ["sum", "avg", "min", "max", "count", "stddev", "group"]
_LABELS = ["job", "instance", "code"]
_RANGE_FNS = [
    "rate", "increase", "delta", "irate", "changes", "resets",
    "avg_over_time", "sum_over_time", "min_over_time", "max_over_time",
    "count_over_time", "last_over_time",
]
_SIMPLE_FNS = ["abs", "ceil", "floor", "sgn", "exp"]
_ARITH_OPS = ["+", "-", "*", "/"]
_CMP_OPS = ["==", "!=", ">", "<", ">=", "<="]


def _vector(rng: random.Random, depth: int):
    r = rng.random()
    if depth <= 0 or r < 0.25:
        sel = VectorSelector(rng.choice(_CLEAN))
        if rng.random() < 0.3:
            sel.offset_ms = rng.choice([60_000, 150_000])
        return sel
    if r < 0.45:
        fn = rng.choice(_RANGE_FNS)
        if rng.random() < 0.25:
            inner = Subquery(
                _vector(rng, depth - 1),
                rng.choice(_RANGES),
                rng.choice([30_000, 60_000]),
            )
        else:
            inner = RangeSelector(
                VectorSelector(rng.choice(_CLEAN)), rng.choice(_RANGES)
            )
        return Call(fn, [inner])
    if r < 0.6:
        op = rng.choice(_AGG_OPS)
        agg = Aggregation(op, _vector(rng, depth - 1))
        mode = rng.random()
        if mode < 0.45:
            agg.by = rng.sample(_LABELS, rng.randrange(1, 3))
        elif mode < 0.7:
            agg.without = rng.sample(_LABELS, rng.randrange(1, 3))
        return agg
    if r < 0.72:
        return Call(rng.choice(_SIMPLE_FNS), [_vector(rng, depth - 1)])
    lhs = _vector(rng, depth - 1)
    if rng.random() < 0.35:  # vector-scalar
        scalar = NumberLiteral(round(rng.uniform(0.5, 20), 2))
        op = rng.choice(_ARITH_OPS + _CMP_OPS)
        node = (
            BinaryOp(op, lhs, scalar)
            if rng.random() < 0.5
            else BinaryOp(op, scalar, lhs)
        )
        if op in _CMP_OPS and rng.random() < 0.5:
            node.bool_mode = True
        return node
    rhs = _vector(rng, depth - 1)
    op = rng.choice(_ARITH_OPS + _CMP_OPS + ["and", "or", "unless"])
    node = BinaryOp(op, lhs, rhs)
    if op not in ("and", "or", "unless"):
        if rng.random() < 0.6:
            if rng.random() < 0.7:
                node.on = rng.sample(_LABELS[:2], rng.randrange(1, 3))
            else:
                node.ignoring = [rng.choice(_LABELS)]
        if op in _CMP_OPS and rng.random() < 0.4:
            node.bool_mode = True
        if rng.random() < 0.3:  # grouped matching
            node.card = rng.choice(["many_to_one", "one_to_many"])
            node.bool_mode = False
            if node.on is None and node.ignoring is None:
                node.ignoring = [rng.choice(_LABELS)]
            if rng.random() < 0.4:
                node.include = [rng.choice(_LABELS + ["job", "instance"])]
    elif rng.random() < 0.3:
        node.on = rng.sample(_LABELS[:2], rng.randrange(1, 3))
    return node


def _corpus(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    out, seen = [], set()
    while len(out) < n:
        expr = format_expr(_vector(rng, 3))
        if expr in seen:
            continue
        seen.add(expr)
        out.append(expr)
    return out


# two independent seed batches: the second probes compositions the first
# seed's draw order never reaches (trivial selectors recur — dedup keeps
# first occurrence)
FUZZ_EXPRESSIONS = list(
    dict.fromkeys(_corpus(424207, 120) + _corpus(700813, 60))
)


@pytest.fixture(scope="module")
def fuzz_corpus(spark):
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


@pytest.mark.parametrize("expr", FUZZ_EXPRESSIONS)
def test_fuzz_engine_matches_reference(fuzz_corpus, expr):
    engine, ref = fuzz_corpus
    node = parse(expr)  # formatter output must re-parse
    ref_err = None
    try:
        want = ref.eval_vector(node)
    except ValueError as e:
        if "match" in str(e) or "duplicate" in str(e) or "labelset" in str(e):
            ref_err = e
        else:
            pytest.skip(f"reference does not support: {e}")
    if ref_err is not None:
        # Error parity with one documented relaxation: Spark prunes empty
        # join subtrees (PropagateEmptyRelation / AQE), so a duplicate
        # that Prometheus detects eagerly while hashing can sit in a DEAD
        # branch the engine never evaluates. The engine must either raise
        # or produce an EMPTY result — rows under a reference error are a
        # real bug.
        try:
            rows = engine.eval(expr).collect()
        except Exception:
            return
        assert rows == [], (
            f"{expr}: reference errored ({ref_err}) but engine returned "
            f"{len(rows)} rows"
        )
        return
    got = {
        (tuple(sorted((r["labels"] or {}).items())), r["eval_ms"]): r["value"]
        for r in engine.eval(expr).collect()
        if r["value"] is not None
    }
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{expr}: series/eval mismatch\n  missing={missing[:4]}"
        f"\n  extra={extra[:4]}"
    )
    bad = [(k, got[k], want[k]) for k in want if not _values_eq(got[k], want[k])]
    assert not bad, f"{expr}: value mismatch {bad[:4]}"
