"""Matcher semantics (F1/F3) — pure-Python evaluator unit tests plus a
Spark-vs-Python differential on the Column compiler.

Spec: ``storages/base/base.go:100-138`` and the empty-matcher extension
(``storages/storages_test.go:264-326``).
"""

import pytest

from promhouse_spark.models import Matcher, MatchType, Query, make_matchers
from promhouse_spark.operators.matchers import matchers_to_column

LABELS = {"__name__": "http_requests_total", "code": "200", "handler": "query"}

CASES = [
    # (matcher spec, expected against LABELS)
    (("__name__", "=", "http_requests_total"), True),
    (("__name__", "=", "no_such_metric"), False),
    (("__name__", "=", ""), False),
    (("no_such_label", "=", ""), True),  # absent ≡ ""
    (("no_such_label", "=", "value"), False),
    (("__name__", "!=", ""), True),
    (("no_such_label", "!=", ""), False),
    (("no_such_label", "!=", "value"), True),
    (("__name__", "=~", "http_requests_.+"), True),
    (("__name__", "=~", "_requests_"), False),  # fully anchored
    (("no_such_label", "=~", "value"), False),
    (("no_such_label", "=~", ".*"), True),  # "" matches .*
    (("__name__", "!~", "_requests_"), True),
    (("__name__", "!~", "http_requests_.+"), False),
    (("code", "=~", "2.."), True),
    (("code", "!~", "4.."), True),
]


@pytest.mark.parametrize("spec,expected", CASES)
def test_python_matcher(spec, expected):
    (m,) = make_matchers(spec)
    assert m.matches(LABELS) is expected


def test_conjunction_and_empty_list():
    q = Query(0, 1, make_matchers(("__name__", "=", "http_requests_total"), ("code", "=", "200")))
    assert q.matches(LABELS)
    assert Query(0, 1, ()).matches(LABELS)  # empty list selects all
    q2 = Query(0, 1, make_matchers(("__name__", "=", "http_requests_total"), ("code", "=", "999")))
    assert not q2.matches(LABELS)


@pytest.mark.spark
def test_column_compiler_matches_python(spark):
    label_sets = [
        LABELS,
        {},
        {"__name__": ""},
        {"code": "200"},
        {"__name__": "other_metric", "code": "404"},
    ]
    df = spark.createDataFrame(
        [(i, ls) for i, ls in enumerate(label_sets)], "id long, labels map<string,string>"
    )
    for spec, _ in CASES:
        (m,) = make_matchers(spec)
        got = {
            r["id"]
            for r in df.filter(matchers_to_column([m])).select("id").collect()
        }
        want = {i for i, ls in enumerate(label_sets) if m.matches(ls)}
        assert got == want, f"divergence for {m!r}: spark={got} python={want}"
