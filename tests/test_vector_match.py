"""PromQL vector-matching semantics pins (operators/vector_match.py):
one-to-one / group_left / group_right matching, duplicate-series errors,
result-label shapes (engine.go resultMetric), filter-vs-bool comparisons,
label aggregation, and topk tie determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.utils import AnalysisException

from promhouse_spark.operators.vector_match import (
    agg_by,
    binop,
    match_key,
    topk_by,
)


def _vec(spark, rows):
    """rows: (labels dict, eval_ms, value)"""
    return spark.createDataFrame(
        [Row(labels=l, eval_ms=t, value=float(v)) for l, t, v in rows],
        "labels map<string,string>, eval_ms long, value double",
    )


@pytest.fixture(scope="module")
def errors(spark):
    return _vec(
        spark,
        [
            ({"__name__": "errors", "job": "api", "instance": "a"}, 0, 2.0),
            ({"__name__": "errors", "job": "api", "instance": "b"}, 0, 4.0),
            ({"__name__": "errors", "job": "db", "instance": "c"}, 0, 1.0),
        ],
    )


@pytest.fixture(scope="module")
def totals(spark):
    return _vec(
        spark,
        [
            ({"__name__": "total", "job": "api", "instance": "a"}, 0, 10.0),
            ({"__name__": "total", "job": "api", "instance": "b"}, 0, 8.0),
            ({"__name__": "total", "job": "db", "instance": "c"}, 0, 4.0),
        ],
    )


def test_one_to_one_ignoring_name_default(spark, errors, totals):
    # default matching: all labels except __name__ → (job, instance) pairs
    out = binop(errors, totals, "/").orderBy(F.element_at("labels", "instance"))
    rows = out.collect()
    assert [r.value for r in rows] == [0.2, 0.5, 0.25]
    # one-to-one result labels: left minus __name__ (no on, no ignoring)
    assert rows[0].labels == {"job": "api", "instance": "a"}


def test_one_to_one_on_keeps_only_on_labels(spark, errors, totals):
    # on(instance): unique per side, result labels = exactly {instance}
    out = binop(errors, totals, "-", on=["instance"]).orderBy(
        F.element_at("labels", "instance")
    )
    rows = out.collect()
    assert [r.value for r in rows] == [-8.0, -4.0, -3.0]
    assert all(set(r.labels) == {"instance"} for r in rows)


def test_one_to_one_ignoring_drops_listed(spark, errors, totals):
    out = binop(errors, totals, "+", ignoring=["instance"], card="one_to_one")
    # ignoring(instance) makes the api group 2-vs-2: duplicate series error
    with pytest.raises(Exception, match="duplicate series"):
        out.collect()


def test_many_to_many_without_group_modifier_raises(spark, errors, totals):
    both = errors.unionByName(totals)
    # job=api has 2 series per side → one-to-one must refuse
    with pytest.raises(Exception, match="duplicate series"):
        binop(both, both, "/", on=["job"]).collect()


def test_group_left_many_to_one(spark, errors, totals):
    per_job = agg_by(totals, "sum", by=["job"])
    out = binop(errors, per_job, "/", on=["job"], card="many_to_one")
    rows = {r.labels["instance"]: r for r in out.collect()}
    assert rows["a"].value == pytest.approx(2.0 / 18.0)
    assert rows["b"].value == pytest.approx(4.0 / 18.0)
    assert rows["c"].value == pytest.approx(1.0 / 4.0)
    # many side's labels kept, __name__ dropped
    assert set(rows["a"].labels) == {"job", "instance"}


def test_group_left_duplicate_one_side_raises(spark, errors, totals):
    # totals has 2 series for job=api → the "one" side is not unique
    with pytest.raises(Exception, match="duplicate series"):
        binop(errors, totals, "/", on=["job"], card="many_to_one").collect()


def test_group_right_mirrors_group_left(spark, errors, totals):
    per_job = agg_by(totals, "sum", by=["job"])
    gl = binop(errors, per_job, "/", on=["job"], card="many_to_one")
    gr = binop(per_job, errors, "/", on=["job"], card="one_to_many")
    # value semantics flip with the operand order: one/many vs many/one
    gl_rows = {r.labels["instance"]: r.value for r in gl.collect()}
    gr_rows = {r.labels["instance"]: r.value for r in gr.collect()}
    for k in gl_rows:
        assert gr_rows[k] == pytest.approx(1.0 / gl_rows[k])


def test_group_left_include_copies_from_one_side(spark, errors):
    ones = _vec(spark, [({"__name__": "meta", "job": "api", "version": "v2"}, 0, 1.0),
                        ({"__name__": "meta", "job": "db", "version": "v1"}, 0, 1.0)])
    out = binop(
        errors, ones, "*", on=["job"], card="many_to_one", include=["version"]
    )
    rows = {r.labels["instance"]: r.labels for r in out.collect()}
    assert rows["a"]["version"] == "v2"
    assert rows["c"]["version"] == "v1"


def test_comparison_filter_applies_result_metric(spark, errors, totals):
    out = binop(errors, totals, ">", on=["instance"])
    rows = out.collect()
    assert rows == []  # no error count exceeds its total
    kept = binop(totals, errors, ">", on=["instance"]).collect()
    assert len(kept) == 3
    # filter mode keeps the left VALUES, but engine.go resultMetric still
    # reduces labels to the on() set (Keep drops __name__ too — hence the
    # `and on(...)` idiom for label-preserving filters)
    assert all(set(r.labels) == {"instance"} for r in kept)
    assert sorted(r.value for r in kept) == [4.0, 8.0, 10.0]


def test_comparison_filter_without_matching_keeps_labels(spark, errors):
    # plain `a > b` (no on/ignoring): labels untouched, name kept
    kept = binop(errors, errors, ">=").collect()
    assert len(kept) == 3
    assert all(r.labels["__name__"] == "errors" for r in kept)


def test_comparison_filter_ignoring_drops_ignored_label(spark, totals, errors):
    kept = binop(totals, errors, ">", ignoring=["job"]).collect()
    assert len(kept) == 3
    # Del(ignoring): job removed, __name__ KEPT (cmp keeps the name)
    assert all(
        "job" not in r.labels and r.labels["__name__"] == "total"
        for r in kept
    )


def test_comparison_bool_mode_emits_0_1_and_drops_name(spark, errors, totals):
    out = binop(errors, totals, ">", on=["instance"], bool_mode=True)
    rows = out.collect()
    assert sorted(r.value for r in rows) == [0.0, 0.0, 0.0]
    assert all("__name__" not in r.labels for r in rows)


def test_agg_by_and_without(spark, totals):
    by_job = agg_by(totals, "sum", by=["job"]).collect()
    got = {r.labels["job"]: (r.value, r.n_series) for r in by_job}
    assert got == {"api": (18.0, 2), "db": (4.0, 1)}
    wo = agg_by(totals, "count", without=["instance"]).collect()
    # without drops instance AND __name__
    got = {r.labels["job"]: r.value for r in wo}
    assert got == {"api": 2.0, "db": 1.0}
    assert all(set(r.labels) == {"job"} for r in wo)


def test_topk_ties_break_on_canonical_labels(spark):
    vec = _vec(
        spark,
        [
            ({"job": "j", "instance": "b"}, 0, 5.0),
            ({"job": "j", "instance": "a"}, 0, 5.0),
            ({"job": "j", "instance": "c"}, 0, 5.0),
            ({"job": "j", "instance": "d"}, 0, 1.0),
        ],
    )
    top = topk_by(vec, 2, by=["job"]).orderBy("rank").collect()
    # all tied at 5.0: canonical labels JSON orders a < b < c
    assert [r.labels["instance"] for r in top] == ["a", "b"]
    bottom = topk_by(vec, 1, by=["job"], bottom=True).collect()
    assert bottom[0].labels["instance"] == "d"


def test_match_key_is_canonical(spark):
    df = _vec(spark, [({"b": "2", "a": "1", "__name__": "m"}, 0, 1.0)])
    k = df.select(match_key("labels").alias("k")).first().k
    assert k == '{"a":"1","b":"2"}'
    k_on = df.select(match_key("labels", on=["b"]).alias("k")).first().k
    assert k_on == '{"b":"2"}'
