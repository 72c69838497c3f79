"""Label JSON codec tests — differential against the standard library, like
the reference tests its marshaller against ``encoding/json``
(``storages/clickhouse/json_test.go:30-82``), plus hypothesis round-trips in
place of go-fuzz (``storages/clickhouse/json_gofuzz.go``)."""

import json

from hypothesis import given, settings, strategies as st

from promhouse_spark.functions.labels import marshal_labels, unmarshal_labels
from promhouse_spark.models import Label
from tests.fixtures import FUNNY_VALUES

LABEL_SETS = [
    {},
    {"": ""},
    {"label": ""},
    {"": "value"},
    {"__name__": "normal", "instance": "foo", "job": "bar"},
] + [{"__name__": f"funny_{i}", "label": v} for i, v in enumerate(FUNNY_VALUES)]


def test_marshal_parses_as_standard_json():
    for ls in LABEL_SETS:
        assert json.loads(marshal_labels(ls)) == ls


def test_roundtrip():
    for ls in LABEL_SETS:
        assert unmarshal_labels(marshal_labels(ls)) == ls


def test_sorted_by_name():
    s = marshal_labels({"b": "2", "a": "1", "c": "3"})
    assert s == '{"a":"1","b":"2","c":"3"}'


def test_label_list_input():
    s = marshal_labels([Label("b", "2"), Label("a", "1")])
    assert s == '{"a":"1","b":"2"}'


@given(st.dictionaries(st.text(max_size=30), st.text(max_size=30), max_size=10))
@settings(max_examples=300, deadline=None)
def test_roundtrip_property(labels):
    assert unmarshal_labels(marshal_labels(labels)) == labels
    assert json.loads(marshal_labels(labels)) == labels


def test_label_replace_semantics(spark):
    """funcLabelReplace edges: full-match-only, $N expansion, empty result
    drops dst, no match leaves the map untouched, absent src reads ''."""
    from pyspark.sql import functions as F

    from promhouse_spark.functions.labels import label_replace

    rows = [
        (1, {"job": "api-7", "x": "keep"}),
        (2, {"job": "worker"}),       # regex won't match → untouched
        (3, {"x": "only"}),           # src absent → '' → no match
        (4, {"job": "api-9", "shard": "old"}),  # dst overwritten
    ]
    df = spark.createDataFrame(rows, "i long, labels map<string,string>")
    out = {
        r["i"]: r["m"]
        for r in df.select(
            "i",
            label_replace("labels", "shard", "$1", "job", "api-([0-9]+)").alias("m"),
        ).collect()
    }
    assert out[1] == {"job": "api-7", "x": "keep", "shard": "7"}
    assert out[2] == {"job": "worker"}
    assert out[3] == {"x": "only"}
    assert out[4] == {"job": "api-9", "shard": "9"}
    # empty replacement drops the dst label entirely
    dropped = df.filter("i = 4").select(
        label_replace("labels", "shard", "", "job", "api-[0-9]+").alias("m")
    ).first()["m"]
    assert dropped == {"job": "api-9"}


def test_label_join_semantics(spark):
    from promhouse_spark.functions.labels import label_join

    df = spark.createDataFrame(
        [(1, {"a": "x", "b": "y"}), (2, {"a": "x"})],
        "i long, labels map<string,string>",
    )
    out = {
        r["i"]: r["m"]
        for r in df.select(
            "i", label_join("labels", "ab", "-", "a", "b").alias("m")
        ).collect()
    }
    assert out[1] == {"a": "x", "b": "y", "ab": "x-y"}
    # absent src joins as '' — PromQL's strings.Join keeps the separator
    assert out[2] == {"a": "x", "ab": "x-"}
