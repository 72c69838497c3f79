"""Differential/oracle tests for the FNV-1a fingerprint (X1).

Pins from ``utils/timeseries/fingerprint_test.go:27-46``.
"""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from promhouse_spark.functions.fingerprint import (
    FNV_OFFSET_BASIS,
    fingerprint,
    fingerprint_signed,
    to_signed64,
    to_unsigned64,
)

GOLDEN = {"__name__": "http_requests_total", "code": "200", "handler": "query"}


def test_empty_is_offset_basis():
    assert fingerprint({}) == 14695981039346656037 == FNV_OFFSET_BASIS


def test_pinned_golden_value():
    assert fingerprint(GOLDEN) == 0x145426E4F81508D1 == 1464838543658780881


def test_order_invariance():
    items = list(GOLDEN.items())
    assert fingerprint(reversed(items)) == fingerprint(items)


def test_signed_roundtrip():
    u = fingerprint({"a": "b" * 40})
    s = to_signed64(u)
    assert -(2**63) <= s < 2**63
    assert to_unsigned64(s) == u


@given(
    st.dictionaries(
        st.text(min_size=0, max_size=20), st.text(min_size=0, max_size=20), max_size=8
    )
)
@settings(max_examples=200, deadline=None)
def test_signed_always_in_long_range(labels):
    s = fingerprint_signed(labels)
    assert -(2**63) <= s < 2**63


@pytest.mark.spark
def test_udf_matches_python(spark):
    from promhouse_spark.functions.fingerprint import fingerprint_map_udf

    label_sets = [
        {},
        GOLDEN,
        {"": ""},
        {"": "value"},
        {"label": ""},
        {"l1": "v1", "l2": "v2"},
        {"emoji": "🆗", "quotes": "'`\"\\"},
    ]
    df = spark.createDataFrame(
        [(i, ls) for i, ls in enumerate(label_sets)], "id long, labels map<string,string>"
    )
    rows = df.select("id", fingerprint_map_udf("labels").alias("fp")).collect()
    got = {r["id"]: r["fp"] for r in rows}
    for i, ls in enumerate(label_sets):
        assert got[i] == fingerprint_signed(ls), f"mismatch for {ls!r}"
