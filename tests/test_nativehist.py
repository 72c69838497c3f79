"""Native-histogram operator tests (operators/nativehist.py): build/merge
algebra, quantile accuracy against the exact percentile, zero-bucket and
fraction semantics. The four nhist_* registry queries are additionally
hash-paired against DuckDB (tests/test_oracle_tail.py + check_oracle)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from promhouse_spark.operators.nativehist import (
    bucket_idx,
    hist_build,
    hist_fraction,
    hist_merge,
    hist_quantile,
    hist_stats,
)


@pytest.fixture(scope="module")
def obs(spark):
    rng = random.Random(7)
    rows = []
    for g in ("a", "b"):
        for i in range(4000):
            v = rng.lognormvariate(3.0 if g == "a" else 4.0, 1.0)
            rows.append((g, f"d{i % 3}", round(v, 2)))
    rows += [("a", "d0", 0.0), ("a", "d1", -5.0)]  # zero-bucket cases
    return spark.createDataFrame(rows, "grp string, day string, value double")


def test_bucket_idx_exact_boundaries(spark):
    df = spark.range(1).select(
        *[
            bucket_idx(F.lit(c).cast("long")).alias(f"c{c}")
            for c in (1, 2, 3, 4, 5, 1024, 1025)
        ]
    )
    r = df.first()
    # (2^(i-1), 2^i]: 1→0, 2→1, 3..4→2, 5→3, 1024→10, 1025→11
    assert (r["c1"], r["c2"], r["c3"], r["c4"], r["c5"]) == (0, 1, 2, 2, 3)
    assert (r["c1024"], r["c1025"]) == (10, 11)


def test_build_totals_and_zero_bucket(spark, obs):
    h = hist_build(obs, "value", by=["grp"]).collect()
    byg = {r["grp"]: r for r in h}
    assert byg["a"]["count"] == 4002  # includes the two non-positive obs
    assert byg["a"]["zero_count"] == 2
    assert byg["b"]["zero_count"] == 0
    # bucket counts sum to count - zero_count
    assert sum(b["cnt"] for b in byg["a"]["buckets"]) == 4000
    # sorted, unique indexes
    idxs = [b["idx"] for b in byg["a"]["buckets"]]
    assert idxs == sorted(set(idxs))


def test_merge_equals_direct_build(spark, obs):
    daily = hist_build(obs, "value", by=["grp", "day"])
    merged = hist_merge(daily, by=["grp"])
    direct = hist_build(obs, "value", by=["grp"])
    m = {r["grp"]: r for r in merged.collect()}
    d = {r["grp"]: r for r in direct.collect()}
    assert set(m) == set(d)
    for g in d:
        assert m[g]["count"] == d[g]["count"]
        assert m[g]["zero_count"] == d[g]["zero_count"]
        assert m[g]["sum_cents"] == d[g]["sum_cents"]
        assert [tuple(b) for b in m[g]["buckets"]] == [
            tuple(b) for b in d[g]["buckets"]
        ]


def test_quantile_within_bucket_resolution(spark, obs):
    h = hist_build(obs, "value", by=["grp"])
    exact = {
        r["grp"]: r["x"]
        for r in obs.groupBy("grp")
        .agg(F.expr("percentile(value, 0.9)").alias("x"))
        .collect()
    }
    est = {
        r["grp"]: r["quantile_value"]
        for r in hist_quantile(h, 0.9, by=["grp"]).collect()
    }
    for g, true in exact.items():
        # base-2 buckets: the interpolated estimate lives in the same
        # bucket as the true quantile → within a factor of 2
        assert 0.5 * true <= est[g] <= 2.0 * true, (g, est[g], true)


def test_quantile_zero_bucket_returns_zero(spark):
    rows = [("z", -1.0)] * 8 + [("z", 100.0)] * 2
    df = spark.createDataFrame(rows, "grp string, value double")
    h = hist_build(df, "value", by=["grp"])
    est = hist_quantile(h, 0.5, by=["grp"]).first()
    assert est["quantile_value"] == 0.0  # rank 5 of 10 sits in the zero bucket


def test_fraction_bounds_and_complement(spark, obs):
    h = hist_merge(hist_build(obs, "value", by=["grp", "day"]), by=["grp"])
    frac = {
        r["grp"]: r["fraction"]
        for r in hist_fraction(h, 10.0, 100.0, by=["grp"]).collect()
    }
    exact = {
        r["grp"]: r["x"]
        for r in obs.groupBy("grp")
        .agg(
            (
                F.sum(((F.col("value") > 10) & (F.col("value") <= 100)).cast("int"))
                / F.count("*")
            ).alias("x")
        )
        .collect()
    }
    for g in exact:
        assert 0.0 <= frac[g] <= 1.0
        assert abs(frac[g] - exact[g]) < 0.08, (g, frac[g], exact[g])


def test_stats_integer_avg(spark, obs):
    h = hist_build(obs, "value", by=["grp"])
    s = {r["grp"]: r for r in hist_stats(h, by=["grp"]).collect()}
    for g, r in s.items():
        assert r["avg_cents"] == r["sum_cents"] // r["obs_count"]
        assert not math.isnan(r["avg_cents"])
