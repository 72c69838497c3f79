"""ensure_parallelism: the pre-sketch spreading heuristic and its
degradation contract when the private-API plan probe is unavailable.

The only place the engine touches the py4j ``_jdf`` bridge is
``_plan_probe``; a Spark upgrade that changes that surface must degrade to
"repartition" (one possibly-redundant exchange), never to an exception or
to silently skipping the spread.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from promhouse_spark.operators import dedup as D


def _n_parts(df):
    return df.rdd.getNumPartitions()


def test_small_inmemory_input_gets_spread(spark):
    df = spark.createDataFrame([(i, f"t {i}") for i in range(20)], "id long, t string")
    out = D.ensure_parallelism(df, "id")
    assert _n_parts(out) == spark.sparkContext.defaultParallelism


def test_caller_repartition_is_respected(spark):
    df = spark.createDataFrame(
        [(i, f"t {i}") for i in range(20)], "id long, t string"
    ).repartition(3, "id")
    out = D.ensure_parallelism(df, "id")
    assert out is df  # plan already carries a Repartition → left alone


def test_probe_returns_none_on_broken_bridge():
    class NoBridge:
        @property
        def _jdf(self):
            raise RuntimeError("py4j bridge unavailable")

    assert D._plan_probe(NoBridge()) is None


def test_probe_none_degrades_to_repartition(spark, monkeypatch):
    """With the probe knocked out entirely, the operator must still run and
    still spread the input — the caller-repartition short-circuit is lost,
    never correctness."""
    monkeypatch.setattr(D, "_plan_probe", lambda _df: None)
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(10)],
        "doc_id long, text string",
    )
    out = D.ensure_parallelism(df, "doc_id")
    assert _n_parts(out) == spark.sparkContext.defaultParallelism
    # and a sketch operator built on it still produces results
    sigs = D.minhash_signatures(df)
    assert sigs.count() == 10
    assert len(sigs.first()["signature"]) == 48


def test_many_file_scan_left_alone(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(64)], "doc_id long, text string"
    )
    path = str(tmp_path / "many")
    df.repartition(8).write.parquet(path)
    back = spark.read.parquet(path)
    assert len(back.inputFiles()) >= 8
    out = D.ensure_parallelism(back, "doc_id")
    assert out is back  # enough files → the scan already parallelizes


def test_spread_preserves_rows(spark):
    df = spark.createDataFrame([(i, f"t {i}") for i in range(50)], "id long, t string")
    out = D.ensure_parallelism(df, "id")
    assert sorted(r["id"] for r in out.collect()) == list(range(50))
    assert out.columns == df.columns


def test_probe_on_real_frame(spark):
    df = spark.range(10).select(F.col("id"))
    probe = D._plan_probe(df)
    assert probe is not None
    has_rep, size = probe
    assert has_rep is False and size > 0
    rep = D._plan_probe(df.repartition(4))
    assert rep is not None and rep[0] is True
