"""Hashed-feature LR quality classifier (operators/hashlr.py): feature
normalization contract, learning on a planted signal, and trainer
determinism. The full train+score pipeline is DuckDB-hash-verified
against the K-unrolled GD oracle via the registered query
``doc_hashlr_quality`` (tests/test_oracle_tail.py); these tests pin the
operator-level semantics directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from promhouse_spark.operators.hashlr import (
    hashlr_features,
    hashlr_score,
    hashlr_train,
)


def _planted_corpus(spark):
    """Positives use one vocabulary, negatives a disjoint one — a signal
    any non-broken linear model must separate."""
    pos = "the quick brown fox jumps over the lazy dog again and again"
    neg = "zz qq ww vv kk zz qq ww vv kk zz qq"
    rows = []
    for i in range(30):
        rows.append((i, pos, "en"))
        rows.append((100 + i, neg, "zz"))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_features_normalize_per_doc(spark):
    docs = _planted_corpus(spark).limit(4)
    feats = hashlr_features(docs, label=F.col("lang") == "en")
    sums = (
        feats.groupBy("doc_id")
        .agg(F.round(F.sum("x"), 9).alias("s"))
        .collect()
    )
    assert sums and all(abs(r["s"] - 1.0) < 1e-9 for r in sums)
    y = feats.select("doc_id", "y").distinct().collect()
    assert all((r["y"] == 1) == (r["doc_id"] < 100) for r in y)


def test_trained_model_separates_planted_signal(spark):
    docs = _planted_corpus(spark)
    feats = hashlr_features(docs, label=F.col("lang") == "en")
    bias, weights = hashlr_train(feats)
    scored = hashlr_score(feats, bias, weights).collect()
    pos = [r for r in scored if r["doc_id"] < 100]
    neg = [r for r in scored if r["doc_id"] >= 100]
    # every positive must out-score every negative, and the decision
    # boundary must fall between the two score clusters
    assert min(r["margin"] for r in pos) > max(r["margin"] for r in neg)
    assert all(r["keep"] for r in pos)
    assert not any(r["keep"] for r in neg)


def test_training_is_deterministic_across_runs(spark):
    """The 1e-7 per-step quantization must make two independent fits of
    the same corpus (different partitioning) bit-identical — the property
    the DuckDB-unrolled oracle relies on."""
    docs = _planted_corpus(spark)
    feats1 = hashlr_features(docs, label=F.col("lang") == "en")
    feats2 = hashlr_features(
        docs.repartition(7), label=F.col("lang") == "en"
    )
    fit1 = hashlr_train(feats1, iters=4)
    fit2 = hashlr_train(feats2, iters=4)
    assert fit1 == fit2


def test_weights_literal_bitexact(spark):
    """The server-parsed array literal (_weights_lit, ONE py4j round trip
    instead of n_buckets Literal constructions — the GD loop builds it
    every step) must be BIT-IDENTICAL to the per-element F.lit form for
    every double the trainer can produce: repr() round-trips and the SQL
    parser's Double.parseDouble is correctly rounded. Pinned element-wise
    over signed zeros, denormal-adjacent exponents and quantized values;
    the non-finite fallback path must also agree."""
    import random
    import struct

    from promhouse_spark.operators.hashlr import _weights_lit

    random.seed(7)
    ws = [random.uniform(-0.5, 0.5) * (10 ** random.randint(-9, 1)) for _ in range(256)]
    ws[:6] = [0.0, -0.0, 1e-300, -1.2345678901234567e-07, 0.1234567, -2.5e-07]
    df = spark.range(1, len(ws) + 1).select(F.col("id").cast("int").alias("i"))
    rows = df.select(
        F.element_at(_weights_lit(ws), F.col("i")).alias("a"),
        F.element_at(F.array(*[F.lit(w) for w in ws]), F.col("i")).alias("b"),
    ).collect()
    assert len(rows) == len(ws)
    assert all(
        struct.pack("<d", r["a"]) == struct.pack("<d", r["b"]) for r in rows
    )
    # non-finite weights take the per-element Literal fallback
    nf = [1.0, float("inf"), float("nan")]
    got = spark.range(1).select(_weights_lit(nf).alias("w")).first()["w"]
    assert got[0] == 1.0 and got[1] == float("inf") and got[2] != got[2]


def test_train_unpersists_feature_cache(spark):
    """Cache hygiene (r11 verdict): the trainer's internal cached feature
    frame must be unpersisted when training returns — otherwise it leaks
    across queries in a long-lived session, and the CacheManager's
    analyzed-plan matching would silently serve the SECOND run of the
    same query from the first run's materialized featurization (cross-run
    result reuse). Two consecutive fits must both execute and agree."""
    docs = _planted_corpus(spark)
    feats = hashlr_features(docs, label=F.col("lang") == "en")
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    fit1 = hashlr_train(feats, iters=2)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before
    fit2 = hashlr_train(feats, iters=2)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before
    assert fit1 == fit2
