"""Driver-contract regression net: every queries() entry must analyze
(schema resolution catches renamed columns / typos without executing), every
oracle key must have an implementation, and entry() must run."""

import __spark_entry__ as entrymod


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 36
    # sketch/UDF ops are intentionally oracle-less (emb_lsh_ann_topk
    # graduated to hash-paired in r6 — hyperplane LSH is plain arithmetic,
    # replayed in full by its DuckDB oracle)
    assert set(qs) - set(os_) == {
        "doc_minhash_lsh",
        "doc_simhash_dups",
        "doc_semantic_dups",  # k-means fit is not SQL-expressible
        "doc_multimodal_features",
        "emb_ivf_ann_topk",
        "emb_pq_ann_topk",
        "ph_cardinality_approx",  # HLL sketch differs per engine; 2%-error test
    }


def test_all_queries_analyze(spark, sf_dir):
    qs = entrymod.queries()
    for name, fn in sorted(qs.items()):
        df = fn(spark, sf_dir)
        assert df.schema.fields, f"{name} produced an empty schema"
        cols = df.columns
        assert len(cols) == len(set(cols)), f"{name} has duplicate column names: {cols}"


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
