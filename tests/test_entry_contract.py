"""Driver-contract regression net: every queries() entry must analyze
(schema resolution catches renamed columns / typos without executing), every
oracle key must have an implementation, and entry() must run."""

import pytest

import __spark_entry__ as entrymod


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 36
    # sketch/UDF ops are intentionally oracle-less (emb_lsh_ann_topk
    # graduated to hash-paired in r6 — hyperplane LSH is plain arithmetic,
    # replayed in full by its DuckDB oracle)
    # r7: every sketch/fit/decode entry graduated to hash-paired via
    # STAGED artifacts — the non-SQL step (xxhash64 signatures, k-means
    # fits, the netpbm decode) persists to a staging parquet that the
    # DuckDB oracle replays the downstream algorithm over. The last
    # holdout, the HLL sketch, is now a hand-rolled fixed-point HLL whose
    # register fold is exact BIGINT arithmetic in both engines.
    assert set(qs) - set(os_) == set()


@pytest.mark.slow
def test_all_queries_analyze(spark, sf_dir):
    # slow tier (r12): building all 151 queries takes ~8 min — several
    # curation/dedup builds EXECUTE their eager tier materializations at
    # construction time. The default tier still covers the contract:
    # test_queries_and_oracles_consistent pins the registry shape, and
    # tests/test_oracle_tail.py EXECUTES the full 101-query tail (the
    # driver itself executes the 50-query judged prefix).
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
