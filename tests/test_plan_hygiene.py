"""Plan hygiene across the ENTIRE query registry: no judged query may plan
a cartesian product or an unbounded broadcast-nested-loop join — the two
shapes that turn a 100 TB run into an O(n²) accident. Every exception must
be allowlisted here WITH its justification, so a new quadratic plan breaks
CI instead of shipping silently.

This inspects Catalyst's physical plan at sf0.001 (planning only — nothing
executes except the streaming-harness queries, which are excluded because
invoking them RUNS a real stream; their outputs are driver-materialized
row sets with trivial plans anyway).
"""

from __future__ import annotations

import pytest

from promhouse_spark.workloads import QUERIES

# Queries whose nested-loop / cross-join shapes are deliberate and bounded.
# The list is EXACT: test_allowlist_is_tight fails if an entry stops
# planning a nested loop, so stale grants can't mask future regressions.
ALLOWED_NESTED_LOOP = {
    # bounded-left exact k-NN: LIMIT 5 left side × corpus is the documented
    # contract (operators/similarity.py:knn_join enforces max_left_rows)
    "emb_knn_join_batch",
    # scalar-subquery decorrelation: crossJoin of a 1-ROW aggregate
    # (corpus avg / total count) — constant-size broadcast, not data-scale
    "q11_important_stock",
    "q22_global_sales_opportunity",
    # 1-row corpus-size / model-total / p90-threshold broadcast joined onto
    # the fact side
    "doc_charlm_nll",
    "doc_tfidf_top_terms",
    "doc_curation_pipeline2",
    # 1-row max-rate aggregate joined onto the |domains|-row rate frame
    "doc_domain_resample",
    # 1-ROW global time-bounds aggregate crossJoined onto a 3-row (top-3
    # series) / per-chunk frame — constant-size broadcast, not data-scale;
    # the tombstone anti-join itself is equi-keyed on the series id
    "ph_tombstone_mask",
    "ph_chunk_prune",
}

# streaming-harness queries actually run a stream when invoked; their
# returned frames are driver-materialized rows (plan: LocalTableScan)
EXCLUDED = {n for n in QUERIES if n.startswith("ph_stream_")}

CHECKED = [n for n in QUERIES if n not in EXCLUDED]


def _is_quadratic(spark, sf_dir, name) -> bool:
    plan = (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    return ("CartesianProduct" in plan) or ("BroadcastNestedLoopJoin" in plan)


@pytest.mark.parametrize("name", CHECKED)
def test_no_unjustified_quadratic_join(name, spark, sf_dir):
    if name in ALLOWED_NESTED_LOOP:
        pytest.skip("documented-bounded nested loop (see allowlist)")
    assert not _is_quadratic(spark, sf_dir, name), (
        f"{name} plans a cartesian/nested-loop join — either fix the plan "
        f"or allowlist it here with a boundedness justification"
    )


@pytest.mark.parametrize("name", sorted(ALLOWED_NESTED_LOOP))
def test_allowlist_is_tight(name, spark, sf_dir):
    """Allowlisted names must exist AND still plan a nested loop — an entry
    that went clean must be removed so the grant can't shadow a future
    regression."""
    assert name in QUERIES
    assert _is_quadratic(spark, sf_dir, name), (
        f"{name} no longer plans a nested loop — remove it from the allowlist"
    )
