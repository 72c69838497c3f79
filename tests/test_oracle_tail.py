"""Oracle verification for the registry tail.

The driver's correctness gate evaluates only the first 50 ``queries()``
entries (observed in CORRECTNESS_r03.json); the registry front-loads the
SURVEY §2 parity set and LLM-pipeline operators there. This test closes the
gap for everything past slot 50: each tail query runs through the SAME
rows+schema+value-hash compare (tools/check_oracle.py) against DuckDB at
sf0.001, so the whole query surface stays oracle-verified every pytest
run, not just the driver-judged prefix.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_oracle import compare_query, duckdb_con  # noqa: E402

from promhouse_spark.workloads import ORACLES, QUERIES  # noqa: E402

TAIL = list(QUERIES)[50:]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_con(sf_dir)
    yield con
    con.close()


def test_tail_is_fully_oracle_paired():
    # every un-judged query must carry the stronger check here
    assert [n for n in TAIL if n not in ORACLES] == []


def test_registry_coverage_is_closed():
    """Every registered oracle belongs to a registered query, and every
    registered query is either in the driver-judged prefix (first 50) or in
    the TAIL parametrization above — no query can silently escape both
    correctness checks."""
    assert set(ORACLES) <= set(QUERIES)
    judged_prefix = list(QUERIES)[:50]
    assert sorted(set(judged_prefix) | set(TAIL)) == sorted(QUERIES)
    # the gate assumption this file documents: the registry really does
    # overflow the driver's 50-slot window, so the tail check is live
    assert len(QUERIES) > 50 and len(TAIL) == len(QUERIES) - 50


@pytest.mark.parametrize("name", TAIL)
def test_tail_query_matches_oracle(name, spark, duck, sf_dir):
    problems = compare_query(name, QUERIES[name], ORACLES[name], spark, duck, sf_dir)
    assert problems == [], f"{name}: {'; '.join(problems)}"
