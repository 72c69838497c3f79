"""Driver-facing workload registry.

Each workload module contributes:
  - ``QUERIES``: name → callable(spark, sf_dir) → DataFrame (Spark plan)
  - ``ORACLES``: name → equivalent DuckDB ANSI SQL (omitted for ops that are
    not SQL-expressible — the driver records a weaker rows-only check there).

Conventions that keep the driver's order-insensitive value-hash compare
stable across engines:
  - every computed column is aliased identically in both dialects;
  - float aggregates are rounded (2-4 dp) on BOTH sides — double addition is
    order-dependent and Spark/DuckDB would otherwise differ in the last ulp;
  - timestamps are surfaced as epoch micros / DATE / formatted strings, never
    raw TIMESTAMP values (the ns-vs-µs physical types would hash apart);
  - counts are cast to BIGINT on both sides;
  - every LIMIT has a total tiebreak order.
"""

from __future__ import annotations

from promhouse_spark.workloads import events as _events
from promhouse_spark.workloads import extra as _extra
from promhouse_spark.workloads import llmdata as _llmdata
from promhouse_spark.workloads import llmdata2 as _llmdata2
from promhouse_spark.workloads import tpch as _tpch
from promhouse_spark.workloads import tpch2 as _tpch2
from promhouse_spark.workloads import tpch3 as _tpch3

QUERIES = {
    **_tpch.QUERIES,
    **_tpch2.QUERIES,
    **_tpch3.QUERIES,
    **_events.QUERIES,
    **_llmdata.QUERIES,
    **_llmdata2.QUERIES,
    **_extra.QUERIES,
}
ORACLES = {
    **_tpch.ORACLES,
    **_tpch2.ORACLES,
    **_tpch3.ORACLES,
    **_events.ORACLES,
    **_llmdata.ORACLES,
    **_llmdata2.ORACLES,
    **_extra.ORACLES,
}

assert set(ORACLES) <= set(QUERIES), "oracle without a query implementation"
