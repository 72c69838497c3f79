"""Raw-SQL passthrough (O7) + result shaping (X8).

Trigger (``storages/clickhouse/clickhouse.go:374-388``): a read request with
exactly one query carrying exactly two equality matchers
``{job="rawsql", query="<SQL>"}`` bypasses series selection entirely and runs
the SQL verbatim. ``Start`` is ignored; ``End`` becomes every result sample's
timestamp.

Result shaping (``storages/clickhouse/rawsql.go:25-93``): every result row
becomes one TimeSeries with a single sample — each column turns into a label
(stringified, column order preserved); a column literally named ``value``
becomes the sample's float value instead (0.0 when absent or non-numeric).

In this engine the SQL dialect is Spark SQL, which makes the full Spark
operator surface (joins, grouping sets, windows, approx aggregates, …)
reachable through the reference-compatible API.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import SparkSession

from promhouse_spark.models import MatchType, Query, Sample, TimeSeries, Label

RAWSQL_JOB = "rawsql"


def rawsql_text(queries: Sequence[Query]) -> str | None:
    """Return the SQL text if the request is a raw-SQL request, else None."""
    if len(queries) != 1:
        return None
    q = queries[0]
    if len(q.matchers) != 2:
        return None
    by_name = {}
    for m in q.matchers:
        if m.type is not MatchType.EQ:
            return None
        by_name[m.name] = m.value
    if by_name.get("job") != RAWSQL_JOB:
        return None
    # an empty query string is NOT a raw-SQL request — the reference requires
    # query != "" and falls through to a normal matcher read
    # (storages/clickhouse/rawsql.go guard); returning "" here would send
    # spark.sql("") an unparseable statement → HTTP 500
    return by_name.get("query") or None


def is_rawsql(queries: Sequence[Query]) -> bool:
    return rawsql_text(queries) is not None


def _to_float(v) -> float:
    if v is None:
        return 0.0
    if isinstance(v, bool):
        return 0.0  # reference coerces only int/uint/float (rawsql.go:35-43)
    if isinstance(v, (int, float)):
        return float(v)
    return 0.0


def _to_str(v) -> str:
    if v is None:
        return "<nil>"  # Go fmt.Sprintf("%v", nil)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "+Inf" if v > 0 else "-Inf"
        # Go %v prints floats in shortest-repr; Python repr matches for
        # round-trippable doubles.
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return v.decode("utf-8", "replace")
    return str(v)


def run_rawsql(spark: SparkSession, sql: str, end_ms: int) -> list[TimeSeries]:
    """Execute SQL verbatim and shape rows per X8.

    Results stream through ``toLocalIterator`` — the escape hatch is an API
    surface, not a bulk-export path, but nothing here materializes the full
    result on the driver at once.
    """
    df = spark.sql(sql)
    columns = df.columns
    out: list[TimeSeries] = []
    for row in df.toLocalIterator():
        labels: list[Label] = []
        value = 0.0
        for c in columns:
            v = row[c]
            if c == "value":
                value = _to_float(v)
            else:
                labels.append(Label(name=c, value=_to_str(v)))
        out.append(
            TimeSeries(labels=labels, samples=[Sample(value=value, timestamp_ms=end_ms)])
        )
    return out
