"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship scan-aggregate at sf0.001;
``queries()``/``oracle_sql()`` expose the full implemented operator surface
(SURVEY.md §2 inventory + the LLM-data-pipeline operators) for the driver's
DuckDB-oracle correctness gate. Implementations live in
``promhouse_spark/workloads/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """The driver testdata's events table stores TIMESTAMP(NANOS); reading it
    requires the legacy nanosAsLong conf (promhouse_spark.session.load_table
    then converts ns → timestamp). Plain timestamp[us] testdata must scan as
    session-TZ (UTC) timestamps, not TIMESTAMP_NTZ, to match the UTC-naive
    DuckDB oracle and keep unix_micros() applicable."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from promhouse_spark.workloads.tpch import q1_pricing_summary

    _ensure_nanos_conf(spark)
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ beyond-
    reference LLM-pipeline operators). Each callable takes (spark, sf_dir)
    and returns a DataFrame; computed columns are aliased identically to the
    oracle SQL."""
    from promhouse_spark.workloads import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_nanos_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for sketch-based ops —
    MinHash/SimHash/hyperplane-LSH — whose hash functions are not
    SQL-expressible; the driver records the weaker rows-only check there)."""
    from promhouse_spark.workloads import ORACLES

    return dict(ORACLES)
