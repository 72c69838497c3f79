"""Bucketed (hash-clustered) table layout — the shuffle-elimination layer
for repeated joins/aggregations on one key.

The engine's hottest key is the series fingerprint: every read joins samples
to the matched series set on it (``clickhouse.go:310-370``'s temp-table ANY
INNER JOIN), every rollup groups by it. At 100 TB, a plain parquet fact
table pays a full shuffle of the fact side per query; a table written with
``bucketBy(N, key)`` pins each key to one of N files per partition, and
Catalyst then plans joins between co-bucketed tables AND groupBys on the
bucket key with **no Exchange at all** — the physical layout *is* the
shuffle, paid once at write time and amortized over every subsequent query.

This is the Spark-native analogue of the reference's MergeTree primary-key
clustering (``ORDER BY (date, fingerprint)``, ``clickhouse.go:90-110``): the
MergeTree sort makes fingerprint lookups cheap; bucketing additionally makes
fingerprint *joins and aggregations* exchange-free, which MergeTree cannot
express.

Bucketed tables require the session catalog (``saveAsTable``); we register
them as EXTERNAL tables at an explicit path so the data lives where the
caller says, not in a hidden warehouse dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    num_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external parquet table bucketed on ``key``.

    ``num_buckets`` sizes the downstream exchange-free parallelism: scans of
    the bucketed table run at ``num_buckets`` tasks, so pick roughly
    (table size / healthy partition size), NOT the tiny test default —
    e.g. ~100 000 buckets for a 100 TB fact table at 1 GiB per bucket-file.
    ``sort_cols`` additionally orders rows inside each bucket file (row-group
    pruning + merge-join-ready order)."""
    writer = df.write.format("parquet").mode(mode).option("path", path)
    writer = writer.bucketBy(num_buckets, key)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry (external: the files remain)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
