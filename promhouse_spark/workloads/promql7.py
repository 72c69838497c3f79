"""Round-8 query family (continuation): the TSDB-admin read shape.

``ph_tombstone_mask`` pins the tombstone-masking plan behind
``delete_series`` (storage/parquet.py: ``_apply_tombstones``;
plans/read.py: ``apply_tombstones`` — the SAME production function is
called here): pending delete intervals masked out of a fact scan by an
equi-keyed left-anti join with the interval test as the residual
condition. The DuckDB oracle replays it as NOT EXISTS.

The tombstone set is derived deterministically inside the query (top-3
series by sample count, the [25%, 50%] slice of the global time range)
so the oracle can re-derive it from the same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from promhouse_spark.plans.read import apply_tombstones
from promhouse_spark.session import load_table


def ph_tombstone_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving per-series sample counts after a matcher+range delete —
    the read every query runs between ``delete_series`` and
    ``clean_tombstones``."""
    ev = load_table(spark, sf_dir, "events")
    samples = ev.select(
        F.col("user_id"),
        F.unix_millis("ts").alias("ts_ms"),
        F.col("value"),
    )
    bounds = samples.agg(
        F.expr("min(ts_ms) + (max(ts_ms) - min(ts_ms)) div 4").alias("min_ms"),
        F.expr("min(ts_ms) + (max(ts_ms) - min(ts_ms)) div 2").alias("max_ms"),
    )
    top3 = (
        samples.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(3)
        .select("user_id")
    )
    tombstones = top3.crossJoin(bounds)
    surviving = apply_tombstones(
        samples, tombstones, key_col="user_id", ts_col="ts_ms"
    )
    return (
        surviving.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_samples"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id")
    )


PH_TOMBSTONE_MASK_SQL = """
WITH samples AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events
),
bounds AS (
  SELECT min(ts_ms) + (max(ts_ms) - min(ts_ms)) // 4 AS min_ms,
         min(ts_ms) + (max(ts_ms) - min(ts_ms)) // 2 AS max_ms
  FROM samples
),
top3 AS (
  SELECT user_id FROM samples GROUP BY user_id
  ORDER BY count(*) DESC, user_id LIMIT 3
),
tomb AS (SELECT t.user_id, b.min_ms, b.max_ms FROM top3 t CROSS JOIN bounds b),
surv AS (
  SELECT s.user_id, s.value FROM samples s
  WHERE NOT EXISTS (
    SELECT 1 FROM tomb t
    WHERE t.user_id = s.user_id AND s.ts_ms BETWEEN t.min_ms AND t.max_ms
  )
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
       round(sum(value), 2) AS sum_value
FROM surv GROUP BY user_id ORDER BY user_id
"""


def ph_chunk_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunked tier's read-path arithmetic (storage/chunked.py
    ``_restricted_scan``), pinned as data: cut each series' day of samples
    into 120-sample chunks, compute the (min_ms, max_ms, n) envelopes the
    layout stores, and count — per series — how many chunks an hour-long
    window would decode vs how many exist. At 100 TB this ratio IS the
    read cost; the oracle replays the same row_number()-based chunking."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    samples = ev.select(
        F.col("user_id"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.unix_millis("ts").alias("ts_ms"),
    )
    w = W.partitionBy("user_id", "day").orderBy("ts_ms", "user_id")
    chunks = (
        samples.withColumn(
            "chunk_idx", ((F.row_number().over(w) - F.lit(1)) / 120).cast("long")
        )
        .groupBy("user_id", "day", "chunk_idx")
        .agg(
            F.min("ts_ms").alias("min_ms"),
            F.max("ts_ms").alias("max_ms"),
            F.count("*").cast("long").alias("n"),
        )
    )
    bounds = samples.agg(
        F.expr("min(ts_ms) + (max(ts_ms) - min(ts_ms)) div 2").alias("w_lo")
    ).withColumn("w_hi", F.col("w_lo") + F.lit(3_600_000))
    return (
        chunks.crossJoin(bounds)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(
                F.when(
                    (F.col("max_ms") >= F.col("w_lo"))
                    & (F.col("min_ms") <= F.col("w_hi")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_decoded"),
            F.sum("n").cast("long").alias("n_samples"),
        )
        .orderBy("user_id")
    )


PH_CHUNK_PRUNE_SQL = """
WITH samples AS (
  SELECT user_id,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         epoch_ms(ts) AS ts_ms
  FROM events
),
chunks AS (
  SELECT user_id, day, (rn - 1) // 120 AS chunk_idx,
         min(ts_ms) AS min_ms, max(ts_ms) AS max_ms,
         CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT user_id, day, ts_ms,
           row_number() OVER (PARTITION BY user_id, day
                              ORDER BY ts_ms, user_id) AS rn
    FROM samples
  ) GROUP BY user_id, day, (rn - 1) // 120
),
bounds AS (
  SELECT min(ts_ms) + (max(ts_ms) - min(ts_ms)) // 2 AS w_lo,
         min(ts_ms) + (max(ts_ms) - min(ts_ms)) // 2 + 3600000 AS w_hi
  FROM samples
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN max_ms >= b.w_lo AND min_ms <= b.w_hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_decoded,
       CAST(sum(n) AS BIGINT) AS n_samples
FROM chunks CROSS JOIN bounds b
GROUP BY user_id ORDER BY user_id
"""


def ph_rawsql_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rawsql window-pushdown path (round-9), judged end-to-end: derive
    [lo, hi] bounds from the data, render them into a rawsql-shaped WHERE
    clause, re-extract them with the PRODUCTION parser the chunked tier
    prunes with (plans/rawsql.extract_time_window — storage/chunked.py
    ``_register_views_for_sql``), and aggregate the window the extracted
    bounds select. A broken extractor shifts the window → hash mismatch."""
    from promhouse_spark.plans.rawsql import extract_time_window

    ev = load_table(spark, sf_dir, "events")
    samples = ev.select(
        F.col("user_id"), F.unix_millis("ts").alias("ts_ms"), F.col("value")
    )
    b = samples.agg(
        F.expr("min(ts_ms) + (max(ts_ms) - min(ts_ms)) div 4").alias("lo"),
        F.expr("min(ts_ms) + 3 * (max(ts_ms) - min(ts_ms)) div 4").alias("hi"),
    ).first()  # two scalars — query metadata, not fact data
    sql_text = (
        "SELECT fingerprint, count(*) AS value FROM samples "
        f"WHERE timestamp_ms >= {b['lo']} AND timestamp_ms <= {b['hi']} "
        "AND value > 0 GROUP BY fingerprint"
    )
    lo, hi = extract_time_window(sql_text)
    return (
        samples.filter((F.col("ts_ms") >= lo) & (F.col("ts_ms") <= hi))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_samples"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("ts_ms").alias("first_ms"),
            F.max("ts_ms").alias("last_ms"),
        )
        .orderBy("user_id")
    )


PH_RAWSQL_WINDOW_SQL = """
WITH samples AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events
),
bounds AS (
  SELECT min(ts_ms) + (max(ts_ms) - min(ts_ms)) // 4 AS lo,
         min(ts_ms) + 3 * (max(ts_ms) - min(ts_ms)) // 4 AS hi
  FROM samples
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_samples,
       round(sum(value), 2) AS sum_value,
       min(ts_ms) AS first_ms, max(ts_ms) AS last_ms
FROM samples, bounds
WHERE ts_ms >= lo AND ts_ms <= hi
GROUP BY user_id ORDER BY user_id
"""


QUERIES = {
    "ph_tombstone_mask": ph_tombstone_mask,
    "ph_chunk_prune": ph_chunk_prune,
    "ph_rawsql_window": ph_rawsql_window,
}

ORACLES = {
    "ph_tombstone_mask": PH_TOMBSTONE_MASK_SQL,
    "ph_chunk_prune": PH_CHUNK_PRUNE_SQL,
    "ph_rawsql_window": PH_RAWSQL_WINDOW_SQL,
}
